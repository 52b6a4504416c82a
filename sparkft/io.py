"""Corpus source abstraction.

The north-star input is an Iceberg table of source-code repositories
(repo, path, commit, lang, content). In environments with an Iceberg catalog
configured, pass the table identifier; in the sandbox (no Iceberg jars) a
parquet path works identically — the engine only consumes a DataFrame, so
partition pruning on repo/lang comes free from either source.
"""

from __future__ import annotations

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def load_corpus(spark, source: str, fmt: str | None = None):
    """Load the corpus from an Iceberg table identifier or a parquet path.

    - `fmt="iceberg"` or a catalog-style identifier (no "/" and no
      .parquet suffix): `spark.read.format("iceberg").load(...)` (falls
      back to `spark.table(...)` for plain registered tables; if BOTH
      fail, the ORIGINAL Iceberg error surfaces — a table-lookup failure
      must not mask an Iceberg connectivity/permission problem).
    - otherwise: parquet path (a bare `file.parquet` counts).
    """
    looks_like_table = "/" not in source and not source.endswith(".parquet")
    if fmt == "iceberg" or (fmt is None and looks_like_table):
        try:
            return spark.read.format("iceberg").load(source)
        except Exception as iceberg_err:
            try:
                return spark.table(source)
            except Exception:
                raise iceberg_err
    return spark.read.parquet(source)


def validate_corpus_schema(df) -> None:
    missing = [c for c in CORPUS_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"corpus is missing required columns: {missing}")
