"""Session utilities: ship the sparkft package to executors.

In production the package travels via `spark-submit --py-files sparkft.zip`.
For interactive/driver-local sessions, `ensure_shipped(spark)` zips the
package once and registers it with addPyFile so executor Python workers can
unpickle closures referencing sparkft — a no-op when the package is already
importable from the workers' cwd."""

from __future__ import annotations

import os
import tempfile
import zipfile

_shipped: set[str] = set()


def ensure_shipped(spark) -> None:
    sid = spark.sparkContext.applicationId
    if sid in _shipped:
        return
    _shipped.add(sid)
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), f"sparkft_pkg_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith((".pyc",)):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    spark.sparkContext.addPyFile(zpath)


def local_ckpt(df, eager: bool = False):
    """Materialize-once-per-invocation intermediate: lineage-truncating
    localCheckpoint with DISK_ONLY storage.

    Default deserialized MEMORY_AND_DISK caching of wide string relations
    costs 5-10x their on-disk bytes as Java objects, and because dropped
    checkpoint blocks are only released after a JVM GC + ContextCleaner
    pass, a sequence of heavy queries accumulates them until a broadcast
    build dies with notEnoughMemoryToBuildAndBroadcastTable (reproduced at
    4x bench scale, r6 smoke test). DISK_ONLY keeps the compute-once
    semantics with ZERO heap competition — the same choice a 100 TB
    pipeline makes for corpus-sized intermediates — at the price of a
    local-disk round-trip that is noise next to the recompute it replaces.
    Lazy by default so the consumer's first action materializes the blocks
    (no extra Spark job); never persist() — the CacheManager would match
    identical plans across queries, i.e. cross-query result reuse."""
    from pyspark.storagelevel import StorageLevel

    return df.localCheckpoint(eager=eager, storageLevel=StorageLevel.DISK_ONLY)


def ensure_parallelism(df, min_fraction: float = 0.5):
    """Repartition `df` up to the session's default parallelism ONLY when
    its scan produced too few splits to use the cluster.

    Small demo inputs (one parquet row group) read as a single partition and
    would run every downstream per-row expression on one core of N. A real
    100 TB scan has thousands of natural splits, so this guard is a no-op
    there — the repartition never fires where it would be a wasteful extra
    shuffle; it only fires where the alternative is (N-1) idle cores."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(1, int(target * min_fraction)):
        return df
    return df.repartition(target)
