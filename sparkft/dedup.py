"""Training-data pipeline operators: deduplication + text statistics.

Engine-original (the reference is a tokenizer; these are the operations a
large-scale training-data pipeline needs on top — exact dedup, MinHash+LSH,
SimHash, n-gram Jaccard, quality scoring). All implementations are pure
DataFrame expressions (JVM codegen, no Python in the hot path) and each has
an ANSI-SQL oracle in __spark_entry__.py.

Hash discipline: all content hashes are md5-derived (identical in Spark and
DuckDB), never engine-specific hash functions, so results are verifiable
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# minhash permutation constants (shared with the SQL oracles)
MINHASH_AB = [(2971, 577), (2939, 1103), (2767, 1409), (2719, 1931)]
MINHASH_P = 2147483647
SIMHASH_BITS = 16


def h32(col) -> "F.Column":
    """Portable 32-bit hash: first 8 hex chars of md5 (same value in DuckDB
    via ('0x'||substr(md5(x),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(hash, cnt, keeper): md5 content groups; dedup = keep `keeper`."""
    return df.groupBy(F.md5(text_col).alias("h")).agg(
        F.count("*").alias("cnt"), F.min(id_col).alias("keeper")
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             n: int = 3) -> DataFrame:
    """Distinct n-token shingles per doc (whitespace tokens; the charabia
    tokenizer's word stream equals this on plain-text corpora)."""
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias("w"),
    ).filter(F.size("w") >= n)
    terms = ", ".join(f"w[i+{k}]" for k in range(n))
    return (
        words.select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, size(w) - {n}), i -> concat_ws(' ', {terms}))"
            ).alias("sh"),
        )
        .select("doc_id", F.explode("sh").alias("shingle"))
        .distinct()
    )


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh3) over a (doc_id, shingle) frame."""
    h = h32(F.col("shingle"))
    aggs = [
        F.min((F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_AB)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_buckets(mh: DataFrame) -> DataFrame:
    """Band the signature into candidate buckets; near-dup candidates are
    buckets with cnt > 1. O(n) — the scale path vs. the O(n^2) join."""
    b0 = (F.col("mh0") * 31 + F.col("mh1")) % 1000003
    b1 = (F.col("mh2") * 31 + F.col("mh3")) % 1000003
    bands = mh.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat_ws(":", F.lit("0"), b0),
                F.concat_ws(":", F.lit("1"), b1),
            )
        ).alias("bucket"),
    )
    return bands.groupBy("bucket").agg(F.count("*").alias("cnt")).filter(F.col("cnt") > 1)


def jaccard_pairs(sh: DataFrame, threshold: float = 0.1) -> DataFrame:
    """Exact n-gram Jaccard over a shingle frame (self-join on shingle;
    verify path for LSH candidates)."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("sz2"))
    return (
        inter.join(F.broadcast(sa), "d1").join(F.broadcast(sb), "d2")
        .withColumn("jac", F.round(F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")), 4))
        .filter(F.col("jac") >= threshold)
        .select("d1", "d2", "jac")
    )


def simhash(postings: DataFrame) -> DataFrame:
    """(doc_id, simhash) 16-bit SimHash over a (doc_id, token, tf) frame.
    Bit test via modulo keeps the expression portable to ANSI SQL."""
    h = h32(F.col("token"))
    bit_sums = [
        F.sum(
            F.when((h % F.lit(1 << (j + 1))) >= F.lit(1 << j), F.col("tf"))
            .otherwise(-F.col("tf"))
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = postings.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def quality_scores(postings: DataFrame, stopwords: list[str]) -> DataFrame:
    return postings.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.round(F.count("*") / F.sum("tf"), 4).alias("distinct_ratio"),
        F.round(
            F.sum(F.when(F.col("token").isin(stopwords), F.col("tf")).otherwise(0))
            / F.sum("tf"),
            4,
        ).alias("stopword_ratio"),
        F.round(F.sum(F.length("token") * F.col("tf")) / F.sum("tf"), 4).alias("mean_token_len"),
    )


def doc_fingerprints(postings: DataFrame) -> DataFrame:
    """md5 over the sorted distinct token set — an order-insensitive content
    fingerprint for near-exact dedup after normalization."""
    return postings.groupBy("doc_id").agg(
        F.md5(F.concat_ws(" ", F.array_sort(F.collect_set("token")))).alias("fp")
    )
