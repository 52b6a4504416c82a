"""Approximate nearest neighbor over embedding columns (array<float>).

Engine-original (training-data pipeline surface):

- `brute_force_topk` — exact cosine top-k; pure DataFrame expressions
  (zip_with/aggregate run in whole-stage codegen, no Python in the loop).
  The correctness baseline and the right choice when the query set is small.
- `ivf_build` / `ivf_topk` — IVF (inverted-file) index: deterministic
  centroid selection (seeded k-means lite on a sample), assignment =
  argmax cosine; search probes the P nearest centroids only, scanning
  ~P/K of the data — the 100 TB path (cluster assignment is a narrow
  shuffle once; queries prune partitions by centroid id).
"""

from __future__ import annotations

import numpy as np


def _cosine_cols(F, emb_col, qvec: list[float]):
    lit_q = F.array(*[F.lit(float(x)) for x in qvec])
    e = emb_col.cast("array<double>")
    dot = F.aggregate(F.zip_with(e, lit_q, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x)
    nrm_e = F.sqrt(F.aggregate(F.transform(e, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x))
    nrm_q = float(np.sqrt(np.sum(np.asarray(qvec, dtype=np.float64) ** 2)))
    return dot / (nrm_e * nrm_q)


def brute_force_topk(df, qvec: list[float], k: int = 10,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     round_to: int | None = 6):
    from pyspark.sql import functions as F

    cos = _cosine_cols(F, F.col(emb_col), qvec)
    if round_to is not None:
        cos = F.round(cos, round_to)
    return (
        df.select(F.col(id_col), cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def similar_topk(df, target_id: int, k: int = 10,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 round_to: int | None = 6,
                 assigned_df=None, cents=None, probes: int = 4):
    """Meilisearch v1.9 `GET /indexes/{uid}/similar`: the documents most
    similar to a TARGET DOCUMENT by embedding cosine, the target itself
    excluded. (Engine surface — charabia has no counterpart; semantics per
    Meilisearch similar-documents API.)

    Exact form (default): the target vector is one driver-side lookup
    (point read by id — at 100 TB a bucket-pruned fetch), then ONE
    codegen cosine projection over the corpus — identical plan shape to
    `brute_force_topk`. Pass `assigned_df`/`cents` to serve the IVF-probed
    form instead (scans ~probes/K of the data, the scale path)."""
    from pyspark.sql import functions as F

    row = df.filter(F.col(id_col) == target_id).select(emb_col).collect()
    if not row:
        raise ValueError(f"{id_col} = {target_id} not found")
    qvec = [float(x) for x in row[0][0]]
    if assigned_df is not None and cents is not None:
        pool = assigned_df.filter(F.col(id_col) != target_id)
        return ivf_topk(pool, cents, qvec, k, probes=probes,
                        id_col=id_col, emb_col=emb_col, round_to=round_to)
    return brute_force_topk(df.filter(F.col(id_col) != target_id), qvec, k,
                            id_col=id_col, emb_col=emb_col,
                            round_to=round_to)


def ivf_build(spark, df, n_centroids: int = 16, iters: int = 5, seed: int = 42,
              id_col: str = "vec_id", emb_col: str = "embedding"):
    """Returns (assigned_df with `centroid` column, centroids ndarray).

    Centroids: k-means on a driver-side sample (deterministic seed), then one
    distributed assignment pass (mapInPandas, vectorized matmul). At scale the
    sample is a tiny fraction; assignment is a single narrow scan.
    """
    from pyspark.sql import functions as F

    # Content-hash sample: deterministic regardless of partitioning/order
    # (limit() would take the first partitions — biased on clustered data,
    # and unstable under repartitioning). One narrow count scan sizes the
    # modulus; xxhash64(id) % m == 0 picks ~4096 rows uniformly by content.
    n_rows = df.count()
    if n_rows == 0:
        raise ValueError("ivf_build: input dataframe is empty")
    m = max(1, n_rows // 4096)
    sample_df = (
        df.filter(F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(m)) == 0)
        .select(id_col, emb_col)
        .orderBy(id_col)
        .limit(4096)
    )
    sample = np.asarray(
        [r[1] for r in sample_df.collect()], dtype=np.float64
    )
    sample /= np.linalg.norm(sample, axis=1, keepdims=True) + 1e-12
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cents = sample[idx].copy()
    for _ in range(iters):
        sims = sample @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cents[c] = v / (np.linalg.norm(v) + 1e-12)

    cents_b = cents.copy()

    def assign_fn(batches):
        import pandas as pd

        for pdf in batches:
            m = np.asarray(pdf[emb_col].tolist(), dtype=np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True) + 1e-12
            pdf = pdf.copy()
            pdf["centroid"] = (m @ cents_b.T).argmax(axis=1).astype("int32")
            yield pdf

    from pyspark.sql.types import IntegerType, StructField, StructType

    # copy the fields: StructType.add would mutate the df's cached schema
    schema = StructType(list(df.schema.fields) + [StructField("centroid", IntegerType())])
    assigned = df.mapInPandas(assign_fn, schema)
    return assigned, cents


def ivf_topk(assigned_df, cents: np.ndarray, qvec: list[float], k: int = 10,
             probes: int = 4, id_col: str = "vec_id", emb_col: str = "embedding",
             round_to: int | None = 6):
    """Probe the `probes` nearest centroids, exact cosine within them."""
    from pyspark.sql import functions as F

    q = np.asarray(qvec, dtype=np.float64)
    q = q / (np.linalg.norm(q) + 1e-12)
    order = (cents @ q).argsort()[::-1][:probes]
    cand = assigned_df.filter(F.col("centroid").isin([int(c) for c in order]))
    return brute_force_topk(cand, qvec, k, id_col, emb_col, round_to)


def hyperplane_planes(n_planes: int = 16, dim: int = 64, seed: int = 5):
    """Deterministic Rademacher (+-1) hyperplanes for sign-LSH over
    embeddings. +-1 entries keep the dot products exactly representable so
    the Spark expressions and the ANSI-SQL oracle agree bit-for-bit."""
    rng = np.random.default_rng(seed)
    return rng.choice([-1.0, 1.0], size=(n_planes, dim))


def embedding_near_dup_pairs(df, n_planes: int = 64, band_size: int = 16,
                             threshold: float = 0.9, seed: int = 5,
                             id_col: str = "vec_id", emb_col: str = "embedding"):
    """Embedding-cosine near-duplicate pairs, LSH-gated (the scale path):

    sign-of-dot-product bits against `n_planes` random hyperplanes, banded
    `band_size` bits per bucket; docs sharing any band bucket become
    candidate pairs; exact cosine >= threshold verifies. All JVM-side
    (aggregate/zip_with in codegen) — work is O(n) banding plus
    O(candidates), never an all-pairs join. Collision probability per bit is
    1 - angle/pi, so recall at cosine s is
    1-(1-((1-acos(s)/pi))^band_size)^bands. Defaults (64 planes, 4 bands of
    16 bits) are the scale configuration: 2^16 buckets per band keep bucket
    sizes — and therefore the within-bucket pair blow-up — tiny at large n,
    with recall ~0.93 at cos 0.99 and ~0.55 at 0.95 (raise bands for more).
    Coarser bands (e.g. 32 planes / 8-bit bands) trade candidate volume for
    recall at lower similarity — fine at demo scale, quadratic pain at
    100 TB."""
    from pyspark.sql import functions as F

    from .spark_util import ensure_parallelism

    first = df.select(emb_col).first()
    if first is None:
        raise ValueError("embedding_near_dup_pairs: input dataframe is empty")
    dim = len(first[0])
    planes = hyperplane_planes(n_planes, dim, seed)
    e = F.transform(F.col(emb_col), lambda x: x.cast("double"))
    # spread a single-split demo scan across the pool (no-op on a real
    # multi-split scan)
    v = ensure_parallelism(df.select(F.col(id_col).alias("vid"), e.alias("e")))

    # the n_planes sign bits per row come from ONE Arrow-batched matmul
    # (embeddings x planes^T) — 64 separate higher-order-function
    # expressions blow up whole-stage codegen and evaluate each plane as
    # its own fold; the numpy kernel is a single BLAS call per batch
    n_bands = n_planes // band_size

    def band_fn(batches):
        import pyarrow as pa

        from .index_build import _pin_worker_threads

        _pin_worker_threads()
        for batch in batches:
            col = batch.column("e")
            n = len(col)
            if n == 0:
                continue
            vids = batch.column("vid").to_numpy(zero_copy_only=False)
            # a null or ragged embedding would make the flat reshape throw
            # or, worse, silently misalign every subsequent row's band bits
            # (corrupting candidate buckets batch-wide); fail loudly and
            # name the offending vid instead
            if col.null_count:
                bad = vids[np.asarray(col.is_null())]
                raise ValueError(
                    f"embedding_near_dup_pairs: null embedding for "
                    f"vid={bad[0]} ({col.null_count} null rows in batch)")
            lengths = np.diff(col.offsets.to_numpy(zero_copy_only=False))
            if not (lengths == dim).all():
                bad = vids[lengths != dim]
                raise ValueError(
                    f"embedding_near_dup_pairs: ragged embedding for "
                    f"vid={bad[0]} (len {int(lengths[lengths != dim][0])}, "
                    f"expected {dim})")
            flat = col.flatten().to_numpy(zero_copy_only=False)
            embs = flat.reshape(n, -1)
            bits = ((embs @ planes.T) >= 0).astype(np.uint8) + ord("0")
            out_v = np.tile(vids, n_bands)
            out_b = []
            for b in range(n_bands):
                seg = bits[:, b * band_size:(b + 1) * band_size]
                prefix = f"{b}:"
                out_b.extend(prefix + row.tobytes().decode("ascii")
                             for row in seg)
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_v, type=pa.int64()), pa.array(out_b)],
                names=["vid", "bucket"],
            )

    # materialize the banding ONCE (r6): the self-join below references the
    # mapInArrow subtree twice and one side is broadcast, so without this
    # the band matmul pass ran twice per query (plan had two MapInArrow
    # nodes). localCheckpoint, not persist — no cross-query CacheManager
    # reuse (see dedup.jaccard_pairs_lsh note).
    from .spark_util import local_ckpt

    bands = local_ckpt(v.mapInArrow(band_fn, "vid long, bucket string"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vid") < F.col("b.vid")))
        .select(F.col("a.vid").alias("d1"), F.col("b.vid").alias("d2"))
        .distinct()
    )
    # per-vector norms are computed ONCE per side (O(n) folds) instead of
    # once per candidate pair (O(candidates) folds — 2 of the 3 interpreted
    # higher-order folds per pair in the r5 plan). sqrt(fold) over the same
    # array is bit-identical wherever it is evaluated, so cos is unchanged.
    nrm = F.sqrt(F.aggregate(F.zip_with("e", "e", lambda x, y: x * y),
                             F.lit(0.0), lambda acc, x: acc + x))
    vn = v.withColumn("_n", nrm)
    e1 = vn.select(F.col("vid").alias("d1"), F.col("e").alias("e1"),
                   F.col("_n").alias("n1"))
    e2 = vn.select(F.col("vid").alias("d2"), F.col("e").alias("e2"),
                   F.col("_n").alias("n2"))
    dot = F.aggregate(F.zip_with("e1", "e2", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (
        cand.join(e1, "d1").join(e2, "d2")
        .withColumn("cos", F.round(dot / (F.col("n1") * F.col("n2")), 6))
        .filter(F.col("cos") >= threshold)
        .select("d1", "d2", "cos")
    )
