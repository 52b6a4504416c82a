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

from .spark_util import local_ckpt

# minhash permutation constants (shared with the SQL oracles).
# 16 permutations banded 4x4: candidate recall at jaccard s is
# 1 - (1 - s^4)^4 (~50% at s=0.45, ~98% at s=0.75) — real near-dup widths,
# not demo widths. All (a, b) pairs are primes < MINHASH_P.
MINHASH_AB = [
    (2971, 577), (2939, 1103), (2767, 1409), (2719, 1931),
    (2693, 241), (2657, 1499), (2609, 353), (2591, 1657),
    (2543, 709), (2503, 1789), (2477, 491), (2437, 1231),
    (2399, 827), (2371, 1543), (2341, 1013), (2309, 1877),
]
MINHASH_P = 2147483647
LSH_BANDS = 4
LSH_ROWS = len(MINHASH_AB) // LSH_BANDS
# 64-bit SimHash carried as two 32-bit halves (lo, hi): BIGINT-safe in both
# Spark and DuckDB (a single 64-bit value would need the sign bit), hamming
# distance = popcount(lo^lo') + popcount(hi^hi').
SIMHASH_BITS = 64
_SIMHASH_HALF = 32


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
             n: int = 3, distinct: bool = True) -> DataFrame:
    """n-token shingles per doc (whitespace tokens; the charabia tokenizer's
    word stream equals this on plain-text corpora). distinct=True (a full
    (doc_id, shingle) shuffle) is required by Jaccard set semantics;
    min-aggregating consumers (MinHash) can pass False and skip it — min()
    is idempotent to duplicates."""
    from .spark_util import ensure_parallelism

    df = ensure_parallelism(df)
    # split on ANY whitespace run: hard-wrapped text must shingle the same
    # as single-line text, or near-dup recall silently drops across wrapping
    words = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "").alias("w"),
    ).filter(F.size("w") >= n)
    # explode the START-INDEX sequence and index the words array, rather
    # than exploding a transform()-built shingle array: Catalyst infers a
    # `size(generated) > 0` pre-filter for every explode, and for the
    # transform form that filter re-inlines the whole shingle construction
    # (split+filter re-evaluated per element) below the exchange — ~16x
    # slower. The index form's inferred filter is pure arithmetic.
    terms = ", ".join(f"w[i+{k}]" for k in range(n))
    out = words.select(
        "doc_id", "w",
        F.explode(F.expr(f"sequence(0, size(w) - {n})")).alias("i"),
    ).select("doc_id", F.expr(f"concat_ws(' ', {terms})").alias("shingle"))
    return out.distinct() if distinct else out


def minhash_signatures(sh: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh15) over a (doc_id, shingle) frame. The shingle hash
    is projected once per row (Catalyst does not CSE the md5 across the 16
    min-aggregates)."""
    hashed = sh.select("doc_id", h32(F.col("shingle")).alias("_h"))
    aggs = [
        F.min((F.lit(a) * F.col("_h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_AB)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def _band_expr(j: int) -> "F.Column":
    """Polynomial bucket id for band j over its LSH_ROWS signature rows."""
    expr = F.col(f"mh{j * LSH_ROWS}")
    for r in range(1, LSH_ROWS):
        expr = expr * 31 + F.col(f"mh{j * LSH_ROWS + r}")
    return F.concat_ws(":", F.lit(str(j)), expr % 1000003)


def lsh_bands(mh: DataFrame) -> DataFrame:
    """(doc_id, bucket), one row per band — the O(n) banding step."""
    return mh.select(
        "doc_id",
        F.explode(F.array(*[_band_expr(j) for j in range(LSH_BANDS)])).alias("bucket"),
    )


def lsh_buckets(mh: DataFrame) -> DataFrame:
    """Candidate buckets (cnt > 1). O(n) — the scale path vs the O(n^2)
    join."""
    return (
        lsh_bands(mh).groupBy("bucket").agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def lsh_candidate_pairs(mh: DataFrame) -> DataFrame:
    """Distinct (d1 < d2) pairs sharing at least one band bucket. The
    bucket-equality self-join is O(sum of bucket-size^2) — bounded by the
    banding collision rate, NOT by corpus shingle frequencies."""
    # materialize the (tiny, 4 rows/doc) banding once: the self-join
    # references it twice and one side is broadcast, which defeats
    # exchange reuse — without this the whole minhash aggregation ran
    # twice (r6; localCheckpoint, not persist — see jaccard_pairs_lsh)
    bands = local_ckpt(lsh_bands(mh), eager=True)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )


def jaccard_for_candidates(sh: DataFrame, candidates: DataFrame,
                           threshold: float = 0.1) -> DataFrame:
    """Exact n-gram Jaccard restricted to candidate (d1, d2) pairs — the
    LSH verify stage. Intersections come from joining each side's shingle
    set through the candidate frame ((d1) then (d2, shingle) join keys), so
    work scales with |candidates| x shingles-per-doc; there is NO all-pairs
    shingle self-join. At 100 TB a hot shingle cannot explode this plan:
    the candidate set gates everything."""
    # r6 (guide §3.2): every shingle of a NON-candidate doc is dead weight
    # in the verify joins — prune the corpus-sized side with a broadcast
    # semi-join on the distinct candidate doc ids before anything is
    # shuffled (the PySpark stand-in for a Bloom-filter pre-filter; the id
    # set is strictly smaller than the candidate pair set the next join
    # ships anyway). candidates is referenced three times, so materialize
    # it once (localCheckpoint, not persist — see jaccard_pairs_lsh).
    candidates = local_ckpt(candidates, eager=True)
    ids = (candidates.select(F.col("d1").alias("doc_id"))
           .union(candidates.select(F.col("d2").alias("doc_id")))
           .distinct())
    sh = sh.join(F.broadcast(ids), "doc_id", "leftsemi")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    s1 = sh.select(F.col("doc_id").alias("d1"), "shingle")
    s2 = sh.select(F.col("doc_id").alias("d2"), "shingle")
    inter = (
        candidates.join(s1, "d1")
        .join(s2, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("sz2"))
    return (
        inter.join(sa, "d1").join(sb, "d2")
        .withColumn("jac", F.round(F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")), 4))
        .filter(F.col("jac") >= threshold)
        .select("d1", "d2", "jac")
    )


def jaccard_pairs_lsh(sh: DataFrame, threshold: float = 0.1) -> DataFrame:
    """MinHash -> LSH banding -> candidate pairs -> exact Jaccard verify.
    The production near-dup plan: O(n) banding + candidate-gated verify.

    The shingle relation feeds FOUR subtrees (minhash, sizes, both verify
    sides); without materialization Catalyst re-evaluates the whole
    explode+distinct pipeline for each (r5 plan: 12 scans, 0 reused
    exchanges). One localCheckpoint computes it once per invocation
    (guide §2.4 'share one exchange'; §5 localCheckpoint) — deliberately
    NOT persist(): the CacheManager would match identical plans across
    queries and turn this into cross-query result reuse. The pipeline
    checkpoints (shingles/bands/candidates) are EAGER on purpose: lazy
    checkpoints defer the whole verify DAG into one materialization whose
    concurrent AQE stages (parallel broadcast builds + wide sorts)
    exhausted the unified memory pool at 4x bench scale; sequential
    materialization bounds the peak, and the A/B at sf1.0 measured the
    extra jobs as free (ngram 6.47 s eager vs 6.43 s lazy)."""
    shc = local_ckpt(sh, eager=True)
    return jaccard_for_candidates(
        shc, lsh_candidate_pairs(minhash_signatures(shc)), threshold)


def connected_components(edges: DataFrame, max_iter: int = 64) -> DataFrame:
    """(doc_id, component) over an undirected edge list (d1, d2) — component
    is the MIN doc_id in each component (deterministic canonical label).
    Only nodes appearing in at least one edge are returned (singletons have
    no near-dup cluster).

    This is the step after near-dup pair generation in a dedup pipeline:
    pairs say 'a~b, b~c'; keeping one doc per CLUSTER needs the transitive
    closure. Algorithm: min-label propagation with pointer jumping
    (comp := comp[comp] each round, the parallel path-halving of a
    distributed union-find), so convergence is O(log diameter) rounds, not
    O(diameter) — a 1M-doc near-dup chain converges in ~20 rounds where
    naive propagation needs 1M. Each round is two key-joins + a groupBy
    (all partial-aggregated); labels are localCheckpoint'd per round to
    truncate the iterative lineage (at cluster scale, checkpoint to the
    reliable store instead). Invariant comp(x) <= x (labels only decrease,
    monotone => convergent); termination is an exact did-any-label-change
    existence check (limit(1) short-circuits the scan), not a checksum."""
    e = (edges.select(F.col("d1").cast("long").alias("u"),
                      F.col("d2").cast("long").alias("v"))
         .filter(F.col("u") != F.col("v")))
    e = local_ckpt(
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct())
    lab = local_ckpt(
        e.groupBy("u").agg(F.min("v").alias("nmin"))
        .select(F.col("u").alias("id"),
                F.least("u", "nmin").alias("comp")))
    # exact convergence check without a per-round join (r6, guide §2.6 /
    # fewer jobs per round): labels are monotone non-increasing, so the
    # label sum strictly decreases on any change and is unchanged iff the
    # round was a no-op. Decimal(38) sum is overflow-free for arbitrary
    # long ids, so the check is exact, not a checksum. Checkpoints are
    # LAZY: the sum action both materializes the round's labels and
    # computes the check — ONE Spark job per round (r5: three).
    _sum = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]
    prev_sum = _sum(lab)
    for _ in range(max_iter):
        # propagate the neighbor's current label across each edge…
        via = (e.join(lab.withColumnRenamed("id", "v"), "v")
               .select(F.col("u").alias("id"), "comp"))
        lab2 = lab.union(via).groupBy("id").agg(F.min("comp").alias("comp"))
        # …then jump: comp := comp(comp). Every comp value is itself a node
        # id present in lab (it is the min of a set of node ids), so the
        # self-join always resolves; coalesce guards the root row join.
        # lab2 appears on both join sides, but both sides end in the SAME
        # hashpartitioning(id) exchange, so the propagate aggregation is
        # computed once and the second reference is a ReusedExchange —
        # one checkpoint per round instead of r5's two (plan-asserted in
        # tests/test_plan_quality.py).
        j = lab2.select(F.col("id").alias("comp"),
                        F.col("comp").alias("jumped"))
        lab2 = local_ckpt(
            lab2.join(j, "comp", "left")
            .select("id", F.coalesce("jumped", "comp").alias("comp")))
        cur_sum = _sum(lab2)
        changed = cur_sum != prev_sum
        lab, prev_sum = lab2, cur_sum
        if not changed:
            return lab.select(F.col("id").alias("doc_id"),
                              F.col("comp").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "pointer jumping bounds rounds by O(log n); this input either has "
        f"more than 2^{max_iter} nodes or labels are not monotone (bug)")


def near_dup_clusters(sh: DataFrame, threshold: float = 0.1) -> DataFrame:
    """Near-duplicate clusters over a shingle frame: MinHash -> LSH banding
    -> candidate pairs -> exact Jaccard verify -> connected components.
    The full production dedup plan; downstream keeps min(doc_id) per
    component and drops the rest."""
    pairs = jaccard_pairs_lsh(sh, threshold).select("d1", "d2")
    return connected_components(pairs)


def jaccard_pairs(sh: DataFrame, threshold: float = 0.1) -> DataFrame:
    """Exact all-pairs n-gram Jaccard (self-join on shingle). SMALL-DATA
    ORACLE ONLY: on a Zipfian shingle distribution the self-join is
    O(sum df^2) and does not survive scale — use `jaccard_pairs_lsh` (or
    `jaccard_for_candidates` with your own candidates) in pipelines."""
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
    """(doc_id, simhash_lo, simhash_hi) 64-bit SimHash over a
    (doc_id, token, tf) frame, carried as two 32-bit halves (see
    _SIMHASH_HALF note above). Bits 0-31 draw from h32(token), bits 32-63
    from an independently salted h32(token || '#2'); bit tests via modulo
    keep the expression portable to ANSI SQL."""
    # hash each token ONCE per half in a projection (Catalyst does not CSE
    # the md5 across the 64 aggregate expressions — without this the plan
    # computes 64 md5s per row)
    hashed = postings.select(
        "doc_id",
        "tf",
        h32(F.col("token")).alias("_hlo"),
        h32(F.concat(F.col("token"), F.lit("#2"))).alias("_hhi"),
    )
    bit_sums = []
    for j in range(SIMHASH_BITS):
        h = F.col("_hlo") if j < _SIMHASH_HALF else F.col("_hhi")
        jj = j % _SIMHASH_HALF
        bit_sums.append(
            F.sum(
                F.when((h % F.lit(1 << (jj + 1))) >= F.lit(1 << jj), F.col("tf"))
                .otherwise(-F.col("tf"))
            ).alias(f"s{j}")
        )
    agg = hashed.groupBy("doc_id").agg(*bit_sums)

    def _half(lo: int) -> "F.Column":
        sim = None
        for j in range(lo, lo + _SIMHASH_HALF):
            term = F.when(F.col(f"s{j}") > 0, F.lit(1 << (j - lo))).otherwise(F.lit(0))
            sim = term if sim is None else sim + term
        return sim.cast("long")

    return agg.select(
        "doc_id",
        _half(0).alias("simhash_lo"),
        _half(_SIMHASH_HALF).alias("simhash_hi"),
    )


def simhash_hamming(col_a_lo, col_a_hi, col_b_lo, col_b_hi) -> "F.Column":
    """Hamming distance between two 64-bit SimHashes stored as 32-bit
    halves: popcount(lo XOR lo') + popcount(hi XOR hi')."""
    return F.bit_count(col_a_lo.bitwiseXOR(col_b_lo)) + F.bit_count(
        col_a_hi.bitwiseXOR(col_b_hi)
    )


def repetition_metrics(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    Models" §A1.1 repetition filters — a standard LLM-training-data quality
    gate): per doc, the fraction of duplicate words and duplicate word
    n-grams (n=2,3). High duplicate-n-gram fractions mark boilerplate,
    keyword stuffing, and degenerate generations.

        dup_word_frac  = 1 - distinct(words)  / count(words)
        dup_ngram_frac = 1 - distinct(ngrams) / count(ngrams)   (0 if none)

    Entirely per-row array expressions (split/transform/array_distinct) in
    one JVM codegen projection — NO explode, NO shuffle, embarrassingly
    parallel at any corpus size (the scale contrast to shingles(): shingle
    JOINS need the exploded relation; per-doc ratios never do)."""
    from .spark_util import ensure_parallelism

    df = ensure_parallelism(df)
    words = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    out = df.select(F.col(id_col).alias("doc_id"), words.alias("w"))
    cols = [
        F.size("w").alias("n_words"),
        F.when(F.size("w") > 0,
               F.round(1.0 - F.size(F.array_distinct("w")) / F.size("w"), 4))
        .otherwise(0.0).alias("dup_word_frac"),
    ]
    for n in (2, 3):
        terms = ", ".join(f"w[i+{k}]" for k in range(n))
        grams = F.expr(
            f"transform(sequence(0, size(w) - {n}), i -> concat_ws(' ', {terms}))"
        )
        cols.append(
            F.when(F.size("w") >= n,
                   F.round(1.0 - F.size(F.array_distinct(grams))
                           / (F.size("w") - n + 1), 4))
            .otherwise(0.0).alias(f"dup_{n}gram_frac")
        )
    return out.select("doc_id", *cols)


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


def winnow_fingerprints(df: DataFrame, k: int = 8, w: int = 4,
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every k-char gram, slide a w-hash window, select each
    window's minimum hash. Guarantee: any shared substring of length
    >= w + k - 1 contributes at least one shared fingerprint, so plagiarism/
    boilerplate detection reduces to an equi-join on (fp). Entirely JVM
    codegen (transform over sequence + slice + array_min); the distinct
    selected set collapses window ties by value, so no positional tie rule
    is needed."""
    from pyspark.sql import Window

    from .spark_util import ensure_parallelism

    df = ensure_parallelism(df)
    text = F.col(text_col)
    n = F.length(text)
    # explode the gram START INDEX and hash the substring per exploded row:
    # each gram is hashed exactly once, and no per-row hash ARRAY exists for
    # Catalyst to re-inline (exploding a transform()-built array triggers an
    # inferred size()>0 filter that rebuilds the whole array a second time;
    # nested transform+slice window-mins would even make it O(n^2)/doc).
    # r6 note: an all-array zero-exchange form (transform + slice/array_min
    # + array_distinct + explode_outer) was built and A/B-measured at
    # 5.5 s vs 2.5 s for this form at sf1.0 — higher-order array functions
    # are interpreted, not codegen'd, so the per-row md5 projection below
    # beats the "shuffle-free" plan. Kept as-is deliberately.
    rows = (
        df.filter(n >= k + w - 1)
        .select(
            F.col(id_col).alias("doc_id"),
            text.alias("_t"),
            F.explode(F.sequence(F.lit(1), n - k + 1)).alias("_i"),
        )
        .select(
            "doc_id",
            (F.col("_i") - 1).alias("pos"),
            h32(F.col("_t").substr(F.col("_i"), F.lit(k))).alias("h"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    n_grams = Window.partitionBy("doc_id")
    return (
        rows.withColumn("fp", F.min("h").over(win))
        .withColumn("_n", F.count("*").over(n_grams))
        .filter(F.col("pos") <= F.col("_n") - w)  # full windows only (pos 0-based)
        .select("doc_id", "fp")
        .distinct()
    )


# characteristic character trigrams per language (whatlang-style profile,
# reduced to the highest-signal entries; counting is exact and portable to
# ANSI SQL via replace-length arithmetic)
LANG_TRIGRAMS = {
    "eng": ["the", "and", "ing", "ion", "to "],
    "deu": ["der", "und", "sch", "ein", "ich"],
    "fra": ["les", "ent", "de ", "que", "ait"],
    "spa": ["que", "los", "de ", "ado", "cion"],
}
_LANG_ORDER = list(LANG_TRIGRAMS)


def _trigram_count(text_col, gram: str) -> "F.Column":
    return (
        (F.length(text_col) - F.length(F.replace(text_col, F.lit(gram))))
        / len(gram)
    ).cast("long")


def lang_id_ngram(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Character-n-gram language ID over a text column: per-language score =
    total occurrences of that language's characteristic trigrams; winner by
    score with a fixed language-order tie-break. One projection, all JVM
    codegen (replace/length), no Python."""
    from .spark_util import ensure_parallelism

    df = ensure_parallelism(df)
    text = F.lower(F.col(text_col))
    scores = {
        lang: sum(
            (_trigram_count(text, g) for g in grams), F.lit(0).cast("long")
        ).alias(f"s_{lang}")
        for lang, grams in LANG_TRIGRAMS.items()
    }
    scored = df.select(F.col(id_col).alias("doc_id"), *scores.values())
    mx = F.greatest(*[F.col(f"s_{lang}") for lang in _LANG_ORDER])
    best = F
    for lang in _LANG_ORDER:  # chained when = first-match tie-break
        best = best.when(F.col(f"s_{lang}") == mx, lang)
    return scored.select("doc_id", best.alias("lang"), mx.alias("score"))
