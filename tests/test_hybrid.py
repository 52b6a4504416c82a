"""Hybrid keyword+semantic search (sparkft.hybrid — Meilisearch's
`hybrid`/semanticRatio): independent pure-python brute-force parity, the
ratio=0/ratio=1 edge cases, tombstone exclusion, and the IVF-merged scale
path at probes=ALL (where it must equal the exact path)."""

import math

import numpy as np
import pytest

from sparkft.hybrid import hybrid_topk, hybrid_topk_ivf
from sparkft.index_build import build_index, delete_docs
from sparkft.search import IndexReader

WORDS = ["merge", "sort", "table", "scan", "join", "filter",
         "hash", "row", "key", "value"]
QUERY = "merge sort"
N, DIM = 120, 16
K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-hybrid")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    rng = np.random.default_rng(7)
    texts = [
        " ".join(rng.choice(WORDS, size=int(rng.integers(5, 25))).tolist())
        for _ in range(N)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = str(tmp_path_factory.mktemp("hidx"))
    build_index(spark, docs, out, text_col="text", doc_id_col="doc_id",
                num_shards=2, num_buckets=4, verify_sha=False)
    emb = rng.normal(size=(N, DIM))
    ids = np.arange(N, dtype=np.int64)
    qvec = rng.normal(size=DIM)
    return IndexReader(spark, out), ids, emb, qvec, texts


def brute_hybrid(texts, ids, emb, qvec, ratio, k, exclude=frozenset()):
    """Independent oracle: BM25 from split() token counts (the corpus is
    plain lowercase words, so tokenizer output == split), cosine in plain
    python loops, the module's documented formula on top."""
    toks = [t.split() for t in texts]
    n = len([i for i in ids if int(i) not in exclude])
    dls = {int(i): len(toks[int(i)]) for i in ids}
    avgdl = sum(len(toks[int(i)]) for i in ids if int(i) not in exclude) / n
    terms = QUERY.split()
    df = {
        w: sum(1 for i in ids if int(i) not in exclude and w in toks[int(i)])
        for w in terms
    }
    kw = {}
    for i in ids:
        d = int(i)
        if d in exclude:
            continue
        s = 0.0
        for w in sorted(terms):
            tf = toks[d].count(w)
            if tf == 0 or df[w] == 0:
                continue
            idf = math.log1p((n - df[w] + 0.5) / (df[w] + 0.5))
            s += idf * (tf * (K1 + 1.0)
                        / (tf + K1 * (1.0 - B + B * dls[d] / avgdl)))
        if s > 0:
            kw[d] = s
    mx = max(kw.values()) if kw else 0.0
    rows = []
    qn = math.sqrt(sum(x * x for x in qvec))
    for pos, i in enumerate(ids):
        d = int(i)
        if d in exclude:
            continue
        e = emb[pos]
        cos = float(np.dot(e, qvec)) / (math.sqrt(float(np.dot(e, e))) * qn)
        sem = (1.0 + cos) / 2.0
        kwn = (kw.get(d, 0.0) / mx) if mx > 0 else 0.0
        rows.append((d, round((1.0 - ratio) * kwn + ratio * sem, 4)))
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows[:k]


def test_brute_force_parity(setup):
    reader, ids, emb, qvec, texts = setup
    got = hybrid_topk(reader, QUERY, ids, emb, qvec, k=15, ratio=0.5)
    want = brute_hybrid(texts, ids, emb, qvec, 0.5, 15)
    assert [d for d, _ in got] == [d for d, _ in want]
    assert got == pytest.approx(want)


def test_ratio_zero_is_pure_keyword(setup):
    reader, ids, emb, qvec, texts = setup
    got = hybrid_topk(reader, QUERY, ids, emb, qvec, k=10, ratio=0.0)
    want = brute_hybrid(texts, ids, emb, qvec, 0.0, 10)
    assert got == pytest.approx(want)


def test_ratio_one_is_pure_semantic(setup):
    reader, ids, emb, qvec, texts = setup
    got = hybrid_topk(reader, QUERY, ids, emb, qvec, k=10, ratio=1.0)
    want = brute_hybrid(texts, ids, emb, qvec, 1.0, 10)
    assert got == pytest.approx(want)
    # ratio=1 order must equal cosine order
    cos = (emb @ qvec) / (np.linalg.norm(emb, axis=1) * np.linalg.norm(qvec))
    order = np.lexsort((ids, -np.round((1 + cos) / 2, 4)))[:10]
    assert [d for d, _ in got] == [int(ids[i]) for i in order]


def test_no_matching_terms_is_semantic_only(setup):
    reader, ids, emb, qvec, _ = setup
    got = hybrid_topk(reader, "zzzzunknown", ids, emb, qvec, k=5, ratio=0.5)
    sem = hybrid_topk(reader, "zzzzunknown", ids, emb, qvec, k=5, ratio=1.0)
    assert [d for d, _ in got] == [d for d, _ in sem]
    # kw side contributes 0: scores are half the ratio=1 scores (each side
    # rounds to 4dp independently, so allow one rounding quantum)
    for (_, a), (_, b) in zip(got, sem):
        assert a == pytest.approx(0.5 * b, abs=1e-4)


def test_ivf_merge_equals_exact_at_probes_all(spark, setup):
    from pyspark.sql import functions as F

    from sparkft.ann import ivf_build

    reader, ids, emb, qvec, _ = setup
    edf = spark.createDataFrame(
        [(int(i), [float(x) for x in emb[p]]) for p, i in enumerate(ids)],
        "vec_id long, embedding array<double>",
    )
    assigned, cents = ivf_build(spark, edf, n_centroids=4)
    got = hybrid_topk_ivf(reader, QUERY, ids, emb, assigned, cents, qvec,
                          k=10, ratio=0.5, probes=len(cents))
    want = hybrid_topk(reader, QUERY, ids, emb, qvec, k=10, ratio=0.5)
    assert got == pytest.approx(want)


def test_tombstones_excluded(spark, setup, tmp_path_factory):
    reader, ids, emb, qvec, texts = setup
    base = hybrid_topk(reader, QUERY, ids, emb, qvec, k=3, ratio=0.5)
    dead = {base[0][0]}
    delete_docs(reader.dir, list(dead))
    reader2 = IndexReader(spark, reader.dir)
    got = hybrid_topk(reader2, QUERY, ids, emb, qvec, k=10, ratio=0.5)
    assert all(d not in dead for d, _ in got)
    # NOTE live-until-merge: stats keep the deleted doc until compaction,
    # so the surviving docs' kw side is unchanged — compare against the
    # brute oracle computed over the FULL corpus, then filtered.
    want = [r for r in brute_hybrid(texts, ids, emb, qvec, 0.5, N)
            if r[0] not in dead][:10]
    assert got == pytest.approx(want)


def test_embedding_set_parity(spark, setup):
    """EmbeddingSet (precomputed unit-normalized serving form) must return
    BIT-IDENTICAL results to the direct arrays path, including under
    tombstones, shuffled input order, and zero-norm rows."""
    from sparkft.hybrid import EmbeddingSet

    reader, ids, emb, qvec, _ = setup
    # note: module-ordered after test_tombstones_excluded, so the index
    # carries a tombstone here — good: the live-mask path is exercised
    rng = np.random.default_rng(99)
    perm = rng.permutation(len(ids))
    emb2 = emb.copy()
    emb2[7] = 0.0  # zero-norm row -> cosine 0, not NaN
    es = EmbeddingSet(ids[perm], emb2[perm])  # arbitrary input order
    direct = hybrid_topk(reader, QUERY, ids, emb2, qvec, k=12, ratio=0.5)
    via_set = hybrid_topk(reader, QUERY, None, es, qvec, k=12, ratio=0.5)
    assert via_set == direct
    # ratio edges through the set too
    for r in (0.0, 1.0):
        assert hybrid_topk(reader, QUERY, None, es, qvec, k=5, ratio=r) == \
            hybrid_topk(reader, QUERY, ids, emb2, qvec, k=5, ratio=r)


def test_exclusion_pool_plan_has_no_literal_id_list(spark):
    """VERDICT r4 item 5: candidate AND tombstone exclusion are broadcast
    left-anti joins — no isin literal id list in the plan."""
    import numpy as np

    from sparkft.hybrid import _exclusion_pool

    df = spark.range(1000).withColumnRenamed("id", "vec_id")
    cand = np.arange(0, 50, dtype=np.int64)
    dead = np.arange(900, 960, dtype=np.int64)
    pool = _exclusion_pool(df, "vec_id", cand, dead)
    plan = pool._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LeftAnti") == 2
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert " IN (" not in plan and "vec_id#0L INSET" not in plan
    got = {r[0] for r in pool.collect()}
    assert got == set(range(50, 900)) | set(range(960, 1000))
    # empty/None sets are no-ops
    assert _exclusion_pool(df, "vec_id", np.empty(0, np.int64), None) is df


def test_allowed_filter_gates_both_sides(setup):
    """Meilisearch filter composed with hybrid (v1.11 vector-store
    filtering): the ranked universe AND the keyword max-normalization are
    restricted to admissible docs, while BM25 stats (N, avgdl, df) stay
    GLOBAL — the same contract as filtered keyword search."""
    reader, ids, emb, qvec, texts = setup
    allowed = {d for d in range(N) if d % 3 == 0}
    got = hybrid_topk(reader, QUERY, ids, emb, qvec, k=10, ratio=0.5,
                      allowed=allowed)
    assert got and all(d in allowed for d, _ in got)
    # brute: GLOBAL-stats BM25, then gate + renormalize over allowed
    toks = [t.split() for t in texts]
    terms = QUERY.split()
    avgdl = sum(len(t) for t in toks) / N
    df = {w: sum(1 for t in toks if w in t) for w in terms}
    kw = {}
    for d in range(N):
        s = 0.0
        for w in sorted(terms):
            tf = toks[d].count(w)
            if tf and df[w]:
                idf = math.log1p((N - df[w] + 0.5) / (df[w] + 0.5))
                s += idf * (tf * (K1 + 1.0)
                            / (tf + K1 * (1.0 - B + B * len(toks[d]) / avgdl)))
        if s > 0 and d in allowed:
            kw[d] = s
    mx = max(kw.values()) if kw else 0.0
    qn = math.sqrt(sum(x * x for x in qvec))
    rows = []
    for d in sorted(allowed):
        e = emb[d]
        cos = float(np.dot(e, qvec)) / (math.sqrt(float(np.dot(e, e))) * qn)
        sem = (1.0 + cos) / 2.0
        kwn = (kw.get(d, 0.0) / mx) if mx > 0 else 0.0
        rows.append((d, round(0.5 * kwn + 0.5 * sem, 4)))
    rows.sort(key=lambda t: (-t[1], t[0]))
    assert got == pytest.approx(rows[:10])
    # empty admissible set -> no hits
    assert hybrid_topk(reader, QUERY, ids, emb, qvec, k=10,
                       allowed=set()) == []
    # EmbeddingSet path gives identical results
    from sparkft.hybrid import EmbeddingSet

    es = EmbeddingSet(ids, emb)
    got_es = hybrid_topk(reader, QUERY, None, es, qvec, k=10, ratio=0.5,
                         allowed=allowed)
    assert got_es == got
