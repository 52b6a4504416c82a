"""End-to-end: build index on the synthetic source-code corpus, query with
TAAT + WAND, assert rank-identity vs. the single-node oracle (SURVEY.md §7.1
M1), plus resume-equivalence."""

import shutil
import tempfile

import pytest

from sparkft.corpus import generate_corpus
from sparkft.index_build import build_index
from sparkft.oracle import BruteForceIndex
from sparkft.search import IndexReader, taat_topk, wand_topk


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-tests")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(400, seed=42)


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx"))
    df = spark.createDataFrame(corpus).repartition(4)
    res = build_index(spark, df, out, num_shards=2, num_buckets=8)
    return out, res


QUERIES = [
    "import",                # hot keyword
    "fn",                    # hot keyword
    "parse config",          # two-term
    "parseConfig",           # camelCase form -> tokens [parse, config]
    "parse_config",          # snake_case form -> same tokens
    "tokenIndex merge",      #
    "zebra missing token",   # mostly-missing terms
    "self self self",        # duplicate terms
]


def test_build_stats(index, corpus):
    out, res = index
    assert res.n_docs == len(corpus)
    assert res.n_postings > 0
    assert res.avgdl > 1


def test_rank_identity_vs_oracle(spark, corpus, index):
    out, res = index
    reader = IndexReader(spark, out)
    # oracle over (doc_id, content) with engine's doc_id derivation
    from pyspark.sql import functions as F

    df = spark.createDataFrame(corpus).withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit")
    )
    rows = df.select("doc_id", "content").collect()
    oracle = BruteForceIndex([r["doc_id"] for r in rows], [r["content"] for r in rows])
    assert oracle.N == reader.N
    assert oracle.avgdl == pytest.approx(reader.avgdl, abs=0)

    for q in QUERIES:
        expected = oracle.topk(q, 10)
        got = taat_topk(reader, q, 10)
        assert got == expected, f"TAAT mismatch for {q!r}"
        got_w = wand_topk(reader, q, 10)
        assert got_w == expected, f"WAND mismatch for {q!r}"


def test_wand_equals_taat_large_k(spark, index):
    out, _ = index
    reader = IndexReader(spark, out)
    for q in ["import fn def", "self return"]:
        assert wand_topk(reader, q, 50) == taat_topk(reader, q, 50)


def test_resume_produces_identical_segments(spark, corpus, tmp_path):
    import os

    out = str(tmp_path / "idx2")
    df = spark.createDataFrame(corpus).repartition(4)
    res1 = build_index(spark, df, out, num_shards=2, num_buckets=8)
    # simulate a crash after shard 0: delete shard-1 manifest + output
    os.remove(f"{out}/manifests/shard-1.json")
    shutil.rmtree(f"{out}/postings_raw/shard=1")
    shutil.rmtree(f"{out}/segments")
    res2 = build_index(spark, df, out, num_shards=2, num_buckets=8, resume=True)
    assert res2.n_docs == res1.n_docs
    assert res2.n_postings == res1.n_postings
    # identical query results after resume
    reader = IndexReader(spark, out)
    from sparkft.oracle import BruteForceIndex
    from pyspark.sql import functions as F

    rows = (
        spark.createDataFrame(corpus)
        .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .select("doc_id", "content")
        .collect()
    )
    oracle = BruteForceIndex([r["doc_id"] for r in rows], [r["content"] for r in rows])
    assert taat_topk(reader, "import config", 10) == oracle.topk("import config", 10)


def test_sha_invariant_enforced(spark, corpus, index):
    # the build ran with verify_sha=True and did not raise -> invariant held
    out, res = index
    import json

    stats = json.load(open(f"{out}/stats.json"))
    assert stats["n_docs"] == len(corpus)


def test_wand_block_decode_is_lazy(spark, tmp_path, monkeypatch):
    """WAND must not decode every block. Skewed corpus: 'common' appears in
    all 3000 docs (~24 blocks), 'zzrare' in 3. For 'zzrare common' with k=3
    the heap fills with rare+common docs, the common list's upper bound
    falls below the threshold, and the skip pointers (block_last) leap the
    common cursor over whole undecoded blocks."""
    rows = []
    for i in range(3000):
        # explicit doc_ids cluster the rare docs at the head of the sorted
        # posting list, so the common list's tail blocks are never entered
        extra = " zzrare" if i < 30 else ""
        rows.append(
            {"doc_id": i, "repo": "r", "path": f"f{i}.txt", "commit": "c",
             "content": f"common filler{i % 97} text{extra}"}
        )
    out = str(tmp_path / "lazyidx")
    df = spark.createDataFrame(rows).repartition(4)
    build_index(spark, df, out, num_shards=1, num_buckets=4,
                doc_id_col="doc_id", verify_sha=False)
    reader = IndexReader(spark, out)
    # pin the PRUNING machinery itself: the adaptive serving layer would
    # route this tiny corpus (sum_df ~3k) straight to the vectorized
    # exhaustive pass — right call at serving time, not what this asserts
    import sparkft.search as _search
    monkeypatch.setattr(_search, "_EXHAUSTIVE_CUTOFF", 0)
    monkeypatch.setattr(_search, "_WAND_BAIL_CHECK", 1 << 30)
    stats: dict = {}
    got = wand_topk(reader, "zzrare common", 3, stats=stats)
    assert got == taat_topk(reader, "zzrare common", 3)
    assert stats["blocks_total"] >= 20
    assert stats["blocks_decoded"] < stats["blocks_total"] // 2, stats
    assert not stats.get("bailed_to_exhaustive", False)


def test_distributed_topk_equals_driver_loop(spark, corpus, index):
    from sparkft.search import distributed_topk

    out, _ = index
    reader = IndexReader(spark, out)
    got = {}
    df = distributed_topk(spark, out, QUERIES, k=10, parallelism=4)
    for r in df.collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, q in enumerate(QUERIES):
        expected = [(i + 1, d, s) for i, (d, s) in enumerate(wand_topk(reader, q, 10))]
        assert sorted(got.get(qid, [])) == expected, q


def test_cjk_index_rank_identity(spark, tmp_path):
    """Full engine path over a CJK corpus: UTF-8 tokens through tokenize ->
    salted merge -> varint segments -> WAND, rank-identical to the
    single-node scorer (which shares only the tokenizer, not the index)."""
    base = [
        "人民的意志是政府权力的基础 这是真正的选举",
        "関西国際空港限定トートバッグ を買いました",
        "한국어의형태해석을실시할수있습니다 좋습니다",
        "夏天像是哼着小曲的少年 每一种灿烂的颜色",
        "政府 の データ システム と 선생님",
    ]
    rows = []
    for i in range(60):
        rows.append({
            "doc_id": i,
            "text": base[i % len(base)] + f" doc{i} extra{i % 7}",
        })
    df = spark.createDataFrame(rows)
    out = str(tmp_path / "cjkidx")
    build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                num_shards=2, num_buckets=4)
    oracle = BruteForceIndex([r["doc_id"] for r in rows],
                             [r["text"] for r in rows])
    reader = IndexReader(spark, out)
    # note: a kanji-only query (e.g. "関西 空港") detects as Chinese (no
    # kana) and kVariant-folds differently from the Japanese-detected
    # document — the reference behaves the same way; the Japanese query
    # must carry kana for jpn dispatch
    for q in ["人民 政府", "トート 空港", "한국어 형태", "颜色", "データ extra1"]:
        expected = oracle.topk(q, 10)
        assert expected, q  # query must actually match documents
        assert taat_topk(reader, q, 10) == expected, q
        assert wand_topk(reader, q, 10) == expected, q


def test_conjunctive_topk(spark, corpus, index):
    from sparkft.index_build import i64_to_u64
    from sparkft.search import conjunctive_topk

    out, _ = index
    reader = IndexReader(spark, out)
    for q in ["import fn", "parse config", "self return def", "zebra import"]:
        terms = reader.query_terms(q)
        postings = reader.load_postings(terms)
        if len(postings) < len(terms):
            expected = []
        else:
            member = [set(u64_to_i64_set(p[0])) for p in postings.values()]
            all_scored = taat_topk(reader, q, 10**6)
            expected = [
                (d, s) for d, s in all_scored if all(d in m for m in member)
            ][:10]
        got = conjunctive_topk(reader, q, 10)
        assert got == expected, q


def u64_to_i64_set(ids_u64):
    from sparkft.index_build import u64_to_i64

    return u64_to_i64(ids_u64).tolist()


def test_wand_degenerate_bailout_equals_taat(spark, tmp_path, monkeypatch):
    """On flat score distributions (every term in most docs) WAND decays to
    a k-way merge; the runtime check must bail to the vectorized exhaustive
    pass with IDENTICAL results — including tombstone and allowed-set
    gating."""
    from sparkft.index_build import delete_docs
    from sparkft.search import wand_topk_terms

    rows = [{"doc_id": i, "repo": "r", "path": f"f{i}.txt", "commit": "c",
             "content": f"alpha beta gamma w{i % 13}" + " alpha" * (i % 5)}
            for i in range(3000)]
    out = str(tmp_path / "flatidx")
    build_index(spark, spark.createDataFrame(rows).repartition(4), out,
                num_shards=1, num_buckets=4, doc_id_col="doc_id",
                verify_sha=False)
    delete_docs(out, [5, 17, 2900])
    reader = IndexReader(spark, out)

    import sparkft.search as _search
    # force the RUNTIME bailout branch (not the upfront cutoff, and not the
    # selective-filter candidate-driven plan — tested separately below)
    monkeypatch.setattr(_search, "_EXHAUSTIVE_CUTOFF", 0)
    monkeypatch.setattr(_search, "_WAND_BAIL_CHECK", 64)
    monkeypatch.setattr(_search, "_FILTER_DRIVE_FACTOR", 1 << 30)
    allowed = set(range(0, 3000, 3))
    for allow in (None, allowed):
        stats: dict = {}
        got = wand_topk_terms(reader, ["alpha", "beta", "gamma"], 10,
                              stats=stats, allowed=allow)
        assert stats.get("bailed_to_exhaustive"), stats
        monkeypatch.setattr(_search, "_WAND_BAIL_CHECK", 1 << 30)
        pure = wand_topk_terms(reader, ["alpha", "beta", "gamma"], 10,
                               allowed=allow)
        monkeypatch.setattr(_search, "_WAND_BAIL_CHECK", 64)
        assert got == pure
        assert all(d not in (5, 17, 2900) for d, _ in got)
    # the candidate-driven filtered plan must agree with all of the above
    monkeypatch.setattr(_search, "_FILTER_DRIVE_FACTOR", 8)
    stats = {}
    driven = wand_topk_terms(reader, ["alpha", "beta", "gamma"], 10,
                             stats=stats, allowed=allowed)
    assert stats.get("filter_driven"), stats
    assert driven == pure
