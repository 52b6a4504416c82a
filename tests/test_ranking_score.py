"""showRankingScore / rankingScoreThreshold (sparkft.search.
ranking_score_topk + the SearchService surface): normalization model,
threshold semantics, tombstones/filters, and service composition."""

import numpy as np
import pytest

from sparkft.index_build import build_index, delete_docs
from sparkft.search import IndexReader, ranking_score_topk, taat_topk

WORDS = ["merge", "sort", "table", "scan", "join", "filter",
         "hash", "row", "key", "value"]
QUERY = "merge sort"


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-rankscore")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def reader(spark, tmp_path_factory):
    rng = np.random.default_rng(11)
    texts = [
        " ".join(rng.choice(WORDS, size=int(rng.integers(5, 30))).tolist())
        for _ in range(150)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = str(tmp_path_factory.mktemp("ridx"))
    build_index(spark, docs, out, text_col="text", doc_id_col="doc_id",
                num_shards=2, num_buckets=4, verify_sha=False)
    return IndexReader(spark, out)


def test_normalization_and_order_match_taat(reader):
    got = ranking_score_topk(reader, QUERY, 10)
    want = taat_topk(reader, QUERY, 10)
    assert [d for d, _, _ in got] == [d for d, _ in want]
    assert got[0][2] == 1.0  # the max candidate scores exactly 1.0
    mx = want[0][1]
    for (d, s, r), (_, raw) in zip(got, want):
        assert s == pytest.approx(round(raw, 4))
        assert r == pytest.approx(round(raw / mx, 4))
    # monotone non-increasing and within [0, 1]
    rs = [r for _, _, r in got]
    assert rs == sorted(rs, reverse=True)
    assert all(0.0 <= r <= 1.0 for r in rs)


def test_threshold_drops_hits_even_below_k(reader):
    full = ranking_score_topk(reader, QUERY, 10)
    cut = full[4][2]  # threshold at the 5th hit's score
    got = ranking_score_topk(reader, QUERY, 10, threshold=cut)
    assert got == [t for t in full if t[2] >= cut]
    assert 0 < len(got) < 10
    # threshold above every score -> empty, not an error
    assert ranking_score_topk(reader, QUERY, 10, threshold=1.1) == []
    # threshold 0 is a no-op
    assert ranking_score_topk(reader, QUERY, 10, threshold=0.0) == full


def test_allowed_renormalizes_over_ranked_set(reader):
    full = ranking_score_topk(reader, QUERY, 10)
    allowed = {d for d, _, _ in full[2:]}  # drop the two best docs
    got = ranking_score_topk(reader, QUERY, 10, allowed=allowed)
    assert got[0][0] == full[2][0]
    assert got[0][2] == 1.0  # max is over the set actually ranked
    assert all(d in allowed for d, _, _ in got)


def test_unknown_terms_empty(reader):
    assert ranking_score_topk(reader, "zzzznope", 10) == []


def test_service_surface(spark, reader):
    from sparkft.service import IndexSettings, SearchService

    svc = SearchService(reader.dir)
    resp = svc.search(QUERY, k=5, show_ranking_score=True)
    direct = ranking_score_topk(IndexReader(spark, reader.dir), QUERY, 5)
    assert [(h["doc_id"], h["score"], h["_rankingScore"])
            for h in resp["hits"]] == direct
    # threshold without show: hits filtered, no _rankingScore key
    cut = direct[2][2]
    resp2 = svc.search(QUERY, k=10, ranking_score_threshold=cut)
    assert all("_rankingScore" not in h for h in resp2["hits"])
    assert [h["doc_id"] for h in resp2["hits"]] == \
        [d for d, _, r in ranking_score_topk(
            IndexReader(spark, reader.dir), QUERY, 10) if r >= cut]
    # non-default strategy: explicit error, not a silently-wrong score
    svc_last = SearchService(reader.dir,
                             IndexSettings(matching_strategy="last"))
    with pytest.raises(ValueError, match="relevance"):
        svc_last.search(QUERY, k=5, show_ranking_score=True)


def test_tombstones_excluded_and_renormalized(spark, reader, tmp_path_factory):
    import shutil

    dst = str(tmp_path_factory.mktemp("rdel")) + "/idx"
    shutil.copytree(reader.dir, dst)
    full = ranking_score_topk(reader, QUERY, 10)
    delete_docs(dst, [full[0][0]])
    got = ranking_score_topk(IndexReader(spark, dst), QUERY, 10)
    assert full[0][0] not in {d for d, _, _ in got}
    assert got[0][2] == 1.0  # renormalized over the live candidates