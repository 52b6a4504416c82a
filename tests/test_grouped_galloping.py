"""The grouped conjunction's galloping scale path (rare-first candidate
probing, block-targeted decode) must be result-identical — scores included,
bit-for-bit — to the bulk-decode TAAT path it replaces above the footprint
cutoff. Forced here by dropping the cutoff to 0 on small corpora."""

import numpy as np
import pytest

import sparkft.search as search
from sparkft.index_build import build_index, delete_docs
from sparkft.search import (IndexReader, grouped_conjunctive_topk,
                            grouped_matching_frequency_topk,
                            grouped_matching_last_topk)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-galloping")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rng = np.random.default_rng(23)
    common = ["merge", "sort", "stream"]
    mid = ["filter", "index", "window"]
    rare = ["zephyr", "quokka", "fjord"]
    rows = []
    for d in range(1, 401):
        words = list(rng.choice(common, size=8))
        if d % 3 == 0:
            words += list(rng.choice(mid, size=3))
        if d % 29 == 0:
            words.append(rare[d % 3])
        rng.shuffle(words)
        rows.append((d, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path_factory.mktemp("gallop") / "idx")
    build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                num_shards=2, num_buckets=4, verify_sha=False)
    return out, rows


GROUP_CASES = [
    [["merge"], ["sort"]],
    [["merge"], ["zephyr"]],                       # skewed: common AND rare
    [["merge", "mergee"], ["filter", "index"]],     # variant groups
    [["zephyr", "quokka"], ["merge"], ["sort"]],
    [["stream"], ["window"], ["fjord"]],
    [["merge"], ["sort"], ["stream"], ["filter"]],
    [["nosuchword"], ["merge"]],                    # absent group -> []
    [["merge", "nosuchword"], ["sort"]],            # absent variant ignored
]


def _both_paths(reader, groups, k=10, allowed=None, monkeypatch=None):
    taat = grouped_conjunctive_topk(reader, groups, k, allowed=allowed)
    monkeypatch.setattr(search, "_EXHAUSTIVE_CUTOFF", 0)
    try:
        gallop = grouped_conjunctive_topk(reader, groups, k, allowed=allowed)
    finally:
        monkeypatch.undo()
    return taat, gallop


def test_galloping_bitwise_equals_taat(spark, built, monkeypatch):
    out, _ = built
    reader = IndexReader(spark, out)
    for groups in GROUP_CASES:
        taat, gallop = _both_paths(reader, groups, 10, None, monkeypatch)
        assert gallop == taat, groups  # float equality: same op order


def test_galloping_with_allowed_filter(spark, built, monkeypatch):
    out, rows = built
    reader = IndexReader(spark, out)
    allowed = {d for d, _ in rows if d % 2 == 0}
    for groups in GROUP_CASES[:5]:
        taat, gallop = _both_paths(reader, groups, 10, allowed, monkeypatch)
        assert gallop == taat, groups
        assert all(d in allowed for d, _ in gallop)


def test_galloping_excludes_tombstones(spark, built, tmp_path, monkeypatch):
    import shutil

    out, _ = built
    idx2 = str(tmp_path / "idx2")
    shutil.copytree(out, idx2)
    reader = IndexReader(spark, idx2)
    base = grouped_conjunctive_topk(reader, [["merge"], ["sort"]], 5)
    assert base
    delete_docs(idx2, [base[0][0]])
    reader2 = IndexReader(spark, idx2)
    monkeypatch.setattr(search, "_EXHAUSTIVE_CUTOFF", 0)
    gallop = grouped_conjunctive_topk(reader2, [["merge"], ["sort"]], 5)
    assert base[0][0] not in [d for d, _ in gallop]
    assert gallop == grouped_conjunctive_topk(reader2, [["merge"], ["sort"]],
                                              5)


def test_matching_strategies_identical_under_galloping(spark, built,
                                                       monkeypatch):
    out, _ = built
    reader = IndexReader(spark, out)
    cases = [
        [["merge"], ["sort"], ["nosuchword"]],   # relaxation drops the tail
        [["merge"], ["zephyr"]],
        [["stream"], ["filter"], ["fjord"]],
    ]
    for groups in cases:
        for fn in (grouped_matching_last_topk,
                   grouped_matching_frequency_topk):
            s1: dict = {}
            want = fn(reader, groups, 10, stats=s1)
            monkeypatch.setattr(search, "_EXHAUSTIVE_CUTOFF", 0)
            s2: dict = {}
            got = fn(reader, groups, 10, stats=s2)
            monkeypatch.undo()
            assert got == want, (fn.__name__, groups)
            assert s2.get("terms_used") == s1.get("terms_used")


def test_candidate_driven_filtered_wand_identical(spark, built, monkeypatch):
    from sparkft.search import wand_topk_terms

    out, rows = built
    reader = IndexReader(spark, out)
    terms = ["merge", "sort", "filter"]
    for allowed in [
        {d for d, _ in rows if d % 17 == 0},           # selective filter
        {d for d, _ in rows if d % 17 == 0} | {10**9}, # ids matching nothing
        {rows[0][0]},
        set(),
    ]:
        want = wand_topk_terms(reader, terms, 10, allowed=allowed)
        monkeypatch.setattr(search, "_EXHAUSTIVE_CUTOFF", 0)
        s: dict = {}
        got = wand_topk_terms(reader, terms, 10, stats=s, allowed=allowed)
        monkeypatch.undo()
        assert got == want, allowed
        if allowed and len(allowed) * search._FILTER_DRIVE_FACTOR < 1200:
            assert s.get("filter_driven"), allowed


def test_k_edge_cases_under_galloping(spark, built, monkeypatch):
    out, _ = built
    reader = IndexReader(spark, out)
    monkeypatch.setattr(search, "_EXHAUSTIVE_CUTOFF", 0)
    assert grouped_conjunctive_topk(reader, [["merge"]], 0) == []
    assert grouped_conjunctive_topk(reader, [], 10) == []
    big = grouped_conjunctive_topk(reader, [["merge"], ["sort"]], 10_000)
    assert len(big) > 10  # k past the candidate count returns all matches
