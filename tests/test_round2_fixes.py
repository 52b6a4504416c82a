"""Round-2 fixes: allow-list script restriction, fast-path config gating,
bounded passthrough segments, positional compaction, int32 offset guard,
deterministic IVF centroid sampling, sampled hot-token superset."""

import json
import os

import numpy as np
import pytest

from sparkft.config import DEFAULT_CONFIG
from sparkft.tokenizer import tokenize_batch, tokenize_str, tokenize_words_arrow


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-round2")
        .getOrCreate()
    )
    yield s


# --- detection: allow_list restricted to same-script candidates ------------

THAI = "ไกลสุดกู่"  # Thai-script run


def _detect(text, allow_list):
    from sparkft import _tables as T
    from sparkft.detection import RunDetection, codepoints

    sids = T.script_ids_of_codepoints(codepoints(text))
    return RunDetection(text, sids, allow_list).detect_language()


def test_allowlist_same_script_preferred():
    # whatlang's allowlist filter is script-scoped: a Thai run never
    # resolves to "deu" just because it is listed first.
    assert _detect(THAI, ("deu", "tha")) == "tha"


def test_allowlist_no_same_script_entry_is_none():
    assert _detect(THAI, ("deu", "fra")) is None


def test_allowlist_single_entry_short_circuits():
    # charabia: a one-entry allow_list skips detection entirely (mod.rs:26-31)
    assert _detect(THAI, ("deu",)) == "deu"


# --- batch fast path must respect lossy / allow_list ------------------------


def test_batch_lossy_false_keeps_case():
    cfg = DEFAULT_CONFIG.with_(lossy=False)
    _, lemmas = tokenize_batch(["Hello World"], cfg)
    assert lemmas == ["Hello", "World"]
    _, words = tokenize_words_arrow(["Hello World"], cfg)
    assert sorted(words.to_pylist()) == ["Hello", "World"]


def test_batch_allowlist_deu_compound_split():
    cfg = DEFAULT_CONFIG.with_(allow_list=["deu"])
    scalar = [t.lemma for t in tokenize_str("Literaturverzeichnis", cfg)
              if t.lemma.strip()]
    assert scalar == ["literatur", "verzeichnis"]
    _, lemmas = tokenize_batch(["Literaturverzeichnis"], cfg)
    assert lemmas == scalar
    _, words = tokenize_words_arrow(["Literaturverzeichnis"], cfg)
    assert sorted(words.to_pylist()) == sorted(scalar)


# --- merge phase: non-hot giant tokens still produce bounded parts ----------


def test_passthrough_giant_token_split(spark, tmp_path):
    from sparkft import codec
    from sparkft.index_build import build_segments

    rows = []
    # "zzgiant" appears in 25 docs (> seg_max=8) but is NOT in the hot list
    for d in range(25):
        rows.append(("zzgiant", d + 1, 1, 10))
    for d in range(3):
        rows.append(("small", d + 1, 2, 10))
    postings = spark.createDataFrame(
        rows, "token string, doc_id long, tf long, doc_len long"
    )
    out = str(tmp_path / "idx")
    build_segments(spark, postings, out, avgdl=10.0, num_buckets=4,
                   salt_mod=4, hot=[], seg_max=8)
    seg = spark.read.parquet(f"{out}/segments").filter("token = 'zzgiant'") \
        .orderBy("part").collect()
    assert len(seg) == 4  # ceil(25/8)
    total = 0
    for r in seg:
        assert r["df"] == 25  # df column carries the token's total df
        ids, _tfs, _lens = codec.decode_posting_list(
            r["doc_gaps"], r["tfs"], r["lens"]
        )
        assert len(ids) <= 8
        total += len(ids)
    assert total == 25
    small = spark.read.parquet(f"{out}/segments").filter("token = 'small'").collect()
    assert len(small) == 1 and small[0]["part"] == 0


# --- compaction preserves / invalidates the positions store -----------------


@pytest.fixture(scope="module")
def pos_corpus():
    from sparkft.corpus import generate_corpus

    return generate_corpus(60, seed=11)


def test_compact_preserves_positions(spark, pos_corpus, tmp_path):
    from sparkft.index_build import build_index, compact_index
    from sparkft.search import IndexReader, phrase_topk

    out = str(tmp_path / "pidx")
    df = spark.createDataFrame(pos_corpus).repartition(2)
    build_index(spark, df, out, num_shards=2, num_buckets=4,
                index_positions=True)
    before = phrase_topk(IndexReader(spark, out), "parse config", k=5)
    res = compact_index(spark, out, num_buckets=4)
    assert res["has_positions"] is True
    after = phrase_topk(IndexReader(spark, out), "parse config", k=5)
    assert after == before


def test_compact_invalidates_positions_with_stream_shards(
    spark, pos_corpus, tmp_path
):
    from sparkft.index_build import build_index, compact_index
    from sparkft.search import IndexReader, phrase_topk

    out = str(tmp_path / "pidx2")
    df = spark.createDataFrame(pos_corpus).repartition(2)
    build_index(spark, df, out, num_shards=2, num_buckets=4,
                index_positions=True)
    # append a streaming-style shard (no positions column)
    shard = spark.createDataFrame(
        [("streamtok", 999999, 1, 1)],
        "token string, doc_id long, tf long, doc_len long",
    )
    shard.write.mode("overwrite").parquet(f"{out}/postings_raw/shard=stream-0")
    res = compact_index(spark, out, num_buckets=4)
    assert res["has_positions"] is False
    with open(f"{out}/stats.json") as f:
        assert json.load(f)["has_positions"] is False
    with pytest.raises(ValueError, match="positions"):
        phrase_topk(IndexReader(spark, out), "parse config", k=5)


# --- int32 Arrow offset guard ------------------------------------------------


def test_offset_overflow_raises():
    from sparkft.index_build import _binary_from_offsets, _list_from_offsets

    offsets = np.array([0, 2**31 + 5], dtype=np.int64)
    with pytest.raises(ValueError, match="int32"):
        _binary_from_offsets(b"", offsets)
    with pytest.raises(ValueError, match="int32"):
        _list_from_offsets(np.zeros(1), offsets, "float64")


# --- IVF centroid sampling: content-deterministic under repartitioning ------


def test_ivf_centroids_stable_under_repartitioning(spark):
    from sparkft.ann import ivf_build

    rng = np.random.default_rng(3)
    rows = [(i, rng.normal(size=8).tolist()) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    _, c1 = ivf_build(spark, df.repartition(3), n_centroids=4, iters=3)
    _, c2 = ivf_build(spark, df.repartition(7), n_centroids=4, iters=3)
    np.testing.assert_allclose(c1, c2)


# --- sampled hot tokens: seed list always included ---------------------------


def test_hot_tokens_include_seed(spark):
    from sparkft.index_build import HOT_SEED_TOKENS, _hot_tokens

    postings = spark.createDataFrame(
        [("alpha", 1, 1, 5), ("alpha", 2, 1, 5), ("beta", 1, 1, 5)],
        "token string, doc_id long, tf long, doc_len long",
    )
    hot = _hot_tokens(postings, 3, hot_token_count=1)
    assert "alpha" in hot
    assert set(HOT_SEED_TOKENS) <= set(hot)


# --- LSH-gated Jaccard: subset of exact all-pairs, full recall up high ------


def test_jaccard_lsh_recall(spark):
    import __spark_entry__ as entry
    from sparkft import dedup as D

    sh = entry._shingles(spark, "/root/testdata/sf0.001")
    exact = {(r["d1"], r["d2"]): r["jac"]
             for r in D.jaccard_pairs(sh, threshold=0.1).collect()}
    lsh = {(r["d1"], r["d2"]): r["jac"]
           for r in D.jaccard_pairs_lsh(sh, threshold=0.1).collect()}
    assert set(lsh) <= set(exact)
    for pair, jac in lsh.items():
        assert jac == exact[pair]
    # at 4x4 banding, candidate recall at jac >= 0.6 is ~0.97; this corpus's
    # near-dup pairs are far above the threshold — assert full recall there
    high = {p for p, j in exact.items() if j >= 0.6}
    assert high <= set(lsh)


def test_simhash_halves_and_hamming(spark):
    from pyspark.sql import functions as F

    from sparkft import dedup as D

    postings = spark.createDataFrame(
        [(1, "alpha", 3), (1, "beta", 1), (2, "alpha", 3), (2, "beta", 1),
         (3, "gamma", 2), (3, "delta", 5)],
        "doc_id long, token string, tf long",
    )
    sim = D.simhash(postings)
    rows = {r["doc_id"]: (r["simhash_lo"], r["simhash_hi"]) for r in sim.collect()}
    assert rows[1] == rows[2]  # identical token-weight profile
    assert all(0 <= v < 2**32 for pair in rows.values() for v in pair)
    a = sim.filter(F.col("doc_id") == 1).select(
        F.col("simhash_lo").alias("a_lo"), F.col("simhash_hi").alias("a_hi")
    )
    b = sim.filter(F.col("doc_id") == 3).select(
        F.col("simhash_lo").alias("b_lo"), F.col("simhash_hi").alias("b_hi")
    )
    d = a.crossJoin(b).select(
        D.simhash_hamming(
            F.col("a_lo"), F.col("a_hi"), F.col("b_lo"), F.col("b_hi")
        ).alias("ham")
    ).collect()[0]["ham"]
    assert 0 < d <= 64


# --- Cyrillic language discrimination (alphabet-exclusive letters) ----------


@pytest.mark.parametrize(
    "text,lang",
    [
        ("привет это ёлка", "rus"),
        ("объект высокой важности", "rus"),  # ъ alone does not imply bul (ы/э absent here but ъ+rus context)
        ("пєрєклад української мови ї", "ukr"),
        ("беларуская мова ўсходняя", "bel"),
        ("ђаво и ћирилица", "srp"),
        ("ѕвезда и ѓаволот", "mkd"),
        ("българският език е хубав", "bul"),
    ],
)
def test_cyrillic_language_markers(text, lang):
    assert _detect(text, None) == lang


# --- embedding near-dup: sign-LSH gate catches true near-dups ---------------


def test_embedding_near_dup_finds_planted_pair(spark):
    from sparkft.ann import embedding_near_dup_pairs

    rng = np.random.default_rng(9)
    rows = []
    base = rng.normal(size=32)
    rows.append((1000, base.tolist()))
    rows.append((1001, (base + rng.normal(scale=0.02, size=32)).tolist()))  # cos ~0.999
    for i in range(200):
        rows.append((i, rng.normal(size=32).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["d1"], r["d2"]): r["cos"]
             for r in embedding_near_dup_pairs(df, threshold=0.9).collect()}
    assert (1000, 1001) in pairs
    assert pairs[(1000, 1001)] > 0.99
    # nothing else in random noise clears 0.9
    assert len(pairs) == 1


def test_embedding_near_dup_rejects_ragged_and_null(spark):
    """ADVICE r3: a ragged or null embedding must raise a clear error
    naming the offending vid, not silently misalign the banding matmul."""
    import pytest
    from sparkft.ann import embedding_near_dup_pairs

    rng = np.random.default_rng(9)
    rows = [(i, rng.normal(size=16).tolist()) for i in range(20)]
    rows.append((999, rng.normal(size=8).tolist()))  # ragged
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="ragged embedding for vid=999"):
        embedding_near_dup_pairs(df, threshold=0.9).collect()

    rows2 = [(i, rng.normal(size=16).tolist()) for i in range(20)]
    rows2.append((777, None))  # null
    df2 = spark.createDataFrame(rows2, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="null embedding for vid=777"):
        embedding_near_dup_pairs(df2, threshold=0.9).collect()


# --- winnowing fingerprints: shared-substring guarantee ---------------------


def test_winnow_guarantee(spark):
    from sparkft.dedup import winnow_fingerprints

    shared = "zqxjkwvyp bmfgh crtlnd"  # 22 chars >= k + w - 1 = 11
    rows = [
        (1, "aaaa bbbb cccc " + shared + " dddd eeee"),
        (2, "completely different prefix " + shared + " and suffix here"),
        (3, "no overlap with the others at all in this document text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(df, k=8, w=4)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # any match of length >= w + k - 1 shares at least one fingerprint
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3] & by_doc[2] - (by_doc[1] & by_doc[2]))
    # fingerprints are a small fraction of all grams (w-fold reduction-ish)
    n_grams = len(rows[0][1]) - 8 + 1
    assert len(by_doc[1]) < n_grams


# --- n-gram language ID ------------------------------------------------------


def test_lang_id_ngram(spark):
    from sparkft.dedup import lang_id_ngram

    rows = [
        (1, "the cat and the dog are running along the winding path"),
        (2, "der hund und die katze laufen schnell durch einen wald"),
        (3, "les enfants mangent de la soupe et que la vie est belle"),
        (4, "los gatos que juegan de la manana han llegado al jardin"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang"] for r in lang_id_ngram(df).collect()}
    assert got == {1: "eng", 2: "deu", 3: "fra", 4: "spa"}


def test_stale_first_ordering(tmp_path, monkeypatch):
    """queries() registration self-rotation: entries with no driver
    CORRECTNESS row ever come first, then oldest-row-first, stable by
    registration order within a round; unreadable records fall back to
    the static order instead of raising."""
    import json

    import __spark_entry__ as entry

    entries = {"a": 1, "b": 2, "c": 3, "d": 4}
    here = str(tmp_path)
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"a": {}, "c": {}}))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({"a": {}}))
    monkeypatch.setattr(entry.os.path, "dirname", lambda p: here)
    got = list(entry._stale_first(entries))
    # b,d never checked (reg order); c last seen r02; a last seen r03
    assert got == ["b", "d", "c", "a"]
    # corrupt record -> fallback to static order, no exception
    (tmp_path / "CORRECTNESS_r04.json").write_text("{not json")
    assert list(entry._stale_first(entries)) == list(entries)
