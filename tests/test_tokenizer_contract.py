"""Tokenizer contract guard: an index, its appended shards, and the queries
served against it must all share ONE tokenization behavior, or recall decays
silently (old shards hold 'bundesbank', new ones 'bundes'+'bank'). The
fingerprint (config.tokenizer_fingerprint) is stamped at build time and
checked at resume, streaming append, compaction, and query time."""

import json
import os

import pytest

from sparkft.config import (
    DEFAULT_CONFIG,
    TokenizerConfig,
    tokenizer_fingerprint,
)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-tokcontract")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built_index(spark, tmp_path_factory):
    from sparkft.corpus import generate_corpus
    from sparkft.index_build import build_index

    out = str(tmp_path_factory.mktemp("tokfp") / "idx")
    pdf = generate_corpus(60, seed=3)
    build_index(spark, spark.createDataFrame(pdf), out, num_shards=2)
    return out


def test_fingerprint_deterministic_and_sensitive():
    fp = tokenizer_fingerprint(DEFAULT_CONFIG)
    assert fp == tokenizer_fingerprint(TokenizerConfig())
    assert len(fp) == 64
    # any lemma-stream-affecting field changes the fingerprint
    assert tokenizer_fingerprint(
        DEFAULT_CONFIG.with_(german_segmentation=False)) != fp
    assert tokenizer_fingerprint(
        DEFAULT_CONFIG.with_(allow_list=("eng",))) != fp
    assert tokenizer_fingerprint(
        DEFAULT_CONFIG.with_(stop_words={"the"})) != fp
    # create_char_map only annotates highlight metadata — same lemma stream,
    # same contract (highlighters may enable it against any index)
    assert tokenizer_fingerprint(
        DEFAULT_CONFIG.with_(create_char_map=True)) == fp


def test_fingerprint_tracks_injected_dictionary_content(tmp_path):
    p = tmp_path / "dict.txt"
    p.write_text("foobar 100 n\n")
    cfg = DEFAULT_CONFIG.with_(chinese_dict_path=str(p))
    fp1 = tokenizer_fingerprint(cfg)
    assert fp1 != tokenizer_fingerprint(DEFAULT_CONFIG)
    # same path, different content -> different contract
    p.write_text("foobar 100 n\nbazqux 50 n\n")
    assert tokenizer_fingerprint(cfg) != fp1


def test_build_stamps_stats_and_manifests(built_index):
    fp = tokenizer_fingerprint(DEFAULT_CONFIG)
    with open(f"{built_index}/stats.json") as f:
        assert json.load(f)["tokenizer_fingerprint"] == fp
    for fname in os.listdir(f"{built_index}/manifests"):
        with open(f"{built_index}/manifests/{fname}") as f:
            assert json.load(f)["tokenizer_fingerprint"] == fp


def test_resume_under_different_config_fails_fast(spark, built_index):
    from sparkft.corpus import generate_corpus
    from sparkft.index_build import build_index

    pdf = generate_corpus(60, seed=3)
    with pytest.raises(ValueError, match="tokenizer contract"):
        build_index(spark, spark.createDataFrame(pdf), built_index,
                    cfg=DEFAULT_CONFIG.with_(latin_camelcase=False),
                    num_shards=2)


def test_query_under_different_config_fails_fast(spark, built_index):
    from sparkft.search import IndexReader, wand_topk

    reader = IndexReader(spark, built_index)
    # matching config serves fine
    assert isinstance(wand_topk(reader, "spark index", 5), list)
    with pytest.raises(ValueError, match="tokenizer contract"):
        wand_topk(reader, "spark index", 5,
                  cfg=DEFAULT_CONFIG.with_(stop_words={"spark"}))


def test_streaming_append_under_different_config_fails_fast(
        spark, built_index):
    from pyspark.sql import functions as F

    from sparkft.corpus import generate_corpus
    from sparkft.streaming import incremental_index

    src = f"{built_index}_src"
    pdf = generate_corpus(20, seed=9)
    (spark.createDataFrame(pdf)
     .withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
     .select("doc_id", F.col("content").alias("text"))
     .write.mode("overwrite").parquet(src))
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    # the guard trips at sink CONSTRUCTION, before any micro-batch runs
    with pytest.raises(ValueError, match="tokenizer contract"):
        incremental_index(
            stream, built_index,
            cfg=DEFAULT_CONFIG.with_(german_segmentation=False))


def test_compaction_rejects_mixed_shards(spark, built_index, tmp_path):
    import shutil

    from sparkft.index_build import compact_index

    idx = str(tmp_path / "mixed")
    shutil.copytree(built_index, idx)
    mpath = sorted(
        f"{idx}/manifests/{f}" for f in os.listdir(f"{idx}/manifests"))[0]
    with open(mpath) as f:
        m = json.load(f)
    m["tokenizer_fingerprint"] = "0" * 64
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="DIFFERENT tokenizer fingerprints"):
        compact_index(spark, idx)


def test_legacy_index_without_fingerprint_passes(spark, built_index,
                                                 tmp_path):
    """Indexes written before the guard carry no fingerprint: every check
    is a no-op (resume, append, query, compaction all proceed)."""
    import shutil

    from sparkft.index_build import compact_index
    from sparkft.search import IndexReader, wand_topk

    idx = str(tmp_path / "legacy")
    shutil.copytree(built_index, idx)
    with open(f"{idx}/stats.json") as f:
        stats = json.load(f)
    stats.pop("tokenizer_fingerprint")
    with open(f"{idx}/stats.json", "w") as f:
        json.dump(stats, f)
    for fname in os.listdir(f"{idx}/manifests"):
        p = f"{idx}/manifests/{fname}"
        with open(p) as f:
            m = json.load(f)
        m.pop("tokenizer_fingerprint", None)
        with open(p, "w") as f:
            json.dump(m, f)

    reader = IndexReader(spark, idx)
    # any config serves a pre-guard index (nothing to compare against)
    assert isinstance(
        wand_topk(reader, "spark", 5,
                  cfg=DEFAULT_CONFIG.with_(stop_words={"the"})), list)
    out = compact_index(spark, idx)
    assert "tokenizer_fingerprint" not in out


def test_entry_cache_key_derives_from_behavior_version(monkeypatch):
    """VERDICT r4 item 1: the entry tmp-cache keys must be DERIVED from the
    tokenizer fingerprint so a behavior-version bump auto-invalidates every
    cached store (the r4 crash was a hand-bumped tag that desynced)."""
    import sparkft.config as C
    import __spark_entry__ as entry

    before = entry._entry_cache_dir("/root/testdata/sf0.001", "midx")
    monkeypatch.setattr(C, "TOKENIZER_BEHAVIOR_VERSION",
                        C.TOKENIZER_BEHAVIOR_VERSION + 1)
    monkeypatch.setattr(C, "_FINGERPRINT_CACHE", {})
    after = entry._entry_cache_dir("/root/testdata/sf0.001", "midx")
    assert before != after


def test_entry_cache_dir_clears_mismatched_store(tmp_path, monkeypatch):
    """A store at the derived key whose stats.json carries a DIFFERENT
    fingerprint (partially-copied / corrupt) is cleared, not served."""
    import __spark_entry__ as entry

    import tempfile

    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
    d = entry._entry_cache_dir("/x/sf9", "idx")
    os.makedirs(d)
    with open(os.path.join(d, "stats.json"), "w") as f:
        json.dump({"tokenizer_fingerprint": "deadbeef" * 8}, f)
    d2 = entry._entry_cache_dir("/x/sf9", "idx")
    assert d2 == d and not os.path.exists(d)


def test_sibling_artifacts_stamped_and_mismatch_refused(spark, built_index,
                                                        tmp_path):
    """VERDICT r4 item 6: attrs / attr_index / typo_variants each carry the
    tokenizer fingerprint in _meta.json and refuse to open next to a
    stats.json with a different one (a partially-upgraded store)."""
    import shutil

    from pyspark.sql import functions as F

    from sparkft.facets import (AttributeIndex, AttributeStore,
                                write_attribute_index, write_attribute_store)
    from sparkft.typo import PrecomputedSymSpell, write_variant_table

    idx = str(tmp_path / "sibidx")
    shutil.copytree(built_index, idx)
    with open(f"{idx}/stats.json") as f:
        stats = json.load(f)
    fp = stats["tokenizer_fingerprint"]

    docs = spark.range(30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("l"), (F.col("id") % 3).cast("string")).alias("lang"))
    write_attribute_store(spark, docs, idx, cols=("lang",))
    write_attribute_index(spark, docs, idx, cols=("lang",))
    write_variant_table(spark, idx, num_buckets=4)

    # every artifact inherits/stamps the index's fingerprint and opens fine
    for sub in ("attrs", "attr_index", "typo_variants"):
        with open(f"{idx}/{sub}/_meta.json") as f:
            m = json.load(f)
        assert m["tokenizer_fingerprint"] == fp
        assert m["format_version"] == 1
    AttributeStore(idx), AttributeIndex(idx), PrecomputedSymSpell(idx)

    # flip the index's fingerprint: every artifact now refuses to open
    stats["tokenizer_fingerprint"] = "0" * 64
    with open(f"{idx}/stats.json", "w") as f:
        json.dump(stats, f)
    for opener in (AttributeStore, AttributeIndex, PrecomputedSymSpell):
        with pytest.raises(ValueError, match="tokenizer contract"):
            opener(idx)

    # pre-guard artifacts (no stamp) still open unchecked
    for sub in ("attrs", "attr_index", "typo_variants"):
        with open(f"{idx}/{sub}/_meta.json") as f:
            m = json.load(f)
        m.pop("tokenizer_fingerprint")
        with open(f"{idx}/{sub}/_meta.json", "w") as f:
            json.dump(m, f)
    AttributeStore(idx), AttributeIndex(idx), PrecomputedSymSpell(idx)
