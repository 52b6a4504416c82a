"""Highlighting (char-offset spans over ORIGINAL text, exercising the
char_map/original_lengths machinery) + the distinctAttribute rule."""

import pytest

from sparkft.highlight import crop_around_match, format_highlight, highlight_spans


def test_spans_plain_ascii():
    text = "Merge sort beats bubble sort"
    spans = highlight_spans(text, ["merge", "sort"])
    assert [text[a:b] for a, b in spans] == ["Merge", "sort", "sort"]


def test_spans_point_at_original_even_when_normalization_changes_length():
    # Café -> cafe (NFKD + diacritic strip): the normalized lemma matches,
    # but the span must cover the ORIGINAL 'Café'
    text = "visit the Café tomorrow"
    spans = highlight_spans(text, ["cafe"])
    assert [text[a:b] for a, b in spans] == ["Café"]


def test_spans_camel_case_parts():
    # camelCase splits into word tokens with per-part offsets
    text = "call parseConfig now"
    spans = highlight_spans(text, ["parse", "config"])
    assert [text[a:b] for a, b in spans] == ["parse", "Config"]


def test_format_highlight_wraps_matches():
    got = format_highlight("merge the sorted run", ["merge", "sorted"])
    assert got == "<em>merge</em> the <em>sorted</em> run"


def test_format_no_match_is_identity():
    text = "nothing to see"
    assert format_highlight(text, ["zzz"]) == text


def test_crop_centers_on_first_match():
    words = [f"w{i}" for i in range(30)]
    words[17] = "needle"
    text = " ".join(words)
    got = crop_around_match(text, ["needle"], crop_length=5)
    assert "needle" in got
    assert got.startswith("…") and got.endswith("…")
    assert len(got.split()) == 5


def test_crop_no_match_leading_window():
    text = " ".join(f"w{i}" for i in range(20))
    got = crop_around_match(text, ["zzz"], crop_length=4)
    assert got == "w0 w1 w2 w3…"


# --- distinct rule over a real index -----------------------------------


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-distinct")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from sparkft.corpus import generate_corpus
    from sparkft.facets import write_attribute_store
    from sparkft.index_build import build_index

    corpus = generate_corpus(300, seed=41)
    out = str(tmp_path_factory.mktemp("xidx"))
    df = spark.createDataFrame(corpus).repartition(4)
    build_index(spark, df, out, num_shards=2, num_buckets=8)

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(corpus).withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit")
    )
    write_attribute_store(spark, docs, out, cols=("repo",))
    rows = docs.select("doc_id", "content", "repo").collect()
    return out, rows


def test_distinct_matches_full_ranking_dedup(spark, built):
    from sparkft.facets import AttributeStore, distinct_topk
    from sparkft.search import IndexReader, taat_topk

    out, rows = built
    reader = IndexReader(spark, out)
    store = AttributeStore(out)
    attr = {int(r["doc_id"]): r["repo"] for r in rows}
    for q in ["merge sort", "parse config token", "import"]:
        full = taat_topk(reader, q, reader.N)
        seen, want = set(), []
        for d, s in full:
            v = attr[d]
            if v in seen:
                continue
            seen.add(v)
            want.append((d, v, s))
        got = distinct_topk(reader, store, q, "repo", 10)
        assert got == want[:10], f"distinct mismatch for {q!r}"
        assert len({v for _, v, _ in got}) == len(got)  # one per value
