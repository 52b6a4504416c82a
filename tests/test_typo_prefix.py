"""Typo-tolerant + prefix search: expansion correctness (SymSpell candidate
completeness vs brute-force Levenshtein scan), the Meilisearch length rule,
and engine-path rank identity against TAAT over a hand-expanded term set."""

import random
import string

import pytest

from sparkft.typo import SymSpellIndex, allowed_edits, levenshtein


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-typo")
        .getOrCreate()
    )
    yield s


def test_allowed_edits_rule():
    # Meilisearch defaults: <5 chars 0 typos, 5-8 one, 9+ two
    assert allowed_edits("the") == 0
    assert allowed_edits("sort") == 0
    assert allowed_edits("merge") == 1
    assert allowed_edits("window") == 1
    assert allowed_edits("filterer") == 1
    assert allowed_edits("customers") == 2
    assert allowed_edits("tokenization") == 2


def test_levenshtein_known_values():
    assert levenshtein("kitten", "sitting", 3) == 3
    assert levenshtein("merje", "merge", 1) == 1
    assert levenshtein("abc", "abc", 0) == 0
    # cap early-exit returns cap+1, never an undercount
    assert levenshtein("aaaa", "bbbb", 1) == 2
    assert levenshtein("abcdef", "", 2) == 3


def _brute_expand(vocab, term):
    e = allowed_edits(term)
    return sorted(w for w in vocab if levenshtein(term, w, e) <= e)


def test_symspell_matches_brute_force_random():
    rng = random.Random(7)
    vocab = sorted(
        {"".join(rng.choice(string.ascii_lowercase[:6]) for _ in range(rng.randint(2, 10)))
         for _ in range(300)}
    )
    sym = SymSpellIndex(vocab)
    queries = [rng.choice(vocab) for _ in range(30)]
    # perturb some queries by 1-2 random edits
    for i in range(0, 30, 2):
        q = list(queries[i])
        pos = rng.randrange(len(q))
        q[pos] = rng.choice(string.ascii_lowercase[:6])
        queries[i] = "".join(q)
    for q in queries:
        assert sym.expand(q) == _brute_expand(vocab, q), q


def test_symspell_zero_edit_terms():
    sym = SymSpellIndex(["sort", "sore", "merge"])
    # 4-char query allows 0 typos: exact match only
    assert sym.expand("sort") == ["sort"]
    assert sym.expand("sord") == []


def _tiny_index(spark, tmp_path):
    from sparkft.index_build import build_index

    rows = []
    words = ["merge", "sort", "window", "windows", "winter", "customer",
             "scan", "stream", "filter"]
    rng = random.Random(3)
    for d in range(60):
        rows.append((d, " ".join(rng.choice(words) for _ in range(30))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "idx")
    build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                num_shards=1, num_buckets=4, verify_sha=False)
    return out


def test_typo_topk_equals_taat_over_expansion(spark, tmp_path):
    from sparkft.search import IndexReader, typo_topk, wand_topk_terms

    idx = _tiny_index(spark, tmp_path)
    reader = IndexReader(spark, idx)
    stats = {}
    got = typo_topk(reader, "windoe custmer", 10, stats=stats)
    # manual expansion: windoe->{window, windows? lev=2 >1}, custmer(7)->customer(1 del... insert o: lev 1)
    assert stats["expanded_terms"] == ["customer", "window"]
    want = wand_topk_terms(reader, ["customer", "window"], 10)
    assert got == want
    assert len(got) == 10


def test_typo_expansion_respects_length_rule(spark, tmp_path):
    from sparkft.search import IndexReader, typo_topk

    idx = _tiny_index(spark, tmp_path)
    reader = IndexReader(spark, idx)
    stats = {}
    typo_topk(reader, "scam", 10, stats=stats)  # 4 chars: 0 typos allowed
    assert stats["expanded_terms"] == []
    stats = {}
    typo_topk(reader, "scan", 10, stats=stats)
    assert stats["expanded_terms"] == ["scan"]


def test_prefix_topk_equals_taat_over_expansion(spark, tmp_path):
    from sparkft.search import IndexReader, prefix_topk, wand_topk_terms

    idx = _tiny_index(spark, tmp_path)
    reader = IndexReader(spark, idx)
    stats = {}
    got = prefix_topk(reader, "win", 10, stats=stats)
    assert stats["expanded_terms"] == ["window", "windows", "winter"]
    assert got == wand_topk_terms(reader, ["window", "windows", "winter"], 10)


def test_prefix_max_expansions_cap_is_df_ranked(spark, tmp_path):
    from sparkft.index_build import build_index
    from sparkft.search import IndexReader

    # wa appears in every doc, wb in half, wc in a quarter
    rows = []
    for d in range(40):
        toks = ["wa"]
        if d % 2 == 0:
            toks.append("wb")
        if d % 4 == 0:
            toks.append("wc")
        rows.append((d, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "idx2")
    build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                num_shards=1, num_buckets=4, verify_sha=False)
    reader = IndexReader(spark, out)
    assert reader.prefix_terms("w", max_expansions=2) == ["wa", "wb"]
    assert reader.prefix_terms("w", max_expansions=10) == ["wa", "wb", "wc"]
    assert reader.prefix_terms("z") == []


def test_expand_terms_df_matches_symspell(spark):
    from sparkft.typo import expand_terms_df

    vocab = ["merge", "sort", "window", "windows", "customer", "scan"]
    dict_df = spark.createDataFrame([(w,) for w in vocab], "token string")
    got = sorted(
        r["token"]
        for r in expand_terms_df(dict_df, ["windoe", "custmer", "scam"]).collect()
    )
    sym = SymSpellIndex(vocab)
    want = sorted(
        {w for t in ["windoe", "custmer", "scam"] for w in sym.expand(t)}
    )
    assert got == want == ["customer", "window"]


def test_expand_with_distance_matches_brute_force():
    rng = random.Random(11)
    vocab = sorted({"".join(rng.choice(string.ascii_lowercase[:6])
                            for _ in range(rng.randrange(4, 11)))
                    for _ in range(150)})
    sym = SymSpellIndex(vocab)
    queries = [rng.choice(vocab) for _ in range(20)]
    for i in range(0, 20, 2):  # perturb half
        q = list(queries[i])
        q[rng.randrange(len(q))] = rng.choice(string.ascii_lowercase[:6])
        queries[i] = "".join(q)
    for q in queries:
        got = sym.expand_with_distance(q)
        e = allowed_edits(q)
        want = {w: levenshtein(q, w, e) for w in vocab
                if levenshtein(q, w, e) <= e}
        assert got == want, q
        assert sorted(got) == sym.expand(q), q


def test_symspell_long_word_reachable_by_typos():
    """Prefix-key indexing: a dictionary word longer than max_word_len is
    still reachable from insertion/substitution/deletion typos (round-2
    behavior only found it via pure-insertion queries)."""
    long_word = "a" * 30 + "bcdefghijklmnopqrstu"  # 50 chars
    sym = SymSpellIndex(["merge", long_word], max_word_len=48)
    assert sym.expand(long_word) == [long_word]
    # substitution typo (len 50 -> 2 edits allowed)
    typo_sub = "z" + long_word[1:]
    assert long_word in sym.expand(typo_sub)
    # deletion typo (the query LOST a char vs the dict word)
    typo_del = long_word[:10] + long_word[11:]
    assert long_word in sym.expand(typo_del)
    # insertion typo
    typo_ins = long_word[:5] + "q" + long_word[5:]
    assert long_word in sym.expand(typo_ins)


def test_precomputed_variant_table_parity(spark, tmp_path):
    """The build-time variant artifact serves IDENTICAL expansions to the
    per-reader SymSpell build, and expand() touches only the buckets the
    query term's own deletes hash to (bucket-pruned IO)."""
    from sparkft.search import IndexReader
    from sparkft.typo import PrecomputedSymSpell, write_variant_table

    idx = _tiny_index(spark, tmp_path)
    write_variant_table(spark, idx, num_buckets=8)
    reader = IndexReader(spark, idx)
    pre = reader.symspell()
    assert isinstance(pre, PrecomputedSymSpell)  # artifact preferred
    mem = SymSpellIndex(sorted(reader.term_dictionary()))
    for q in ["windoe", "custmer", "scam", "scan", "merge", "sortt",
              "stram", "filtre", "xyzzy", "winter"]:
        assert pre.expand_with_distance(q) == mem.expand_with_distance(q), q
    # bucket pruning: one short query must not have loaded every bucket
    lazy = PrecomputedSymSpell(idx)
    lazy.expand("scam")
    assert 0 < len(lazy._buckets) < lazy.num_buckets


def test_compaction_regenerates_variant_table(spark, tmp_path):
    """compact_index rebuilds the typo-variant artifact so expansions track
    the live vocabulary (deleting every doc containing a word removes the
    word from the table)."""
    from sparkft.index_build import build_index, compact_index, delete_docs
    from sparkft.search import IndexReader
    from sparkft.typo import PrecomputedSymSpell

    rows = [(1, "merge sort window"), (2, "merge zephyr window"),
            (3, "sort window stream")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "tvidx")
    build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                num_shards=1, num_buckets=4, verify_sha=False,
                typo_variants=True)
    assert "zephyr" in PrecomputedSymSpell(out).expand("zephyrs")
    delete_docs(out, [2])  # the only doc containing 'zephyr'
    compact_index(spark, out, num_buckets=4)
    reader = IndexReader(spark, out)
    sym = reader.symspell()
    assert isinstance(sym, PrecomputedSymSpell)  # artifact still preferred
    assert "zephyr" not in sym.expand("zephyrs")
    assert "window" in sym.expand("window")  # surviving vocab intact


def test_typo_ranked_rule_buckets(spark, tmp_path):
    """Meilisearch "typo" ranking rule: more words matched first, then
    fewer total typos (exact beats 1-edit beats 2-edit), then BM25."""
    from sparkft.index_build import build_index
    from sparkft.search import IndexReader, typo_ranked_topk

    rows = [
        (1, "merge alpha beta"),
        (2, "merge marge alpha"),       # exact AND 1-edit variant: typos=0
        (3, "marge beta beta"),         # only the 1-edit variant: typos=1
        (4, "merge filter alpha"),      # both words -> wins despite 1 typo
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = str(tmp_path / "trank")
    build_index(spark, df, out, text_col="text", doc_id_col="doc_id",
                num_shards=1, num_buckets=4, verify_sha=False)
    reader = IndexReader(spark, out)
    # query: 'merge' expands to {merge:0, marge:1}; 'filtr' to {filter:1}
    got = typo_ranked_topk(reader, "merge filtr", 10)
    by_doc = {d: (nw, tp) for d, nw, tp, _ in got}
    assert by_doc == {1: (1, 0), 2: (1, 0), 3: (1, 1), 4: (2, 1)}
    assert got[0][0] == 4          # words rule dominates typo count
    assert got[-1][0] == 3         # typo'd-only doc sorts last
    keys = [(-nw, tp) for _, nw, tp, _ in got]
    assert keys == sorted(keys)    # bucket order is monotone
    assert typo_ranked_topk(reader, "merge filtr", 0) == []


def test_precomputed_path_never_scans_dictionary(spark, tmp_path):
    """VERDICT r3 #8: when typo_variants/ exists, neither reader.symspell()
    construction nor expand() may scan the term dictionary — poisoning
    term_dictionary() proves the precomputed path is fully self-contained
    (the in-memory SymSpell fallback NEEDS the scan, so a regression that
    silently falls back trips the poison)."""
    from sparkft.search import IndexReader
    from sparkft.typo import PrecomputedSymSpell, write_variant_table

    idx = _tiny_index(spark, tmp_path)
    write_variant_table(spark, idx, num_buckets=8)
    reader = IndexReader(spark, idx)

    def _poisoned():
        raise AssertionError("term dictionary scanned on the precomputed "
                             "typo path")

    reader.term_dictionary = _poisoned
    sym = reader.symspell()
    assert isinstance(sym, PrecomputedSymSpell)
    assert "window" in sym.expand("windoe")

    # and without the artifact, the fallback DOES build from the dictionary
    import pytest as _pytest

    idx2 = _tiny_index(spark, tmp_path / "noart")
    r2 = IndexReader(spark, idx2)
    r2.term_dictionary = _poisoned
    with _pytest.raises(AssertionError, match="scanned"):
        r2.symspell()


def test_typo_tolerance_settings():
    """Meilisearch typoTolerance sub-settings: minWordSizeForTypos changes
    the edits-per-length rule per QUERY (no index rebuild — the deletion
    neighborhood is threshold-independent), and both index forms agree."""
    from sparkft.typo import SymSpellIndex, allowed_edits

    # rule table under custom thresholds
    assert [allowed_edits("x" * n, 3, 6) for n in (2, 3, 5, 6)] == [0, 1, 1, 2]
    assert allowed_edits("abcd") == 0  # defaults unchanged
    vocab = ["graft", "grab", "craft", "spark"]
    sym = SymSpellIndex(vocab)
    # 'grft' (4 chars) gets no typos by default, 1 typo at oneTypo=4
    assert sym.expand("grft") == []
    assert sym.expand("grft", one_typo_min=4) == ["graft"]
    # twoTypos threshold: 'grapt' (5) default 1 edit -> graft/grab? grab is
    # d=2; with twoTypos=5 both distance-2 words appear
    d1 = sym.expand_with_distance("grapt")
    assert all(d <= 1 for d in d1.values())
    d2 = sym.expand_with_distance("grapt", two_typos_min=5)
    assert set(d1) <= set(d2) and max(d2.values()) == 2


def test_typo_settings_through_service(tmp_path):
    """disableOnWords keeps a word unexpanded; lowered oneTypo threshold
    expands a short word the defaults would not."""
    from pyspark.sql import SparkSession

    from sparkft.index_build import build_index
    from sparkft.service import IndexSettings, SearchService

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    docs = spark.createDataFrame(
        [(0, "graft spark"), (1, "grab run"), (2, "craft beer")],
        "doc_id long, text string")
    out = str(tmp_path / "tidx")
    build_index(spark, docs, out, text_col="text", doc_id_col="doc_id",
                num_shards=1, num_buckets=2, verify_sha=False)
    base = dict(typo_tolerance=True)
    svc = SearchService(out, IndexSettings(**base))
    assert svc._word_groups("grft") == [["grft"]]  # 4 chars: no typo
    svc_low = SearchService(out, IndexSettings(
        **base, typo_min_word_size_one=4))
    assert svc_low._word_groups("grft") == [["graft", "grft"]]
    svc_dis = SearchService(out, IndexSettings(
        **base, typo_min_word_size_one=4, typo_disable_on_words=("grft",)))
    assert svc_dis._word_groups("grft") == [["grft"]]


def test_search_as_you_type_last_word_only_prefix(spark, tmp_path):
    from sparkft.search import (IndexReader, search_as_you_type_topk,
                                wand_topk_terms)

    idx = _tiny_index(spark, tmp_path)
    reader = IndexReader(spark, idx)
    stats = {}
    got = search_as_you_type_topk(reader, "merge win", 10, stats=stats)
    # 'merge' exact (NOT expanded), 'win' prefix-expanded
    assert stats["expanded_terms"] == ["merge", "window", "windows", "winter"]
    assert got == wand_topk_terms(
        reader, ["merge", "window", "windows", "winter"], 10)
    # first word is NOT a prefix: 'win merge' keeps the non-word 'win'
    # as an exact (absent) term and expands only 'merge'
    stats2 = {}
    search_as_you_type_topk(reader, "win merge", 10, stats=stats2)
    assert stats2["expanded_terms"] == ["merge", "win"]
    # single word == prefix_topk behavior ('win' itself is not indexed)
    stats3 = {}
    search_as_you_type_topk(reader, "win", 10, stats=stats3)
    assert stats3["expanded_terms"] == ["window", "windows", "winter"]
    # empty query
    assert search_as_you_type_topk(reader, "", 10) == []


def test_typo_disable_on_numbers(tmp_path):
    """Meilisearch v1.12 typoTolerance.disableOnNumbers: digit-bearing
    query words get NO typo expansion ('2024' must not match '2025');
    plain words keep expanding under the same settings."""
    from pyspark.sql import SparkSession

    from sparkft.index_build import build_index
    from sparkft.service import IndexSettings, SearchService

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    docs = spark.createDataFrame(
        [(0, "2024 graft report"), (1, "2025 report"), (2, "v2 notes")],
        "doc_id long, text string")
    out = str(tmp_path / "nidx")
    build_index(spark, docs, out, text_col="text", doc_id_col="doc_id",
                num_shards=1, num_buckets=2, verify_sha=False)
    base = dict(typo_tolerance=True, typo_min_word_size_one=2)
    svc = SearchService(out, IndexSettings(**base))
    assert svc._word_groups("2024") == [["2024", "2025"]]  # d=1 expands
    svc_n = SearchService(out, IndexSettings(
        **base, typo_disable_on_numbers=True))
    assert svc_n._word_groups("2024") == [["2024"]]
    # mixed alnum counts as a number too (digit anywhere disables)
    assert svc_n._word_groups("v2") == [["v2"]]
    # plain words still expand under the same settings
    assert "graft" in svc_n._word_groups("graft")[0]
    # end-to-end: only the exact-2024 doc matches
    hits = svc_n.search("2024", 10)["hits"]
    assert [h["doc_id"] for h in hits] == [0]
    hits_on = svc.search("2024", 10)["hits"]
    assert {h["doc_id"] for h in hits_on} == {0, 1}
