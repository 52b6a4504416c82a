"""Governance / subword-stat operators (sparkft.corpus_ops): PII scan +
redaction, BPE pair stats + distributed merge learning, contamination
screen. The DuckDB-vs-Spark value equality of the oracled entries is the
driver's job; these tests pin the SEMANTICS against hand-computed and
pure-Python references, plus the plan shapes that make them scale."""

import hashlib

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-corpus-ops-tests")
        .getOrCreate()
    )
    yield s


# ---------------------------------------------------------------------------
# pii_scan
# ---------------------------------------------------------------------------


def test_pii_scan_counts_and_redaction(spark):
    from sparkft.corpus_ops import pii_scan

    docs = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d@e.org plus https://x.org/p at 10.0.0.1"),
            (2, "no pii here at all"),
            (3, "ip 192.168.1.255 twice 8.8.8.8 url http://a.example.com/z"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scan(docs).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_urls"], rows[1]["n_ipv4"]) == (2, 1, 1)
    assert (rows[2]["n_emails"], rows[2]["n_urls"], rows[2]["n_ipv4"]) == (0, 0, 0)
    # http://a.example.com/z is a URL, and its host must NOT also be
    # half-counted as anything else; two distinct IPs counted
    assert (rows[3]["n_emails"], rows[3]["n_urls"], rows[3]["n_ipv4"]) == (0, 1, 2)

    # redacted hash == md5 of the hand-redacted text; no-PII text hashes as-is
    exp1 = "mail <EMAIL> and <EMAIL> plus <URL> at <IP>"
    assert rows[1]["redacted_md5"] == hashlib.md5(exp1.encode()).hexdigest()
    assert rows[2]["redacted_md5"] == hashlib.md5(b"no pii here at all").hexdigest()


def test_pii_scan_is_shuffle_free(spark):
    """One narrow codegen projection: a content filter that shuffles would
    be a scale bug, not a style issue."""
    from sparkft.corpus_ops import pii_scan

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = pii_scan(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# bpe_pair_counts / learn_bpe_merges
# ---------------------------------------------------------------------------


def _postings_df(spark, corpus: dict[str, int]):
    rows = [(0, tok, tf) for tok, tf in corpus.items()]
    return spark.createDataFrame(rows, "doc_id long, token string, tf long")


def test_bpe_pair_counts_weighted_and_len1_excluded(spark):
    from sparkft.corpus_ops import bpe_pair_counts

    p = _postings_df(spark, {"ab": 3, "abc": 2, "a": 100})
    got = {r["pair"]: r["cnt"] for r in bpe_pair_counts(p, k=10).collect()}
    # 'a' (len 1) contributes nothing despite tf=100
    assert got == {"ab": 5, "bc": 2}


def _bpe_reference(corpus: dict[str, int], n_merges: int, min_freq: int = 2):
    """Pure-Python BPE with the module's exact tie-break: (count DESC,
    left ASC, right ASC); greedy left-to-right merge within words."""
    vocab = {tuple(w): f for w, f in corpus.items() if f >= min_freq}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[syms[i], syms[i + 1]] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_freq:
            break
        (l, r), c = best
        merges.append((l, r, c))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_learn_bpe_merges_matches_reference(spark):
    """The classic Sennrich corpus: distributed rounds must reproduce the
    sequential trainer's merge list exactly (incl. cascading merges and
    tie-breaks)."""
    from sparkft.corpus_ops import learn_bpe_merges

    corpus = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    got = learn_bpe_merges(_postings_df(spark, corpus), n_merges=8)
    want = _bpe_reference(corpus, 8)
    assert got == want
    # sanity on the classic result: 'es' then 'est' are the first merges
    assert got[0][:2] == ("e", "s") and got[1][:2] == ("es", "t")


def test_learn_bpe_merges_overlapping_run(spark):
    """'aaaa' x4 + merge (a,a): greedy left-to-right gives ['aa','aa'], so
    round 2's top pair is (aa,aa) — the sequential-semantics case SQL
    arrays can't express."""
    from sparkft.corpus_ops import learn_bpe_merges

    got = learn_bpe_merges(_postings_df(spark, {"aaaa": 4}), n_merges=2)
    assert got == [("a", "a", 12), ("aa", "aa", 4)]


# ---------------------------------------------------------------------------
# contamination_screen
# ---------------------------------------------------------------------------


def test_contamination_screen_counts_and_flag(spark):
    from pyspark.sql import functions as F

    from sparkft.corpus_ops import contamination_screen

    docs = spark.createDataFrame(
        [(1,), (2,), (3,)], "doc_id long")
    doc_sh = spark.createDataFrame(
        [(1, "a b c"), (1, "b c d"), (1, "x y z"),
         (2, "a b c"),
         (3, "q r s")],
        "doc_id long, shingle string",
    )
    probes = spark.createDataFrame(
        [("a b c",), ("b c d",), ("x y z",), ("m n o",)], "shingle string")
    out = contamination_screen(doc_sh, probes, docs, flag_threshold=3)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert (rows[1]["n_probe_hits"], rows[1]["contaminated"]) == (3, True)
    assert (rows[2]["n_probe_hits"], rows[2]["contaminated"]) == (1, False)
    assert (rows[3]["n_probe_hits"], rows[3]["contaminated"]) == (0, False)

    # probe side must broadcast: the corpus-side join is map-side by design
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert F is not None  # silence unused-import linters


# ---------------------------------------------------------------------------
# entry wiring
# ---------------------------------------------------------------------------


def test_entry_pii_augmentation_has_mixed_rows(spark):
    """The in-query augmentation must produce rows with hits AND rows
    without, or the entry degenerates to a constant check."""
    import __spark_entry__ as e

    df = e.queries()["pii_scan"](spark, "/root/testdata/sf0.001").collect()
    n_zero = sum(1 for r in df
                 if (r["n_emails"], r["n_urls"], r["n_ipv4"]) == (0, 0, 0))
    n_hit = len(df) - n_zero
    assert n_zero > 0 and n_hit > 0
