"""Training-data pipeline operators: PII scanning/redaction, BPE-style
subword statistics and merge learning, and an eval-contamination screen.

Engine-original (no charabia counterpart — this is the LLM-data-pipeline
surface the task brief asks for beyond the reference's own operators, same
family as `sparkft.dedup`). Everything here is JVM-side `pyspark.sql.
functions` — including BPE's in-array greedy pair merge, which since r6 is
a chained JVM `aggregate` fold (`_merge_pair_col`), so no Python crosses
the executor boundary at all.

Scale notes (100 TB):
- `pii_scan` is a single narrow projection: regex count + replace per row,
  whole-stage-codegen, zero shuffles. Cost is O(bytes scanned), the floor
  for any content filter.
- `bpe_pair_counts` / `learn_bpe_merges` operate on the DISTINCT-token
  vocabulary weighted by corpus frequency, not on the corpus itself: one
  corpus-wide (token -> freq) aggregation, then all subsequent rounds touch
  only the vocabulary (10^6-10^8 rows at web scale, millions of times
  smaller than the corpus). This is how production BPE trainers
  (SentencePiece, HF tokenizers) are structured for the same reason.
- `contamination_screen` broadcasts the probe set (eval-set shingles are
  thousands of rows, never corpus-sized) so the join is map-side; the
  corpus side streams through once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# PII patterns — written to the common subset of Java regex (Spark) and RE2
# (DuckDB oracle): plain character classes, +/{m,}, \b. No lookaround, no
# lazy quantifiers, no \d-class shorthand differences.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[A-Za-z0-9./_-]+"
# NOTE (ADVICE r5, deliberate): the IPv4 pattern over-matches out-of-range
# octets (999.999.999.999) and version-like strings (10.2.0.14) — the
# standard conservative-redaction trade (prefer over-redaction to leaking a
# real address), and the pattern is FROZEN into the round's oracle SQL, so
# tightening it would change declared-query results. Documented, not fixed.
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII inventory + redacted-content fingerprint.

    Returns (doc_id, n_emails, n_urls, n_ipv4, redacted_md5). The counts
    are the audit trail a data-governance pass wants; the md5 of the
    redacted text is the content key a downstream exact-dedup would run on
    (dedup AFTER redaction, so two documents differing only in their PII
    collapse). Redaction order is emails -> URLs -> IPv4, each replacing
    every match; emails first so `user@host` is never half-eaten by the
    URL pass.

    One codegen projection, no shuffle, no UDF.
    """
    t = F.col(text_col)
    red = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, URL_RE, "<URL>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(URL_RE)).cast("long").alias("n_urls"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.md5(red).alias("redacted_md5"),
    )


def vocab_freq(postings: DataFrame) -> DataFrame:
    """(token, freq) corpus-frequency vocabulary from a postings stream.
    The one corpus-sized aggregation in the BPE path; everything after
    works on this (vastly smaller) table."""
    return postings.groupBy("token").agg(F.sum("tf").cast("long").alias("freq"))


def bpe_pair_counts(postings: DataFrame, k: int = 50) -> DataFrame:
    """Top-k adjacent character-pair frequencies over the corpus, weighted
    by token frequency — round 0 of BPE merge learning, and on its own the
    standard corpus statistic for choosing a subword vocabulary size.

    Tokens of length < 2 contribute nothing and are filtered BEFORE the
    sequence() expansion (Spark's `sequence(1, 0)` is a DESCENDING
    two-element array, not empty — the filter is correctness, not
    optimization). Deterministic total order (cnt DESC, pair ASC) so top-k
    is stable.
    """
    vocab = vocab_freq(postings).filter(F.length("token") >= 2)
    pairs = vocab.select(
        F.explode(
            F.expr("transform(sequence(1, length(token) - 1),"
                   " i -> substring(token, i, 2))")
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(k)
    )


# schema of the evolving BPE vocabulary table
_BPE_VOCAB_SCHEMA = "syms array<string>, freq bigint"


def _merge_pair_col(syms_col, left: str, right: str):
    """JVM expression for the greedy left-to-right merge of the adjacent
    symbol pair (left, right) inside a symbol array (r6 — replaces the
    mapInPandas kernel, guide §4.1: no Python boundary per round).

    Left fold: append each symbol unless the accumulator's last element is
    exactly `left` and the incoming symbol is `right`, in which case the
    last element is replaced by the merged token. This reproduces the
    index-scan greedy semantics exactly, including the 'aaa' overlap case:
    a merged token is left+right, which (right being non-empty) can never
    itself equal `left`, so a just-consumed position can never re-merge —
    precisely the i += 2 of the scan ('aaa' -> ['aa','a'], covered by
    test_learn_bpe_merges_overlapping_run)."""
    l_, r_ = F.lit(left), F.lit(right)
    return F.aggregate(
        syms_col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == l_)
            & (x == r_),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.concat(l_, r_))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(postings: DataFrame, n_merges: int = 12,
                     min_freq: int = 2) -> list[tuple[str, str, int]]:
    """Distributed BPE merge learning: `n_merges` rounds of (count adjacent
    symbol pairs over the frequency-weighted vocabulary -> take the argmax
    -> merge it everywhere). Returns [(left, right, pair_count), ...] in
    merge order.

    Spark shape (r6 — ONE job per round, was two plus a Python pass): the
    base vocabulary is localCheckpoint'd once; each round's plan is the
    checkpointed base with the merges so far applied as CHAINED JVM
    aggregate expressions (`_merge_pair_col`), topped by the explode+
    groupBy pair count and a 1-row argmax collect. No per-round
    materialization, no mapInPandas, no per-round Python boundary; the
    only sequential dependency left — the argmax that decides the next
    merge — is the algorithm itself. Re-evaluating k chained merges over
    the vocabulary costs O(k * vocab symbols) per round; at the ~30k-round
    production scale, periodically checkpointing the merged vocabulary
    (every few hundred rounds) bounds the chain — the same lineage-
    truncation policy `dedup.dedup_clusters` uses.

    Ties break (count DESC, left ASC, right ASC) so the result is
    deterministic. Stops early when no pair reaches `min_freq`.
    """
    base = (
        vocab_freq(postings)
        .filter(F.col("freq") >= min_freq)
        .select(F.expr("split(token, '')").alias("syms"), "freq")
    )
    from .spark_util import local_ckpt

    base = local_ckpt(base)

    merges: list[tuple[str, str, int]] = []
    vocab = base
    for _round_no in range(n_merges):
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr("transform(sequence(0, size(syms) - 2),"
                           " i -> struct(syms[i] AS l, syms[i+1] AS r))")
                ).alias("p"),
                "freq",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not pairs or pairs[0]["cnt"] < min_freq:
            break
        best = pairs[0]
        merges.append((best["l"], best["r"], int(best["cnt"])))
        vocab = vocab.select(
            _merge_pair_col(F.col("syms"), best["l"], best["r"]).alias("syms"),
            "freq",
        )

    return merges


def contamination_screen(doc_shingles: DataFrame, probe_shingles: DataFrame,
                         docs: DataFrame, flag_threshold: int = 3) -> DataFrame:
    """Eval-set contamination screen: per document, how many of the probe
    set's shingles it contains, and whether it crosses the quarantine
    threshold. The standard pre-training hygiene pass (n-gram overlap vs
    held-out benchmarks, cf. GPT-3 appendix C / Dolma's decontamination).

    `probe_shingles` is the eval-set side — always tiny relative to the
    corpus — and is broadcast so the join is map-side; `doc_shingles` is
    (doc_id, shingle) DISTINCT shingles of the corpus. Every document gets
    a row (zero hits included) so the output is corpus-sized and stable.
    """
    hits = (
        doc_shingles.join(
            F.broadcast(probe_shingles.select("shingle")), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_probe_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_probe_hits", F.lit(0)).cast("long").alias("n_probe_hits"),
            (F.coalesce("n_probe_hits", F.lit(0)) >= flag_threshold)
            .alias("contaminated"),
        )
    )
