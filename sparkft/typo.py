"""Typo-tolerant and prefix query expansion (engine-original).

The reference is Meilisearch's tokenizer; typo tolerance is the flagship
search feature Meilisearch builds on top of it, with the published default
rule (Meilisearch docs, `typoTolerance.minWordSizeForTypos`): words shorter
than 5 chars allow 0 typos, 5-8 chars allow 1, 9+ allow 2 — a typo being one
Levenshtein edit (insert / delete / substitute).

Expansion = replace each query term with every index-dictionary word within
its allowed edit distance, then rank the union of expanded words with the
same BM25 sum as plain disjunctive search. Two expansion paths:

- Spark-side (`expand_terms_df`): dictionary frame x broadcast query terms
  with a thresholded `F.levenshtein` — the batch/pipeline path. The query
  side is tiny, so this is a broadcast nested-loop with the edit-distance
  predicate evaluated in the JVM; work is O(|dictionary| * |query terms|)
  regardless of corpus size, and the dictionary frame is the *distinct token*
  relation (orders of magnitude smaller than postings).
- Driver/worker-side (`SymSpellIndex`): a deletion-neighborhood index
  (SymSpell; Garbe's public algorithm) over the reader's term dictionary.
  lev(a, b) <= e implies some <=e-deletion of `a` equals some <=e-deletion
  of `b`, so variant collision is a complete candidate generator; candidates
  are then verified with an exact banded DP. Build cost is
  O(|dict| * len^e) once per reader (amortized across queries on a serving
  worker).
- Precomputed (`write_variant_table` + `PrecomputedSymSpell`): the scale
  path — the (variant, word) table is generated ONCE at index-build time
  entirely JVM-side (nested higher-order functions build the deletion
  neighborhood, no Python in the plan) and written hive-partitioned by
  `pmod(crc32(variant), B)`. A serving worker never scans the term
  dictionary: `expand(term)` computes the term's own <=e deletes (a few
  dozen strings), hashes them to buckets, and reads ONLY those bucket
  files (cached after first touch). Lookup IO is O(len(term)^e) bucket
  probes, independent of |dictionary|.

Long words: deletion neighborhoods are generated from the first
`max_word_len` chars (SymSpell's own prefix-indexing strategy) on BOTH the
index and the query side, so pathological tokens (hashes, minified code)
stay O(prefix^e) while remaining reachable from any typo; candidates are
always verified with the full edit-distance DP.
"""

from __future__ import annotations

import json
import os
import zlib

# Meilisearch's published defaults (docs: typo-tolerance settings)
ONE_TYPO_MIN_LEN = 5
TWO_TYPOS_MIN_LEN = 9
MAX_EDITS = 2
MAX_WORD_LEN = 48  # prefix-key length for deletion-neighborhood generation
TYPO_DIR = "typo_variants"


def allowed_edits(term: str, one_typo_min: int = ONE_TYPO_MIN_LEN,
                  two_typos_min: int = TWO_TYPOS_MIN_LEN) -> int:
    """Typos allowed for a query word under the Meilisearch length rule;
    the thresholds are the index settings `typoTolerance.minWordSizeFor
    Typos.{oneTypo,twoTypos}` (defaults 5/9)."""
    n = len(term)
    if n >= two_typos_min:
        return 2
    if n >= one_typo_min:
        return 1
    return 0


def levenshtein(a: str, b: str, cap: int) -> int:
    """Plain Levenshtein distance (insert/delete/substitute — matches both
    Spark's and DuckDB's `levenshtein`), early-exit once the row minimum
    exceeds `cap` (returns cap + 1)."""
    if a == b:
        return 0
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        row_min = i
        for j, cb in enumerate(b, start=1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            cur.append(v)
            if v < row_min:
                row_min = v
        if row_min > cap:
            return cap + 1
        prev = cur
    return prev[-1]


def _deletes(word: str, max_edits: int) -> set[str]:
    """All strings reachable from `word` by deleting up to max_edits chars
    (including `word` itself)."""
    out = {word}
    frontier = {word}
    for _ in range(max_edits):
        nxt = set()
        for w in frontier:
            for i in range(len(w)):
                nxt.add(w[:i] + w[i + 1:])
        nxt -= out
        out |= nxt
        frontier = nxt
    return out


class SymSpellIndex:
    """Deletion-neighborhood index over a term dictionary.

    `expand(term)` returns every dictionary word within
    `allowed_edits(term)` Levenshtein edits, exact matches included.
    """

    def __init__(self, vocab: list[str], max_edits: int = MAX_EDITS,
                 max_word_len: int = MAX_WORD_LEN):
        self.max_edits = max_edits
        self.max_word_len = max_word_len
        self.variants: dict[str, list[str]] = {}
        for w in vocab:
            # prefix-key indexing: deletes come from the first max_word_len
            # chars, so pathological tokens stay O(prefix^e) yet any typo of
            # them (insert/delete/substitute anywhere) still collides
            for v in _deletes(w[:max_word_len], max_edits):
                self.variants.setdefault(v, []).append(w)

    def expand(self, term: str, one_typo_min: int = ONE_TYPO_MIN_LEN,
               two_typos_min: int = TWO_TYPOS_MIN_LEN) -> list[str]:
        return sorted(self.expand_with_distance(term, one_typo_min,
                                                two_typos_min))

    def expand_with_distance(self, term: str,
                             one_typo_min: int = ONE_TYPO_MIN_LEN,
                             two_typos_min: int = TWO_TYPOS_MIN_LEN
                             ) -> dict[str, int]:
        """Like expand(), but returns {word: exact edit distance} — the
        input the "typo" ranking rule needs (docs matched with fewer typos
        rank higher). Same candidate generation + banded-DP verification.
        The thresholds are Meilisearch's minWordSizeForTypos settings; the
        index itself is threshold-independent (it stores the full
        max_edits deletion neighborhood), so per-query settings need no
        rebuild."""
        e = min(allowed_edits(term, one_typo_min, two_typos_min),
                self.max_edits)
        key = term[:self.max_word_len]
        if e == 0:
            ok = term in self.variants.get(key, ())
            return {term: 0} if ok else {}
        cands: set[str] = set()
        for v in _deletes(key, e):
            cands.update(self.variants.get(v, ()))
        out = {}
        for w in sorted(cands):
            d = levenshtein(term, w, e)
            if d <= e:
                out[w] = d
        return out


def write_variant_table(spark, index_dir: str, num_buckets: int = 16,
                        max_edits: int = MAX_EDITS,
                        max_word_len: int = MAX_WORD_LEN,
                        cfg=None) -> str:
    """Precompute the SymSpell deletion-neighborhood as a build artifact.

    One scan of the segment store's token column (part=0 rows carry each
    token exactly once), then the <=max_edits deletion neighborhood of each
    token's prefix key is generated with nested higher-order functions —
    transform/flatten/array_distinct, all whole-stage-codegen JVM, no
    Python — exploded to (variant, word) rows and written hive-partitioned
    by pmod(crc32(variant), num_buckets). ~|V| * len^e rows of short
    strings; the heavy O(|dict| * len^e) work happens once per BUILD, not
    once per serving worker."""
    from pyspark.sql import functions as F

    toks = (
        spark.read.parquet(f"{index_dir}/segments")
        .filter(F.col("part") == 0)
        .select(F.col("token").alias("word"))
        .distinct()
        .withColumn("key", F.expr(f"substring(word, 1, {max_word_len})"))
    )
    # distance-1 and distance-2 deletes of the prefix key (empty string
    # included when the key is short enough — parity with _deletes())
    d1 = ("array_distinct(transform(sequence(0, length(key) - 1), "
          "i -> concat(substring(key, 1, i), substring(key, i + 2))))")
    exprs = {1: d1}
    if max_edits >= 2:
        exprs[2] = (
            f"array_distinct(flatten(transform({d1}, v -> "
            "transform(sequence(0, length(v) - 1), "
            "j -> concat(substring(v, 1, j), substring(v, j + 2))))))"
        )
    if max_edits > 2:
        raise ValueError("write_variant_table supports max_edits <= 2")
    all_vars = "array_distinct(concat(array(key), " + ", ".join(
        exprs[e] for e in sorted(exprs)) + "))"
    out = f"{index_dir}/{TYPO_DIR}"
    (
        toks.select("word", F.explode(F.expr(all_vars)).alias("variant"))
        .withColumn(
            "bucket",
            F.pmod(F.crc32(F.col("variant").cast("binary")),
                   F.lit(num_buckets)).cast("int"),
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out)
    )
    from .facets import _contract_stamp

    with open(f"{out}/_meta.json", "w") as f:
        json.dump({"num_buckets": num_buckets, "max_edits": max_edits,
                   "max_word_len": max_word_len,
                   **_contract_stamp(cfg, index_dir)}, f)
    return out


class PrecomputedSymSpell:
    """SymSpell expansion over the precomputed variant artifact.

    Drop-in for SymSpellIndex's expand()/expand_with_distance(), but the
    serving worker never scans the term dictionary: a query term's own
    deletion neighborhood (a few dozen strings) is hashed to buckets and
    ONLY those hive partitions are read (cached after first touch) — IO is
    O(len(term)^e) bucket probes, independent of dictionary size."""

    def __init__(self, index_dir: str):
        from .facets import _verify_sibling_stamp

        self.dir = f"{index_dir}/{TYPO_DIR}"
        with open(f"{self.dir}/_meta.json") as f:
            meta = json.load(f)
        _verify_sibling_stamp(index_dir, meta, "typo variant table")
        self.num_buckets = meta["num_buckets"]
        self.max_edits = meta["max_edits"]
        self.max_word_len = meta["max_word_len"]
        self._buckets: dict[int, dict[str, list[str]]] = {}

    def _bucket_of(self, variant: str) -> int:
        # matches the writer's pmod(crc32(variant), num_buckets)
        return zlib.crc32(variant.encode("utf-8")) % self.num_buckets

    def _load(self, b: int) -> dict[str, list[str]]:
        got = self._buckets.get(b)
        if got is None:
            import pyarrow.dataset as ds

            path = f"{self.dir}/bucket={b}"
            got = {}
            if os.path.isdir(path):
                tbl = ds.dataset(path, format="parquet").to_table(
                    columns=["variant", "word"])
                for v, w in zip(tbl["variant"].to_pylist(),
                                tbl["word"].to_pylist()):
                    got.setdefault(v, []).append(w)
            self._buckets[b] = got
        return got

    def expand(self, term: str, one_typo_min: int = ONE_TYPO_MIN_LEN,
               two_typos_min: int = TWO_TYPOS_MIN_LEN) -> list[str]:
        return sorted(self.expand_with_distance(term, one_typo_min,
                                                two_typos_min))

    def expand_with_distance(self, term: str,
                             one_typo_min: int = ONE_TYPO_MIN_LEN,
                             two_typos_min: int = TWO_TYPOS_MIN_LEN
                             ) -> dict[str, int]:
        e = min(allowed_edits(term, one_typo_min, two_typos_min),
                self.max_edits)
        key = term[:self.max_word_len]
        if e == 0:
            ok = term in self._load(self._bucket_of(key)).get(key, ())
            return {term: 0} if ok else {}
        cands: set[str] = set()
        for v in _deletes(key, e):
            cands.update(self._load(self._bucket_of(v)).get(v, ()))
        out = {}
        for w in sorted(cands):
            d = levenshtein(term, w, e)
            if d <= e:
                out[w] = d
        return out


def expand_terms_df(dictionary_df, terms: list[str]):
    """Spark-side expansion: (token) rows of `dictionary_df` within each
    query term's allowed edit distance. Returns a distinct (token) frame.

    The query side is a literal broadcast; the levenshtein predicate runs
    JVM-side with the per-term threshold, so Spark's short-circuit bound
    applies. Plan shape: BroadcastNestedLoopJoin over the distinct-token
    relation — O(|dict| * |terms|), never touching postings."""
    from pyspark.sql import functions as F

    spark = dictionary_df.sparkSession
    q = spark.createDataFrame(
        [(t, allowed_edits(t)) for t in terms], "qterm string, maxe int"
    )
    return (
        dictionary_df.select("token")
        .distinct()
        .crossJoin(F.broadcast(q))
        .filter(F.levenshtein(F.col("token"), F.col("qterm")) <= F.col("maxe"))
        .select("token")
        .distinct()
    )
