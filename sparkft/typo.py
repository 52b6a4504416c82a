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
  worker; at 10^8-term scale, precompute the variant table at index-build
  time and ship it as another hive-partitioned artifact).
"""

from __future__ import annotations

# Meilisearch's published defaults (docs: typo-tolerance settings)
ONE_TYPO_MIN_LEN = 5
TWO_TYPOS_MIN_LEN = 9
MAX_EDITS = 2


def allowed_edits(term: str) -> int:
    """Typos allowed for a query word under the Meilisearch default rule."""
    n = len(term)
    if n >= TWO_TYPOS_MIN_LEN:
        return 2
    if n >= ONE_TYPO_MIN_LEN:
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
                 max_word_len: int = 48):
        self.max_edits = max_edits
        self.variants: dict[str, list[str]] = {}
        for w in vocab:
            # cap variant generation for pathological tokens; such a token is
            # still always reachable by its exact form
            e = max_edits if len(w) <= max_word_len else 0
            for v in _deletes(w, e):
                self.variants.setdefault(v, []).append(w)

    def expand(self, term: str) -> list[str]:
        return sorted(self.expand_with_distance(term))

    def expand_with_distance(self, term: str) -> dict[str, int]:
        """Like expand(), but returns {word: exact edit distance} — the
        input the "typo" ranking rule needs (docs matched with fewer typos
        rank higher). Same candidate generation + banded-DP verification."""
        e = min(allowed_edits(term), self.max_edits)
        if e == 0:
            ok = term in self.variants and term in self.variants[term]
            return {term: 0} if ok else {}
        cands: set[str] = set()
        for v in _deletes(term, e):
            cands.update(self.variants.get(v, ()))
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
