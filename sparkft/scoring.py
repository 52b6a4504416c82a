"""BM25 scoring math — single source of truth.

Shared by the distributed engine (sparkft.search), the single-node oracle
(sparkft.oracle) and the SQL oracles in __spark_entry__, so rank-identity is
structural: identical float64 operations in identical order.

score(t, d) = idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))      (Lucene-style)
k1 = 1.2, b = 0.75 (pinned by the north rule).

Per-document scores sum term contributions in lexicographically sorted term
order; ties broken by (score desc, doc_id asc).
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(N: int, df) -> np.ndarray:
    """Lucene BM25 idf; df may be scalar or ndarray."""
    df = np.asarray(df, dtype=np.float64)
    return np.log1p((N - df + 0.5) / (df + 0.5))


def tf_component(tf, doc_len, avgdl: float) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(doc_len, dtype=np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def bm25(tf, doc_len, df, N: int, avgdl: float) -> np.ndarray:
    return idf(N, df) * tf_component(tf, doc_len, avgdl)


def topk_indices(scores: np.ndarray, doc_ids: np.ndarray, k: int) -> np.ndarray:
    """Deterministic top-k: (score desc, doc_id asc).

    O(n) selection (argpartition) + an O(k log k) sort of the candidates —
    a full lexsort of a million-candidate score array costs more than the
    whole posting decode at serving time. Boundary ties are resolved by
    doc_id asc: everything strictly above the kth score is in, the k-th
    slot ties are filled by smallest doc_id."""
    n = len(scores)
    if n == 0 or k <= 0:
        return np.empty(0, dtype=np.int64)
    cand = None
    if k < n:
        kth = np.partition(scores, n - k)[n - k]  # k-th largest score
        above = np.flatnonzero(scores > kth)
        need = k - len(above)
        eq = np.flatnonzero(scores == kth)
        if need < len(eq):  # tie at the boundary: smallest doc_ids win
            eq = eq[np.argpartition(doc_ids[eq], need - 1)[:need]] \
                if need > 0 else eq[:0]
        cand = np.concatenate([above, eq])
        if len(cand) < k:
            # NaN scores poison the >/== boundary selection (a NaN kth
            # selects nothing; NaNs elsewhere leave the set under-full).
            # Degenerate input — fall back to the full lexsort, which
            # ranks NaN last (same policy as facets.sort_topk).
            cand = None
    if cand is None:
        cand = np.arange(n)
    order = np.lexsort((doc_ids[cand], -scores[cand]))
    return cand[order[:k]]

