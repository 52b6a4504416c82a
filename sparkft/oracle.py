"""Single-node reference scorer (pandas/NumPy) for rank-identity checks.

Uses the same tokenizer functions and the same `scoring` module as the
distributed engine; per-doc sums accumulate in sorted-term order — so
engine-vs-oracle top-k equality is structural, down to float64 bits
(BASELINE.md "BM25 top-10 rank-identity rate = 1.0")."""

from __future__ import annotations

import numpy as np

from . import scoring
from .config import DEFAULT_CONFIG, TokenizerConfig
from .tokenizer import tokenize_batch


class BruteForceIndex:
    def __init__(self, doc_ids, texts, cfg: TokenizerConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.doc_ids = np.asarray(doc_ids, dtype=np.int64)
        rows, lemmas = tokenize_batch(list(texts), cfg, words_only=True)
        keep = [i for i, l in enumerate(lemmas) if l]
        rows = rows[keep]
        lemmas = [lemmas[i] for i in keep]
        import pandas as pd

        pf = pd.DataFrame({"row": rows, "token": lemmas})
        tf = pf.groupby(["row", "token"], sort=True).size().rename("tf").reset_index()
        self.postings = {
            tok: (grp["row"].to_numpy(), grp["tf"].to_numpy())
            for tok, grp in tf.groupby("token", sort=True)
        }
        doc_len = np.zeros(len(self.doc_ids), dtype=np.int64)
        np.add.at(doc_len, rows, 1)
        self.doc_len = doc_len
        self.N = len(self.doc_ids)
        self.avgdl = float(doc_len.sum()) / max(self.N, 1)

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        _, qlem = tokenize_batch([query], self.cfg, words_only=True)
        terms = sorted({t for t in qlem if t})
        acc: dict[int, float] = {}
        for term in terms:
            if term not in self.postings:
                continue
            rows, tfs = self.postings[term]
            df = len(rows)
            sc = scoring.bm25(tfs, self.doc_len[rows], df, self.N, self.avgdl)
            for r, s in zip(rows.tolist(), sc.tolist()):
                d = int(self.doc_ids[r])
                acc[d] = acc.get(d, 0.0) + s
        if not acc:
            return []
        dids = np.fromiter(acc.keys(), dtype=np.int64, count=len(acc))
        scores = np.fromiter(acc.values(), dtype=np.float64, count=len(acc))
        top = scoring.topk_indices(scores, dids, k)
        return [(int(dids[i]), float(scores[i])) for i in top]

    def filtered_topk(self, query: str, k: int = 10,
                      allowed=None) -> list[tuple[int, float]]:
        """Attribute-filtered reference ranking: the full (index-global
        statistics) ranking restricted to `allowed` doc_ids. Mirrors the
        engine's filtered WAND, where the filter gates candidates but never
        the BM25 model."""
        full = self.topk(query, k=self.N)
        if allowed is not None:
            allowed = set(int(d) for d in allowed)
            full = [(d, s) for d, s in full if d in allowed]
        return full[:k]

    def words_topk(self, query: str, k: int = 10) -> list[tuple[int, int, float]]:
        """Reference for the "words" ranking rule: (distinct query terms
        matched DESC, BM25 sum DESC, doc_id ASC); same sorted-term
        accumulation order as the engine, so equality is float64-exact."""
        _, qlem = tokenize_batch([query], self.cfg, words_only=True)
        terms = sorted({t for t in qlem if t})
        acc: dict[int, float] = {}
        cnt: dict[int, int] = {}
        for term in terms:
            if term not in self.postings:
                continue
            rows, tfs = self.postings[term]
            df = len(rows)
            sc = scoring.bm25(tfs, self.doc_len[rows], df, self.N, self.avgdl)
            for r, s in zip(rows.tolist(), sc.tolist()):
                d = int(self.doc_ids[r])
                acc[d] = acc.get(d, 0.0) + s
                cnt[d] = cnt.get(d, 0) + 1
        order = sorted(acc, key=lambda d: (-cnt[d], -acc[d], d))[:k]
        return [(d, cnt[d], acc[d]) for d in order]


class BruteForcePhraseIndex(BruteForceIndex):
    """Adds exact-phrase search over the raw token streams (positions are
    word indices in the ordered word-token stream, matching the engine)."""

    def __init__(self, doc_ids, texts, cfg: TokenizerConfig = DEFAULT_CONFIG):
        texts = list(texts)  # a one-shot iterator would be consumed by the
        # base __init__, silently leaving the phrase streams empty
        super().__init__(doc_ids, texts, cfg)
        rows, lemmas = tokenize_batch(texts, cfg, words_only=True)
        keep = [i for i, l in enumerate(lemmas) if l]
        self._streams: dict[int, list[str]] = {}
        for i in keep:
            self._streams.setdefault(int(rows[i]), []).append(lemmas[i])

    def phrase_topk(self, phrase: str, k: int = 10) -> list[tuple[int, float]]:
        _, qlem = tokenize_batch([phrase], self.cfg, words_only=True)
        seq = [t for t in qlem if t]
        if not seq:
            return []
        n = len(seq)
        matches = []
        for row, stream in self._streams.items():
            for i in range(len(stream) - n + 1):
                if stream[i : i + n] == seq:
                    matches.append(int(self.doc_ids[row]))
                    break
        if not matches:
            return []
        terms = sorted(set(seq))
        mset = set(matches)
        acc = {m: 0.0 for m in matches}
        for term in terms:
            if term not in self.postings:
                continue
            rows_, tfs = self.postings[term]
            df = len(rows_)
            sc = scoring.bm25(tfs, self.doc_len[rows_], df, self.N, self.avgdl)
            for r, s in zip(rows_.tolist(), sc.tolist()):
                d = int(self.doc_ids[r])
                if d in mset:
                    acc[d] += s
        dids = np.fromiter(acc.keys(), dtype=np.int64, count=len(acc))
        scores = np.fromiter(acc.values(), dtype=np.float64, count=len(acc))
        top = scoring.topk_indices(scores, dids, k)
        return [(int(dids[i]), float(scores[i])) for i in top]
