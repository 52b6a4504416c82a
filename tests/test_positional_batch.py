"""r6 vectorized positional serving (phrase adjacency + proximity pair
costs batched across docs via composite keys) must reproduce the scalar
per-doc forms exactly — randomized parity vs the r5 reference loops."""

import random
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from sparkft.search import MAX_DISTANCE, _min_pair_cost, _term_occurrence_keys


def _random_positions(rng, n_docs, max_pos=200, max_occ=6):
    """{doc: sorted unique position array} for one term over a doc subset."""
    out = {}
    for d in range(n_docs):
        if rng.random() < 0.7:
            k = rng.randint(1, max_occ)
            out[d] = np.array(
                sorted(rng.sample(range(max_pos), k)), dtype=np.int64)
    return out


def _as_term_pos(per_doc, order):
    docs = np.array(order, dtype=np.int64)
    return docs, [per_doc[d] for d in order]


def test_term_occurrence_keys_roundtrip():
    rng = random.Random(7)
    per_doc = _random_positions(rng, 40)
    order = list(per_doc)
    rng.shuffle(order)  # parquet read order is not sorted by doc
    cand = np.array(sorted(per_doc)[:25], dtype=np.int64)
    keys = _term_occurrence_keys(_as_term_pos(per_doc, order), cand)
    got = {}
    for kk in keys.tolist():
        got.setdefault(int(kk >> 32), []).append(int(kk & 0xFFFFFFFF))
    want = {i: per_doc[int(d)].tolist() for i, d in enumerate(cand.tolist())}
    assert got == want


def test_batch_pair_costs_match_scalar():
    """Replicate proximity_topk's vectorized pair-cost block and compare
    per-doc totals with the scalar _min_pair_cost reference."""
    rng = random.Random(13)
    for trial in range(20):
        n_docs = rng.randint(1, 30)
        pa = _random_positions(rng, n_docs)
        pb = _random_positions(rng, n_docs)
        shared = sorted(set(pa) & set(pb))
        if not shared:
            continue
        cand = np.array(shared, dtype=np.int64)
        oa, ob = list(pa), list(pb)
        rng.shuffle(oa), rng.shuffle(ob)
        ka = _term_occurrence_keys(_as_term_pos(pa, oa), cand)
        kb = _term_occurrence_keys(_as_term_pos(pb, ob), cand)
        shift = np.int64(32)
        da, db = ka >> shift, kb >> shift
        idx_in_a = np.searchsorted(ka, kb)
        big = np.iinfo(np.int64).max
        best = np.full(len(cand), big, dtype=np.int64)
        left = idx_in_a > 0
        if left.any():
            la = idx_in_a[left] - 1
            same = da[la] == db[left]
            if same.any():
                rows = np.nonzero(left)[0][same]
                np.minimum.at(best, db[rows], kb[rows] - ka[la[same]])
        right = idx_in_a < len(ka)
        if right.any():
            ra = idx_in_a[right]
            same = da[ra] == db[right]
            if same.any():
                rows = np.nonzero(right)[0][same]
                np.minimum.at(best, db[rows], ka[ra[same]] - kb[rows] + 1)
        got = np.minimum(best, MAX_DISTANCE).tolist()
        want = [_min_pair_cost(pa[int(d)], pb[int(d)]) for d in cand.tolist()]
        assert got == want, (trial, got, want)


def test_batch_phrase_adjacency_matches_scalar():
    """The composite-key phrase walk must equal the per-doc isin loop."""
    rng = random.Random(29)
    for trial in range(20):
        n_docs = rng.randint(1, 25)
        seq_len = rng.randint(2, 4)
        terms = [f"t{j}" for j in range(seq_len)]
        per_term = {t: _random_positions(rng, n_docs) for t in terms}
        shared = sorted(set.intersection(*[set(per_term[t]) for t in terms]))
        if not shared:
            continue
        cand = np.array(shared, dtype=np.int64)
        keys = {}
        for t in terms:
            order = list(per_term[t])
            rng.shuffle(order)
            keys[t] = _term_occurrence_keys(
                _as_term_pos(per_term[t], order), cand)
        starts = keys[terms[0]]
        for i, t in enumerate(terms[1:], start=1):
            starts = starts[np.isin(starts + i, keys[t])]
        binc = np.bincount((starts >> np.int64(32)).astype(np.int64),
                           minlength=len(cand))
        got = {int(cand[i]): int(c)
               for i, c in enumerate(binc.tolist()) if c}
        # scalar reference (r5 loop)
        want = {}
        for d in cand.tolist():
            st = per_term[terms[0]][int(d)]
            for i, t in enumerate(terms[1:], start=1):
                if len(st) == 0:
                    break
                st = st[np.isin(st + i, per_term[t][int(d)])]
            if len(st):
                want[int(d)] = int(len(st))
        assert got == want, trial
