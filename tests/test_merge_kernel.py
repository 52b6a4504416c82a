"""Property test for the vectorized merge kernel (round-3): merging
arbitrary per-partition sub-lists must reproduce exactly the postings a
brute-force single-list encode would produce — same doc order, same
delta+varint bytes semantics, same block metadata, same part split."""

import numpy as np
import pyarrow as pa
import pytest

from sparkft import codec, scoring
from sparkft.index_build import (
    i64_to_u64,
    make_encode_partition_fn,
    make_merge_partition_fn,
    u64_to_i64,
    _token_bucket,
)


def _encode_sublists(groups: dict, avgdl: float) -> list:
    """Build SUBLIST-schema record batches from {token: [(salt, ids, tfs,
    lens)]} via the real encode fn (one partition per salt)."""
    batches = []
    rows = []
    for token, subs in sorted(groups.items()):
        for salt, ids, tfs, lens in subs:
            order = np.argsort(ids)
            for i in order:
                rows.append((token, salt, int(ids[i]), int(tfs[i]),
                             int(lens[i])))
    rows.sort(key=lambda r: (r[0], r[1], r[2]))
    tbl = pa.table({
        "token": [r[0] for r in rows],
        "salt": pa.array([r[1] for r in rows], pa.int32()),
        "doc_id": pa.array([r[2] for r in rows], pa.int64()),
        "tf": pa.array([r[3] for r in rows], pa.int64()),
        "doc_len": pa.array([r[4] for r in rows], pa.int64()),
    })
    fn = make_encode_partition_fn(avgdl)
    return list(fn(iter(tbl.to_batches())))


def _run_merge(sub_batches, avgdl, num_buckets=4, seg_max=64):
    fn = make_merge_partition_fn(avgdl, num_buckets, seg_max=seg_max)
    out = list(fn(iter(sub_batches)))
    return pa.Table.from_batches(out) if out else None


def _decode_rows(tbl):
    """{(token, part): (ids, tfs, lens, df, first_doc, bmax, blast,
    bucket)}"""
    got = {}
    for i in range(tbl.num_rows):
        r = {c: tbl.column(c)[i].as_py() for c in tbl.column_names}
        ids, tfs, lens = codec.decode_posting_list(
            r["doc_gaps"], r["tfs"], r["lens"])
        got[(r["token"], r["part"])] = (
            u64_to_i64(ids).tolist(), tfs.tolist(), lens.tolist(),
            r["df"], r["first_doc"], r["block_max"], r["block_last"],
            r["bucket"],
        )
    return got


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_vectorized_merge_equals_bruteforce(seed):
    rng = np.random.default_rng(seed)
    avgdl = 37.5
    seg_max = 64
    groups = {}
    vocab = [f"tok{i}" for i in range(30)]
    for t in vocab:
        n_subs = int(rng.integers(1, 6))
        all_ids = rng.choice(200_000, size=int(rng.integers(1, 300)),
                             replace=False)
        # split the doc ids across sublists (disjoint, like partitions)
        parts = np.array_split(rng.permutation(all_ids), n_subs)
        subs = []
        for s, pids in enumerate(parts):
            if len(pids) == 0:
                continue
            pids = np.sort(pids)
            subs.append((s, pids,
                         rng.integers(1, 30, len(pids)),
                         rng.integers(1, 500, len(pids))))
        groups[t] = subs
    sub_batches = _encode_sublists(groups, avgdl)
    tbl = _run_merge(sub_batches, avgdl, seg_max=seg_max)
    got = _decode_rows(tbl)

    for t, subs in groups.items():
        ids = np.concatenate([s[1] for s in subs])
        tfs = np.concatenate([s[2] for s in subs])
        lens = np.concatenate([s[3] for s in subs])
        order = np.argsort(ids)
        ids, tfs, lens = ids[order], tfs[order], lens[order]
        n = len(ids)
        n_parts = (n + seg_max - 1) // seg_max
        for part in range(n_parts):
            lo, hi = part * seg_max, min((part + 1) * seg_max, n)
            want_ids = ids[lo:hi]
            key = (t, part)
            assert key in got, key
            g_ids, g_tfs, g_lens, g_df, g_first, g_bmax, g_blast, g_b = \
                got[key]
            assert g_ids == want_ids.tolist(), key
            assert g_tfs == tfs[lo:hi].tolist(), key
            assert g_lens == lens[lo:hi].tolist(), key
            assert g_df == n, key  # df = FULL group size on every part
            assert g_first == int(want_ids[0]), key
            assert g_b == _token_bucket(t, 4), key
            # block metadata: max tf-component + last doc per 128-block
            tfn = scoring.tf_component(tfs[lo:hi], lens[lo:hi], avgdl)
            bm, bl = codec.block_maxes(
                tfn, i64_to_u64(want_ids.astype(np.int64)))
            assert np.allclose(g_bmax, bm), key
            assert g_blast == u64_to_i64(bl).tolist(), key
        assert (t, n_parts) not in got  # no extra parts
    # nothing extra
    assert len(got) == sum(
        (len(np.concatenate([s[1] for s in subs])) + seg_max - 1) // seg_max
        for subs in groups.values()
    )


def test_chunked_merge_identical_to_unchunked(monkeypatch):
    """The memory-bounding chunk loop must not change output: forcing a
    tiny MERGE_CHUNK_VALUES (many chunks, group boundaries respected)
    yields exactly the batches of one big pass."""
    import sparkft.index_build as ib

    rng = np.random.default_rng(9)
    avgdl = 22.0
    groups = {}
    for i in range(20):
        ids = np.sort(rng.choice(100_000, size=int(rng.integers(5, 200)),
                                 replace=False))
        parts = np.array_split(ids, int(rng.integers(2, 5)))
        groups[f"w{i}"] = [
            (s, p, rng.integers(1, 9, len(p)), rng.integers(5, 99, len(p)))
            for s, p in enumerate(parts) if len(p)
        ]
    subs = _encode_sublists(groups, avgdl)
    big = _decode_rows(_run_merge(subs, avgdl, seg_max=64))
    monkeypatch.setattr(ib, "MERGE_CHUNK_VALUES", 100)
    small = _decode_rows(_run_merge(subs, avgdl, seg_max=64))
    assert big == small


def test_single_sublist_giant_token_is_part_split():
    """A df > seg_max token arriving as ONE sublist still splits into
    bounded parts (the vectorized path handles n_subs == 1)."""
    avgdl = 10.0
    ids = np.arange(1, 201) * 7
    groups = {"giant": [(0, ids, np.ones(200, dtype=np.int64),
                         np.full(200, 9, dtype=np.int64))]}
    tbl = _run_merge(_encode_sublists(groups, avgdl), avgdl, seg_max=64)
    got = _decode_rows(tbl)
    assert sorted(p for _, p in got) == [0, 1, 2, 3]
    recon = [d for p in range(4) for d in got[("giant", p)][0]]
    assert recon == ids.tolist()
    assert all(got[("giant", p)][3] == 200 for p in range(4))
