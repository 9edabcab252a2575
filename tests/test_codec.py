"""Codec unit tests: RVL vbyte round-trip + format pins + posting blocks."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from indri_5_5_ray.codec import (
    cut_blocks,
    decode_block,
    encode_block,
    fold_negatives,
    segmented_cumsum,
    segmented_delta,
    unfold_negatives,
    vbyte_decode,
    vbyte_encode,
    vbyte_sizes,
)


def test_vbyte_format_pins():
    # single-byte value: terminator bit set (ref:RVLCompress.hpp:99-110)
    assert vbyte_encode(np.array([0])) == bytes([0x80])
    assert vbyte_encode(np.array([1])) == bytes([0x81])
    assert vbyte_encode(np.array([127])) == bytes([0xFF])
    # two bytes: low 7 bits first (little-endian groups), high bit on last
    assert vbyte_encode(np.array([128])) == bytes([0x00, 0x81])
    assert vbyte_encode(np.array([300])) == bytes([300 & 0x7F, 0x80 | (300 >> 7)])


def test_vbyte_sizes():
    vals = np.array([0, 127, 128, (1 << 14) - 1, 1 << 14, (1 << 21) - 1, 1 << 21])
    assert vbyte_sizes(vals).tolist() == [1, 1, 2, 2, 3, 3, 4]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_vbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert vbyte_decode(vbyte_encode(arr)).tolist() == values


def test_fold_negatives():
    # ref:RVLCompress.hpp:65-75
    v = np.array([0, -1, 1, -2, 2, -(10**12), 10**12])
    assert unfold_negatives(fold_negatives(v)).tolist() == v.tolist()
    assert fold_negatives(np.array([-1])).tolist() == [1]
    assert fold_negatives(np.array([1])).tolist() == [2]


def test_segmented_cumsum_delta_roundtrip():
    vals = np.array([3, 5, 9, 1, 2, 7, 7, 8], dtype=np.int64)
    lens = np.array([3, 2, 3])
    d = segmented_delta(vals, lens)
    assert segmented_cumsum(d, lens).tolist() == vals.tolist()


def test_block_roundtrip_with_positions():
    doc_ids = np.array([5, 9, 12, 100, 101])
    tfs = np.array([2, 1, 3, 1, 2])
    positions = np.array([0, 7, 3, 1, 5, 9, 0, 2, 6])
    buf = encode_block(doc_ids, tfs, positions)
    d, t, p = decode_block(buf, has_positions=True)
    assert d.tolist() == doc_ids.tolist()
    assert t.tolist() == tfs.tolist()
    assert p.tolist() == positions.tolist()


def test_block_roundtrip_no_positions():
    doc_ids = np.array([0, 1, 2, 50])
    tfs = np.array([1, 4, 2, 9])
    buf = encode_block(doc_ids, tfs, None)
    d, t, p = decode_block(buf, has_positions=False)
    assert d.tolist() == doc_ids.tolist()
    assert t.tolist() == tfs.tolist()
    assert p is None


def test_cut_blocks_boundaries_and_roundtrip():
    n = 5000
    rng = np.random.default_rng(7)
    doc_ids = np.cumsum(rng.integers(1, 5, n))
    tfs = rng.integers(1, 8, n)
    positions = np.concatenate([np.sort(rng.choice(10000, size=tf, replace=False)) for tf in tfs])
    blocks = cut_blocks(doc_ids, tfs, positions, target_bytes=512)
    assert len(blocks) > 1
    all_d, all_t, all_p = [], [], []
    for first, last, payload, bd, bt in blocks:
        d, t, p = decode_block(payload, has_positions=True)
        assert d[0] == first and d[-1] == last
        all_d.append(d)
        all_t.append(t)
        all_p.append(p)
    assert np.concatenate(all_d).tolist() == doc_ids.tolist()
    assert np.concatenate(all_t).tolist() == tfs.tolist()
    assert np.concatenate(all_p).tolist() == positions.tolist()


def test_cut_blocks_pre_matches_assemble_block():
    """Vectorized whole-term encode ≡ per-block assemble_block output."""
    import numpy as np

    from indri_5_5_ray.codec import assemble_block, cut_blocks_pre, decode_block

    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(1, 400))
        doc_ids = np.cumsum(rng.integers(1, 2000, n)).astype(np.int64)
        tfs = rng.integers(1, 300, n).astype(np.int64)
        # fake per-doc position streams of varying byte lengths
        blens = rng.integers(0, 9, n).astype(np.int64)
        payload = bytes(rng.integers(0, 255, int(blens.sum()), dtype=np.uint8))
        tb = int(rng.choice([64, 256, 4096]))
        blocks = cut_blocks_pre(doc_ids, tfs, payload, blens, target_bytes=tb)
        # reference: re-assemble each block independently
        bs = np.concatenate(([0], np.cumsum(blens)))
        cursor = 0
        for first, last, pl, bd, bt in blocks:
            end = cursor + len(bd)
            want = assemble_block(
                doc_ids[cursor:end], tfs[cursor:end],
                payload[bs[cursor]:bs[end]])
            assert pl == want, (trial, cursor)
            assert first == doc_ids[cursor] and last == doc_ids[end - 1]
            d, t, _ = decode_block(pl, False)
            assert (d == doc_ids[cursor:end]).all()
            assert (t == tfs[cursor:end]).all()
            cursor = end
        assert cursor == n
        # no-positions variant round-trips too
        blocks2 = cut_blocks_pre(doc_ids, tfs, None, None, target_bytes=tb)
        cursor = 0
        for first, last, pl, bd, bt in blocks2:
            end = cursor + len(bd)
            d, t, _ = decode_block(pl, False)
            assert (d == doc_ids[cursor:end]).all()
            assert (t == tfs[cursor:end]).all()
            cursor = end
        assert cursor == n


def test_decode_full_batch_equivalence():
    """decode_full_batch == per-block decode_block across block boundaries
    (positions deltas reset per doc, so concatenated streams decode
    identically)."""
    import numpy as np

    from indri_5_5_ray.codec import cut_blocks, decode_block, decode_full_batch

    rng = np.random.default_rng(5)
    n = 500
    doc_ids = np.cumsum(rng.integers(1, 9, n)).astype(np.int64)
    tfs = rng.integers(1, 6, n).astype(np.int64)
    positions = np.concatenate(
        [np.sort(rng.choice(1000, size=t, replace=False)) for t in tfs]
    ).astype(np.int64)
    blocks = cut_blocks(doc_ids, tfs, positions, target_bytes=256)
    payload = b"".join(b[2] for b in blocks)
    offsets, lengths, ndocs = [], [], []
    off = 0
    ref_d, ref_t, ref_p = [], [], []
    for first, last, buf, dsl, tsl in blocks:
        offsets.append(off)
        lengths.append(len(buf))
        ndocs.append(len(dsl))
        off += len(buf)
        d, t, p = decode_block(buf, True)
        ref_d.append(d)
        ref_t.append(t)
        ref_p.append(p)
    d, t, p = decode_full_batch(payload, offsets, lengths, ndocs)
    assert np.array_equal(d, np.concatenate(ref_d))
    assert np.array_equal(t, np.concatenate(ref_t))
    assert np.array_equal(p, np.concatenate(ref_p))
    assert np.array_equal(d, doc_ids) and np.array_equal(p, positions)
