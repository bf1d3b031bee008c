"""PE minimizer machinery unit tests (streams/pe.py, ops/tables.py pair_*)."""
import numpy as np
import jax.numpy as jnp

from fqsqueezer_tpu.ops import tables, kmers
from fqsqueezer_tpu.streams import pe


def _pack(window):
    lo = hi = 0
    v = 0
    for b in window:
        v = (v << 2) | int(b)
    return np.uint32(v & 0xFFFFFFFF), np.uint32(v >> 32)


def brute_segment_minimizers(codes, lengths, B, n_seg):
    R, L = codes.shape
    inv = (1 << (2 * B)) - 1
    out = np.full((R, n_seg), inv, np.int64)
    for r in range(R):
        n = int(lengths[r])
        mss = max(n - B + 1, 0)
        for k in range(n_seg):
            s0 = k * mss // n_seg
            s1 = mss if k == n_seg - 1 else (k + 1) * mss // n_seg
            best = inv
            for s in range(s0, s1):
                w = codes[r, s:s + B]
                if np.any(w >= 4):
                    continue
                v = 0
                for b in w:
                    v = (v << 2) | int(b)
                if (v >> (2 * B - 6)) < 2:   # AAA/AAC prefix
                    continue
                best = min(best, v)
            out[r, k] = best
    return out


def test_segment_minimizers_match_bruteforce():
    rng = np.random.default_rng(7)
    B = 20
    R, L = 12, 64
    codes = rng.integers(0, 4, (R, L)).astype(np.int32)
    codes[2, 30] = 4     # an N knocks out windows covering it
    lengths = rng.integers(B + 5, L + 1, R).astype(np.int32)
    lengths[3] = B - 2   # too short: sentinel everywhere
    kcodes = np.where(codes >= 4, 0, codes)
    got_lo, got_hi = pe.segment_minimizers(
        jnp.asarray(codes), jnp.asarray(kcodes), jnp.asarray(lengths), B, 4)
    want = brute_segment_minimizers(codes, lengths, B, 4)
    got = np.asarray(got_lo).astype(np.int64) | (
        np.asarray(got_hi).astype(np.int64) << 32)
    np.testing.assert_array_equal(got, want)


def test_pair_table_insert_find():
    pt = tables.pair_create(6)
    klo = jnp.asarray(np.array([11, 11, 11, 22, 22], np.uint32))
    khi = jnp.zeros(5, jnp.uint32)
    vlo = jnp.asarray(np.array([100, 100, 101, 200, 201], np.uint32))
    vhi = jnp.zeros(5, jnp.uint32)
    w = jnp.asarray(np.array([2, 3, 4, 1, 5], np.uint32))
    pt = tables.pair_update(pt, klo, khi, vlo, vhi, w,
                            jnp.ones(5, bool))
    r_lo, r_hi, r_cnt = tables.pair_find(
        pt, jnp.asarray(np.array([11, 22, 33], np.uint32)),
        jnp.zeros(3, jnp.uint32))
    r_lo, r_cnt = np.asarray(r_lo), np.asarray(r_cnt)
    got_11 = {int(r_lo[0, s]): int(r_cnt[0, s])
              for s in range(tables.BUCKET) if r_cnt[0, s] > 0}
    assert got_11 == {100: 5, 101: 4}    # duplicate (11,100) weights merged
    got_22 = {int(r_lo[1, s]): int(r_cnt[1, s])
              for s in range(tables.BUCKET) if r_cnt[1, s] > 0}
    assert got_22 == {200: 1, 201: 5}
    assert np.all(r_cnt[2] == 0)          # absent key


def test_pair_table_two_batches_accumulate():
    pt = tables.pair_create(6)
    one = jnp.ones(1, bool)
    k = jnp.asarray(np.array([7], np.uint32))
    z = jnp.zeros(1, jnp.uint32)
    v = jnp.asarray(np.array([42], np.uint32))
    pt = tables.pair_update(pt, k, z, v, z, jnp.asarray([3], jnp.uint32), one)
    pt = tables.pair_update(pt, k, z, v, z, jnp.asarray([4], jnp.uint32), one)
    _, _, cnt = tables.pair_find(pt, k, z)
    assert int(np.asarray(cnt).sum()) == 7


def test_find_candidates_orders_by_count():
    pt = tables.pair_create(6)
    k = jnp.asarray(np.full(3, 9, np.uint32))
    z3 = jnp.zeros(3, jnp.uint32)
    v = jnp.asarray(np.array([300, 100, 200], np.uint32))
    w = jnp.asarray(np.array([1, 9, 9], np.uint32))
    pt = tables.pair_update(pt, k, z3, v, z3, w, jnp.ones(3, bool))
    q_lo = jnp.asarray(np.array([[9, 9, 9, 9]], np.uint32))  # 4 identical
    q_hi = jnp.zeros((1, 4), jnp.uint32)
    c_lo, c_hi, c_cnt = pe.find_candidates(pt, q_lo, q_hi, 20)
    c_lo, c_cnt = np.asarray(c_lo)[0], np.asarray(c_cnt)[0]
    live = [(int(c_lo[i]), int(c_cnt[i])) for i in range(len(c_cnt))
            if c_cnt[i] > 0]
    # count desc (4 queries x weight merge), value asc on ties
    assert live == [(100, 36), (200, 36), (300, 4)]


def test_match_and_anchor_base_roundtrip():
    rng = np.random.default_rng(3)
    B = 20
    L = 60
    read2 = rng.integers(0, 4, (1, L)).astype(np.int32)
    lengths = np.array([L], np.int32)
    a = 17
    window = read2[0, a:a + B]
    lo, hi = _pack(window)
    c_lo = jnp.asarray(np.array([[lo]], np.uint32))
    c_hi = jnp.asarray(np.array([[hi]], np.uint32))
    c_cnt = jnp.asarray(np.array([[5]], np.int32))
    mid, pos, a_lo, a_hi = pe.match_in_read2(
        c_lo, c_hi, c_cnt, jnp.asarray(read2), jnp.asarray(read2),
        jnp.asarray(lengths), B)
    assert int(mid[0]) == 0
    first = min(s for s in range(L - B + 1)
                if np.array_equal(read2[0, s:s + B], window))
    assert int(pos[0]) == first
    for j in range(B):
        got = pe.anchor_base(a_lo, a_hi, jnp.asarray([j], jnp.int32), B)
        assert int(got[0]) == int(read2[0, first + j])


def test_pair_events_cross_insert():
    rng = np.random.default_rng(5)
    B = 20
    R, L = 4, 60  # 2 pairs
    codes = rng.integers(0, 4, (R, L)).astype(np.int32)
    lengths = np.full(R, L, np.int32)
    kcodes = codes.copy()
    klo, khi, vlo, vhi, w, valid = pe.pair_events(
        jnp.asarray(codes), jnp.asarray(kcodes), jnp.asarray(lengths), B)
    assert klo.shape[0] == 12 * 2   # 12 events per pair
    assert bool(jnp.all(valid))     # no Ns, long reads -> all valid
    # keys of read1->read2 events must be read1 segment minimizers
    m = brute_segment_minimizers(codes, lengths, B, 3)
    klo_n = np.asarray(klo)
    r1_keys = {int(m[0, a]) & 0xFFFFFFFF for a, _, _ in pe._INS}
    assert int(klo_n[0]) in r1_keys
