"""Unit tests: k-mer packing, SIV, and the bucketed count table."""
import numpy as np
import jax.numpy as jnp

from fqsqueezer_tpu.ops import kmers, tables


def _np_pack(seq):
    v = 0
    for b in seq:
        v = (v << 2) | int(b)
    return v


def test_pack_windows_matches_naive():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(3, 40)).astype(np.int32)
    for k in (5, 13, 16, 17, 27):
        lo, hi = kmers.pack_windows(jnp.asarray(codes), k)
        lo, hi = np.asarray(lo), np.asarray(hi)
        for r in range(3):
            for i in range(k - 1, 40):
                want = _np_pack(codes[r, i - k + 1 : i + 1])
                got = (int(hi[r, i]) << 32) | int(lo[r, i])
                assert got == want, (k, r, i)


def test_pack_windows_rc_matches_naive():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=(2, 30)).astype(np.int32)
    for k in (4, 14, 21):
        lo, hi = kmers.pack_windows_rc(jnp.asarray(codes), k)
        lo, hi = np.asarray(lo), np.asarray(hi)
        for r in range(2):
            for i in range(k - 1, 30):
                win = codes[r, i - k + 1 : i + 1]
                rc = [3 - int(b) for b in win[::-1]]
                want = _np_pack(rc)
                got = (int(hi[r, i]) << 32) | int(lo[r, i])
                assert got == want, (k, r, i)


def test_siv_update_and_find():
    siv = tables.siv_create(5)  # contexts are 4-mers
    keys = jnp.asarray([0b0011_10_01, 0b0011_10_01, 0b0011_10_11, 17], jnp.int32)
    valid = jnp.asarray([True, True, True, False])
    siv = tables.siv_update(siv, keys, valid)
    ctx = jnp.asarray([0b0011_10, 17 >> 2], jnp.int32)
    counts = np.asarray(tables.siv_find(siv, ctx))
    np.testing.assert_array_equal(counts[0], [0, 2, 0, 1])  # base1 twice, base3 once
    np.testing.assert_array_equal(counts[1], [0, 0, 0, 0])  # invalid not applied


def test_siv_saturates_at_255():
    siv = tables.siv_create(3)
    keys = jnp.zeros((300,), jnp.int32)  # ctx 0, base 0, 300 times
    valid = jnp.ones((300,), bool)
    siv = tables.siv_update(siv, keys, valid)
    counts = np.asarray(tables.siv_find(siv, jnp.asarray([0], jnp.int32)))
    assert counts[0, 0] == 255


def test_count_table_insert_find_roundtrip():
    rng = np.random.default_rng(2)
    tc = tables.table_create(8)  # 256 buckets
    n = 500
    lo = rng.integers(0, 1 << 16, size=n).astype(np.uint32)
    hi = np.zeros(n, np.uint32)
    base = rng.integers(0, 4, size=n).astype(np.int32)
    valid = rng.random(n) < 0.9

    tc = tables.table_update(
        tc, jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(base), jnp.asarray(valid))

    # python-dict truth
    truth = {}
    for i in range(n):
        if valid[i]:
            truth.setdefault(int(lo[i]), [0, 0, 0, 0])[base[i]] += 1

    keys = np.array(sorted(truth), np.uint32)
    got, found = tables.table_find(tc, jnp.asarray(keys), jnp.zeros_like(jnp.asarray(keys)))
    got, found = np.asarray(got), np.asarray(found)
    n_found = found.sum()
    assert n_found >= 0.99 * len(keys)  # rare drops allowed (full buckets)
    for j, k in enumerate(keys):
        if found[j]:
            np.testing.assert_array_equal(got[j], truth[int(k)])


def test_count_table_absent_key():
    tc = tables.table_create(6)
    got, found = tables.table_find(
        tc, jnp.asarray([123456], jnp.uint32), jnp.asarray([7], jnp.uint32))
    assert not bool(found[0])
    np.testing.assert_array_equal(np.asarray(got)[0], [0, 0, 0, 0])


def test_count_table_update_is_deterministic_across_orderings():
    rng = np.random.default_rng(3)
    n = 200
    lo = rng.integers(0, 64, size=n).astype(np.uint32)  # heavy collisions
    hi = np.zeros(n, np.uint32)
    base = rng.integers(0, 4, size=n).astype(np.int32)
    valid = np.ones(n, bool)

    perm = rng.permutation(n)
    t1 = tables.table_create(4)
    t1 = tables.table_update(t1, jnp.asarray(lo), jnp.asarray(hi),
                             jnp.asarray(base), jnp.asarray(valid))
    t2 = tables.table_create(4)
    t2 = tables.table_update(t2, jnp.asarray(lo[perm]), jnp.asarray(hi[perm]),
                             jnp.asarray(base[perm]), jnp.asarray(valid))
    # same multiset of events -> identical counts for every key
    keys = np.unique(lo)
    g1, f1 = tables.table_find(t1, jnp.asarray(keys), jnp.zeros(len(keys), jnp.uint32))
    g2, f2 = tables.table_find(t2, jnp.asarray(keys), jnp.zeros(len(keys), jnp.uint32))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_siv_prune_clears_singletons_only():
    """conditionally_clear analog (bit_vec.h:168-202): counters == 1 go to
    zero, everything else survives untouched; fill stats track it."""
    rng = np.random.default_rng(7)
    c4 = rng.integers(0, 5, size=(64, 4)).astype(np.int32)
    siv = tables.pack_counts(jnp.asarray(c4))
    nz0, cap = tables.siv_fill(siv)
    assert int(nz0) == int((c4 > 0).sum()) and cap == 256
    pruned = tables.siv_prune(siv)
    got = np.asarray(tables.unpack_counts(pruned))
    want = np.where(c4 <= 1, 0, c4)
    np.testing.assert_array_equal(got, want)


def test_table_grow_preserves_contents_and_finds():
    """Regrow (reference coordinated restruct, ht_kmer.h:88-112 +
    application.cpp:894-902): after table_grow every stored (key -> counts)
    entry is still found at the bucket bucket_of derives from (hash, tag),
    and new updates land in the grown layout."""
    rng = np.random.default_rng(11)
    base_log2 = 4
    n = 400
    lo = rng.integers(0, 1 << 30, size=n).astype(np.uint32)
    hi = rng.integers(0, 1 << 20, size=n).astype(np.uint32)
    bse = rng.integers(0, 4, size=n).astype(np.int32)
    valid = np.ones(n, bool)
    tc = tables.table_create(base_log2)
    tc = tables.table_update(
        tc, jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(bse),
        jnp.asarray(valid))
    keys = np.unique(np.stack([lo, hi], 1), axis=0)
    klo, khi = jnp.asarray(keys[:, 0]), jnp.asarray(keys[:, 1])
    c0, f0 = tables.table_find(tc, klo, khi)
    used0, _ = tables.table_fill_stats(tc)

    for g in range(2):  # two consecutive doublings
        tc = tables.table_grow(tc, base_log2)
        c1, f1 = tables.table_find(tc, klo, khi, base_log2)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f0))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c0))
        used1, cap1 = tables.table_fill_stats(tc)
        assert int(used1) == int(used0)          # no cell lost or duplicated
        assert cap1 == (1 << (base_log2 + g + 1)) * tables.BUCKET

    # updates into the grown table hit the same cells table_find probes
    tc = tables.table_update(
        tc, klo, khi, jnp.zeros(len(keys), jnp.int32),
        jnp.ones(len(keys), bool), log2_base=base_log2)
    c2, f2 = tables.table_find(tc, klo, khi, base_log2)
    # growth frees capacity: previously-dropped keys may now insert, so the
    # found set only ever widens
    assert np.all(np.asarray(f2) | ~np.asarray(f0))
    found = np.asarray(f0)
    np.testing.assert_array_equal(
        np.asarray(c2)[found, 0], np.asarray(c0)[found, 0] + 1)
