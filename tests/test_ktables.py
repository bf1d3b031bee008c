"""Canonical k-mer tables (ops/tables.py ktable_* / klocal_*) unit tests.

The design claim under test: ONE insert event per k-mer occurrence serves
queries from BOTH strands (the reference's kernel canonicalization,
/root/reference/fqs/kmer.h:199-207), with a 4-way next-base find that stays
one row gather and exact counts (up to u8 saturation)."""
import numpy as np
import jax.numpy as jnp

from fqsqueezer_tpu.ops import kmers, tables
from fqsqueezer_tpu.streams import dna


def _pack_ctx(cfg_k, seq, i):
    """(c_lo, c_hi, r_lo, r_hi) of the context [i-k+1, i-1] of width k-1."""
    kc = jnp.asarray(seq[None, :], jnp.int32)
    c_lo, c_hi = kmers.pack_windows(kc, cfg_k - 1)
    c_lo = kmers.shift_right(c_lo, 1)[0, i]
    c_hi = kmers.shift_right(c_hi, 1)[0, i]
    r_lo, r_hi = kmers.pack_windows_rc(kc, cfg_k - 1)
    r_lo = kmers.shift_right(r_lo, 1)[0, i]
    r_hi = kmers.shift_right(r_hi, 1)[0, i]
    return (jnp.asarray([c_lo], jnp.uint32), jnp.asarray([c_hi], jnp.uint32),
            jnp.asarray([r_lo], jnp.uint32), jnp.asarray([r_hi], jnp.uint32))


def test_ktable_both_strand_query():
    """Insert k-mers from a forward read; query with the reverse-complement
    read's contexts — counts must match (cross-strand sharing)."""
    rng = np.random.default_rng(0)
    k = 18
    L = 60
    seq = rng.integers(0, 4, size=L).astype(np.int32)
    rcseq = (3 - seq)[::-1].copy()
    log2b = 10
    tc = tables.ktable_create(log2b)

    # insert all k-mers of the forward read (positions k-1..L-1)
    kc = jnp.asarray(seq[None, :], jnp.int32)
    c_lo, c_hi = kmers.pack_windows(kc, k - 1)
    c_lo = kmers.shift_right(c_lo, 1)[:, k - 1:]
    c_hi = kmers.shift_right(c_hi, 1)[:, k - 1:]
    r_lo, r_hi = kmers.pack_windows_rc(kc, k - 1)
    r_lo = kmers.shift_right(r_lo, 1)[:, k - 1:]
    r_hi = kmers.shift_right(r_hi, 1)[:, k - 1:]
    base = kc[:, k - 1:]
    bkt, tag = dna._canon_insert(c_lo, c_hi, r_lo, r_hi, base, k, log2b)
    valid = jnp.ones(bkt.reshape(-1).shape, bool)
    tc = tables.ktable_update(tc, bkt.reshape(-1), tag.reshape(-1), valid)

    # forward queries see their own k-mers
    hits = 0
    for i in range(k - 1, L):
        q = dna._canon_query(*_pack_ctx(k, jnp.asarray(seq), i), k, log2b)
        counts, found = tables.ktable_find(tc, q[0], q[1])
        assert bool(found[0])
        assert int(counts[0, seq[i]]) >= 1
        hits += 1
    assert hits == L - k + 1

    # reverse-complement-read queries see the SAME statistics: position j of
    # rcseq predicts rcseq[j] whose k-mer is the rc of a forward k-mer
    shared = 0
    for j in range(k - 1, L):
        q = dna._canon_query(*_pack_ctx(k, jnp.asarray(rcseq), j), k, log2b)
        counts, found = tables.ktable_find(tc, q[0], q[1])
        if bool(found[0]) and int(counts[0, rcseq[j]]) >= 1:
            shared += 1
    # all rc k-mers must be found except (vanishingly rare) palindromic
    # middles; on this fixed seed all are shared
    assert shared == L - k + 1


def test_ktable_counts_exact_and_order_independent():
    rng = np.random.default_rng(1)
    k = 18
    n = 500
    seqs = rng.integers(0, 4, size=(n, k)).astype(np.int32)
    # duplicate a subset with known multiplicity
    seqs[100:200] = seqs[0:100]
    seqs[200:250] = seqs[0:50]
    log2b = 10   # 4-cell buckets (tables.KBUCKET): one extra bucket bit
    #              keeps cell capacity at the old 8-cell/2^9 level
    kc = jnp.asarray(seqs, jnp.int32)
    c_lo, c_hi = kmers.pack_windows(kc, k - 1)
    c_lo = kmers.shift_right(c_lo, 1)[:, k - 1]
    c_hi = kmers.shift_right(c_hi, 1)[:, k - 1]
    r_lo, r_hi = kmers.pack_windows_rc(kc, k - 1)
    r_lo = kmers.shift_right(r_lo, 1)[:, k - 1]
    r_hi = kmers.shift_right(r_hi, 1)[:, k - 1]
    base = kc[:, k - 1]
    bkt, tag = dna._canon_insert(c_lo, c_hi, r_lo, r_hi, base, k, log2b)
    valid = jnp.ones((n,), bool)

    tc1 = tables.ktable_update(tables.ktable_create(log2b), bkt, tag, valid)
    perm = rng.permutation(n)
    tc2 = tables.ktable_update(tables.ktable_create(log2b),
                               bkt[perm], tag[perm], valid)
    assert np.array_equal(np.asarray(tc1), np.asarray(tc2))

    # exact multiplicities for the tripled subset
    q = dna._canon_query(c_lo[:50][None], c_hi[:50][None], r_lo[:50][None],
                         r_hi[:50][None], k, log2b)
    counts, found = tables.ktable_find(tc1, q[0], q[1])
    got = np.take_along_axis(np.asarray(counts[0]),
                             np.asarray(base[:50])[:, None], axis=1)[:, 0]
    # a key whose claim lost to ANOTHER new key targeting the same slot in
    # the same batch is dropped for this batch (the documented single-round
    # fused-claim property; it re-inserts on a later occurrence) — rare,
    # deterministic, and replayed identically by the decoder
    f = np.asarray(found[0])
    # 4-slot buckets raise same-batch claim contention vs the old 8-slot
    # rows; drops self-heal on later occurrences (measured +0.01% archive
    # bytes on the 100k bench corpus — see BASELINE.md round-4 notes)
    assert np.mean(f) >= 0.9
    # >= 3 among found; == 3 except where a losing key polluted the winner's
    # counters (the documented optimistic-claim property)
    assert np.all(got[f] >= 3)
    assert np.mean(got[f] == 3) >= 0.9


def test_ktable_grow_preserves_finds():
    rng = np.random.default_rng(2)
    k = 18
    n = 300
    seqs = rng.integers(0, 4, size=(n, k)).astype(np.int32)
    log2b = 8
    kc = jnp.asarray(seqs, jnp.int32)
    c_lo, c_hi = kmers.pack_windows(kc, k - 1)
    c_lo = kmers.shift_right(c_lo, 1)[:, k - 1]
    c_hi = kmers.shift_right(c_hi, 1)[:, k - 1]
    r_lo, r_hi = kmers.pack_windows_rc(kc, k - 1)
    r_lo = kmers.shift_right(r_lo, 1)[:, k - 1]
    r_hi = kmers.shift_right(r_hi, 1)[:, k - 1]
    base = kc[:, k - 1]
    bkt, tag = dna._canon_insert(c_lo, c_hi, r_lo, r_hi, base, k, log2b)
    tc = tables.ktable_update(tables.ktable_create(log2b), bkt, tag,
                              jnp.ones((n,), bool))
    q = dna._canon_query(c_lo[None], c_hi[None], r_lo[None], r_hi[None],
                         k, log2b)
    c_before, f_before = tables.ktable_find(tc, q[0], q[1], log2b)
    tc2 = tables.ktable_grow(tc, log2b)
    c_after, f_after = tables.ktable_find(tc2, q[0], q[1], log2b)
    assert np.array_equal(np.asarray(c_before), np.asarray(c_after))
    assert np.array_equal(np.asarray(f_before), np.asarray(f_after))
    # and new inserts into the grown table are found too
    tc3 = tables.ktable_update(tc2, bkt, tag, jnp.ones((n,), bool),
                               log2_base=log2b)
    c3, _ = tables.ktable_find(tc3, q[0], q[1], log2b)
    assert np.all(np.asarray(c3) >= np.asarray(c_after))


def test_klocal_both_strands():
    rng = np.random.default_rng(3)
    k = 18
    L = 50
    seq = rng.integers(0, 4, size=L).astype(np.int32)
    rcseq = (3 - seq)[::-1].copy()
    m = 12
    tc = tables.klocal_create(m)

    kc = jnp.asarray(seq[None, :], jnp.int32)
    lo, hi = kmers.pack_windows(kc, k - 1)
    lo = kmers.shift_right(lo, 1)[:, k - 1:]
    hi = kmers.shift_right(hi, 1)[:, k - 1:]
    rlo, rhi = kmers.pack_windows_rc(kc, k - 1)
    rlo = kmers.shift_right(rlo, 1)[:, k - 1:]
    rhi = kmers.shift_right(rhi, 1)[:, k - 1:]
    s, m_lo, m_hi = kmers.canon_strand(lo, hi, rlo, rhi, k)
    cell, tag = tables.local_keys(m_lo, m_hi, m)
    c0 = kmers.top_base(lo, hi, k - 1)
    base = kc[:, k - 1:]
    slot = jnp.where(s, 4 * (3 - base) + (3 - c0), 4 * c0 + base)
    tc = tables.klocal_insert(tc, cell.reshape(-1), tag.reshape(-1),
                              slot.reshape(-1),
                              jnp.ones(cell.size, bool))

    # query from the rc read
    kc2 = jnp.asarray(rcseq[None, :], jnp.int32)
    lo2, hi2 = kmers.pack_windows(kc2, k - 1)
    lo2 = kmers.shift_right(lo2, 1)
    hi2 = kmers.shift_right(hi2, 1)
    rlo2, rhi2 = kmers.pack_windows_rc(kc2, k - 1)
    rlo2 = kmers.shift_right(rlo2, 1)
    rhi2 = kmers.shift_right(rhi2, 1)
    s2, ml2, mh2 = kmers.canon_strand(lo2, hi2, rlo2, rhi2, k)
    cell2, tag2 = tables.local_keys(ml2, mh2, m)
    slots2 = dna._klocal_slots(s2, kmers.top_base(lo2, hi2, k - 1))
    valid2 = jnp.arange(L)[None, :] >= k - 1
    counts = tables.klocal_query(tc, cell2, tag2, slots2, valid2)
    got = np.take_along_axis(np.asarray(counts[0]),
                             rcseq[:, None], axis=1)[:, 0]
    assert np.all(got[k - 1:] >= 1)
