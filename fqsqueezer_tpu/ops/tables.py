"""k-mer counter stores as dense integer arrays.

TPU-native equivalents of the reference's perf-critical native structures:
  * SIV — dense per-p-mer next-base counters (reference TSmallIntVector<2>,
    /root/reference/fqs/bit_vec.h). Ours: uint32[4^(p-1)] words, each packing
    4 saturating uint8 counters (one per next base) -> the 4-way count query is
    ONE gather (the reference reads 4 adjacent 2-bit fields, bit_vec.h:83-96).
  * CountTable — bucketed open-addressing hash table for s-mers/b-mers
    (reference CHT_kmer, ht_kmer.h). A bucket is a row of BUCKET (tag, counts)
    cells; find = 1 row gather + vector compare (reference's probe chain
    returning all-4-last-letter counts at once, ht_kmer.h:205-263). Inserts are
    batched, pre-aggregated, and resolved with deterministic scatter-min claim
    rounds — the TPU analog of the barrier-bracketed deferred owner-shard
    inserts (application.h:56-59, dna.cpp:2393-2472).

All updates are order-independent (aggregate-then-single-scatter + saturation
applied once per batch), so encoder and decoder converge to identical tables
without any locking or RNG (replacing CCounterIncrementer, utils.h:256-335).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import kmers

BUCKET = 8  # cells per bucket row
EMPTY = jnp.uint32(0)
_BYTE = jnp.uint32(0xFF)


def unpack_counts(word: jax.Array) -> jax.Array:
    """uint32 word -> [..., 4] int32 counts."""
    return jnp.stack(
        [((word >> (8 * b)) & _BYTE).astype(jnp.int32) for b in range(4)], axis=-1
    )


def pack_counts(c4: jax.Array) -> jax.Array:
    """[..., 4] int32 (clamped to 255) -> uint32 word."""
    c4 = jnp.clip(c4, 0, 255).astype(jnp.uint32)
    return c4[..., 0] | (c4[..., 1] << 8) | (c4[..., 2] << 16) | (c4[..., 3] << 24)


_M7 = jnp.uint32(0x7F7F7F7F)
_H8 = jnp.uint32(0x80808080)


def _ctz(x: jax.Array) -> jax.Array:
    """Count trailing zeros of a small positive int32 (x > 0, x < 2^23) via
    the f32 exponent of the lowest set bit — avoids integer division and
    per-slot scan passes (both measured slow on the VPU)."""
    lsb = (x & -x).astype(jnp.float32)
    return (jax.lax.bitcast_convert_type(lsb, jnp.int32) >> 23) - 127


def swar_sat_add_u8(a: jax.Array, b: jax.Array) -> jax.Array:
    """Per-byte saturating add of u8x4-packed uint32 words (SWAR): the packed
    analog of `clip(unpack(a) + unpack(b), 0, 255)` without materializing 4x
    int32 planes. Deterministic, so encoder and decoder stay in lockstep."""
    lo7 = (a & _M7) + (b & _M7)
    s = lo7 ^ ((a ^ b) & _H8)
    ov = ((a & b) | ((a | b) & ~s)) & _H8       # carry out of each byte
    return s | ((ov >> 7) * jnp.uint32(0xFF))   # saturate overflowed bytes


def _scatter_delta_u8(n_words: int, idx, base, valid):
    """Accumulate per-(word, base) increments with ONE scatter into a
    double-length plane of u16x2-packed uint32 words (word i = bases 0|1,
    word n_words+i = bases 2|3), then collapse to a saturated u8x4 delta
    word. Scatter cost on TPU is latency-per-event (~12 ns measured),
    independent of the target array size — so one scatter into 2n words
    replaces the round-1 TWO scatters into n-word planes at half the cost,
    while keeping 65535 per-(cell, base) headroom (homopolymer contexts
    exceed 255 events per batch; saturation must happen at collapse, not by
    byte wraparound). The two halves are CONTIGUOUS (not interleaved word
    pairs): an interleaved [n_words, 2] view forces a tiled (8,128) layout
    whose minor dim pads 2 -> 128 — a 64x materialization (32 GiB at
    siv_len 14); contiguous halves collapse with plain 1D slices."""
    b = base.astype(jnp.uint32) & 3
    idx2 = idx + (b >> 1).astype(jnp.int32) * n_words
    inc = jnp.uint32(1) << ((b & 1) << 4)
    idx2 = jnp.where(valid, idx2, 2 * n_words)
    d = jnp.zeros((2 * n_words,), jnp.uint32).at[idx2].add(inc, mode="drop")
    c01 = d[:n_words]
    c23 = d[n_words:]
    c0 = jnp.minimum(c01 & 0xFFFF, 255)
    c1 = jnp.minimum(c01 >> 16, 255)
    c2 = jnp.minimum(c23 & 0xFFFF, 255)
    c3 = jnp.minimum(c23 >> 16, 255)
    return c0 | (c1 << 8) | (c2 << 16) | (c3 << 24)


# ---------------------------------------------------------------------------
# SIV: dense p-mer counters
# ---------------------------------------------------------------------------

def siv_create(siv_len: int) -> jax.Array:
    """Word i packs the 4 saturating u8 next-base counters of (p-1)-mer
    context i — packed storage keeps FIND traffic (the hot path: 4 window
    passes per batch) at 4 bytes/row; updates go through a transient int32
    delta plane (scatter-adds commute => order-independent)."""
    return jnp.zeros((4 ** (siv_len - 1),), dtype=jnp.uint32)


def siv_find(siv: jax.Array, ctx: jax.Array) -> jax.Array:
    """ctx: [...] int32 (p-1)-mer values. Returns [..., 4] int32 counts."""
    return unpack_counts(siv[ctx])


def siv_fill(siv: jax.Array):
    """(nonzero counters, capacity) of the packed SIV — the reference's
    filling-factor statistic (bit_vec.h:204-230)."""
    nz = jnp.sum((unpack_counts(siv) > 0).astype(jnp.int32))
    return nz, 4 * siv.shape[0]


def siv_prune(siv: jax.Array) -> jax.Array:
    """Clear singleton counters (count == 1) — the analog of the reference's
    conditionally_clear (bit_vec.h:168-202), which frees the p-mer store of
    sequencing-error noise once it gets dense on WGS-scale inputs. Run at
    group boundaries on identical state by encoder and decoder, so both
    sides' cascades keep matching exactly."""
    c4 = unpack_counts(siv)
    return pack_counts(jnp.where(c4 <= 1, 0, c4))


def siv_update(siv: jax.Array, keys: jax.Array, valid: jax.Array) -> jax.Array:
    """Batch-increment cells. keys: [n] int32 packed (ctx<<2|base). The batch
    delta is accumulated u8x4-packed with one scatter and folded in with one
    SWAR saturating sweep, so counts saturate at 255."""
    delta = _scatter_delta_u8(siv.shape[0], keys >> 2, keys, valid)
    return swar_sat_add_u8(siv, delta)


# ---------------------------------------------------------------------------
# CountTable: bucketed hash table of (tag, counts) cells
# ---------------------------------------------------------------------------

def table_create(log2_buckets: int):
    """One interleaved row per bucket: columns [0, BUCKET) are cell tags,
    [BUCKET, 2*BUCKET) the cells' packed u32 counts (4×u8 per cell).

    The TPU scatter/gather engine charges per ROW fetched (latency-bound,
    ~independent of row width at these sizes — measured, see BASELINE.md),
    so a find that needs (tags, counts) of a bucket costs ONE gather here
    vs two in the split layout — and finds are the hot path (repair passes
    + modeling + the decode scan, 2 tables each)."""
    return jnp.zeros((1 << log2_buckets, 2 * BUCKET), dtype=jnp.uint32)


def bucket_of(lo, hi, log2_buckets: int, log2_base: int):
    """Bucket index of a key in a table grown from 2^log2_base to
    2^log2_buckets buckets. Up to the creation size the bucket comes from
    the bucket hash; growth bits come from TAG bits [23..27), so a stored
    cell's new bucket after a regrow is derivable from (bucket, tag) alone —
    cells keep only 32-bit tags, not keys (the analog of the reference's
    restruct, ht_kmer.h:88-112, which rehashes full keys)."""
    b = kmers.hash_bucket(lo, hi, min(log2_buckets, log2_base))
    grow = log2_buckets - log2_base
    if grow > 0:
        t = kmers.hash_tag(lo, hi)
        ext = ((t >> 23) & jnp.uint32((1 << grow) - 1)).astype(jnp.int32)
        b = b | (ext << log2_base)
    return b


def table_grow(tc: jax.Array, log2_base: int):
    """Double the bucket count at a group boundary (the reference's
    coordinated restruct behind barriers, application.cpp:894-902): every
    cell moves to bucket (old | growth_bit << old_log2), keeping its slot —
    its tag and count columns move together. Deterministic — the decoder
    replays the same rule on the same state."""
    n_buckets = tc.shape[0]
    W = 2 * BUCKET
    log2b = n_buckets.bit_length() - 1
    tags = tc[:, :BUCKET]
    grow_bit = ((tags >> (23 + log2b - log2_base)) & 1).astype(jnp.int32)
    new_bkt = jnp.arange(n_buckets, dtype=jnp.int32)[:, None] \
        + grow_bit * n_buckets                              # [B, S]
    slot = jnp.broadcast_to(jnp.arange(BUCKET, dtype=jnp.int32)[None, :],
                            tags.shape)
    flat_t = jnp.where(tags != EMPTY, new_bkt * W + slot, 2 * n_buckets * W)
    flat_c = jnp.where(tags != EMPTY, new_bkt * W + BUCKET + slot,
                       2 * n_buckets * W)
    new = jnp.zeros((2 * n_buckets * W,), jnp.uint32)
    new = new.at[flat_t.reshape(-1)].set(tags.reshape(-1), mode="drop")
    new = new.at[flat_c.reshape(-1)].set(tc[:, BUCKET:].reshape(-1),
                                         mode="drop")
    return new.reshape(2 * n_buckets, W)


def table_find(tc: jax.Array, lo: jax.Array, hi: jax.Array,
               log2_base: int = -1):
    """Query contexts. lo/hi: [...] uint32 key pair. log2_base: creation
    size for grown tables (-1 = never grown).
    Returns ([..., 4] int32 counts, [...] bool found) — ONE row gather."""
    log2_buckets = tc.shape[0].bit_length() - 1
    if log2_base < 0:
        log2_base = log2_buckets
    bkt = bucket_of(lo, hi, log2_buckets, log2_base)
    tag = kmers.hash_tag(lo, hi)
    row = tc[bkt]                             # [..., 2*BUCKET]
    match = row[..., :BUCKET] == tag[..., None]
    found = jnp.any(match, axis=-1)
    word = jnp.sum(jnp.where(match, row[..., BUCKET:], EMPTY),
                   axis=-1).astype(jnp.uint32)
    return unpack_counts(word), found


def table_update(tc: jax.Array, lo: jax.Array, hi: jax.Array,
                 base: jax.Array, valid: jax.Array, bkt=None, tag=None,
                 log2_base: int = -1, rounds: int = 2):
    """Batch-insert/increment (context -> next base) events.

    lo/hi/base/valid: [n]. Aggregates per key, then resolves bucket cells with
    BUCKET deterministic claim rounds; keys that find no empty cell in their
    bucket are dropped (the reference instead grows the table at barriers,
    ht_kmer.h:88-112 — we presize from -gs like params.h:131-155).

    Sort-free design: existing keys scatter-add their one-hot increments
    directly (duplicate targets are fine — integer adds commute, so the
    result is order-independent); new keys run ONE claim round (scatter-min
    of entry index per bucket), the winner writes its tag into the bucket's
    first empty cell, then every occurrence re-probes and scatter-adds. New
    keys that lose the claim (another new key in the same bucket this batch,
    or a full bucket) are dropped and insert on a later recurrence — the
    reference similarly drops when a bucket fills (ht_kmer.h:420-438).

    bkt/tag may be passed precomputed (the tp-sharded path supplies local
    bucket indices after ownership masking, parallel/sharded.py).

    rounds == 0 selects the FUSED protocol (the round-3 default): ONE row
    gather serves both the existing-key probe and the claim decision, then
    one scatter-max claims tags and one scatter accumulates count deltas —
    3 engine passes total (each ~5-9 ms per 820k events on the chip; the
    legacy path below costs 6+ passes plus per-round VPU sweeps, measured
    104 ms vs ~25 ms per table per batch). Claiming events scatter their
    count delta OPTIMISTICALLY into the slot they claimed: winners count
    their same-batch occurrences exactly like the legacy re-probe did
    (preserving the found => count>=1 invariant the cascade relies on —
    dropping same-batch counts instead was measured at +38% DNA bytes);
    an event that LOST its claim to a different key deterministically
    pollutes the winner's counters — rare (same-batch new-key slot
    contention), bounded by u8 saturation, and replayed identically by
    the decoder, like local_insert's lite mode.

    rounds >= 1 is the legacy claim-round protocol (kept for older archive
    headers): a new key picks its claim slot by rotating the bucket's
    empty-slot BITMASK by a hash of its tag and taking the first set bit
    (count-trailing-zeros via the f32 exponent), then a scatter-max of the
    tag resolves same-batch contention deterministically; same-slot losers
    see an updated bitmask next round. Keys still unplaced retry on a later
    recurrence, like the reference's dropped inserts (ht_kmer.h:420-438).
    """
    n = lo.shape[0]
    n_buckets = tc.shape[0]
    W = 2 * BUCKET
    if bkt is None:
        log2_buckets = n_buckets.bit_length() - 1
        bkt = bucket_of(lo, hi, log2_buckets,
                        log2_buckets if log2_base < 0 else log2_base)
    if tag is None:
        tag = kmers.hash_tag(lo, hi)
    # invalid events still pay full engine cost (masking is not free), and
    # their gathers must not all hit one row: a shared dummy bucket makes a
    # conflict pile the gather engine serializes on. Spread them instead —
    # they are masked out of every scatter, so the rows they touch are
    # read-only noise.
    spread = jnp.arange(lo.shape[0], dtype=jnp.int32) & (n_buckets - 1)
    bkt = jnp.where(valid, bkt, spread)

    weights = (jnp.int32(1) << jnp.arange(BUCKET, dtype=jnp.int32))[None, :]

    if rounds == 0:
        # 2-D scatters + 2-D delta plane throughout (flat-reshape scatters
        # on a 2-D tiled table relayout-copy the table each way — a ~10 ms
        # fixed cost per call; see ktable_update)
        row = tc[bkt]                               # [n, 2*BUCKET]
        tags_r = row[:, :BUCKET]
        match = tags_r == tag[:, None]
        found = jnp.any(match, axis=1) & valid
        cell = jnp.argmax(match, axis=1)
        bm = jnp.sum(jnp.where(tags_r == EMPTY, weights, 0), axis=1)
        want = valid & ~found & (bm > 0)
        j = (tag >> 13).astype(jnp.int32) & (BUCKET - 1)
        rot = ((bm >> j) | (bm << (BUCKET - j))) & ((1 << BUCKET) - 1)
        slot = (j + _ctz(rot)) & (BUCKET - 1)
        tc = tc.at[jnp.where(want, bkt, n_buckets), slot].max(
            tag, mode="drop")
        dcell = jnp.where(found, cell, slot)
        ok = found | want
        # one u32 accumulator per (cell, base) — full headroom, saturation
        # applied once at collapse (homopolymer contexts exceed 255 events
        # per batch; wraparound would corrupt the neighbor byte)
        dplane = jnp.zeros((n_buckets, 4 * BUCKET), jnp.uint32).at[
            jnp.where(ok, bkt, n_buckets),
            4 * dcell + (base.astype(jnp.int32) & 3)].add(1, mode="drop")
        d = jnp.minimum(dplane, 255)
        cols = [d[:, 4 * c] | (d[:, 4 * c + 1] << 8)
                | (d[:, 4 * c + 2] << 16) | (d[:, 4 * c + 3] << 24)
                for c in range(BUCKET)]
        new_cnt = swar_sat_add_u8(tc[:, BUCKET:], jnp.stack(cols, axis=1))
        return jnp.concatenate([tc[:, :BUCKET], new_cnt], axis=1)

    def claim_round(r, tc):
        row_t = tc[bkt][:, :BUCKET]                 # [n, BUCKET]
        found = jnp.any(row_t == tag[:, None], axis=1) & valid
        bm = jnp.sum(jnp.where(row_t == EMPTY, weights, 0), axis=1)  # u8 mask
        want = valid & ~found & (bm > 0)
        # per-round rotation from different tag bits: same-slot losers
        # decorrelate instead of chasing the same next-empty cell
        j = (tag >> (13 + 3 * r)).astype(jnp.int32) & (BUCKET - 1)
        rot = ((bm >> j) | (bm << (BUCKET - j))) & ((1 << BUCKET) - 1)
        slot = (j + _ctz(rot)) & (BUCKET - 1)
        flat_claim = jnp.where(want, bkt * W + slot, n_buckets * W)
        return tc.reshape(-1).at[flat_claim].max(tag, mode="drop").reshape(
            n_buckets, W)

    tc = jax.lax.fori_loop(0, rounds, claim_round, tc)

    # re-probe (winners and their duplicates now match); u8-packed delta +
    # one SWAR saturating sweep (see siv_update). The delta plane covers the
    # count cells only and is interleaved to row shape afterwards (adding 0
    # to the tag columns is an exact SWAR no-op).
    row_t2 = tc[bkt][:, :BUCKET]
    match2 = row_t2 == tag[:, None]
    found2 = jnp.any(match2, axis=1) & valid
    cell2 = jnp.argmax(match2, axis=1)
    flat = bkt * BUCKET + cell2
    delta = _scatter_delta_u8(n_buckets * BUCKET, flat, base, found2)
    delta16 = jnp.concatenate(
        [jnp.zeros((n_buckets, BUCKET), jnp.uint32),
         delta.reshape(n_buckets, BUCKET)], axis=1)
    return swar_sat_add_u8(tc, delta16)


# ---------------------------------------------------------------------------
# KTable: canonical-k-mer cells (one cell per canonical k-mer)
# ---------------------------------------------------------------------------
# The strand-canonical redesign of CountTable (round 3): instead of
# context-keyed cells holding 4 next-base counts fed by BOTH strand events,
# cells hold ONE saturating u8 counter per canonical full k-mer — the TPU
# analog of the reference's kernel-canonicalized CHT_kmer cells
# (/root/reference/fqs/kmer.h:199-207, ht_kmer.h:205-263): one insert event
# per k-mer occurrence covers both strands, HALVING the scatter-engine event
# count of the table-update passes (the largest block of the encode profile).
#
# Geometry that keeps the 4-way next-base query at ONE row gather:
#   * bucket  = hash(canonical middle K[1:k-1]) — identical for all 4
#     next-base candidates of a query AND for the mirror query from the other
#     strand (kmers.canon_strand);
#   * cell tag = kmers.ktag(canonical K, middle) — unique per k-mer, with the
#     table-growth bits [23, 27) derived from the MIDDLE hash so the 4
#     candidates stay co-bucketed after every regrow;
#   * row = [BUCKET tags | BUCKET u16 slot counters packed 2-per-u32].
# A find gathers one row and matches the 8 stored tags against the 4
# candidate tags; counts land per candidate. Palindromic-middle k-mers
# (probability 4^-(k-2)/2) lose only the cross-strand half of their
# statistics — both sides compute the same rule, so round-trips stay exact.
#
# u16 slot counters (round 3, second design): counters only ever INCREASE,
# so clipping to 255 at FIND time is observably identical to the previous
# u8 saturating-add fold — while letting updates scatter-add increments
# DIRECTLY into the row words (3 engine passes over the events: row gather,
# claim scatter-max, count scatter-add) instead of accumulating a
# full-table [n_buckets, BUCKET] delta plane + two whole-table SWAR sweeps
# per call (a ~12-15 ms FIXED cost; the row-global protocol pays 8 update
# calls per batch, making that plane the single largest block of both the
# encode scan and the decode scan). A u16 wrap needs 65536 occurrences of
# one k-mer — and would be deterministic and replayed identically anyway.

KBUCKET = 4                 # cells per canonical-table bucket row: a row is
#                             [KBUCKET tags | KBUCKET u16 slot counters packed
#                             2-per-u32]. 4 cells (24 B rows) instead of the
#                             legacy 8 (48 B): the decode scan is gather-byte /
#                             width bound (lane-scaling probe, round 4), and
#                             the two k-mer table rows are its fattest reads.
#                             Capacity is kept by one extra bucket bit
#                             (params.adjust_kmer_sizes) — same cell count,
#                             half the bytes per find.
KW = KBUCKET + KBUCKET // 2  # row width in u32 words


def ktable_create(log2_buckets: int):
    return jnp.zeros((1 << log2_buckets, KW), dtype=jnp.uint32)


def kbucket_of(tag: jax.Array, bkt_base: jax.Array, log2_buckets: int,
               log2_base: int):
    """Bucket of a key in a table grown from 2^log2_base to 2^log2_buckets:
    base bits from the middle hash, growth bits from tag bits [23, 27)
    (mid-derived, see kmers.ktag) — same rule the grow step applies to
    stored cells, so lookups keep finding them."""
    grow = log2_buckets - log2_base
    if grow <= 0:
        return bkt_base
    ext = ((tag >> 23) & jnp.uint32((1 << grow) - 1)).astype(jnp.int32)
    return bkt_base | (ext << log2_base)


def ktable_find(tc: jax.Array, bkt: jax.Array, tags4: jax.Array,
                log2_base: int = -1):
    """4-way next-base query. bkt: [...] base bucket indices (middle hash at
    CREATION size), tags4: [..., 4] candidate cell tags.
    Returns ([..., 4] int32 counts, [...] bool found) — ONE row gather.
    Dispatches on the row width: K2 tables (single-word cells) take the
    single-scatter protocol path."""
    if _is_k2(tc):
        return k2_find(tc, bkt, tags4, log2_base)
    log2_buckets = tc.shape[0].bit_length() - 1
    if log2_base < 0:
        log2_base = log2_buckets
    b = kbucket_of(tags4[..., 0], bkt, log2_buckets, log2_base)
    row = tc[b]                                     # [..., KW]
    tags_r = row[..., :KBUCKET]
    match = tags_r[..., None, :] == tags4[..., :, None]  # [..., 4, KBUCKET]
    w = row[..., KBUCKET:]                          # [..., KBUCKET//2]
    cnt16 = jnp.stack([w & jnp.uint32(0xFFFF), w >> 16], axis=-1).reshape(
        row.shape[:-1] + (KBUCKET,)).astype(jnp.int32)
    # clip to the u8 saturation ceiling at READ time (counters only grow,
    # so this is exactly the old saturating-add fold's observable value)
    cnt = jnp.minimum(cnt16, 255)
    counts = jnp.sum(jnp.where(match, cnt[..., None, :], 0), axis=-1)
    found = jnp.any(match, axis=(-2, -1))
    return counts, found


def ktable_update(tc: jax.Array, bkt: jax.Array, tag: jax.Array,
                  valid: jax.Array, log2_base: int = -1):
    """Batch-insert/increment canonical k-mer events (fused 3-pass protocol,
    see table_update rounds==0 for the full rationale): one row gather serves
    probe + claim decision, one scatter-max claims tags, one scatter-add
    accumulates the count increments DIRECTLY into the row's u16 slot
    counters. bkt/tag/valid: [n] flat.

    All scatters use 2-D (row, col) coordinates: scattering through
    `tc.reshape(-1)` on a 2-D tiled table forces a physical relayout copy
    each way (a ~10 ms FIXED cost per call on a 2^20-bucket table). The
    direct u16 scatter-add replaces the earlier full-table delta plane +
    two whole-table SWAR sweeps (another ~12-15 ms fixed per call) — the
    update is now O(events) engine work only, which is what makes the
    row-granular protocol (8 calls per batch) affordable."""
    if _is_k2(tc):
        return k2_update(tc, bkt, tag, valid, log2_base)
    n_buckets = tc.shape[0]
    log2_buckets = n_buckets.bit_length() - 1
    if log2_base < 0:
        log2_base = log2_buckets
    bkt = kbucket_of(tag, bkt, log2_buckets, log2_base)
    spread = jnp.arange(tag.shape[0], dtype=jnp.int32) & (n_buckets - 1)
    bkt = jnp.where(valid, bkt, spread)

    weights = (jnp.int32(1) << jnp.arange(KBUCKET, dtype=jnp.int32))[None, :]
    row = tc[bkt]
    tags_r = row[:, :KBUCKET]
    match = tags_r == tag[:, None]
    found = jnp.any(match, axis=1) & valid
    cell = jnp.argmax(match, axis=1)
    bm = jnp.sum(jnp.where(tags_r == EMPTY, weights, 0), axis=1)
    want = valid & ~found & (bm > 0)
    # rotation mixes the low (end-letter slot) bits in: same-middle k-mers
    # — exactly the common genomic-variant case under the mid-hash|slot tag
    # scheme — must pick DIFFERENT claim slots in the same batch
    j = ((tag >> 13) ^ tag).astype(jnp.int32) & (KBUCKET - 1)
    rot = ((bm >> j) | (bm << (KBUCKET - j))) & ((1 << KBUCKET) - 1)
    slot = (j + _ctz(rot)) & (KBUCKET - 1)
    tc = tc.at[jnp.where(want, bkt, n_buckets), slot].max(tag, mode="drop")
    dcell = jnp.where(found, cell, slot)
    ok = found | want
    inc = jnp.uint32(1) << ((dcell & 1) << 4).astype(jnp.uint32)
    return tc.at[jnp.where(ok, bkt, n_buckets),
                 KBUCKET + (dcell >> 1)].add(inc, mode="drop")


def ktable_grow(tc: jax.Array, log2_base: int):
    """Double the bucket count at a group boundary (see table_grow). Cells
    move by their tag's mid-derived growth bit; each cell's u16 counter moves
    with it (count words are repacked per destination)."""
    if _is_k2(tc):
        return k2_grow(tc, log2_base)
    n_buckets = tc.shape[0]
    log2b = n_buckets.bit_length() - 1
    tags = tc[:, :KBUCKET]
    w = tc[:, KBUCKET:]                                  # [B, KBUCKET//2]
    cnt16 = jnp.stack([w & jnp.uint32(0xFFFF), w >> 16], axis=-1).reshape(
        n_buckets, KBUCKET)
    grow_bit = ((tags >> (23 + log2b - log2_base)) & 1).astype(jnp.int32)
    new_bkt = jnp.arange(n_buckets, dtype=jnp.int32)[:, None] \
        + grow_bit * n_buckets
    slot = jnp.broadcast_to(jnp.arange(KBUCKET, dtype=jnp.int32)[None, :],
                            tags.shape)
    live = tags != EMPTY
    flat_t = jnp.where(live, new_bkt * KW + slot, 2 * n_buckets * KW)
    new = jnp.zeros((2 * n_buckets * KW,), jnp.uint32)
    new = new.at[flat_t.reshape(-1)].set(tags.reshape(-1), mode="drop")
    # counts: each destination u16 half written by exactly one source cell,
    # so a shifted scatter-ADD assembles the packed words exactly
    flat_c = jnp.where(live, new_bkt * KW + KBUCKET + (slot >> 1),
                       2 * n_buckets * KW)
    cval = cnt16 << (16 * (slot & 1)).astype(jnp.uint32)
    new = new.at[flat_c.reshape(-1)].add(cval.reshape(-1), mode="drop")
    return new.reshape(2 * n_buckets, KW)


def ktable_clamp(tc: jax.Array) -> jax.Array:
    """Clamp each u16 slot counter to 0x8000 (a whole-table sweep run at
    group boundaries by BOTH sides on identical state). Counters above the
    255 find-time clip are observably identical anyway; without this, a
    counter reaching 0xFFFF would wrap and carry +1 into the adjacent
    slot's packed half (cross-slot pollution on ultra-repetitive corpora).
    Post-clamp headroom is 32767 increments per group per slot.
    K2 tables saturate at 255 inside the update itself — no-op."""
    if _is_k2(tc):
        return tc
    w = tc[:, KBUCKET:]
    lo = jnp.minimum(w & jnp.uint32(0xFFFF), jnp.uint32(0x8000))
    hi = jnp.minimum(w >> 16, jnp.uint32(0x8000))
    return jnp.concatenate([tc[:, :KBUCKET], lo | (hi << 16)], axis=1)


def ktable_fill_stats(tc: jax.Array):
    if _is_k2(tc):
        return (jnp.sum((tc != EMPTY).astype(jnp.int32)),
                tc.shape[0] * KBUCKET)
    used = jnp.sum((tc[:, :KBUCKET] != EMPTY).astype(jnp.int32))
    return used, tc.shape[0] * KBUCKET


# ---------------------------------------------------------------------------
# K2Table: single-word cells, single-scatter updates (round 5)
# ---------------------------------------------------------------------------
# Update-protocol redesign of KTable driven by the measured engine cost
# model (tools/profile_r5 series): scatters cost 16-25 ns/event and are
# 5-8x a row gather, so the u16-counter protocol's two scatter passes per
# update call (claim scatter-max + count scatter-add) dominate both the
# encode row pass and the decode scan. A K2 cell packs (tag24 | count8)
# into ONE u32, so an update is ONE row gather + ONE scatter-max:
#   * found events write cell+1 (saturating at count 255 — observably
#     identical to the old u16 counters, which were clipped to 255 at
#     find time anyway);
#   * new keys write tag|1 into a cell that was EMPTY in the gather
#     snapshot. Claims and increments can never collide on a cell (found
#     requires nonzero-at-snapshot, claims require zero-at-snapshot), so
#     the max combiner resolves every conflict deterministically.
# The semantic difference vs the 3-pass protocol: same-key duplicates
# WITHIN one update call collapse to +1 (both read the same snapshot and
# write snapshot+1), so counts approximate "update calls touched" rather
# than raw occurrences — the same flavor of sublinear counting as the
# reference's probabilistic counters (utils.h:256-335), deterministic and
# replayed identically by the decoder. Measured ratio effect on the bench
# sweep: see BASELINE.md round 5. Decode-affecting (params.dna_sb_proto).
#
# Cell layout: [31:8] tag word (15 verification hash bits | forced 1 |
# 4 mid-derived growth bits | 4-bit end-letter slot), [7:0] count.
# Rows are KBUCKET single-word cells = 16 B (vs KW's 24 B) — the decode
# scan's two fattest per-step gathers shrink by a third.

_K2_TAG = jnp.uint32(0xFFFFFF00)


def k2_create(log2_buckets: int):
    return jnp.zeros((1 << log2_buckets, KBUCKET), dtype=jnp.uint32)


def k2tag(tag: jax.Array) -> jax.Array:
    """Compress a 32-bit KTable tag (kmers.ktag layout: end-letter slot in
    the low nibble, growth bits [23, 27)) into the 24-bit cell tag word.
    Bit 23 is forced so a stored cell is never 0 (= EMPTY)."""
    return ((tag & jnp.uint32(0xF))
            | (((tag >> 23) & jnp.uint32(0xF)) << 4)
            | (((tag >> 4) & jnp.uint32(0x7FFF)) << 8)
            | jnp.uint32(1 << 23))


def k2_find(tc: jax.Array, bkt: jax.Array, tags4: jax.Array,
            log2_base: int = -1):
    """4-way next-base query over single-word cells — ONE 16 B row gather.
    Same signature/semantics as ktable_find (counts are <= 255 by
    construction instead of clipped at read time)."""
    log2_buckets = tc.shape[0].bit_length() - 1
    if log2_base < 0:
        log2_base = log2_buckets
    b = kbucket_of(tags4[..., 0], bkt, log2_buckets, log2_base)
    row = tc[b]                                       # [..., KBUCKET]
    tw = k2tag(tags4) << 8                            # [..., 4]
    match = (row[..., None, :] & _K2_TAG) == tw[..., :, None]
    cnt = (row & jnp.uint32(0xFF)).astype(jnp.int32)
    counts = jnp.sum(jnp.where(match, cnt[..., None, :], 0), axis=-1)
    found = jnp.any(match, axis=(-2, -1))
    return counts, found


def k2_update(tc: jax.Array, bkt: jax.Array, tag: jax.Array,
              valid: jax.Array, log2_base: int = -1):
    """Batch-insert/increment: ONE row gather + ONE scatter-max (see the
    block comment). bkt/tag/valid: [n] flat; tag is the 32-bit KTable tag."""
    n_buckets = tc.shape[0]
    log2_buckets = n_buckets.bit_length() - 1
    if log2_base < 0:
        log2_base = log2_buckets
    bkt = kbucket_of(tag, bkt, log2_buckets, log2_base)
    spread = jnp.arange(tag.shape[0], dtype=jnp.int32) & (n_buckets - 1)
    bkt = jnp.where(valid, bkt, spread)

    row = tc[bkt]                                     # [n, KBUCKET]
    tw = k2tag(tag) << 8
    match = (row & _K2_TAG) == tw[:, None]
    found = jnp.any(match, axis=1) & valid
    cell = jnp.argmax(match, axis=1)
    cellv = jnp.sum(jnp.where(match, row, 0), axis=1)
    weights = (jnp.int32(1) << jnp.arange(KBUCKET, dtype=jnp.int32))[None, :]
    bm = jnp.sum(jnp.where(row == EMPTY, weights, 0), axis=1)
    want = valid & ~found & (bm > 0)
    # slot rotation mixes the end-letter slot bits in (same-middle k-mers
    # must pick different claim slots in one batch — see ktable_update)
    j = ((tag >> 13) ^ tag).astype(jnp.int32) & (KBUCKET - 1)
    rot = ((bm >> j) | (bm << (KBUCKET - j))) & ((1 << KBUCKET) - 1)
    slot = (j + _ctz(rot)) & (KBUCKET - 1)
    dcell = jnp.where(found, cell, slot)
    newv = jnp.where(found,
                     cellv + ((cellv & jnp.uint32(0xFF))
                              < jnp.uint32(0xFF)).astype(jnp.uint32),
                     tw | jnp.uint32(1))
    ok = found | want
    return tc.at[jnp.where(ok, bkt, n_buckets), dcell].max(newv, mode="drop")


def k2_grow(tc: jax.Array, log2_base: int):
    """Double the bucket count at a group boundary: cells move whole by
    their tag word's next mid-derived growth bit (cell bits [12, 16))."""
    n_buckets = tc.shape[0]
    log2b = n_buckets.bit_length() - 1
    live = tc != EMPTY
    gb = ((tc >> (12 + log2b - log2_base)) & 1).astype(jnp.int32)
    new_bkt = jnp.arange(n_buckets, dtype=jnp.int32)[:, None] \
        + gb * n_buckets
    slot = jnp.broadcast_to(jnp.arange(KBUCKET, dtype=jnp.int32)[None, :],
                            tc.shape)
    flat = jnp.where(live, new_bkt * KBUCKET + slot, 2 * n_buckets * KBUCKET)
    new = jnp.zeros((2 * n_buckets * KBUCKET,), jnp.uint32)
    new = new.at[flat.reshape(-1)].set(tc.reshape(-1), mode="drop")
    return new.reshape(2 * n_buckets, KBUCKET)


def _is_k2(tc: jax.Array) -> bool:
    return tc.shape[-1] == KBUCKET


# ---------------------------------------------------------------------------
# LocalTable: in-batch direct-addressed (tag, counts) cells
# ---------------------------------------------------------------------------
# TPU analog of the reference's per-thread local k-mer tables ht_smer_local /
# ht_bmer_local (/root/reference/fqs/dna.cpp:95-107, consulted in the find
# cascade dna.h:218-228, cleared at each barrier sync dna.cpp:2475-2488):
# statistics of k-mers seen SINCE the last table sync. Our sync interval is
# the batch, so the local table covers occurrences earlier in the batch in
# scan-step order (step t = read_in_lane * L + position), which is a valid
# causal order for BOTH the encoder (simulating the decoder's scan, see
# streams/dna.py dna_local_sim) and the decoder (updating per scan step).
#
# Cells are single-slot, claim-on-first-touch: the first read ROW to touch an
# empty cell owns it for the batch. Ownership is encoded in the stored word
# itself — (31 - row) in the top 5 bits, a 27-bit key tag below — so ONE
# commutative scatter-max implements "earliest row wins, deterministic
# tie-break within a row" with no pre-claim occupancy gather (3 engine passes
# per insert round instead of 4; the insert rounds are the largest single
# event block of the encode profile). Keys that find the cell owned by
# another tag are dropped for the rest of the batch. All rules are
# branch-free vector ops replayed identically by encoder and decoder.

LOCAL_TAG_MASK = jnp.uint32((1 << 27) - 1)
LOCAL_W = 5   # row: [stamped tag, count A, C, G, T]


def local_create(log2_cells: int):
    """One [LOCAL_W] row per cell — the query (tag check + 4 counts) is ONE
    row gather (the engine charges per row; see table_create)."""
    return jnp.zeros((1 << log2_cells, LOCAL_W), jnp.uint32)


def local_keys(lo: jax.Array, hi: jax.Array, log2_cells: int):
    """(cell, tag27) of (lo, hi) context keys; tag27 has bit 26 forced so a
    stored word is never 0 (= EMPTY sentinel)."""
    t = kmers.hash_tag(lo, hi)
    return (kmers.hash_bucket(lo, hi, log2_cells),
            (t & LOCAL_TAG_MASK) | jnp.uint32(1 << 26))


def local_query(tc: jax.Array, cell, tag, valid):
    """[..., 4] int32 counts (zeros on miss or invalid)."""
    row = tc[cell]                                     # [..., LOCAL_W]
    hit = ((row[..., 0] & LOCAL_TAG_MASK) == tag) & valid
    return jnp.where(hit[..., None], row[..., 1:].astype(jnp.int32), 0)


def local_insert(tc: jax.Array, cell, tag, base, valid, row=0,
                 lite: bool = False):
    """Insert (context -> base) events; cell/tag/base/valid: [n] flat,
    row: the read-row index these events belong to (claim priority).
    Three engine passes: claim scatter-max, ownership gather, count add.

    lite=True drops the ownership gather (2 passes): counts scatter-add
    into the cell unconditionally, so when two keys collide on a cell the
    loser's counts pollute the winner's lanes. Queries still verify the tag
    (a miss reads zeros), and the pollution is DETERMINISTIC — encoder and
    decoder replay the identical rule — so round-trips stay exact; only the
    statistics of ~tag-collision-rate cells blur (measured ratio cost on
    the standard corpus: see BASELINE.md round-3 notes)."""
    C = tc.shape[0]
    row_inv = jnp.uint32(31) - jnp.minimum(
        jnp.asarray(row).astype(jnp.uint32), jnp.uint32(31))
    stamped = (row_inv << 27) | tag
    # 2-D scatters: flat-reshape scatters on a 2-D tiled table pay a
    # relayout copy each way (see ktable_update)
    tc = tc.at[jnp.where(valid, cell, C), 0].max(stamped, mode="drop")
    if lite:
        ok = valid
    else:
        ok = valid & ((tc[cell, 0] & LOCAL_TAG_MASK) == tag)
    return tc.at[jnp.where(ok, cell, C), 1 + base].add(1, mode="drop")


# ---------------------------------------------------------------------------
# KLocal: canonical in-batch table — middle-keyed cells, 16 end-letter slots
# ---------------------------------------------------------------------------
# Canonical-strand redesign of LocalTable (used when DnaConfig.canon): a cell
# is keyed by the canonical MIDDLE K[1:k-1] (shared by both strands and by
# all 4 next-base candidates of a query) and holds 16 u16 counters indexed by
# slot = 4*first + last (the two end letters in canonical orientation) —
# (middle, first, last) determines the k-mer exactly, so the statistics are
# per-k-mer-exact with ONE row gather per 4-way query and ONE insert event
# per occurrence (vs 2 strands x more passes before). Counters are plain
# u16 halves updated with scatter-adds; a (pathological) wraparound past
# 65535 in-batch events is DETERMINISTIC and replayed identically by the
# decoder, so round-trips stay exact regardless.

KLOCAL_W = 9   # [stamped mid-tag, 8 u16x2-packed count words (16 slots)]


def klocal_create(log2_cells: int):
    return jnp.zeros((1 << log2_cells, KLOCAL_W), jnp.uint32)


def klocal_query(tc: jax.Array, cell, tag, slots4, valid):
    """[..., 4] int32 counts of the 4 next-base candidates (zeros on miss).
    slots4: [..., 4] int32 slot indices from the canonical end letters."""
    row = tc[cell]                                     # [..., KLOCAL_W]
    hit = ((row[..., 0] & LOCAL_TAG_MASK) == tag) & valid
    w = row[..., 1:]                                   # [..., 8]
    cnt16 = jnp.stack([w & jnp.uint32(0xFFFF), w >> 16],
                      axis=-1).reshape(w.shape[:-1] + (16,)).astype(jnp.int32)
    c = jnp.take_along_axis(cnt16, slots4, axis=-1)
    return jnp.where(hit[..., None], c, 0)


def klocal_insert(tc: jax.Array, cell, tag, slot, valid, row=0,
                  lite: bool = False):
    """Insert canonical k-mer events; cell/tag/slot/valid: [n] flat.
    Same stamped claim-by-scatter-max protocol as local_insert (earliest
    read row wins the cell); lite=True skips the ownership gather."""
    C = tc.shape[0]
    row_inv = jnp.uint32(31) - jnp.minimum(
        jnp.asarray(row).astype(jnp.uint32), jnp.uint32(31))
    stamped = (row_inv << 27) | tag
    tc = tc.at[jnp.where(valid, cell, C), 0].max(stamped, mode="drop")
    if lite:
        ok = valid
    else:
        ok = valid & ((tc[cell, 0] & LOCAL_TAG_MASK) == tag)
    inc = jnp.uint32(1) << ((slot & 1) << 4).astype(jnp.uint32)
    return tc.at[jnp.where(ok, cell, C), 1 + (slot >> 1)].add(
        inc, mode="drop")


# ---------------------------------------------------------------------------
# PairTable: bucketed (key -> partner-minimizer, weight) slots
# ---------------------------------------------------------------------------
# TPU analog of the reference's PE minimizer pair table CHT_pair_kmers
# (/root/reference/fqs/ht_kmer.h:559-663, ht_kmer.cpp:121-230): associates a
# minimizer of one mate with minimizers of the other so the decoder can locate
# read2's anchor from read1 alone. A slot holds (key tag, value lo, value hi,
# weight); several slots of a bucket may share the key tag with different
# values (the reference's multi-value find, ht_kmer.cpp:213-230). Values are
# stored EXACTLY (2*bmer_len bits) because the decoder reconstructs the
# anchor's bases from the chosen candidate value.

def pair_create(log2_buckets: int):
    # four DISTINCT buffers (a shared zeros array breaks jit donation)
    return tuple(jnp.zeros((1 << log2_buckets, BUCKET), jnp.uint32)
                 for _ in range(4))          # tags, vlo, vhi, cnt


def pair_find(pt, klo: jax.Array, khi: jax.Array):
    """Query keys [...]: returns (vlo, vhi, cnt) rows [..., BUCKET]; cnt is 0
    on slots whose key tag does not match (the analog of scanning the probe
    chain for all values of a key, ht_kmer.cpp:213-230)."""
    tags, vlo, vhi, cnt = pt
    log2b = tags.shape[0].bit_length() - 1
    bkt = kmers.hash_bucket(klo, khi, log2b)
    tag = kmers.hash_tag(klo, khi)
    match = tags[bkt] == tag[..., None]
    return vlo[bkt], vhi[bkt], jnp.where(match, cnt[bkt], 0)


def pair_update(pt, klo, khi, vlo_n, vhi_n, w, valid):
    """Batch (key -> value, weight) inserts; all [n] flat.

    Slot identity is the TRIPLE (key tag, vlo, vhi), so claiming an empty
    slot must write three words consistently. Protocol (deterministic, no
    locks): new events claim via scatter-max of a combined 32-bit TICKET
    (hash of tag+value) into a transient plane; re-gathered ticket == own
    ticket elects a unique winner per slot, which then writes all three
    identity words (same-batch duplicates of one (key, value) write
    identical words). Weights then scatter-add for every matching event —
    order-independent like every other table here."""
    tags, vlo, vhi, cnt = pt
    n_buckets = tags.shape[0]
    log2b = n_buckets.bit_length() - 1
    # spread invalid events (see table_update: a shared dummy bucket is a
    # gather-conflict pile)
    bkt = jnp.where(valid, kmers.hash_bucket(klo, khi, log2b),
                    jnp.arange(klo.shape[0], dtype=jnp.int32)
                    & (n_buckets - 1))
    tag = kmers.hash_tag(klo, khi)
    ticket = kmers.hash_tag(vlo_n * jnp.uint32(0x9E3779B1) ^ tag, vhi_n)
    weights = (jnp.int32(1) << jnp.arange(BUCKET, dtype=jnp.int32))[None, :]
    # slot rotation from the TICKET (not the key tag): same-key events with
    # distinct values pick distinct slots in the same round
    j = (ticket >> 13).astype(jnp.int32) & (BUCKET - 1)

    def claim_round(r, carry):
        tags, vlo, vhi = carry
        row_t = tags[bkt]
        row_l = vlo[bkt]
        row_h = vhi[bkt]
        found = jnp.any((row_t == tag[:, None]) & (row_l == vlo_n[:, None])
                        & (row_h == vhi_n[:, None]), axis=1) & valid
        bm = jnp.sum(jnp.where(row_t == EMPTY, weights, 0), axis=1)
        want = valid & ~found & (bm > 0)
        jr = (j + 3 * r) & (BUCKET - 1)
        rot = ((bm >> jr) | (bm << (BUCKET - jr))) & ((1 << BUCKET) - 1)
        slot = (jr + _ctz(rot)) & (BUCKET - 1)
        # 2-D scatters (flat-reshape scatters relayout 2-D tables, see
        # ktable_update); the claim plane is created 2-D
        bkt_w = jnp.where(want, bkt, n_buckets)
        claim = jnp.zeros((n_buckets + 1, BUCKET), jnp.uint32).at[
            bkt_w, slot].max(ticket)
        win = want & (claim[bkt_w, slot] == ticket)
        bkt_v = jnp.where(win, bkt, n_buckets)
        tags = tags.at[bkt_v, slot].set(tag, mode="drop")
        vlo = vlo.at[bkt_v, slot].set(vlo_n, mode="drop")
        vhi = vhi.at[bkt_v, slot].set(vhi_n, mode="drop")
        return tags, vlo, vhi

    tags, vlo, vhi = jax.lax.fori_loop(0, 2, claim_round, (tags, vlo, vhi))

    match2 = ((tags[bkt] == tag[:, None]) & (vlo[bkt] == vlo_n[:, None])
              & (vhi[bkt] == vhi_n[:, None]))
    found2 = jnp.any(match2, axis=1) & valid
    cell2 = jnp.argmax(match2, axis=1)
    cnt = cnt.at[jnp.where(found2, bkt, n_buckets), cell2].add(
        w.astype(jnp.uint32), mode="drop")
    cnt = jnp.minimum(cnt, 1 << 20)
    return tags, vlo, vhi, cnt


def table_fill_stats(tc: jax.Array):
    """Occupancy diagnostics (reference filling-factor stats, bit_vec.h:204-230)."""
    used = jnp.sum((tc[:, :BUCKET] != EMPTY).astype(jnp.int32))
    return used, tc.shape[0] * BUCKET


class LocalBackend:
    """Single-shard table access: arrays are whole tables on this device.
    The tp-sharded equivalent (parallel/sharded.py TpBackend) holds a bucket
    range per chip and combines finds with psum — the analog of the
    reference's owner-thread table shards (SURVEY.md §2 comm table)."""

    def siv_find(self, siv, ctx):
        return siv_find(siv, ctx)

    def siv_words(self, siv, idx):
        return siv[idx]

    def siv_update(self, siv, keys, valid):
        return siv_update(siv, keys, valid)

    def table_find(self, tc, lo, hi, log2_base=-1):
        return table_find(tc, lo, hi, log2_base)

    def table_update(self, tc, lo, hi, base, valid, log2_base=-1,
                     rounds=2):
        return table_update(tc, lo, hi, base, valid,
                            log2_base=log2_base, rounds=rounds)

    def ktable_find(self, tc, bkt, tags4, log2_base=-1):
        return ktable_find(tc, bkt, tags4, log2_base)

    def ktable_update(self, tc, bkt, tag, valid, log2_base=-1):
        return ktable_update(tc, bkt, tag, valid, log2_base)


LOCAL = LocalBackend()
