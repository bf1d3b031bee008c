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


# ---------------------------------------------------------------------------
# SIV: dense p-mer counters
# ---------------------------------------------------------------------------

def siv_create(siv_len: int) -> jax.Array:
    """Word i packs the 4 next-base counts of (p-1)-mer context i."""
    return jnp.zeros((4 ** (siv_len - 1),), dtype=jnp.uint32)


def siv_find(siv: jax.Array, ctx: jax.Array) -> jax.Array:
    """ctx: [...] int32 (p-1)-mer values. Returns [..., 4] int32 counts."""
    return unpack_counts(siv[ctx])


def siv_update(siv: jax.Array, keys: jax.Array, valid: jax.Array) -> jax.Array:
    """Batch-increment cells. keys: [n] int32 packed (ctx<<2|base); valid: [n] bool.

    Deterministic: per-context increments are aggregated first, then one
    read-modify-write with saturation at 255.
    """
    n = keys.shape[0]
    keys = jnp.where(valid, keys, jnp.int32(-1))
    order = jnp.argsort(keys)  # invalid (-1) sort first
    sk = keys[order]
    ctx = sk >> 2
    base = sk & 3
    # segment by context
    first = jnp.concatenate([jnp.ones((1,), bool), ctx[1:] != ctx[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    onehot = (base[:, None] == jnp.arange(4)[None, :]).astype(jnp.int32)
    onehot = jnp.where((sk >= 0)[:, None], onehot, 0)
    inc4 = jax.ops.segment_sum(onehot, seg, num_segments=n)
    # representative ctx per segment
    seg_ctx = jnp.full((n,), -1, jnp.int32).at[seg].set(ctx, mode="drop")
    live = seg_ctx >= 0
    idx = jnp.where(live, seg_ctx, 0)
    old = unpack_counts(siv[idx])
    neww = pack_counts(old + inc4)
    neww = jnp.where(live, neww, siv[idx])
    return siv.at[jnp.where(live, idx, siv.shape[0])].set(neww, mode="drop")


# ---------------------------------------------------------------------------
# CountTable: bucketed hash table of (tag, counts) cells
# ---------------------------------------------------------------------------

def table_create(log2_buckets: int):
    tags = jnp.zeros((1 << log2_buckets, BUCKET), dtype=jnp.uint32)
    cnts = jnp.zeros((1 << log2_buckets, BUCKET), dtype=jnp.uint32)
    return tags, cnts


def table_find(tags: jax.Array, cnts: jax.Array, lo: jax.Array, hi: jax.Array):
    """Query contexts. lo/hi: [...] uint32 key pair.
    Returns ([..., 4] int32 counts, [...] bool found)."""
    log2_buckets = tags.shape[0].bit_length() - 1
    bkt = kmers.hash_bucket(lo, hi, log2_buckets)
    tag = kmers.hash_tag(lo, hi)
    row_t = tags[bkt]            # [..., BUCKET]
    row_c = cnts[bkt]
    match = row_t == tag[..., None]
    found = jnp.any(match, axis=-1)
    word = jnp.sum(jnp.where(match, row_c, EMPTY), axis=-1).astype(jnp.uint32)
    return unpack_counts(word), found


def table_update(tags: jax.Array, cnts: jax.Array, lo: jax.Array, hi: jax.Array,
                 base: jax.Array, valid: jax.Array, bkt=None, tag=None):
    """Batch-insert/increment (context -> next base) events.

    lo/hi/base/valid: [n]. Aggregates per key, then resolves bucket cells with
    BUCKET deterministic claim rounds; keys that find no empty cell in their
    bucket are dropped (the reference instead grows the table at barriers,
    ht_kmer.h:88-112 — we presize from -gs like params.h:131-155).

    bkt/tag may be passed precomputed (the tp-sharded path supplies local
    bucket indices after ownership masking, parallel/sharded.py).
    """
    n = lo.shape[0]
    if bkt is None:
        log2_buckets = tags.shape[0].bit_length() - 1
        bkt = kmers.hash_bucket(lo, hi, log2_buckets)
    if tag is None:
        tag = kmers.hash_tag(lo, hi)
    bkt = jnp.where(valid, bkt, jnp.int32(-1))

    # aggregate increments per (bucket, tag)
    order = jnp.lexsort((tag, bkt))
    sb, st = bkt[order], tag[order]
    sbase = base[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), (sb[1:] != sb[:-1]) | (st[1:] != st[:-1])]
    )
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    onehot = (sbase[:, None] == jnp.arange(4)[None, :]).astype(jnp.int32)
    onehot = jnp.where((sb >= 0)[:, None], onehot, 0)
    inc4 = jax.ops.segment_sum(onehot, seg, num_segments=n)
    seg_bkt = jnp.full((n,), -1, jnp.int32).at[seg].set(sb, mode="drop")
    seg_tag = jnp.zeros((n,), jnp.uint32).at[seg].set(st, mode="drop")

    active = seg_bkt >= 0
    sbkt = jnp.where(active, seg_bkt, 0)
    rank = jnp.arange(n, dtype=jnp.int32)

    for j in range(BUCKET):
        cell_tag = tags[sbkt, j]
        is_match = active & (cell_tag == seg_tag)
        is_empty = active & (cell_tag == EMPTY)

        # matched: saturating add (targets are unique: one pending per key)
        m_idx = jnp.where(is_match, sbkt, tags.shape[0])
        old = unpack_counts(cnts[sbkt, j])
        neww = pack_counts(old + inc4)
        cnts = cnts.at[m_idx, j].set(neww, mode="drop")

        # empty: claim by scatter-min of pending rank
        claim = jnp.full((tags.shape[0],), n, jnp.int32)
        c_idx = jnp.where(is_empty, sbkt, tags.shape[0])
        claim = claim.at[c_idx].min(rank, mode="drop")
        won = is_empty & (claim[sbkt] == rank)
        w_idx = jnp.where(won, sbkt, tags.shape[0])
        tags = tags.at[w_idx, j].set(seg_tag, mode="drop")
        cnts = cnts.at[w_idx, j].set(pack_counts(inc4), mode="drop")

        active = active & ~is_match & ~won
    return tags, cnts


def table_fill_stats(tags: jax.Array):
    """Occupancy diagnostics (reference filling-factor stats, bit_vec.h:204-230)."""
    used = jnp.sum((tags != EMPTY).astype(jnp.int32))
    return used, tags.shape[0] * BUCKET


class LocalBackend:
    """Single-shard table access: arrays are whole tables on this device.
    The tp-sharded equivalent (parallel/sharded.py TpBackend) holds a bucket
    range per chip and combines finds with psum — the analog of the
    reference's owner-thread table shards (SURVEY.md §2 comm table)."""

    def siv_find(self, siv, ctx):
        return siv_find(siv, ctx)

    def siv_update(self, siv, keys, valid):
        return siv_update(siv, keys, valid)

    def table_find(self, tags, cnts, lo, hi):
        return table_find(tags, cnts, lo, hi)

    def table_update(self, tags, cnts, lo, hi, base, valid):
        return table_update(tags, cnts, lo, hi, base, valid)


LOCAL = LocalBackend()
