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
    """Word i packs the 4 saturating u8 next-base counters of (p-1)-mer
    context i — packed storage keeps FIND traffic (the hot path: 4 window
    passes per batch) at 4 bytes/row; updates go through a transient int32
    delta plane (scatter-adds commute => order-independent)."""
    return jnp.zeros((4 ** (siv_len - 1),), dtype=jnp.uint32)


def siv_find(siv: jax.Array, ctx: jax.Array) -> jax.Array:
    """ctx: [...] int32 (p-1)-mer values. Returns [..., 4] int32 counts."""
    return unpack_counts(siv[ctx])


def siv_update(siv: jax.Array, keys: jax.Array, valid: jax.Array) -> jax.Array:
    """Batch-increment cells. keys: [n] int32 packed (ctx<<2|base); the
    int32 delta plane sidesteps cross-field carries in the packed words."""
    n_cells = siv.shape[0] * 4
    idx = jnp.where(valid, keys, n_cells)
    delta = jnp.zeros((n_cells,), jnp.int32).at[idx].add(1, mode="drop")
    return pack_counts(unpack_counts(siv) + delta.reshape(siv.shape[0], 4))


# ---------------------------------------------------------------------------
# CountTable: bucketed hash table of (tag, counts) cells
# ---------------------------------------------------------------------------

def table_create(log2_buckets: int):
    """Packed u32 counts (4×u8 per cell): FIND is the hot path (4 window
    passes × 2 tables per batch) and packed rows read 4× less HBM."""
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
    """
    n = lo.shape[0]
    n_buckets = tags.shape[0]
    if bkt is None:
        log2_buckets = n_buckets.bit_length() - 1
        bkt = kmers.hash_bucket(lo, hi, log2_buckets)
    if tag is None:
        tag = kmers.hash_tag(lo, hi)
    bkt = jnp.where(valid, bkt, 0)
    rank = jnp.arange(n, dtype=jnp.int32)

    # claim rounds: one new key per bucket per round (fori_loop: one
    # compiled body, smaller HLO than unrolling)
    def claim_round(_, tags):
        row_t = tags[bkt]                           # [n, BUCKET]
        match = row_t == tag[:, None]
        found = jnp.any(match, axis=1) & valid
        empty = row_t == EMPTY
        has_empty = jnp.any(empty, axis=1)
        first_empty = jnp.argmax(empty, axis=1)
        want = valid & ~found & has_empty
        claim = jnp.full((n_buckets,), n, jnp.int32).at[
            jnp.where(want, bkt, n_buckets)].min(rank, mode="drop")
        winner = want & (claim[bkt] == rank)
        return tags.at[jnp.where(winner, bkt, n_buckets), first_empty].set(
            tag, mode="drop")

    tags = jax.lax.fori_loop(0, 6, claim_round, tags)

    # re-probe (winners and their duplicates now match) and scatter-add into
    # an int32 delta plane, then one saturating repack sweep
    row_t2 = tags[bkt]
    match2 = row_t2 == tag[:, None]
    found2 = jnp.any(match2, axis=1) & valid
    cell2 = jnp.argmax(match2, axis=1)
    flat = (bkt * BUCKET + cell2) * 4 + base
    flat = jnp.where(found2, flat, n_buckets * BUCKET * 4)
    delta = jnp.zeros((n_buckets * BUCKET * 4,), jnp.int32).at[flat].add(
        1, mode="drop")
    cnts = pack_counts(unpack_counts(cnts) + delta.reshape(n_buckets, BUCKET, 4))
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
