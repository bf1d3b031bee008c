"""k-mer packing, reverse complements, and hashes — integer-only, no int64.

Equivalent of the reference's CKmer (/root/reference/fqs/kmer.h:18-540), which
keeps a 2-bit-packed <=32-mer in a u64 with O(1) sliding updates. On TPU we
avoid 64-bit integers entirely: wide keys are (lo, hi) uint32 pairs maintained
as an exact 64-bit shift register, and windows are packed in one vectorized
pass over the whole [reads, positions] batch instead of per-base updates.

Strand handling: the reference canonicalizes by the k-mer "kernel" so one table
entry serves both strands (kmer.h:199-207). We instead insert both the forward
and reverse-complement (context, next-base) events — same statistics sharing,
simpler batched queries (see DESIGN.md).

Base codes: A=0 C=1 G=2 T=3 N=4. For k-mer purposes N is mapped to 0 by the
caller (kcodes); complement is 3 - code.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def shift_right(arr: jax.Array, d: int) -> jax.Array:
    """Shift along the last (position) axis so out[..., i] = arr[..., i-d];
    left-pad with zeros."""
    if d == 0:
        return arr
    pad = [(0, 0)] * (arr.ndim - 1) + [(d, 0)]
    return jnp.pad(arr, pad)[..., : arr.shape[-1]]


def _shl64(lo: jax.Array, hi: jax.Array, s: int):
    """Static left shift of a (lo, hi) 64-bit pair by s bits (0 <= s <= 32)."""
    if s == 0:
        return lo, hi
    if s == 32:
        return jnp.zeros_like(lo), lo
    return lo << s, (hi << s) | (lo >> (32 - s))


def _pow2_blocks(lo: jax.Array, hi: jax.Array, k: int, rc: bool):
    """Doubling ladder: (width, lo, hi) windows for widths 1, 2, 4, ... <= k.
    fwd: w_{2m}[i] = w_m[i-m] << 2m | w_m[i] (older bases in higher bits);
    rc:  w_{2m}[i] = w_m[i]   << 2m | w_m[i-m] (newer complements on top)."""
    out = [(1, lo, hi)]
    w = 1
    while w * 2 <= k:
        _, plo, phi = out[-1]
        slo, shi = shift_right(plo, w), shift_right(phi, w)
        if rc:
            nlo, nhi = _shl64(plo, phi, 2 * w)
            nlo, nhi = nlo | slo, nhi | shi
        else:
            nlo, nhi = _shl64(slo, shi, 2 * w)
            nlo, nhi = nlo | plo, nhi | phi
        w *= 2
        out.append((w, nlo, nhi))
    return out


def pack_windows(kcodes: jax.Array, k: int):
    """Pack the k-base window ending at each position (earliest base in the
    most significant bits) — O(log k) doubling composition instead of the
    naive k-pass shift register (the pack runs on every batch for three
    window widths and both strands; at k≈17-21 this is a ~3x op-count cut).

    Args:
      kcodes: [..., L] int32 base codes in {0..3}.
    Returns:
      (lo, hi): [..., L] uint32 pair; window at i covers positions i-k+1..i and
      is only meaningful when i >= k-1 (earlier positions contain partial packs
      with zeros for out-of-range bases — identical to the naive pack).
    """
    lo = kcodes.astype(jnp.uint32)
    hi = jnp.zeros_like(lo)
    acc = None
    off = 0
    for pw, plo, phi in _pow2_blocks(lo, hi, k, rc=False):
        if k & pw:
            if acc is None:
                acc, off = (plo, phi), pw
            else:
                slo, shi = shift_right(plo, off), shift_right(phi, off)
                slo, shi = _shl64(slo, shi, 2 * off)
                acc, off = (slo | acc[0], shi | acc[1]), off + pw
    lo, hi = acc
    if k <= 16:
        hi = jnp.zeros_like(hi)
    return lo, hi


def pack_windows_rc(kcodes: jax.Array, k: int):
    """Reverse complement of the k-base window ending at each position,
    O(log k) like pack_windows.

    rc(window i-k+1..i) = [3-b[i], 3-b[i-1], ..., 3-b[i-k+1]].
    """
    lo = (3 - kcodes).astype(jnp.uint32) & 3
    hi = jnp.zeros_like(lo)
    acc = None
    off = 0
    for pw, plo, phi in _pow2_blocks(lo, hi, k, rc=True):
        if k & pw:
            if acc is None:
                acc, off = (plo, phi), pw
            else:
                slo, shi = shift_right(plo, off), shift_right(phi, off)
                alo, ahi = _shl64(acc[0], acc[1], 2 * pw)
                acc, off = (alo | slo, ahi | shi), off + pw
    lo, hi = acc
    if k <= 16:
        hi = jnp.zeros_like(hi)
    return lo, hi


# ---------------------------------------------------------------------------
# (lo, hi) 64-bit pair micro-ops for canonical-strand keys
# ---------------------------------------------------------------------------
# The canonical k-mer table (tables.ktable_*) keys cells by the FULL k-mer in
# canonical orientation, with the strand decided by the middle k-2 bases — the
# TPU analog of the reference's kernel canonicalization (kmer.h:199-207,
# KMER_MARGIN_2_SYMBOLS), which lets one stored entry serve both strands while
# the variable end letter stays addressable. These helpers build the canonical
# keys from the (context, rc-context) windows both the batch encoder and the
# decoder's rolling registers already maintain.

def shl2(lo: jax.Array, hi: jax.Array):
    """(lo, hi) << 2 (one base)."""
    return lo << 2, (hi << 2) | (lo >> 30)


def shr2(lo: jax.Array, hi: jax.Array):
    """(lo, hi) >> 2 (one base)."""
    return (lo >> 2) | (hi << 30), hi >> 2


def mask_low(lo: jax.Array, hi: jax.Array, n_bases: int):
    """Keep the low n_bases bases (the LATEST bases — windows pack the
    earliest base in the most significant bits)."""
    bits = 2 * n_bases
    if bits >= 64:
        return lo, hi
    if bits >= 32:
        return lo, hi & jnp.uint32((1 << (bits - 32)) - 1)
    return lo & jnp.uint32((1 << bits) - 1), jnp.zeros_like(hi)


def or_top_base(lo: jax.Array, hi: jax.Array, base, k_bases: int):
    """OR a 2-bit base into the top (earliest) slot of a k_bases-wide window."""
    off = 2 * (k_bases - 1)
    b = base.astype(jnp.uint32) if hasattr(base, "astype") else jnp.uint32(base)
    if off >= 32:
        return lo, hi | (b << (off - 32))
    return lo | (b << off), hi


def less64(alo, ahi, blo, bhi):
    """(alo, ahi) < (blo, bhi) as unsigned 64-bit values."""
    return (ahi < bhi) | ((ahi == bhi) & (alo < blo))


def top_base(lo: jax.Array, hi: jax.Array, n_bases: int) -> jax.Array:
    """The earliest (most significant) base of an n_bases-wide window."""
    off = 2 * (n_bases - 1)
    v = hi >> (off - 32) if off >= 32 else lo >> off
    return (v & 3).astype(jnp.int32)


def canon_strand(c_lo, c_hi, r_lo, r_hi, k: int):
    """Strand decision for the width-k canonical table given the (k-1)-base
    context c = K[0:k-1] and its reverse complement rc(c).

    The decision key is the middle w = K[1:k-1] (k-2 bases, excluding the
    FIRST letter and the variable LAST letter), so it is (a) computable by a
    query that does not know the last letter, (b) identical for all 4
    next-base candidates, and (c) strand-symmetric: the mirror query (the
    same physical k-mer read on the other strand) sees rc(w) and flips.
    Returns (use_rc bool, mid_lo, mid_hi) with mid = min(w, rc(w))."""
    w_lo, w_hi = mask_low(c_lo, c_hi, k - 2)
    rw_lo, rw_hi = mask_low(*shr2(r_lo, r_hi), k - 2)
    s = less64(rw_lo, rw_hi, w_lo, w_hi)
    return s, jnp.where(s, rw_lo, w_lo), jnp.where(s, rw_hi, w_hi)


# 32-bit mixing constants (from murmur3/xxhash finalizers — standard constants).
_C1 = jnp.uint32(0x9E3779B1)
_C2 = jnp.uint32(0x85EBCA77)
_C3 = jnp.uint32(0xC2B2AE3D)
_C4 = jnp.uint32(0x27D4EB2F)
_C5 = jnp.uint32(0x165667B1)


def hash_bucket(lo: jax.Array, hi: jax.Array, log2_buckets: int) -> jax.Array:
    """Bucket index for a (lo, hi) key (analog of MurmurMix64 table hashing,
    /root/reference/fqs/ht_kmer.h:115-130, built from 32-bit multiplies)."""
    h = lo * _C1 ^ hi * _C2
    h = h ^ (h >> 15)
    h = h * _C3
    h = h ^ (h >> 13)
    return (h & jnp.uint32((1 << log2_buckets) - 1)).astype(jnp.int32)


def hash_tag(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """32-bit verification tag, independent of the bucket hash. The high bit is
    forced so a tag is never 0 (= EMPTY sentinel)."""
    t = lo * _C4 ^ hi * _C5
    t = t ^ (t >> 16)
    t = t * _C1
    t = t ^ (t >> 11)
    return t | jnp.uint32(0x80000000)


_GROW_MASK = jnp.uint32(0xF << 23)   # tag bits [23, 27): table-growth bits


def ktag(k_lo, k_hi, m_lo, m_hi) -> jax.Array:
    """Cell tag of a canonical full k-mer (k_lo, k_hi) whose canonical middle
    is (m_lo, m_hi). Bits [23, 27) come from the MIDDLE hash: tables.bucket_of
    derives post-growth bucket bits from stored tags, and all 4 next-base
    candidates of a query share the middle — so they stay co-bucketed after
    every regrow and a 4-way find stays ONE row gather."""
    t = hash_tag(k_lo, k_hi)
    g = hash_bucket(m_lo ^ _C2, m_hi ^ _C4, 4)   # independent mid-derived bits
    return (t & ~_GROW_MASK) | (g.astype(jnp.uint32) << 23)
