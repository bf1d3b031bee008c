"""Adaptive context-conditioned frequency models, frozen per batch.

TPU-native replacement for the reference's CSimpleModel/CRangeCoderModel
adaptive frequency tables (/root/reference/fqs/rc.h:20-514) and the
CContextHM context->model hash map (context_hm.h:21-248). Instead of lazily
allocated per-context model objects updated after every symbol, a model family
is ONE dense int32[n_ctx, A] array:

  * probabilities are read from a frozen snapshot for a whole batch (encoder
    and decoder read the identical snapshot — the same argument that makes the
    reference's barrier-synced staleness correct, application.cpp:622);
  * after the batch, all (ctx, sym) occurrences are scatter-added at once
    (order-independent integer adds), then rows are rescaled by deterministic
    halving so the smoothed total stays <= 2^scale_bits, which guarantees every
    quantized rANS frequency >= 1 (see DESIGN.md);
  * quantization is exact integer math: cdf_j = floor(cum_j * 2^SB / total).

ALPHA additive smoothing replaces the reference's model-cloning initialisation
of child contexts (rc.h copy-construct, dna.cpp:2107-2197).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ALPHA = 1          # additive smoothing per symbol
RAW_CAP_BITS = 13  # raw row totals kept below 2^RAW_CAP_BITS via halving


def floor_div_prod(x: jax.Array, y: jax.Array, d: jax.Array) -> jax.Array:
    """Exact floor(x * y / d) for int32 x, y >= 0, d >= 1 with x*y < 2^31
    and quotient < ~2^20, WITHOUT integer division (lowered by XLA:TPU to a
    long shift-subtract sequence on the VPU — measured a large share of the
    modeling phase). f32 multiply+divide puts the quotient within +/-1 of
    truth (rel error <= 2^-23 of a small quotient); one integer
    multiply-back correction each side makes it exact — the same trick as
    the rANS kernel's reciprocal divide (ops/rans.py _div_u32_by_u16)."""
    q = (x.astype(jnp.float32) * y.astype(jnp.float32)
         / d.astype(jnp.float32)).astype(jnp.int32)
    r = x * y - q * d
    return q + (r >= d).astype(jnp.int32) - (r < 0).astype(jnp.int32)


def model_create(n_ctx: int, n_sym: int) -> jax.Array:
    return jnp.zeros((n_ctx, n_sym), dtype=jnp.int32)


def _rows_to_cdf(rows: jax.Array, scale_bits: int) -> jax.Array:
    cum = jnp.cumsum(rows, axis=-1)                # [..., A]
    total = cum[..., -1:]
    zeros = jnp.zeros_like(cum[..., :1])
    cum = jnp.concatenate([zeros, cum], axis=-1)   # [..., A+1]
    # exact floor(cum << sb / total) without integer division: cum <= total
    # <= 2^scale_bits (the freq>=1 headroom proof), so cum << sb <= 2^28
    # and the quotient <= 2^sb — well inside floor_div_prod's envelope
    return floor_div_prod(cum, jnp.int32(1 << scale_bits), total)


def model_cdf(freqs: jax.Array, ctx: jax.Array, scale_bits: int) -> jax.Array:
    """Quantized cdf rows for a batch of contexts.

    Args:
      freqs: [M, A] int32 raw counts. ctx: [...] int32.
    Returns:
      cdf: [..., A+1] int32 with cdf[...,0]=0, cdf[...,A]=2^SB, every step >= 1.
    """
    return _rows_to_cdf(freqs[ctx] + ALPHA, scale_bits)


def model_cdf_masked(freqs: jax.Array, alpha_lut: jax.Array, ctx: jax.Array,
                     scale_bits: int) -> jax.Array:
    """model_cdf with a per-context ALPHA mask: contexts whose slot can only
    ever code a small sub-alphabet (e.g. the id stream's 2-symbol flag and
    9-symbol delta slots inside a 256-wide model) get additive smoothing on
    the valid columns ONLY. Invalid symbols quantize to zero-width cdf steps;
    cdf_lookup resolves an equal-boundary run to the next valid symbol, and
    the encoder never emits an invalid symbol — so round-trips are exact
    while the dead-symbol probability mass (and the 8-bit cold-start cost)
    disappears. alpha_lut: [M, A] 0/1 int32."""
    return _rows_to_cdf(freqs[ctx] + alpha_lut[ctx], scale_bits)


def model_cdf_mix(freqs: jax.Array, ctx: jax.Array, cctx: jax.Array,
                  scale_bits: int, w: int, b: int,
                  local: jax.Array | None = None) -> jax.Array:
    """Two-level context mix: the TPU-shaped analog of the reference's
    adaptive context-level hierarchy (dna.cpp:2107-2286, code_ctx.cpp:257-324
    — young fine contexts there start as CLONES of a coarser parent model).
    Instead of cloning, every lookup blends a coarse-context row into the
    fine row with a weight that fades as the fine row matures:

        w_eff  = (w * b) // (t_fine + b)          # pseudo-count budget
        rows   = fine + (coarse_row * w_eff) // (t_coarse + A) + ALPHA

    At t_fine = 0 the coarse distribution contributes ~w pseudo-counts
    (young contexts inherit the parent's statistics); by t_fine >> b it
    contributes nothing (mature contexts keep their full sharpness).
    All-integer and applied identically by encoder and decoder.

    freqs holds BOTH model families in one array — fine rows first, coarse
    rows behind them — and cctx must arrive pre-offset by the fine row
    count. The two rows come back in TWO plain row gathers: a single
    [..., 2]-index gather was measured 24x SLOWER on the chip (384.6 vs
    16.1 ms on a [4096, 100] batch against the ctx-v2-sized array) — XLA
    lowers the fancy-index form to per-element gathers while plain
    freqs[idx] row gathers go down the contiguous-row fast path.

    Headroom: t_fine <= 2^RAW_CAP_BITS (model_update), coarse adds <= w + A,
    local deltas are clamped by local_cap(..., extra=w) — so every smoothed
    row total stays <= 2^scale_bits and quantized frequencies stay >= 1."""
    # (A single gather with a [2, N] or [..., 2] index array was measured
    # 150-24x SLOWER than these two plain 1-D-index row gathers — any
    # multi-dim index array defeats XLA:TPU's contiguous-row gather path.)
    f = freqs[ctx]
    g = freqs[cctx]
    if local is not None:
        cap = local_cap(freqs.shape[1], scale_bits, extra=w)
        f = f + jnp.minimum(local[ctx], cap)
    tf = jnp.sum(f, axis=-1, keepdims=True)
    tg = jnp.sum(g, axis=-1, keepdims=True)
    # both quotients are small (<= w) with products < 2^25: exact via
    # floor_div_prod instead of the slow VPU integer division
    w_eff = floor_div_prod(jnp.int32(w), jnp.int32(b), tf + b)
    rows = f + floor_div_prod(g, w_eff, tg + freqs.shape[1]) + ALPHA
    return _rows_to_cdf(rows, scale_bits)


def local_cap(n_sym: int, scale_bits: int, extra: int = 0) -> int:
    """Per-symbol cap on in-batch local deltas: keeps every smoothed row
    total <= 2^scale_bits so quantized frequencies stay >= 1 (the freq>=1
    proof needs total <= 2^SB; global rows are capped at 2^RAW_CAP_BITS).
    extra: additional headroom to reserve (model_cdf_mix's coarse budget)."""
    return max(1, ((1 << scale_bits) - (1 << RAW_CAP_BITS) - 2 * n_sym
                   - extra) // n_sym)


# ---------------------------------------------------------------------------
# packed u16 find mirror
# ---------------------------------------------------------------------------
# The scatter/gather engine's per-row cost rises sharply with total array
# size (measured, tools/profile_r5b.py on one chip: a [4.7M, 5] i32 model
# gathers at ~69 ns/row; the same rows packed 2-per-u32 into a [4.7M, 3] u32
# array gather at ~9 ns/row — 8x). Model cells never exceed 2^RAW_CAP_BITS
# (model_update rescales every touched row), so they fit u16 exactly. The
# authoritative model stays i32 (updates scatter-add with full headroom);
# the hot FIND paths gather from a packed MIRROR rebuilt once per batch —
# a pure storage-layout change, so cdf values (and archives) are identical.

def pack_freqs(freqs: jax.Array) -> jax.Array:
    """[n, A] i32 (cells < 2^16) -> [n, ceil(A/2)] u32, 2 cells per word."""
    n, A = freqs.shape
    f = freqs.astype(jnp.uint32)
    if A % 2:
        f = jnp.concatenate([f, jnp.zeros((n, 1), jnp.uint32)], axis=1)
    return f[:, 0::2] | (f[:, 1::2] << 16)


def _unpack_row(w: jax.Array, A: int) -> jax.Array:
    """[..., ceil(A/2)] u32 -> [..., A] i32."""
    lo = (w & jnp.uint32(0xFFFF)).astype(jnp.int32)
    hi = (w >> 16).astype(jnp.int32)
    return jnp.stack([lo, hi], axis=-1).reshape(w.shape[:-1]
                                                + (2 * w.shape[-1],))[..., :A]


def model_cdf_packed(mp: jax.Array, A: int, ctx: jax.Array,
                     scale_bits: int) -> jax.Array:
    """model_cdf reading from a packed mirror — identical cdf values."""
    return _rows_to_cdf(_unpack_row(mp[ctx], A) + ALPHA, scale_bits)


def model_cdf_mix_packed(mp: jax.Array, A: int, coarse: jax.Array,
                         ctx: jax.Array, cctx: jax.Array,
                         scale_bits: int, w: int, b: int) -> jax.Array:
    """model_cdf_mix with the fine family read from the packed mirror and
    the (tiny) coarse family from its own small i32 array — identical math
    and values, ~8x cheaper gathers (see pack_freqs). cctx is UNoffset
    (an index into `coarse`), unlike model_cdf_mix's appended-rows form."""
    f = _unpack_row(mp[ctx], A)
    g = coarse[cctx]
    tf = jnp.sum(f, axis=-1, keepdims=True)
    tg = jnp.sum(g, axis=-1, keepdims=True)
    w_eff = floor_div_prod(jnp.int32(w), jnp.int32(b), tf + b)
    rows = f + floor_div_prod(g, w_eff, tg + A) + ALPHA
    return _rows_to_cdf(rows, scale_bits)


def model_cdf_local(freqs: jax.Array, local: jax.Array, ctx: jax.Array,
                    scale_bits: int) -> jax.Array:
    """model_cdf with in-batch local deltas folded in (row-synced adaptation:
    the TPU analog of the reference's per-symbol model updates, rc.h:120-127,
    at read-row granularity). `local` rows are clamped at query time so the
    quantization headroom proof still holds."""
    cap = local_cap(freqs.shape[1], scale_bits)
    rows = freqs[ctx] + jnp.minimum(local[ctx], cap) + ALPHA
    return _rows_to_cdf(rows, scale_bits)


def local_model_update(local: jax.Array, ctx, sym, valid, inc: int = 8):
    """Scatter in-batch (ctx, sym) deltas (same learning rate as the global
    model_update; no rescale — deltas are clamped at query time)."""
    n_ctx = local.shape[0]
    c = jnp.where(valid.reshape(-1), ctx.reshape(-1), n_ctx)
    return local.at[c, sym.reshape(-1)].add(inc, mode="drop")


def cdf_encode_lookup(cdf: jax.Array, sym: jax.Array):
    """(freq, cum) of known symbols. cdf: [..., A+1], sym: [...] int32.
    Masked reductions over the narrow cdf axis instead of take_along_axis:
    take_along lowers to per-element gathers (~12 ns/event on the engine),
    a large fixed cost on [R, L]-wide encode grids and on the decode scan's
    critical path; compare/select sweeps over A+1 columns are VPU-cheap."""
    A1 = cdf.shape[-1]
    cols = jnp.arange(A1)
    s = sym[..., None]
    lo = jnp.sum(jnp.where(cols == s, cdf, 0), axis=-1)
    hi = jnp.sum(jnp.where(cols == s + 1, cdf, 0), axis=-1)
    return hi - lo, lo


def model_update(freqs: jax.Array, ctx: jax.Array, sym: jax.Array,
                 valid: jax.Array, inc: int = 8) -> jax.Array:
    """Scatter-add `inc` per (ctx, sym) occurrence, then rescale rows whose
    smoothed total would exceed 2^RAW_CAP_BITS (deterministic halving — the
    analog of CSimpleModel::rescale, rc.h:28-39)."""
    n_ctx, n_sym = freqs.shape
    c = jnp.where(valid, ctx.reshape(-1), n_ctx)
    s = sym.reshape(-1)
    freqs = freqs.at[c, s].add(inc, mode="drop")

    total = jnp.sum(freqs, axis=1) + n_sym * ALPHA
    # smallest k with total >> k <= 2^RAW_CAP_BITS: floor(log2) via the f32
    # exponent gives k up to one short; one compare fixes the boundary.
    # (Replaces a 24-wide compare sweep — measured slow on the VPU.)
    expo = (jax.lax.bitcast_convert_type(
        jnp.maximum(total, 1).astype(jnp.float32), jnp.int32) >> 23) - 127
    nshift = jnp.maximum(expo - RAW_CAP_BITS, 0)
    nshift = nshift + ((total >> nshift) > (1 << RAW_CAP_BITS)).astype(jnp.int32)
    return freqs >> nshift[:, None]
