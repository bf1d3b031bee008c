"""META stream: read lengths (+ sorted-mode shared-prefix lengths).

Equivalent of the reference CMetaCompressor (/root/reference/fqs/meta.cpp:48-131),
which codes a length as one adaptive 256-symbol model with 2/3-byte escapes.
Here every read length (< 2^16) is two byte symbols (lo, hi) under two
adaptive contexts; constant-length files converge to ~0.1 bit/read. Padded
(zero-length) reads are coded explicitly so the decoder is self-describing.

In sorted mode a third byte symbol per read carries the LCP (shared-prefix
length vs the previous read in the lane, capped at 255). This replaces the
reference's SIV rank-delta prefix coding (dna.cpp:549-661) — see DESIGN.md;
a full duplicate read is simply lcp == len == prev_len (the reference's
duplicate-check flag, dna.cpp:1722-1732, falls out for free).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import models, rans
from . import common

N_SYM = 256
N_CTX = 3  # 0: len lo byte, 1: len hi byte, 2: lcp byte


@dataclasses.dataclass(frozen=True)
class MetaConfig:
    scale_bits: int = 14
    n_lanes: int = 1024
    with_lcp: bool = False
    lcp_stride: int = 1

    @property
    def n_per_read(self) -> int:
        return 3 if self.with_lcp else 2


def meta_state_create() -> jax.Array:
    return models.model_create(N_CTX, N_SYM)


def compute_lcp(codes: jax.Array, lengths: jax.Array, n_lanes: int,
                stride: int = 1) -> jax.Array:
    """[R] shared-prefix length vs the read `stride` back in the same lane,
    capped at 255; 0 for each lane's first `stride` reads. stride=2 in PE
    mode chains read1->read1 (the reference's read_prev tracks only sorted
    mates, dna.cpp:1722-1732); mate2 rows get lcp 0. Exact byte comparison
    (N distinct from T) so prefix copying is lossless."""
    R, L = codes.shape
    r_pl = R // n_lanes
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    prev = jnp.roll(codes, stride, axis=0)
    prev_len = jnp.roll(lengths, stride)
    idx = jnp.arange(R, dtype=jnp.int32) % r_pl
    first = idx < stride
    eq = (codes == prev) & (pos < lengths[:, None]) & (pos < prev_len[:, None])
    lcp = jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=1), axis=1)
    lcp = jnp.where(first, 0, lcp)
    if stride == 2:
        lcp = jnp.where(idx % 2 == 1, 0, lcp)  # mate2 rows
    return jnp.minimum(lcp, 255).astype(jnp.int32)


def _syms_ctx(cfg: MetaConfig, lengths: jax.Array, lcp: jax.Array | None):
    R = lengths.shape[0]
    cols = [lengths & 0xFF, (lengths >> 8) & 0xFF]
    if cfg.with_lcp:
        cols.append(lcp)
    syms = jnp.stack(cols, axis=-1).astype(jnp.int32)
    ctx = jnp.broadcast_to(
        jnp.arange(cfg.n_per_read, dtype=jnp.int32)[None, :], syms.shape)
    return syms, ctx


def meta_modeling(cfg: MetaConfig, model: jax.Array, lengths: jax.Array,
                  lcp: jax.Array | None = None):
    syms, ctx = _syms_ctx(cfg, lengths, lcp)
    cdf = models.model_cdf(model, ctx, cfg.scale_bits)
    f, c = models.cdf_encode_lookup(cdf, syms)
    return ctx, syms, f, c


def meta_encode_batch(cfg: MetaConfig, model: jax.Array, lengths: jax.Array,
                      lcp: jax.Array | None = None):
    """Returns (words, n_words, decoder_init_states, new_model)."""
    ctx, syms, f, c = meta_modeling(cfg, model, lengths, lcp)
    fg = common.to_grid(f, cfg.n_lanes)
    cg = common.to_grid(c, cfg.n_lanes)
    words, n_words, states = rans.rans_encode(fg, cg, cfg.scale_bits)
    new_model = models.model_update(
        model, ctx.reshape(-1), syms.reshape(-1),
        jnp.ones(ctx.size, dtype=bool))
    return words, n_words, states, new_model


def meta_decode_batch(cfg: MetaConfig, model: jax.Array, R: int,
                      words: jax.Array, init_states: jax.Array):
    """Decode R read (length, [lcp]) tuples. Returns (lengths [R], lcp [R],
    new_model, final_states, n_words_consumed)."""
    N = cfg.n_lanes
    r_pl = R // N
    W = cfg.n_per_read
    sb = cfg.scale_bits
    cdfs = [models.model_cdf(model, jnp.full((N,), k, jnp.int32), sb)
            for k in range(W)]

    def step(carry, t):
        x, ptr = carry
        i = t % W
        cdf = jax.lax.switch(i, [lambda k=k: cdfs[k] for k in range(W)])
        slot = rans.rans_decode_slots(x, sb)
        sym, f, c = rans.cdf_lookup(cdf, slot)
        x, ptr = rans.rans_decode_advance(x, ptr, words, f, c, sb)
        return (x, ptr), sym

    (x, ptr), ys = jax.lax.scan(
        step, (init_states, jnp.int32(0)), jnp.arange(W * r_pl, dtype=jnp.int32))
    syms = common.from_grid(ys, N, W)                  # [R, W]
    lengths = syms[:, 0] | (syms[:, 1] << 8)
    lcp = syms[:, 2] if cfg.with_lcp else jnp.zeros_like(lengths)
    ctx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], syms.shape)
    new_model = models.model_update(
        model, ctx.reshape(-1), syms.reshape(-1), jnp.ones(ctx.size, dtype=bool))
    return lengths, lcp, new_model, x, ptr
