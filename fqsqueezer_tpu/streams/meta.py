"""META stream: read lengths.

Equivalent of the reference CMetaCompressor (/root/reference/fqs/meta.cpp:48-131),
which codes a length as one adaptive 256-symbol model with 2/3-byte escapes.
Here every read length (< 2^16) is two byte symbols (lo, hi) under two
adaptive contexts; constant-length files converge to ~0.1 bit/read. Padded
(zero-length) reads are coded explicitly so the decoder is self-describing.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import models, rans
from . import common

N_SYM = 256
N_CTX = 2


@dataclasses.dataclass(frozen=True)
class MetaConfig:
    scale_bits: int = 14
    n_lanes: int = 1024


def meta_state_create() -> jax.Array:
    return models.model_create(N_CTX, N_SYM)


def _length_syms(lengths: jax.Array) -> jax.Array:
    """[R] -> [R, 2] (lo, hi) byte symbols."""
    lo = lengths & 0xFF
    hi = (lengths >> 8) & 0xFF
    return jnp.stack([lo, hi], axis=-1).astype(jnp.int32)


def meta_modeling(cfg: MetaConfig, model: jax.Array, lengths: jax.Array):
    syms = _length_syms(lengths)                       # [R, 2]
    ctx = jnp.broadcast_to(jnp.arange(2, dtype=jnp.int32)[None, :], syms.shape)
    cdf = models.model_cdf(model, ctx, cfg.scale_bits)
    f, c = models.cdf_encode_lookup(cdf, syms)
    return ctx, syms, f, c


def meta_encode_batch(cfg: MetaConfig, model: jax.Array, lengths: jax.Array):
    """Returns (words, n_words, decoder_init_states, new_model)."""
    ctx, syms, f, c = meta_modeling(cfg, model, lengths)
    fg = common.to_grid(f, cfg.n_lanes)
    cg = common.to_grid(c, cfg.n_lanes)
    words, n_words, states = rans.rans_encode(fg, cg, cfg.scale_bits)
    new_model = models.model_update(
        model, ctx.reshape(-1), syms.reshape(-1),
        jnp.ones(ctx.size, dtype=bool))
    return words, n_words, states, new_model


def meta_decode_batch(cfg: MetaConfig, model: jax.Array, R: int,
                      words: jax.Array, init_states: jax.Array):
    """Decode R read lengths. Returns (lengths [R], new_model, final_states,
    n_words_consumed)."""
    N = cfg.n_lanes
    r_pl = R // N
    sb = cfg.scale_bits
    cdf0 = models.model_cdf(model, jnp.zeros((N,), jnp.int32), sb)
    cdf1 = models.model_cdf(model, jnp.ones((N,), jnp.int32), sb)

    def step(carry, t):
        x, ptr = carry
        cdf = jax.lax.cond(t % 2 == 0, lambda: cdf0, lambda: cdf1)
        slot = rans.rans_decode_slots(x, sb)
        sym, f, c = rans.cdf_lookup(cdf, slot)
        x, ptr = rans.rans_decode_advance(x, ptr, words, f, c, sb)
        return (x, ptr), sym

    (x, ptr), ys = jax.lax.scan(
        step, (init_states, jnp.int32(0)), jnp.arange(2 * r_pl, dtype=jnp.int32))
    syms = common.from_grid(ys, N, 2)                  # [R, 2]
    lengths = syms[:, 0] | (syms[:, 1] << 8)
    ctx = jnp.broadcast_to(jnp.arange(2, dtype=jnp.int32)[None, :], syms.shape)
    new_model = models.model_update(
        model, ctx.reshape(-1), syms.reshape(-1), jnp.ones(ctx.size, dtype=bool))
    return lengths, new_model, x, ptr
