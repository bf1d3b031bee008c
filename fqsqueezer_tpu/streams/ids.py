"""ID stream codec: columnar byte modeling.

Capability parity with the reference CIdCompressor
(/root/reference/fqs/id.{h,cpp}): lossless ids, instrument mode (keep only
the instrument prefix up to the first '.', ' ' or ':' — extract_instrument,
id.cpp:231-238, reconstruction id.cpp:418-483), none (reconstruct a bare '@'
line, id.cpp:486-492).

TPU-first redesign: instead of the reference's serial token machinery
(literal/numeric tokens, per-token delta models with byte escapes,
id.cpp:257-415) — which is inherently per-read sequential with variable-length
control flow — ids are modeled as a byte MATRIX: symbol = byte at (read,
column), context = (byte at the same column of the previous read, column
bucket). Constant fields predict exactly; incrementing digit columns
concentrate on a few successors; the adaptive model learns both. Encode is
one vectorized pass; decode is a lane scan carrying the previous id row.
Id lengths are coded first (2 byte symbols under 2 reserved contexts), then
bytes — one rANS stream, lengths grid then bytes grid.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import models, rans
from . import common

N_SYM = 256
COL_BUCKETS = 16
# ctx layout: [0, 2) length contexts; [2, 2 + 256*COL_BUCKETS) byte contexts
N_CTX = 2 + N_SYM * COL_BUCKETS


@dataclasses.dataclass(frozen=True)
class IdConfig:
    max_id_len: int = 64          # static column cap (per-file)
    scale_bits: int = 14
    n_lanes: int = 1024


def id_state_create() -> jax.Array:
    return models.model_create(N_CTX, N_SYM)


def ids_to_matrix(ids: list, max_id_len: int):
    """Host: list of bytes -> ([R, max_id_len] uint8, [R] int32 lengths).
    Ids longer than max_id_len are truncated (caller sizes the cap)."""
    R = len(ids)
    mat = np.zeros((R, max_id_len), np.uint8)
    lens = np.zeros((R,), np.int32)
    for i, s in enumerate(ids):
        s = s[:max_id_len]
        lens[i] = len(s)
        mat[i, :len(s)] = np.frombuffer(s, np.uint8)
    return mat, lens


def instrument_prefix(ids: list) -> list:
    """Instrument mode: keep bytes up to the first '.', ' ' or ':'
    (reference extract_instrument, id.cpp:231-238)."""
    out = []
    for s in ids:
        cut = len(s)
        for i, b in enumerate(s):
            if b in (0x2E, 0x20, 0x3A):
                cut = i
                break
        out.append(s[:cut])
    return out


def _byte_ctx(prev_col_bytes, col):
    cb = jnp.minimum(col, COL_BUCKETS - 1)
    return 2 + prev_col_bytes.astype(jnp.int32) * COL_BUCKETS + cb


def id_modeling(cfg: IdConfig, model: jax.Array, mat: jax.Array,
                lens: jax.Array):
    """Returns (ctx [R, 2+M], syms [R, 2+M], f, c, active) — the lengths grid
    concatenated before the bytes grid."""
    R, M = mat.shape
    pos = jnp.arange(M, dtype=jnp.int32)[None, :]
    active_b = pos < lens[:, None]

    len_syms = jnp.stack([lens & 0xFF, (lens >> 8) & 0xFF], axis=-1)
    len_ctx = jnp.broadcast_to(jnp.arange(2, dtype=jnp.int32)[None, :],
                               (R, 2))

    # previous read within the SAME lane (lanes own contiguous read ranges,
    # common.to_grid); the first read of each lane has no predecessor
    r_pl = R // cfg.n_lanes
    first_in_lane = (jnp.arange(R, dtype=jnp.int32) % r_pl) == 0
    prev = jnp.roll(mat, 1, axis=0).at[0].set(0)
    prev_active = jnp.roll(active_b, 1, axis=0).at[0].set(False)
    prev_active = prev_active & ~first_in_lane[:, None]
    prev = jnp.where(prev_active, prev, 0)
    byte_ctx = _byte_ctx(prev, pos)
    byte_syms = mat.astype(jnp.int32)

    ctx = jnp.concatenate([len_ctx, byte_ctx], axis=1)
    syms = jnp.concatenate([len_syms.astype(jnp.int32), byte_syms], axis=1)
    active = jnp.concatenate(
        [jnp.ones((R, 2), bool), active_b], axis=1)

    cdf = models.model_cdf(model, ctx, cfg.scale_bits)
    f, c = models.cdf_encode_lookup(cdf, syms)
    f = jnp.where(active, f, 1 << cfg.scale_bits)
    c = jnp.where(active, c, 0)
    return ctx, syms, f, c, active


def id_encode_batch(cfg: IdConfig, model: jax.Array, mat: jax.Array,
                    lens: jax.Array):
    ctx, syms, f, c, active = id_modeling(cfg, model, mat, lens)
    fg = common.to_grid(f, cfg.n_lanes)
    cg = common.to_grid(c, cfg.n_lanes)
    words, n_words, states = rans.rans_encode(fg, cg, cfg.scale_bits)
    new_model = models.model_update(
        model, ctx.reshape(-1), syms.reshape(-1), active.reshape(-1))
    return words, n_words, states, new_model


def id_decode_batch(cfg: IdConfig, model: jax.Array, R: int,
                    words: jax.Array, init_states: jax.Array):
    """Returns (mat [R, M] uint8, lens [R], new_model, final_states, ptr).

    Note: the (2+M)-symbol rows form one grid, so a lane's scan interleaves
    lengths and bytes per read in the same order the encoder laid out.
    """
    N = cfg.n_lanes
    M = cfg.max_id_len
    r_pl = R // N
    W = 2 + M
    sb = cfg.scale_bits
    len_cdf0 = models.model_cdf(model, jnp.zeros((N,), jnp.int32), sb)
    len_cdf1 = models.model_cdf(model, jnp.ones((N,), jnp.int32), sb)

    def step(carry, t):
        x, ptr, prev_row, cur_row, cur_len = carry
        i = t % W  # 0,1 = length symbols; 2.. = byte columns
        col = i - 2

        is_len0 = i == 0
        is_len1 = i == 1
        # roll rows at the start of each read
        prev_row = jax.lax.cond(is_len0, lambda: cur_row, lambda: prev_row)
        cur_row = jax.lax.cond(is_len0, lambda: jnp.zeros_like(cur_row),
                               lambda: cur_row)

        prev_col = jax.lax.cond(
            i >= 2,
            lambda: jax.lax.dynamic_index_in_dim(
                prev_row, jnp.maximum(col, 0), axis=1, keepdims=False),
            lambda: jnp.zeros((N,), jnp.int32))
        byte_ctx = _byte_ctx(prev_col, jnp.maximum(col, 0))
        cdf = jax.lax.cond(
            is_len0, lambda: len_cdf0,
            lambda: jax.lax.cond(
                is_len1, lambda: len_cdf1,
                lambda: models.model_cdf(model, byte_ctx, sb)))

        active = jnp.where(i < 2, jnp.ones((N,), bool), col < cur_len)
        slot = rans.rans_decode_slots(x, sb)
        sym, f, c = rans.cdf_lookup(cdf, slot)
        f = jnp.where(active, f, 1 << sb)
        c = jnp.where(active, c, 0)
        x, ptr = rans.rans_decode_advance(x, ptr, words, f, c, sb)
        sym = jnp.where(active, sym, 0)

        cur_len = jax.lax.cond(
            is_len0, lambda: sym,
            lambda: jax.lax.cond(
                is_len1, lambda: jnp.minimum(cur_len | (sym << 8), M),
                lambda: cur_len))
        cur_row = jax.lax.cond(
            i >= 2,
            lambda: jax.lax.dynamic_update_index_in_dim(
                cur_row, jnp.where(active, sym, 0), jnp.maximum(col, 0),
                axis=1),
            lambda: cur_row)
        return (x, ptr, prev_row, cur_row, cur_len), sym

    zeros_row = jnp.zeros((N, M), jnp.int32)
    carry0 = (init_states, jnp.int32(0), zeros_row, zeros_row,
              jnp.zeros((N,), jnp.int32))
    (x, ptr, _, _, _), ys = jax.lax.scan(
        step, carry0, jnp.arange(r_pl * W, dtype=jnp.int32))
    grid = common.from_grid(ys, N, W)                  # [R, 2+M]
    lens = grid[:, 0] | (grid[:, 1] << 8)
    lens = jnp.minimum(lens, M)
    mat = grid[:, 2:].astype(jnp.uint8)
    ctx, syms, _, _, active = id_modeling(cfg, model, mat, lens)
    new_model = models.model_update(
        model, ctx.reshape(-1), syms.reshape(-1), active.reshape(-1))
    return mat, lens, new_model, x, ptr
