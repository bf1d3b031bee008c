"""QUALITY stream codec.

Equivalent of the reference CQualityCompressor
(/root/reference/fqs/quality.{h,cpp}): per-mode quantization maps
(quality.cpp:74-149 — lossless 96 symbols, Illumina 8-bin, 4-bin, binary at
threshold qt, none = reconstruct constant 33+qt) and a context of recent
quantized symbols (quality.cpp:203-215). TPU deltas: the context->model hash
map (CContextHM) becomes a dense [n_ctx, n_sym] frequency array indexed by a
packed (history, position-bucket) register; adaptation is batch-frozen
(see DESIGN.md); encode is one vectorized pass, decode a wide lane scan.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import models, rans
from . import common

POS_BITS = 4

# mode -> (n_sym, bits_per_hist_sym, n_hist_syms)
_MODE_GEOM = {
    "lossless": (96, 7, 2),
    "illumina_8": (8, 3, 5),
    "illumina_4": (4, 2, 7),
    "binary": (2, 1, 10),
}


def qual_maps(mode: str, qt: int):
    """(fwd [96] -> symbol, rev [n_sym] -> quality value) numpy LUTs.
    Bin boundaries and representatives match quality.cpp:84-149."""
    fwd = np.zeros(96, np.int32)
    if mode == "lossless":
        fwd = np.arange(96, dtype=np.int32)
        rev = np.arange(96, dtype=np.int32)
    elif mode == "illumina_8":
        bounds = [(0, 2, 0), (2, 10, 6), (10, 20, 15), (20, 25, 22),
                  (25, 30, 27), (30, 35, 33), (35, 40, 37), (40, 96, 40)]
        rev = np.zeros(8, np.int32)
        for s, (a, b, r) in enumerate(bounds):
            fwd[a:b] = s
            rev[s] = r
    elif mode == "illumina_4":
        bounds = [(0, 2, 0), (2, 15, 12), (15, 31, 23), (31, 96, 37)]
        rev = np.zeros(4, np.int32)
        for s, (a, b, r) in enumerate(bounds):
            fwd[a:b] = s
            rev[s] = r
    elif mode == "binary":
        fwd[:qt] = 0
        fwd[qt:] = 1
        rev = np.array([0, qt], np.int32)
    else:
        raise ValueError(mode)
    return fwd, rev


@dataclasses.dataclass(frozen=True)
class QualConfig:
    mode: str = "illumina_8"
    qt: int = 20
    scale_bits: int = 14
    n_lanes: int = 1024
    # row-synced in-batch model deltas (see streams/dna.py): the quality
    # model adapts within the batch at read-row granularity. Measured
    # ~neutral on the standard corpus; off by default (see params.py).
    with_local: bool = False
    local_inc: int = 8

    @property
    def n_sym(self) -> int:
        return _MODE_GEOM[self.mode][0]

    @property
    def hist_bits(self) -> int:
        return _MODE_GEOM[self.mode][1]

    @property
    def n_hist(self) -> int:
        return _MODE_GEOM[self.mode][2]

    @property
    def hist_mask(self) -> int:
        return (1 << (self.hist_bits * self.n_hist)) - 1

    @property
    def n_ctx(self) -> int:
        return 1 << (self.hist_bits * self.n_hist + POS_BITS)


def qual_state_create(cfg: QualConfig) -> jax.Array:
    return models.model_create(cfg.n_ctx, cfg.n_sym)


def _pos_bucket(i):
    """4-bit quality position bucket: fine early, coarse later."""
    return jnp.minimum(jnp.where(i < 8, i, 8 + (i - 8) // 24), 15)


def qual_ctx_plane(cfg: QualConfig, qsyms: jax.Array):
    """Packed (history, position-bucket) context of every position — fully
    precomputable (the history never crosses a read boundary)."""
    L = qsyms.shape[1]
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    b = cfg.hist_bits
    h = jnp.zeros_like(qsyms)
    for d in range(cfg.n_hist, 0, -1):
        prev = jnp.roll(qsyms, d, axis=1)
        prev = jnp.where(pos - d >= 0, prev, (1 << b) - 1)
        h = ((h << b) | prev)
    hist = h & cfg.hist_mask
    ctx = hist | (_pos_bucket(pos) << (b * cfg.n_hist))
    return jnp.broadcast_to(ctx, qsyms.shape)


def qual_modeling(cfg: QualConfig, model: jax.Array, qsyms: jax.Array,
                  lengths: jax.Array):
    """qsyms: [R, L] int32 quantized symbols. Returns (ctx, f, c, active).

    With cfg.with_local, a short scan over read rows folds in-batch model
    deltas into each row's probabilities (row rd sees the (ctx, sym) events
    of rows < rd) — the decoder replays the identical order."""
    R, L = qsyms.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    active = pos < lengths[:, None]
    ctx = qual_ctx_plane(cfg, qsyms)

    if not cfg.with_local:
        cdf = models.model_cdf(model, ctx, cfg.scale_bits)
        f, c = models.cdf_encode_lookup(cdf, qsyms)
        f = jnp.where(active, f, 1 << cfg.scale_bits)
        c = jnp.where(active, c, 0)
        return ctx, f, c, active

    rb = lambda x: common.to_row_blocks(x, cfg.n_lanes)

    def row_step(lm, x):
        ctx_r, sym_r, act_r = x
        cdf = models.model_cdf_local(model, lm, ctx_r, cfg.scale_bits)
        f, c = models.cdf_encode_lookup(cdf, sym_r)
        f = jnp.where(act_r, f, 1 << cfg.scale_bits)
        c = jnp.where(act_r, c, 0)
        lm = models.local_model_update(lm, ctx_r, sym_r, act_r,
                                       inc=cfg.local_inc)
        return lm, (f, c)

    lm0 = jnp.zeros((cfg.n_ctx, cfg.n_sym), jnp.int32)
    _, (f_b, c_b) = jax.lax.scan(row_step, lm0,
                                 (rb(ctx), rb(qsyms), rb(active)))
    return (ctx, common.from_row_blocks(f_b), common.from_row_blocks(c_b),
            active)


def qual_encode_batch(cfg: QualConfig, model: jax.Array, qsyms: jax.Array,
                      lengths: jax.Array):
    ctx, f, c, active = qual_modeling(cfg, model, qsyms, lengths)
    fg = common.to_grid(f, cfg.n_lanes)
    cg = common.to_grid(c, cfg.n_lanes)
    words, n_words, states = rans.rans_encode(fg, cg, cfg.scale_bits)
    new_model = models.model_update(
        model, ctx.reshape(-1), qsyms.reshape(-1), active.reshape(-1))
    return words, n_words, states, new_model


def qual_decode_batch(cfg: QualConfig, model: jax.Array, lengths: jax.Array,
                      words: jax.Array, init_states: jax.Array, L: int):
    """Returns (qsyms [R, L], new_model, final_states, n_words).

    Nested scans: outer over read rows, inner over positions. The in-batch
    local model deltas are frozen during a row and applied vectorized at the
    row boundary — replaying qual_modeling's row scan exactly."""
    N = cfg.n_lanes
    R = lengths.shape[0]
    r_pl = R // N
    lengths_grid = common.to_read_grid(lengths, N)     # [N, r_pl]
    sb = cfg.scale_bits
    b = cfg.hist_bits
    pos_row = jnp.arange(L, dtype=jnp.int32)[None, :]

    def outer(carry, rd):
        x, ptr, lm = carry
        length = jax.lax.dynamic_index_in_dim(lengths_grid, rd, axis=1,
                                              keepdims=False)

        def inner(c2, i):
            x, ptr, hist = c2
            active = i < length
            ctx = hist | (_pos_bucket(jnp.full_like(hist, i))
                          << (b * cfg.n_hist))
            if cfg.with_local:
                cdf = models.model_cdf_local(model, lm, ctx, sb)
            else:
                cdf = models.model_cdf(model, ctx, sb)
            slot = rans.rans_decode_slots(x, sb)
            sym, f, c = rans.cdf_lookup(cdf, slot)
            f = jnp.where(active, f, 1 << sb)
            c = jnp.where(active, c, 0)
            x, ptr = rans.rans_decode_advance(x, ptr, words, f, c, sb)
            sym = jnp.where(active, sym, 0)
            hist = ((hist << b) | sym) & cfg.hist_mask
            return (x, ptr, hist), (sym, ctx)

        hist0 = jnp.full((N,), cfg.hist_mask, jnp.int32)
        from .dna import DECODE_UNROLL
        (x, ptr, _), (sym_y, ctx_y) = jax.lax.scan(
            inner, (x, ptr, hist0), jnp.arange(L, dtype=jnp.int32),
            unroll=min(DECODE_UNROLL, L))
        sym_r, ctx_r = sym_y.T, ctx_y.T            # [N, L]
        if cfg.with_local:
            act_r = pos_row < length[:, None]
            lm = models.local_model_update(lm, ctx_r, sym_r, act_r,
                                           inc=cfg.local_inc)
        return (x, ptr, lm), (sym_r, ctx_r)

    lm0 = jnp.zeros((cfg.n_ctx, cfg.n_sym) if cfg.with_local else (1, 1),
                    jnp.int32)
    (x, ptr, _), (sym_b, ctx_b) = jax.lax.scan(
        outer, (init_states, jnp.int32(0), lm0),
        jnp.arange(r_pl, dtype=jnp.int32))
    qsyms = common.from_row_blocks(sym_b)
    ctx = common.from_row_blocks(ctx_b)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    active = pos < lengths[:, None]
    new_model = models.model_update(
        model, ctx.reshape(-1), qsyms.reshape(-1), active.reshape(-1))
    return qsyms, new_model, x, ptr
