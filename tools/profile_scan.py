"""Attribute the DNA decode scan's per-step cost: time dna_decode_batch under
config variants (no-coarse, no-local, no-ramp, unroll 1/2/4/8) plus synthetic
stripped scans, on the standard bench archive's big batch.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fqsqueezer_tpu.params import Params
from fqsqueezer_tpu import pipeline, archive
from fqsqueezer_tpu.streams import dna
from fqsqueezer_tpu.ops import models as M, rans, tables

ARCHIVE = "/tmp/fqtz_bench.fqst"
REPS = 5


def timeit(label, fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0] if leaf.ndim else leaf)

    def run(reps):
        t0 = time.time()
        o = None
        for _ in range(reps):
            o = fn(*args)
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(leaf.reshape(-1)[0] if leaf.ndim else leaf)
        return time.time() - t0

    t1 = run(1)
    tR = run(REPS)
    per = (tR - t1) / (REPS - 1)
    print(f"{label:40s} {per * 1e3:8.1f} ms", flush=True)
    return per


def main():
    reader = archive.ArchiveReader(ARCHIVE)
    p = Params.load_params(reader.header_blob, base=Params())
    dcfg, qcfg, mcfg, icfg = pipeline.make_configs(p)
    state = pipeline.state_create(dcfg, qcfg, icfg)
    rec = reader.read_group(p.n_lanes)
    gstates, batches, _ = rec
    reader.close()

    # use the 2nd batch's dna stream on a fresh-but-one-batch state: decoded
    # output will be garbage for variant configs — only TIME matters here
    take, L, streams = batches[min(2, len(batches) - 1)]
    padded = 4096
    cap = padded * max(L, 2)
    d_words = np.zeros((cap,), np.uint32)
    w = streams[1][0]
    d_words[:w.shape[0]] = w
    d_words = jnp.asarray(d_words)
    d_st = jnp.asarray(gstates[1])
    lengths = jnp.full((padded,), 100, jnp.int32)

    @partial(jax.jit, static_argnums=(0, 2))
    def j_scan(cfg, dstate, L, lengths, words, st):
        return dna.dna_decode_batch(cfg, dstate, lengths, words, st, L,
                                    apply_update=False)

    def st_for(cfg):
        return dna.dna_state_create(cfg)

    variants = [
        ("baseline (canon,local,mix,ramp,u2)", dcfg),
        ("mix_w=0", dna.DnaConfig(**{**dcfg.__dict__, "mix_w": 0})),
        ("local_cells=0", dna.DnaConfig(**{**dcfg.__dict__,
                                           "local_log2_cells": 0})),
        ("prefix_ramp off", dna.DnaConfig(**{**dcfg.__dict__,
                                             "prefix_ramp": False})),
        ("canon=0 (2-strand tables)", dna.DnaConfig(
            **{**dcfg.__dict__, "canon": False})),
        ("local0 + mix0", dna.DnaConfig(**{**dcfg.__dict__, "mix_w": 0,
                                           "local_log2_cells": 0})),
    ]
    for label, cfg in variants:
        timeit(label, j_scan, cfg, st_for(cfg), L, lengths, d_words, d_st)

    for u in (1, 2, 4, 8):
        dna.DECODE_UNROLL = u
        timeit(f"baseline unroll={u}", j_scan,
               dna.DnaConfig(**{**dcfg.__dict__, "repair_iters": u}),  # new cfg => recompile
               st_for(dcfg), L, lengths, d_words, d_st)
    dna.DECODE_UNROLL = 2

    # synthetic: quality-like minimal scan (model gather + cdf + rans) at the
    # same step count, to bound the irreducible per-step cost
    model = jnp.zeros((1 << 20, 5), jnp.int32)
    N = p.n_lanes
    r_pl = padded // N

    @jax.jit
    def j_min(model, words, st):
        def outer(carry, rd):
            x, ptr = carry

            def inner(c2, i):
                x, ptr, h = c2
                cdf = M.model_cdf(model, h, p.scale_bits)
                slot = rans.rans_decode_slots(x, p.scale_bits)
                sym, f, c = rans.cdf_lookup(cdf, slot)
                x, ptr = rans.rans_decode_advance(x, ptr, words, f, c,
                                                  p.scale_bits)
                h = (h * 31 + sym) & ((1 << 20) - 1)
                return (x, ptr, h), sym

            (x, ptr, _), syms = jax.lax.scan(
                inner, (x, ptr, jnp.zeros((N,), jnp.int32)),
                jnp.arange(L, dtype=jnp.int32), unroll=2)
            return (x, ptr), syms

        (x, ptr), _ = jax.lax.scan(outer, (st, jnp.int32(0)),
                                   jnp.arange(r_pl, dtype=jnp.int32))
        return x

    timeit("synthetic minimal scan (1 gather)", j_min, model, d_words, d_st)

    # synthetic: + 3 table row gathers per step (siv + 2x 10-wide rows)
    siv = jnp.zeros((4 ** 13,), jnp.uint32)
    tc = jnp.zeros((1 << 20, 10), jnp.uint32)

    @jax.jit
    def j_min3(model, siv, tc, words, st):
        def outer(carry, rd):
            x, ptr = carry

            def inner(c2, i):
                x, ptr, h = c2
                c4 = tables.unpack_counts(siv[h & (4 ** 13 - 1)])
                rs = tc[h & ((1 << 20) - 1)]
                rb = tc[(h * 7) & ((1 << 20) - 1)]
                extra = (jnp.sum(rs, axis=-1) + jnp.sum(rb, axis=-1)
                         ).astype(jnp.int32) + jnp.sum(c4, axis=-1)
                cdf = M.model_cdf(model, h, p.scale_bits)
                slot = rans.rans_decode_slots(x, p.scale_bits)
                sym, f, c = rans.cdf_lookup(cdf, slot)
                x, ptr = rans.rans_decode_advance(x, ptr, words, f, c,
                                                  p.scale_bits)
                h = (h * 31 + sym + extra * 0) & ((1 << 20) - 1)
                return (x, ptr, h), sym

            (x, ptr, _), syms = jax.lax.scan(
                inner, (x, ptr, jnp.zeros((N,), jnp.int32)),
                jnp.arange(L, dtype=jnp.int32), unroll=2)
            return (x, ptr), syms

        (x, ptr), _ = jax.lax.scan(outer, (st, jnp.int32(0)),
                                   jnp.arange(r_pl, dtype=jnp.int32))
        return x

    timeit("synthetic + 3 table gathers", j_min3, model, siv, tc, d_words,
           d_st)


if __name__ == "__main__":
    main()
