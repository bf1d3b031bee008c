"""Ablation profile of the REAL dna_decode_batch: monkeypatch individual body
components to cheap stubs (timing-only; decoded output becomes garbage) and
measure the delta vs the unmodified scan. Finds where the unaccounted time
lives (components measured standalone sum to ~30 ms; the scan costs ~85)."""
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
    print(f"{label:44s} {per * 1e3:8.1f} ms", flush=True)
    return per


def main():
    reader = archive.ArchiveReader(ARCHIVE)
    p = Params.load_params(reader.header_blob, base=Params())
    dcfg, qcfg, mcfg, icfg = pipeline.make_configs(p)
    state = pipeline.state_create(dcfg, qcfg, icfg)
    gstates, batches, _ = reader.read_group(p.n_lanes)
    reader.close()
    take, L, streams = batches[min(2, len(batches) - 1)]
    padded = 4096
    cap = padded * max(L, 2)
    d_words = np.zeros((cap,), np.uint32)
    w = streams[1][0]
    d_words[:w.shape[0]] = w
    d_words = jnp.asarray(d_words)
    d_st = jnp.asarray(gstates[1])
    lengths = jnp.full((padded,), 100, jnp.int32)

    def run_scan(tag):
        @partial(jax.jit, static_argnums=(0, 2))
        def j_scan(cfg, dstate, L, lengths, words, st):
            return dna.dna_decode_batch(cfg, dstate, lengths, words, st, L,
                                        apply_update=False)
        # new cfg object per ablation => fresh jit cache entry
        cfg = dna.DnaConfig(**{**dcfg.__dict__})
        return timeit(tag, j_scan, cfg, dna.dna_state_create(cfg), L,
                      lengths, d_words, d_st)

    base = run_scan("baseline (unmodified)")

    saved = {}

    def patch(name, fn):
        saved[name] = getattr(dna, name)
        setattr(dna, name, fn)

    def restore():
        for k, v in saved.items():
            setattr(dna, k, v)
        saved.clear()

    # 1. _code_ctx -> cheap pack (kills jnp.sort + quants)
    patch("_code_ctx", lambda level, counts, pb, nz, prevc=None:
          (level | (pb << 2) | (nz << 6)
           | ((0 if prevc is None else prevc) << 20)))
    run_scan("no _code_ctx (sort+quant)")
    restore()

    # 2. _base_of_rank + _rank_of-free: identity
    patch("_base_of_rank", lambda counts, r: r)
    run_scan("no _base_of_rank")
    restore()

    # 3. repair off
    patch("_repair_trigger", lambda counts, level, base:
          (jnp.zeros(base.shape, bool), jnp.zeros(base.shape, jnp.int32)))
    run_scan("no _repair_trigger")
    restore()

    # 4. cascade finds -> constants (keeps canon_query + gathers OUT)
    def fake_parts_k(state, pm_ctx, s_q, b_q, vp, vs, vb, be=None,
                     s_log2b=-1, b_log2b=-1):
        z4 = jnp.zeros(vp.shape + (4,), jnp.int32) + 1
        return z4, z4, z4, vp, vs, vb
    patch("_cascade_parts_k", fake_parts_k)
    run_scan("no cascade finds (3 gathers out)")
    restore()

    # 5. canon_query -> cheap keys (gathers stay, hashing out)
    def fake_canon_query(c_lo, c_hi, r_lo, r_hi, k, log2_cells):
        bkt = (c_lo & jnp.uint32((1 << log2_cells) - 1)).astype(jnp.int32)
        tags4 = c_lo[..., None] | jnp.arange(4, dtype=jnp.uint32)
        s = jnp.zeros(c_lo.shape, bool)
        return bkt, tags4, s, c_lo, c_hi, jnp.zeros(c_lo.shape, jnp.int32)
    patch("_canon_query", fake_canon_query)
    run_scan("cheap _canon_query (no canon/hash)")
    restore()

    # 6. ramp -> zeros
    patch("_prefix_ramp_counts_static",
          lambda cfg, be, siv, pfx, q: jnp.zeros(pfx.shape + (4,), jnp.int32))
    run_scan("no ramp range-reads")
    restore()

    # 7. row-boundary table updates -> identity
    patch("_apply_sb_updates", lambda cfg, be, s_tc, b_tc, kc, act:
          (s_tc, b_tc))
    run_scan("no row-boundary sb updates")
    restore()

    # 8. model cdf -> constant
    patch("_dna_cdf", lambda cfg, mv, lm, ctx, sb:
          jnp.broadcast_to(
              jnp.array([0, 100, 200, 300, 400, 1 << sb], jnp.int32)[None, :],
              ctx.shape + (6,)))
    run_scan("no model cdf")
    restore()

    # 9. rans advance -> no words consumption
    def fake_advance(states, ptr, words, freq, cum, sb):
        slot = states & jnp.uint32((1 << sb) - 1)
        x = freq.astype(jnp.uint32) * (states >> sb) + slot - cum.astype(jnp.uint32)
        x = jnp.where(x < rans.RANS_L, (x << 16) | 1, x)
        return x, ptr
    saved_adv = rans.rans_decode_advance
    rans.rans_decode_advance = fake_advance
    run_scan("no words gather (rans advance stub)")
    rans.rans_decode_advance = saved_adv

    # 10. everything cheap at once (floor)
    patch("_code_ctx", lambda level, counts, pb, nz, prevc=None:
          (level | (pb << 2)))
    patch("_base_of_rank", lambda counts, r: r)
    patch("_repair_trigger", lambda counts, level, base:
          (jnp.zeros(base.shape, bool), jnp.zeros(base.shape, jnp.int32)))
    patch("_cascade_parts_k", fake_parts_k)
    patch("_prefix_ramp_counts_static",
          lambda cfg, be, siv, pfx, q: jnp.zeros(pfx.shape + (4,), jnp.int32))
    patch("_apply_sb_updates", lambda cfg, be, s_tc, b_tc, kc, act:
          (s_tc, b_tc))
    run_scan("all of the above stubbed (floor)")
    restore()


if __name__ == "__main__":
    main()
