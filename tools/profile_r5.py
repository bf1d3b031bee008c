"""Round-5 dissection of the DNA decode-scan body: time each component in a
scan of the SAME shape as the real inner loop (n_rows x L steps at N lanes),
so per-component cost includes its real fusion-boundary/layout behavior.

Sync methodology per profile_r4.py: enqueue REPS chained calls, pull one
scalar; per-call = (t(R) - t(1)) / (R - 1).
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

from fqsqueezer_tpu.ops import models as M, rans, tables, kmers
from fqsqueezer_tpu.streams import dna

N = 2048
L = 104
N_ROWS = 2
REPS = 5
SB = 14


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
    print(f"{label:44s} {per * 1e3:8.2f} ms", flush=True)
    return per


def scan_over(body):
    """Wrap `body(carry_extra, i) -> carry_extra` into the standard
    n_rows x L double scan carrying [N] uint32 regs; returns a jitted fn of
    the body's captured arrays via closure args."""

    @jax.jit
    def run(seed):
        def outer(carry, rd):
            def inner(c2, i):
                return body(c2, i), ()

            c2, _ = jax.lax.scan(inner, carry, jnp.arange(L, dtype=jnp.int32),
                                 unroll=2)
            return c2, ()

        c, _ = jax.lax.scan(outer, seed, jnp.arange(N_ROWS, dtype=jnp.int32))
        return c

    return run


def main():
    key = jax.random.PRNGKey(0)
    regs0 = jax.random.randint(key, (N,), 0, 1 << 30).astype(jnp.uint32)

    # --- baseline: carry-only (bounds the loop tax) ---
    def b_carry(c, i):
        (r,) = c
        return (r * jnp.uint32(1664525) + jnp.uint32(1013904223),)

    timeit("carry-only scan", scan_over(b_carry), (regs0,))

    # --- jnp.sort on [N,4] ---
    def b_sort(c, i):
        (r,) = c
        counts = jnp.stack([(r >> s) & 0xFF for s in (0, 8, 16, 24)],
                           axis=-1).astype(jnp.int32)
        cs = jnp.sort(counts, axis=-1)[..., ::-1]
        r = r + cs[:, 0].astype(jnp.uint32)
        return (r,)

    timeit("jnp.sort [N,4] desc", scan_over(b_sort), (regs0,))

    # --- comparator network sort of 4 [N] vectors ---
    def b_sortnet(c, i):
        (r,) = c
        a, b_, cc, d = [((r >> s) & 0xFF).astype(jnp.int32)
                        for s in (0, 8, 16, 24)]
        lo1, hi1 = jnp.minimum(a, b_), jnp.maximum(a, b_)
        lo2, hi2 = jnp.minimum(cc, d), jnp.maximum(cc, d)
        s3, s0 = jnp.maximum(hi1, hi2), jnp.minimum(lo1, lo2)
        m1, m2 = jnp.minimum(hi1, hi2), jnp.maximum(lo1, lo2)
        s2, s1 = jnp.maximum(m1, m2), jnp.minimum(m1, m2)
        r = r + (s3 + s2 - s1 - s0).astype(jnp.uint32)
        return (r,)

    timeit("sort network (4x [N])", scan_over(b_sortnet), (regs0,))

    # --- _rank_all style [N,4,4] ---
    def b_rank(c, i):
        (r,) = c
        counts = jnp.stack([(r >> s) & 0xFF for s in (0, 8, 16, 24)],
                           axis=-1).astype(jnp.int32)
        ranks = dna._rank_all(counts)
        r = r + ranks[:, 0].astype(jnp.uint32)
        return (r,)

    timeit("_rank_all [N,4,4]", scan_over(b_rank), (regs0,))

    # --- rank + base_of_rank ---
    def b_rank2(c, i):
        (r,) = c
        counts = jnp.stack([(r >> s) & 0xFF for s in (0, 8, 16, 24)],
                           axis=-1).astype(jnp.int32)
        sym = (r & 3).astype(jnp.int32)
        b = dna._base_of_rank(counts, sym)
        r = r + b.astype(jnp.uint32)
        return (r,)

    timeit("_base_of_rank", scan_over(b_rank2), (regs0,))

    # --- canon_query x2 ---
    def b_canon(c, i):
        slo, shi, blo, bhi, rs1, rs2, rb1, rb2 = c
        s_q = dna._canon_query(slo, shi, rs1, rs2, 15, 21)
        b_q = dna._canon_query(blo, bhi, rb1, rb2, 26, 21)
        slo = slo + s_q[1][:, 0] + b_q[1][:, 0]
        return (slo, shi, blo, bhi, rs1, rs2, rb1, rb2)

    timeit("canon_query x2", scan_over(b_canon), (regs0,) * 8)

    # --- ktable_find x2 on real-size tables ---
    tc = jnp.zeros((1 << 21, tables.KW), jnp.uint32)
    tc2 = jnp.zeros((1 << 21, tables.KW), jnp.uint32)

    def b_kfind(c, i):
        (r,) = c
        bkt = (r & jnp.uint32((1 << 21) - 1)).astype(jnp.int32)
        tags4 = (r[:, None] | jnp.arange(4, dtype=jnp.uint32)[None, :])
        c1, f1 = tables.ktable_find(tc, bkt, tags4, 21)
        c2, f2 = tables.ktable_find(tc2, bkt, tags4, 21)
        r = r + c1[:, 0].astype(jnp.uint32) + c2[:, 0].astype(jnp.uint32)
        return (r,)

    timeit("ktable_find x2 (gather+match)", scan_over(b_kfind), (regs0,))

    # --- siv gather + unpack ---
    siv = jnp.zeros((4 ** 12,), jnp.uint32)

    def b_siv(c, i):
        (r,) = c
        cp = tables.siv_find(siv, (r & jnp.uint32(4 ** 12 - 1)).astype(jnp.int32))
        r = r + cp[:, 0].astype(jnp.uint32)
        return (r,)

    timeit("siv_find", scan_over(b_siv), (regs0,))

    # --- model_cdf vs model_cdf_mix (real-size model) ---
    n_model = dna.N_MODEL_CTX + dna.N_COARSE_CTX
    model = jnp.zeros((n_model, 5), jnp.int32)

    def b_cdf(c, i):
        (r,) = c
        ctx = (r & jnp.uint32((1 << 20) - 1)).astype(jnp.int32)
        cdf = M.model_cdf(model, ctx, SB)
        r = r + cdf[:, 1].astype(jnp.uint32)
        return (r,)

    timeit("model_cdf (1 gather + cdf)", scan_over(b_cdf), (regs0,))

    def b_cdfmix(c, i):
        (r,) = c
        ctx = (r & jnp.uint32((1 << 20) - 1)).astype(jnp.int32)
        cctx = dna.N_MODEL_CTX + (r & jnp.uint32((1 << 9) - 1)).astype(jnp.int32)
        cdf = M.model_cdf_mix(model, ctx, cctx, SB, 24, 64)
        r = r + cdf[:, 1].astype(jnp.uint32)
        return (r,)

    timeit("model_cdf_mix (2 gathers + mix)", scan_over(b_cdfmix), (regs0,))

    # --- cdf_lookup + rans advance ---
    words = jnp.zeros((N * L,), jnp.uint32)

    def b_rans(c, i):
        r, ptr = c
        cdf = jnp.concatenate(
            [jnp.zeros((N, 1), jnp.int32),
             jnp.broadcast_to(
                 jnp.array([100, 200, 300, 400, 1 << SB], jnp.int32)[None, :],
                 (N, 5))], axis=1)
        slot = rans.rans_decode_slots(r, SB)
        sym, f, cc = rans.cdf_lookup(cdf, slot)
        x, ptr = rans.rans_decode_advance(r, ptr, words, f, cc, SB)
        return (x, ptr)

    timeit("cdf_lookup + rans_advance", scan_over(b_rans),
           (regs0, jnp.int32(0)))

    # --- repair trigger + best base ---
    def b_repair(c, i):
        (r,) = c
        counts = jnp.stack([(r >> s) & 0xFF for s in (0, 8, 16, 24)],
                           axis=-1).astype(jnp.int32)
        level = (r & 7).astype(jnp.int32)
        base = ((r >> 3) & 3).astype(jnp.int32)
        trig, best = dna._repair_trigger(counts, level, base)
        r = r + best.astype(jnp.uint32) + trig.astype(jnp.uint32)
        return (r,)

    timeit("_repair_trigger + _best_base", scan_over(b_repair), (regs0,))

    # --- _code_ctx (sort + quants + packing) ---
    def b_codectx(c, i):
        (r,) = c
        counts = jnp.stack([(r >> s) & 0xFF for s in (0, 8, 16, 24)],
                           axis=-1).astype(jnp.int32)
        level = (r & 7).astype(jnp.int32)
        pb = ((r >> 3) & 15).astype(jnp.int32)
        nz = ((r >> 7) & 15).astype(jnp.int32)
        prevc = ((r >> 11) & 3).astype(jnp.int32)
        ctx = dna._code_ctx(level, counts, pb, nz, prevc)
        r = r + ctx.astype(jnp.uint32)
        return (r,)

    timeit("_code_ctx (sort+quant+pack)", scan_over(b_codectx), (regs0,))

    # --- _cascade_combine ---
    def b_comb(c, i):
        (r,) = c
        counts = jnp.stack([(r >> s) & 0xFF for s in (0, 8, 16, 24)],
                           axis=-1).astype(jnp.int32)
        cp, cs, cb = counts, counts + 1, counts + 2
        fp = (r & 1) > 0
        fs = (r & 2) > 0
        fb = (r & 4) > 0
        cc, lv = dna._cascade_combine(cp, cs, cb, fp, fs, fb)
        r = r + cc[:, 0].astype(jnp.uint32) + lv.astype(jnp.uint32)
        return (r,)

    timeit("_cascade_combine", scan_over(b_comb), (regs0,))


if __name__ == "__main__":
    main()
