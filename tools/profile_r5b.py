"""Dissect model_cdf: gather vs cumsum vs floor_div vs alternatives, in the
same scan shape as profile_r5.py."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fqsqueezer_tpu.ops import models as M
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
    print(f"{label:46s} {per * 1e3:8.2f} ms", flush=True)
    return per


def scan_over(body):
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
    n_model = dna.N_MODEL_CTX + dna.N_COARSE_CTX
    model = jnp.zeros((n_model, 5), jnp.int32)
    model8 = jnp.zeros((n_model, 8), jnp.int32)
    CM = jnp.uint32((1 << 20) - 1)

    def b_gather_only(c, i):
        (r,) = c
        ctx = (r & CM).astype(jnp.int32)
        f = model[ctx]
        r = r + f[:, 0].astype(jnp.uint32) + f[:, 4].astype(jnp.uint32)
        return (r,)

    timeit("row gather only [.,5]", scan_over(b_gather_only), (regs0,))

    def b_gather8(c, i):
        (r,) = c
        ctx = (r & CM).astype(jnp.int32)
        f = model8[ctx]
        r = r + f[:, 0].astype(jnp.uint32) + f[:, 4].astype(jnp.uint32)
        return (r,)

    timeit("row gather only [.,8]", scan_over(b_gather8), (regs0,))

    def b_gather_sum(c, i):
        (r,) = c
        ctx = (r & CM).astype(jnp.int32)
        f = model[ctx] + 1
        tot = jnp.sum(f, axis=-1)
        r = r + tot.astype(jnp.uint32)
        return (r,)

    timeit("gather + row sum", scan_over(b_gather_sum), (regs0,))

    def b_gather_cumsum(c, i):
        (r,) = c
        ctx = (r & CM).astype(jnp.int32)
        f = model[ctx] + 1
        cum = jnp.cumsum(f, axis=-1)
        r = r + cum[:, 4].astype(jnp.uint32) + cum[:, 0].astype(jnp.uint32)
        return (r,)

    timeit("gather + cumsum(axis=-1)", scan_over(b_gather_cumsum), (regs0,))

    def b_full_cdf(c, i):
        (r,) = c
        ctx = (r & CM).astype(jnp.int32)
        cdf = M.model_cdf(model, ctx, SB)
        r = r + cdf[:, 1].astype(jnp.uint32)
        return (r,)

    timeit("model_cdf (full)", scan_over(b_full_cdf), (regs0,))

    # manual cdf: unrolled column adds, no cumsum/concat
    def b_manual_cdf(c, i):
        (r,) = c
        ctx = (r & CM).astype(jnp.int32)
        f = model[ctx] + 1
        f0, f1, f2, f3, f4 = (f[:, j] for j in range(5))
        c1 = f0
        c2 = c1 + f1
        c3 = c2 + f2
        c4 = c3 + f3
        tot = c4 + f4
        s = jnp.int32(1 << SB)
        q1 = M.floor_div_prod(c1, s, tot)
        q2 = M.floor_div_prod(c2, s, tot)
        q3 = M.floor_div_prod(c3, s, tot)
        q4 = M.floor_div_prod(c4, s, tot)
        r = r + (q1 + q2 + q3 + q4).astype(jnp.uint32)
        return (r,)

    timeit("manual cdf (unrolled cols)", scan_over(b_manual_cdf), (regs0,))

    # gather from a transposed [5, n_ctx] model: 5 flat gathers
    modelT = jnp.zeros((5, n_model), jnp.int32)

    def b_gatherT(c, i):
        (r,) = c
        ctx = (r & CM).astype(jnp.int32)
        cols = [modelT[j][ctx] for j in range(5)]
        r = r + sum(cols).astype(jnp.uint32)
        return (r,)

    timeit("5 flat gathers (transposed model)", scan_over(b_gatherT), (regs0,))

    # PACKED u16x2: model as [n_ctx, 3] u32 (5 u16 counters + pad)
    modelP = jnp.zeros((n_model, 3), jnp.uint32)

    def b_packed(c, i):
        (r,) = c
        ctx = (r & CM).astype(jnp.int32)
        w = modelP[ctx]
        f0 = (w[:, 0] & 0xFFFF).astype(jnp.int32) + 1
        f1 = (w[:, 0] >> 16).astype(jnp.int32) + 1
        f2 = (w[:, 1] & 0xFFFF).astype(jnp.int32) + 1
        f3 = (w[:, 1] >> 16).astype(jnp.int32) + 1
        f4 = (w[:, 2] & 0xFFFF).astype(jnp.int32) + 1
        c1 = f0
        c2 = c1 + f1
        c3 = c2 + f2
        c4 = c3 + f3
        tot = c4 + f4
        s = jnp.int32(1 << SB)
        q1 = M.floor_div_prod(c1, s, tot)
        q2 = M.floor_div_prod(c2, s, tot)
        q3 = M.floor_div_prod(c3, s, tot)
        q4 = M.floor_div_prod(c4, s, tot)
        r = r + (q1 + q2 + q3 + q4).astype(jnp.uint32)
        return (r,)

    timeit("packed u16 [.,3] gather + manual cdf", scan_over(b_packed),
           (regs0,))

    # smaller model array (2^20 rows) to test size sensitivity
    model_small = jnp.zeros((1 << 20, 5), jnp.int32)

    def b_small(c, i):
        (r,) = c
        ctx = (r & CM).astype(jnp.int32)
        f = model_small[ctx]
        r = r + f[:, 0].astype(jnp.uint32) + f[:, 4].astype(jnp.uint32)
        return (r,)

    timeit("row gather only, 2^20-row model", scan_over(b_small), (regs0,))

    # random WIDE-spread ctx across full 4.7M rows (worse locality)
    def b_gather_wide(c, i):
        (r,) = c
        ctx = ((r * jnp.uint32(2654435761)) % jnp.uint32(n_model)).astype(jnp.int32)
        f = model[ctx]
        r = r + f[:, 0].astype(jnp.uint32) + f[:, 4].astype(jnp.uint32)
        return (r,)

    timeit("row gather, full 4.7M spread", scan_over(b_gather_wide), (regs0,))


if __name__ == "__main__":
    main()
