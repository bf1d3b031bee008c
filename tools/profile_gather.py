"""Isolate the scan-gather anomaly: gathers of [1024] random rows inside a
nested scan, sweeping table row count, row width, and carried-vs-closure.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N = 1024
L = 104
R_PL = 4
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
    print(f"{label:46s} {per * 1e3:8.1f} ms", flush=True)
    return per


def make_scan(log2_rows, width, n_gathers):
    mask = (1 << log2_rows) - 1

    @jax.jit
    def f(tc, h0):
        def outer(carry, rd):
            h = carry

            def inner(h, i):
                acc = jnp.zeros((N,), jnp.uint32)
                for g in range(n_gathers):
                    row = tc[(h * (2 * g + 3)) & mask]      # [N, width]
                    acc = acc + jnp.sum(row, axis=-1)
                h = (h * 31 + acc.astype(jnp.int32)) & mask
                return h, acc[0]

            h, ys = jax.lax.scan(inner, h,
                                 jnp.arange(L, dtype=jnp.int32), unroll=2)
            return h, ys

        h, ys = jax.lax.scan(outer, h0, jnp.arange(R_PL, dtype=jnp.int32))
        return h

    return f


def main():
    h0 = jnp.arange(N, dtype=jnp.int32) * 7919
    for log2_rows, width, ng in [
        (20, 10, 1), (20, 10, 2), (22, 9, 1), (22, 9, 2),
        (22, 5, 2), (24, 9, 1), (18, 9, 2), (22, 8, 2), (22, 16, 2),
    ]:
        tc = jnp.zeros(((1 << log2_rows), width), jnp.uint32)
        f = make_scan(log2_rows, width, ng)
        timeit(f"rows=2^{log2_rows} w={width} gathers={ng}", f, tc, h0)

    # 1-D (flat) table variant: gather width words via explicit indices
    @jax.jit
    def flat(tc, h0):
        mask = (1 << 22) - 1

        def outer(carry, rd):
            h = carry

            def inner(h, i):
                idx = ((h * 3) & mask) * 9
                row = tc[idx[:, None] + jnp.arange(9)[None, :]]
                acc = jnp.sum(row, axis=-1)
                h = (h * 31 + acc.astype(jnp.int32)) & mask
                return h, acc[0]

            h, ys = jax.lax.scan(inner, h,
                                 jnp.arange(L, dtype=jnp.int32), unroll=2)
            return h, ys

        h, ys = jax.lax.scan(outer, h0, jnp.arange(R_PL, dtype=jnp.int32))
        return h

    tcf = jnp.zeros(((1 << 22) * 9,), jnp.uint32)
    timeit("flat 2^22*9 explicit 9-idx gather", flat, tcf, h0)


def carried_variants():
    """Outer-scan-carried table: inner gathers from it, outer boundary
    scatter-updates it — the row_global decode shape."""
    import time as _t
    h0 = jnp.arange(N, dtype=jnp.int32) * 7919
    tc0 = jnp.zeros(((1 << 20), 10), jnp.uint32)
    ev = jnp.arange(N * L, dtype=jnp.int32) % (1 << 20)

    def mk(update: bool, carried: bool):
        @jax.jit
        def f(tc, h0):
            def outer(carry, rd):
                h, tc = carry if carried else (carry, tc0)

                def inner(h, i):
                    acc = jnp.sum(tc[(h * 3) & ((1 << 20) - 1)], axis=-1) \
                        + jnp.sum(tc[(h * 7) & ((1 << 20) - 1)], axis=-1)
                    h = (h * 31 + acc.astype(jnp.int32)) & ((1 << 20) - 1)
                    return h, acc[0]

                h, ys = jax.lax.scan(inner, h,
                                     jnp.arange(L, dtype=jnp.int32),
                                     unroll=2)
                tc2 = tc
                if update:
                    tc2 = tc.reshape(-1).at[ev * 10].max(
                        jnp.uint32(1), mode="drop").reshape(tc.shape)
                    tc2 = tc2.reshape(-1).at[ev * 10 + 5].add(
                        jnp.uint32(1), mode="drop").reshape(tc.shape)
                return ((h, tc2) if carried else h), ys

            init = (h0, tc) if carried else h0
            out, ys = jax.lax.scan(outer, init,
                                   jnp.arange(R_PL, dtype=jnp.int32))
            return out[0] if carried else out

        return f

    for upd, car, label in [(False, False, "closure, no update"),
                            (False, True, "carried, no update"),
                            (True, True, "carried + 2-scatter update/row"),
                            ]:
        timeit(label, mk(upd, car), tc0, h0)


if __name__ == "__main__":
    import sys as _s
    if len(_s.argv) > 1 and _s.argv[1] == "carried":
        carried_variants()
    else:
        main()
