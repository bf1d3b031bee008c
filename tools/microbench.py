"""TPU op-cost microbenchmarks for the update/emission hot paths.

Establishes the cost model that guides the round-2 throughput work:
  * scatter-add cost vs number of updates and target size
  * scatter with unique/sorted indices vs raw
  * gather cost (table row fetch pattern)
  * lax.scan per-step overhead at lane widths (the decode/rans shape)
  * swar full-plane sweep cost
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    # ---- scatter-add: updates into u32 plane ----
    for n_upd, n_tgt in [(400_000, 1 << 20), (800_000, 1 << 23),
                         (1_600_000, 1 << 23), (1_600_000, 1 << 24),
                         (800_000, 1 << 24)]:
        idx = jnp.asarray(rng.integers(0, n_tgt, n_upd).astype(np.int32))
        inc = jnp.asarray(rng.integers(1, 3, n_upd).astype(np.uint32))
        tgt = jnp.zeros((n_tgt,), jnp.uint32)

        f = jax.jit(lambda t, i, v: t.at[i].add(v))
        dt = timeit(f, tgt, idx, inc)
        print(f"scatter_add    n={n_upd:>9,} tgt={n_tgt:>10,}  {dt*1e3:7.1f} ms"
              f"  ({n_upd/dt/1e6:6.1f} M upd/s)", flush=True)

    # sorted indices
    n_upd, n_tgt = 1_600_000, 1 << 23
    idx_s = jnp.asarray(np.sort(rng.integers(0, n_tgt, n_upd)).astype(np.int32))
    inc = jnp.asarray(rng.integers(1, 3, n_upd).astype(np.uint32))
    tgt = jnp.zeros((n_tgt,), jnp.uint32)
    f = jax.jit(lambda t, i, v: t.at[i].add(v))
    dt = timeit(f, tgt, idx_s, inc)
    print(f"scatter_add sorted idx n={n_upd:,}  {dt*1e3:7.1f} ms", flush=True)

    # unique_indices=True (caller-guaranteed)
    idx_u = jnp.asarray(rng.permutation(n_tgt)[:n_upd].astype(np.int32))
    f = jax.jit(lambda t, i, v: t.at[i].add(v, unique_indices=True))
    dt = timeit(f, tgt, idx_u, inc)
    print(f"scatter_add unique=True n={n_upd:,}  {dt*1e3:7.1f} ms", flush=True)

    # scatter-max (claim round analog)
    idx_m = jnp.asarray(rng.integers(0, n_tgt, n_upd).astype(np.int32))
    f = jax.jit(lambda t, i, v: t.at[i].max(v))
    dt = timeit(f, tgt, idx_m, inc)
    print(f"scatter_max    n={n_upd:,}  {dt*1e3:7.1f} ms", flush=True)

    # ---- gather: bucket-row fetch [n, 8] ----
    for n_q, n_buckets in [(800_000, 1 << 20), (1_600_000, 1 << 20)]:
        tbl = jnp.zeros((n_buckets, 8), jnp.uint32)
        q = jnp.asarray(rng.integers(0, n_buckets, n_q).astype(np.int32))
        f = jax.jit(lambda t, i: t[i])
        dt = timeit(f, tbl, q)
        print(f"gather_row8    n={n_q:>9,} buckets={n_buckets:>9,}  "
              f"{dt*1e3:7.1f} ms", flush=True)

    # flat gather [n]
    tbl1 = jnp.zeros((1 << 24,), jnp.uint32)
    q = jnp.asarray(rng.integers(0, 1 << 24, 800_000).astype(np.int32))
    f = jax.jit(lambda t, i: t[i])
    dt = timeit(f, tbl1, q)
    print(f"gather_flat    n=800,000 tgt=16.7M  {dt*1e3:7.1f} ms", flush=True)

    # ---- full-plane elementwise sweep (swar analog) ----
    a = jnp.zeros((1 << 24,), jnp.uint32)
    b = jnp.ones((1 << 24,), jnp.uint32)
    f = jax.jit(lambda a, b: (a & jnp.uint32(0x7F7F7F7F)) + b)
    dt = timeit(f, a, b)
    print(f"elementwise 16.7M u32  {dt*1e3:7.1f} ms", flush=True)

    # ---- scan step overhead at decode shapes ----
    for width, steps in [(1024, 400), (1024, 100), (4096, 100)]:
        xs = jnp.zeros((steps, width), jnp.int32)
        tblg = jnp.zeros((1 << 22,), jnp.uint32)

        def step(c, x):
            g = tblg[(x + c) & ((1 << 22) - 1)]
            return c + g.astype(jnp.int32), g

        f = jax.jit(lambda xs: jax.lax.scan(step, jnp.zeros((width,), jnp.int32), xs))
        dt = timeit(f, xs)
        print(f"scan 1-gather  width={width} steps={steps}  {dt*1e3:7.1f} ms "
              f"({dt/steps*1e6:6.1f} us/step)", flush=True)

    # heavier step: 4 gathers + arith (decode-like)
    width, steps = 1024, 400
    xs = jnp.zeros((steps, width), jnp.int32)
    t8 = jnp.zeros((1 << 20, 8), jnp.uint32)
    tf = jnp.zeros((1 << 24,), jnp.uint32)

    def step4(c, x):
        i = (x + c) & ((1 << 20) - 1)
        r1 = t8[i].astype(jnp.int32).sum(-1)
        r2 = t8[(i + 7) & ((1 << 20) - 1)].astype(jnp.int32).sum(-1)
        r3 = tf[(x * 3 + c) & ((1 << 24) - 1)].astype(jnp.int32)
        r4 = tf[(x * 5 + c) & ((1 << 24) - 1)].astype(jnp.int32)
        return c + r1 + r2 + r3 + r4, r1
    f = jax.jit(lambda xs: jax.lax.scan(step4, jnp.zeros((width,), jnp.int32), xs))
    dt = timeit(f, xs)
    print(f"scan 4-gather  width={width} steps={steps}  {dt*1e3:7.1f} ms "
          f"({dt/steps*1e6:6.1f} us/step)", flush=True)


if __name__ == "__main__":
    main()
