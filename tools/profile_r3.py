"""Round-3 throughput profiling: engine cost model + decode phase times.

Part A — scatter/gather ENGINE cost model on the real chip, with blocked
sub-jit outputs (plain microbenches get DCE'd — see BASELINE.md notes):
  * gather of [n] random rows from a [B, W] u32 table for W in {1,2,4,8,16}
    -> decides whether interleaving tags+cnts into one row halves find cost
      (engine cost per ROW) or does nothing (cost per BYTE)
  * scatter-add / scatter-max at the update event counts
Part B — decode batch phase times: _decode_batch wall per batch shape, and
the inner-scan step cost (the XLA while-loop the VERDICT wants Pallas-fused).

Run on TPU, single process: python tools/profile_r3.py
"""
from __future__ import annotations

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def block(x):
    jax.block_until_ready(x)
    return x


def t_best(fn, *args, n=4):
    jax.tree_util.tree_map(block, fn(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        jax.tree_util.tree_map(block, fn(*args))
        best = min(best, time.time() - t0)
    return best


def part_a():
    rng = np.random.default_rng(0)
    print("== Part A: engine cost model ==", flush=True)

    n = 819_200           # one table's update events per 4096x100 batch
    B = 1 << 20
    idx = jnp.asarray(rng.integers(0, B, n).astype(np.int32))

    for W in (1, 2, 4, 8, 16, 32):
        tbl = jnp.asarray(rng.integers(0, 2**31, (B, W)).astype(np.uint32))

        @jax.jit
        def g(tbl, idx):
            return jnp.sum(tbl[idx], dtype=jnp.uint32)

        dt = t_best(g, tbl, idx)
        print(f"gather rows W={W:3d}: {dt*1e3:7.2f} ms  "
              f"{n/dt/1e6:7.1f} M rows/s  {n*W*4/dt/2**30:6.1f} GiB/s",
              flush=True)

    # 1-wide gather from planes of different sizes (cache effects?)
    for logB in (14, 17, 20, 24):
        Bp = 1 << logB
        tbl = jnp.asarray(rng.integers(0, 2**31, (Bp,)).astype(np.uint32))
        idxp = jnp.asarray(rng.integers(0, Bp, n).astype(np.int32))

        @jax.jit
        def g1(tbl, idxp):
            return jnp.sum(tbl[idxp], dtype=jnp.uint32)

        dt = t_best(g1, tbl, idxp)
        print(f"gather w1 B=2^{logB}: {dt*1e3:7.2f} ms  "
              f"{n/dt/1e6:7.1f} M rows/s", flush=True)

    # scatter-add / scatter-max / scatter-set into 2^23 plane
    Bp = 1 << 23
    idxp = jnp.asarray(rng.integers(0, Bp, n).astype(np.int32))
    val = jnp.asarray(rng.integers(1, 2**30, n).astype(np.uint32))
    tgt = jnp.zeros((Bp,), jnp.uint32)

    @jax.jit
    def sadd(t, i, v):
        return t.at[i].add(v)

    @jax.jit
    def smax(t, i, v):
        return t.at[i].max(v)

    @jax.jit
    def sset(t, i, v):
        return t.at[i].set(v)

    for name, f in (("add", sadd), ("max", smax), ("set", sset)):
        dt = t_best(f, tgt, idxp, val)
        print(f"scatter-{name} n={n:,} B=2^23: {dt*1e3:7.2f} ms  "
              f"{n/dt/1e6:7.1f} M ev/s", flush=True)

    # gather with 2D index (row + take_along_axis pattern used in claims)
    tbl8 = jnp.asarray(rng.integers(0, 2**31, (B, 8)).astype(np.uint32))
    idx8 = jnp.asarray(rng.integers(0, B, n).astype(np.int32))

    @jax.jit
    def g_then_reduce(tbl, idx):
        rows = tbl[idx]                     # [n, 8]
        return jnp.sum(rows == jnp.uint32(7), dtype=jnp.int32)

    dt = t_best(g_then_reduce, tbl8, idx8)
    print(f"gather8+compare:   {dt*1e3:7.2f} ms", flush=True)


def part_b():
    from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode
    from fqsqueezer_tpu import pipeline
    from fqsqueezer_tpu.io import fastq
    from fqsqueezer_tpu.utils.corpus import write_fastq_corpus
    from fqsqueezer_tpu.streams import quality

    CORPUS = "/tmp/fqtz_bench_se.fastq"
    ARCH = "/tmp/fqtz_prof_r3.fqst"
    if not os.path.exists(CORPUS):
        write_fastq_corpus(CORPUS, 100_000, 100, 4_600_000, seed=42)

    p = Params()
    p.genome_size = 5
    p.adjust_kmer_sizes()
    p.dna_mode = DnaMode.SE_ORIGINAL
    p.quality_mode = QualityMode.ILLUMINA_8
    p.id_mode = IdMode.NONE
    data = fastq.read_fastq(CORPUS)

    print("== Part B: end-to-end phases ==", flush=True)
    t0 = time.time()
    pipeline.compress_file(p, CORPUS, ARCH, data=data)
    print(f"compress cold: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    pipeline.compress_file(p, CORPUS, ARCH, data=data)
    dt = time.time() - t0
    print(f"compress warm: {dt:.1f}s = {data.n_reads/dt:,.0f} reads/s",
          flush=True)

    t0 = time.time()
    pipeline.decompress_file(Params(), ARCH, "/tmp/fqtz_prof_r3.fastq")
    print(f"decomp cold: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    st = pipeline.decompress_file(Params(), ARCH, "/tmp/fqtz_prof_r3.fastq")
    dt = time.time() - t0
    print(f"decomp warm: {dt:.1f}s = {st['n_reads']/dt:,.0f} reads/s",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ab"
    if "a" in which:
        part_a()
    if "b" in which:
        part_b()
