"""Offline pricing study: 1-substitution s-mer miss evidence for the DNA
cascade's pmer/letters positions (the +78 KB attributed gap vs the
reference's rough counts, BASELINE.md round-4 attribution).

Schemes priced on the identical position stream (sequential Laplace
alpha=1 estimator, exact, vectorized by (ctx, sym) occurrence indices):
  V0  current cascade (b > s > SIV > letters)
  V1  suspect-position rough: when the s/b levels miss, the decoder can
      TRACK the likely error position — the context base that entered the
      window when the current miss streak began (a carried streak-age
      register). 4 probes of the EXISTING canonical s-table with that one
      position substituted; their summed counts become a new cascade level.
      O(4) finds per position, no new table, no extra insert traffic.
  V1o like V1 but probes ALL window offsets when the streak is older than
      the window (the error left the context) -- NOT O(1); bound check.
  V2  full reference-style rough: all (smer_len-1) offsets x 4 subs
      (find_counts_rough_s, dna.cpp:257-292) — the upper bound.

Basis: batch-frozen tables (state before each batch's updates) for every
scheme, real repaired kcodes (eff) from the row-global encoder pass.

Usage: python tools/study_rough.py [n_reads]
"""
from __future__ import annotations

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode
from fqsqueezer_tpu import pipeline
from fqsqueezer_tpu.io import fastq
from fqsqueezer_tpu.streams import dna
from fqsqueezer_tpu.ops import kmers, tables
from fqsqueezer_tpu.utils.corpus import write_fastq_corpus

CORPUS = "/tmp/fqtz_bench_se.fastq"

_Q0 = dna._Q0
_Q1 = dna._Q1
_Q23 = dna._Q23


def quant_np(v, thr):
    q = np.zeros_like(v)
    for t in thr:
        q += (v >= t).astype(v.dtype)
    return q


def pos_bucket_np(i, length):
    rem = length - i
    mid = np.minimum(6 + (i - 24) // 16, 13)
    early = i // 4
    pb = np.where(i < 24, early, mid)
    pb = np.where(rem <= 4, 14, pb)
    pb = np.where(rem <= 2, 15, pb)
    return pb


def rank_of_np(counts, sym):
    """counts [..., 4], sym [...] -> rank (N -> 4)."""
    c = counts
    gt = (c[..., None, :] > c[..., :, None]).astype(np.int32)
    eq = (c[..., None, :] == c[..., :, None]).astype(np.int32)
    lower = np.tril(np.ones((4, 4), np.int32), k=-1)
    ranks = np.sum(gt + eq * lower, axis=-1)
    s4 = np.minimum(sym, 3)
    r = np.take_along_axis(ranks, s4[..., None], axis=-1)[..., 0]
    return np.where(sym >= 4, 4, r)


@partial(jax.jit, static_argnums=(2, 3, 4))
def probe_subst(s_tc, ctx_lohi, a_static, smer_len, log2b):
    """Counts of the 4 substitutions at context offset a_static (bits 2a).
    ctx_lohi: (lo, hi) [R, L] context windows. Returns [R, L, 4] summed."""
    lo, hi = ctx_lohi
    w = smer_len - 1
    acc = jnp.zeros(lo.shape + (4,), jnp.int32)
    for j in range(4):
        if 2 * a_static < 32:
            lo_j = (lo & ~(jnp.uint32(3) << (2 * a_static))) \
                | (jnp.uint32(j) << (2 * a_static))
            hi_j = hi
        else:
            sh = 2 * a_static - 32
            lo_j = lo
            hi_j = (hi & ~(jnp.uint32(3) << sh)) | (jnp.uint32(j) << sh)
        # reverse complement of the substituted window
        rlo, rhi = _rc_window(lo_j, hi_j, w)
        q = dna._canon_query(lo_j, hi_j, rlo, rhi, smer_len, log2b)
        c, f = tables.ktable_find(s_tc, q[0], q[1], log2b)
        acc = acc + c
    return acc


def _rc_window(lo, hi, w):
    """Reverse complement of a w-base (lo, hi) window (earliest base most
    significant): rc[i] = 3 - base[w-1-i]."""
    # extract bases, complement, reverse — O(w) static ops (study only)
    rlo = jnp.zeros_like(lo)
    rhi = jnp.zeros_like(hi)
    for i in range(w):
        src = 2 * i
        b = ((lo >> src) if src < 32 else (hi >> (src - 32))) & 3
        c = jnp.uint32(3) - b
        dst = 2 * (w - 1 - i)
        if dst < 32:
            rlo = rlo | (c << dst)
        else:
            rhi = rhi | (c << (dst - 32))
    return rlo, rhi


def price(ctx, sym, A=5):
    """Exact sequential Laplace(alpha=1) bits of the (ctx, sym) stream in
    given order, vectorized: bits = sum -log2((occ_cs + 1)/(occ_c + A))."""
    n = ctx.shape[0]
    if n == 0:
        return 0.0

    def occ_index(keys):
        order = np.argsort(keys, kind="stable")
        sk = keys[order]
        first = np.ones(n, bool)
        first[1:] = sk[1:] != sk[:-1]
        starts = np.where(first)[0]
        occ_sorted = np.arange(n) - np.repeat(starts, np.diff(
            np.append(starts, n)))
        occ = np.empty(n, np.int64)
        occ[order] = occ_sorted
        return occ

    occ_c = occ_index(ctx)
    occ_cs = occ_index(ctx * np.int64(8) + sym)
    return float(np.sum(-np.log2((occ_cs + 1) / (occ_c + A))))


def main():
    if not os.path.exists(CORPUS):
        write_fastq_corpus(CORPUS, 100_000, 100, 4_600_000, seed=42)
    data = fastq.read_fastq(CORPUS)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else data.n_reads

    p = Params()
    p.genome_size = 5
    p.adjust_kmer_sizes()
    p.dna_mode = DnaMode.SE_ORIGINAL
    p.quality_mode = QualityMode.NONE
    p.id_mode = IdMode.NONE
    dcfg, qcfg, mcfg, icfg = pipeline.make_configs(p)
    state = pipeline.state_create(dcfg, qcfg, icfg).dna
    S = dcfg.smer_len
    sw = S - 1
    log2b = dcfg.smer_log2_buckets
    print(f"smer_len={S} bmer_len={dcfg.bmer_len} siv_len={dcfg.siv_len} "
          f"prefix={dcfg.prefix_len} n={n}", flush=True)

    @partial(jax.jit, static_argnums=0)
    def rg_pass(cfg, st, codes, kcodes, lengths):
        return dna.dna_process_batch_rg(cfg, st, codes, kcodes, lengths)

    @partial(jax.jit, static_argnums=0)
    def frozen_parts(cfg, st, eff, lengths):
        parts, act = dna._window_parts(cfg, st, eff, lengths)
        lo, hi = kmers.pack_windows(eff, sw)
        lo, hi = kmers.shift_right(lo, 1), kmers.shift_right(hi, 1)
        return parts, act, lo, hi

    @partial(jax.jit, static_argnums=0)
    def collect(cfg, st, codes, eff, lengths, ctx, sym, cact):
        return dna.dna_collect_updates(cfg, st, codes, eff, lengths, ctx,
                                       sym, cact, skip_sb=True)

    # accumulate per-variant (ctx, sym) streams as lists of np arrays
    streams = {k: ([], []) for k in ("V0", "V1", "V1o", "V2")}
    stats = {k: [0, 0] for k in ("V1", "V1o", "V2")}  # rescued, rank0

    sched = pipeline.batch_schedule(n, p.n_lanes, p.max_batch_reads)
    for bi, (start, take, padded) in enumerate(sched):
        codes = jnp.asarray(pipeline._pad_batch(
            data.codes[start:start + take], padded).astype(np.int32))
        lengths_np = pipeline._pad_batch(
            data.lengths[start:start + take], padded).astype(np.int32)
        lengths = jnp.asarray(lengths_np)
        kcodes = jnp.where(codes >= 4, 0, codes)

        st_pre = state
        eff, ctx_r, sym_r, f_r, c_r, cact_r, s_tc, b_tc = rg_pass(
            dcfg, state, codes, kcodes, lengths)
        parts, act, lo, hi = frozen_parts(dcfg, st_pre, eff, lengths)
        cp, cs, cb, fp, fs, fb = [np.asarray(x) for x in parts]

        R, L = cp.shape[:2] if cp.ndim == 3 else (cp.shape[0], cp.shape[1])
        pos = np.arange(L, dtype=np.int32)[None, :]
        active = pos < lengths_np[:, None]
        full_s = pos >= sw
        miss = active & full_s & ~fs & ~fb

        # streak age a: consecutive-miss run length - 1 (per read)
        run = np.zeros((R, L), np.int32)
        for i in range(1, L):
            run[:, i] = np.where(miss[:, i], run[:, i - 1] + 1, 0)
        run = np.where(miss, np.maximum(run, 1), 0)
        age = run - 1                                     # valid where miss

        # V1 probes: one offset per position (its own age), a <= sw-1.
        # Probe per STATIC age value, select rows with that age (probe all,
        # mask after — SPMD-style; study pays it once offline).
        rough1 = np.zeros((R, L, 4), np.int32)
        roughF = np.zeros((R, L, 4), np.int32)
        lohi = (lo, hi)
        for a in range(sw):
            cnt_a = np.asarray(probe_subst(st_pre.s_tc, lohi, a, S, log2b))
            sel = miss & (age == a)
            rough1[sel] = cnt_a[sel]
            roughF += cnt_a
        # V1o: V1 plus full-offset fallback when age >= sw (error left
        # the window): use roughF there
        old = miss & (age >= sw)
        rough1o = rough1.copy()
        rough1o[old] = roughF[old]

        # ---- build per-variant (ctx, sym) streams ----
        codes_np = np.asarray(codes)
        eff_np = np.asarray(eff)
        counts0, level0 = [np.asarray(x) for x in dna._cascade_combine(
            *[jnp.asarray(v) for v in (cp, cs, cb, fp, fs, fb)])]
        lens_b = np.broadcast_to(lengths_np[:, None], (R, L))
        pb = pos_bucket_np(np.broadcast_to(pos, (R, L)), lens_b)

        # letters history context (5 prev letters, 3b each) + pb
        lh = np.zeros((R, L), np.int64)
        for d in (5, 4, 3, 2, 1):
            sym_d = np.full((R, L), dna.LET_SENTINEL, np.int64)
            if d < L:
                sym_d[:, d:] = codes_np[:, :-d]
            sym_d = np.where(pos >= d, sym_d, dna.LET_SENTINEL)
            lh = (lh << 3) | sym_d
        lh = (lh & dna.LH_MASK) | (pb.astype(np.int64) << 15)

        LEV_RS = 5  # new rough level id for the study

        def build(rough, tag):
            use_r = miss & (rough.sum(-1) > 0)
            counts = np.where(use_r[..., None], np.minimum(rough, 255),
                              counts0)
            level = np.where(use_r, LEV_RS, level0)
            use_code = (pos >= dcfg.prefix_len) & (level > 0)
            ranks = rank_of_np(counts, codes_np)
            symv = np.where(use_code, ranks, codes_np)
            # nz history of rank>0 bits
            rbit = (use_code & active & (ranks > 0)).astype(np.int32)
            nzh = np.zeros((R, L), np.int32)
            for d in (1, 2, 3, 4):
                nzh[:, d:] += rbit[:, :-d]
            nzh = np.minimum(nzh, 4)
            cssort = np.sort(counts, axis=-1)[..., ::-1]
            cctx = (level.astype(np.int64)
                    | (quant_np(cssort[..., 0], _Q0).astype(np.int64) << 3)
                    | (quant_np(cssort[..., 1], _Q1).astype(np.int64) << 7)
                    | (quant_np(cssort[..., 2], _Q23).astype(np.int64) << 10)
                    | (quant_np(cssort[..., 3], _Q23).astype(np.int64) << 12)
                    | (pb.astype(np.int64) << 14)
                    | (nzh.astype(np.int64) << 18))
            ctx = np.where(use_code, cctx, (np.int64(1) << 40) | lh)
            m = active[: , :] & (np.arange(R)[:, None] < take)
            m = m & (pos < lens_b)
            if tag in stats:
                stats[tag][0] += int((use_r & m).sum())
                stats[tag][1] += int((use_r & m & (ranks == 0)).sum())
            streams[tag][0].append(ctx[m])
            streams[tag][1].append(symv[m].astype(np.int64))

        build(np.zeros_like(rough1), "V0")
        build(rough1, "V1")
        build(rough1o, "V1o")
        build(roughF, "V2")

        # evolve state: real collect on the rg outputs
        state = collect(dcfg, st_pre._replace(s_tc=s_tc, b_tc=b_tc),
                        codes, eff, lengths, ctx_r, sym_r, cact_r)
        if bi % 5 == 0:
            print(f"batch {bi}/{len(sched)}", flush=True)

    print()
    base_bits = None
    for k in ("V0", "V1", "V1o", "V2"):
        ctx = np.concatenate(streams[k][0])
        sym = np.concatenate(streams[k][1])
        bits = price(ctx, sym)
        by = bits / 8
        extra = ""
        if base_bits is None:
            base_bits = bits
        else:
            extra = f"  delta {(bits - base_bits) / 8:+,.0f} B"
        if k in stats:
            r, r0 = stats[k]
            extra += f"  rescued {r:,} rank0 {100 * r0 / max(1, r):.1f}%"
        print(f"{k:4s} {by:12,.0f} B{extra}", flush=True)


if __name__ == "__main__":
    main()
