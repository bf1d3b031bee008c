"""Offline pricing study: letters-context order (the +25 KB attributed gap
vs the reference's order-9 letters model, code_ctx.cpp:465-484; BASELINE.md
round-4 attribution).

The letters branch codes positions where the cascade has NO evidence
(level 0 past the prefix, or the raw prefix letters). Our context is 5
previous letters x 3 bits + a 4-bit position bucket (dna._letters_plane,
19 bits); the reference conditions on 9 previous letters. This study takes
the REAL letters-branch position stream from the row-global encoder pass
(batch-frozen tables + row-fresh evolution, HEAD feature set incl. rough)
and prices context variants with the exact sequential Laplace(alpha=1)
estimator (same proxy study_rough.py used; its -68.5 KB estimate
translated to the shipped RSMER win).

Variants (letters branch only; the code branch is untouched):
  L0    5x3b + pb4   (current, 19 bits)  -- calibration row
  P2    5x3b + pb2   (17 bits; is fine position even pulling weight?)
  A6    6x3b + pb4   (22 bits)
  A6p2  6x3b + pb2   (20 bits)
  M7    5x3b + 2x2b + pb4 (23 bits; older letters 2-bit, N/sentinel -> 0)
  A7    7x3b + pb4   (25 bits)
  M9    5x3b + 4x2b + pb4 (27 bits; order-9 mixed-width bound)

Usage: python tools/study_letters.py [n_reads]
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
from fqsqueezer_tpu.streams import dna, common
from fqsqueezer_tpu.utils.corpus import write_fastq_corpus

CORPUS = "/tmp/fqtz_bench_se.fastq"


def price(ctx, sym, A=5):
    """Exact sequential Laplace(alpha=1) bits (study_rough.price)."""
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


def pos_bucket_np(i, length):
    rem = length - i
    mid = np.minimum(6 + (i - 24) // 16, 13)
    early = i // 4
    pb = np.where(i < 24, early, mid)
    pb = np.where(rem <= 4, 14, pb)
    pb = np.where(rem <= 2, 15, pb)
    return pb


def hist_letters(codes_np, pos, n_back):
    """h[d] for d=1..n_back: 3-bit letter (sentinel 5 before read start)."""
    R, L = codes_np.shape
    hs = []
    for d in range(1, n_back + 1):
        sym_d = np.full((R, L), dna.LET_SENTINEL, np.int64)
        if d < L:
            sym_d[:, d:] = codes_np[:, :-d]
        sym_d = np.where(pos >= d, sym_d, dna.LET_SENTINEL)
        hs.append(sym_d)
    return hs


def main():
    corpus = CORPUS
    if "--real" in sys.argv:
        # the repeat-bearing se_real corpus (letters may carry structure
        # a random genome cannot)
        from fqsqueezer_tpu.utils.corpus import write_fastq_corpus_realistic

        corpus = "/tmp/fqtz_bench_real.fastq"
        if not os.path.exists(corpus):
            write_fastq_corpus_realistic(corpus, 100_000, 100, 4_600_000,
                                         seed=42)
    elif not os.path.exists(corpus):
        write_fastq_corpus(corpus, 100_000, 100, 4_600_000, seed=42)
    data = fastq.read_fastq(corpus)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else data.n_reads

    p = Params()
    p.genome_size = 5
    p.adjust_kmer_sizes()
    p.dna_mode = DnaMode.SE_ORIGINAL
    p.quality_mode = QualityMode.NONE
    p.id_mode = IdMode.NONE
    dcfg, qcfg, mcfg, icfg = pipeline.make_configs(p)
    state = pipeline.state_create(dcfg, qcfg, icfg)
    CB = 1 << dna._ctx_bits(dcfg)
    sb = dcfg.scale_bits
    print(f"ctx_bits={dna._ctx_bits(dcfg)} rough={dcfg.rough} n={n}",
          flush=True)

    @partial(jax.jit, static_argnums=0)
    def rg_pass(cfg, st, codes, kcodes, lengths):
        return dna.dna_process_batch_rg(cfg, st, codes, kcodes, lengths)

    @partial(jax.jit, static_argnums=0)
    def collect(cfg, st, codes, eff, lengths, ctx, sym, cact):
        return dna.dna_collect_updates(cfg, st, codes, eff, lengths, ctx,
                                       sym, cact, skip_sb=True)

    VARIANTS = ("L0", "P2", "A6", "A6p2", "M7", "A7", "M9")
    streams = {k: ([], []) for k in VARIANTS}
    bits_actual = 0.0
    n_let = 0

    sched = pipeline.batch_schedule(n, p.n_lanes, p.max_batch_reads)
    for bi, (start, take, padded) in enumerate(sched):
        codes = jnp.asarray(pipeline._pad_batch(
            data.codes[start:start + take], padded).astype(np.int32))
        lengths_np = pipeline._pad_batch(
            data.lengths[start:start + take], padded).astype(np.int32)
        lengths = jnp.asarray(lengths_np)
        kcodes = jnp.where(codes >= 4, 0, codes)

        st_pre = state.dna
        eff, ctx_r, sym_r, f_r, c_r, cact_r, s_tc, b_tc = rg_pass(
            dcfg, st_pre, codes, kcodes, lengths)
        # rg_pass already returns read-aligned [R, L] planes
        ctx_np = np.asarray(ctx_r).astype(np.int64)
        sym_np = np.asarray(sym_r).astype(np.int64)
        act_np = np.asarray(cact_r)
        f_np = np.asarray(f_r).astype(np.float64)

        R, L = ctx_np.shape
        pos = np.arange(L, dtype=np.int32)[None, :]
        lens_b = np.broadcast_to(lengths_np[:, None], (R, L))
        valid_rows = (np.arange(R)[:, None] < take)
        m = act_np & (ctx_np >= CB) & valid_rows   # letters-branch positions
        n_let += int(m.sum())
        bits_actual += float(np.sum(-np.log2(
            np.maximum(f_np[m], 1.0) / (1 << sb))))

        codes_np = np.asarray(codes).astype(np.int64)
        pb = pos_bucket_np(np.broadcast_to(pos, (R, L)), lens_b).astype(
            np.int64)
        pb2 = pb >> 2
        h = hist_letters(codes_np, pos, 9)       # h[0]=prev, ... h[8]
        # 2-bit letters: N(4)/sentinel(5) alias onto 0..3 via & 3 (the
        # aliasing is priced fairly by the estimator)
        h2 = [x & 3 for x in h]

        def lh3(k):
            v = np.zeros((R, L), np.int64)
            for d in range(k, 0, -1):
                v = (v << 3) | h[d - 1]
            return v

        def ext2(base, extra):
            v = base
            for x in extra:
                v = (v << 2) | x
            return v

        keys = {
            "L0": (lh3(5) << 4) | pb,
            "P2": (lh3(5) << 2) | pb2,
            "A6": (lh3(6) << 4) | pb,
            "A6p2": (lh3(6) << 2) | pb2,
            "M7": (ext2(lh3(5), h2[5:7]) << 4) | pb,
            "A7": (lh3(7) << 4) | pb,
            "M9": (ext2(lh3(5), h2[5:9]) << 4) | pb,
        }
        for k in VARIANTS:
            streams[k][0].append(keys[k][m])
            streams[k][1].append(sym_np[m])

        state = state._replace(dna=collect(
            dcfg, st_pre._replace(s_tc=s_tc, b_tc=b_tc), codes, eff,
            lengths, ctx_r, sym_r, cact_r))
        if bi % 5 == 0:
            print(f"batch {bi}/{len(sched)}", flush=True)

    print(f"\nletters positions: {n_let:,}  actual modeled bytes "
          f"{bits_actual / 8:,.0f}", flush=True)
    base = None
    for k in VARIANTS:
        ctx = np.concatenate(streams[k][0])
        sym = np.concatenate(streams[k][1])
        by = price(ctx, sym) / 8
        if base is None:
            base = by
        print(f"{k:5s} {by:12,.0f} B  delta {by - base:+,.0f} B", flush=True)


if __name__ == "__main__":
    main()
