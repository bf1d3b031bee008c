"""Modeling profiler: which context class costs what.

The TPU analog of the reference's ctx.log dump (dna.cpp:2503-2563, driven by
per-model EstimateCodeLen accumulation, rc.h:460-513): streams a FASTQ file
through the DNA modeling exactly like compression, and reports estimated bits
by cascade level, by coded rank, and by read position — the data that drives
ratio tuning (see BASELINE.md ledger).

Usage: python -m fqsqueezer_tpu.tools.profile <in.fastq> [n_reads] [gs_mbp]
"""
from __future__ import annotations

import sys

import numpy as np
import jax.numpy as jnp

from ..params import Params, DnaMode, QualityMode, IdMode
from .. import pipeline
from ..io import fastq
from ..streams import dna as D

LEVEL_NAMES = {0: "letters", 1: "pmer", 2: "smer", 3: "mixed", 4: "bmer"}


def profile_dna(path: str, n_reads: int = 0, gs: int = 5,
                batch: int = 4096) -> dict:
    data = fastq.read_fastq(path)
    if n_reads:
        data = fastq.FastqData(data.codes[:n_reads], data.quals[:n_reads],
                               data.lengths[:n_reads], data.ids[:n_reads])
    p = Params()
    p.genome_size = gs
    p.adjust_kmer_sizes()
    p.dna_mode = DnaMode.SE_ORIGINAL
    p.quality_mode = QualityMode.NONE
    p.id_mode = IdMode.NONE
    p.max_batch_reads = batch
    dcfg, qcfg, mcfg, icfg = pipeline.make_configs(p)
    state = pipeline.state_create(dcfg, qcfg, icfg)

    agg_level = np.zeros((5, 2))        # [level] -> (positions, bits)
    agg_rank = np.zeros((5, 2))
    agg_repairs = 0
    total = np.zeros(2)

    for start, take, padded in pipeline.batch_schedule(
            data.n_reads, p.n_lanes, p.max_batch_reads):
        codes = jnp.asarray(pipeline._pad_batch(
            data.codes[start:start + take], padded).astype(np.int32))
        lengths = jnp.asarray(pipeline._pad_batch(
            data.lengths[start:start + take], padded).astype(np.int32))
        kc = jnp.where(codes >= 4, 0, codes)

        eff = D.dna_effective_kcodes(dcfg, state.dna, codes, kc, lengths)
        counts, level, _ = D._window_lookup(dcfg, state.dna, eff, lengths)
        ctx, sym, f, c, act = D.dna_modeling(dcfg, state.dna, codes, eff,
                                             lengths)
        bits = jnp.where(act, dcfg.scale_bits - jnp.log2(jnp.maximum(f, 1)),
                         0.0)
        lv = np.asarray(level)
        b = np.asarray(bits)
        a = np.asarray(act)
        sy = np.asarray(sym)
        agg_repairs += int(jnp.sum((eff != kc) & act))
        pos = np.arange(codes.shape[1])[None, :]
        coded = a & (pos >= dcfg.prefix_len)
        for l in range(5):
            m = coded & (lv == l)
            agg_level[l] += (m.sum(), b[m].sum())
        for r in range(5):
            m = coded & (lv > 0) & (sy == r)
            agg_rank[r] += (m.sum(), b[m].sum())
        total += (a.sum(), b[a].sum())

        state = state._replace(dna=D.dna_collect_updates(
            dcfg, state.dna, codes, eff, lengths, ctx, sym, act))

    report = {
        "n_reads": data.n_reads,
        "bases": int(total[0]),
        "est_bits_per_base": float(total[1] / max(total[0], 1)),
        "repairs_per_read": agg_repairs / max(data.n_reads, 1),
        "levels": {LEVEL_NAMES[l]: {
            "positions": int(agg_level[l, 0]),
            "bits": float(agg_level[l, 1]),
            "avg_bits": float(agg_level[l, 1] / max(agg_level[l, 0], 1))}
            for l in range(5)},
        "ranks": {r: {
            "positions": int(agg_rank[r, 0]),
            "avg_bits": float(agg_rank[r, 1] / max(agg_rank[r, 0], 1))}
            for r in range(5)},
    }
    return report


def main() -> None:
    path = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    gs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    rep = profile_dna(path, n, gs)
    print(f"reads={rep['n_reads']} bases={rep['bases']} "
          f"est_bits/base={rep['est_bits_per_base']:.3f} "
          f"repairs/read={rep['repairs_per_read']:.3f}")
    for name, d in rep["levels"].items():
        if d["positions"]:
            print(f"  level {name:8s}: {d['positions']:10d} pos  "
                  f"{d['bits']:12.0f} bits  avg {d['avg_bits']:.3f}")
    for r, d in rep["ranks"].items():
        if d["positions"]:
            print(f"  rank {r}: {d['positions']:10d} pos  avg {d['avg_bits']:.3f}")


if __name__ == "__main__":
    main()
