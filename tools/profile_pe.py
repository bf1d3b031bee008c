"""PE bit attribution: where do the PE config's DNA bits go?

Replays the PE compress modeling loop (pipeline._model_batch's PE branch)
and attributes exact stream bits (-log2(f/2^sb)) by anchored-row type
(read1 / rowA right-part / rowB rc-left-part), anchor rate, and position
within the row. Drives the VERDICT r3 #3 work: PE bytes_vs_ref 1.0852 and
every hypothesis about why needs numbers (reference anchored split:
CompressDirectWithMinim, /root/reference/fqs/dna.cpp:1559-1638).

Usage: python tools/profile_pe.py [n_pairs]
"""
from __future__ import annotations

import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")

from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode
from fqsqueezer_tpu import pipeline
from fqsqueezer_tpu.io import fastq
from fqsqueezer_tpu.streams import dna, meta
from fqsqueezer_tpu.utils.corpus import write_pe_corpus
import os


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    PE1, PE2 = "/tmp/fqtz_bench_pe_1.fastq", "/tmp/fqtz_bench_pe_2.fastq"
    if not os.path.exists(PE1):
        write_pe_corpus(PE1, PE2, 50_000, 100, 4_600_000, seed=42)
    p = Params()
    p.genome_size = 5
    p.adjust_kmer_sizes()
    p.dna_mode = DnaMode.PE_ORIGINAL
    p.quality_mode = QualityMode.NONE
    p.id_mode = IdMode.NONE
    dcfg, qcfg, mcfg, icfg = pipeline.make_configs(p)

    d1 = fastq.read_fastq(PE1)
    d2 = fastq.read_fastq(PE2)
    data = pipeline.interleave_pe(d1, d2)
    n = min(data.n_reads, 2 * n_pairs)

    state = pipeline.state_create(dcfg, qcfg, icfg)
    sb = dcfg.scale_bits

    tot_bits = np.zeros(3)          # by row type 0=read1 1=rowA 2=rowB
    tot_syms = np.zeros(3)
    n_anch = 0
    n_cand = 0
    n_pairs_seen = 0
    bits_by_rowpos = np.zeros((3, 128))
    syms_by_rowpos = np.zeros((3, 128))
    pe_stream_bits = 0.0

    N = p.n_lanes
    for start, take, padded in pipeline.batch_schedule(
            n, N, p.max_batch_reads, align=2 * N):
        codes = pipeline._pad_batch(data.codes[start:start + take],
                                    padded).astype(np.int32)
        lengths = pipeline._pad_batch(data.lengths[start:start + take],
                                      padded).astype(np.int32)
        codes = jnp.asarray(codes)
        lengths = jnp.asarray(lengths)
        lcp = None

        (codes3, lengths3, anchor_mask3, lcp3, pe_syms, pe_act, pe_f,
         pe_c, pos_map3) = dna.dna_pe_encode(dcfg, state.dna, codes, lengths,
                                             lcp=lcp)
        kcodes3 = jnp.where(codes3 >= 4, 0, codes3)
        (eff, d_ctx, d_sym, d_f, d_c, d_act, s_tc,
         b_tc) = dna.dna_process_batch_rg(
            dcfg, state.dna, codes3, kcodes3, lengths3, lcp=lcp3,
            anchor_mask=anchor_mask3, pos_map=pos_map3)
        d_state = dna.dna_collect_updates(
            dcfg, state.dna._replace(s_tc=s_tc, b_tc=b_tc), codes3, eff,
            lengths3, d_ctx, d_sym, d_act, pe_syms=pe_syms, pe_act=pe_act,
            codes_true=codes, lengths_true=lengths, skip_sb=True)
        state = state._replace(dna=d_state)

        f_np = np.asarray(d_f).astype(np.float64)
        act = np.asarray(d_act)
        # padding rows: only the first 3*take//2 rows are real
        real_rows = 3 * (take // 2)
        f_np = f_np[:real_rows]
        act = act[:real_rows]
        bits = np.where(act, -np.log2(np.maximum(f_np, 1) / (1 << sb)), 0.0)
        for rt in range(3):
            b = bits[rt::3]
            a = act[rt::3]
            tot_bits[rt] += b.sum()
            tot_syms[rt] += a.sum()
            L = b.shape[1]
            bits_by_rowpos[rt, :L] += b.sum(0)
            syms_by_rowpos[rt, :L] += a.sum(0)

        pa = np.asarray(pe_act)[: take // 2]
        pf = np.asarray(pe_f).astype(np.float64)[: take // 2]
        n_cand += int(pa[:, 0].sum())
        n_anch += int(pa[:, 1].sum())
        n_pairs_seen += take // 2
        pe_stream_bits += np.where(
            pa, -np.log2(np.maximum(pf, 1) / (1 << sb)), 0).sum()

    tb = tot_bits.sum()
    print(f"pairs={n_pairs_seen}  cand_rate={n_cand/n_pairs_seen:.3f}  "
          f"anchor_rate={n_anch/n_pairs_seen:.3f}")
    print(f"DNA bits total {tb:,.0f} ({tb/8:,.0f} B)  "
          f"pe-stream {pe_stream_bits/8:,.0f} B")
    for rt, name in enumerate(["read1", "rowA ", "rowB "]):
        print(f"  {name}: {tot_bits[rt]/8:12,.0f} B  {tot_syms[rt]:10,.0f} "
              f"syms  {tot_bits[rt]/max(tot_syms[rt],1):.3f} bits/sym")
    # positional profile, coarse buckets
    print("bits/sym by position bucket (8-wide):")
    for rt, name in enumerate(["read1", "rowA ", "rowB "]):
        row = []
        for b0 in range(0, 104, 8):
            s = syms_by_rowpos[rt, b0:b0 + 8].sum()
            bts = bits_by_rowpos[rt, b0:b0 + 8].sum()
            row.append(f"{bts/max(s,1):.2f}" if s > 0 else "  - ")
        print(f"  {name}: " + " ".join(row))


if __name__ == "__main__":
    main()
