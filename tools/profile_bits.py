"""DNA-stream bit attribution on the standard corpus (CPU-friendly).

Replays the encoder's modeling pass batch by batch and attributes the
modeled bits  -log2(freq / 2^sb)  of every coded position to:
  * branch (letters vs code model) and position-in-read zone,
  * cascade level and coded rank,
  * fine-context-row maturity (total count at lookup time).
This is the analog of the reference's ctx.log dev statistics — it answers
"where do our DNA bytes actually go" so ratio work targets the right bucket.

Usage: python tools/profile_bits.py [n_reads]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode
from fqsqueezer_tpu import pipeline
from fqsqueezer_tpu.io import fastq
from fqsqueezer_tpu.streams import dna
from fqsqueezer_tpu.ops import tables
from fqsqueezer_tpu.utils.corpus import write_fastq_corpus

CORPUS = "/tmp/fqtz_bench_se.fastq"


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

    sb = dcfg.scale_bits
    # accumulators
    bits_by_level = np.zeros(6)          # letters=5
    cnt_by_level = np.zeros(6, np.int64)
    bits_by_rank = np.zeros(6)           # code branch only; rank 0..4 (+N)
    cnt_by_rank = np.zeros(6, np.int64)
    bits_by_pos = np.zeros(16)
    bits_by_tf = np.zeros(8)             # fine-row total (log2 buckets)
    cnt_by_tf = np.zeros(8, np.int64)

    sched = pipeline.batch_schedule(n, p.n_lanes, p.max_batch_reads)
    for start, take, padded in sched:
        codes = jnp.asarray(pipeline._pad_batch(
            data.codes[start:start + take], padded).astype(np.int32))
        lengths = jnp.asarray(pipeline._pad_batch(
            data.lengths[start:start + take], padded).astype(np.int32))
        kcodes = jnp.where(codes >= 4, 0, codes)

        if dcfg.row_global:
            eff, ctx, sym, f, c, act, s_tc, b_tc = dna.dna_process_batch_rg(
                dcfg, state, codes, kcodes, lengths)
            state = state._replace(s_tc=s_tc, b_tc=b_tc)
        else:
            eff = dna.dna_effective_kcodes(dcfg, state, codes, kcodes,
                                           lengths)
            ctx, sym, f, c, act = dna.dna_modeling(dcfg, state, codes, eff,
                                                   lengths)
        # recompute level/pb from the packed fine ctx (bit layout _code_ctx)
        ctx_np = np.asarray(ctx)
        act_np = np.asarray(act)
        f_np = np.asarray(f).astype(np.float64)
        sym_np = np.asarray(sym)
        is_let = ctx_np >= (1 << dna.CODE_CTX_BITS)
        level = np.where(is_let, 5, (ctx_np & 3) + 1)
        pb = np.where(is_let, (ctx_np >> 15) & 0xF, (ctx_np >> 13) & 0xF)
        bits = np.where(act_np, -np.log2(np.maximum(f_np, 1) / (1 << sb)), 0)
        # fine-row maturity at lookup time
        model_np = np.asarray(state.model)
        tf = model_np[np.minimum(ctx_np, model_np.shape[0] - 1)].sum(-1)
        tfb = np.minimum(np.log2(1 + tf).astype(np.int64), 7)

        m = act_np
        np.add.at(bits_by_level, level[m], bits[m])
        np.add.at(cnt_by_level, level[m], 1)
        code_m = m & ~is_let
        np.add.at(bits_by_rank, np.minimum(sym_np[code_m], 5), bits[code_m])
        np.add.at(cnt_by_rank, np.minimum(sym_np[code_m], 5), 1)
        np.add.at(bits_by_pos, pb[m], bits[m])
        np.add.at(bits_by_tf, tfb[m], bits[m])
        np.add.at(cnt_by_tf, tfb[m], 1)

        state = dna.dna_collect_updates(dcfg, state, codes, eff, lengths,
                                        ctx, sym, act,
                                        skip_sb=dcfg.row_global)
        state = jax.tree_util.tree_map(
            lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
            else a, state)
        print(f"  batch {start}+{take} done", flush=True)

    total = bits_by_level.sum()
    print(f"\nTOTAL modeled bits: {total/8:,.0f} bytes")
    names = ["none", "pmer", "smer", "mixed", "bmer", "letters"]
    for i, nm in enumerate(names):
        if cnt_by_level[i]:
            print(f"  level {nm:8} {bits_by_level[i]/8:12,.0f} B "
                  f"({100*bits_by_level[i]/total:5.1f}%) "
                  f"n={cnt_by_level[i]:,} "
                  f"avg={bits_by_level[i]/max(1,cnt_by_level[i]):.3f} b")
    print("code branch by rank:")
    for r in range(6):
        if cnt_by_rank[r]:
            print(f"  rank {r} {bits_by_rank[r]/8:12,.0f} B "
                  f"n={cnt_by_rank[r]:,} "
                  f"avg={bits_by_rank[r]/max(1,cnt_by_rank[r]):.3f} b")
    print("by fine-row total (log2 buckets):")
    for i in range(8):
        if cnt_by_tf[i]:
            print(f"  tf~2^{i} {bits_by_tf[i]/8:12,.0f} B "
                  f"n={cnt_by_tf[i]:,} "
                  f"avg={bits_by_tf[i]/max(1,cnt_by_tf[i]):.3f} b")
    print("by position bucket:", " ".join(f"{b/8:,.0f}" for b in bits_by_pos))


if __name__ == "__main__":
    main()
