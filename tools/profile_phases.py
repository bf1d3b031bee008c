"""Phase-level wall profiling of the SE compress path on one TPU chip.

Times, per batch: host pad/transfer, _model_batch (modeling + state update,
blocked), and the group-flush rANS emission, separately. Also decomposes
_model_batch into sub-jits (lookup/modeling vs collect_updates vs model_update)
on the largest batch shape to attribute device time.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode
from fqsqueezer_tpu import pipeline
from fqsqueezer_tpu.io import fastq
from fqsqueezer_tpu.utils.corpus import write_fastq_corpus
from fqsqueezer_tpu.streams import dna, meta, quality, common
from fqsqueezer_tpu.ops import models as M, tables

CORPUS = "/tmp/fqtz_bench_se.fastq"


def block(x):
    jax.block_until_ready(x)
    return x


def main():
    if not os.path.exists(CORPUS):
        write_fastq_corpus(CORPUS, 100_000, 100, 4_600_000, seed=42)

    p = Params()
    p.genome_size = 5
    p.adjust_kmer_sizes()
    p.dna_mode = DnaMode.SE_ORIGINAL
    p.quality_mode = QualityMode.ILLUMINA_8
    p.id_mode = IdMode.NONE
    p.verbosity = 0

    data = fastq.read_fastq(CORPUS)
    print(f"devices: {jax.devices()}", flush=True)

    dcfg, qcfg, mcfg, icfg = make = pipeline.make_configs(p)
    state = pipeline.state_create(dcfg, qcfg, icfg)
    qfwd, _ = quality.qual_maps(qcfg.mode, qcfg.qt)
    qfwd_lut = jnp.asarray(qfwd)

    sched = pipeline.batch_schedule(data.n_reads, p.n_lanes, p.max_batch_reads)
    print(f"schedule: {len(sched)} batches: {[s[2] for s in sched]}", flush=True)

    # ---- full pass, phase-timed (second pass after warmup) ----
    for is_warm in (False, True):
        state = pipeline.state_create(dcfg, qcfg, icfg)
        t_pad = t_model = t_rans = t_pull = 0.0
        group_fc, group_meta = [], []
        t00 = time.time()
        for start, take, padded in sched:
            t0 = time.time()
            codes_u8 = pipeline._pad_batch(data.codes[start:start + take], padded)
            lengths = pipeline._pad_batch(
                data.lengths[start:start + take], padded).astype(np.int32)
            quals_u8 = pipeline._pad_batch(data.quals[start:start + take], padded)
            kp, nm, qp, L8 = pipeline._pack_inputs(
                codes_u8, quals_u8, qcfg, np.asarray(qfwd_lut))
            c_d = block(jnp.asarray(kp))
            n_d = block(jnp.asarray(nm))
            q_d = block(jnp.asarray(qp))
            l_d = block(jnp.asarray(lengths))
            id_b = tuple(jnp.asarray(a)
                         for a in pipeline.ids.zero_id_batch(padded))
            t_pad += time.time() - t0

            t0 = time.time()
            grids, state = pipeline._model_batch(
                dcfg, qcfg, mcfg, icfg, state, c_d, n_d, q_d, l_d, id_b)
            block(state.dna.model)
            block(grids[-1][0])
            t_model += time.time() - t0
            group_fc.append(grids)
            group_meta.append((take, codes_u8.shape[1]))
        # rans chain (reverse) for 3 streams
        t0 = time.time()
        n_streams = 3
        outs = []
        for si in range(n_streams):
            st = jnp.full((p.n_lanes,), 1 << 16, jnp.uint32)
            for k in range(len(group_meta) - 1, -1, -1):
                f16, c16 = group_fc[k][si]
                words, n_words, st = pipeline._rans_grid(
                    f16, c16, p.scale_bits, st)
                outs.append((words, n_words))
            block(st)
        t_rans += time.time() - t0
        t0 = time.time()
        pulled = [(np.asarray(w), int(n)) for w, n in outs]
        t_pull += time.time() - t0
        total = time.time() - t00
        tag = "WARM" if is_warm else "COLD"
        print(f"[{tag}] total={total:.2f}s pad+h2d={t_pad:.2f} "
              f"model={t_model:.2f} rans={t_rans:.2f} pull={t_pull:.2f}",
              flush=True)

    # ---- decompose the big-batch _model_batch ----
    start, take, padded = sched[-2] if len(sched) > 1 else sched[0]
    codes_u8 = jnp.asarray(pipeline._pad_batch(data.codes[start:start + take], padded))
    lengths = jnp.asarray(pipeline._pad_batch(
        data.lengths[start:start + take], padded).astype(np.int32))
    quals_u8 = jnp.asarray(pipeline._pad_batch(data.quals[start:start + take], padded))
    codes = codes_u8.astype(jnp.int32)
    kcodes = jnp.where(codes >= 4, 0, codes)
    qsyms = qfwd_lut[quals_u8.astype(jnp.int32)]

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def j_eff(dcfg, state, codes, kcodes, lengths):
        return dna.dna_effective_kcodes(dcfg, state, codes, kcodes, lengths)

    @functools.partial(jax.jit, static_argnums=0)
    def j_modeling(dcfg, state, codes, eff, lengths):
        return dna.dna_modeling(dcfg, state, codes, eff, lengths)

    @functools.partial(jax.jit, static_argnums=0)
    def j_collect(dcfg, state, codes, eff, lengths, ctx, sym, act):
        return dna.dna_collect_updates(dcfg, state, codes, eff, lengths,
                                       ctx, sym, act)

    @functools.partial(jax.jit, static_argnums=0)
    def j_qual(qcfg, qstate, qsyms, lengths):
        q_ctx, q_f, q_c, q_act = quality.qual_modeling(qcfg, qstate, qsyms, lengths)
        return M.model_update(qstate, q_ctx.reshape(-1), qsyms.reshape(-1),
                              q_act.reshape(-1)), q_f

    @functools.partial(jax.jit, static_argnums=0)
    def j_siv_only(dcfg, state, kcodes, lengths):
        from fqsqueezer_tpu.ops import kmers
        R, L = kcodes.shape
        pos = jnp.arange(L, dtype=jnp.int32)[None, :]
        active = pos < lengths[:, None]
        siv_f = kmers.pack_windows(kcodes, dcfg.siv_len)[0].astype(jnp.int32)
        siv_r = kmers.pack_windows_rc(kcodes, dcfg.siv_len)[0].astype(jnp.int32)
        v_siv = (pos >= dcfg.siv_len - 1) & active
        return tables.siv_update(
            state.siv,
            jnp.concatenate([siv_f.reshape(-1), siv_r.reshape(-1)]),
            jnp.concatenate([v_siv.reshape(-1), v_siv.reshape(-1)]))

    # warm all
    eff = block(j_eff(dcfg, state.dna, codes, kcodes, lengths))
    ctx, sym, f, c, act = j_modeling(dcfg, state.dna, codes, eff, lengths)
    block(ctx)
    st2 = j_collect(dcfg, state.dna, codes, eff, lengths, ctx, sym, act)
    block(st2.siv)
    block(j_qual(qcfg, state.qual, qsyms, lengths)[0])
    block(j_siv_only(dcfg, state.dna, kcodes, lengths))

    def t(fn, *a):
        t0 = time.time()
        r = fn(*a)
        jax.tree_util.tree_map(block, r)
        return time.time() - t0

    n = 3
    for _ in range(n):
        d_eff = t(j_eff, dcfg, state.dna, codes, kcodes, lengths)
        d_mod = t(j_modeling, dcfg, state.dna, codes, eff, lengths)
        d_col = t(j_collect, dcfg, state.dna, codes, eff, lengths, ctx, sym, act)
        d_q = t(j_qual, qcfg, state.qual, qsyms, lengths)
        d_siv = t(j_siv_only, dcfg, state.dna, kcodes, lengths)
        print(f"[batch {padded}] eff(repair)={d_eff*1e3:.0f}ms "
              f"modeling={d_mod*1e3:.0f}ms collect={d_col*1e3:.0f}ms "
              f"qual={d_q*1e3:.0f}ms siv_only={d_siv*1e3:.0f}ms", flush=True)


if __name__ == "__main__":
    main()
