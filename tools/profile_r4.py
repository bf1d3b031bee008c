"""Fine-grained TPU timing of the encode hot phases with RELIABLE sync.

jax.block_until_ready under the axon tunnel returns before remote execution
finishes (measured: 9 chained 1.6M-event scatters "complete" in 0.09 ms;
forcing a host pull shows 295 ms). Every timing here therefore runs the op
REPS times chained through a data dependency inside one jit and syncs by
pulling one scalar to host; per-op cost = (t(REPS) - t(1)) / (REPS - 1),
which also cancels the ~40 ms tunnel round-trip.

Targets the round-2 profile: modeling ~325 ms, collect ~357 ms, repair
~100 ms, quality ~65 ms per 4096x100 batch. Attributes each to engine
events vs VPU math so the round-3 cuts land where the time is.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode
from fqsqueezer_tpu import pipeline
from fqsqueezer_tpu.io import fastq
from fqsqueezer_tpu.utils.corpus import write_fastq_corpus
from fqsqueezer_tpu.streams import dna, quality
from fqsqueezer_tpu.ops import models as M, tables, kmers

CORPUS = "/tmp/fqtz_bench_se.fastq"
REPS = 8


def sync(r):
    leaves = jax.tree_util.tree_leaves(r)
    x = leaves[0]
    np.asarray(x.reshape(-1)[0] if x.ndim else x)


def t_chain(label, fn, state0, n_events=0, reps=REPS):
    """fn: state -> state (same pytree structure). Times `reps` chained
    applications inside one jit minus a 1-application baseline. Big graphs
    (whole dna_modeling) must pass a small `reps` — the remote compile
    service rejects the 8x-unrolled HLO body with HTTP 413."""

    @partial(jax.jit, static_argnums=1)
    def run(s, r):
        def body(_, s):
            return fn(s)
        return jax.lax.fori_loop(0, r, body, s)

    sync(run(state0, 1))
    sync(run(state0, reps))
    t0 = time.time()
    sync(run(state0, 1))
    t1 = time.time() - t0
    t0 = time.time()
    sync(run(state0, reps))
    tR = time.time() - t0
    per = (tR - t1) / (reps - 1)
    ev = f"  ({n_events/per/1e6:6.1f} M ev/s)" if n_events else ""
    print(f"{label:<44s} {per*1e3:8.2f} ms{ev}", flush=True)
    return per


def t_seq(label, fn, state0, consts=(), reps=6):
    """Python-level chaining for graphs too big for the fori_loop wrapper
    (the remote compile service 413s on the unrolled body — and on closure-
    captured MB-scale arrays, which inline as HLO constants: pass them via
    `consts` instead): jit fn once, dispatch it `reps` times feeding each
    output to the next call, sync once."""
    jfn = jax.jit(fn)
    sync(jfn(state0, *consts))
    s = state0
    t0 = time.time()
    s = jfn(s, *consts)
    sync(s)
    t1 = time.time() - t0
    s = state0
    t0 = time.time()
    for _ in range(reps):
        s = jfn(s, *consts)
    sync(s)
    tR = time.time() - t0
    per = (tR - t1) / (reps - 1)
    print(f"{label:<44s} {per*1e3:8.2f} ms", flush=True)
    return per


def main():
    if not os.path.exists(CORPUS):
        write_fastq_corpus(CORPUS, 100_000, 100, 4_600_000, seed=42)

    p = Params()
    p.genome_size = 5
    p.adjust_kmer_sizes()
    p.dna_mode = DnaMode.SE_ORIGINAL
    p.quality_mode = QualityMode.ILLUMINA_8
    p.id_mode = IdMode.NONE
    data = fastq.read_fastq(CORPUS)
    print(f"devices: {jax.devices()}", flush=True)

    dcfg, qcfg, mcfg, icfg = pipeline.make_configs(p)
    print(f"cfg: siv_len={dcfg.siv_len} smer={dcfg.smer_len} "
          f"bmer={dcfg.bmer_len} mix_w={dcfg.mix_w} "
          f"repair={dcfg.repair_iters} rounds={dcfg.claim_rounds} "
          f"local_rc={dcfg.local_rc} ramp={dcfg.prefix_ramp}", flush=True)
    state = pipeline.state_create(dcfg, qcfg, icfg)
    qfwd, _ = quality.qual_maps(qcfg.mode, qcfg.qt)

    R, L = 4096, 100
    codes_u8 = pipeline._pad_batch(data.codes[1024:1024 + R], R)
    lengths = jnp.asarray(pipeline._pad_batch(
        data.lengths[1024:1024 + R], R).astype(np.int32))
    quals_u8 = pipeline._pad_batch(data.quals[1024:1024 + R], R)
    codes = jnp.asarray(codes_u8.astype(np.int32))
    kcodes = jnp.where(codes >= 4, 0, codes)
    qsyms = jnp.asarray(qfwd)[jnp.asarray(quals_u8.astype(np.int32))]

    # warm the state with one real batch so tables look mid-run
    st = state.dna
    st = dna.dna_apply_batch(dcfg, st, codes, kcodes, lengths)
    sync(st.model)

    eff = dna.dna_effective_kcodes(dcfg, st, codes, kcodes, lengths)
    ctx, sym, f, c, act = dna.dna_modeling(dcfg, st, codes, eff, lengths)
    sync(ctx)

    n_pos = R * L
    n2 = 2 * n_pos

    # ---------------- collect sub-parts ----------------
    print("\n== collect_updates sub-parts ==", flush=True)

    def f_model(s):
        return M.model_update(s, ctx.reshape(-1), sym.reshape(-1),
                              act.reshape(-1))
    t_chain("model_update (fine, 410k ev)", f_model, st.model, n_pos)

    cctx = dna._n_model_ctx(dcfg) + dna._coarse_ctx(dcfg, ctx)

    def f_cmodel(s):
        return M.model_update(s, cctx.reshape(-1), sym.reshape(-1),
                              act.reshape(-1))
    t_chain("model_update (coarse via merged, 410k ev)", f_cmodel, st.model,
            n_pos)

    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    active = pos < lengths[:, None]
    siv_f = kmers.pack_windows(kcodes, dcfg.siv_len)[0].astype(jnp.int32)
    siv_r = kmers.pack_windows_rc(kcodes, dcfg.siv_len)[0].astype(jnp.int32)
    v_siv = (pos >= dcfg.siv_len - 1) & active
    keys2 = jnp.concatenate([siv_f.reshape(-1), siv_r.reshape(-1)])
    vs2 = jnp.concatenate([v_siv.reshape(-1), v_siv.reshape(-1)])

    def f_siv(s):
        return tables.siv_update(s, keys2, vs2)
    t_chain("siv_update (820k ev)", f_siv, st.siv, n2)

    def mk_events(k):
        ctx_lo, ctx_hi = kmers.pack_windows(kcodes, k - 1)
        ctx_lo = kmers.shift_right(ctx_lo, 1)
        ctx_hi = kmers.shift_right(ctx_hi, 1)
        rc_lo, rc_hi = kmers.pack_windows_rc(kcodes, k - 1)
        rc_base = 3 - kmers.shift_right(kcodes, k - 1)
        vk = (pos >= k - 1) & active
        lo = jnp.concatenate([ctx_lo.reshape(-1), rc_lo.reshape(-1)])
        hi = jnp.concatenate([ctx_hi.reshape(-1), rc_hi.reshape(-1)])
        base = jnp.concatenate([kcodes.reshape(-1), rc_base.reshape(-1)])
        valid = jnp.concatenate([vk.reshape(-1), vk.reshape(-1)])
        return lo, hi, base, valid

    if dcfg.canon:
        def mk_kevents(k, log2b):
            c0 = k - 1
            ctx_lo, ctx_hi = kmers.pack_windows(kcodes, k - 1)
            ctx_lo = kmers.shift_right(ctx_lo, 1)[:, c0:]
            ctx_hi = kmers.shift_right(ctx_hi, 1)[:, c0:]
            fwd_base = kcodes[:, c0:]
            vk = active[:, c0:]
            r_lo, r_hi = kmers.pack_windows_rc(kcodes, k - 1)
            r_lo = kmers.shift_right(r_lo, 1)[:, c0:]
            r_hi = kmers.shift_right(r_hi, 1)[:, c0:]
            bkt, tag = dna._canon_insert(ctx_lo, ctx_hi, r_lo, r_hi,
                                         fwd_base, k, log2b)
            return bkt.reshape(-1), tag.reshape(-1), vk.reshape(-1)

        s_ev = mk_kevents(dcfg.smer_len, dcfg.smer_log2_buckets)
        b_ev = mk_kevents(dcfg.bmer_len, dcfg.bmer_log2_buckets)

        def f_stc(s):
            return tables.ktable_update(s, *s_ev,
                                        log2_base=dcfg.smer_log2_buckets)
        t_chain("s ktable_update (~410k ev)", f_stc, st.s_tc, s_ev[0].shape[0])

        def f_btc(s):
            return tables.ktable_update(s, *b_ev,
                                        log2_base=dcfg.bmer_log2_buckets)
        t_chain("b ktable_update (~410k ev)", f_btc, st.b_tc, b_ev[0].shape[0])
    else:
        s_ev = mk_events(dcfg.smer_len)
        b_ev = mk_events(dcfg.bmer_len)

        def f_stc(s):
            return tables.table_update(s, *s_ev,
                                       log2_base=dcfg.smer_log2_buckets,
                                       rounds=dcfg.claim_rounds)
        t_chain("s table_update (820k ev, full)", f_stc, st.s_tc, n2)

        def f_btc(s):
            return tables.table_update(s, *b_ev,
                                       log2_base=dcfg.bmer_log2_buckets,
                                       rounds=dcfg.claim_rounds)
        t_chain("b table_update (820k ev, full)", f_btc, st.b_tc, n2)

    # ---------------- modeling sub-parts ----------------
    print("\n== modeling sub-parts ==", flush=True)

    def f_parts(s):
        parts, _ = dna._window_parts(dcfg, st._replace(siv=s), kcodes,
                                     lengths)
        return s + parts[0][0, 0, 0].astype(jnp.uint32)
    t_chain("global finds (siv+s+b, 1.23M ev)", f_parts, st.siv, 3 * n_pos)

    def f_modeling(s, st_, codes, eff, lengths):
        ctx2, sym2, f2, c2, _ = dna.dna_modeling(
            dcfg, st_._replace(model=s), codes, eff, lengths)
        return s + f2[0, 0]
    t_seq("dna_modeling FULL (row scan)", f_modeling, st.model,
          (st, codes, eff, lengths))

    cfg_noloc = dna.DnaConfig(**{**dcfg.__dict__, "local_log2_cells": 0})

    def f_modeling_nl(s, st_, codes, eff, lengths):
        ctx2, sym2, f2, c2, _ = dna.dna_modeling(
            cfg_noloc, st_._replace(model=s), codes, eff, lengths)
        return s + f2[0, 0]
    t_seq("dna_modeling local_cells=0 (flat)", f_modeling_nl, st.model,
          (st, codes, eff, lengths))

    cfg_nomix = dna.DnaConfig(**{**dcfg.__dict__, "mix_w": 0})
    st_nomix = st

    def f_modeling_nm(s, st_, codes, eff, lengths):
        ctx2, sym2, f2, c2, _ = dna.dna_modeling(
            cfg_nomix, st_._replace(model=s), codes, eff, lengths)
        return s + f2[0, 0]
    t_seq("dna_modeling mix_w=0 (no coarse)", f_modeling_nm, st.model,
          (st_nomix, codes, eff, lengths))

    cfg_lite = dna.DnaConfig(**{**dcfg.__dict__, "local_lite": True})

    def f_modeling_lt(s, st_, codes, eff, lengths):
        ctx2, sym2, f2, c2, _ = dna.dna_modeling(
            cfg_lite, st_._replace(model=s), codes, eff, lengths)
        return s + f2[0, 0]
    t_seq("dna_modeling local_lite", f_modeling_lt, st.model,
          (st, codes, eff, lengths))

    # local insert cost alone: one full batch of row updates
    def f_localins(s, eff, lengths):
        ls, lb, lm = s, s, jnp.zeros((1, 1), jnp.int32)
        eff_rows = dna.common.to_row_blocks(eff, n_lanes=dcfg.n_lanes)
        len_rows = dna.common.to_read_grid(lengths, dcfg.n_lanes).T

        def row(carry, x):
            ls, lb = carry
            e_r, l_r = x
            ls, lb, _ = dna.local_row_update(
                dcfg, ls, lb, jnp.zeros((1, 1), jnp.int32), e_r,
                jnp.zeros_like(e_r), jnp.zeros_like(e_r),
                jnp.zeros_like(e_r, dtype=bool), l_r, row=0)
            return (ls, lb), 0
        (ls, lb), _ = jax.lax.scan(row, (ls, lb), (eff_rows, len_rows))
        return ls + lb[0, 0]
    t_seq("local inserts x4 rows", f_localins,
          (tables.klocal_create if dcfg.canon else tables.local_create)(
              dcfg.local_log2_cells), (eff, lengths))

    # cdf math alone (mix): gather fine+coarse rows and quantize
    def f_cdf(s, st_, ctx, sym):
        cdf = dna._dna_cdf(dcfg, st_._replace(model=s), None, ctx,
                           dcfg.scale_bits)
        ff, cc = M.cdf_encode_lookup(cdf, sym)
        return s + ff[0, 0]
    t_seq("cdf mix + quantize [4096,100]", f_cdf, st.model,
          (st, ctx, sym))

    # rank/ctx math alone (no gathers): feed counts directly
    counts = jnp.ones((R, L, 4), jnp.int32)
    level = jnp.full((R, L), 2, jnp.int32)
    pb = dna._pos_bucket(pos, lengths[:, None])
    let_ctx = dna._letters_plane(dcfg, codes, pos, pb)

    def f_rank(s, counts, level, codes, let_ctx):
        ctx2, sym2 = dna._ctx_sym_from_counts(
            dcfg, counts + s[0, 0, None, None, None], level, codes, active,
            pb, let_ctx, pos)
        return s + ctx2[0, 0]
    t_seq("rank+ctx VPU math [4096,100]", f_rank,
          jnp.zeros((1, 1), jnp.int32), (counts, level, codes, let_ctx))

    # ---------------- repair ----------------
    print("\n== repair ==", flush=True)

    def f_eff(s, st_, codes, kcodes, lengths):
        return dna.dna_effective_kcodes(dcfg, st_, codes,
                                        kcodes, lengths)[..., :1] * 0 + s
    t_seq(f"dna_effective_kcodes ({dcfg.repair_iters} iters)", f_eff,
          jnp.zeros((R, 1), jnp.int32), (st, codes, kcodes, lengths))

    # ---------------- quality ----------------
    print("\n== quality ==", flush=True)

    def f_qual(s, qsyms, lengths):
        q_ctx, q_f, q_c, q_act = quality.qual_modeling(qcfg, s, qsyms,
                                                       lengths)
        return M.model_update(s, q_ctx.reshape(-1), qsyms.reshape(-1),
                              q_act.reshape(-1))
    t_seq("qual modeling+update", f_qual, state.qual, (qsyms, lengths))


if __name__ == "__main__":
    main()
