"""Compress / decompress orchestration.

The TPU analog of the reference CApplication pipelines
(/root/reference/fqs/application.cpp:111-131,509-760): instead of a reader
thread + T worker threads with barrier-synced deferred inserts, the file is
parsed host-side into padded matrices and streamed through jitted device
batches. One batch = one sync interval: all tables/models are frozen for the
batch and updated once at its end, identically on the encode and decode sides
(the reference's deterministic-staleness argument, application.cpp:622).

Early batches are small so young tables converge quickly, doubling up to
max_batch_reads (the analog of calc_no_synchronizations' decaying sync
frequency, application.h:85-92).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

import zlib

from . import archive
from .io import fastq
from .params import Params, QualityMode, IdMode, DnaMode, WorkMode
from .streams import common, dna, ids, meta, quality


class CodecState(NamedTuple):
    dna: dna.DnaState
    meta: jax.Array
    qual: Optional[jax.Array]
    id: Optional[jax.Array]


def make_configs(p: Params):
    is_pe = p.dna_mode in (DnaMode.PE_ORIGINAL, DnaMode.PE_SORTED)
    # row-global table updates replace the in-batch local tables outright.
    # On a mesh, each dp shard's row scan carries its OWN copy of the
    # tp-sharded tables (shard-local freshness — the analog of the
    # reference's per-thread local deltas, dna.cpp:95-107), and the
    # authoritative cross-batch evolution is the batch-level collect on the
    # frozen state, identical on every device (sharded._grids_step).
    row_global = p.dna_row_global > 0
    dcfg = dna.DnaConfig(
        siv_len=p.siv_len, smer_len=p.smer_len, bmer_len=p.bmer_len,
        prefix_len=p.prefix_len, scale_bits=p.scale_bits, n_lanes=p.n_lanes,
        smer_log2_buckets=p.smer_log2_buckets,
        bmer_log2_buckets=p.bmer_log2_buckets,
        row_global=row_global,
        local_log2_cells=0 if row_global else p.local_log2_cells,
        local_model_inc=p.local_model_inc,
        canon=p.dna_canon > 0,
        mix_w=p.dna_mix_w, mix_b=p.dna_mix_b,
        repair_iters=p.dna_repair_iters,
        claim_rounds=p.dna_claim_rounds,
        local_lite=p.dna_local_lite > 0,
        local_rc=p.dna_local_rc > 0,
        pmer_gate=p.dna_pmer_gate,
        # prefix ramp range-reads go through be.siv_words (tp shards mask
        # and psum), so the flag holds on any mesh
        prefix_ramp=p.dna_prefix_ramp > 0,
        sorted_ctx=(p.dna_sorted_ctx > 0
                    and p.dna_mode in (DnaMode.SE_SORTED, DnaMode.PE_SORTED)),
        # anchor machinery on single-chip AND mesh paths (round 4): the
        # mesh replicates the pair table per device (sharded.state_specs)
        # and evolves it from the gathered batch, so anchors replay
        # identically on every shard. Mesh archives written BEFORE the
        # anchors reached the mesh carry no pe stream despite a nonzero
        # pe_log2_buckets in the header — the dna_pe_mesh knob (absent =>
        # legacy 0) gates mesh enablement so they keep decoding
        pe_log2_buckets=p.pe_log2_buckets if is_pe and (
            p.mesh_dp * p.mesh_tp <= 1 or p.dna_pe_mesh > 0) else 0,
        pe_pos_ctx=p.dna_pe_pos_ctx > 0,
        ctx_v=p.dna_ctx_v,
        # rough rescue needs the rg row scan (streak ages), canonical
        # s-table probes, and the widened v2+ context layout
        rough=1 if (p.dna_rough > 0 and row_global and p.dna_canon > 0
                    and p.dna_ctx_v >= 2) else 0,
        sb_proto=p.dna_sb_proto if p.dna_canon > 0 else 0,
        route_sb=1 if (p.mesh_route_sb > 0 and p.mesh_dp * p.mesh_tp > 1
                       and row_global and p.dna_canon > 0) else 0,
        let_pb2=p.dna_let_pb2)
    qmode = p.quality_mode.value
    qcfg = None
    if p.quality_mode != QualityMode.NONE:
        qcfg = quality.QualConfig(
            mode=qmode, qt=p.quality_thr, scale_bits=p.scale_bits,
            n_lanes=p.n_lanes,
            with_local=p.local_log2_cells > 0 and p.local_model_inc > 0,
            local_inc=p.local_model_inc)
    mcfg = meta.MetaConfig(
        scale_bits=p.scale_bits, n_lanes=p.n_lanes,
        with_lcp=p.dna_mode in (DnaMode.SE_SORTED, DnaMode.PE_SORTED),
        lcp_stride=2 if p.dna_mode in (DnaMode.PE_ORIGINAL,
                                       DnaMode.PE_SORTED) else 1)
    icfg = None
    if p.id_mode != IdMode.NONE:
        icfg = ids.IdConfig(max_id_len=p.max_id_len,
                            n_fields=p.id_n_fields, scale_bits=p.scale_bits,
                            n_lanes=p.n_lanes, codec_v=p.id_codec_v)
    return dcfg, qcfg, mcfg, icfg


def state_create(dcfg, qcfg, icfg=None) -> CodecState:
    return CodecState(
        dna=dna.dna_state_create(dcfg),
        meta=meta.meta_state_create(),
        qual=None if qcfg is None else quality.qual_state_create(qcfg),
        id=None if icfg is None else ids.id_state_create())


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _encode_batch(dcfg, qcfg, mcfg, icfg, state: CodecState, codes, kcodes,
                  lengths, qsyms, id_batch):
    lcp = (meta.compute_lcp(codes, lengths, mcfg.n_lanes, mcfg.lcp_stride)
           if mcfg.with_lcp else None)
    m_words, m_n, m_states, m_model = meta.meta_encode_batch(
        mcfg, state.meta, lengths, lcp)
    d_words, d_n, d_states, d_state = dna.dna_encode_batch(
        dcfg, state.dna, codes, kcodes, lengths, lcp)
    if qcfg is not None:
        q_words, q_n, q_states, q_model = quality.qual_encode_batch(
            qcfg, state.qual, qsyms, lengths)
    else:
        q_words, q_n, q_states, q_model = (
            jnp.zeros((0,), jnp.uint32), jnp.int32(0),
            jnp.zeros((0,), jnp.uint32), None)
    if icfg is not None:
        i_words, i_n, i_states, i_model = ids.id_encode_batch(
            icfg, state.id, *id_batch)
    else:
        i_words, i_n, i_states, i_model = (
            jnp.zeros((0,), jnp.uint32), jnp.int32(0),
            jnp.zeros((0,), jnp.uint32), None)
    new_state = CodecState(dna=d_state, meta=m_model, qual=q_model,
                           id=i_model)
    return ((m_words, m_n, m_states), (i_words, i_n, i_states),
            (d_words, d_n, d_states), (q_words, q_n, q_states), new_state)


def _pack_inputs(codes_u8: np.ndarray, quals_u8, qcfg, qfwd_np):
    """Host-side bit-packing of per-base inputs so the host->device push is
    ~0.4-0.9 bytes/base instead of 2 (the tunnel to the chip is the scarce
    resource): 2-bit k-codes (4/byte) + 1-bit N mask (8/byte) + quality
    quantized host-side and packed 2 symbols/byte for sub-16-symbol modes.
    Rows must already be padded; columns are padded to a multiple of 8."""
    R, L = codes_u8.shape
    L8 = -(-L // 8) * 8
    if L8 != L:
        codes_u8 = np.pad(codes_u8, ((0, 0), (0, L8 - L)))
        if quals_u8 is not None:
            quals_u8 = np.pad(quals_u8, ((0, 0), (0, L8 - L)))
    k = np.where(codes_u8 >= 4, 0, codes_u8).astype(np.uint8)
    kp = (k[:, 0::4] | (k[:, 1::4] << 2) | (k[:, 2::4] << 4)
          | (k[:, 3::4] << 6))
    nb = (codes_u8 >= 4).astype(np.uint8)
    nm = np.zeros((R, L8 // 8), np.uint8)
    for i in range(8):
        nm |= nb[:, i::8] << i
    if qcfg is None:
        qp = np.zeros((R, 1), np.uint8)
    elif qcfg.n_sym > 16:  # lossless: one symbol per byte
        qp = qfwd_np[np.minimum(quals_u8, 95)].astype(np.uint8)
    else:
        qs = qfwd_np[np.minimum(quals_u8, 95)].astype(np.uint8)
        qp = qs[:, 0::2] | (qs[:, 1::2] << 4)
    return (np.ascontiguousarray(kp), np.ascontiguousarray(nm),
            np.ascontiguousarray(qp), L8)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3), donate_argnums=(4,))
def _model_batch(dcfg, qcfg, mcfg, icfg, state: CodecState, codes_pack,
                 nmask_pack, q_pack, lengths, id_batch, n_valid=None):
    """Modeling + state evolution only: returns per-stream (freq, cum) lane
    grids (uint16, kept device-resident by the caller for deferred
    group-chained rANS emission), plus the new state. Inputs arrive
    bit-packed (_pack_inputs) and are unpacked with cheap vector ops."""
    from .ops import models as _m
    from .streams import ids as _ids

    R = codes_pack.shape[0]
    L = codes_pack.shape[1] * 4
    kcodes = ((codes_pack[:, :, None] >> (2 * jnp.arange(4, dtype=jnp.uint8)))
              & 3).astype(jnp.int32).reshape(R, L)
    nbit = ((nmask_pack[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
            ).reshape(R, L)
    codes = jnp.where(nbit > 0, 4, kcodes)
    if qcfg is None:
        qsyms = jnp.zeros((R, L), jnp.int32)
    elif qcfg.n_sym > 16:
        qsyms = q_pack.astype(jnp.int32)
    else:
        qsyms = ((q_pack[:, :, None] >> (4 * jnp.arange(2, dtype=jnp.uint8)))
                 & 15).astype(jnp.int32).reshape(R, L)

    lcp = (meta.compute_lcp(codes, lengths, mcfg.n_lanes, mcfg.lcp_stride)
           if mcfg.with_lcp else None)

    m_ctx, m_syms, m_f, m_c = meta.meta_modeling(mcfg, state.meta, lengths, lcp)
    m_model = _m.model_update(
        state.meta, m_ctx.reshape(-1), m_syms.reshape(-1),
        jnp.ones(m_ctx.size, dtype=bool))

    if dcfg.pe_log2_buckets > 0:
        # anchored 3-row recoding: the DNA codec processes codes3, the pair
        # events and output reads stay in true interleaved layout
        (codes3, lengths3, anchor_mask3, lcp3, pe_syms, pe_act, pe_f,
         pe_c, pos_map3) = dna.dna_pe_encode(dcfg, state.dna, codes, lengths,
                                             lcp=lcp)
        kcodes3 = jnp.where(codes3 >= 4, 0, codes3)
        if dcfg.row_global:
            (eff, d_ctx, d_sym, d_f, d_c, d_act, s_tc,
             b_tc) = dna.dna_process_batch_rg(
                dcfg, state.dna, codes3, kcodes3, lengths3, lcp=lcp3,
                anchor_mask=anchor_mask3, pos_map=pos_map3)
            d_state = dna.dna_collect_updates(
                dcfg, state.dna._replace(s_tc=s_tc, b_tc=b_tc), codes3, eff,
                lengths3, d_ctx, d_sym, d_act, pe_syms=pe_syms, pe_act=pe_act,
                codes_true=codes, lengths_true=lengths, skip_sb=True)
        else:
            eff = dna.dna_effective_kcodes(
                dcfg, state.dna, codes3, kcodes3, lengths3)
            d_ctx, d_sym, d_f, d_c, d_act = dna.dna_modeling(
                dcfg, state.dna, codes3, eff, lengths3, lcp=lcp3,
                anchor_mask=anchor_mask3, pos_map=pos_map3)
            d_state = dna.dna_collect_updates(
                dcfg, state.dna, codes3, eff, lengths3, d_ctx, d_sym, d_act,
                pe_syms=pe_syms, pe_act=pe_act,
                codes_true=codes, lengths_true=lengths)
    elif dcfg.row_global:
        (eff, d_ctx, d_sym, d_f, d_c, d_act, s_tc,
         b_tc) = dna.dna_process_batch_rg(
            dcfg, state.dna, codes, kcodes, lengths, lcp=lcp)
        d_state = dna.dna_collect_updates(
            dcfg, state.dna._replace(s_tc=s_tc, b_tc=b_tc), codes, eff,
            lengths, d_ctx, d_sym, d_act, skip_sb=True)
    else:
        eff = dna.dna_effective_kcodes(dcfg, state.dna, codes, kcodes, lengths)
        d_ctx, d_sym, d_f, d_c, d_act = dna.dna_modeling(
            dcfg, state.dna, codes, eff, lengths, lcp=lcp)
        d_state = dna.dna_collect_updates(
            dcfg, state.dna, codes, eff, lengths, d_ctx, d_sym, d_act)

    g16 = lambda a, n: common.to_grid(a, n).astype(jnp.uint16)
    grids = [(g16(m_f, mcfg.n_lanes), g16(m_c, mcfg.n_lanes)),
             (g16(d_f, dcfg.n_lanes), g16(d_c, dcfg.n_lanes))]

    if qcfg is not None:
        q_ctx, q_f, q_c, q_act = quality.qual_modeling(
            qcfg, state.qual, qsyms, lengths)
        q_model = _m.model_update(
            state.qual, q_ctx.reshape(-1), qsyms.reshape(-1), q_act.reshape(-1))
        grids.append((g16(q_f, qcfg.n_lanes), g16(q_c, qcfg.n_lanes)))
    else:
        q_model = None
    if icfg is not None:
        i_ctx, i_syms, i_f, i_c, i_act = _ids.id_modeling(
            icfg, state.id, *id_batch, n_valid=n_valid)
        i_model = _m.model_update(
            state.id, i_ctx.reshape(-1), i_syms.reshape(-1), i_act.reshape(-1))
        grids.append((g16(i_f, icfg.n_lanes), g16(i_c, icfg.n_lanes)))
    else:
        i_model = None
    if dcfg.pe_log2_buckets > 0:
        grids.append((g16(pe_f, dcfg.n_lanes), g16(pe_c, dcfg.n_lanes)))

    new_state = CodecState(dna=d_state, meta=m_model, qual=q_model, id=i_model)
    return grids, new_state


@functools.partial(jax.jit, static_argnums=(2,))
def _rans_grid(f, c, scale_bits, init_states):
    from .ops import rans as _r

    words, n_words, st = _r.rans_encode(
        f.astype(jnp.uint32), c.astype(jnp.uint32), scale_bits, init_states)
    # u16 on device: the device->host tunnel is the scarce resource
    return words.astype(jnp.uint16), n_words, st


@functools.partial(jax.jit, static_argnums=(2,))
def _rans_group(f, c, scale_bits, row_bounds):
    from .ops import rans as _r

    return _r.rans_encode_group(f.astype(jnp.uint32), c.astype(jnp.uint32),
                                scale_bits, row_bounds)


def _rans_group_stream(fcs, scale_bits: int, n_lanes: int):
    """Concatenate one stream's per-batch (f, c) u16 grids (batch order),
    pad rows to the canonical granularity with exact no-ops, and run the
    fused group encode. Returns (words u16 dev, n_per dev, states dev,
    row offsets per batch)."""
    from .ops import rans as _r

    rows = [int(f.shape[0]) for f, _ in fcs]
    bounds = [0]
    for r in rows:
        bounds.append(bounds[-1] + r)
    T = bounds[-1]
    T_pad = -(-T // _r.GROUP_PAD_ROWS) * _r.GROUP_PAD_ROWS
    f = jnp.concatenate(
        [f for f, _ in fcs]
        + ([jnp.full((T_pad - T, n_lanes), 1 << scale_bits, jnp.uint16)]
           if T_pad > T else []), axis=0)
    c = jnp.concatenate(
        [c for _, c in fcs]
        + ([jnp.zeros((T_pad - T, n_lanes), jnp.uint16)]
           if T_pad > T else []), axis=0)
    rb = np.full((_r.GROUP_MAX_BATCHES + 1,), T, np.int32)
    rb[:len(bounds)] = bounds
    words, n_per, states = _rans_group(f, c, scale_bits, jnp.asarray(rb))
    return words, n_per, states


def _trim_words(words_u16, n: int):
    """Device-side slice to a pow2-bucketed prefix of the word buffer (the
    tail is rANS padding): ~2x over the true size instead of the ~6x a
    full-cap pull costs, with a bounded set of tiny slice shapes to compile.
    Returns a DEVICE array — callers batch all slices into one pipelined
    jax.device_get (the tunnel to the chip is latency-bound, so one pull of
    many buffers beats many serial pulls)."""
    cap = words_u16.shape[0]
    k = 1024
    while k < n:
        k <<= 1
    if k >= cap:
        return words_u16
    return words_u16[:k]


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5),
                   donate_argnums=(6,))
def _decode_batch(dcfg, qcfg, mcfg, icfg, R, L, state: CodecState,
                  m_words, m_states, i_words, i_states,
                  d_words, d_states, q_words, q_states,
                  pe_words=None, pe_states=None, n_valid=None):
    """Decode one batch; returns the per-stream FINAL lane states so the
    caller can chain them into the next batch of the group."""
    lengths, lcp, m_model, m_x, _ = meta.meta_decode_batch(
        mcfg, state.meta, R, m_words, m_states)
    lengths = jnp.minimum(lengths, L).astype(jnp.int32)
    codes, d_state, d_x, _, d_extras = dna.dna_decode_batch(
        dcfg, state.dna, lengths, d_words, d_states, L,
        lcp=lcp if mcfg.with_lcp else None, lcp_stride=mcfg.lcp_stride,
        pe_words=pe_words, pe_states=pe_states)
    pe_x = d_extras[4] if dcfg.pe_log2_buckets > 0 else None
    if qcfg is not None:
        qsyms, q_model, q_x, _ = quality.qual_decode_batch(
            qcfg, state.qual, lengths, q_words, q_states, L)
    else:
        qsyms, q_model, q_x = jnp.zeros((R, L), jnp.int32), None, q_states
    if icfg is not None:
        (i_flag, i_dsym, i_dmag, i_emat, i_elens, i_model, i_x,
         _) = ids.id_decode_batch(icfg, state.id, R, i_words, i_states,
                                  n_valid)
        id_batch = (i_flag, i_dsym, i_dmag, i_emat, i_elens)
    else:
        id_batch = tuple(jnp.asarray(a) for a in ids.zero_id_batch(R))
        i_model, i_x = None, i_states
    new_state = CodecState(dna=d_state, meta=m_model, qual=q_model,
                           id=i_model)
    # u8 outputs keep the device->host pull at ~1 byte per base
    return (lengths, codes.astype(jnp.uint8), qsyms.astype(jnp.uint8),
            id_batch, new_state, (m_x, d_x, q_x, i_x, pe_x))


GROW_MAX_DOUBLINGS = 4     # growth bits available in cell tags (tables.bucket_of)
GROW_NUM, GROW_DEN = 6, 10  # grow when used/capacity > 0.6 (integer compare)
SIV_PRUNE_NUM, SIV_PRUNE_DEN = 5, 10  # prune singletons when fill > 0.5


def fill_stats_device(dcfg, dna_state):
    """[s_used, b_used, siv_nz] as ONE device array — computed async on
    device so the caller can fold it into an existing batched device_get
    instead of paying a standalone blocking pull per group (the round-3
    profile showed grow_tables' int() pulls as a per-group sync bubble)."""
    from .ops import tables as _t

    fill_fn = _t.ktable_fill_stats if dcfg.canon else _t.table_fill_stats
    su, _ = fill_fn(dna_state.s_tc)
    bu, _ = fill_fn(dna_state.b_tc)
    nz, _ = _t.siv_fill(dna_state.siv)
    return jnp.stack([su, bu, nz])


def grow_tables(dcfg, dna_state, verbosity: int = 0, stats=None):
    """Group-boundary coordinated growth of the s/b-mer tables (the
    reference's barrier-bracketed restruct, application.cpp:894-902 +
    ht_kmer.h:88-112): when a table's fill factor exceeds 0.6 it doubles,
    each cell moving by one tag-derived bit (tables.table_grow). Both sides
    run this at the same boundary on identical state, so the decision and
    the resulting layout are identical — and fill telemetry comes free
    (the reference's filling-factor stats, bit_vec.h:204-230).

    stats: optional host values of fill_stats_device(dcfg, dna_state),
    pulled by the caller as part of a larger batched device_get."""
    from .ops import tables as _t

    new = dna_state
    if stats is None:
        stats = np.asarray(fill_stats_device(dcfg, dna_state))
    grow_fn = _t.ktable_grow if dcfg.canon else _t.table_grow
    cells = _t.KBUCKET if dcfg.canon else _t.BUCKET
    for pre, base, used in (("s", dcfg.smer_log2_buckets, int(stats[0])),
                            ("b", dcfg.bmer_log2_buckets, int(stats[1]))):
        tc = getattr(new, pre + "_tc")
        cur = tc.shape[0].bit_length() - 1
        cap = tc.shape[0] * cells
        if verbosity >= 2:
            print(f"  {pre}mer fill: {used}/{cap} ({used / cap:.3f})"
                  f" [2^{cur} buckets]")
        if cur - base < GROW_MAX_DOUBLINGS and used * GROW_DEN > cap * GROW_NUM:
            new = new._replace(**{pre + "_tc": grow_fn(tc, base)})
            if verbosity >= 1:
                print(f"  {pre}mer table grown to 2^{cur + 1} buckets "
                      f"(fill {used / cap:.2f})")
    if dcfg.canon:
        # clamp u16 slot counters away from the wrap point (cross-slot
        # carry pollution on ultra-repetitive corpora, tables.ktable_clamp);
        # same sweep on both sides at the same boundary
        new = new._replace(s_tc=_t.ktable_clamp(new.s_tc),
                           b_tc=_t.ktable_clamp(new.b_tc))
    # SIV has fixed capacity: when it gets dense (WGS-scale inputs), clear
    # singleton counters — sequencing-error noise — like the reference's
    # conditionally_clear (bit_vec.h:168-202). Same deterministic rule on
    # both sides, so the cascades keep matching.
    nz = int(stats[2])
    cap = 4 * new.siv.shape[0]
    if verbosity >= 2:
        print(f"  siv fill: {nz}/{cap} ({nz / cap:.3f})")
    if nz * SIV_PRUNE_DEN > cap * SIV_PRUNE_NUM:
        new = new._replace(siv=_t.siv_prune(new.siv))
        if verbosity >= 1:
            print(f"  siv pruned (fill {nz / cap:.2f})")
    return new


def payload_crc(crc: int, codes_u8: np.ndarray, lengths: np.ndarray) -> int:
    """Rolling crc32 of the sequence payload (codes + lengths). Quality/ids
    are lossy in most modes, so the integrity check covers what every mode
    must reproduce exactly."""
    crc = zlib.crc32(np.ascontiguousarray(codes_u8, dtype=np.uint8), crc)
    return zlib.crc32(lengths.astype("<i4").tobytes(), crc)


def batch_schedule(n_reads: int, n_lanes: int, max_batch: int,
                   first_batch: int = 0, align: int = 0):
    """Doubling batch sizes: [first, 2*first, ...] capped at max_batch — the
    analog of the reference's decaying sync frequency (application.h:85-92):
    young tables sync often. Intermediate sizes are PADDED to max_batch so
    only TWO jitted shapes exist ({first, max}): a fresh process pays two
    encode/decode compiles instead of one per doubling step (the compile
    service here costs minutes per shape), at the cost of masked no-op rows
    in the few intermediate batches. Returns (start, take, padded) triples.

    align: pad/size granularity; PE uses 2*n_lanes so reads-per-lane stays
    even and mate pairs never straddle a lane boundary."""
    align = align or n_lanes
    first_batch = _first_batch(n_lanes, max_batch, first_batch, align)
    out = []
    start = 0
    size = first_batch
    while start < n_reads:
        take = min(size, n_reads - start)
        out.append((start, take,
                    canonical_padded(take, first_batch, max_batch, align)))
        start += take
        size = min(size * 2, max_batch)
    return out


def _first_batch(n_lanes: int, max_batch: int, first_batch: int, align: int):
    if not first_batch:
        first_batch = max_batch // 16
    first_batch = max(min(first_batch, max_batch), align)
    return -(-first_batch // align) * align


def canonical_padded(take: int, first_batch: int, max_batch: int, align: int):
    """Canonical padded shape of a batch of `take` reads — shared by encoder
    and decoder so both jit the same two shapes."""
    padded = -(-take // align) * align
    return first_batch if padded <= first_batch else max_batch


def _pad_batch(arr: np.ndarray, padded: int):
    take = arr.shape[0]
    if take == padded:
        return arr
    pad_shape = (padded - take,) + arr.shape[1:]
    return np.concatenate([arr, np.zeros(pad_shape, arr.dtype)], axis=0)


def _fifo_pop(pend: list, take: int) -> fastq.FastqData:
    """Pop exactly `take` reads off a FIFO of FastqData chunks (splitting the
    head chunk if needed) as one FastqData."""
    got, need = [], take
    while need:
        d = pend[0]
        if d.n_reads <= need:
            got.append(d)
            pend.pop(0)
            need -= d.n_reads
        else:
            got.append(fastq.FastqData(d.codes[:need], d.quals[:need],
                                       d.lengths[:need], d.ids[:need]))
            pend[0] = fastq.FastqData(d.codes[need:], d.quals[need:],
                                      d.lengths[need:], d.ids[need:])
            need = 0
    return got[0] if len(got) == 1 else fastq.concat_fastq(got)


def _prescan_ids_stream(paths, p: Params, chunk_bytes: int):
    """Id template prescan (one cheap pass, host memory O(chunk)): the max
    id length and numeric-field count the codec fixes in the archive header
    — what the in-RAM path reads off the whole id list. Chunk-wise maxima
    equal the global maxima, and instrument mode prescans the TRANSFORMED
    prefixes like the in-RAM path does."""
    max_len, nf = 8, 1
    for chunk in fastq.stream_fastq(paths, chunk_bytes):
        idl = chunk.ids
        if p.id_mode == IdMode.INSTRUMENT:
            idl = ids.instrument_prefix(idl)
        if idl:
            max_len = max(max_len, max(len(s) for s in idl))
            nf = max(nf, ids.count_fields(idl))
    return max_len, nf


def _stream_interleaved_pe(paths, chunk_bytes: int):
    """Two synchronized streamed cursors over the mate files, yielding
    INTERLEAVED FastqData chunks (pairs adjacent, always an even read
    count) — the reference's PE block reader pulls both mates per block the
    same way (reads_block.h:144-169). Host memory stays O(chunk)."""
    in1, in2 = paths
    its = [iter(fastq.stream_fastq(in1, chunk_bytes)),
           iter(fastq.stream_fastq(in2, chunk_bytes))]
    bufs = ([], [])
    counts = [0, 0]
    done = [False, False]

    def refill(i):
        while not done[i] and counts[i] == 0:
            c = next(its[i], None)
            if c is None:
                done[i] = True
            elif c.n_reads:
                bufs[i].append(c)
                counts[i] += c.n_reads

    while True:
        refill(0)
        refill(1)
        k = min(counts)
        if k == 0:
            if counts[0] != counts[1]:
                raise ValueError(
                    f"PE mate counts differ (stream): one mate file ended "
                    f"with {max(counts)} unpaired reads in the other")
            break
        d1 = _fifo_pop(bufs[0], k)
        d2 = _fifo_pop(bufs[1], k)
        counts[0] -= k
        counts[1] -= k
        yield interleave_pe(d1, d2)


def _stream_batches(paths, p: Params, chunk_bytes: int):
    """Doubling-schedule batches from block-streamed input (identical sizes
    to batch_schedule, so archives match the in-RAM path): FASTQ chunks are
    buffered FIFO and cut into batches; host memory stays O(chunk + batch)
    no matter the file size (reference block streaming, reads_block.h:35-76).
    PE original order streams both mates through the paired chunk reader
    (pairs never split: every chunk and every batch size is even, a
    multiple of 2*n_lanes). Yields (FastqData batch, take, padded)."""
    is_pe = p.dna_mode == DnaMode.PE_ORIGINAL
    align = 2 * p.n_lanes if is_pe else p.n_lanes
    first = _first_batch(p.n_lanes, p.max_batch_reads, 0, align)
    size = first
    pend: list = []    # FIFO of parsed chunks not yet batched
    n_pend = 0
    source = (fastq.external_sort_stream(paths, chunk_bytes)
              if p.dna_mode == DnaMode.SE_SORTED
              else _stream_interleaved_pe(paths, chunk_bytes) if is_pe
              else fastq.stream_fastq(paths, chunk_bytes))

    def pop(take):
        nonlocal n_pend
        n_pend -= take
        return _fifo_pop(pend, take)

    for chunk in source:
        if chunk.n_reads == 0:
            continue
        pend.append(chunk)
        n_pend += chunk.n_reads
        while n_pend >= size:
            yield (pop(size), size,
                   canonical_padded(size, first, p.max_batch_reads, align))
            size = min(size * 2, p.max_batch_reads)
    while n_pend > 0:
        take = min(size, n_pend)
        yield (pop(take), take,
               canonical_padded(take, first, p.max_batch_reads, align))
        size = min(size * 2, p.max_batch_reads)


def compress_file(p: Params, in_path: str, out_path: str,
                  data: Optional[fastq.FastqData] = None,
                  group_mem_bytes: int = 512 << 20,
                  snapshot_prefix: Optional[str] = None,
                  stream_chunk_bytes: int = 0) -> dict:
    """SE compression with group-chained rANS emission: batches are modeled
    forward (tables evolve), their (freq, cum) grids buffered host-side, and
    each group's batches are entropy-coded in REVERSE so lane states chain —
    one state block per stream per group instead of per batch.

    stream_chunk_bytes > 0 block-streams the input instead of loading it
    (WGS-scale memory envelope): original order (SE and PE — PE pairs ride
    the paired chunk reader) and sorted SE (through the external bin sort).
    Id-bearing inputs stream too: a cheap prescan pass over the headers
    fixes the id geometry (max length + field count) before modeling, like
    the reference fixes per-block buffers before coding (reads_block.h:121).
    Only PE sorted (global sort over both mates) and sorted+ids (the
    external bin sort drops ids) still need the whole file."""
    in_paths = list(in_path) if isinstance(in_path, (list, tuple)) else [in_path]
    streaming = stream_chunk_bytes > 0 and data is None
    if streaming:
        if p.dna_mode == DnaMode.PE_SORTED:
            raise ValueError(
                "streamed compression does not support -om s with PE "
                "(sorting pairs by mate1 needs the whole input)")
        if p.dna_mode == DnaMode.SE_SORTED and p.id_mode != IdMode.NONE:
            raise ValueError(
                "streamed sorted-mode compression requires -im n "
                "(the external bin sort does not carry ids)")
        if p.dna_mode == DnaMode.PE_ORIGINAL and len(in_paths) != 2:
            raise ValueError("streamed PE compression needs two mate files")
    elif data is None:
        data = (fastq.concat_fastq([fastq.read_fastq(f) for f in in_paths])
                if len(in_paths) > 1 else fastq.read_fastq(in_paths[0]))
    if data is not None and p.dna_mode == DnaMode.SE_SORTED:
        order = fastq.sort_order(data.codes, data.lengths)
        data = fastq.FastqData(
            codes=data.codes[order], quals=data.quals[order],
            lengths=data.lengths[order],
            ids=[data.ids[i] for i in order])

    id_list = data.ids if data is not None else []
    if p.id_mode == IdMode.INSTRUMENT:
        id_list = ids.instrument_prefix(id_list)
    if p.id_mode != IdMode.NONE:
        if streaming:
            # id template prescan: one cheap streaming pass over the input
            # fixes the header-recorded id geometry the codec needs up front
            p.max_id_len, p.id_n_fields = _prescan_ids_stream(
                in_paths, p, stream_chunk_bytes)
        else:
            p.max_id_len = max(8, max((len(s) for s in id_list), default=8))
            p.id_n_fields = ids.count_fields(id_list)
        id_chain = [None]   # one file-order chain (ids.read_lanes)
    else:
        id_chain = None

    dcfg, qcfg, mcfg, icfg = make_configs(p)
    state = state_create(dcfg, qcfg, icfg)
    with_pe_stream = dcfg.pe_log2_buckets > 0
    n_streams = (2 + (qcfg is not None) + (icfg is not None)
                 + with_pe_stream)

    qfwd_np = (quality.qual_maps(qcfg.mode, qcfg.qt)[0]
               if qcfg is not None else None)

    writer = archive.ArchiveWriter(out_path, p.store_params())
    R_total = data.n_reads if data is not None else 0
    n_bases_total = 0
    stream_bytes = {"meta": 0, "dna": 0, "qual": 0, "id": 0, "pe": 0,
                    "states": 0}
    skeys = (["meta", "dna"] + (["qual"] if qcfg else [])
             + (["id"] if icfg else []) + (["pe"] if with_pe_stream else []))

    group_fc = []      # per batch: [ (f u16, c u16) per stream ]
    group_meta = []    # per batch: (take, L)
    group_bytes = 0
    group_idx = 0
    group_crc = 0

    def flush_group():
        nonlocal group_fc, group_meta, group_bytes, group_idx, group_crc, state
        if not group_meta:
            return
        # ONE fused reverse rANS chain per stream over the group's
        # concatenated grids (replaces one launch per batch per stream);
        # per-batch word counts come back as a vector, and the packed
        # stream's batch slices are contiguous in decode order
        K = len(group_meta)
        per_stream = []
        for si in range(n_streams):
            fcs = [group_fc[k][si] for k in range(K)]
            words, n_per, st = _rans_group_stream(fcs, p.scale_bits,
                                                  p.n_lanes)
            per_stream.append((words, n_per, st))
        ns = jax.device_get([n for _, n, _ in per_stream])
        trimmed = [_trim_words(per_stream[si][0], int(ns[si][:K].sum()))
                   for si in range(n_streams)]
        # ONE pipelined pull for states + all word buffers + the group's
        # table fill stats (async copies are issued for every leaf before
        # the first blocking read; grow_tables then decides without its own
        # standalone pull)
        states_out, pulled, fills = jax.device_get(
            ([st for _, _, st in per_stream], trimmed,
             fill_stats_device(dcfg, state.dna)))
        per_batch_words = [[None] * n_streams for _ in group_meta]
        for si in range(n_streams):
            off = 0
            for k in range(K):
                n = int(ns[si][k])
                per_batch_words[k][si] = (pulled[si][off:off + n], n)
                stream_bytes[skeys[si]] += 2 * n
                off += n
        stream_bytes["states"] += 4 * p.n_lanes * n_streams
        writer.write_group(
            states_out,
            [(take, L, per_batch_words[k])
             for k, (take, L) in enumerate(group_meta)],
            payload_crc=group_crc)
        group_crc = 0
        group_fc, group_meta, group_bytes = [], [], 0
        if id_chain is not None:
            # groups stay independently decodable (resume / parallel decode):
            # the id token chains reset at every group boundary, so the first
            # read of each lane in a group escapes to raw bytes
            id_chain[:] = [None] * len(id_chain)
        state = state._replace(
            dna=grow_tables(dcfg, state.dna, p.verbosity, stats=fills))
        if snapshot_prefix is not None:
            # state AFTER this group's batches = what a decoder needs to
            # START decoding the NEXT group (parallel decode / resume)
            from . import checkpoint

            checkpoint.save_state(
                state, checkpoint.snapshot_path(snapshot_prefix, group_idx + 1))
        group_idx += 1

    is_pe = p.dna_mode in (DnaMode.PE_ORIGINAL, DnaMode.PE_SORTED)
    if streaming:
        def _ids_of(d):
            if icfg is None:
                return []
            return (ids.instrument_prefix(d.ids)
                    if p.id_mode == IdMode.INSTRUMENT else d.ids)

        batches = ((d.codes, d.quals, d.lengths, _ids_of(d), take, padded)
                   for d, take, padded in _stream_batches(
                       in_paths, p, stream_chunk_bytes))
    else:
        batches = ((data.codes[start:start + take],
                    data.quals[start:start + take],
                    data.lengths[start:start + take],
                    id_list[start:start + take], take, padded)
                   for start, take, padded in batch_schedule(
                       R_total, p.n_lanes, p.max_batch_reads,
                       align=2 * p.n_lanes if is_pe else p.n_lanes))
    for codes_raw, quals_raw, lengths_raw, ids_raw, take, padded in batches:
        if streaming:
            R_total += take
            n_bases_total += int(lengths_raw.sum())
        codes_u8 = _pad_batch(codes_raw, padded)
        lengths = _pad_batch(lengths_raw, padded).astype(np.int32)
        quals_u8 = (_pad_batch(quals_raw, padded)
                    if qcfg is not None else None)
        if icfg is not None:
            ids_batch = ids_raw + [b""] * (padded - take)
            id_np = ids.encode_ids_host(
                ids_batch, ids.read_lanes(padded, p.n_lanes),
                icfg.n_fields, icfg.max_id_len, id_chain,
                n_valid=take if icfg.codec_v >= 2 else None)
        else:
            id_np = ids.zero_id_batch(padded)

        kp, nm, qp, L8 = _pack_inputs(codes_u8, quals_u8, qcfg, qfwd_np)
        # crc over the L8-padded width: the decoder reconstructs (and
        # zero-masks) exactly this shape
        crc_codes = (codes_u8 if codes_u8.shape[1] == L8 else
                     np.pad(codes_u8, ((0, 0), (0, L8 - codes_u8.shape[1]))))
        group_crc = payload_crc(group_crc, crc_codes[:take], lengths[:take])
        # one pipelined host->device push per batch (tunnel latency-bound)
        kp_d, nm_d, qp_d, len_d, id_d = jax.device_put(
            (kp, nm, qp, lengths, tuple(id_np)))
        grids, state = _model_batch(
            dcfg, qcfg, mcfg, icfg, state, kp_d, nm_d, qp_d, len_d, id_d,
            n_valid=jnp.int32(take))
        group_fc.append(grids)   # device-resident uint16 grids
        group_meta.append((take, L8))
        group_bytes += sum(f.size * 2 + c.size * 2 for f, c in grids)
        from .ops import rans as _r
        if (group_bytes >= group_mem_bytes
                or len(group_meta) >= _r.GROUP_MAX_BATCHES):
            flush_group()
    flush_group()
    writer.close()

    import os
    in_bytes = sum(os.path.getsize(f) for f in in_paths if os.path.exists(f))
    out_bytes = os.path.getsize(out_path)
    n_bases = n_bases_total if streaming else int(data.lengths.sum())
    if p.verbosity >= 2:
        det = "  ".join(f"{k}: {v:,}" for k, v in stream_bytes.items())
        print(f"streams: {det}")
    return {
        "n_reads": R_total, "in_bytes": in_bytes, "out_bytes": out_bytes,
        "bits_per_base": 8.0 * out_bytes / max(1, n_bases),
        "ratio": in_bytes / max(1, out_bytes),
        "stream_bytes": stream_bytes,
    }


def decompress_file(p_cli: Params, in_path: str, out_path: str,
                    out_path2: str | None = None,
                    start_group: int = 0,
                    init_state: Optional[CodecState] = None) -> dict:
    """start_group/init_state: resume or parallel decode from a snapshot
    (checkpoint.py) — groups before start_group are skipped, and the codec
    state must be the snapshot taken after group start_group-1."""
    reader = archive.ArchiveReader(in_path)
    p = Params.load_params(reader.header_blob, base=p_cli)
    if p.mesh_dp > 1 or p.mesh_tp > 1:
        raise ValueError(
            f"archive was written on a {p.mesh_dp}x{p.mesh_tp} mesh — "
            f"use parallel.mesh_pipeline.decompress_file_mesh")
    dcfg, qcfg, mcfg, icfg = make_configs(p)
    state = init_state if init_state is not None else state_create(
        dcfg, qcfg, icfg)

    qrev = None
    if qcfg is not None:
        _, qrev = quality.qual_maps(qcfg.mode, qcfg.qt)
    id_chain = [None] if icfg is not None else None

    is_pe = p.dna_mode in (DnaMode.PE_ORIGINAL, DnaMode.PE_SORTED)
    if is_pe:
        w1 = fastq.FastqWriter(out_path)
        w2 = fastq.FastqWriter(out_path2 or p.out_path2)
    else:
        w1, w2 = fastq.FastqWriter(out_path), None
    gi = -1
    while True:
        rec = reader.read_group(p.n_lanes)
        if rec is None:
            break
        gi += 1
        if gi < start_group:
            continue
        gstates, batches, want_crc = rec
        got_crc = 0
        if id_chain is not None:
            id_chain[:] = [None] * len(id_chain)   # mirrors flush_group
        cur = [jnp.asarray(st) for st in gstates]
        align = (2 * p.n_lanes
                 if p.dna_mode in (DnaMode.PE_ORIGINAL, DnaMode.PE_SORTED)
                 else p.n_lanes)
        first = _first_batch(p.n_lanes, p.max_batch_reads, 0, align)

        pending = None   # previous batch's device outputs awaiting host drain

        def drain(pend):
            """Pull one decoded batch and render it — runs while the chip is
            already decoding the NEXT batch (one-batch lookahead pipelining:
            the host-side pull/render cost hides behind device compute)."""
            nonlocal got_crc
            take, padded, lengths, codes, qsyms, id_batch = pend
            # one pipelined device->host pull per batch
            codes_np, lengths_np, qsyms_np, id_batch = jax.device_get(
                (codes[:take], lengths[:take], qsyms[:take], id_batch))
            # mask padding columns like the encoder's input matrices
            poscols = np.arange(codes_np.shape[1])[None, :]
            codes_np = np.where(poscols < lengths_np[:, None], codes_np, 0)
            got_crc = payload_crc(got_crc, codes_np, lengths_np)
            if qrev is not None:
                quals_np = qrev[qsyms_np].astype(np.uint8)
            else:
                quals_np = np.full(qsyms_np.shape, p.quality_thr, np.uint8)
            if icfg is not None:
                # host detokenization replays the encoder's per-lane chains
                id_all = ids.decode_ids_host(
                    *(np.asarray(a) for a in id_batch),
                    ids.read_lanes(padded, p.n_lanes), id_chain,
                    n_valid=take if icfg.codec_v >= 2 else None)
                ids_np = id_all[:take]
            else:
                ids_np = None
            # streamed output: write this batch and drop it (host memory
            # stays O(batch) regardless of file size)
            if is_pe:
                w1.write_batch(codes_np[0::2].astype(np.uint8),
                               quals_np[0::2], lengths_np[0::2],
                               ids=None if ids_np is None else ids_np[0::2])
                w2.write_batch(codes_np[1::2].astype(np.uint8),
                               quals_np[1::2], lengths_np[1::2],
                               ids=None if ids_np is None else ids_np[1::2])
            else:
                w1.write_batch(codes_np.astype(np.uint8), quals_np,
                               lengths_np, ids=ids_np)

        for take, L, streams in batches:
            padded = canonical_padded(take, first, p.max_batch_reads, align)
            cap = padded * max(L, 2)
            # PE anchor mode recodes pairs as 3 expanded rows (read1 / rowA /
            # rowB, pe.expand_pe_rows): the dna stream can emit up to
            # 1.5 * padded * L symbols (<= 1 u16 word each), so its decoder
            # plane must be sized to the expanded grid, not the read grid
            d_cap = (3 * (padded // 2) * max(L, 2)
                     if dcfg.pe_log2_buckets > 0 else cap)

            def fit(words, cap):
                w = np.zeros((cap,), np.uint32)
                w[:words.shape[0]] = words
                return w

            si = 0
            m_words, _ = streams[si]; m_states = cur[si]; si += 1
            d_words, _ = streams[si]; d_states = cur[si]; si += 1
            if qcfg is not None:
                q_words, _ = streams[si]; q_states = cur[si]; si += 1
            else:
                q_words = np.zeros((0,), np.uint32)
                q_states = jnp.zeros((0,), jnp.uint32)
            if icfg is not None:
                i_words, _ = streams[si]; i_states = cur[si]; si += 1
                i_cap = padded * icfg.w_all + 4 * p.n_lanes
            else:
                i_words = np.zeros((0,), np.uint32)
                i_states = jnp.zeros((0,), jnp.uint32)
                i_cap = 0
            with_pe_stream = dcfg.pe_log2_buckets > 0
            if with_pe_stream:
                pe_words, _ = streams[si]; pe_states = cur[si]; si += 1
                pe_cap = 2 * padded + 4 * p.n_lanes
            else:
                pe_words = np.zeros((0,), np.uint32)
                pe_states = None
                pe_cap = 0

            # one pipelined host->device push per batch (tunnel latency-bound)
            m_w, i_w, d_w, q_w, pe_w = jax.device_put(
                (fit(m_words, mcfg.n_per_read * padded),
                 fit(i_words, i_cap), fit(d_words, d_cap), fit(q_words, cap),
                 fit(pe_words, pe_cap)))
            (lengths, codes, qsyms, id_batch, state,
             (m_x, d_x, q_x, i_x, pe_x)) = _decode_batch(
                dcfg, qcfg, mcfg, icfg, padded, L, state,
                m_w, m_states, i_w, i_states, d_w, d_states, q_w, q_states,
                pe_w if with_pe_stream else None, pe_states,
                n_valid=jnp.int32(take))
            nxt = [m_x, d_x]
            if qcfg is not None:
                nxt.append(q_x)
            if icfg is not None:
                nxt.append(i_x)
            if with_pe_stream:
                nxt.append(pe_x)
            cur = nxt
            # the chip starts on THIS batch while the host drains the last
            if pending is not None:
                drain(pending)
            pending = (take, padded, lengths, codes, qsyms, id_batch)
        # issue the fill-stat computation before the final drain so its
        # device->host copy hides behind the drain's pull (no standalone
        # blocking pull at the group boundary)
        fills = fill_stats_device(dcfg, state.dna)
        if pending is not None:
            drain(pending)
        if got_crc != want_crc:
            raise ValueError(
                f"payload checksum mismatch in group {gi} "
                f"(archive corrupt or decoder divergence)")
        # replay the encoder's group-boundary table growth (flush_group):
        # both sides see identical state here, so the grow decision and the
        # resulting layout match deterministically
        state = state._replace(dna=grow_tables(
            dcfg, state.dna, p.verbosity, stats=np.asarray(fills)))
    reader.close()

    n_out = w1.n_reads + (w2.n_reads if w2 is not None else 0)
    w1.close()
    if w2 is not None:
        w2.close()
    return {"n_reads": n_out}


def interleave_pe(d1: fastq.FastqData, d2: fastq.FastqData) -> fastq.FastqData:
    """Interleave mate files so pairs are adjacent (reference CReadsBlock PE
    read, reads_block.h:144-169)."""
    if d1.n_reads != d2.n_reads:
        raise ValueError(
            f"PE mate counts differ: {d1.n_reads} vs {d2.n_reads}")
    R = d1.n_reads
    L = max(d1.max_len, d2.max_len, 1)

    def padL(a):
        return np.pad(a, ((0, 0), (0, L - a.shape[1])))

    codes = np.empty((2 * R, L), d1.codes.dtype if R else np.uint8)
    quals = np.empty((2 * R, L), np.uint8)
    lengths = np.empty((2 * R,), np.int32)
    if R:
        codes[0::2] = padL(d1.codes)
        codes[1::2] = padL(d2.codes)
        quals[0::2] = padL(d1.quals)
        quals[1::2] = padL(d2.quals)
        lengths[0::2] = d1.lengths
        lengths[1::2] = d2.lengths
    ids = [None] * (2 * R)
    ids[0::2] = d1.ids
    ids[1::2] = d2.ids
    return fastq.FastqData(codes=codes, quals=quals, lengths=lengths, ids=ids)


def compress_pe(p: Params, in1: str, in2: str, out_path: str,
                group_mem_bytes: Optional[int] = None,
                snapshot_prefix: Optional[str] = None,
                stream_chunk_bytes: int = 0) -> dict:
    """Paired-end compression: pairs interleaved; sorted mode orders pairs by
    mate1's sequence (reference sorts mate2 by mate1's permutation,
    io.h:531-550); mate-to-mate statistics flow through the shared k-mer
    tables across batches. stream_chunk_bytes > 0 block-streams both mates
    through the paired chunk reader (PE original order only) — host memory
    stays O(chunk) like the reference's 16 MiB PE blocks
    (reads_block.h:144-169)."""
    if stream_chunk_bytes > 0 and p.dna_mode == DnaMode.PE_ORIGINAL:
        kw = {}
        if group_mem_bytes is not None:
            kw["group_mem_bytes"] = group_mem_bytes
        stats = compress_file(p, [in1, in2], out_path,
                              snapshot_prefix=snapshot_prefix,
                              stream_chunk_bytes=stream_chunk_bytes, **kw)
        stats["ratio"] = stats["in_bytes"] / max(1, stats["out_bytes"])
        return stats
    d1 = fastq.read_fastq(in1)
    d2 = fastq.read_fastq(in2)
    if p.dna_mode == DnaMode.PE_SORTED:
        order = fastq.sort_order(d1.codes, d1.lengths)
        d1 = fastq.FastqData(d1.codes[order], d1.quals[order],
                             d1.lengths[order], [d1.ids[i] for i in order])
        d2 = fastq.FastqData(d2.codes[order], d2.quals[order],
                             d2.lengths[order], [d2.ids[i] for i in order])
    data = interleave_pe(d1, d2)
    kw = {}
    if group_mem_bytes is not None:
        kw["group_mem_bytes"] = group_mem_bytes
    stats = compress_file(p, in1, out_path, data=data,
                          snapshot_prefix=snapshot_prefix, **kw)
    import os

    stats["in_bytes"] = os.path.getsize(in1) + os.path.getsize(in2)
    stats["ratio"] = stats["in_bytes"] / max(1, stats["out_bytes"])
    return stats
