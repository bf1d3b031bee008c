"""Multi-chip compress/decompress pipelines over a dp×tp mesh.

Scales the single-chip pipeline (pipeline.py) across chips: reads are
data-parallel over `dp` (each shard runs its own rANS lane group and emits an
independent bitstream), k-mer tables are sharded over `tp` by bucket range
(parallel/sharded.py). The archive stores each (shard, stream) pair as its
own stream entry in shard-major order, so the existing group framing
(archive.py) carries multichip payloads unchanged; `mesh_dp`/`mesh_tp` are
recorded in the header and decode requires the same mesh — the analog of the
reference baking its thread count into the archive (params.h:87).

Like the single-chip path, emission is group-chained: batches are modeled
forward (tables evolve), their (freq, cum) grids stay device-resident, and
each group's batches are entropy-coded in REVERSE so per-shard lane states
chain — one state block per (shard, stream) per group instead of per batch.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import archive
from ..io import fastq
from ..params import Params, DnaMode, IdMode, QualityMode
from ..streams import quality, ids as ids_mod
from ..ops import rans
from . import sharded
from .. import pipeline as base


def _mesh_and_specs(p: Params, dcfg, qcfg, mcfg, icfg, dp: int, tp: int,
                    state0=None):
    """state0: resume from a snapshot (checkpoint.load_state) instead of a
    fresh state — snapshots hold the assembled global arrays, so the same
    device_put re-shards them over the mesh."""
    mesh = sharded.make_mesh(dp * tp, tp=tp)
    sspec = sharded.state_specs(qcfg is not None, icfg is not None,
                                dcfg.pe_log2_buckets > 0)
    state = state0 if state0 is not None else base.state_create(dcfg, qcfg,
                                                                icfg)
    state = jax.device_put(
        state, jax.tree.map(lambda s: NamedSharding(mesh, s), sspec,
                            is_leaf=lambda x: isinstance(x, P)))
    bspec = NamedSharding(mesh, P("dp"))
    return mesh, state, bspec


def _run_maintenance(p: Params, dcfg, maint, state):
    """Apply group-boundary table maintenance and surface fill telemetry.
    Mesh tables are presized (no sharded growth): past the single-chip
    growth threshold inserts start dropping, so warn loudly."""
    from .. import pipeline as _b

    dna_state, fills = maint(state.dna)
    state = state._replace(dna=dna_state)
    if p.verbosity >= 1:
        f = np.asarray(jax.device_get(fills))
        print(f"  mesh fills: smer {int(f[0]):,} bmer {int(f[1]):,} "
              f"siv nz {int(f[2]):,}")
        for name, used, log2b, cells in (
                ("smer", int(f[0]), dcfg.smer_log2_buckets, 4),
                ("bmer", int(f[1]), dcfg.bmer_log2_buckets, 4)):
            cap = (1 << log2b) * cells
            if used * _b.GROW_DEN > cap * _b.GROW_NUM:
                print(f"  WARNING: mesh {name} table fill "
                      f"{used / cap:.2f} exceeds the growth threshold; "
                      f"mesh tables are presized (no sharded growth) — "
                      f"new k-mers are being dropped. Raise -gs.")
    return state


def compress_file_mesh(p: Params, in_path: str, out_path: str, dp: int,
                       tp: int = 1,
                       data: Optional[fastq.FastqData] = None,
                       group_mem_bytes: int = 512 << 20,
                       snapshot_prefix: Optional[str] = None) -> dict:
    """Compression over a dp×tp mesh (SE; PE via compress_pe_mesh).
    snapshot_prefix: save the assembled (global) codec state at every group
    boundary — the same .npz format as the single-chip snapshots
    (checkpoint.py), so a dp-written archive resumes mid-stream on the mesh
    OR on one chip (decompress_file_mesh{,_seq} start_group/init_state)."""
    is_pe = p.dna_mode in (DnaMode.PE_ORIGINAL, DnaMode.PE_SORTED)
    if is_pe and data is None:
        raise ValueError("mesh PE: use compress_pe_mesh (two inputs)")
    if data is None:
        data = fastq.read_fastq(in_path)
    if p.dna_mode == DnaMode.SE_SORTED:
        order = fastq.sort_order(data.codes, data.lengths)
        data = fastq.FastqData(data.codes[order], data.quals[order],
                               data.lengths[order],
                               [data.ids[i] for i in order])

    id_list = data.ids
    if p.id_mode == IdMode.INSTRUMENT:
        id_list = ids_mod.instrument_prefix(id_list)
    if p.id_mode != IdMode.NONE:
        p.max_id_len = max(8, max((len(s) for s in id_list), default=8))
        p.id_n_fields = ids_mod.count_fields(id_list)
        id_chain = [None] * dp   # one file-order chain per dp shard
    else:
        id_chain = None

    p.mesh_dp, p.mesh_tp = dp, tp
    # id codec v2 on the mesh: each dp shard masks its local padding-row
    # prefix from the global batch `take` (sharded._shard_n_valid), so the
    # gathered activity mask matches the single-chip global mask and padding
    # rows code nothing. The version rides the header; legacy mesh archives
    # (id_codec_v 1) decode with the masking disabled.
    dcfg, qcfg, mcfg, icfg = base.make_configs(p)
    mesh, state, bspec = _mesh_and_specs(p, dcfg, qcfg, mcfg, icfg, dp, tp)
    enc = sharded.make_sharded_model(dcfg, qcfg, mcfg, icfg, mesh)
    rns = sharded.make_sharded_rans(mesh, p.scale_bits)
    maint = sharded.make_sharded_maintenance(dcfg, qcfg, mcfg, icfg, mesh)
    n_streams = (2 + (qcfg is not None) + (icfg is not None)
                 + (dcfg.pe_log2_buckets > 0))

    qfwd = None
    if qcfg is not None:
        qfwd, _ = quality.qual_maps(qcfg.mode, qcfg.qt)

    writer = archive.ArchiveWriter(out_path, p.store_params())
    N = p.n_lanes
    align = dp * N * (2 if is_pe else 1)  # PE: pairs never straddle a lane

    group_fc = []      # per batch: [ (f u16, c u16) per stream ]
    group_meta = []    # per batch: (take, L)
    group_bytes = 0
    group_crc = 0
    group_idx = 0

    def flush_group():
        nonlocal group_fc, group_meta, group_bytes, group_crc, group_idx
        if not group_meta:
            return
        # reverse-chain each stream's batches on device (async dispatch),
        # then pull counts, word buffers, and final states in one batched get
        per_batch_dev = [[None] * n_streams for _ in group_meta]
        final_states = []
        for si in range(n_streams):
            st = None
            for k in range(len(group_meta) - 1, -1, -1):
                f16, c16 = group_fc[k][si]
                if st is None:
                    st = jax.device_put(
                        jnp.full((dp * N,), rans.RANS_L, jnp.uint32), bspec)
                words, n_arr, st = rns(f16, c16, st)
                per_batch_dev[k][si] = (words, n_arr)
            final_states.append(st)
        states_np, pulled = jax.device_get(
            (final_states,
             [d for row in per_batch_dev for d in row]))
        # shard-major (shard, stream) state blocks, then per-batch entries
        states_arch = [states_np[si][s * N:(s + 1) * N]
                       for s in range(dp) for si in range(n_streams)]
        batches_arch = []
        for k, (take, L) in enumerate(group_meta):
            streams_k = []
            for s in range(dp):
                for si in range(n_streams):
                    words, n_arr = pulled[k * n_streams + si]
                    cap = words.shape[0] // dp
                    n_s = int(n_arr[s])
                    streams_k.append((words[s * cap:s * cap + n_s], n_s))
            batches_arch.append((take, L, streams_k))
        writer.write_group(states_arch, batches_arch, payload_crc=group_crc)
        group_fc, group_meta, group_bytes, group_crc = [], [], 0, 0
        if id_chain is not None:
            # groups stay independently decodable: id token chains reset at
            # every group boundary (mirrors pipeline.flush_group)
            id_chain[:] = [None] * len(id_chain)
        # group-boundary table maintenance (clamp + SIV prune), replayed
        # identically by the mesh decoder at the same boundary
        nonlocal state
        state = _run_maintenance(p, dcfg, maint, state)
        if snapshot_prefix is not None:
            # state AFTER this group = what a decoder needs to START the
            # next group (mirrors pipeline.flush_group); np.asarray on the
            # sharded leaves assembles the global arrays, so the snapshot
            # is mesh-geometry-free and loads on any device count
            from .. import checkpoint

            checkpoint.save_state(
                state, checkpoint.snapshot_path(snapshot_prefix,
                                                group_idx + 1))
        group_idx += 1

    for start, take, padded in base.batch_schedule(
            data.n_reads, N, p.max_batch_reads, align=align):
        L = data.max_len or 1
        codes = base._pad_batch(data.codes[start:start + take],
                                padded).astype(np.int32)
        lengths = base._pad_batch(data.lengths[start:start + take],
                                  padded).astype(np.int32)
        kcodes = np.where(codes >= 4, 0, codes).astype(np.int32)
        if qfwd is not None:
            qs = qfwd[base._pad_batch(data.quals[start:start + take], padded)]
        else:
            qs = np.zeros_like(codes)
        if icfg is not None:
            ids_batch = (id_list[start:start + take]
                         + [b""] * (padded - take))
            id_np = ids_mod.encode_ids_host(
                ids_batch, ids_mod.mesh_read_lanes(padded, dp, N),
                icfg.n_fields, icfg.max_id_len, id_chain,
                n_valid=take if icfg.codec_v >= 2 else None)
        else:
            id_np = ids_mod.zero_id_batch(padded)

        put = lambda a: jax.device_put(jnp.asarray(a), bspec)
        grids, state = enc(state, put(codes), put(kcodes), put(lengths),
                           put(qs), tuple(put(a) for a in id_np),
                           jnp.int32(take))
        group_crc = base.payload_crc(group_crc, np.where(
            np.arange(codes.shape[1])[None, :] < lengths[:take, None],
            codes[:take], 0).astype(np.uint8), lengths[:take])
        group_fc.append(grids)
        group_meta.append((take, codes.shape[1]))
        group_bytes += sum(f.size * 2 + c.size * 2 for f, c in grids)
        if group_bytes >= group_mem_bytes:
            flush_group()
    flush_group()
    writer.close()

    import os
    in_paths = list(in_path) if isinstance(in_path, (list, tuple)) else [in_path]
    in_bytes = sum(os.path.getsize(f) for f in in_paths if os.path.exists(f))
    out_bytes = os.path.getsize(out_path)
    n_bases = int(data.lengths.sum())
    return {"n_reads": data.n_reads, "out_bytes": out_bytes,
            "in_bytes": in_bytes,
            "bits_per_base": 8.0 * out_bytes / max(1, n_bases)}


def decompress_file_mesh(p_cli: Params, in_path: str, out_path: str,
                         out_path2: Optional[str] = None,
                         start_group: int = 0,
                         init_state=None) -> dict:
    """Decode a mesh archive on mesh_dp×mesh_tp devices; with fewer
    devices available, falls back to the bit-identical sequential
    per-shard decode (decompress_file_mesh_seq) — a pod-written archive
    decodes anywhere, like any reference archive does regardless of its
    baked-in thread count (application.cpp:787).
    start_group/init_state: resume or parallel decode from a mesh group
    snapshot (compress_file_mesh snapshot_prefix) — groups before
    start_group are skipped and init_state must be the snapshot taken
    after group start_group-1."""
    reader = archive.ArchiveReader(in_path)
    p = Params.load_params(reader.header_blob, base=p_cli)
    dp, tp = p.mesh_dp, p.mesh_tp
    if dp * tp > len(jax.devices()):
        reader.close()
        return decompress_file_mesh_seq(p_cli, in_path, out_path, out_path2,
                                        start_group=start_group,
                                        init_state=init_state)
    dcfg, qcfg, mcfg, icfg = base.make_configs(p)
    mesh, state, bspec = _mesh_and_specs(p, dcfg, qcfg, mcfg, icfg, dp, tp,
                                         state0=init_state)
    N = p.n_lanes
    with_pe = dcfg.pe_log2_buckets > 0
    n_base = 2 + (qcfg is not None) + (icfg is not None) + with_pe

    qrev = None
    if qcfg is not None:
        _, qrev = quality.qual_maps(qcfg.mode, qcfg.qt)

    dec_cache = {}
    maint = sharded.make_sharded_maintenance(dcfg, qcfg, mcfg, icfg, mesh)
    id_chain = [None] * dp if icfg is not None else None
    is_pe = p.dna_mode in (DnaMode.PE_ORIGINAL, DnaMode.PE_SORTED)
    if is_pe:
        w1 = fastq.FastqWriter(out_path)
        w2 = fastq.FastqWriter(out_path2 or p.out_path2)
    else:
        w1, w2 = fastq.FastqWriter(out_path), None
    gi = -1
    while True:
        rec = reader.read_group(N)
        if rec is None:
            break
        gi += 1
        if gi < start_group:
            continue
        gstates, batches, want_crc = rec
        got_crc = 0
        if id_chain is not None:
            id_chain[:] = [None] * len(id_chain)   # mirrors flush_group
        # per-stream [dp*N] lane states from the shard-major group block;
        # chained forward across the group's batches below
        cur = []
        for b in range(n_base):
            plane = np.zeros((dp * N,), np.uint32)
            for s in range(dp):
                plane[s * N:(s + 1) * N] = gstates[s * n_base + b]
            cur.append(jax.device_put(jnp.asarray(plane), bspec))
        align = dp * N * (2 if is_pe else 1)
        first = base._first_batch(N, p.max_batch_reads, 0, align)

        pending = None  # previous batch's device outputs awaiting host drain

        def drain(pend):
            """Pull one decoded batch and render it — runs while the mesh is
            already decoding the NEXT batch (the single-chip one-batch
            lookahead, pipeline.decompress_file drain, on the mesh path)."""
            nonlocal got_crc
            take, padded, lengths, codes, qsyms, id_batch = pend
            codes_np, lengths_np, qsyms_np, id_batch = jax.device_get(
                (codes[:take], lengths[:take], qsyms[:take], id_batch))
            codes_np = codes_np.astype(np.uint8)
            lengths_np = lengths_np.astype(np.int32)
            poscols = np.arange(codes_np.shape[1])[None, :]
            codes_np = np.where(poscols < lengths_np[:, None], codes_np,
                                0).astype(np.uint8)
            got_crc = base.payload_crc(got_crc, codes_np, lengths_np)
            if qrev is not None:
                quals_np = qrev[qsyms_np].astype(np.uint8)
            else:
                quals_np = np.full(qsyms_np.shape, p.quality_thr, np.uint8)
            if icfg is not None:
                id_all = ids_mod.decode_ids_host(
                    *(np.asarray(a) for a in id_batch),
                    ids_mod.mesh_read_lanes(padded, dp, N), id_chain,
                    n_valid=take if icfg.codec_v >= 2 else None)
                ids_np = id_all[:take]
            else:
                ids_np = None
            if is_pe:
                w1.write_batch(codes_np[0::2], quals_np[0::2],
                               lengths_np[0::2],
                               ids=None if ids_np is None else ids_np[0::2])
                w2.write_batch(codes_np[1::2], quals_np[1::2],
                               lengths_np[1::2],
                               ids=None if ids_np is None else ids_np[1::2])
            else:
                w1.write_batch(codes_np, quals_np, lengths_np, ids=ids_np)

        for take, L, streams in batches:
            padded = base.canonical_padded(take, first, p.max_batch_reads,
                                           align)
            R_shard = padded // dp
            key = (R_shard, L)
            if key not in dec_cache:
                dec_cache[key] = sharded.make_sharded_decode(
                    dcfg, qcfg, mcfg, icfg, mesh, R_shard, L)
            dec = dec_cache[key]

            # reassemble [dp*cap] word planes per base stream. The dna plane
            # is sized to the PE-expanded 3-row grid when anchors are on
            # (1.5 * R_shard * L symbols <= 1 u16 word each, matching the
            # encoder-side rans grid capacity) — a pathologically
            # incompressible batch can emit more than R_shard * L words
            caps = [mcfg.n_per_read * R_shard,
                    (3 * (R_shard // 2) * max(L, 2) if with_pe
                     else R_shard * max(L, 2))]
            if qcfg is not None:
                caps.append(R_shard * max(L, 2))
            if icfg is not None:
                caps.append(R_shard * icfg.w_all + 4 * N)
            if with_pe:
                caps.append(2 * R_shard + 4 * N)
            planes = [np.zeros((dp * c,), np.uint32) for c in caps]
            for s in range(dp):
                for b in range(n_base):
                    words, n_w = streams[s * n_base + b]
                    planes[b][s * caps[b]:s * caps[b] + n_w] = words

            put = lambda a: jax.device_put(jnp.asarray(a), bspec)
            args = [state]
            args += [put(planes[0]), cur[0]]
            bi = 2 + (qcfg is not None)
            if icfg is not None:
                args += [put(planes[bi]), cur[bi]]
            else:
                z = jnp.zeros((0,), jnp.uint32)
                args += [z, z]
            args += [put(planes[1]), cur[1]]
            if qcfg is not None:
                args += [put(planes[2]), cur[2]]
            else:
                z = jnp.zeros((0,), jnp.uint32)
                args += [z, z]
            if with_pe:
                args += [put(planes[n_base - 1]), cur[n_base - 1]]
            else:
                zd = jax.device_put(jnp.zeros((dp,), jnp.uint32), bspec)
                args += [zd, zd]
            args.append(jnp.int32(take))
            lengths, codes, qsyms, id_batch, state, xs = dec(*args)
            cur = list(xs)
            # the mesh starts on THIS batch while the host drains the last
            if pending is not None:
                drain(pending)
            pending = (take, padded, lengths, codes, qsyms, id_batch)
        if pending is not None:
            drain(pending)
        if got_crc != want_crc:
            raise ValueError(f"payload checksum mismatch (mesh decode)")
        # mirror the encoder's group-boundary maintenance exactly
        state = _run_maintenance(p, dcfg, maint, state)
    reader.close()

    n_out = w1.n_reads + (w2.n_reads if w2 is not None else 0)
    w1.close()
    if w2 is not None:
        w2.close()
    return {"n_reads": n_out}


def _make_seq_decode(dcfg, qcfg, mcfg, icfg, R_shard: int, L: int):
    """Jitted pieces of the sequential (any-device-count) mesh decode:
    `dec_one` decodes ONE dp shard's streams against the batch-frozen full
    state (exactly what each mesh device computes in parallel,
    sharded.make_sharded_decode.step minus the collectives), and `collect`
    applies the full-batch state evolution once from the concatenated
    shard outputs (the all_gather analog). Statistics replay is
    deterministic, so the result is bit-identical to the mesh decode —
    only the lane grouping is sequential."""
    from functools import partial

    from ..streams import dna, meta
    from ..ops import models

    with_pe = dcfg.pe_log2_buckets > 0

    @jax.jit
    def dec_one(state, m_words, m_states, i_words, i_states, d_words,
                d_states, q_words, q_states, pe_words, pe_states,
                n_valid=None):
        lengths, lcp, _, m_x, _ = meta.meta_decode_batch(
            mcfg, state.meta, R_shard, m_words, m_states)
        lengths = jnp.minimum(lengths, L).astype(jnp.int32)
        lcp = lcp if mcfg.with_lcp else None
        m_ctx, m_syms, _, _ = meta.meta_modeling(mcfg, state.meta, lengths,
                                                 lcp)
        if with_pe:
            codes, _, d_x, _, ex = dna.dna_decode_batch(
                dcfg, state.dna, lengths, d_words, d_states, L,
                apply_update=False, lcp=lcp, lcp_stride=mcfg.lcp_stride,
                pe_words=pe_words, pe_states=pe_states)
            (eff, ctx, sym, active, pe_x, pe_syms, pe_act, codes3,
             lengths3) = ex
            dna_out = (codes3, eff, lengths3, ctx, sym, active, pe_syms,
                       pe_act)
        else:
            codes, _, d_x, _, (eff, ctx, sym, active) = dna.dna_decode_batch(
                dcfg, state.dna, lengths, d_words, d_states, L,
                apply_update=False, lcp=lcp, lcp_stride=mcfg.lcp_stride)
            pe_x = pe_states
            dna_out = (codes, eff, lengths, ctx, sym, active)

        if qcfg is not None:
            qsyms, _, q_x, _ = quality.qual_decode_batch(
                qcfg, state.qual, lengths, q_words, q_states, L)
            q_ctx, _, _, q_active = quality.qual_modeling(
                qcfg, state.qual, qsyms, lengths)
            q_out = (q_ctx, qsyms, q_active)
        else:
            qsyms = jnp.zeros((R_shard, L), jnp.int32)
            q_x, q_out = q_states, None

        if icfg is not None:
            (i_flag, i_dsym, i_dmag, i_emat, i_elens, _, i_x,
             _) = ids_mod.id_decode_batch(icfg, state.id, R_shard, i_words,
                                          i_states, n_valid=n_valid)
            id_batch = (i_flag, i_dsym, i_dmag, i_emat, i_elens)
            i_ctx, i_syms, _, _, i_active = ids_mod.id_modeling(
                icfg, state.id, *id_batch, n_valid=n_valid)
            i_out = (i_ctx, i_syms, i_active)
        else:
            id_batch = tuple(
                jnp.asarray(a) for a in ids_mod.zero_id_batch(R_shard))
            i_x, i_out = i_states, None

        xs = [m_x, d_x] + ([q_x] if qcfg is not None else []) \
            + ([i_x] if icfg is not None else []) \
            + ([pe_x] if with_pe else [])
        return (lengths, codes, qsyms, id_batch, (m_ctx, m_syms), dna_out,
                q_out, i_out, tuple(xs))

    @jax.jit
    def collect(state, m_g, dna_g, q_g, i_g, codes_true_g, lengths_true_g):
        from ..pipeline import CodecState

        m_model = models.model_update(
            state.meta, m_g[0].reshape(-1), m_g[1].reshape(-1),
            jnp.ones(m_g[0].size, dtype=bool))
        if with_pe:
            codes3, eff, lengths3, ctx, sym, active, pe_syms, pe_act = dna_g
            d_state = dna.dna_collect_updates(
                dcfg, state.dna, codes3, eff, lengths3, ctx, sym, active,
                pe_syms=pe_syms, pe_act=pe_act,
                codes_true=codes_true_g, lengths_true=lengths_true_g)
        else:
            codes, eff, lengths, ctx, sym, active = dna_g
            d_state = dna.dna_collect_updates(
                dcfg, state.dna, codes, eff, lengths, ctx, sym, active)
        q_model = None
        if q_g is not None:
            q_model = models.model_update(
                state.qual, q_g[0].reshape(-1), q_g[1].reshape(-1),
                q_g[2].reshape(-1))
        i_model = None
        if i_g is not None:
            i_model = models.model_update(
                state.id, i_g[0].reshape(-1), i_g[1].reshape(-1),
                i_g[2].reshape(-1))
        return CodecState(dna=d_state, meta=m_model, qual=q_model,
                          id=i_model)

    return dec_one, collect


def _maintenance_local(dcfg):
    """Single-chip replay of the mesh group-boundary maintenance
    (sharded.make_sharded_maintenance): same clamp, same prune rule on the
    same global fill — bit-identical state evolution."""
    from .. import pipeline as _b
    from ..ops import tables

    @jax.jit
    def step(dna_state):
        s_tc, b_tc = dna_state.s_tc, dna_state.b_tc
        if dcfg.canon:
            s_tc = tables.ktable_clamp(s_tc)
            b_tc = tables.ktable_clamp(b_tc)
        nz, cap = tables.siv_fill(dna_state.siv)
        prune = nz > (4 * dna_state.siv.shape[0]
                      * _b.SIV_PRUNE_NUM) // _b.SIV_PRUNE_DEN
        siv = jnp.where(prune, tables.siv_prune(dna_state.siv),
                        dna_state.siv)
        return dna_state._replace(siv=siv, s_tc=s_tc, b_tc=b_tc)

    return step


def decompress_file_mesh_seq(p_cli: Params, in_path: str, out_path: str,
                             out_path2: Optional[str] = None,
                             start_group: int = 0,
                             init_state=None) -> dict:
    """Decode a dp×tp mesh archive on ANY number of devices (down to one):
    shards decode sequentially against the batch-frozen full state, then
    the batch's state evolution applies once from the concatenated shard
    outputs — bit-identical to the mesh decode (the reference decodes any
    archive on any machine; its thread count is software too,
    application.cpp:787)."""
    reader = archive.ArchiveReader(in_path)
    p = Params.load_params(reader.header_blob, base=p_cli)
    dp = p.mesh_dp
    dcfg, qcfg, mcfg, icfg = base.make_configs(p)
    state = (init_state if init_state is not None
             else base.state_create(dcfg, qcfg, icfg))
    N = p.n_lanes
    with_pe = dcfg.pe_log2_buckets > 0
    n_base = 2 + (qcfg is not None) + (icfg is not None) + with_pe

    qrev = None
    if qcfg is not None:
        _, qrev = quality.qual_maps(qcfg.mode, qcfg.qt)

    dec_cache = {}
    maint = _maintenance_local(dcfg)
    id_chain = [None] * dp if icfg is not None else None
    is_pe = p.dna_mode in (DnaMode.PE_ORIGINAL, DnaMode.PE_SORTED)
    if is_pe:
        w1 = fastq.FastqWriter(out_path)
        w2 = fastq.FastqWriter(out_path2 or p.out_path2)
    else:
        w1, w2 = fastq.FastqWriter(out_path), None
    gi = -1
    while True:
        rec = reader.read_group(N)
        if rec is None:
            break
        gi += 1
        if gi < start_group:
            continue
        gstates, batches, want_crc = rec
        got_crc = 0
        if id_chain is not None:
            id_chain[:] = [None] * len(id_chain)
        # per-(shard, stream) lane states, chained across the group
        cur = [[jnp.asarray(gstates[s * n_base + b]) for b in range(n_base)]
               for s in range(dp)]
        align = dp * N * (2 if is_pe else 1)
        first = base._first_batch(N, p.max_batch_reads, 0, align)
        for take, L, streams in batches:
            padded = base.canonical_padded(take, first, p.max_batch_reads,
                                           align)
            R_shard = padded // dp
            key = (R_shard, L)
            if key not in dec_cache:
                dec_cache[key] = _make_seq_decode(dcfg, qcfg, mcfg, icfg,
                                                  R_shard, L)
            dec_one, collect = dec_cache[key]

            caps = [mcfg.n_per_read * R_shard,
                    (3 * (R_shard // 2) * max(L, 2) if with_pe
                     else R_shard * max(L, 2))]
            if qcfg is not None:
                caps.append(R_shard * max(L, 2))
            if icfg is not None:
                caps.append(R_shard * icfg.w_all + 4 * N)
            if with_pe:
                caps.append(2 * R_shard + 4 * N)

            outs = []
            for s in range(dp):
                planes = []
                for b in range(n_base):
                    words, n_w = streams[s * n_base + b]
                    w = np.zeros((caps[b],), np.uint32)
                    w[:n_w] = words
                    planes.append(jnp.asarray(w))
                args = [state, planes[0], cur[s][0]]
                bi = 2 + (qcfg is not None)
                if icfg is not None:
                    args += [planes[bi], cur[s][bi]]
                else:
                    z = jnp.zeros((0,), jnp.uint32)
                    args += [z, z]
                args += [planes[1], cur[s][1]]
                if qcfg is not None:
                    args += [planes[2], cur[s][2]]
                else:
                    z = jnp.zeros((0,), jnp.uint32)
                    args += [z, z]
                if with_pe:
                    args += [planes[n_base - 1], cur[s][n_base - 1]]
                else:
                    z = jnp.zeros((0,), jnp.uint32)
                    args += [z, z]
                # per-shard codec-v2 valid-row count (sharded._shard_n_valid
                # computed on host: shard s owns global rows s*R_shard..)
                nv_s = max(0, min(take - s * R_shard, R_shard))
                out = dec_one(*args, n_valid=jnp.int32(nv_s))
                outs.append(out)
                cur[s] = list(out[-1])

            cat = lambda i: jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0),
                *(o[i] for o in outs))
            lengths_g = cat(0)
            codes_g = cat(1)
            qsyms_g = cat(2)
            id_batch_g = cat(3)
            m_g = cat(4)
            dna_g = cat(5)
            q_g = cat(6) if qcfg is not None else None
            i_g = cat(7) if icfg is not None else None
            state = collect(state, m_g, dna_g, q_g, i_g, codes_g, lengths_g)

            codes_np = np.asarray(codes_g[:take]).astype(np.uint8)
            lengths_np = np.asarray(lengths_g[:take]).astype(np.int32)
            poscols = np.arange(codes_np.shape[1])[None, :]
            codes_np = np.where(poscols < lengths_np[:, None], codes_np,
                                0).astype(np.uint8)
            got_crc = base.payload_crc(got_crc, codes_np, lengths_np)
            qsyms_np = np.asarray(qsyms_g[:take])
            if qrev is not None:
                quals_np = qrev[qsyms_np].astype(np.uint8)
            else:
                quals_np = np.full(qsyms_np.shape, p.quality_thr, np.uint8)
            if icfg is not None:
                id_all = ids_mod.decode_ids_host(
                    *(np.asarray(a) for a in id_batch_g),
                    ids_mod.mesh_read_lanes(padded, dp, N), id_chain,
                    n_valid=take if icfg.codec_v >= 2 else None)
                ids_np = id_all[:take]
            else:
                ids_np = None
            if is_pe:
                w1.write_batch(codes_np[0::2], quals_np[0::2],
                               lengths_np[0::2],
                               ids=None if ids_np is None else ids_np[0::2])
                w2.write_batch(codes_np[1::2], quals_np[1::2],
                               lengths_np[1::2],
                               ids=None if ids_np is None else ids_np[1::2])
            else:
                w1.write_batch(codes_np, quals_np, lengths_np, ids=ids_np)
        if got_crc != want_crc:
            raise ValueError("payload checksum mismatch (seq mesh decode)")
        state = state._replace(dna=maint(state.dna))
    reader.close()

    n_out = w1.n_reads + (w2.n_reads if w2 is not None else 0)
    w1.close()
    if w2 is not None:
        w2.close()
    return {"n_reads": n_out}


def compress_pe_mesh(p: Params, in1: str, in2: str, out_path: str, dp: int,
                     tp: int = 1,
                     snapshot_prefix: Optional[str] = None) -> dict:
    """Paired-end over a mesh: interleave pairs then run the mesh pipeline."""
    d1 = fastq.read_fastq(in1)
    d2 = fastq.read_fastq(in2)
    if p.dna_mode == DnaMode.PE_SORTED:
        order = fastq.sort_order(d1.codes, d1.lengths)
        d1 = fastq.FastqData(d1.codes[order], d1.quals[order],
                             d1.lengths[order], [d1.ids[i] for i in order])
        d2 = fastq.FastqData(d2.codes[order], d2.quals[order],
                             d2.lengths[order], [d2.ids[i] for i in order])
    data = base.interleave_pe(d1, d2)
    stats = compress_file_mesh(p, in1, out_path, dp, tp, data=data,
                               snapshot_prefix=snapshot_prefix)
    import os

    stats["in_bytes"] = os.path.getsize(in1) + os.path.getsize(in2)
    return stats
