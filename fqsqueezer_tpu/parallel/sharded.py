"""Multi-chip SPMD execution: dp × tp mesh over reads and table shards.

TPU-native re-derivation of the reference's parallel design (SURVEY.md §2):
  * dp (data parallel)  — the read batch is sharded over `dp`; each shard runs
    its own interleaved rANS lanes and emits an independent bitstream,
    concatenated deterministically in shard order (reference: per-thread
    contiguous read ranges + in-order stream concat, reads_block.h:197-214,
    application.cpp:710-728).
  * tp ("table parallel") — the k-mer counter stores are sharded over `tp` by
    index/bucket range (reference: owner-thread hash shards,
    dna.cpp:2381-2389, ht_kmer.h:599-602). A find combines per-shard partial
    answers with psum over `tp`; an update is applied only by the owner shard.
  * Updates are computed from the full batch: per-dp-shard (ctx, sym) /
    k-mer streams are all_gather'ed over `dp`, then every shard applies the
    identical deterministic aggregate — the collective analog of the
    reference's barrier-bracketed *_to_add exchange (application.h:56-59,
    dna.cpp:2393-2472). One device step = one sync interval, so encoder and
    decoder see identical table snapshots by construction.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import kmers, models, rans, tables
from ..streams import common, dna, ids, meta, quality


def make_mesh(n_devices: int, tp: int = 1, devices=None) -> Mesh:
    """1-D dp mesh by default; tp > 1 carves table shards out of the devices."""
    assert n_devices % tp == 0
    if devices is None:
        devices = jax.devices()[:n_devices]
    import numpy as np

    dev = np.asarray(devices).reshape(n_devices // tp, tp)
    return Mesh(dev, axis_names=("dp", "tp"))


@dataclasses.dataclass(frozen=True)
class TpBackend:
    """Table backend over a tp-sharded state: each shard holds a contiguous
    index/bucket range; finds psum partial answers, updates mask to owners.
    n_dp: the dp axis size (the routed update exchange needs it to block
    local reads by global lanes)."""

    axis: str
    n_tp: int
    n_dp: int = 1

    # --- SIV (dense): sharded by context range -----------------------------
    def siv_find(self, siv_local, ctx):
        n_local = siv_local.shape[0]
        my = jax.lax.axis_index(self.axis)
        local = ctx - my * n_local
        mask = (local >= 0) & (local < n_local)
        idx = jnp.clip(local, 0, n_local - 1)
        c4 = tables.unpack_counts(siv_local[idx])
        c4 = jnp.where(mask[..., None], c4, 0)
        return jax.lax.psum(c4, self.axis)

    def siv_words(self, siv_local, idx):
        """Raw packed SIV words at global indices (the prefix-ramp range
        reads): non-owned indices read as 0 and the halves psum."""
        n_local = siv_local.shape[0]
        my = jax.lax.axis_index(self.axis)
        local = idx - my * n_local
        own = (local >= 0) & (local < n_local)
        w = siv_local[jnp.where(own, local, idx & (n_local - 1))]
        return jax.lax.psum(jnp.where(own, w, jnp.uint32(0)), self.axis)

    def siv_update(self, siv_local, keys, valid):
        n_local = siv_local.shape[0]
        my = jax.lax.axis_index(self.axis)
        local_ctx = (keys >> 2) - my * n_local
        own = valid & (local_ctx >= 0) & (local_ctx < n_local)
        local_keys = (jnp.clip(local_ctx, 0, n_local - 1) << 2) | (keys & 3)
        return tables.siv_update(siv_local, local_keys, own)

    # --- hash tables: sharded by bucket range ------------------------------
    def _local_bucket(self, tc_local, lo, hi):
        local_buckets = tc_local.shape[0]
        log2_global = (local_buckets * self.n_tp).bit_length() - 1
        bkt = kmers.hash_bucket(lo, hi, log2_global)
        my = jax.lax.axis_index(self.axis)
        local = bkt - my * local_buckets
        own = (local >= 0) & (local < local_buckets)
        return jnp.clip(local, 0, local_buckets - 1), own

    def table_find(self, tc_local, lo, hi,
                   log2_base=-1):  # mesh tables are presized, never grown
        idx, own = self._local_bucket(tc_local, lo, hi)
        tag = kmers.hash_tag(lo, hi)
        row = tc_local[idx]
        B = tables.BUCKET
        match = (row[..., :B] == tag[..., None]) & own[..., None]
        found = jnp.any(match, axis=-1)
        word = jnp.sum(jnp.where(match, row[..., B:], tables.EMPTY), axis=-1)
        c4 = tables.unpack_counts(word.astype(jnp.uint32))
        c4 = jax.lax.psum(c4, self.axis)
        found = jax.lax.psum(found.astype(jnp.int32), self.axis) > 0
        return c4, found

    def table_update(self, tc_local, lo, hi, base, valid,
                     log2_base=-1, rounds=2):
        idx, own = self._local_bucket(tc_local, lo, hi)
        tag = kmers.hash_tag(lo, hi)
        return tables.table_update(tc_local, lo, hi, base,
                                   valid & own, bkt=idx, tag=tag,
                                   rounds=rounds)

    # --- canonical k-mer tables (tables.ktable_*): the caller passes the
    # GLOBAL base bucket (middle hash at global size); shards own contiguous
    # bucket ranges like the legacy tables. Mesh tables are presized (never
    # grown), so local log2_base stays the local size.
    def _own_bucket(self, tc_local, bkt):
        local_buckets = tc_local.shape[0]
        my = jax.lax.axis_index(self.axis)
        local = bkt - my * local_buckets
        own = (local >= 0) & (local < local_buckets)
        # spread non-owned gathers across the local range: clipping them all
        # to the boundary rows makes a gather-conflict pile the engine
        # serializes on (see tables.table_update's invalid-event spread)
        spread = (bkt & (local_buckets - 1)).astype(jnp.int32)
        return jnp.where(own, local, spread), own

    def ktable_find(self, tc_local, bkt, tags4, log2_base=-1):
        """Mirror of tables.ktable_find on the owned bucket range: u16 slot
        counters (2 per u32 word, tables.py KW layout), clipped to the u8
        saturation ceiling at read time, psum'd over tp. K2 tables
        (single-word cells, tables.k2_find) dispatch on row width like the
        single-chip entry point."""
        idx, own = self._own_bucket(tc_local, bkt)
        if tc_local.shape[-1] == tables.KBUCKET:     # K2 cells
            row = tc_local[idx]
            tw = tables.k2tag(tags4) << 8
            match = ((row[..., None, :] & tables._K2_TAG)
                     == tw[..., :, None]) & own[..., None, None]
            cnt = (row & jnp.uint32(0xFF)).astype(jnp.int32)
            counts = jnp.sum(jnp.where(match, cnt[..., None, :], 0), axis=-1)
            counts = jax.lax.psum(counts, self.axis)
            found = jax.lax.psum(
                jnp.any(match, axis=(-2, -1)).astype(jnp.int32),
                self.axis) > 0
            return counts, found
        B = tables.KBUCKET
        row = tc_local[idx]
        match = (row[..., None, :B] == tags4[..., :, None]) \
            & own[..., None, None]
        w = row[..., B:]                            # [..., B//2] u16x2 words
        cnt16 = jnp.stack([w & jnp.uint32(0xFFFF), w >> 16], axis=-1).reshape(
            row.shape[:-1] + (B,)).astype(jnp.int32)
        cnt = jnp.minimum(cnt16, 255)
        counts = jnp.sum(jnp.where(match, cnt[..., None, :], 0), axis=-1)
        counts = jax.lax.psum(counts, self.axis)
        found = jax.lax.psum(
            jnp.any(match, axis=(-2, -1)).astype(jnp.int32), self.axis) > 0
        return counts, found

    def ktable_update(self, tc_local, bkt, tag, valid, log2_base=-1):
        idx, own = self._own_bucket(tc_local, bkt)
        # re-spread non-owned events inside the local range (ktable_update
        # spreads invalid events itself, but won't see the clip pile-up)
        return tables.ktable_update(tc_local, idx, tag, valid & own)


def state_specs(qual: bool, with_ids: bool = False, with_pe: bool = False):
    """PartitionSpecs for CodecState: tables sharded over tp, models
    replicated (the model array carries the coarse family inline). The PE
    pair table + pe-stream model are REPLICATED like the models: every dp
    replica applies the identical cross-insert batch from the gathered
    true reads, so anchors match on all shards (the table is ~100x smaller
    than the s/b stores, so tp sharding buys nothing)."""
    from ..pipeline import CodecState

    dna_spec = dna.DnaState(
        siv=P("tp"), s_tc=P("tp"), b_tc=P("tp"), model=P(),
        pe=(P(), P(), P(), P(), P()) if with_pe else None)
    return CodecState(dna=dna_spec, meta=P(), qual=P() if qual else None,
                      id=P() if with_ids else None)


def _in_len_mask(lengths, L: int):
    """[R, L] in-length position mask (the sb update event validity)."""
    return jnp.arange(L, dtype=jnp.int32)[None, :] < lengths[:, None]


def _route_cap(n_events: int, n_tp: int) -> int:
    """Static per-row event capacity of the owner-routed exchange: 2x the
    uniform-hash expectation (Chernoff-negligible overflow on hashed
    buckets), 512-aligned; never above the unrouted size."""
    if n_tp <= 1:
        return n_events
    want = -(-2 * n_events // n_tp)
    return min(n_events, -(-want // 512) * 512)


def sb_routed_updates(dcfg, be: "TpBackend", s_tc, b_tc, kcodes, active,
                      dp_axis: str):
    """Owner-routed s/b-mer update exchange over the mesh (the TPU analog
    of the reference's deferred-insert matrices *_to_add[src][dst] +
    owner-thread drain, application.h:56-59, dna.cpp:2393-2472).

    The replicated-update path all_gathers the FULL batch over dp and has
    every device recompute and apply all dp shards' events masked to its
    tp bucket range: O(dp*B) wire and O(dp*B) scatter work per device.
    Here each device computes its OWN shard's events per row block,
    filters them to its tp range (the batch is replicated over tp, so the
    cross-tp "all_to_all" is free), compacts them to a fixed cap, and
    all_gathers ONLY the compacted in-range events over dp: O(dp*B/tp)
    wire and scatter work. The global row-block replay then applies every
    shard's events in the same authoritative order as the replicated path
    (shard-major row blocks), so the resulting tables are BIT-IDENTICAL —
    the per-call event multisets match and the update protocols are
    order-independent within a call. The only possible divergence is the
    deterministic overflow drop past the 2x cap (pathologically skewed
    bucket distributions); both sides replay it identically, which is why
    the protocol choice rides the archive header (params.mesh_route_sb).

    kcodes/active: the LOCAL dp shard's [R_shard(, expanded), L] block.
    Returns (s_tc, b_tc) evolved with the full batch's events."""
    # Global row rd of the gathered batch holds read rd of every GLOBAL
    # lane (common.to_row_blocks; lanes own contiguous read ranges). Each
    # dp shard's reads cover exactly N/dp global lanes across ALL r_pl_g
    # rows, so blocking the LOCAL shard by N/dp lanes aligns local row rd
    # with global row rd — the routed replay applies the identical
    # per-global-row event multisets in the identical order.
    N = dcfg.n_lanes
    assert N % be.n_dp == 0, "n_lanes must be divisible by dp"
    rb = partial(common.to_row_blocks, n_lanes=N // be.n_dp)
    kc_r, act_r = rb(kcodes), rb(active)      # [r_pl_g, N/dp, L]

    def route(k, log2b):
        ev = jax.vmap(lambda kc, a: dna.sb_canon_events(dcfg, kc, a, k,
                                                        log2b))(kc_r, act_r)
        bkt, tag, valid = ev                       # [r_pl_g, E] each
        rows, E = bkt.shape
        cap = _route_cap(E, be.n_tp)
        local_buckets = s_tc.shape[0] if k == dcfg.smer_len else b_tc.shape[0]
        my = jax.lax.axis_index(be.axis)
        own = valid & (bkt >= my * local_buckets) \
            & (bkt < (my + 1) * local_buckets)
        pos = jnp.cumsum(own.astype(jnp.int32), axis=1) - 1
        tgt = jnp.where(own & (pos < cap), pos, cap)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, E), 0)
        buf_t = jnp.zeros((rows, cap + 1), jnp.uint32).at[ridx, tgt].set(
            tag, mode="drop")[:, :cap]
        buf_b = jnp.zeros((rows, cap + 1), jnp.int32).at[ridx, tgt].set(
            bkt, mode="drop")[:, :cap]
        # [dp, r_pl_g, cap] -> per-global-row shard-concatenated events
        g = lambda a: jax.lax.all_gather(a, dp_axis, axis=0).transpose(
            1, 0, 2).reshape(rows, be.n_dp * cap)
        return g(buf_b), g(buf_t)

    s_b, s_t = route(dcfg.smer_len, dcfg.smer_log2_buckets)
    b_b, b_t = route(dcfg.bmer_len, dcfg.bmer_log2_buckets)

    def step(carry, x):
        s_tc, b_tc = carry
        sb, st_, bb, bt_ = x
        s_tc = be.ktable_update(s_tc, sb, st_, st_ != 0,
                                log2_base=dcfg.smer_log2_buckets)
        b_tc = be.ktable_update(b_tc, bb, bt_, bt_ != 0,
                                log2_base=dcfg.bmer_log2_buckets)
        return (s_tc, b_tc), ()

    (s_tc, b_tc), _ = jax.lax.scan(step, (s_tc, b_tc), (s_b, s_t, b_b, b_t))
    return s_tc, b_tc


def make_sharded_maintenance(dcfg, qcfg, mcfg, icfg, mesh: Mesh):
    """Group-boundary table maintenance on the mesh — the coordinated-
    restruct analog of the reference (application.cpp:894-902) and of the
    single-chip pipeline.grow_tables: clamp the u16 slot counters away from
    the wrap point (no-op under the K2 protocol, which saturates in-update)
    and prune SIV singletons when the global fill crosses the same
    threshold the single-chip path uses. Runs on identical state at the
    same boundary on BOTH sides, so encoder and decoder stay in lockstep.

    Growth is intentionally absent: mesh tables are presized from -gs
    (params.adjust_kmer_sizes allocates ~2 cells per genome base across
    the tp shards) and sharded growth would need a cross-shard cell
    exchange; the returned fill stats let the caller surface a warning
    when a shard exceeds the single-chip growth threshold (inserts start
    dropping, like the reference's full buckets, ht_kmer.h:420-438).

    Returns (new_dna_state, fills) with fills = [s_used, b_used, siv_nz]
    GLOBAL counts (replicated)."""
    from ..pipeline import SIV_PRUNE_NUM, SIV_PRUNE_DEN

    n_tp = mesh.shape["tp"]

    def step(dna_state):
        s_tc, b_tc = dna_state.s_tc, dna_state.b_tc
        if dcfg.canon:
            s_tc = tables.ktable_clamp(s_tc)
            b_tc = tables.ktable_clamp(b_tc)
            fill_fn = tables.ktable_fill_stats
        else:
            fill_fn = tables.table_fill_stats
        su, _ = fill_fn(s_tc)
        bu, _ = fill_fn(b_tc)
        nz_local, _ = tables.siv_fill(dna_state.siv)
        su = jax.lax.psum(su, "tp")
        bu = jax.lax.psum(bu, "tp")
        nz = jax.lax.psum(nz_local, "tp")
        # static threshold (python int): nz * DEN overflows int32 at the
        # default siv_len-14 capacity (268M counters)
        cap = 4 * dna_state.siv.shape[0] * n_tp
        prune = nz > (cap * SIV_PRUNE_NUM) // SIV_PRUNE_DEN
        siv = jnp.where(prune, tables.siv_prune(dna_state.siv),
                        dna_state.siv)
        return (dna_state._replace(siv=siv, s_tc=s_tc, b_tc=b_tc),
                jnp.stack([su, bu, nz]))

    dna_spec = dna.DnaState(
        siv=P("tp"), s_tc=P("tp"), b_tc=P("tp"), model=P(),
        pe=(P(), P(), P(), P(), P()) if dcfg.pe_log2_buckets > 0 else None)
    fn = jax.shard_map(step, mesh=mesh, in_specs=(dna_spec,),
                       out_specs=(dna_spec, P()), check_vma=False)
    return jax.jit(fn)


def _shard_n_valid(take, R_shard: int):
    """Per-dp-shard valid-row count from the global batch `take` (codec-v2
    padding mask): reads are dp-sharded contiguously, so shard s owns global
    rows [s*R_shard, (s+1)*R_shard) and its local valid prefix is
    clip(take - s*R_shard, 0, R_shard)."""
    my = jax.lax.axis_index("dp")
    return jnp.clip(take - my * R_shard, 0, R_shard).astype(jnp.int32)


def _grids_step(dcfg, qcfg, mcfg, icfg, be, state, codes, kcodes, lengths,
                qsyms, id_batch, n_valid=None):
    """Per-shard modeling + full-batch state evolution (collectives over dp).

    The shared core of the sharded encode/model steps: models the dp-local
    read shard against the batch-frozen state, then evolves tables/models
    from the all_gather'ed full batch (the collective analog of the
    reference's barrier-bracketed *_to_add exchange, application.h:56-59).
    Returns (per-stream (freq, cum) u16 lane grids in ARCHIVE stream order
    [meta, dna, qual?, id?], per-stream modeling tuples, new_state)."""
    from ..pipeline import CodecState

    g = partial(jax.lax.all_gather, axis_name="dp", axis=0, tiled=True)
    g16 = lambda a, n: common.to_grid(a, n).astype(jnp.uint16)

    # META
    lcp = (meta.compute_lcp(codes, lengths, mcfg.n_lanes, mcfg.lcp_stride)
           if mcfg.with_lcp else None)
    m_ctx, m_syms, m_f, m_c = meta.meta_modeling(mcfg, state.meta,
                                                 lengths, lcp)
    m_model = models.model_update(
        state.meta, g(m_ctx).reshape(-1), g(m_syms).reshape(-1),
        jnp.ones(g(m_ctx).size, dtype=bool))

    # DNA (kcodes -> repaired effective kcodes, dna.dna_effective_kcodes).
    # In-batch statistics are per-dp-shard (each shard's decode scan
    # covers the same read range), so they need no collectives. Under
    # row_global the row scan carries this shard's COPY of the tp-sharded
    # tables (row-fresh repair + cascade, like the reference's per-thread
    # local deltas); the carried tables are DISCARDED — the authoritative
    # evolution is the batch-level collect on the frozen state below,
    # which every device computes identically from the gathered batch.
    with_pe = dcfg.pe_log2_buckets > 0
    pe_grid = None
    if with_pe:
        # anchors are found per dp shard against the REPLICATED pair table
        # (state_specs), so every shard's anchor choices replay identically
        # on decode; the pair/pe-model evolution below runs on the gathered
        # full batch on every replica
        (codes3, lengths3, anchor_mask3, lcp3, pe_syms, pe_act, pe_f,
         pe_c2, pos_map3) = dna.dna_pe_encode(dcfg, state.dna, codes,
                                              lengths, lcp=lcp)
        kcodes3 = jnp.where(codes3 >= 4, 0, codes3)
        if dcfg.row_global:
            eff, ctx, sym, f, c, active, _, _ = dna.dna_process_batch_rg(
                dcfg, state.dna, codes3, kcodes3, lengths3, be, lcp3,
                anchor_mask=anchor_mask3, pos_map=pos_map3)
        else:
            eff = dna.dna_effective_kcodes(dcfg, state.dna, codes3, kcodes3,
                                           lengths3, be)
            ctx, sym, f, c, active = dna.dna_modeling(
                dcfg, state.dna, codes3, eff, lengths3, be, lcp3,
                anchor_mask=anchor_mask3, pos_map=pos_map3)
        d_state = dna.dna_collect_updates(
            dcfg, state.dna, g(codes3), g(eff), g(lengths3),
            g(ctx), g(sym), g(active), be,
            pe_syms=g(pe_syms), pe_act=g(pe_act),
            codes_true=g(codes), lengths_true=g(lengths),
            skip_sb=bool(dcfg.route_sb))
        if dcfg.route_sb:
            s_tc3, b_tc3 = sb_routed_updates(
                dcfg, be, state.dna.s_tc, state.dna.b_tc, eff,
                _in_len_mask(lengths3, eff.shape[1]), "dp")
            d_state = d_state._replace(s_tc=s_tc3, b_tc=b_tc3)
        pe_grid = (g16(pe_f, dcfg.n_lanes), g16(pe_c2, dcfg.n_lanes))
    elif dcfg.row_global:
        eff, ctx, sym, f, c, active, _, _ = dna.dna_process_batch_rg(
            dcfg, state.dna, codes, kcodes, lengths, be, lcp)
        d_state = dna.dna_collect_updates(
            dcfg, state.dna, g(codes), g(eff), g(lengths),
            g(ctx), g(sym), g(active), be, skip_sb=bool(dcfg.route_sb))
        if dcfg.route_sb:
            s_tc, b_tc = sb_routed_updates(
                dcfg, be, state.dna.s_tc, state.dna.b_tc, eff,
                _in_len_mask(lengths, eff.shape[1]), "dp")
            d_state = d_state._replace(s_tc=s_tc, b_tc=b_tc)
    else:
        eff = dna.dna_effective_kcodes(dcfg, state.dna, codes, kcodes,
                                       lengths, be)
        ctx, sym, f, c, active = dna.dna_modeling(
            dcfg, state.dna, codes, eff, lengths, be, lcp)
        d_state = dna.dna_collect_updates(
            dcfg, state.dna, g(codes), g(eff), g(lengths),
            g(ctx), g(sym), g(active), be)

    grids = [(g16(m_f, mcfg.n_lanes), g16(m_c, mcfg.n_lanes)),
             (g16(f, dcfg.n_lanes), g16(c, dcfg.n_lanes))]

    # QUALITY
    if qcfg is not None:
        q_ctx, q_f, q_c, q_active = quality.qual_modeling(
            qcfg, state.qual, qsyms, lengths)
        q_model = models.model_update(
            state.qual, g(q_ctx).reshape(-1), g(qsyms).reshape(-1),
            g(q_active).reshape(-1))
        grids.append((g16(q_f, qcfg.n_lanes), g16(q_c, qcfg.n_lanes)))
    else:
        q_model = None

    # IDS (n_valid: per-shard valid-row count — codec v2 pads code nothing;
    # the gathered active mask reproduces the single-chip global mask)
    if icfg is not None:
        i_ctx, i_syms, i_f, i_c, i_active = ids.id_modeling(
            icfg, state.id, *id_batch, n_valid=n_valid)
        i_model = models.model_update(
            state.id, g(i_ctx).reshape(-1), g(i_syms).reshape(-1),
            g(i_active).reshape(-1))
        grids.append((g16(i_f, icfg.n_lanes), g16(i_c, icfg.n_lanes)))
    else:
        i_model = None
    if pe_grid is not None:
        grids.append(pe_grid)

    new_state = CodecState(dna=d_state, meta=m_model, qual=q_model,
                           id=i_model)
    return grids, new_state


def make_sharded_model(dcfg, qcfg, mcfg, icfg, mesh: Mesh):
    """Build the jitted multi-chip MODELING step (no entropy coding): returns
    per-stream (freq, cum) u16 grids, global shape [T, dp*N] with lanes
    sharded over dp, plus the evolved state. The caller buffers grids per
    batch and entropy-codes each group in reverse via make_sharded_rans so
    lane states chain — the mesh analog of the single-chip group-chained
    emission (pipeline.flush_group)."""
    n_tp = mesh.shape["tp"]
    be = TpBackend("tp", n_tp, mesh.shape["dp"])

    def step(state, codes, kcodes, lengths, qsyms, id_batch, take):
        grids, new_state = _grids_step(
            dcfg, qcfg, mcfg, icfg, be, state, codes, kcodes, lengths,
            qsyms, id_batch, n_valid=_shard_n_valid(take, codes.shape[0]))
        return tuple(grids), new_state

    sspec = state_specs(qcfg is not None, icfg is not None,
                        dcfg.pe_log2_buckets > 0)
    batch = P("dp")
    n_streams = (2 + (qcfg is not None) + (icfg is not None)
                 + (dcfg.pe_log2_buckets > 0))
    gspec = (P(None, "dp"), P(None, "dp"))  # [T, dp*N] lane grids
    fn = jax.shard_map(
        step, mesh=mesh,
        in_specs=(sspec, batch, batch, batch, batch, batch, P()),
        out_specs=((gspec,) * n_streams, sspec),
        check_vma=False)
    return jax.jit(fn)


def make_sharded_rans(mesh: Mesh, scale_bits: int):
    """Per-dp-shard interleaved rANS encode: each shard entropy-codes its own
    [T, N] grid slice into an independent word stream (deterministic
    shard-major assembly, reference reads_block.h:197-214). init/final lane
    states are [dp*N] so the caller can chain batches within a group."""

    def enc(f, c, st):
        words, n, st2 = rans.rans_encode(
            f.astype(jnp.uint32), c.astype(jnp.uint32), scale_bits, st)
        return words, n.reshape(1), st2

    fn = jax.shard_map(
        enc, mesh=mesh,
        in_specs=(P(None, "dp"), P(None, "dp"), P("dp")),
        out_specs=(P("dp"), P("dp"), P("dp")),
        check_vma=False)
    return jax.jit(fn)


def make_sharded_encode(dcfg, qcfg, mcfg, icfg, mesh: Mesh):
    """Build the jitted multi-chip compress step: model + encode the dp-local
    read shard with fresh lane states, then evolve all tables/models from the
    full batch. (Single-step form — the file pipeline uses make_sharded_model
    + make_sharded_rans for group-chained emission.)"""
    n_tp = mesh.shape["tp"]
    be = TpBackend("tp", n_tp, mesh.shape["dp"])

    def step(state, codes, kcodes, lengths, qsyms, id_batch, take):
        grids, new_state = _grids_step(
            dcfg, qcfg, mcfg, icfg, be, state, codes, kcodes, lengths,
            qsyms, id_batch, n_valid=_shard_n_valid(take, codes.shape[0]))
        coded = []
        for f, c in grids:
            words, n, st = rans.rans_encode(
                f.astype(jnp.uint32), c.astype(jnp.uint32), dcfg.scale_bits)
            coded.append((words, n.reshape(1), st))
        zero = (jnp.zeros((0,), jnp.uint32), jnp.zeros((1,), jnp.int32),
                jnp.zeros((0,), jnp.uint32))
        m_out, d_out = coded[0], coded[1]
        q_out = coded[2] if qcfg is not None else zero
        i_out = (coded[2 + (qcfg is not None)] if icfg is not None else zero)
        return m_out, i_out, d_out, q_out, new_state

    assert dcfg.pe_log2_buckets == 0, \
        "single-step sharded encode has no pe-stream slot; use " \
        "make_sharded_model + make_sharded_rans (the file pipeline path)"
    sspec = state_specs(qcfg is not None, icfg is not None)
    batch = P("dp")
    out_stream = (P("dp"), P("dp"), P("dp"))
    fn = jax.shard_map(
        step, mesh=mesh,
        in_specs=(sspec, batch, batch, batch, batch, batch, P()),
        out_specs=(out_stream, out_stream, out_stream, out_stream, sspec),
        check_vma=False)
    return jax.jit(fn)


def make_sharded_decode(dcfg, qcfg, mcfg, icfg, mesh: Mesh, R_shard: int,
                        L: int):
    """Build the jitted multi-chip decompress step. Each dp shard decodes its
    own lane group (scans with tp-psum'd finds), then all shards apply the
    identical full-batch update."""
    from ..pipeline import CodecState

    n_tp = mesh.shape["tp"]
    be = TpBackend("tp", n_tp, mesh.shape["dp"])

    with_pe = dcfg.pe_log2_buckets > 0

    def step(state: CodecState, m_words, m_states, i_words, i_states,
             d_words, d_states, q_words, q_states, pe_words, pe_states,
             take):
        g = partial(jax.lax.all_gather, axis_name="dp", axis=0, tiled=True)
        n_valid = _shard_n_valid(take, R_shard)

        lengths, lcp, _, m_x, _ = meta.meta_decode_batch(
            mcfg, state.meta, R_shard, m_words, m_states)
        lengths = jnp.minimum(lengths, L).astype(jnp.int32)
        lcp = lcp if mcfg.with_lcp else None
        m_ctx, m_syms, _, _ = meta.meta_modeling(mcfg, state.meta, lengths,
                                                 lcp)
        m_model = models.model_update(
            state.meta, g(m_ctx).reshape(-1), g(m_syms).reshape(-1),
            jnp.ones(g(m_ctx).size, dtype=bool))

        if with_pe:
            # per-shard anchored decode; the collect below replays the
            # gathered full batch (expanded rows + pe stream + true reads)
            # identically on every replica, mirroring _grids_step
            codes, _, d_x, _, ex = dna.dna_decode_batch(
                dcfg, state.dna, lengths, d_words, d_states, L, be,
                apply_update=False, lcp=lcp, lcp_stride=mcfg.lcp_stride,
                pe_words=pe_words, pe_states=pe_states)
            (eff, ctx, sym, active, pe_x, pe_syms, pe_act, codes3,
             lengths3) = ex
            d_state = dna.dna_collect_updates(
                dcfg, state.dna, g(codes3), g(eff), g(lengths3),
                g(ctx), g(sym), g(active), be,
                pe_syms=g(pe_syms), pe_act=g(pe_act),
                codes_true=g(codes), lengths_true=g(lengths),
                skip_sb=bool(dcfg.route_sb))
            if dcfg.route_sb:
                s_tc, b_tc = sb_routed_updates(
                    dcfg, be, state.dna.s_tc, state.dna.b_tc, eff,
                    _in_len_mask(lengths3, eff.shape[1]), "dp")
                d_state = d_state._replace(s_tc=s_tc, b_tc=b_tc)
        else:
            codes, _, d_x, _, (eff, ctx, sym, active) = dna.dna_decode_batch(
                dcfg, state.dna, lengths, d_words, d_states, L, be,
                apply_update=False, lcp=lcp, lcp_stride=mcfg.lcp_stride)
            pe_x = pe_states
            d_state = dna.dna_collect_updates(
                dcfg, state.dna, g(codes), g(eff), g(lengths),
                g(ctx), g(sym), g(active), be, skip_sb=bool(dcfg.route_sb))
            if dcfg.route_sb:
                s_tc, b_tc = sb_routed_updates(
                    dcfg, be, state.dna.s_tc, state.dna.b_tc, eff,
                    _in_len_mask(lengths, eff.shape[1]), "dp")
                d_state = d_state._replace(s_tc=s_tc, b_tc=b_tc)

        if qcfg is not None:
            qsyms, _, q_x, _ = quality.qual_decode_batch(
                qcfg, state.qual, lengths, q_words, q_states, L)
            q_ctx, _, _, q_active = quality.qual_modeling(
                qcfg, state.qual, qsyms, lengths)
            q_model = models.model_update(
                state.qual, g(q_ctx).reshape(-1), g(qsyms).reshape(-1),
                g(q_active).reshape(-1))
        else:
            qsyms, q_model, q_x = (jnp.zeros((R_shard, L), jnp.int32), None,
                                   q_states)

        if icfg is not None:
            (i_flag, i_dsym, i_dmag, i_emat, i_elens, _, i_x,
             _) = ids.id_decode_batch(icfg, state.id, R_shard, i_words,
                                      i_states, n_valid=n_valid)
            id_batch = (i_flag, i_dsym, i_dmag, i_emat, i_elens)
            i_ctx, i_syms, _, _, i_active = ids.id_modeling(
                icfg, state.id, *id_batch, n_valid=n_valid)
            i_model = models.model_update(
                state.id, g(i_ctx).reshape(-1), g(i_syms).reshape(-1),
                g(i_active).reshape(-1))
        else:
            id_batch = tuple(
                jnp.asarray(a) for a in ids.zero_id_batch(R_shard))
            i_model, i_x = None, i_states

        new_state = CodecState(dna=d_state, meta=m_model, qual=q_model,
                               id=i_model)
        # final per-lane rANS states, archive stream order — the caller
        # chains them into the next batch of the group (pipeline.flush_group
        # analog on the decode side)
        xs = [m_x, d_x] + ([q_x] if qcfg is not None else []) \
            + ([i_x] if icfg is not None else []) \
            + ([pe_x] if with_pe else [])
        return lengths, codes, qsyms, id_batch, new_state, tuple(xs)

    sspec = state_specs(qcfg is not None, icfg is not None, with_pe)
    w = P("dp")
    n_streams = 2 + (qcfg is not None) + (icfg is not None) + with_pe
    fn = jax.shard_map(
        step, mesh=mesh,
        in_specs=(sspec, w, w, w, w, w, w, w, w, w, w, P()),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp"), sspec,
                   (P("dp"),) * n_streams),
        check_vma=False)
    return jax.jit(fn)
