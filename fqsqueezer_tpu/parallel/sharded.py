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
    index/bucket range; finds psum partial answers, updates mask to owners."""

    axis: str
    n_tp: int

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

    def siv_update(self, siv_local, keys, valid):
        n_local = siv_local.shape[0]
        my = jax.lax.axis_index(self.axis)
        local_ctx = (keys >> 2) - my * n_local
        own = valid & (local_ctx >= 0) & (local_ctx < n_local)
        local_keys = (jnp.clip(local_ctx, 0, n_local - 1) << 2) | (keys & 3)
        return tables.siv_update(siv_local, local_keys, own)

    # --- hash tables: sharded by bucket range ------------------------------
    def _local_bucket(self, tags_local, lo, hi):
        local_buckets = tags_local.shape[0]
        log2_global = (local_buckets * self.n_tp).bit_length() - 1
        bkt = kmers.hash_bucket(lo, hi, log2_global)
        my = jax.lax.axis_index(self.axis)
        local = bkt - my * local_buckets
        own = (local >= 0) & (local < local_buckets)
        return jnp.clip(local, 0, local_buckets - 1), own

    def table_find(self, tags_local, cnts_local, lo, hi):
        idx, own = self._local_bucket(tags_local, lo, hi)
        tag = kmers.hash_tag(lo, hi)
        row_t = tags_local[idx]
        row_c = cnts_local[idx]
        match = (row_t == tag[..., None]) & own[..., None]
        found = jnp.any(match, axis=-1)
        word = jnp.sum(jnp.where(match, row_c, tables.EMPTY), axis=-1)
        c4 = tables.unpack_counts(word.astype(jnp.uint32))
        c4 = jax.lax.psum(c4, self.axis)
        found = jax.lax.psum(found.astype(jnp.int32), self.axis) > 0
        return c4, found

    def table_update(self, tags_local, cnts_local, lo, hi, base, valid):
        idx, own = self._local_bucket(tags_local, lo, hi)
        tag = kmers.hash_tag(lo, hi)
        return tables.table_update(tags_local, cnts_local, lo, hi, base,
                                   valid & own, bkt=idx, tag=tag)


def state_specs(qual: bool, with_ids: bool = False):
    """PartitionSpecs for CodecState: tables sharded over tp, models replicated."""
    from ..pipeline import CodecState

    dna_spec = dna.DnaState(
        siv=P("tp"), s_tags=P("tp"), s_cnts=P("tp"),
        b_tags=P("tp"), b_cnts=P("tp"), model=P())
    return CodecState(dna=dna_spec, meta=P(), qual=P() if qual else None,
                      id=P() if with_ids else None)


def make_sharded_encode(dcfg, qcfg, mcfg, icfg, mesh: Mesh):
    """Build the jitted multi-chip compress step: model + encode the dp-local
    read shard, then evolve all tables/models from the full batch."""
    from ..pipeline import CodecState

    n_tp = mesh.shape["tp"]
    be = TpBackend("tp", n_tp)

    def step(state: CodecState, codes, kcodes, lengths, qsyms, id_batch):
        g = partial(jax.lax.all_gather, axis_name="dp", axis=0, tiled=True)

        # META
        lcp = (meta.compute_lcp(codes, lengths, mcfg.n_lanes,
                                mcfg.lcp_stride)
               if mcfg.with_lcp else None)
        m_ctx, m_syms, m_f, m_c = meta.meta_modeling(mcfg, state.meta,
                                                     lengths, lcp)
        m_words, m_n, m_states = rans.rans_encode(
            common.to_grid(m_f, mcfg.n_lanes), common.to_grid(m_c, mcfg.n_lanes),
            mcfg.scale_bits)
        m_model = models.model_update(
            state.meta, g(m_ctx).reshape(-1), g(m_syms).reshape(-1),
            jnp.ones(g(m_ctx).size, dtype=bool))

        # DNA (kcodes -> repaired effective kcodes, dna.dna_effective_kcodes).
        # In-batch local statistics are per-dp-shard (each shard's decode
        # scan covers the same read range), so they need no collectives.
        eff = dna.dna_effective_kcodes(dcfg, state.dna, codes, kcodes,
                                       lengths, be)
        ctx, sym, f, c, active = dna.dna_modeling(
            dcfg, state.dna, codes, eff, lengths, be, lcp)
        d_words, d_n, d_states = rans.rans_encode(
            common.to_grid(f, dcfg.n_lanes), common.to_grid(c, dcfg.n_lanes),
            dcfg.scale_bits)
        d_state = dna.dna_collect_updates(
            dcfg, state.dna, g(codes), g(eff), g(lengths),
            g(ctx), g(sym), g(active), be)

        # QUALITY
        if qcfg is not None:
            q_ctx, q_f, q_c, q_active = quality.qual_modeling(
                qcfg, state.qual, qsyms, lengths)
            q_words, q_n, q_states = rans.rans_encode(
                common.to_grid(q_f, qcfg.n_lanes),
                common.to_grid(q_c, qcfg.n_lanes), qcfg.scale_bits)
            q_model = models.model_update(
                state.qual, g(q_ctx).reshape(-1), g(qsyms).reshape(-1),
                g(q_active).reshape(-1))
        else:
            q_words, q_n, q_states, q_model = (
                jnp.zeros((0,), jnp.uint32), jnp.int32(0),
                jnp.zeros((0,), jnp.uint32), None)

        # IDS
        if icfg is not None:
            i_ctx, i_syms, i_f, i_c, i_active = ids.id_modeling(
                icfg, state.id, *id_batch)
            i_words, i_n, i_states = rans.rans_encode(
                common.to_grid(i_f, icfg.n_lanes),
                common.to_grid(i_c, icfg.n_lanes), icfg.scale_bits)
            i_model = models.model_update(
                state.id, g(i_ctx).reshape(-1), g(i_syms).reshape(-1),
                g(i_active).reshape(-1))
        else:
            i_words, i_n, i_states, i_model = (
                jnp.zeros((0,), jnp.uint32), jnp.int32(0),
                jnp.zeros((0,), jnp.uint32), None)

        new_state = CodecState(dna=d_state, meta=m_model, qual=q_model,
                               id=i_model)
        # scalars -> [1] so they carry a shardable dp dimension
        return ((m_words, m_n.reshape(1), m_states),
                (i_words, jnp.reshape(i_n, (1,)), i_states),
                (d_words, d_n.reshape(1), d_states),
                (q_words, jnp.reshape(q_n, (1,)), q_states), new_state)

    sspec = state_specs(qcfg is not None, icfg is not None)
    batch = P("dp")
    out_stream = (P("dp"), P("dp"), P("dp"))
    fn = jax.shard_map(
        step, mesh=mesh,
        in_specs=(sspec, batch, batch, batch, batch, batch),
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
    be = TpBackend("tp", n_tp)

    def step(state: CodecState, m_words, m_states, i_words, i_states,
             d_words, d_states, q_words, q_states):
        g = partial(jax.lax.all_gather, axis_name="dp", axis=0, tiled=True)

        lengths, lcp, _, _, _ = meta.meta_decode_batch(
            mcfg, state.meta, R_shard, m_words, m_states)
        lengths = jnp.minimum(lengths, L).astype(jnp.int32)
        lcp = lcp if mcfg.with_lcp else None
        m_ctx, m_syms, _, _ = meta.meta_modeling(mcfg, state.meta, lengths,
                                                 lcp)
        m_model = models.model_update(
            state.meta, g(m_ctx).reshape(-1), g(m_syms).reshape(-1),
            jnp.ones(g(m_ctx).size, dtype=bool))

        codes, _, _, _, (eff, ctx, sym, active) = dna.dna_decode_batch(
            dcfg, state.dna, lengths, d_words, d_states, L, be,
            apply_update=False, lcp=lcp, lcp_stride=mcfg.lcp_stride)
        d_state = dna.dna_collect_updates(
            dcfg, state.dna, g(codes), g(eff), g(lengths),
            g(ctx), g(sym), g(active), be)

        if qcfg is not None:
            qsyms, _, _, _ = quality.qual_decode_batch(
                qcfg, state.qual, lengths, q_words, q_states, L)
            q_ctx, _, _, q_active = quality.qual_modeling(
                qcfg, state.qual, qsyms, lengths)
            q_model = models.model_update(
                state.qual, g(q_ctx).reshape(-1), g(qsyms).reshape(-1),
                g(q_active).reshape(-1))
        else:
            qsyms, q_model = jnp.zeros((R_shard, L), jnp.int32), None

        if icfg is not None:
            (i_flag, i_dsym, i_dmag, i_emat, i_elens, _, _,
             _) = ids.id_decode_batch(icfg, state.id, R_shard, i_words,
                                      i_states)
            id_batch = (i_flag, i_dsym, i_dmag, i_emat, i_elens)
            i_ctx, i_syms, _, _, i_active = ids.id_modeling(
                icfg, state.id, *id_batch)
            i_model = models.model_update(
                state.id, g(i_ctx).reshape(-1), g(i_syms).reshape(-1),
                g(i_active).reshape(-1))
        else:
            id_batch = tuple(
                jnp.asarray(a) for a in ids.zero_id_batch(R_shard))
            i_model = None

        new_state = CodecState(dna=d_state, meta=m_model, qual=q_model,
                               id=i_model)
        return lengths, codes, qsyms, id_batch, new_state

    sspec = state_specs(qcfg is not None, icfg is not None)
    w = P("dp")
    fn = jax.shard_map(
        step, mesh=mesh,
        in_specs=(sspec, w, w, w, w, w, w, w, w),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp"), sspec),
        check_vma=False)
    return jax.jit(fn)
