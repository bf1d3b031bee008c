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
    dcfg = dna.DnaConfig(
        siv_len=p.siv_len, smer_len=p.smer_len, bmer_len=p.bmer_len,
        prefix_len=p.prefix_len, scale_bits=p.scale_bits, n_lanes=p.n_lanes,
        smer_log2_buckets=p.smer_log2_buckets,
        bmer_log2_buckets=p.bmer_log2_buckets)
    qmode = p.quality_mode.value
    qcfg = None
    if p.quality_mode != QualityMode.NONE:
        qcfg = quality.QualConfig(mode=qmode, qt=p.quality_thr,
                                  scale_bits=p.scale_bits, n_lanes=p.n_lanes)
    mcfg = meta.MetaConfig(scale_bits=p.scale_bits, n_lanes=p.n_lanes)
    icfg = None
    if p.id_mode != IdMode.NONE:
        icfg = ids.IdConfig(max_id_len=p.max_id_len, scale_bits=p.scale_bits,
                            n_lanes=p.n_lanes)
    return dcfg, qcfg, mcfg, icfg


def state_create(dcfg, qcfg, icfg=None) -> CodecState:
    return CodecState(
        dna=dna.dna_state_create(dcfg),
        meta=meta.meta_state_create(),
        qual=None if qcfg is None else quality.qual_state_create(qcfg),
        id=None if icfg is None else ids.id_state_create())


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _encode_batch(dcfg, qcfg, mcfg, icfg, state: CodecState, codes, kcodes,
                  lengths, qsyms, id_mat, id_lens):
    m_words, m_n, m_states, m_model = meta.meta_encode_batch(
        mcfg, state.meta, lengths)
    d_words, d_n, d_states, d_state = dna.dna_encode_batch(
        dcfg, state.dna, codes, kcodes, lengths)
    if qcfg is not None:
        q_words, q_n, q_states, q_model = quality.qual_encode_batch(
            qcfg, state.qual, qsyms, lengths)
    else:
        q_words, q_n, q_states, q_model = (
            jnp.zeros((0,), jnp.uint32), jnp.int32(0),
            jnp.zeros((0,), jnp.uint32), None)
    if icfg is not None:
        i_words, i_n, i_states, i_model = ids.id_encode_batch(
            icfg, state.id, id_mat, id_lens)
    else:
        i_words, i_n, i_states, i_model = (
            jnp.zeros((0,), jnp.uint32), jnp.int32(0),
            jnp.zeros((0,), jnp.uint32), None)
    new_state = CodecState(dna=d_state, meta=m_model, qual=q_model,
                           id=i_model)
    return ((m_words, m_n, m_states), (i_words, i_n, i_states),
            (d_words, d_n, d_states), (q_words, q_n, q_states), new_state)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _decode_batch(dcfg, qcfg, mcfg, icfg, R, L, state: CodecState,
                  m_words, m_states, i_words, i_states,
                  d_words, d_states, q_words, q_states):
    lengths, m_model, _, _ = meta.meta_decode_batch(
        mcfg, state.meta, R, m_words, m_states)
    lengths = jnp.minimum(lengths, L).astype(jnp.int32)
    codes, d_state, _, _ = dna.dna_decode_batch(
        dcfg, state.dna, lengths, d_words, d_states, L)
    if qcfg is not None:
        qsyms, q_model, _, _ = quality.qual_decode_batch(
            qcfg, state.qual, lengths, q_words, q_states, L)
    else:
        qsyms, q_model = jnp.zeros((R, L), jnp.int32), None
    if icfg is not None:
        id_mat, id_lens, i_model, _, _ = ids.id_decode_batch(
            icfg, state.id, R, i_words, i_states)
    else:
        id_mat = jnp.zeros((R, 1), jnp.uint8)
        id_lens, i_model = jnp.zeros((R,), jnp.int32), None
    new_state = CodecState(dna=d_state, meta=m_model, qual=q_model,
                           id=i_model)
    return lengths, codes, qsyms, id_mat, id_lens, new_state


def batch_schedule(n_reads: int, n_lanes: int, max_batch: int,
                   first_batch: int = 0):
    """Doubling batch sizes: [first, 2*first, ...] capped at max_batch — the
    analog of the reference's decaying sync frequency (application.h:85-92):
    young tables sync often. Returns (start, take, padded) triples."""
    if not first_batch:
        first_batch = max_batch // 16
    first_batch = max(min(first_batch, max_batch), n_lanes)
    out = []
    start = 0
    size = first_batch
    while start < n_reads:
        take = min(size, n_reads - start)
        padded = common.pad_reads(take, n_lanes)
        out.append((start, take, padded))
        start += take
        size = min(size * 2, max_batch)
    return out


def _pad_batch(arr: np.ndarray, padded: int):
    take = arr.shape[0]
    if take == padded:
        return arr
    pad_shape = (padded - take,) + arr.shape[1:]
    return np.concatenate([arr, np.zeros(pad_shape, arr.dtype)], axis=0)


def compress_file(p: Params, in_path: str, out_path: str,
                  data: Optional[fastq.FastqData] = None) -> dict:
    """SE compression. Returns stats dict."""
    if data is None:
        data = fastq.read_fastq(in_path)
    if p.dna_mode in (DnaMode.SE_SORTED, DnaMode.PE_SORTED):
        order = fastq.sort_order(data.codes, data.lengths)
        data = fastq.FastqData(
            codes=data.codes[order], quals=data.quals[order],
            lengths=data.lengths[order],
            ids=[data.ids[i] for i in order])

    id_list = data.ids
    if p.id_mode == IdMode.INSTRUMENT:
        id_list = ids.instrument_prefix(id_list)
    if p.id_mode != IdMode.NONE:
        p.max_id_len = max(8, max((len(s) for s in id_list), default=8))
        id_mat_all, id_lens_all = ids.ids_to_matrix(id_list, p.max_id_len)
    else:
        id_mat_all = id_lens_all = None

    dcfg, qcfg, mcfg, icfg = make_configs(p)
    state = state_create(dcfg, qcfg, icfg)

    qfwd = None
    if qcfg is not None:
        qfwd, _ = quality.qual_maps(qcfg.mode, qcfg.qt)

    writer = archive.ArchiveWriter(out_path, p.store_params())
    R_total = data.n_reads
    for start, take, padded in batch_schedule(R_total, p.n_lanes,
                                              p.max_batch_reads):
        codes = _pad_batch(data.codes[start:start + take], padded).astype(np.int32)
        lengths = _pad_batch(data.lengths[start:start + take], padded).astype(np.int32)
        if qfwd is not None:
            qs = qfwd[_pad_batch(data.quals[start:start + take], padded)]
        else:
            qs = np.zeros((padded, codes.shape[1]), np.int32)
        if icfg is not None:
            id_mat = _pad_batch(id_mat_all[start:start + take], padded)
            id_lens = _pad_batch(id_lens_all[start:start + take], padded)
        else:
            id_mat = np.zeros((padded, 1), np.uint8)
            id_lens = np.zeros((padded,), np.int32)
        kcodes = np.where(codes >= 4, 0, codes).astype(np.int32)

        m_out, i_out, d_out, q_out, state = _encode_batch(
            dcfg, qcfg, mcfg, icfg, state, jnp.asarray(codes),
            jnp.asarray(kcodes), jnp.asarray(lengths), jnp.asarray(qs),
            jnp.asarray(id_mat), jnp.asarray(id_lens))
        streams = [
            (np.asarray(m_out[0]), int(m_out[1]), np.asarray(m_out[2])),
            (np.asarray(d_out[0]), int(d_out[1]), np.asarray(d_out[2])),
        ]
        if qcfg is not None:
            streams.append((np.asarray(q_out[0]), int(q_out[1]),
                            np.asarray(q_out[2])))
        if icfg is not None:
            streams.append((np.asarray(i_out[0]), int(i_out[1]),
                            np.asarray(i_out[2])))
        writer.write_batch(take, codes.shape[1], streams)
    writer.close()

    import os
    in_bytes = os.path.getsize(in_path) if os.path.exists(in_path) else 0
    out_bytes = os.path.getsize(out_path)
    n_bases = int(data.lengths.sum())
    return {
        "n_reads": R_total, "in_bytes": in_bytes, "out_bytes": out_bytes,
        "bits_per_base": 8.0 * out_bytes / max(1, n_bases),
        "ratio": in_bytes / max(1, out_bytes),
    }


def decompress_file(p_cli: Params, in_path: str, out_path: str) -> dict:
    reader = archive.ArchiveReader(in_path)
    p = Params.load_params(reader.header_blob, base=p_cli)
    dcfg, qcfg, mcfg, icfg = make_configs(p)
    state = state_create(dcfg, qcfg, icfg)

    qrev = None
    if qcfg is not None:
        _, qrev = quality.qual_maps(qcfg.mode, qcfg.qt)

    all_codes, all_quals, all_lengths = [], [], []
    all_ids = [] if icfg is not None else None
    while True:
        rec = reader.read_batch(p.n_lanes)
        if rec is None:
            break
        take, L, streams = rec
        padded = common.pad_reads(take, p.n_lanes)
        cap = padded * max(L, 2)

        def fit(words, cap):
            w = np.zeros((cap,), np.uint32)
            w[:words.shape[0]] = words
            return jnp.asarray(w)

        si = 0
        m_words, _, m_states = streams[si]; si += 1
        d_words, _, d_states = streams[si]; si += 1
        if qcfg is not None:
            q_words, _, q_states = streams[si]; si += 1
        else:
            q_words = np.zeros((0,), np.uint32)
            q_states = np.zeros((0,), np.uint32)
        if icfg is not None:
            i_words, _, i_states = streams[si]; si += 1
            i_cap = padded * (2 + icfg.max_id_len)
        else:
            i_words = np.zeros((0,), np.uint32)
            i_states = np.zeros((0,), np.uint32)
            i_cap = 0

        lengths, codes, qsyms, id_mat, id_lens, state = _decode_batch(
            dcfg, qcfg, mcfg, icfg, padded, L, state,
            fit(m_words, 2 * padded), jnp.asarray(m_states),
            fit(i_words, i_cap), jnp.asarray(i_states),
            fit(d_words, cap), jnp.asarray(d_states),
            fit(q_words, cap), jnp.asarray(q_states))
        all_codes.append(np.asarray(codes[:take]))
        all_quals.append(np.asarray(qsyms[:take]))
        all_lengths.append(np.asarray(lengths[:take]))
        if all_ids is not None:
            mat = np.asarray(id_mat[:take])
            lens = np.asarray(id_lens[:take])
            all_ids.extend(mat[r, :lens[r]].tobytes() for r in range(take))
    reader.close()

    if not all_codes:
        open(out_path, "wb").close()
        return {"n_reads": 0}
    L_max = max(c.shape[1] for c in all_codes)

    def padL(a):
        if a.shape[1] == L_max:
            return a
        return np.pad(a, ((0, 0), (0, L_max - a.shape[1])))

    codes = np.concatenate([padL(c) for c in all_codes]).astype(np.uint8)
    qsyms = np.concatenate([padL(q) for q in all_quals])
    lengths = np.concatenate(all_lengths).astype(np.int32)
    if qrev is not None:
        quals = qrev[qsyms].astype(np.uint8)
    else:
        quals = np.full(qsyms.shape, p.quality_thr, np.uint8)
    fastq.write_fastq(out_path, codes, quals, lengths, all_ids)
    return {"n_reads": int(lengths.shape[0])}
