"""Decompose decode time on one TPU chip: meta scan vs DNA scan vs quality
scan vs table/model updates, on the biggest batch shape of the standard
bench archive.

Sync methodology (see profile_r4.py): under the axon tunnel,
block_until_ready can return early; each timing enqueues REPS async
dispatches of the same call and syncs once by pulling one scalar — per-call
device time = (t(REPS) - t(1)) / (REPS - 1), cancelling the tunnel RTT.
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
from fqsqueezer_tpu import pipeline, archive
from fqsqueezer_tpu.io import fastq
from fqsqueezer_tpu.utils.corpus import write_fastq_corpus
from fqsqueezer_tpu.streams import dna, meta, quality, common
from fqsqueezer_tpu.ops import models as M, tables

CORPUS = "/tmp/fqtz_bench_se.fastq"
ARCHIVE = "/tmp/fqtz_bench.fqst"
REPS = 6


def timeit(label, fn, *args):
    # warm
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0] if leaf.ndim else leaf)

    def run(reps):
        t0 = time.time()
        o = None
        for _ in range(reps):
            o = fn(*args)
        leaf = jax.tree_util.tree_leaves(o)[0]
        np.asarray(leaf.reshape(-1)[0] if leaf.ndim else leaf)
        return time.time() - t0

    t1 = run(1)
    tR = run(REPS)
    per = (tR - t1) / (REPS - 1)
    print(f"{label:34s} {per * 1e3:8.1f} ms", flush=True)
    return per


def main():
    if not os.path.exists(CORPUS):
        write_fastq_corpus(CORPUS, 100_000, 100, 4_600_000, seed=42)
    if not os.path.exists(ARCHIVE):
        p = Params()
        p.genome_size = 5
        p.adjust_kmer_sizes()
        p.dna_mode = DnaMode.SE_ORIGINAL
        p.quality_mode = QualityMode.ILLUMINA_8
        p.id_mode = IdMode.NONE
        p.verbosity = 0
        pipeline.compress_file(p, CORPUS, ARCHIVE)

    reader = archive.ArchiveReader(ARCHIVE)
    p = Params.load_params(reader.header_blob, base=Params())
    dcfg, qcfg, mcfg, icfg = pipeline.make_configs(p)
    state = pipeline.state_create(dcfg, qcfg, icfg)

    # run the decode loop exactly like decompress_file until the LAST batch,
    # capturing that batch's inputs (biggest shape, mature tables)
    rec = reader.read_group(p.n_lanes)
    gstates, batches, _ = rec
    cur = [jnp.asarray(st) for st in gstates]
    align = p.n_lanes
    first = pipeline._first_batch(p.n_lanes, p.max_batch_reads, 0, align)

    cap_inputs = None
    for bi, (take, L, streams) in enumerate(batches):
        padded = pipeline.canonical_padded(take, first, p.max_batch_reads,
                                           align)
        cap = padded * max(L, 2)

        def fit(words, cap):
            w = np.zeros((cap,), np.uint32)
            w[:words.shape[0]] = words
            return w

        m_words, _ = streams[0]
        d_words, _ = streams[1]
        q_words, _ = streams[2]
        m_w, d_w, q_w = jax.device_put(
            (fit(m_words, mcfg.n_per_read * padded), fit(d_words, cap),
             fit(q_words, cap)))
        i_w = jnp.zeros((0,), jnp.uint32)
        i_states = jnp.zeros((0,), jnp.uint32)
        if bi == len(batches) - 1:
            cap_inputs = (padded, L, state, m_w, cur[0], d_w, cur[1],
                          q_w, cur[2])
            break
        (lengths, codes, qsyms, id_batch, state,
         (m_x, d_x, q_x, i_x, pe_x)) = pipeline._decode_batch(
            dcfg, qcfg, mcfg, icfg, padded, L, state,
            m_w, cur[0], i_w, i_states, d_w, cur[1], q_w, cur[2],
            None, None, n_valid=jnp.int32(take))
        cur = [m_x, d_x, q_x]
        state = pipeline.state_create(dcfg, qcfg, icfg)._replace(
            dna=state.dna, meta=state.meta, qual=state.qual)
    reader.close()

    padded, L, state, m_w, m_st, d_w, d_st, q_w, q_st = cap_inputs
    print(f"batch: padded={padded} L={L}", flush=True)

    # ---- full _decode_batch (no donation: args reused across reps) ----
    @partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
    def full(dcfg, qcfg, mcfg, icfg, R, L, state, m_w, m_st, d_w, d_st,
             q_w, q_st):
        return pipeline._decode_batch.__wrapped__(
            dcfg, qcfg, mcfg, icfg, R, L, state, m_w, m_st,
            jnp.zeros((0,), jnp.uint32), jnp.zeros((0,), jnp.uint32),
            d_w, d_st, q_w, q_st)

    timeit("_decode_batch (full)", full, dcfg, qcfg, mcfg, icfg, padded, L,
           state, m_w, m_st, d_w, d_st, q_w, q_st)

    # ---- meta ----
    @partial(jax.jit, static_argnums=(0, 1))
    def j_meta(mcfg, R, mstate, words, st):
        return meta.meta_decode_batch(mcfg, mstate, R, words, st)

    lengths, lcp, _, _, _ = j_meta(mcfg, padded, state.meta, m_w, m_st)
    lengths = jnp.minimum(lengths, L).astype(jnp.int32)
    timeit("meta_decode_batch", j_meta, mcfg, padded, state.meta, m_w, m_st)

    # ---- dna scan only (no update) vs scan+update ----
    @partial(jax.jit, static_argnums=(0, 2))
    def j_dna_scan(dcfg, dstate, L, lengths, words, st):
        return dna.dna_decode_batch(dcfg, dstate, lengths, words, st, L,
                                    apply_update=False)

    @partial(jax.jit, static_argnums=(0, 2))
    def j_dna_full(dcfg, dstate, L, lengths, words, st):
        return dna.dna_decode_batch(dcfg, dstate, lengths, words, st, L,
                                    apply_update=True)

    timeit("dna scan (no update)", j_dna_scan, dcfg, state.dna, L, lengths,
           d_w, d_st)
    timeit("dna scan + collect_updates", j_dna_full, dcfg, state.dna, L,
           lengths, d_w, d_st)

    # ---- quality ----
    @partial(jax.jit, static_argnums=(0, 2))
    def j_qual(qcfg, qstate, L, lengths, words, st):
        return quality.qual_decode_batch(qcfg, qstate, lengths, words, st, L)

    timeit("qual_decode_batch", j_qual, qcfg, state.qual, L, lengths,
           q_w, q_st)


if __name__ == "__main__":
    main()
