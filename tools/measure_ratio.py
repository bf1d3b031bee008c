"""Ratio measurement variants on the standard corpus (one TPU process).

Usage: python tools/measure_ratio.py [variant ...]
Variants: name=batch:lanes:localcells, e.g. b4096=4096:1024:22
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode
from fqsqueezer_tpu import pipeline
from fqsqueezer_tpu.io import fastq
from fqsqueezer_tpu.utils.corpus import write_fastq_corpus

CORPUS = "/tmp/fqtz_bench_se.fastq"


def main():
    if not os.path.exists(CORPUS):
        write_fastq_corpus(CORPUS, 100_000, 100, 4_600_000, seed=42)
    data = fastq.read_fastq(CORPUS)

    variants = sys.argv[1:] or ["b4k=4096:1024:22:8", "b32k=32768:1024:22:8"]
    for v in variants:
        name, spec = v.split("=")
        fields = [int(x) for x in spec.split(":")]
        batch, lanes, cells = fields[:3]
        inc = fields[3] if len(fields) > 3 else 8
        p = Params()
        p.genome_size = 5
        p.adjust_kmer_sizes()
        p.dna_mode = DnaMode.SE_ORIGINAL
        p.quality_mode = QualityMode.ILLUMINA_8
        p.id_mode = IdMode.NONE
        p.verbosity = 0
        p.max_batch_reads = batch
        p.n_lanes = lanes
        p.local_log2_cells = cells
        p.local_model_inc = inc
        t0 = time.time()
        stats = pipeline.compress_file(p, CORPUS, f"/tmp/ratio_{name}.fqst",
                                       data=data)
        dt = time.time() - t0
        print(f"[{name}] out={stats['out_bytes']:,} "
              f"dna={stats['stream_bytes']['dna']:,} "
              f"qual={stats['stream_bytes']['qual']:,} "
              f"meta={stats['stream_bytes']['meta']:,} "
              f"states={stats['stream_bytes']['states']:,} "
              f"bpb={stats['bits_per_base']:.4f} wall={dt:.1f}s "
              f"reads/s={stats['n_reads']/dt:.0f}", flush=True)


if __name__ == "__main__":
    main()
