"""Benchmark driver: SE compression + decompression throughput and ratio on
the standard corpus.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
the primary metric is SE compress reads/s; decode throughput and ratio ride
along as extra fields.

Baseline: the reference binary (fqs-1.1, built from /root/reference with
`make -j`) on the identical corpus — 100k reads x 100bp sampled from a 4.6 Mbp
genome — with `e -s -t 1 -om o -qm 8 -gs 5`: 34.8 s => 2,873 reads/s,
3,483,765 bytes => 2.787 bits/base (measured 2026-08-16; -t 16 is slower AND
larger on this 4-core host — see BASELINE.md). Reference decompression of the
same archive (`d -t 1`): 30.6 s => 3,268 reads/s (measured 2026-08-17).
"""
from __future__ import annotations

import json
import os
import sys
import time

BASELINE_READS_PER_S = 2873.0
BASELINE_BITS_PER_BASE = 2.787
BASELINE_DECODE_READS_PER_S = 3268.0
N_READS = 100_000
READ_LEN = 100
CORPUS = "/tmp/fqtz_bench_se.fastq"
ARCHIVE = "/tmp/fqtz_bench.fqst"


def main() -> None:
    from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode
    from fqsqueezer_tpu import pipeline
    from fqsqueezer_tpu.io import fastq
    from fqsqueezer_tpu.utils.corpus import write_fastq_corpus

    if not os.path.exists(CORPUS):
        write_fastq_corpus(CORPUS, N_READS, READ_LEN, 4_600_000, seed=42)

    p = Params()
    p.genome_size = 5
    p.adjust_kmer_sizes()
    p.dna_mode = DnaMode.SE_ORIGINAL
    p.quality_mode = QualityMode.ILLUMINA_8
    p.id_mode = IdMode.NONE
    p.verbosity = 0

    data = fastq.read_fastq(CORPUS)

    # warmup: one full pass triggers every batch-shape compile
    pipeline.compress_file(p, CORPUS, "/tmp/fqtz_bench_warm.fqst", data=data)

    t0 = time.time()
    stats = pipeline.compress_file(p, CORPUS, ARCHIVE, data=data)
    dt = time.time() - t0
    reads_per_s = stats["n_reads"] / dt

    # decode: warm (compile) then timed
    pipeline.decompress_file(Params(), ARCHIVE, "/tmp/fqtz_bench_warm.fastq")
    t0 = time.time()
    dstats = pipeline.decompress_file(Params(), ARCHIVE,
                                      "/tmp/fqtz_bench_out.fastq")
    ddt = time.time() - t0
    d_reads_per_s = dstats["n_reads"] / ddt

    print(json.dumps({
        "metric": "se_compress_reads_per_s",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
        "bits_per_base": round(stats["bits_per_base"], 4),
        "bits_per_base_vs_baseline": round(
            stats["bits_per_base"] / BASELINE_BITS_PER_BASE, 3),
        "wall_s": round(dt, 2),
        "decode_reads_per_s": round(d_reads_per_s, 1),
        "decode_vs_baseline": round(
            d_reads_per_s / BASELINE_DECODE_READS_PER_S, 3),
        "decode_wall_s": round(ddt, 2),
    }))


if __name__ == "__main__":
    main()
