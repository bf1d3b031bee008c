"""Ratio/speed sweep of the throughput knobs on the standard corpus.

Each variant compresses the 100k-read corpus twice (cold = compile, warm =
timed) in ONE process and reports total/DNA bytes + reads/s, so the
ratio cost of each event-count cut is measured, not guessed:
  base          current defaults (repair 3, claim rounds 2, local RC on)
  claim1        dna_claim_rounds=1
  norc          dna_local_rc=0
  repair2/1     dna_repair_iters=2/1
  fast          claim1 + norc + repair2 combined

Usage: python tools/sweep_knobs.py [variant ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode
from fqsqueezer_tpu import pipeline
from fqsqueezer_tpu.io import fastq
from fqsqueezer_tpu.utils.corpus import write_fastq_corpus

CORPUS = "/tmp/fqtz_bench_se.fastq"

VARIANTS = {
    "base": {},
    "claim1": {"dna_claim_rounds": 1},
    "norc": {"dna_local_rc": 0},
    "repair2": {"dna_repair_iters": 2},
    "repair1": {"dna_repair_iters": 1},
    "fast": {"dna_claim_rounds": 1, "dna_local_rc": 0,
             "dna_repair_iters": 2},
    # round-3 fused update protocols
    "claim0": {"dna_claim_rounds": 0},
    "lite": {"dna_local_lite": 1},
    "fast3": {"dna_claim_rounds": 0, "dna_local_lite": 1},
    "fast3r2": {"dna_claim_rounds": 0, "dna_local_lite": 1,
                "dna_repair_iters": 2},
    # batch geometry (sync interval / lane count)
    "batch8k": {"max_batch_reads": 8192},
    "lanes2k": {"n_lanes": 2048},
    "lanes2k8k": {"n_lanes": 2048, "max_batch_reads": 8192},
    "repair1f": {"dna_repair_iters": 1},
}


def run(name: str, overrides: dict):
    p = Params()
    p.genome_size = 5
    p.adjust_kmer_sizes()
    p.dna_mode = DnaMode.SE_ORIGINAL
    p.quality_mode = QualityMode.ILLUMINA_8
    p.id_mode = IdMode.NONE
    p.verbosity = 0
    for k, v in overrides.items():
        setattr(p, k, v)
    data = fastq.read_fastq(CORPUS)
    out = f"/tmp/fqtz_sweep_{name}.fqst"
    pipeline.compress_file(p, CORPUS, out, data=data)        # compile pass
    t0 = time.time()
    stats = pipeline.compress_file(p, CORPUS, out, data=data)
    dt = time.time() - t0
    print(json.dumps({
        "variant": name,
        "out_bytes": stats["out_bytes"],
        "dna": stats["stream_bytes"]["dna"],
        "qual": stats["stream_bytes"]["qual"],
        "reads_per_s": round(stats["n_reads"] / dt, 1),
        "wall_s": round(dt, 2),
    }), flush=True)


def main():
    if not os.path.exists(CORPUS):
        write_fastq_corpus(CORPUS, 100_000, 100, 4_600_000, seed=42)
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        run(name, VARIANTS[name])


if __name__ == "__main__":
    main()
