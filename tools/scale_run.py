"""Large-scale single-chip demonstration (the BASELINE.json chr20-class
config): 1M reads x 100bp from a 60 Mbp realistic genome, sorted mode,
-qm 8 -im n, plus the same corpus under the WGS -gs 3100 geometry.
Records wall times + table geometry; round-trips the gs-60 archive.

Usage: python tools/scale_run.py [n_reads] [--gs3100]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode
from fqsqueezer_tpu import pipeline
from fqsqueezer_tpu.utils.corpus import write_fastq_corpus_realistic

CORPUS = "/tmp/fqtz_scale_1m.fastq"
N = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1_000_000


def run(gs, tag):
    p = Params()
    p.genome_size = gs
    p.adjust_kmer_sizes()
    p.dna_mode = DnaMode.SE_SORTED
    p.quality_mode = QualityMode.ILLUMINA_8
    p.id_mode = IdMode.NONE
    p.verbosity = 1
    p.auto_tune_lanes()
    arc = f"/tmp/fqtz_scale_{tag}.fqst"
    print(f"[{tag}] gs={gs} smer={p.smer_len} bmer={p.bmer_len} "
          f"buckets=2^{p.smer_log2_buckets}", flush=True)
    t0 = time.time()
    st = pipeline.compress_file(p, CORPUS, arc)
    t_cold = time.time() - t0
    t0 = time.time()
    st = pipeline.compress_file(p, CORPUS, arc)
    t_warm = time.time() - t0
    print(f"[{tag}] out={st['out_bytes']:,} B {st['bits_per_base']:.4f} b/b "
          f"cold {t_cold:.0f}s warm {t_warm:.0f}s "
          f"({st['n_reads']/t_warm:,.0f} reads/s warm)", flush=True)
    t0 = time.time()
    ds = pipeline.decompress_file(Params(), arc, f"/tmp/fqtz_scale_{tag}.out")
    t_dec = time.time() - t0
    print(f"[{tag}] decode {t_dec:.0f}s ({ds['n_reads']/t_dec:,.0f} reads/s)",
          flush=True)


def main():
    if not os.path.exists(CORPUS):
        print("writing corpus...", flush=True)
        write_fastq_corpus_realistic(CORPUS, N, 100, 60_000_000, seed=42)
    run(60, "gs60")
    if "--gs3100" in sys.argv:
        run(3100, "gs3100")


if __name__ == "__main__":
    main()
