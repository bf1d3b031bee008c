"""Benchmark driver: compression + decompression throughput and ratio on
the standard corpora (SE original, SE sorted, PE).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
the primary metric is SE compress reads/s; decode throughput, ratio, and the
sorted/PE rows ride along as extra fields.

Baselines (reference binary fqs-1.1 built from /root/reference with `make -j`,
measured on this host — see BASELINE.md):
  - SE original (`e -s -t 1 -om o -qm 8 -gs 5`, 100k x 100bp seed-42 corpus):
    34.8 s => 2,873 reads/s; 3,483,765 B => 2.787 bits/base. Decompress
    (`d -t 1`): 30.6 s => 3,268 reads/s.
  - SE sorted (`-om s -qm 8 -im n`), same corpus: 3,305,026 B (2026-08-17).
  - PE (`e -p -om o -qm n -im n`), 50k-pair seed-42 corpus: 1,386,065 B.
"""
from __future__ import annotations

import json
import os
import sys
import time

BASELINE_READS_PER_S = 2873.0
BASELINE_BITS_PER_BASE = 2.787
BASELINE_DECODE_READS_PER_S = 3268.0
REF_SORTED_BYTES = 3_305_026     # reference `-om s -qm 8 -im n` on the corpus
REF_PE_BYTES = 1_386_065         # reference `e -p -om o -qm n -im n`
REF_IDS_BYTES = 1_417_286        # reference `-om o -qm n -im o` (se_ids)
REF_REAL_BYTES = 3_382_084       # reference `-om o -qm 8 -im n`, realistic corpus
REAL_CORPUS = "/tmp/fqtz_bench_real.fastq"
N_READS = 100_000
READ_LEN = 100
CORPUS = "/tmp/fqtz_bench_se.fastq"
PE1, PE2 = "/tmp/fqtz_bench_pe_1.fastq", "/tmp/fqtz_bench_pe_2.fastq"
ARCHIVE = "/tmp/fqtz_bench.fqst"


def _bench_roundtrip(p, compress, decompress, tag):
    """warm + timed compress, warm + timed decompress; returns a row dict."""
    arc = f"/tmp/fqtz_bench_{tag}.fqst"
    compress(p, arc + ".warm")
    t0 = time.time()
    stats = compress(p, arc)
    dt = time.time() - t0
    decompress(arc, f"/tmp/fqtz_bench_{tag}_warm")
    t0 = time.time()
    dstats = decompress(arc, f"/tmp/fqtz_bench_{tag}_out")
    ddt = time.time() - t0
    return stats, dstats, dt, ddt


def main() -> None:
    from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode
    from fqsqueezer_tpu import pipeline
    from fqsqueezer_tpu.io import fastq
    from fqsqueezer_tpu.utils.corpus import write_fastq_corpus, write_pe_corpus

    if not os.path.exists(CORPUS):
        write_fastq_corpus(CORPUS, N_READS, READ_LEN, 4_600_000, seed=42)

    def base_params(om, qm, im):
        p = Params()
        p.genome_size = 5
        p.adjust_kmer_sizes()
        p.dna_mode = om
        p.quality_mode = qm
        p.id_mode = im
        p.verbosity = 0
        p.auto_tune_lanes()   # product default (mirrors the CLI)
        return p

    # ---- primary row: SE original -------------------------------------
    p = base_params(DnaMode.SE_ORIGINAL, QualityMode.ILLUMINA_8, IdMode.NONE)
    data = fastq.read_fastq(CORPUS)

    pipeline.compress_file(p, CORPUS, "/tmp/fqtz_bench_warm.fqst", data=data)
    t0 = time.time()
    stats = pipeline.compress_file(p, CORPUS, ARCHIVE, data=data)
    dt = time.time() - t0
    reads_per_s = stats["n_reads"] / dt

    pipeline.decompress_file(Params(), ARCHIVE, "/tmp/fqtz_bench_warm.fastq")
    t0 = time.time()
    dstats = pipeline.decompress_file(Params(), ARCHIVE,
                                      "/tmp/fqtz_bench_out.fastq")
    ddt = time.time() - t0
    d_reads_per_s = dstats["n_reads"] / ddt

    out = {
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
    }

    # ---- extra rows: SE sorted + PE (VERDICT r2 #9). Failures here must
    # never lose the primary metric line. --------------------------------
    try:
        ps = base_params(DnaMode.SE_SORTED, QualityMode.ILLUMINA_8,
                         IdMode.NONE)
        stats_s, dstats_s, dts, ddts = _bench_roundtrip(
            ps,
            lambda pp, arc: pipeline.compress_file(pp, CORPUS, arc,
                                                   data=data),
            lambda arc, o: pipeline.decompress_file(Params(), arc,
                                                    o + ".fastq"),
            "sorted")
        out["sorted"] = {
            "compress_reads_per_s": round(stats_s["n_reads"] / dts, 1),
            "decode_reads_per_s": round(dstats_s["n_reads"] / ddts, 1),
            "bits_per_base": round(stats_s["bits_per_base"], 4),
            "bytes_vs_ref": round(stats_s["out_bytes"] / REF_SORTED_BYTES, 4),
        }
    except Exception as e:  # pragma: no cover - diagnostic ride-along
        out["sorted"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    try:
        if not os.path.exists(PE1):
            write_pe_corpus(PE1, PE2, 50_000, READ_LEN, 4_600_000, seed=42)
        pp = base_params(DnaMode.PE_ORIGINAL, QualityMode.NONE, IdMode.NONE)
        stats_p, dstats_p, dtp, ddtp = _bench_roundtrip(
            pp,
            lambda q, arc: pipeline.compress_pe(q, PE1, PE2, arc),
            lambda arc, o: pipeline.decompress_file(Params(), arc,
                                                    o + "_1.fastq",
                                                    o + "_2.fastq"),
            "pe")
        out["pe"] = {
            "compress_reads_per_s": round(stats_p["n_reads"] / dtp, 1),
            "decode_reads_per_s": round(dstats_p["n_reads"] / ddtp, 1),
            "bits_per_base": round(stats_p["bits_per_base"], 4),
            "bytes_vs_ref": round(stats_p["out_bytes"] / REF_PE_BYTES, 4),
        }
    except Exception as e:  # pragma: no cover - diagnostic ride-along
        out["pe"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    # ---- ratio-only ride-alongs: se_ids + se_real (VERDICT r3 #5) — the
    # configs where the DNA stream has no quality/id stream to hide behind.
    try:
        pi = base_params(DnaMode.SE_ORIGINAL, QualityMode.NONE,
                         IdMode.LOSSLESS)
        stats_i = pipeline.compress_file(pi, CORPUS, "/tmp/fqtz_bench_ids.fqst",
                                         data=data)
        out["se_ids"] = {
            "bits_per_base": round(stats_i["bits_per_base"], 4),
            "bytes_vs_ref": round(stats_i["out_bytes"] / REF_IDS_BYTES, 4),
        }
    except Exception as e:  # pragma: no cover - diagnostic ride-along
        out["se_ids"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    try:
        from fqsqueezer_tpu.utils.corpus import write_fastq_corpus_realistic

        if not os.path.exists(REAL_CORPUS):
            write_fastq_corpus_realistic(REAL_CORPUS, N_READS, READ_LEN,
                                         4_600_000, seed=42)
        pr = base_params(DnaMode.SE_ORIGINAL, QualityMode.ILLUMINA_8,
                         IdMode.NONE)
        stats_r = pipeline.compress_file(pr, REAL_CORPUS,
                                         "/tmp/fqtz_bench_real.fqst")
        out["se_real"] = {
            "bits_per_base": round(stats_r["bits_per_base"], 4),
            "bytes_vs_ref": round(stats_r["out_bytes"] / REF_REAL_BYTES, 4),
        }
    except Exception as e:  # pragma: no cover - diagnostic ride-along
        out["se_real"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    # ride-along failures must never lose the primary line, but they must
    # also never pass silently (a broken PE path once hid behind this)
    for key in ("sorted", "pe", "se_ids", "se_real"):
        if "error" in out.get(key, {}):
            print(f"RIDE-ALONG FAILURE [{key}]: {out[key]['error']}",
                  file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
