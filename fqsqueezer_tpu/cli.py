"""Reference-compatible command line interface.

Flag surface follows /root/reference/fqs/fqsqueezer.cpp:30-232:
  fqsqueezer_tpu e|d [options] <in> [<in2>]
  -s / -p            single-end / paired-end
  -t <n>             accepted for reference-CLI parity; ignored (TPU
                     geometry is -lanes/-batch)
  -gs <mbp>          genome size -> k-mer length auto-tuning
  -om o|s            original / sorted read order
  -qm o|8|4|2|n      quality mode
  -qt <n>            binary-quality threshold
  -im o|i|n          id mode
  -out / -out2       output path(s)
  -tmp               temp path prefix
  -v <n>             verbosity
  @list_file         read input names from a file (one per line)
"""
from __future__ import annotations

import sys
import time

from .params import Params, WorkMode, DnaMode, IdMode, QualityMode

_USAGE = """fqsqueezer_tpu <mode> [options] <in.fastq> [<in2.fastq>]
mode: e (compress) | d (decompress)
options:
  -s | -p        single-end (default) | paired-end
  -t <n>         accepted for parity; ignored
  -gs <mbp>      genome size estimate in Mbp (default 3100)
  -om <o|s>      read order: original | sorted (default s)
  -qm <o|8|4|2|n> quality: lossless|illumina8|illumina4|binary|none (default 8)
  -qt <n>        quality threshold for -qm 2 (default 20)
  -im <o|i|n>    ids: lossless|instrument|none (default i)
  -out <path>    output path
  -out2 <path>   second output path (PE decompress)
  -dp <n> -tp <n>  multi-chip mesh: data-parallel / table shards (SE only)
  -tmp <path>    temporary file prefix
  -v <n>         verbosity 0-2
"""


def parse_args(argv) -> Params:
    if len(argv) < 2:
        raise SystemExit(_USAGE)
    p = Params()
    mode = argv[0]
    if mode == "e":
        p.work_mode = WorkMode.COMPRESS
    elif mode == "d":
        p.work_mode = WorkMode.DECOMPRESS
    else:
        raise SystemExit(_USAGE)

    i = 1
    pe = False
    order_sorted = True
    files = []
    while i < len(argv):
        a = argv[i]
        if a == "-s":
            pe = False
        elif a == "-p":
            pe = True
        elif a == "-t":
            i += 1
            p.no_threads = max(1, min(64, int(argv[i])))
        elif a == "-gs":
            i += 1
            p.genome_size = int(argv[i])
        elif a == "-om":
            i += 1
            order_sorted = argv[i] == "s"
        elif a == "-qm":
            i += 1
            qm = {"o": QualityMode.LOSSLESS, "8": QualityMode.ILLUMINA_8,
                  "4": QualityMode.ILLUMINA_4, "2": QualityMode.BINARY,
                  "n": QualityMode.NONE}.get(argv[i])
            if qm is None:
                raise SystemExit(f"invalid -qm value '{argv[i]}' (use o|8|4|2|n)")
            p.quality_mode = qm
        elif a == "-qt":
            i += 1
            p.quality_thr = int(argv[i])
        elif a == "-im":
            i += 1
            im = {"o": IdMode.LOSSLESS, "i": IdMode.INSTRUMENT,
                  "n": IdMode.NONE}.get(argv[i])
            if im is None:
                raise SystemExit(f"invalid -im value '{argv[i]}' (use o|i|n)")
            p.id_mode = im
        elif a == "-dp":
            i += 1
            p.mesh_dp = int(argv[i])
        elif a == "-tp":
            i += 1
            p.mesh_tp = int(argv[i])
        elif a == "-out":
            i += 1
            p.out_path = argv[i]
        elif a == "-out2":
            i += 1
            p.out_path2 = argv[i]
        elif a == "-tmp":
            i += 1
            p.tmp_path = argv[i]
        elif a == "-v":
            i += 1
            p.verbosity = int(argv[i])
        elif a.startswith("@"):
            with open(a[1:]) as f:
                files.extend(ln.strip() for ln in f if ln.strip())
        else:
            files.append(a)
        i += 1

    if pe:
        p.dna_mode = DnaMode.PE_SORTED if order_sorted else DnaMode.PE_ORIGINAL
    else:
        p.dna_mode = DnaMode.SE_SORTED if order_sorted else DnaMode.SE_ORIGINAL
    p.file_names = files
    if p.work_mode == WorkMode.COMPRESS:
        p.adjust_kmer_sizes()
        p.auto_tune_lanes()
    return p


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    p = parse_args(argv)
    from . import pipeline

    t0 = time.time()
    if p.work_mode == WorkMode.COMPRESS:
        if not p.file_names:
            raise SystemExit("no input files")
        if p.dna_mode in (DnaMode.PE_ORIGINAL, DnaMode.PE_SORTED):
            if len(p.file_names) < 2:
                raise SystemExit("paired-end mode needs two input files")
            if p.mesh_dp > 1 or p.mesh_tp > 1:
                from .parallel import mesh_pipeline

                stats = mesh_pipeline.compress_pe_mesh(
                    p, p.file_names[0], p.file_names[1], p.out_path,
                    dp=p.mesh_dp, tp=p.mesh_tp)
                stats.setdefault("ratio", stats["in_bytes"] / max(
                    1, stats["out_bytes"]))
            else:
                import os as _os

                total = sum(_os.path.getsize(f) for f in p.file_names[:2]
                            if _os.path.exists(f))
                # WGS-scale PE inputs block-stream through the paired
                # chunk reader (original order; sorted needs the file)
                stream = (256 << 20 if total > (256 << 20)
                          and p.dna_mode == DnaMode.PE_ORIGINAL else 0)
                stats = pipeline.compress_pe(
                    p, p.file_names[0], p.file_names[1], p.out_path,
                    stream_chunk_bytes=stream)
        elif p.mesh_dp > 1 or p.mesh_tp > 1:
            from .parallel import mesh_pipeline

            stats = mesh_pipeline.compress_file_mesh(
                p, p.file_names[0], p.out_path, dp=p.mesh_dp, tp=p.mesh_tp)
            stats.setdefault("ratio", stats["in_bytes"] / max(
                1, stats["out_bytes"]))
        else:
            src = (p.file_names if len(p.file_names) > 1
                   else p.file_names[0])
            # WGS-scale inputs block-stream automatically when eligible:
            # host RSS stays O(chunk). Ids stream too (template prescan);
            # only sorted+ids needs the whole file (bin sort drops ids).
            import os as _os

            total = sum(_os.path.getsize(f) for f in p.file_names
                        if _os.path.exists(f))
            stream = (256 << 20 if total > (256 << 20)
                      and (p.dna_mode == DnaMode.SE_ORIGINAL
                           or (p.dna_mode == DnaMode.SE_SORTED
                               and p.id_mode == IdMode.NONE)) else 0)
            stats = pipeline.compress_file(p, src, p.out_path,
                                           stream_chunk_bytes=stream)
        if p.verbosity >= 1:
            print(f"reads: {stats['n_reads']}  in: {stats['in_bytes']}  "
                  f"out: {stats['out_bytes']}  ratio: {stats['ratio']:.3f}  "
                  f"bits/base: {stats['bits_per_base']:.4f}")
    else:
        if not p.file_names:
            raise SystemExit("no input archive")
        try:
            from .params import Params as _P
            from . import archive as _arc

            rd = _arc.ArchiveReader(p.file_names[0])
            hdr = _P.load_params(rd.header_blob, base=p)
            rd.close()
            if hdr.mesh_dp > 1 or hdr.mesh_tp > 1:
                from .parallel import mesh_pipeline

                stats = mesh_pipeline.decompress_file_mesh(
                    p, p.file_names[0], p.out_path, p.out_path2)
            else:
                stats = pipeline.decompress_file(
                    p, p.file_names[0], p.out_path, p.out_path2)
        except ValueError as e:
            raise SystemExit(f"error: {e}")
        if p.verbosity >= 1:
            print(f"reads: {stats['n_reads']}")
    if p.verbosity >= 1:
        print(f"time: {time.time() - t0:.2f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
