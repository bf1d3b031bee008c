"""Checkpoint/resume: group snapshots enable mid-archive decompression."""
import numpy as np

from fqsqueezer_tpu import checkpoint, pipeline
from fqsqueezer_tpu.io import fastq
from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode
from tests.test_pipeline import make_fastq, reads_of, small_params


def test_resume_from_group_snapshot(tmp_path):
    src = str(tmp_path / "in.fastq")
    make_fastq(src, 600, 72, seed=21)
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS,
                     id_mode=IdMode.LOSSLESS)
    arc = str(tmp_path / "a.fqst")
    snap = str(tmp_path / "snap")

    # tiny group budget so the archive has several groups
    stats = pipeline.compress_file(p, src, arc, group_mem_bytes=64 << 10,
                                   snapshot_prefix=snap)
    import glob

    snaps = sorted(glob.glob(snap + ".g*.npz"))
    assert len(snaps) >= 2, "expected multiple groups"

    # full decode
    full = str(tmp_path / "full.fastq")
    pipeline.decompress_file(Params(), arc, full)
    all_reads = reads_of(full)
    assert reads_of(src) == all_reads

    # resume: decode only groups >= 1 starting from snapshot g00001
    state = checkpoint.load_state(checkpoint.snapshot_path(snap, 1))
    part = str(tmp_path / "part.fastq")
    pipeline.decompress_file(Params(), arc, part, start_group=1,
                             init_state=state)
    tail = reads_of(part)
    assert len(tail) < len(all_reads)
    assert all_reads[len(all_reads) - len(tail):] == tail


def test_corrupt_archive_detected(tmp_path):
    """Payload crc32 catches bit flips in the entropy-coded payload."""
    import pytest

    src = str(tmp_path / "in.fastq")
    make_fastq(src, 300, 64, seed=9)
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.NONE)
    arc = str(tmp_path / "a.fqst")
    pipeline.compress_file(p, src, arc)
    blob = bytearray(open(arc, "rb").read())
    blob[len(blob) // 2] ^= 0xFF  # flip a payload byte
    open(arc, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="checksum mismatch"):
        pipeline.decompress_file(Params(), arc, str(tmp_path / "out.fastq"))
