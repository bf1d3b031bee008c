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


def test_pe_resume_from_group_snapshot(tmp_path):
    """A PE snapshot must carry the pair table + PE stream model
    (DnaState.pe): resuming from group k must reproduce the tail
    byte-exactly, including anchor choices driven by the pair table."""
    import glob

    from tests.test_pe import make_pe_pair

    f1, f2 = make_pe_pair(tmp_path, n_pairs=400, read_len=64, seed=31,
                          genome_kb=20)
    p = small_params(dna_mode=DnaMode.PE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS,
                     id_mode=IdMode.LOSSLESS)
    arc = str(tmp_path / "pe.fqst")
    snap = str(tmp_path / "snap")
    pipeline.compress_pe(p, f1, f2, arc, group_mem_bytes=64 << 10,
                         snapshot_prefix=snap)
    snaps = sorted(glob.glob(snap + ".g*.npz"))
    assert len(snaps) >= 2, "expected multiple groups"
    state = checkpoint.load_state(checkpoint.snapshot_path(snap, 1))
    assert state.dna.pe is not None, "PE snapshot must include pair state"

    o1, o2 = str(tmp_path / "o1.fastq"), str(tmp_path / "o2.fastq")
    pipeline.decompress_file(Params(), arc, o1, o2)
    a1, a2 = reads_of(o1), reads_of(o2)
    assert reads_of(f1) == a1 and reads_of(f2) == a2

    r1, r2 = str(tmp_path / "r1.fastq"), str(tmp_path / "r2.fastq")
    pipeline.decompress_file(Params(), arc, r1, r2, start_group=1,
                             init_state=state)
    t1, t2 = reads_of(r1), reads_of(r2)
    assert 0 < len(t1) < len(a1)
    assert a1[len(a1) - len(t1):] == t1
    assert a2[len(a2) - len(t2):] == t2


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
