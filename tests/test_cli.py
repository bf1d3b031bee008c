"""CLI surface regression tests — every compress dispatch branch."""
import numpy as np
import pytest

from fqsqueezer_tpu import cli
from fqsqueezer_tpu.params import DnaMode, IdMode, QualityMode
from fqsqueezer_tpu.utils.corpus import write_fastq_corpus


def _small_args():
    # keep jit shapes tiny: n_lanes/max_batch via parse defaults are too big
    # for CI, so tests go through cli.parse_args then shrink
    return ["-gs", "1", "-qm", "o", "-im", "o", "-om", "o", "-v", "1"]


def _shrink(p):
    p.n_lanes = 32
    p.max_batch_reads = 256
    return p


def test_parse_args_flags():
    p = cli.parse_args(["e", "-p", "-om", "s", "-qm", "2", "-qt", "25",
                        "-im", "i", "-t", "8", "-gs", "12", "-dp", "4",
                        "-tp", "2", "-out", "x", "-out2", "y", "a", "b"])
    assert p.dna_mode == DnaMode.PE_SORTED
    assert p.quality_mode == QualityMode.BINARY and p.quality_thr == 25
    assert p.id_mode == IdMode.INSTRUMENT
    assert p.mesh_dp == 4 and p.mesh_tp == 2
    assert p.file_names == ["a", "b"]
    assert (p.prefix_len, p.pmer_len, p.smer_len, p.bmer_len) == (10, 15, 18, 21)


def test_cli_single_file_roundtrip(tmp_path, monkeypatch):
    src = str(tmp_path / "a.fastq")
    write_fastq_corpus(src, 300, 56, 20_000, seed=3)
    arc = str(tmp_path / "a.fqst")
    dst = str(tmp_path / "rt.fastq")

    orig = cli.parse_args
    monkeypatch.setattr(cli, "parse_args", lambda a: _shrink(orig(a)))
    assert cli.main(["e", "-s", *_small_args(), "-out", arc, src]) == 0
    assert cli.main(["d", "-out", dst, arc]) == 0
    assert open(src, "rb").read() == open(dst, "rb").read()


def test_cli_file_list_concatenates(tmp_path, monkeypatch):
    a = str(tmp_path / "a.fastq")
    b = str(tmp_path / "b.fastq")
    write_fastq_corpus(a, 150, 48, 10_000, seed=4)
    write_fastq_corpus(b, 100, 48, 10_000, seed=5)
    lst = tmp_path / "list.txt"
    lst.write_text(f"{a}\n{b}\n")
    arc = str(tmp_path / "m.fqst")
    dst = str(tmp_path / "rt.fastq")

    orig = cli.parse_args
    monkeypatch.setattr(cli, "parse_args", lambda x: _shrink(orig(x)))
    assert cli.main(["e", "-s", *_small_args(), "-out", arc, f"@{lst}"]) == 0
    assert cli.main(["d", "-out", dst, arc]) == 0
    cat = open(a, "rb").read() + open(b, "rb").read()
    assert cat == open(dst, "rb").read()
