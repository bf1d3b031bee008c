"""FASTQ IO: native C++ scanner vs pure-numpy path equivalence."""
import numpy as np
import pytest

from fqsqueezer_tpu.io import fastq, native
from fqsqueezer_tpu.utils import corpus


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("io") / "s.fastq")
    corpus.write_fastq_corpus(path, 500, 90, 50_000, seed=3)
    return path


def test_native_lib_builds():
    assert native.get_lib() is not None, "g++ toolchain expected in image"


def test_native_matches_numpy_parse(sample):
    data = np.fromfile(sample, np.uint8)
    a = fastq.parse_fastq_bytes(data)
    b = native.parse_fastq_bytes_native(data)
    assert b is not None
    np.testing.assert_array_equal(a.codes, b.codes)
    np.testing.assert_array_equal(a.quals, b.quals)
    np.testing.assert_array_equal(a.lengths, b.lengths)
    assert a.ids == b.ids


def test_native_write_roundtrip(tmp_path, sample):
    d = fastq.read_fastq(sample)
    out_native = str(tmp_path / "n.fastq")
    out_numpy = str(tmp_path / "p.fastq")
    fastq.write_fastq(out_native, d.codes, d.quals, d.lengths, d.ids,
                      use_native=True)
    fastq.write_fastq(out_numpy, d.codes, d.quals, d.lengths, d.ids,
                      use_native=False)
    assert open(out_native, "rb").read() == open(out_numpy, "rb").read()
    assert open(out_native, "rb").read() == open(sample, "rb").read()


def test_crlf_and_missing_trailing_newline(tmp_path):
    body = "@r1\nACGT\n+\nIIII\r\n@r2\nGGCC\n+\nJJJJ"
    path = str(tmp_path / "crlf.fastq")
    open(path, "w").write(body)
    d = fastq.read_fastq(path)
    assert d.n_reads == 2
    assert bytes(d.codes[0, :4]) == bytes([0, 1, 2, 3])
    assert d.lengths.tolist() == [4, 4]


def test_profiler_tool_runs(tmp_path):
    """tools/profile.py is the ctx.log analog — keep it working."""
    from fqsqueezer_tpu.tools.profile import profile_dna

    path = str(tmp_path / "p.fastq")
    corpus.write_fastq_corpus(path, 256, 60, 20_000, seed=4)
    rep = profile_dna(path, gs=1, batch=128)
    assert rep["n_reads"] == 256
    assert rep["bases"] == 256 * 60
    assert 0 < rep["est_bits_per_base"] < 8
    assert sum(d["positions"] for d in rep["levels"].values()) > 0
