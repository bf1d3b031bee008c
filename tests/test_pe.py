"""Paired-end mode: interleaved pair coding, PE split round-trip."""
import numpy as np
import pytest

from fqsqueezer_tpu import pipeline
from fqsqueezer_tpu.io import fastq
from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode


def make_pe_pair(tmp_path, n_pairs=400, read_len=70, seed=5, genome_kb=30):
    """Mates drawn from opposite ends of fragments of a shared genome."""
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=genome_kb * 1000)
    f1, f2 = [], []
    for i in range(n_pairs):
        frag = rng.integers(0, len(genome) - 300)
        r1 = genome[frag:frag + read_len]
        r2e = genome[frag + 200:frag + 200 + read_len]
        r2 = (3 - r2e)[::-1]  # reverse strand mate
        s1 = "".join("ACGT"[b] for b in r1)
        s2 = "".join("ACGT"[b] for b in r2)
        q = "I" * read_len
        f1 += [f"@PAIR.{i + 1} {i + 1}/1", s1, "+", q]
        f2 += [f"@PAIR.{i + 1} {i + 1}/2", s2, "+", q]
    p1 = str(tmp_path / "r1.fastq")
    p2 = str(tmp_path / "r2.fastq")
    open(p1, "w").write("\n".join(f1) + "\n")
    open(p2, "w").write("\n".join(f2) + "\n")
    return p1, p2


def reads_of(path):
    d = fastq.read_fastq(path)
    return [(bytes(d.codes[i, :d.lengths[i]]),
             bytes(d.quals[i, :d.lengths[i]]), d.ids[i])
            for i in range(d.n_reads)]


def pe_params(**kw):
    p = Params()
    p.genome_size = 1
    p.adjust_kmer_sizes()
    p.n_lanes = 64
    p.max_batch_reads = 512
    p.quality_mode = QualityMode.LOSSLESS
    p.id_mode = IdMode.LOSSLESS
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def test_pe_original_roundtrip_byte_exact(tmp_path):
    p1, p2 = make_pe_pair(tmp_path)
    p = pe_params(dna_mode=DnaMode.PE_ORIGINAL)
    arc = str(tmp_path / "pe.fqst")
    o1 = str(tmp_path / "o1.fastq")
    o2 = str(tmp_path / "o2.fastq")
    stats = pipeline.compress_pe(p, p1, p2, arc)
    assert stats["n_reads"] == 800
    pipeline.decompress_file(Params(), arc, o1, o2)
    assert open(p1, "rb").read() == open(o1, "rb").read()
    assert open(p2, "rb").read() == open(o2, "rb").read()


def test_pe_sorted_preserves_pairing(tmp_path):
    p1, p2 = make_pe_pair(tmp_path, n_pairs=300)
    p = pe_params(dna_mode=DnaMode.PE_SORTED)
    arc = str(tmp_path / "pes.fqst")
    o1 = str(tmp_path / "s1.fastq")
    o2 = str(tmp_path / "s2.fastq")
    pipeline.compress_pe(p, p1, p2, arc)
    pipeline.decompress_file(Params(), arc, o1, o2)
    in_pairs = sorted(zip(reads_of(p1), reads_of(p2)))
    out_pairs = sorted(zip(reads_of(o1), reads_of(o2)))
    assert in_pairs == out_pairs


def test_pe_mismatched_counts_raises(tmp_path):
    p1, p2 = make_pe_pair(tmp_path, n_pairs=10)
    with open(p2, "a") as f:
        f.write("@extra\nACGT\n+\nIIII\n")
    p = pe_params(dna_mode=DnaMode.PE_ORIGINAL)
    with pytest.raises(ValueError, match="mate counts differ"):
        pipeline.compress_pe(p, p1, p2, str(tmp_path / "x.fqst"))


def test_pe_anchor_machinery_reduces_dna_stream(tmp_path):
    """With recurring fragments, the minimizer pair table must find anchors
    and shrink read2 coding (the anchor span is never entropy-coded);
    round-trip stays byte-exact. Compares pe_log2_buckets on vs off."""
    # high duplication: few fragments, many repeats -> pair table hits
    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, size=4000)
    read_len = 70
    f1, f2 = [], []
    frags = [rng.integers(0, len(genome) - 300) for _ in range(40)]
    for i in range(600):
        frag = frags[rng.integers(0, len(frags))]
        r1 = genome[frag:frag + read_len]
        r2e = genome[frag + 200:frag + 200 + read_len]
        r2 = (3 - r2e)[::-1]
        s1 = "".join("ACGT"[b] for b in r1)
        s2 = "".join("ACGT"[b] for b in r2)
        q = "I" * read_len
        f1 += [f"@D.{i}", s1, "+", q]
        f2 += [f"@D.{i}", s2, "+", q]
    p1 = str(tmp_path / "d1.fastq")
    p2 = str(tmp_path / "d2.fastq")
    open(p1, "w").write("\n".join(f1) + "\n")
    open(p2, "w").write("\n".join(f2) + "\n")

    sizes = {}
    for peb in (0, 14):
        p = pe_params(dna_mode=DnaMode.PE_ORIGINAL, pe_log2_buckets=peb,
                      quality_mode=QualityMode.NONE, id_mode=IdMode.NONE)
        arc = str(tmp_path / f"pe{peb}.fqst")
        stats = pipeline.compress_pe(p, p1, p2, arc)
        sizes[peb] = stats["stream_bytes"]["dna"] + stats["stream_bytes"]["pe"]
        o1 = str(tmp_path / f"a{peb}_1.fastq")
        o2 = str(tmp_path / f"a{peb}_2.fastq")
        pipeline.decompress_file(Params(), arc, o1, o2)
        d1 = fastq.read_fastq(p1)
        g1 = fastq.read_fastq(o1)
        assert [bytes(d1.codes[i, :d1.lengths[i]])
                for i in range(d1.n_reads)] == \
               [bytes(g1.codes[i, :g1.lengths[i]])
                for i in range(g1.n_reads)]
        d2r = fastq.read_fastq(p2)
        g2 = fastq.read_fastq(o2)
        assert [bytes(d2r.codes[i, :d2r.lengths[i]])
                for i in range(d2r.n_reads)] == \
               [bytes(g2.codes[i, :g2.lengths[i]])
                for i in range(g2.n_reads)]
    # the anchored 3-row recoding (cold-prefix elimination + seeded
    # context) must beat un-anchored PE net of the pe stream's own cost
    assert sizes[14] < 0.95 * sizes[0], sizes
