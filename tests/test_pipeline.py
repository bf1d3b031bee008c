"""End-to-end file round-trip tests (SE) over the mode matrix."""
import numpy as np
import pytest

from fqsqueezer_tpu import pipeline
from fqsqueezer_tpu.io import fastq
from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode


def make_fastq(path, n_reads, read_len, seed=0, genome_kb=20):
    """Synthetic reads sampled from a small genome (so k-mer stats help)."""
    rng = np.random.default_rng(seed)
    genome = rng.integers(0, 4, size=genome_kb * 1000)
    lines = []
    for i in range(n_reads):
        hdr = f"@SRR0.{i + 1} {i + 1} length={read_len}"
        start = rng.integers(0, len(genome) - read_len)
        seq = genome[start:start + read_len].copy()
        # sprinkle sequencing errors + occasional N
        nerr = rng.poisson(0.5)
        for _ in range(nerr):
            seq[rng.integers(0, read_len)] = rng.integers(0, 4)
        if rng.random() < 0.05:
            seq[rng.integers(0, read_len)] = 4
        s = "".join("ACGTN"[b] for b in seq)
        q = "".join(chr(33 + int(c)) for c in
                    np.clip(rng.normal(35, 4, read_len), 0, 70).astype(int))
        lines += [hdr, s, "+", q]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def reads_of(path):
    d = fastq.read_fastq(path)
    out = []
    for i in range(d.n_reads):
        n = d.lengths[i]
        out.append((bytes(d.codes[i, :n]), bytes(d.quals[i, :n])))
    return out


def small_params(**kw):
    p = Params()
    p.genome_size = 1  # small tables for test speed
    p.adjust_kmer_sizes()
    p.n_lanes = 64
    p.max_batch_reads = 512
    p.local_log2_cells = 16  # small in-batch local tables for test speed
    p.id_mode = IdMode.NONE
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def roundtrip(tmp_path, p, n_reads=600, read_len=72, seed=3):
    src = str(tmp_path / "in.fastq")
    arc = str(tmp_path / "out.fqst")
    dst = str(tmp_path / "roundtrip.fastq")
    make_fastq(src, n_reads, read_len, seed=seed)
    stats = pipeline.compress_file(p, src, arc)
    assert stats["n_reads"] == n_reads
    pipeline.decompress_file(Params(), arc, dst)
    return src, dst, stats


def test_se_original_lossless_quality(tmp_path):
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS)
    src, dst, stats = roundtrip(tmp_path, p)
    rin, rout = reads_of(src), reads_of(dst)
    assert rin == rout
    assert stats["out_bytes"] < stats["in_bytes"]


def test_se_sorted_reorders_but_preserves_set(tmp_path):
    p = small_params(dna_mode=DnaMode.SE_SORTED,
                     quality_mode=QualityMode.LOSSLESS)
    src, dst, _ = roundtrip(tmp_path, p)
    rin, rout = reads_of(src), reads_of(dst)
    assert sorted(rin) == sorted(rout)


@pytest.mark.parametrize("qm", [QualityMode.ILLUMINA_8, QualityMode.ILLUMINA_4,
                                QualityMode.BINARY, QualityMode.NONE])
def test_se_quality_modes(tmp_path, qm):
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL, quality_mode=qm)
    src, dst, _ = roundtrip(tmp_path, p, n_reads=300)
    rin, rout = reads_of(src), reads_of(dst)
    # sequences always exact
    assert [r[0] for r in rin] == [r[0] for r in rout]
    if qm == QualityMode.NONE:
        from fqsqueezer_tpu.streams.quality import qual_maps
        assert all(set(q) == {p.quality_thr} for _, q in rout)
    else:
        # quantization is idempotent: fwd(rev(fwd(q))) == fwd(q)
        from fqsqueezer_tpu.streams.quality import qual_maps
        fwd, rev = qual_maps(qm.value, p.quality_thr)
        for (_, qi), (_, qo) in zip(rin, rout):
            np.testing.assert_array_equal(
                fwd[np.frombuffer(qi, np.uint8)],
                fwd[np.frombuffer(qo, np.uint8)])
            np.testing.assert_array_equal(
                rev[fwd[np.frombuffer(qi, np.uint8)]],
                np.frombuffer(qo, np.uint8))


def test_varied_read_lengths(tmp_path):
    # ragged lengths exercise masked rANS no-ops and meta coding
    src = str(tmp_path / "in.fastq")
    rng = np.random.default_rng(7)
    lines = []
    for i in range(257):
        n = int(rng.integers(30, 120))
        s = "".join("ACGT"[b] for b in rng.integers(0, 4, n))
        lines += [f"@r{i}", s, "+", "I" * n]
    with open(src, "w") as f:
        f.write("\n".join(lines) + "\n")
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS)
    arc = str(tmp_path / "a.fqst")
    dst = str(tmp_path / "rt.fastq")
    pipeline.compress_file(p, src, arc)
    pipeline.decompress_file(Params(), arc, dst)
    assert reads_of(src) == reads_of(dst)


def test_id_lossless_byte_exact_file(tmp_path):
    """om=o + qm=o + im=o must reproduce the input file byte-for-byte."""
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS,
                     id_mode=IdMode.LOSSLESS)
    src, dst, _ = roundtrip(tmp_path, p, n_reads=400)
    assert open(src, "rb").read() == open(dst, "rb").read()


def test_id_instrument_mode(tmp_path):
    """Instrument mode keeps the id prefix up to the first '.', ' ' or ':'."""
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.NONE,
                     id_mode=IdMode.INSTRUMENT)
    src, dst, _ = roundtrip(tmp_path, p, n_reads=300)
    din = fastq.read_fastq(src)
    dout = fastq.read_fastq(dst)
    from fqsqueezer_tpu.streams.ids import instrument_prefix
    assert dout.ids == instrument_prefix(din.ids)


def test_compression_beats_raw_on_redundant_data(tmp_path):
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.NONE)
    src, dst, stats = roundtrip(tmp_path, p, n_reads=2000, read_len=100,
                                seed=11)
    # DNA from a 20kb genome, 2000x100bp = 10x coverage: k-mer stats must
    # push well below 2 bits/base
    assert stats["bits_per_base"] < 1.6


def test_wide_kmer_geometry(tmp_path):
    """gs=300 picks smer/bmer > 16 bases: the (lo, hi) uint32-pair key path
    and >32-bit window masks must round-trip."""
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.NONE)
    p.genome_size = 300        # -> pmer 17 (siv capped 13), smer 20, bmer 24
    p.adjust_kmer_sizes()
    p.smer_log2_buckets = 14   # keep test tables small
    p.bmer_log2_buckets = 14
    src, dst, _ = roundtrip(tmp_path, p, n_reads=400, read_len=90, seed=13)
    assert [r[0] for r in reads_of(src)] == [r[0] for r in reads_of(dst)]


def test_sorted_mode_exploits_shared_prefixes(tmp_path):
    """On duplicate-heavy data, sorted mode must compress the DNA stream
    materially better than original order (LCP prefix copying at work)."""
    src = str(tmp_path / "dup.fastq")
    rng = np.random.default_rng(31)
    base_reads = ["".join("ACGT"[b] for b in rng.integers(0, 4, 80))
                  for _ in range(40)]
    lines = []
    for i in range(800):  # heavy duplication: 40 distinct reads x 20 copies
        s = base_reads[rng.integers(0, len(base_reads))]
        lines += [f"@d{i}", s, "+", "I" * 80]
    open(src, "w").write("\n".join(lines) + "\n")

    outs = {}
    # locals disabled: isolates the LCP mechanism (with in-batch local
    # tables on, duplicates are nearly free in BOTH orders, which is the
    # locals doing their job — the margin then shrinks to ~1%)
    for mode in (DnaMode.SE_ORIGINAL, DnaMode.SE_SORTED):
        p = small_params(dna_mode=mode, quality_mode=QualityMode.NONE,
                         local_log2_cells=0)
        arc = str(tmp_path / f"{mode.value}.fqst")
        stats = pipeline.compress_file(p, src, arc)
        outs[mode] = stats["stream_bytes"]["dna"] + stats["stream_bytes"]["meta"]
        dst = str(tmp_path / f"{mode.value}.out")
        pipeline.decompress_file(Params(), arc, dst)
        assert sorted(r[0] for r in reads_of(src)) == \
            sorted(r[0] for r in reads_of(dst))
    assert outs[DnaMode.SE_SORTED] < 0.9 * outs[DnaMode.SE_ORIGINAL], outs


def test_streamed_compress_matches_in_ram_archive(tmp_path):
    """Block-streamed input (VERDICT #6: WGS memory envelope) must produce
    the IDENTICAL archive to the in-RAM path — same doubling schedule, same
    batches — and round-trip exactly, even with a chunk size so small that
    every batch spans several chunks."""
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS)
    src = str(tmp_path / "in.fastq")
    make_fastq(src, 900, 72, seed=11)
    a1 = str(tmp_path / "ram.fqst")
    a2 = str(tmp_path / "streamed.fqst")
    pipeline.compress_file(p, src, a1)
    stats = pipeline.compress_file(small_params(
        dna_mode=DnaMode.SE_ORIGINAL, quality_mode=QualityMode.LOSSLESS),
        src, a2, stream_chunk_bytes=4096)
    assert stats["n_reads"] == 900
    assert open(a1, "rb").read() == open(a2, "rb").read()
    dst = str(tmp_path / "rt.fastq")
    pipeline.decompress_file(Params(), a2, dst)
    rin, rout = reads_of(src), reads_of(dst)
    assert [r[:2] for r in rin] == [r[:2] for r in rout]


def test_streamed_sorted_matches_in_ram_archive(tmp_path):
    """External bin sort (VERDICT #5, reference preprocess_se): the streamed
    sorted path — chunks scattered into key-prefix bins, each bin sorted in
    RAM, bins consumed in key order — must produce the IDENTICAL archive to
    the in-RAM sort_order path."""
    src = str(tmp_path / "in.fastq")
    make_fastq(src, 900, 72, seed=13)
    a1 = str(tmp_path / "ram.fqst")
    a2 = str(tmp_path / "ext.fqst")
    pipeline.compress_file(
        small_params(dna_mode=DnaMode.SE_SORTED,
                     quality_mode=QualityMode.ILLUMINA_8), src, a1)
    pipeline.compress_file(
        small_params(dna_mode=DnaMode.SE_SORTED,
                     quality_mode=QualityMode.ILLUMINA_8), src, a2,
        stream_chunk_bytes=4096)
    assert open(a1, "rb").read() == open(a2, "rb").read()


def test_streamed_compress_rejects_sorted_ids(tmp_path):
    """Ids stream in original order (template prescan) — the one remaining
    streamed rejection is sorted+ids: the external bin sort drops ids."""
    src = str(tmp_path / "in.fastq")
    make_fastq(src, 100, 50, seed=2)
    import pytest

    with pytest.raises(ValueError, match="-im n"):
        pipeline.compress_file(
            small_params(dna_mode=DnaMode.SE_SORTED,
                         id_mode=IdMode.LOSSLESS), src,
            str(tmp_path / "x.fqst"), stream_chunk_bytes=1 << 20)


def test_siv_prunes_at_group_boundary_and_roundtrips(tmp_path, capsys):
    """A deliberately tiny SIV (pmer_len=5 -> 256 counters) must cross the
    0.5 fill threshold, prune singletons at a group boundary (both sides
    replaying the rule), and still round-trip exactly."""
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.NONE, verbosity=1)
    p.pmer_len = 5
    src = str(tmp_path / "in.fastq")
    arc = str(tmp_path / "out.fqst")
    dst = str(tmp_path / "roundtrip.fastq")
    make_fastq(src, 700, 72, seed=5)
    pipeline.compress_file(p, src, arc, group_mem_bytes=1)
    out = capsys.readouterr().out
    assert "siv pruned" in out
    pipeline.decompress_file(Params(), arc, dst)
    rin, rout = reads_of(src), reads_of(dst)
    assert [r[0] for r in rin] == [r[0] for r in rout]


def test_undersized_table_regrows_and_roundtrips(tmp_path, capsys):
    """VERDICT item 7: a deliberately undersized s/b-mer table must hit the
    0.6 fill threshold, regrow at a group boundary (both sides replaying the
    same deterministic rule), and still round-trip exactly."""
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.NONE,
                     smer_log2_buckets=6, bmer_log2_buckets=6,
                     verbosity=1)
    src = str(tmp_path / "in.fastq")
    arc = str(tmp_path / "out.fqst")
    dst = str(tmp_path / "roundtrip.fastq")
    make_fastq(src, 700, 72, seed=5)
    # tiny group budget -> every batch is its own group -> several growth
    # opportunities while data still follows
    pipeline.compress_file(p, src, arc, group_mem_bytes=1)
    out = capsys.readouterr().out
    assert "table grown" in out
    pipeline.decompress_file(Params(), arc, dst)
    rin, rout = reads_of(src), reads_of(dst)
    assert [r[0] for r in rin] == [r[0] for r in rout]


def test_streamed_id_compress_matches_in_ram_archive(tmp_path):
    """Streamed compression with an id stream (VERDICT r4 #7): the template
    prescan fixes the id geometry up front, so the block-streamed path
    produces the IDENTICAL archive to the in-RAM path — including the
    per-lane id token chains across chunk-spanning batches."""
    src = str(tmp_path / "in.fastq")
    make_fastq(src, 900, 72, seed=37)
    a1 = str(tmp_path / "ram.fqst")
    a2 = str(tmp_path / "streamed.fqst")
    pipeline.compress_file(
        small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS,
                     id_mode=IdMode.LOSSLESS), src, a1)
    pipeline.compress_file(
        small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS,
                     id_mode=IdMode.LOSSLESS), src, a2,
        stream_chunk_bytes=4096)
    assert open(a1, "rb").read() == open(a2, "rb").read()
    dst = str(tmp_path / "rt.fastq")
    pipeline.decompress_file(Params(), a2, dst)
    assert open(src, "rb").read() == open(dst, "rb").read()


def test_streamed_instrument_id_matches_in_ram_archive(tmp_path):
    """Instrument id mode streams too: the prescan measures the TRANSFORMED
    prefixes, and per-batch transformation matches the whole-file pass."""
    src = str(tmp_path / "in.fastq")
    make_fastq(src, 700, 64, seed=41)
    a1 = str(tmp_path / "ram.fqst")
    a2 = str(tmp_path / "streamed.fqst")
    for arc, chunk in ((a1, 0), (a2, 4096)):
        pipeline.compress_file(
            small_params(dna_mode=DnaMode.SE_ORIGINAL,
                         quality_mode=QualityMode.NONE,
                         id_mode=IdMode.INSTRUMENT), src, arc,
            stream_chunk_bytes=chunk)
    assert open(a1, "rb").read() == open(a2, "rb").read()


def test_streamed_pe_matches_in_ram_archive(tmp_path):
    """Streamed PE (VERDICT r4 #7): two synchronized chunk cursors feed the
    paired interleave per batch — identical archive to the in-RAM path,
    byte-exact round trip, even with chunks far smaller than a batch (pairs
    never split across chunk or batch boundaries)."""
    from tests.test_pe import make_pe_pair

    f1, f2 = make_pe_pair(tmp_path, n_pairs=450, read_len=64, seed=43,
                          genome_kb=20)
    a1 = str(tmp_path / "ram.fqst")
    a2 = str(tmp_path / "streamed.fqst")
    pipeline.compress_pe(
        small_params(dna_mode=DnaMode.PE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS,
                     id_mode=IdMode.LOSSLESS), f1, f2, a1)
    pipeline.compress_pe(
        small_params(dna_mode=DnaMode.PE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS,
                     id_mode=IdMode.LOSSLESS), f1, f2, a2,
        stream_chunk_bytes=4096)
    assert open(a1, "rb").read() == open(a2, "rb").read()
    o1, o2 = str(tmp_path / "o1.fastq"), str(tmp_path / "o2.fastq")
    pipeline.decompress_file(Params(), a2, o1, o2)
    assert open(f1, "rb").read() == open(o1, "rb").read()
    assert open(f2, "rb").read() == open(o2, "rb").read()


def test_streamed_pe_mate_count_mismatch(tmp_path):
    """The paired chunk reader detects unpaired tails instead of silently
    truncating (reference errors on mate count mismatch too)."""
    import pytest

    from tests.test_pe import make_pe_pair

    f1, f2 = make_pe_pair(tmp_path, n_pairs=64, read_len=60, seed=47)
    # append one extra read to mate1
    with open(f1, "a") as f:
        f.write("@extra 1\n" + "A" * 60 + "\n+\n" + "I" * 60 + "\n")
    with pytest.raises(ValueError, match="mate counts differ"):
        pipeline.compress_pe(
            small_params(dna_mode=DnaMode.PE_ORIGINAL,
                         quality_mode=QualityMode.NONE), f1, f2,
            str(tmp_path / "x.fqst"), stream_chunk_bytes=4096)
