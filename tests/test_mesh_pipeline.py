"""Multi-chip file pipeline: compress/decompress over a dp×tp virtual mesh."""
import numpy as np
import pytest

from fqsqueezer_tpu import pipeline
from fqsqueezer_tpu.parallel import mesh_pipeline
from fqsqueezer_tpu.io import fastq
from fqsqueezer_tpu.params import Params, DnaMode, QualityMode, IdMode
from tests.test_pipeline import make_fastq, reads_of, small_params


def test_mesh_file_roundtrip(tmp_path):
    src = str(tmp_path / "in.fastq")
    make_fastq(src, 700, 72, seed=5)
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS,
                     id_mode=IdMode.LOSSLESS)
    p.n_lanes = 16
    arc = str(tmp_path / "m.fqst")
    dst = str(tmp_path / "m.fastq")
    stats = mesh_pipeline.compress_file_mesh(p, src, arc, dp=4, tp=2)
    assert stats["n_reads"] == 700
    mesh_pipeline.decompress_file_mesh(Params(), arc, dst)
    assert open(src, "rb").read() == open(dst, "rb").read()


def test_mesh_group_chaining_one_state_block(tmp_path):
    """The mesh path defers rANS emission like the single-chip pipeline:
    several batches share ONE per-(shard,stream) state block per group, and
    the forward-chained decode reproduces the input exactly."""
    from fqsqueezer_tpu import archive

    src = str(tmp_path / "in.fastq")
    make_fastq(src, 700, 72, seed=7)
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS,
                     id_mode=IdMode.LOSSLESS)
    p.n_lanes = 16
    arc = str(tmp_path / "m.fqst")
    dst = str(tmp_path / "m.fastq")
    mesh_pipeline.compress_file_mesh(p, src, arc, dp=2, tp=1)

    reader = archive.ArchiveReader(arc)
    n_groups, n_batches = 0, 0
    while True:
        rec = reader.read_group(16)
        if rec is None:
            break
        n_groups += 1
        n_batches += len(rec[1])
    reader.close()
    assert n_groups == 1 and n_batches > 1, (n_groups, n_batches)

    mesh_pipeline.decompress_file_mesh(Params(), arc, dst)
    assert open(src, "rb").read() == open(dst, "rb").read()


def test_single_chip_decoder_rejects_mesh_archive(tmp_path):
    src = str(tmp_path / "in.fastq")
    make_fastq(src, 200, 60, seed=6)
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.NONE)
    p.n_lanes = 16
    arc = str(tmp_path / "m.fqst")
    mesh_pipeline.compress_file_mesh(p, src, arc, dp=2, tp=1)
    with pytest.raises(ValueError, match="mesh"):
        pipeline.decompress_file(Params(), arc, str(tmp_path / "x.fastq"))


def test_mesh_pe_roundtrip(tmp_path):
    from tests.test_pe import make_pe_pair

    p1, p2 = make_pe_pair(tmp_path, n_pairs=300, read_len=64, seed=8,
                          genome_kb=25)
    p = small_params(dna_mode=DnaMode.PE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS,
                     id_mode=IdMode.LOSSLESS)
    p.n_lanes = 16
    arc = str(tmp_path / "pe.fqst")
    o1 = str(tmp_path / "o1.fastq")
    o2 = str(tmp_path / "o2.fastq")
    mesh_pipeline.compress_pe_mesh(p, p1, p2, arc, dp=2, tp=2)
    mesh_pipeline.decompress_file_mesh(Params(), arc, o1, o2)
    assert open(p1, "rb").read() == open(o1, "rb").read()
    assert open(p2, "rb").read() == open(o2, "rb").read()


def test_legacy_mesh_pe_header_decodes_with_anchors_off():
    """Mesh PE archives written before dna_pe_mesh existed carry NO pe
    stream despite a nonzero pe_log2_buckets in the header: the absent knob
    must load as 0 and gate the anchor machinery off (advisor round-4
    medium finding), while single-chip PE headers keep anchors regardless."""
    import json

    from fqsqueezer_tpu.params import Params, DnaMode
    from fqsqueezer_tpu import pipeline

    p = Params()
    p.dna_mode = DnaMode.PE_ORIGINAL
    p.mesh_dp, p.mesh_tp = 2, 1
    blob = p.store_params()
    d = json.loads(blob.decode())
    assert d["dna_pe_mesh"] == 1          # new writers stamp the knob
    del d["dna_pe_mesh"]                  # simulate a round-3 archive
    legacy = Params.load_params(json.dumps(d).encode(), base=Params())
    assert legacy.dna_pe_mesh == 0
    dcfg, _, _, _ = pipeline.make_configs(legacy)
    assert dcfg.pe_log2_buckets == 0      # anchors off: stream layout matches

    # new mesh archive (knob present) keeps anchors on
    dcfg_new, _, _, _ = pipeline.make_configs(
        Params.load_params(blob, base=Params()))
    assert dcfg_new.pe_log2_buckets > 0

    # single-chip legacy PE header (no knob, mesh 1x1): anchors stay on
    p1 = Params()
    p1.dna_mode = DnaMode.PE_ORIGINAL
    d1 = json.loads(p1.store_params().decode())
    del d1["dna_pe_mesh"]
    legacy1 = Params.load_params(json.dumps(d1).encode(), base=Params())
    dcfg1, _, _, _ = pipeline.make_configs(legacy1)
    assert dcfg1.pe_log2_buckets > 0


def test_mesh_multi_group_maintenance_roundtrip(tmp_path):
    """Multi-group mesh run on a dense corpus: the group-boundary
    maintenance (clamp + SIV prune, sharded.make_sharded_maintenance) must
    fire on the encoder and be replayed identically by the decoder (VERDICT
    r4 #4). A tiny group_mem_bytes forces >= 3 groups; genome_kb dense
    enough that the SIV prune threshold trips at some boundary — a
    maintenance asymmetry would diverge the cascades and fail the crc."""
    from fqsqueezer_tpu import archive

    src = str(tmp_path / "in.fastq")
    make_fastq(src, 1200, 72, seed=11, genome_kb=60)
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS,
                     id_mode=IdMode.LOSSLESS)
    p.n_lanes = 16
    p.max_batch_reads = 128
    arc = str(tmp_path / "m.fqst")
    dst = str(tmp_path / "m.fastq")
    stats = mesh_pipeline.compress_file_mesh(p, src, arc, dp=2, tp=2,
                                             group_mem_bytes=64 << 10)
    assert stats["n_reads"] == 1200
    reader = archive.ArchiveReader(arc)
    n_groups = 0
    while reader.read_group(16) is not None:
        n_groups += 1
    reader.close()
    assert n_groups >= 3, n_groups

    mesh_pipeline.decompress_file_mesh(Params(), arc, dst)
    assert open(src, "rb").read() == open(dst, "rb").read()


def test_mesh_maintenance_prunes_siv():
    """The sharded maintenance step prunes SIV singletons when the global
    fill crosses the single-chip threshold, and clamps u16 counters."""
    import jax
    import jax.numpy as jnp

    from fqsqueezer_tpu import pipeline as base
    from fqsqueezer_tpu.parallel import sharded
    from fqsqueezer_tpu.streams import dna
    from fqsqueezer_tpu.ops import tables
    from jax.sharding import NamedSharding, PartitionSpec as P

    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.NONE)
    p.dna_sb_proto = 0           # legacy u16 counters: clamp is live
    dcfg, qcfg, mcfg, icfg = base.make_configs(p)
    mesh = sharded.make_mesh(4, tp=4)
    maint = sharded.make_sharded_maintenance(dcfg, qcfg, mcfg, icfg, mesh)

    st = dna.dna_state_create(dcfg)
    # dense SIV (fill 1.0 > 0.5 threshold): half singletons, half 2s
    n = st.siv.shape[0]
    siv = jnp.where(jnp.arange(n) % 2 == 0,
                    jnp.uint32(0x01010101), jnp.uint32(0x02020202))
    # u16 counter near the wrap point in the s-table
    s_tc = st.s_tc.at[0, tables.KBUCKET].set(jnp.uint32(0xFFF0))
    st = st._replace(siv=siv, s_tc=s_tc)
    sspec = dna.DnaState(siv=P("tp"), s_tc=P("tp"), b_tc=P("tp"),
                         model=P(), pe=None)
    st = jax.device_put(st, jax.tree.map(
        lambda s: NamedSharding(mesh, s), sspec,
        is_leaf=lambda x: isinstance(x, P)))

    new, fills = maint(st)
    f = np.asarray(fills)
    assert f[2] == 4 * n                       # pre-prune nz reported
    siv_new = np.asarray(new.siv)
    assert (siv_new[0::2] == 0).all()          # singletons cleared
    assert (siv_new[1::2] == 0x02020202).all()  # counts >= 2 kept
    assert np.asarray(new.s_tc)[0, tables.KBUCKET] == 0x8000  # clamped


def test_mesh_archive_decodes_sequentially_on_one_device(tmp_path):
    """A dp x tp archive must decode WITHOUT the writer's mesh (VERDICT r4
    #5): the sequential per-shard emulation decodes each shard against the
    batch-frozen full state and applies the batch evolution once — output
    byte-identical to the mesh decode."""
    src = str(tmp_path / "in.fastq")
    make_fastq(src, 700, 72, seed=13)
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS,
                     id_mode=IdMode.LOSSLESS)
    p.n_lanes = 16
    arc = str(tmp_path / "m.fqst")
    mesh_pipeline.compress_file_mesh(p, src, arc, dp=4, tp=2)

    dst_mesh = str(tmp_path / "mesh.fastq")
    dst_seq = str(tmp_path / "seq.fastq")
    mesh_pipeline.decompress_file_mesh(Params(), arc, dst_mesh)
    mesh_pipeline.decompress_file_mesh_seq(Params(), arc, dst_seq)
    src_b = open(src, "rb").read()
    assert open(dst_mesh, "rb").read() == src_b
    assert open(dst_seq, "rb").read() == src_b


def test_mesh_pe_archive_decodes_sequentially(tmp_path):
    """PE mesh archives (anchor machinery + pe stream) through the
    sequential decode path."""
    from tests.test_pe import make_pe_pair

    src1, src2 = make_pe_pair(tmp_path, n_pairs=300, read_len=64, seed=17)
    p = small_params(dna_mode=DnaMode.PE_ORIGINAL,
                     quality_mode=QualityMode.NONE)
    p.n_lanes = 16
    arc = str(tmp_path / "m.fqst")
    mesh_pipeline.compress_pe_mesh(p, src1, src2, arc, dp=2, tp=1)

    o1 = str(tmp_path / "seq_1.fastq")
    o2 = str(tmp_path / "seq_2.fastq")
    mesh_pipeline.decompress_file_mesh_seq(Params(), arc, o1, o2)

    def seqs(path):
        return open(path).read().splitlines()[1::4]

    assert seqs(o1) == seqs(src1)
    assert seqs(o2) == seqs(src2)


def test_mesh_routed_update_exchange_bit_identical(tmp_path):
    """The owner-routed s/b update exchange (mesh_route_sb=1,
    sharded.sb_routed_updates) must produce BIT-IDENTICAL tables to the
    replicated all_gather exchange: same per-row event multisets, same
    authoritative order — so the archives' group payloads match and both
    decode byte-exactly (VERDICT r4 #6)."""
    from fqsqueezer_tpu import archive

    src = str(tmp_path / "in.fastq")
    make_fastq(src, 700, 72, seed=23)
    arcs = []
    for route in (0, 1):
        p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                         quality_mode=QualityMode.LOSSLESS,
                         id_mode=IdMode.LOSSLESS)
        p.n_lanes = 16
        p.mesh_route_sb = route
        arc = str(tmp_path / f"m{route}.fqst")
        mesh_pipeline.compress_file_mesh(p, src, arc, dp=2, tp=2)
        arcs.append(arc)

    def payloads(path):
        r = archive.ArchiveReader(path)
        out = []
        while True:
            rec = r.read_group(16)
            if rec is None:
                break
            gstates, batches, crc = rec
            out.append(([np.asarray(s).tobytes() for s in gstates],
                        [(t, L, [(w.tobytes(), n) for w, n in streams])
                         for t, L, streams in batches], crc))
        r.close()
        return out

    assert payloads(arcs[0]) == payloads(arcs[1])

    dst = str(tmp_path / "routed.fastq")
    mesh_pipeline.decompress_file_mesh(Params(), arcs[1], dst)
    assert open(src, "rb").read() == open(dst, "rb").read()


def test_mesh_snapshot_resume(tmp_path):
    """Mesh group snapshots (VERDICT r4 #10): compress dp=2 with a tiny
    group budget, snapshot at every boundary, then resume decode from
    group 1 — on the mesh AND via the sequential any-device path — and
    get the identical byte tail."""
    import glob

    from fqsqueezer_tpu import checkpoint

    src = str(tmp_path / "in.fastq")
    make_fastq(src, 700, 72, seed=29)
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.LOSSLESS,
                     id_mode=IdMode.LOSSLESS)
    p.n_lanes = 16
    arc = str(tmp_path / "m.fqst")
    snap = str(tmp_path / "snap")
    mesh_pipeline.compress_file_mesh(p, src, arc, dp=2, tp=1,
                                     group_mem_bytes=64 << 10,
                                     snapshot_prefix=snap)
    snaps = sorted(glob.glob(snap + ".g*.npz"))
    assert len(snaps) >= 2, "expected multiple groups"

    full = str(tmp_path / "full.fastq")
    mesh_pipeline.decompress_file_mesh(Params(), arc, full)
    from tests.test_pipeline import reads_of

    all_reads = reads_of(full)
    assert reads_of(src) == all_reads

    state = checkpoint.load_state(checkpoint.snapshot_path(snap, 1))
    part = str(tmp_path / "part.fastq")
    mesh_pipeline.decompress_file_mesh(Params(), arc, part, start_group=1,
                                       init_state=state)
    tail = reads_of(part)
    assert 0 < len(tail) < len(all_reads)
    assert all_reads[len(all_reads) - len(tail):] == tail

    # the sequential (any-device-count) decoder resumes from the SAME
    # snapshot — mesh snapshots are assembled global state
    state2 = checkpoint.load_state(checkpoint.snapshot_path(snap, 1))
    part2 = str(tmp_path / "part_seq.fastq")
    mesh_pipeline.decompress_file_mesh_seq(Params(), arc, part2,
                                           start_group=1, init_state=state2)
    assert reads_of(part2) == tail


def test_mesh_id_codec_v2_in_header(tmp_path):
    """Mesh archives carry id codec v2 (VERDICT r4 #9): per-shard n_valid
    masking means padding rows code nothing, and the header records v2 so
    decode follows."""
    from fqsqueezer_tpu import archive

    src = str(tmp_path / "in.fastq")
    make_fastq(src, 700, 72, seed=31)
    p = small_params(dna_mode=DnaMode.SE_ORIGINAL,
                     quality_mode=QualityMode.NONE,
                     id_mode=IdMode.LOSSLESS)
    p.n_lanes = 16
    arc = str(tmp_path / "m.fqst")
    mesh_pipeline.compress_file_mesh(p, src, arc, dp=4, tp=1)
    r = archive.ArchiveReader(arc)
    hdr = Params.load_params(r.header_blob)
    r.close()
    assert hdr.id_codec_v == 2
    dst = str(tmp_path / "m.fastq")
    mesh_pipeline.decompress_file_mesh(Params(), arc, dst)
    assert open(src, "rb").read() == open(dst, "rb").read()
