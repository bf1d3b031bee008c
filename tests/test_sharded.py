"""Multi-chip (virtual 8-device CPU mesh) sharded path tests."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fqsqueezer_tpu import pipeline
from fqsqueezer_tpu.parallel import sharded


def _cfgs(mesh_dp=1, mesh_tp=1):
    import __graft_entry__ as ge

    return ge._tiny_cfgs(mesh_dp, mesh_tp)


def test_dryrun_roundtrip_8dev():
    """Full multichip encode -> decode round-trip (also what the driver runs).

    Runs in a SUBPROCESS: after dozens of in-suite XLA CPU compiles the
    long-lived pytest process can abort inside backend_compile_and_load
    (observed flake); a fresh interpreter matches how the driver invokes it.
    """
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "__graft_entry__.py"],
        capture_output=True, text=True, timeout=600,
        cwd=str(__import__("pathlib").Path(__file__).parent.parent))
    assert "dryrun_multichip(8) ok" in out.stdout, (out.stdout[-2000:],
                                                   out.stderr[-2000:])


def test_sharded_matches_local_modeling():
    """tp-sharded table find/update must agree with the local backend.

    dp=1 / tp=8: pure table sharding is semantics-preserving, so the full
    round-4 feature set (canon + row_global + prefix ramp) must reproduce
    the single-chip state BIT-FOR-BIT — finds psum to the local answer,
    ownership-masked updates partition the buckets, and the batch-level
    row-block replay applies the exact event sequence of the local
    row-global scan. dp>1 legitimately diverges (row-fresh statistics see
    per-shard row histories, like the reference's thread count baked into
    the archive, params.h:87) and is covered by the roundtrip tests below.
    """
    import __graft_entry__ as ge
    from fqsqueezer_tpu.params import DnaMode
    from fqsqueezer_tpu import pipeline as pl

    # mesh_dp/tp set BEFORE make_configs: the mesh feature gating has one
    # owner, and the canon k-mer protocol (the round-3 default) is covered
    p, _ = ge._tiny_cfgs(mesh_dp=1, mesh_tp=8)
    p.dna_mode = DnaMode.SE_ORIGINAL
    dcfg, qcfg, mcfg, icfg = pl.make_configs(p)
    rng = np.random.default_rng(5)
    R = 2 * dcfg.n_lanes * 2
    L = 48
    codes = rng.integers(0, 4, size=(R, L)).astype(np.int32)
    lengths = np.full((R,), L, np.int32)
    qsyms = rng.integers(0, 8, size=(R, L)).astype(np.int32)
    from fqsqueezer_tpu.streams import ids as ids_mod

    id_np = ids_mod.encode_ids_host(
        [f"SIM.{r} {r}".encode() for r in range(R)],
        ids_mod.read_lanes(R, dcfg.n_lanes), icfg.n_fields, icfg.max_id_len,
        [None] * dcfg.n_lanes)

    # local reference run
    state_l = pipeline.state_create(dcfg, qcfg, icfg)
    m_l, i_l, d_l, q_l, new_l = pipeline._encode_batch(
        dcfg, qcfg, mcfg, icfg, state_l, jnp.asarray(codes),
        jnp.asarray(codes), jnp.asarray(lengths), jnp.asarray(qsyms),
        tuple(jnp.asarray(a) for a in id_np))

    # sharded run: dp=1, tp=8
    mesh = sharded.make_mesh(8, tp=8)
    state_s = pipeline.state_create(dcfg, qcfg, icfg)
    sspec = sharded.state_specs(qcfg is not None, icfg is not None)
    state_s = jax.device_put(
        state_s, jax.tree.map(lambda s: NamedSharding(mesh, s), sspec,
                              is_leaf=lambda x: isinstance(x, P)))
    bspec = NamedSharding(mesh, P("dp"))
    enc = sharded.make_sharded_encode(dcfg, qcfg, mcfg, icfg, mesh)
    put = lambda a: jax.device_put(jnp.asarray(a), bspec)
    m_s, i_s, d_s, q_s, new_s = enc(
        state_s, put(codes), put(codes), put(lengths), put(qsyms),
        tuple(put(a) for a in id_np), jnp.int32(R))

    # identical global model state evolution (tables are laid out differently
    # across shards, but the replicated context model must match exactly)
    np.testing.assert_array_equal(np.asarray(new_l.meta), np.asarray(new_s.meta))
    np.testing.assert_array_equal(np.asarray(new_l.qual), np.asarray(new_s.qual))
    np.testing.assert_array_equal(
        np.asarray(new_l.dna.model), np.asarray(new_s.dna.model))
    # SIV / hash tables are index-sharded: concatenating tp shards reproduces
    # the local tables exactly (ownership ranges partition the key space and
    # the claim rounds are order-identical within a bucket)
    np.testing.assert_array_equal(
        np.asarray(new_l.dna.siv), np.asarray(new_s.dna.siv))
    np.testing.assert_array_equal(
        np.asarray(new_l.dna.s_tc), np.asarray(new_s.dna.s_tc))
    np.testing.assert_array_equal(
        np.asarray(new_l.dna.b_tc), np.asarray(new_s.dna.b_tc))
    # identical total payload for the dp=2 split vs local (same lane count
    # per shard => same streams modulo shard boundaries); compare total words
    # of the meta stream whose modeling is shard-invariant
    assert int(np.asarray(q_s[1]).sum()) > 0


def test_multichip_two_batch_chain():
    """State must evolve identically across TWO sharded steps: encode two
    batches, then decode both, chaining lane states and codec state — the
    multichip analog of the group-chained pipeline."""
    import __graft_entry__ as ge

    p, (dcfg, qcfg, mcfg, icfg) = ge._tiny_cfgs(mesh_dp=4, mesh_tp=2)
    mesh = sharded.make_mesh(8, tp=2)
    dp = mesh.shape["dp"]
    R = dp * dcfg.n_lanes * 2
    L = 40

    b0 = ge._tiny_batch(icfg, R=R, L=L, seed=0)
    b1 = ge._tiny_batch(icfg, R=R, L=L, seed=1)

    state = pipeline.state_create(dcfg, qcfg, icfg)
    sspec = sharded.state_specs(qcfg is not None, icfg is not None)
    state = jax.device_put(
        state, jax.tree.map(lambda s: NamedSharding(mesh, s), sspec,
                            is_leaf=lambda x: isinstance(x, P)))
    bspec = NamedSharding(mesh, P("dp"))
    put = lambda a: jax.device_put(jnp.asarray(a), bspec)

    enc = sharded.make_sharded_encode(dcfg, qcfg, mcfg, icfg, mesh)
    outs = []
    st = state
    for b in (b0, b1):
        m, i, d, q, st = enc(st, *[put(a) for a in b[:4]],
                             tuple(put(a) for a in b[4]), jnp.int32(R))
        outs.append((m, i, d, q))

    dec = sharded.make_sharded_decode(dcfg, qcfg, mcfg, icfg, mesh,
                                      R // dp, L)
    st = state
    for b, (m, i, d, q) in zip((b0, b1), outs):
        zpe = put(np.zeros((dp,), np.uint32))   # no pe stream (SE)
        lengths, codes, qsyms, id_batch, st, _ = dec(
            st, put(m[0]), put(m[2]), put(i[0]), put(i[2]),
            put(d[0]), put(d[2]), put(q[0]), put(q[2]), zpe, zpe,
            jnp.int32(R))
        np.testing.assert_array_equal(np.asarray(codes), b[0])
        np.testing.assert_array_equal(np.asarray(lengths), b[2])
        np.testing.assert_array_equal(np.asarray(qsyms), b[3])
        for got, want in zip(id_batch, b[4]):
            np.testing.assert_array_equal(np.asarray(got), want)
