"""Read-prefix partial-SIV ramp (streams/dna.py _prefix_ramp_counts*):
the TPU analog of the reference's partial-kmer pmer queries
(find_counts_p, dna.cpp:210-226; bit_vec.h test_shorter range sums)."""
import numpy as np
import jax.numpy as jnp
import jax

from fqsqueezer_tpu.streams import dna
from fqsqueezer_tpu.ops import tables


def _cfg(siv_len=9, prefix_len=5):
    return dna.DnaConfig(siv_len=siv_len, prefix_len=prefix_len,
                         prefix_ramp=True)


def _brute(siv_c4, pfx, q, siv_len):
    """Sum counts of every siv_len-mer whose first q bases match pfx and
    whose base q is the candidate (free: context tail + next-base lane)."""
    ctx_len = siv_len - 1
    out = np.zeros(4, np.int64)
    n_ctx = siv_c4.shape[0]
    for w in range(n_ctx):
        top = w >> (2 * (ctx_len - q))
        cand = (w >> (2 * (ctx_len - q - 1))) & 3
        if top == pfx:
            out[cand] += siv_c4[w].sum()
    return np.minimum(out, 255)


def test_ramp_counts_match_bruteforce():
    cfg = _cfg()
    rng = np.random.default_rng(7)
    n_ctx = 4 ** (cfg.siv_len - 1)
    # random sparse inserts
    keys = rng.integers(0, n_ctx * 4, size=3000).astype(np.int32)
    siv = tables.siv_create(cfg.siv_len)
    siv = tables.siv_update(siv, jnp.asarray(keys),
                            jnp.ones(keys.shape, bool))
    siv_c4 = np.asarray(tables.unpack_counts(siv))    # [n_ctx, 4]

    R, L = 4, 20
    kcodes = jnp.asarray(rng.integers(0, 4, size=(R, L)).astype(np.int32))
    for q in dna._ramp_cols(cfg):
        got = np.asarray(dna._prefix_ramp_counts(cfg, tables.LOCAL, siv, kcodes, q))
        for r in range(R):
            pfx = 0
            for j in range(q):
                pfx = pfx * 4 + int(kcodes[r, j])
            np.testing.assert_array_equal(
                got[r], _brute(siv_c4, pfx, q, cfg.siv_len),
                err_msg=f"q={q} r={r}")


def test_ramp_scan_variant_matches_encoder():
    """The decode scan's statically-unrolled SWAR variant must equal the
    encoder's wide-batch variant at every ramp column."""
    cfg = _cfg(siv_len=10, prefix_len=6)
    rng = np.random.default_rng(3)
    keys = rng.integers(0, (4 ** cfg.siv_len), size=5000).astype(np.int32)
    siv = tables.siv_create(cfg.siv_len)
    siv = tables.siv_update(siv, jnp.asarray(keys),
                            jnp.ones(keys.shape, bool))

    R, L = 8, 16
    kcodes = jnp.asarray(rng.integers(0, 4, size=(R, L)).astype(np.int32))
    w = 4 ** jnp.arange(L - 1, -1, -1, dtype=jnp.int32)
    for q in dna._ramp_cols(cfg):
        static = np.asarray(dna._prefix_ramp_counts(cfg, tables.LOCAL, siv, kcodes, q))
        pfx = jnp.sum(kcodes[:, :q] * w[L - q:], axis=1)
        scan_v = np.asarray(jax.jit(
            lambda s, p: dna._prefix_ramp_counts_static(cfg, tables.LOCAL,
                                                        s, p, q)
        )(siv, pfx))
        np.testing.assert_array_equal(scan_v, static, err_msg=f"q={q}")
