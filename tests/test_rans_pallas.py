"""Pallas rANS encode kernel == lax.scan reference, element-exact.

Runs the kernel in interpret mode so the equivalence is checked on CPU in the
regular suite; the TPU path compiles the same kernel for real.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fqsqueezer_tpu.ops import rans

SB = 14


def _grid(rng, T, N):
    raw = rng.integers(1, 50, size=(T, N, 5)).astype(np.int64)
    cum = np.cumsum(raw, axis=-1)
    cdf = np.concatenate([np.zeros_like(cum[..., :1]), cum], axis=-1)
    cdf = (cdf << SB) // cum[..., -1:]
    syms = rng.integers(0, 5, size=(T, N))
    f = np.take_along_axis(cdf, syms[..., None] + 1, axis=-1)[..., 0] - \
        np.take_along_axis(cdf, syms[..., None], axis=-1)[..., 0]
    c = np.take_along_axis(cdf, syms[..., None], axis=-1)[..., 0]
    mask = rng.random((T, N)) < 0.85
    f = np.where(mask, f, 1 << SB)
    c = np.where(mask, c, 0)
    return f.astype(np.uint32), c.astype(np.uint32)


@pytest.mark.parametrize("T", [40, 256, 300])
def test_pallas_matches_scan(T):
    N = 256
    rng = np.random.default_rng(11 + T)
    f, c = _grid(rng, T, N)
    init = jnp.full((N,), rans.RANS_L, jnp.uint32)

    # reference: the scan path inside rans_encode (CPU backend)
    words_ref, n_ref, st_ref = rans.rans_encode(
        jnp.asarray(f), jnp.asarray(c), SB, init)

    wpl, epl, st = rans._rans_encode_pallas(
        jnp.asarray(f), jnp.asarray(c), SB, init, interpret=True)
    e = np.asarray(epl).reshape(-1)
    w = np.asarray(wpl).reshape(-1)
    packed = w[e]
    np.testing.assert_array_equal(np.asarray(st), np.asarray(st_ref))
    assert packed.shape[0] == int(n_ref)
    np.testing.assert_array_equal(
        packed, np.asarray(words_ref)[: int(n_ref)])


def test_div_u32_by_u16_exact():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 32, size=20000, dtype=np.uint64).astype(np.uint32)
    f = rng.integers(1, 1 << 14, size=20000, dtype=np.uint64).astype(np.uint32)
    # include stress values: tiny f, max f, boundaries
    x[:4] = [0xFFFFFFFF, 0, 1, 0xFFFFFFFF]
    f[:4] = [1, 1, 0x3FFF, 0x3FFF]
    q, r = rans._div_u32_by_u16(jnp.asarray(x), jnp.asarray(f))
    np.testing.assert_array_equal(np.asarray(q),
                                  (x.astype(np.uint64) // f).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(r),
                                  (x.astype(np.uint64) % f).astype(np.uint32))
