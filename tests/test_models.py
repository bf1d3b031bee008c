"""Unit tests: batch-frozen adaptive frequency models."""
import numpy as np
import jax.numpy as jnp

from fqsqueezer_tpu.ops import models

SB = 14


def test_cdf_valid_and_floor():
    m = models.model_create(16, 5)
    m = models.model_update(
        m, jnp.asarray([3, 3, 3, 7]), jnp.asarray([0, 0, 2, 4]),
        jnp.ones(4, bool), inc=10)
    cdf = np.asarray(models.model_cdf(m, jnp.arange(16), SB))
    assert (cdf[:, 0] == 0).all()
    assert (cdf[:, -1] == 1 << SB).all()
    diffs = np.diff(cdf, axis=1)
    assert (diffs >= 1).all()  # every symbol codable
    # ctx 3: symbols 0 (x2) and 2 (x1) seen -> freq order f0 > f2 > others
    assert diffs[3, 0] > diffs[3, 2] > diffs[3, 1]


def test_rescale_keeps_totals_bounded():
    m = models.model_create(2, 4)
    ctx = jnp.zeros(5000, jnp.int32)
    sym = jnp.asarray(np.random.default_rng(0).integers(0, 4, 5000))
    m = models.model_update(m, ctx, sym, jnp.ones(5000, bool), inc=8)
    total = int(np.asarray(m[0]).sum()) + 4 * models.ALPHA
    assert total <= 1 << models.RAW_CAP_BITS
    cdf = np.asarray(models.model_cdf(m, jnp.asarray([0]), SB))
    assert (np.diff(cdf, axis=1) >= 1).all()


def test_update_invalid_dropped():
    m = models.model_create(4, 3)
    m2 = models.model_update(m, jnp.asarray([1]), jnp.asarray([2]),
                             jnp.asarray([False]))
    np.testing.assert_array_equal(np.asarray(m), np.asarray(m2))


def test_encode_lookup_matches_cdf():
    m = models.model_create(8, 5)
    m = models.model_update(m, jnp.asarray([2, 2, 2]), jnp.asarray([1, 1, 3]),
                            jnp.ones(3, bool))
    cdf = models.model_cdf(m, jnp.asarray([2, 2]), SB)
    f, c = models.cdf_encode_lookup(cdf, jnp.asarray([1, 3]))
    cdf_np = np.asarray(cdf)
    assert int(f[0]) == cdf_np[0, 2] - cdf_np[0, 1]
    assert int(c[0]) == cdf_np[0, 1]
    assert int(f[1]) == cdf_np[1, 4] - cdf_np[1, 3]
