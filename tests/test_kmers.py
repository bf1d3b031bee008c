"""Window packing: O(log k) doubling pack must equal the naive shift
register on every valid position (i >= k-1), fwd and rc, across widths."""
import numpy as np
import jax.numpy as jnp

from fqsqueezer_tpu.ops import kmers


def naive_pack(kcodes, k):
    lo = jnp.zeros_like(kcodes, dtype=jnp.uint32)
    hi = jnp.zeros_like(kcodes, dtype=jnp.uint32)
    for d in range(k - 1, -1, -1):
        b = kmers.shift_right(kcodes, d).astype(jnp.uint32)
        hi = (hi << 2) | (lo >> 30)
        lo = (lo << 2) | b
    if k <= 16:
        hi = jnp.zeros_like(hi)
    return lo, hi


def naive_pack_rc(kcodes, k):
    lo = jnp.zeros_like(kcodes, dtype=jnp.uint32)
    hi = jnp.zeros_like(kcodes, dtype=jnp.uint32)
    for d in range(k):
        b = (3 - kmers.shift_right(kcodes, d)).astype(jnp.uint32)
        hi = (hi << 2) | (lo >> 30)
        lo = (lo << 2) | b
    if k <= 16:
        hi = jnp.zeros_like(hi)
    return lo, hi


def test_pack_windows_matches_naive():
    rng = np.random.default_rng(3)
    kc = jnp.asarray(rng.integers(0, 4, (7, 61)).astype(np.int32))
    for k in (1, 2, 3, 5, 8, 12, 13, 16, 17, 20, 21, 24, 31, 32):
        valid = np.arange(61) >= k - 1
        for got, want in ((kmers.pack_windows(kc, k), naive_pack(kc, k)),
                          (kmers.pack_windows_rc(kc, k),
                           naive_pack_rc(kc, k))):
            np.testing.assert_array_equal(
                np.asarray(got[0])[:, valid], np.asarray(want[0])[:, valid],
                err_msg=f"k={k} lo")
            np.testing.assert_array_equal(
                np.asarray(got[1])[:, valid], np.asarray(want[1])[:, valid],
                err_msg=f"k={k} hi")
