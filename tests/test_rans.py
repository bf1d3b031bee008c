"""Exact round-trip properties of the interleaved rANS coder."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fqsqueezer_tpu.ops import rans

SB = 14


def _random_stream(rng, T, N, A):
    """Random symbols with random per-position distributions + padding mask."""
    syms = rng.integers(0, A, size=(T, N))
    raw = rng.integers(1, 50, size=(T, N, A)).astype(np.int64)
    cum = np.cumsum(raw, axis=-1)
    total = cum[..., -1:]
    cdf = np.concatenate([np.zeros_like(cum[..., :1]), cum], axis=-1)
    cdf = (cdf << SB) // total
    freq = np.take_along_axis(cdf, syms[..., None] + 1, axis=-1)[..., 0] - \
        np.take_along_axis(cdf, syms[..., None], axis=-1)[..., 0]
    cumv = np.take_along_axis(cdf, syms[..., None], axis=-1)[..., 0]
    mask = rng.random((T, N)) < 0.85
    freq = np.where(mask, freq, 1 << SB)
    cumv = np.where(mask, cumv, 0)
    return syms, cdf, freq, cumv, mask


@pytest.mark.parametrize("T,N,A", [(7, 4, 5), (40, 16, 5), (64, 8, 96)])
def test_roundtrip_exact(T, N, A):
    rng = np.random.default_rng(42 + T)
    syms, cdf, freq, cumv, mask = _random_stream(rng, T, N, A)

    words, n_words, states = rans.rans_encode(
        jnp.asarray(freq, jnp.uint32), jnp.asarray(cumv, jnp.uint32), SB)
    words, n_words, states = map(np.asarray, (words, n_words, states))

    # decode forward
    x = jnp.asarray(states)
    ptr = jnp.int32(0)
    w = jnp.asarray(words)
    out = np.zeros((T, N), dtype=np.int64)
    for t in range(T):
        slots = rans.rans_decode_slots(x, SB)
        sym, f, c = rans.cdf_lookup(jnp.asarray(cdf[t], jnp.int32), slots)
        m = jnp.asarray(mask[t])
        f = jnp.where(m, f, 1 << SB)
        c = jnp.where(m, c, 0)
        out[t] = np.where(mask[t], np.asarray(sym), syms[t])
        x, ptr = rans.rans_decode_advance(x, ptr, w, f, c, SB)
    np.testing.assert_array_equal(out, syms)
    assert int(ptr) == int(n_words)
    # decoder must return to the encoder's initial states
    np.testing.assert_array_equal(np.asarray(x), np.full(N, rans.RANS_L, np.uint32))


def test_masked_positions_are_free():
    """All-masked grid emits zero words and leaves states at L."""
    T, N = 32, 8
    freq = jnp.full((T, N), 1 << SB, jnp.uint32)
    cum = jnp.zeros((T, N), jnp.uint32)
    words, n_words, states = rans.rans_encode(freq, cum, SB)
    assert int(n_words) == 0
    np.testing.assert_array_equal(np.asarray(states), np.full(N, rans.RANS_L, np.uint32))


def test_state_carry_across_blocks():
    """Lane states chain across blocks: encode block2 then block1 reusing
    states, decode both forward with one stored state vector."""
    rng = np.random.default_rng(7)
    T, N, A = 16, 8, 5
    s1, cdf1, f1, c1, m1 = _random_stream(rng, T, N, A)
    s2, cdf2, f2, c2, m2 = _random_stream(rng, T, N, A)

    w2, n2, st2 = rans.rans_encode(jnp.asarray(f2, jnp.uint32), jnp.asarray(c2, jnp.uint32), SB)
    w1, n1, st1 = rans.rans_encode(jnp.asarray(f1, jnp.uint32), jnp.asarray(c1, jnp.uint32), SB,
                                   init_states=st2)
    stream = np.concatenate([np.asarray(w1)[: int(n1)], np.asarray(w2)[: int(n2)]])

    x = st1
    ptr = jnp.int32(0)
    w = jnp.asarray(stream)
    for t in range(T):
        x, ptr = rans.rans_decode_advance(
            x, ptr, w, jnp.asarray(f1[t], jnp.uint32), jnp.asarray(c1[t], jnp.uint32), SB)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(st2))
    for t in range(T):
        x, ptr = rans.rans_decode_advance(
            x, ptr, w, jnp.asarray(f2[t], jnp.uint32), jnp.asarray(c2[t], jnp.uint32), SB)
    assert int(ptr) == len(stream)

def test_pallas_kernel_matches_scan():
    """The Pallas encode kernel (interpret mode on CPU) must produce the
    identical (words, n_words, states) as the lax.scan reference path,
    including chunk padding (T not a multiple of _PALLAS_CHUNK) and masked
    no-op rows. Guards against Mosaic-only lowering breaks (e.g. the
    uint32<->float32 cast gap) diverging from the tested scan semantics."""
    if not rans._HAVE_PALLAS:
        pytest.skip("pallas unavailable")
    rng = np.random.default_rng(11)
    T, N, A = 300, 128, 8  # T straddles a 256-chunk boundary; N % 128 == 0
    syms, cdf, freq, cumv, mask = _random_stream(rng, T, N, A)
    f = jnp.asarray(freq, jnp.uint32)
    c = jnp.asarray(cumv, jnp.uint32)
    init = rans.rans_initial_states(N)

    def scan_path(f, c):
        def step(x, inp):
            ff, cc = inp
            emit = (x >> (32 - SB)) >= ff
            word = x & rans.WORD_MASK
            x = jnp.where(emit, x >> rans.WORD_BITS, x)
            q = x // ff
            r = x - q * ff
            return (q << SB) + cc + r, (word, emit)
        return jax.lax.scan(step, init, (f, c), reverse=True)

    x_ref, (w_ref, e_ref) = scan_path(f, c)
    w_pl, e_pl, x_pl = rans._rans_encode_pallas(f, c, SB, init, interpret=True)
    np.testing.assert_array_equal(np.asarray(w_pl), np.asarray(w_ref))
    np.testing.assert_array_equal(np.asarray(e_pl), np.asarray(e_ref))
    np.testing.assert_array_equal(np.asarray(x_pl), np.asarray(x_ref))
