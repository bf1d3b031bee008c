"""DNA stream codec: encode -> decode roundtrip with evolving tables."""
import numpy as np
import jax.numpy as jnp

from fqsqueezer_tpu.streams import dna


def _mk_batch(rng, R, L, lengths=None, genome=None):
    """Reads drawn from a small synthetic genome (so k-mer stats matter)."""
    if genome is None:
        genome = rng.integers(0, 4, size=2000)
    if lengths is None:
        lengths = np.full(R, L)
    codes = np.zeros((R, L), np.int32)
    for r in range(R):
        start = rng.integers(0, len(genome) - L)
        codes[r, : lengths[r]] = genome[start : start + lengths[r]]
    # sprinkle N (symbol 4)
    nmask = rng.random((R, L)) < 0.01
    codes = np.where(nmask & (np.arange(L)[None] < lengths[:, None]), 4, codes)
    return codes.astype(np.int32), lengths.astype(np.int32), genome


def test_dna_roundtrip_multibatch():
    cfg = dna.DnaConfig(siv_len=6, smer_len=9, bmer_len=14, prefix_len=7,
                        n_lanes=4, smer_log2_buckets=10, bmer_log2_buckets=10)
    rng = np.random.default_rng(0)
    R, L = 16, 50

    enc_state = dna.dna_state_create(cfg)
    dec_state = dna.dna_state_create(cfg)
    genome = None
    total_words = 0
    for b in range(3):
        lengths = rng.integers(30, L + 1, size=R)
        codes, lengths, genome = _mk_batch(rng, R, L, lengths, genome)
        kcodes = np.where(codes >= 4, 0, codes).astype(np.int32)

        words, n_words, states, enc_state = dna.dna_encode_batch(
            cfg, enc_state, jnp.asarray(codes), jnp.asarray(kcodes),
            jnp.asarray(lengths))
        total_words += int(n_words)

        out, dec_state, fin, ptr, _ = dna.dna_decode_batch(
            cfg, dec_state, jnp.asarray(lengths), words, states, L)
        out = np.asarray(out)
        mask = np.arange(L)[None] < lengths[:, None]
        np.testing.assert_array_equal(np.where(mask, out, 0), np.where(mask, codes, 0))
        assert int(ptr) == int(n_words)
        # decoder returns to fresh-lane states (encoder started at L)
        np.testing.assert_array_equal(np.asarray(fin), np.full(cfg.n_lanes, 1 << 16, np.uint32))
        # encoder/decoder tables must stay identical
        for a, b_ in zip(enc_state, dec_state):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    assert total_words > 0


def test_dna_roundtrip_mix():
    """Two-level model mix (mix_w > 0): exact roundtrip + coarse model sync."""
    cfg = dna.DnaConfig(siv_len=6, smer_len=9, bmer_len=14, prefix_len=7,
                        n_lanes=4, smer_log2_buckets=10, bmer_log2_buckets=10,
                        mix_w=32, mix_b=64)
    rng = np.random.default_rng(7)
    R, L = 16, 50
    enc_state = dna.dna_state_create(cfg)
    dec_state = dna.dna_state_create(cfg)
    # merged model array: coarse family rows live behind the fine rows
    assert enc_state.model.shape[0] == dna._n_model_ctx(cfg) + dna.N_COARSE_CTX
    genome = None
    for b in range(3):
        lengths = rng.integers(30, L + 1, size=R)
        codes, lengths, genome = _mk_batch(rng, R, L, lengths, genome)
        kcodes = np.where(codes >= 4, 0, codes).astype(np.int32)
        words, n_words, states, enc_state = dna.dna_encode_batch(
            cfg, enc_state, jnp.asarray(codes), jnp.asarray(kcodes),
            jnp.asarray(lengths))
        out, dec_state, fin, ptr, _ = dna.dna_decode_batch(
            cfg, dec_state, jnp.asarray(lengths), words, states, L)
        out = np.asarray(out)
        mask = np.arange(L)[None] < lengths[:, None]
        np.testing.assert_array_equal(np.where(mask, out, 0),
                                      np.where(mask, codes, 0))
        assert int(ptr) == int(n_words)
        np.testing.assert_array_equal(
            np.asarray(enc_state.model[dna._n_model_ctx(cfg):]),
            np.asarray(dec_state.model[dna._n_model_ctx(cfg):]))


def test_dna_learning_reduces_size():
    """Later batches of the same genome must compress better than the first."""
    cfg = dna.DnaConfig(siv_len=6, smer_len=9, bmer_len=14, prefix_len=7,
                        n_lanes=4, smer_log2_buckets=12, bmer_log2_buckets=12)
    rng = np.random.default_rng(1)
    R, L = 32, 60
    state = dna.dna_state_create(cfg)
    genome = rng.integers(0, 4, size=1000)
    sizes = []
    for b in range(4):
        codes, lengths, _ = _mk_batch(rng, R, L, np.full(R, L), genome)
        kcodes = np.where(codes >= 4, 0, codes).astype(np.int32)
        words, n_words, states, state = dna.dna_encode_batch(
            cfg, state, jnp.asarray(codes), jnp.asarray(kcodes), jnp.asarray(lengths))
        sizes.append(int(n_words))
    assert sizes[-1] < sizes[0] * 0.8, sizes
