"""ID stream codec tests: host tokenizer + device symbol-grid round trip.

Capability target: reference CIdCompressor (/root/reference/fqs/id.cpp) —
token templates, numeric deltas with escape magnitudes, instrument prefix.
"""
import numpy as np
import jax.numpy as jnp

from fqsqueezer_tpu.streams import ids


SAMPLE = [
    b"SRR105788.1 1/1",
    b"SRR105788.2 2/1",
    b"SRR105788.3 3/1",
    b"SRR105788.17 17/1",        # +14 delta (1-byte magnitude)
    b"SRR105788.1000 1000/1",    # +983 (2-byte magnitude)
    b"instrument:0042:tile",      # zero-padded fixed-width field
    b"instrument:0043:tile",
    b"totally different id",
    b"",
]


def test_tokenize_detokenize_roundtrip():
    for s in SAMPLE:
        t, v = ids.tokenize_id(s)
        assert ids.detokenize(t, v) == s


def test_zero_padded_width_preserved():
    t, v = ids.tokenize_id(b"run_0042_x")
    assert v == [42]
    assert ids.detokenize(t, [43]) == b"run_0043_x"
    # free-width: no padding
    t2, v2 = ids.tokenize_id(b"run_42_x")
    assert ids.detokenize(t2, [123]) == b"run_123_x"


def test_host_encode_decode_chain_roundtrip():
    R = len(SAMPLE)
    lanes = np.zeros(R, np.int64)     # one chain
    F = ids.count_fields(SAMPLE)
    M = max(len(s) for s in SAMPLE) + 1
    enc_chain = [None]
    flag, dsym, dmag, emat, elens = ids.encode_ids_host(
        SAMPLE, lanes, F, M, enc_chain)
    # ids 2,3 continue the template of id 1 -> delta path
    assert flag[1] == 0 and flag[2] == 0 and flag[3] == 0 and flag[4] == 0
    assert flag[0] == 1 and flag[5] == 1 and flag[7] == 1
    assert flag[6] == 0                      # 0042 -> 0043 fixed-width delta
    dec_chain = [None]
    out = ids.decode_ids_host(flag, dsym, dmag, emat, elens, lanes, dec_chain)
    assert out == SAMPLE


def test_host_codec_file_order_chain():
    n_lanes = 4
    R = 64
    idl = [f"SRR1.{1000 + 7 * r} {r} len=100".encode() for r in range(R)]
    lanes = ids.read_lanes(R, n_lanes)
    F, M = ids.count_fields(idl), 40
    flag, dsym, dmag, emat, elens = ids.encode_ids_host(
        idl, lanes, F, M, [None])
    # file-order chain: only the very first read escapes (per-lane chains
    # paid one escape per lane, plus batch-boundary jump escapes)
    assert int(flag.sum()) == 1
    out = ids.decode_ids_host(flag, dsym, dmag, emat, elens, lanes, [None])
    assert out == idl


def test_device_grid_roundtrip():
    n_lanes = 4
    R = 16
    idl = [f"SIM.{r} {3 * r}".encode() for r in range(R)]
    lanes = ids.read_lanes(R, n_lanes)
    cfg = ids.IdConfig(max_id_len=24, n_fields=2, n_lanes=n_lanes)
    id_np = ids.encode_ids_host(idl, lanes, cfg.n_fields, cfg.max_id_len,
                                [None] * n_lanes)
    model = ids.id_state_create()
    batch = tuple(jnp.asarray(a) for a in id_np)
    words, n_words, states, new_model = ids.id_encode_batch(cfg, model, *batch)
    flag, dsym, dmag, emat, elens, dec_model, _, _ = ids.id_decode_batch(
        cfg, model, R, words, states)
    np.testing.assert_array_equal(np.asarray(flag), id_np[0])
    np.testing.assert_array_equal(np.asarray(dsym), id_np[1])
    np.testing.assert_array_equal(np.asarray(dmag), id_np[2])
    np.testing.assert_array_equal(np.asarray(elens), id_np[4])
    # raw bytes only meaningful where escaped & < elens
    em = np.asarray(emat)
    for r in range(R):
        if id_np[0][r]:
            np.testing.assert_array_equal(em[r, :id_np[4][r]],
                                          id_np[3][r, :id_np[4][r]])
    np.testing.assert_array_equal(np.asarray(new_model),
                                  np.asarray(dec_model))
    out = ids.decode_ids_host(*(np.asarray(a) for a in
                                (flag, dsym, dmag, emat, elens)),
                              lanes, [None] * n_lanes)
    assert out == idl


def test_large_delta_magnitudes():
    cases = [0, 1, -1, 2, -2, 255, 257, -257, 65538, -70000, 1 << 30]
    base = 500_000_000            # 9 digits: numeric-token path
    idl = [f"x.{base}".encode()]
    for d in cases:
        idl.append(f"x.{base + d}".encode())
        idl.append(f"x.{base}".encode())
    lanes = np.zeros(len(idl), np.int64)
    flag, dsym, dmag, emat, elens = ids.encode_ids_host(
        idl, lanes, 1, 16, [None])
    out = ids.decode_ids_host(flag, dsym, dmag, emat, elens, lanes, [None])
    assert out == idl


def test_instrument_prefix():
    idl = [b"M00123:45:ABC.1 x", b"plain", b"a.b.c", b"sp ace"]
    assert ids.instrument_prefix(idl) == [b"M00123", b"plain", b"a", b"sp"]


def _adversarial_corpus(rng, n):
    """Ids exercising every tokenizer edge: counters with decade rollovers,
    zero-padded fields, template switches, >9-digit runs, empty ids,
    >F_CAP fields, leading-zero singletons."""
    out = []
    c = 95
    for i in range(n):
        k = rng.integers(0, 12)
        c += int(rng.integers(1, 3))
        if k < 5:
            out.append(f"SRR105788.{c} {c} length=100".encode())
        elif k == 5:
            out.append(f"RUN_{c:06d}:{int(rng.integers(0, 4))}".encode())
        elif k == 6:
            out.append(b"")
        elif k == 7:
            out.append(f"wide{10**12 + c}end{c}".encode())  # >9-digit run
        elif k == 8:
            out.append(b"plaintext-no-digits")
        elif k == 9:
            out.append(("f" + ".1" * 14).encode())          # > F_CAP fields
        elif k == 10:
            out.append(f"a.0.{c}".encode())                 # "0" singleton
        else:
            out.append(f"SRR105788.{c - 1} {c + 7} length=99".encode())
    return out


def test_vectorized_encode_matches_scalar():
    rng = np.random.default_rng(11)
    F, M = 4, 48
    for lanes_kind in ("single", "mesh"):
        idl = _adversarial_corpus(rng, 400)
        lanes = (np.zeros(400, np.int64) if lanes_kind == "single"
                 else np.arange(400) // 100)
        nlane = 1 if lanes_kind == "single" else 4
        ch_v = [None] * nlane
        ch_s = [None] * nlane
        # two consecutive batches so the chain handoff is exercised
        for lo, hi, nv in ((0, 200, 192), (200, 400, 200)):
            batch = idl[lo:hi]
            ln = lanes[lo:hi] - lanes[lo]
            got = ids.encode_ids_host(batch, ln, F, M, ch_v, n_valid=nv)
            want = ids.encode_ids_host_ref(batch, ln, F, M, ch_s, n_valid=nv)
            for g, w in zip(got, want):
                np.testing.assert_array_equal(g, w)
            assert ch_v == ch_s


def test_vectorized_decode_matches_scalar():
    rng = np.random.default_rng(12)
    F, M = 4, 48
    idl = _adversarial_corpus(rng, 300)
    lanes = np.arange(300) // 150
    enc_chain = [None, None]
    planes = ids.encode_ids_host(idl, lanes, F, M, enc_chain, n_valid=290)
    ch_v = [None, None]
    ch_s = [None, None]
    got = ids.decode_ids_host(*planes, lanes, ch_v, n_valid=290)
    want = ids.decode_ids_host_ref(*planes, lanes, ch_s, n_valid=290)
    assert got == want
    assert ch_v == ch_s
    assert got[:290] == idl[:290]
