"""In-batch local statistics tests: claim/collision rules, row-update
semantics against a brute-force oracle, and the end-to-end ratio benefit."""
import numpy as np
import jax.numpy as jnp

from fqsqueezer_tpu.ops import kmers, tables
from fqsqueezer_tpu.streams import dna


T0 = 1 << 26   # tags are 27-bit with bit 26 forced (tables.local_keys)


def test_local_insert_query_basic():
    lt = tables.local_create(8)
    cell = jnp.asarray([5, 5, 9], jnp.int32)
    tag = jnp.asarray([T0 | 1, T0 | 1, T0 | 2], jnp.uint32)
    base = jnp.asarray([2, 2, 0], jnp.int32)
    valid = jnp.asarray([True, True, True])
    lt = tables.local_insert(lt, cell, tag, base, valid)
    got = np.asarray(tables.local_query(lt, cell, tag, valid))
    np.testing.assert_array_equal(got[0], [0, 0, 2, 0])
    np.testing.assert_array_equal(got[2], [1, 0, 0, 0])
    # wrong tag on an owned cell: miss, and the insert is dropped
    other = jnp.asarray([T0 | 3], jnp.uint32)
    got2 = np.asarray(tables.local_query(
        lt, jnp.asarray([5]), other, jnp.asarray([True])))
    np.testing.assert_array_equal(got2[0], [0, 0, 0, 0])
    lt2 = tables.local_insert(
        lt, jnp.asarray([5]), other, jnp.asarray([1]), jnp.asarray([True]),
        row=1)
    np.testing.assert_array_equal(np.asarray(lt), np.asarray(lt2))


def test_local_same_batch_claim_is_max_tag():
    """Two different tags claiming one empty cell in the same row: the larger
    tag wins deterministically; the loser inserts nothing. A later row can
    never steal the cell (row priority is encoded in the stamp bits)."""
    lt = tables.local_create(4)
    cell = jnp.asarray([3, 3], jnp.int32)
    tag = jnp.asarray([T0 | 9, T0 | 15], jnp.uint32)
    base = jnp.asarray([1, 2], jnp.int32)
    lt = tables.local_insert(lt, cell, tag, base,
                             jnp.asarray([True, True]))
    assert int(np.asarray(lt)[3, 0]) == (31 << 27) | T0 | 15
    np.testing.assert_array_equal(np.asarray(lt)[3, 1:], [0, 0, 1, 0])
    # row 2 tries a bigger tag: dropped (earliest-row-wins)
    lt = tables.local_insert(lt, jnp.asarray([3], jnp.int32),
                             jnp.asarray([T0 | 99], jnp.uint32),
                             jnp.asarray([0], jnp.int32),
                             jnp.asarray([True]), row=2)
    assert int(np.asarray(lt)[3, 0]) == (31 << 27) | T0 | 15
    np.testing.assert_array_equal(np.asarray(lt)[3, 1:], [0, 0, 1, 0])


def test_local_row_update_matches_bruteforce():
    """local_row_update's events (fwd + rc, per table) must match a
    brute-force dict replay, and queries from a later row must see them."""
    cfg = dna.DnaConfig(siv_len=5, smer_len=7, bmer_len=10, prefix_len=4,
                        n_lanes=4, local_log2_cells=7,  # tiny: collisions
                        local_model_inc=8)  # exercise opt-in model deltas
    rng = np.random.default_rng(7)
    N, L = 4, 24
    eff0 = rng.integers(0, 4, (N, L)).astype(np.int32)
    len0 = rng.integers(12, L + 1, N).astype(np.int32)
    ls = tables.local_create(cfg.local_log2_cells)
    lb = tables.local_create(cfg.local_log2_cells)
    lm = jnp.zeros((dna._n_model_ctx(cfg), dna.A_SYM), jnp.int32)
    ctx0 = rng.integers(0, 1000, (N, L)).astype(np.int32)
    sym0 = rng.integers(0, 5, (N, L)).astype(np.int32)
    act0 = np.arange(L)[None, :] < len0[:, None]
    ls, lb, lm = dna.local_row_update(
        cfg, ls, lb, lm, jnp.asarray(eff0), jnp.asarray(ctx0),
        jnp.asarray(sym0), jnp.asarray(act0), jnp.asarray(len0))

    # brute-force oracle of the s-table (fwd + rc events of row 0)
    m = cfg.local_log2_cells
    k = cfg.smer_len
    e = jnp.asarray(eff0)
    lo, hi = kmers.pack_windows(e, k - 1)
    lo = np.asarray(kmers.shift_right(lo, 1)); hi = np.asarray(kmers.shift_right(hi, 1))
    cf, tf_j = tables.local_keys(jnp.asarray(lo), jnp.asarray(hi), m)
    cf, tf = np.asarray(cf), np.asarray(tf_j)
    rlo, rhi = kmers.pack_windows_rc(e, k - 1)
    cr, tr_j = tables.local_keys(rlo, rhi, m)
    cr, tr = np.asarray(cr), np.asarray(tr_j)
    events = []
    for n in range(N):
        for i in range(k - 1, int(len0[n])):
            events.append((cf[n, i], tf[n, i], int(eff0[n, i])))
            events.append((cr[n, i], tr[n, i], 3 - int(eff0[n, i - k + 1])))
    table = {}
    claims = {}
    for c, t, b in events:  # one-shot claim: max tag per empty cell
        claims[c] = max(claims.get(c, 0), t)
    for c, t in claims.items():
        table[c] = [t, np.zeros(4, np.int32)]
    for c, t, b in events:
        if table[c][0] == t:
            table[c][1][b] += 1

    ls_np = np.asarray(ls)
    for c, (t, cnt) in table.items():
        assert ls_np[c, 0] & int(tables.LOCAL_TAG_MASK) == t
        np.testing.assert_array_equal(ls_np[c, 1:], cnt)
    assert sum(cnt.sum() for _, cnt in table.values()) > 0

    # a later row's queries see row 0's stats
    s_cell, s_tag, s_v = dna._row_query_keys(cfg, jnp.asarray(eff0),
                                             jnp.asarray(len0), k)
    got = np.asarray(tables.local_query(ls, s_cell, s_tag, s_v))
    # query key at position i is the fwd ctx; expected counts from the oracle
    for n in range(N):
        for i in range(k - 1, int(len0[n])):
            e_ = table.get(cf[n, i])
            want = e_[1] if (e_ is not None and e_[0] == tf[n, i]) else np.zeros(4)
            np.testing.assert_array_equal(got[n, i], want)

    # model deltas: 8 per (ctx, sym) at active positions
    lm_np = np.asarray(lm)
    want_lm = {}
    for n in range(N):
        for i in range(int(len0[n])):
            want_lm[(ctx0[n, i], sym0[n, i])] = \
                want_lm.get((ctx0[n, i], sym0[n, i]), 0) + 8
    for (c, s), v in want_lm.items():
        assert lm_np[c, s] == v


def test_locals_improve_inbatch_duplicates():
    """Duplicated reads of prototypes NEVER seen by the global tables must
    compress materially better with local statistics: only in-batch stats
    can know them (batch 1 merely adapts the rank/letters models)."""
    rng = np.random.default_rng(11)
    L, R = 60, 256

    def dup_batch(n_proto):
        proto = rng.integers(0, 4, (n_proto, L))
        return proto[rng.integers(0, n_proto, R)].astype(np.int32)

    warm = dup_batch(8)
    fresh = dup_batch(8)  # disjoint prototypes (random 60-mers never repeat)
    lengths = np.full(R, L, np.int32)

    sizes = {}
    for cells in (0, 14):
        cfg = dna.DnaConfig(siv_len=6, smer_len=9, bmer_len=14, prefix_len=7,
                            n_lanes=64, local_log2_cells=cells)
        st = dna.dna_state_create(cfg)
        _, _, _, st = dna.dna_encode_batch(
            cfg, st, jnp.asarray(warm), jnp.asarray(warm), jnp.asarray(lengths))
        _, n_words, _, _ = dna.dna_encode_batch(
            cfg, st, jnp.asarray(fresh), jnp.asarray(fresh),
            jnp.asarray(lengths))
        sizes[cells] = int(n_words)
    assert sizes[14] < 0.75 * sizes[0], sizes
