"""Paired-end minimizer machinery: anchor candidates + pair-table events.

TPU re-derivation of the reference's PE advantage (reference
/root/reference/fqs/dna.cpp:880-1136, 1757-1872 and CHT_pair_kmers,
ht_kmer.h:559-663): minimizers of read1's quarters are looked up in a
(minimizer -> partner minimizer) pair table; the first candidate whose
partner value occurs verbatim in read2 gives the decoder a B-base ANCHOR
(B = bmer_len) it can place in read2 before decoding it — those B bases are
never entropy-coded and they seed full-width k-mer context for the rest of
the read. The candidate list is recomputed from DECODED read1 on the decode
side (dna.cpp:1931-2044), so only the candidate id and the anchor position
are transmitted (3 symbols in a dedicated PE stream; nothing at all when
read1 yields no candidates — the decoder knows).

All routines here are pure batch-vectorized math shared verbatim by encoder
and decoder; determinism across the two sides follows from identical inputs
(the pair table is batch-frozen like every other statistic store).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import kmers, tables

N_CAND = 15          # examined candidates; id 15 = no anchor
                     # (reference no_examined_pe_minim=16 with id<15 usable,
                     #  dna.h:84, dna.cpp:1829-1835)
PE_N_CTX = 3         # pe stream model contexts: 0=id, 1=pos lo, 2=pos hi
PE_N_SYM = 256


def value_mask(bmer_len: int):
    bits = 2 * bmer_len
    lo = jnp.uint32(0xFFFFFFFF if bits >= 32 else (1 << bits) - 1)
    hi = jnp.uint32(0 if bits <= 32 else (1 << (bits - 32)) - 1)
    return lo, hi


def _window_info(codes, kcodes, lengths, B):
    """Rolling B-base windows ending at each position.

    Returns (lo, hi, valid, start): valid means the window is complete,
    N-free, inside the read, and passes the minimizer validity filter
    (first 3 symbols not AAA/AAC — is_valid_minimizer, dna.cpp:880-891)."""
    R, L = kcodes.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    lo, hi = kmers.pack_windows(kcodes, B)
    nn = jnp.cumsum((codes >= 4).astype(jnp.int32), axis=1)
    n_in_win = nn - kmers.shift_right(nn, B)          # Ns in [i-B+1, i]
    ok = (pos >= B - 1) & (pos < lengths[:, None]) & (n_in_win == 0)
    if 2 * B > 32:
        first3 = (hi >> (2 * B - 32 - 6)) & jnp.uint32(63)
    else:
        first3 = (lo >> (2 * B - 6)) & jnp.uint32(63)
    ok = ok & (first3 >= 2)                            # not AAA.../AAC...
    return lo, hi, ok, pos - (B - 1)


def _masked_min(lo, hi, mask, inv_lo, inv_hi):
    """Lexicographic (hi, lo) min over the last axis under mask; all-invalid
    reduces to the sentinel (inv_lo, inv_hi) = the value mask, matching the
    reference find_minimizer's 'no minimizer' result (dna.cpp:1002-1027)."""
    h = jnp.where(mask, hi, inv_hi)
    m_hi = jnp.min(h, axis=-1)
    l = jnp.where(mask & (hi == m_hi[..., None]), lo, inv_lo)
    m_lo = jnp.min(l, axis=-1)
    return m_lo, m_hi


def segment_minimizers(codes, kcodes, lengths, B, n_seg):
    """Per-read segment minimizers (reference splits the window-start range
    into quarters for candidates, dna.cpp:1760-1768, and thirds for inserts,
    dna.cpp:1058-1076). Returns (lo, hi) [R, n_seg]."""
    R, L = kcodes.shape
    inv_lo, inv_hi = value_mask(B)
    wlo, whi, ok, start = _window_info(codes, kcodes, lengths, B)
    mss = jnp.maximum(lengths - B + 1, 0)[:, None]     # window starts per read
    outs_lo, outs_hi = [], []
    for k in range(n_seg):
        s0 = k * mss // n_seg
        s1 = mss if k == n_seg - 1 else (k + 1) * mss // n_seg
        m = ok & (start >= s0) & (start < s1)
        mlo, mhi = _masked_min(wlo, whi, m, inv_lo, inv_hi)
        outs_lo.append(mlo)
        outs_hi.append(mhi)
    return jnp.stack(outs_lo, axis=-1), jnp.stack(outs_hi, axis=-1)


def find_candidates(pair_tbl, q_lo, q_hi, B):
    """Top-N_CAND candidates for query minimizers q_lo/q_hi [..., n_seg].

    One bucket-row gather per query, then dedup-by-value (counters merge,
    reference merge_minim_results dna.cpp:906-971) and a stable
    (count desc, value asc) ordering. Returns (c_lo, c_hi, c_cnt)
    [..., N_CAND]; c_cnt == 0 marks an invalid slot."""
    inv_lo, inv_hi = value_mask(B)
    vlo, vhi, cnt = tables.pair_find(pair_tbl, q_lo, q_hi)  # [..., n_seg, S]
    # sentinel queries (no minimizer in segment) contribute nothing
    is_inv = (q_lo == inv_lo) & (q_hi == inv_hi)
    cnt = jnp.where(is_inv[..., None], 0, cnt)
    sh = vlo.shape[:-2]
    M = vlo.shape[-2] * vlo.shape[-1]
    vlo = vlo.reshape(sh + (M,))
    vhi = vhi.reshape(sh + (M,))
    cnt = cnt.reshape(sh + (M,)).astype(jnp.int32)
    # dedup: merge counters into the first occurrence of each value
    eq = (vlo[..., :, None] == vlo[..., None, :]) & \
         (vhi[..., :, None] == vhi[..., None, :])           # [..., M, M]
    idx = jnp.arange(M)
    earlier = (idx[:, None] > idx[None, :])                  # i has j<i equal
    dup = jnp.any(eq & earlier, axis=-1)                     # not first
    merged = jnp.sum(jnp.where(eq, cnt[..., None, :], 0), axis=-1)
    cnt = jnp.where(dup, 0, merged)
    # order: count desc, then (hi, lo) asc; zero-count last
    neg = jnp.where(cnt > 0, (1 << 22) - cnt, 1 << 23)
    order = jnp.lexsort((vlo, vhi, neg), axis=-1)[..., :N_CAND]
    t = lambda a: jnp.take_along_axis(a, order, axis=-1)
    return t(vlo), t(vhi), t(cnt)


def match_in_read2(c_lo, c_hi, c_cnt, codes2, kcodes2, lengths2, B):
    """First candidate whose value occurs as a window of read2, and the
    position of its first occurrence (reference generate_read_bmers + find_if,
    dna.cpp:975-999, 1809-1824). Returns (id [R], pos [R], a_lo, a_hi):
    id == N_CAND means no anchor; a_* is the chosen anchor value."""
    R, L = kcodes2.shape
    wlo, whi, ok, start = _window_info(codes2, kcodes2, lengths2, B)
    eq = (wlo[:, :, None] == c_lo[:, None, :]) & \
         (whi[:, :, None] == c_hi[:, None, :]) & ok[:, :, None] \
         & (c_cnt[:, None, :] > 0)                           # [R, L, NC]
    found = jnp.any(eq, axis=1)                              # [R, NC]
    any_f = jnp.any(found, axis=-1)
    mid = jnp.where(any_f, jnp.argmax(found, axis=-1), N_CAND).astype(jnp.int32)
    col = jnp.take_along_axis(eq, jnp.minimum(mid, N_CAND - 1)[:, None, None],
                              axis=2)[:, :, 0]               # [R, L]
    first_end = jnp.min(jnp.where(col, jnp.arange(L)[None, :], L), axis=1)
    pos = jnp.where(any_f, first_end - (B - 1), 0).astype(jnp.int32)
    g = lambda c: jnp.take_along_axis(
        c, jnp.minimum(mid, N_CAND - 1)[:, None], axis=-1)[:, 0]
    a_lo = jnp.where(any_f, g(c_lo), 0)
    a_hi = jnp.where(any_f, g(c_hi), 0)
    return mid, pos, a_lo, a_hi


def anchor_base(a_lo, a_hi, j, B):
    """Base at offset j (0-based from anchor start) of the packed anchor
    value: earliest base in the most significant bits (kmers.pack_windows
    layout). j is clamped — out-of-range offsets return garbage the caller
    masks."""
    sh = 2 * (B - 1 - jnp.clip(j, 0, B - 1))
    from_lo = ((a_lo >> jnp.minimum(sh, 31).astype(jnp.uint32)) & 3)
    from_hi = ((a_hi >> jnp.maximum(sh - 32, 0).astype(jnp.uint32)) & 3)
    return jnp.where(sh >= 32, from_hi, from_lo).astype(jnp.int32)


def anchor_span_mask(a_start, has_anchor, L, B):
    """[R, L] True inside the preset anchor span [a, a+B)."""
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    return (has_anchor[:, None] & (pos >= a_start[:, None])
            & (pos < (a_start + B)[:, None]))


# insert weights of the cross-mate third-minimizer associations
# (append_pe_mers3, dna.cpp:1058-1136; the weight-1 same-read maximizer
# entries are not replicated — candidates come from cross-mate pairs)
_INS = ((0, 0, 2), (0, 2, 4), (1, 0, 3), (1, 2, 3), (2, 0, 4), (2, 2, 2))


def pair_events(codes, kcodes, lengths, B):
    """Cross-insert (key, value, weight) events for a PE batch: thirds
    minimizers of each mate associated with thirds minimizers of the other.
    codes/kcodes [R, L] with pairs interleaved (even=read1, odd=read2).
    Returns flat (klo, khi, vlo, vhi, w, valid)."""
    m_lo, m_hi = segment_minimizers(codes, kcodes, lengths, B, 3)  # [R, 3]
    inv_lo, inv_hi = value_mask(B)
    r1_lo, r2_lo = m_lo[0::2], m_lo[1::2]                  # [P, 3]
    r1_hi, r2_hi = m_hi[0::2], m_hi[1::2]
    ks, vs, ws = [], [], []
    for a, b, w in _INS:
        # read1 segment a -> read2 segment b, and the mirror image
        ks.append((r1_lo[:, a], r1_hi[:, a]))
        vs.append((r2_lo[:, b], r2_hi[:, b]))
        ws.append(w)
        ks.append((r2_lo[:, a], r2_hi[:, a]))
        vs.append((r1_lo[:, b], r1_hi[:, b]))
        ws.append(w)
    klo = jnp.concatenate([k[0] for k in ks])
    khi = jnp.concatenate([k[1] for k in ks])
    vlo = jnp.concatenate([v[0] for v in vs])
    vhi = jnp.concatenate([v[1] for v in vs])
    w = jnp.concatenate([jnp.full(ks[0][0].shape, wi, jnp.uint32)
                         for wi in ws])
    valid = ~(((klo == inv_lo) & (khi == inv_hi))
              | ((vlo == inv_lo) & (vhi == inv_hi)))
    return klo, khi, vlo, vhi, w, valid


def comp_codes(c):
    """Complement base codes; N (4) stays N."""
    return jnp.where(c >= 4, c, 3 - c)


def expand_pe_rows(codes, lengths, a_start, has, B):
    """Anchored 3-row recoding of an interleaved PE batch (the TPU analog of
    the reference's CompressDirectWithMinim split, dna.cpp:1559-1638):

      row 3q   = read1 (unchanged)
      row 3q+1 = rowA  = read2[a:]        (anchor bases first, then right part)
      row 3q+2 = rowB  = rc(read2[:a+B])  (rc-anchor first, then the left
                                           part reverse-complemented)

    When un-anchored: rowA = read2, rowB empty. The first B positions of
    rowA/rowB of an anchored pair are PRESET from the candidate value (never
    entropy-coded) and give every coded position full k-mer context — no
    cold-start prefix on read2. codes [R, L] interleaved; a_start/has per
    pair [P]. Returns (codes3 [3P, L], lengths3 [3P])."""
    R, L = codes.shape
    P = R // 2
    r1 = codes[0::2]
    r2 = codes[1::2]
    l2 = lengths[1::2]
    a = jnp.where(has, a_start, 0)
    lenA = l2 - a
    lenB = jnp.where(has, jnp.minimum(a + B, l2), 0)
    j = jnp.arange(L, dtype=jnp.int32)[None, :]
    rowA = jnp.take_along_axis(r2, jnp.minimum(j + a[:, None], L - 1), axis=1)
    rowA = jnp.where(j < lenA[:, None], rowA, 0)
    idxB = jnp.clip((a + B)[:, None] - 1 - j, 0, L - 1)
    rowB = comp_codes(jnp.take_along_axis(r2, idxB, axis=1))
    rowB = jnp.where(j < lenB[:, None], rowB, 0)
    codes3 = jnp.stack([r1, rowA, rowB], axis=1).reshape(3 * P, L)
    lengths3 = jnp.stack(
        [lengths[0::2], lenA, lenB], axis=1).reshape(3 * P)
    return codes3, lengths3


def collapse_pe_rows(codes3, lengths, a_start, has, B):
    """Inverse of expand_pe_rows: [3P, L] decoded rows -> [R, L] interleaved
    true reads. lengths: [R] TRUE read lengths."""
    P = codes3.shape[0] // 3
    L = codes3.shape[1]
    r1 = codes3[0::3]
    rowA = codes3[1::3]
    rowB = codes3[2::3]
    l2 = lengths[1::2]
    a = jnp.where(has, a_start, 0)
    i = jnp.arange(L, dtype=jnp.int32)[None, :]
    from_a = jnp.take_along_axis(
        rowA, jnp.clip(i - a[:, None], 0, L - 1), axis=1)
    from_b = comp_codes(jnp.take_along_axis(
        rowB, jnp.clip((a + B)[:, None] - 1 - i, 0, L - 1), axis=1))
    r2 = jnp.where(i >= a[:, None], from_a, from_b)
    r2 = jnp.where(i < l2[:, None], r2, 0)
    R = 2 * P
    return jnp.stack([r1, r2], axis=1).reshape(R, L)


def expand_lengths_mask(R3, L, has, B):
    """[R3, L] anchor-preset mask for expanded rows: positions < B of
    rowA/rowB of anchored pairs."""
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    is_preset_row = jnp.stack(
        [jnp.zeros_like(has), has, has], axis=1).reshape(R3)
    return is_preset_row[:, None] & (pos < B)


def find_anchors(pair_tbl, codes, kcodes, lengths, B):
    """Encoder-side anchor search for a whole interleaved PE batch.

    Returns per-PAIR (cand_any [P], id [P], pos [P], a_lo, a_hi) where
    cand_any distinguishes 'no candidate list' (nothing coded at all,
    reference dna.cpp:1802-1806) from 'list but no match' (id=N_CAND)."""
    q_lo, q_hi = segment_minimizers(
        codes[0::2], kcodes[0::2], lengths[0::2], B, 4)
    c_lo, c_hi, c_cnt = find_candidates(pair_tbl, q_lo, q_hi, B)
    cand_any = jnp.any(c_cnt > 0, axis=-1)
    mid, pos, a_lo, a_hi = match_in_read2(
        c_lo, c_hi, c_cnt, codes[1::2], kcodes[1::2], lengths[1::2], B)
    mid = jnp.where(cand_any, mid, N_CAND)
    return cand_any, mid, pos, a_lo, a_hi
