"""DNA stream codec: k-mer-statistics modeling + interleaved rANS.

TPU-native re-derivation of the reference CDNACompressor
(/root/reference/fqs/dna.cpp) — see DESIGN.md. The method is the same:
per-base next-symbol counts are gathered from a cascade of k-mer counter
stores (b-mer hash table -> +s-mer when ambiguous -> s-mer -> p-mer SIV,
reference find_counts dna.cpp:457-502), the actual base is coded as its RANK
among count-sorted candidates (dna.cpp:177-207), the rank probability comes
from an adaptive model conditioned on quantized sorted counts + cascade level
+ position + rank history (code_ctx.cpp:242-324), and a literal "letters"
model covers the read prefix and positions with no counts (code_ctx.cpp:465-484).

The execution model is inverted for TPU:
  * ENCODE: with batch-frozen tables, every position's context and (freq, cum)
    is computed in ONE fully-vectorized pass over the [reads, positions] batch
    (gathers + integer VPU ops, no sequential dependence); bit emission is a
    cheap reverse scan over lane states.
  * DECODE: a forward `lax.scan` over (read-in-lane, position) steps, wide over
    N lanes; rolling k-mer context registers are carried as uint32 shift
    registers (the reference's CKmer sliding update, kmer.h, becomes a lane
    vector op).
  * TABLE/MODEL UPDATES: one shared `collect_updates` routine is applied to the
    plaintext (encoder) or decoded (decoder) batch, so both sides evolve
    identical statistics — the TPU analog of the reference's deterministic
    barrier-synced deferred inserts (application.cpp:643-655, dna.cpp:2393).

Symbols: A,C,G,T,N = 0..4. N maps to A (0) inside k-mer keys (kcodes) but is
coded as rank/letters symbol 4.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import kmers, models, rans, tables
from . import common

A_SYM = 5                 # alphabet: 4 ranks/bases + N
# fine code-context width. v2 (cfg.ctx_v >= 2) appends one field to the
# 20-bit v1 layout: the previous position's cascade-level class (2 bits,
# bits 20-21; 0 = letters, 1 = pmer-only, 2 = s/b evidence). The class
# separates real low-level evidence (s/b-covered neighborhood) from
# spurious short-context genome collisions — our pmer-level positions
# mis-rank 36% of coded bases precisely because the two populations
# shared one context. Offline pricing of the dumped (ctx, sym) stream on
# the DNA-only SE corpus (sequential alpha=1 estimator): 202.5 KB ->
# 196.0 KB. A cor_zone analog (reference dna.cpp:741) was also measured:
# the CAUSAL variant (only repairs strictly before the position — all a
# decoder can know) gained nothing on top (196.5 KB); the apparent win of
# the acausal variant (187.9 KB) was leakage of the current position's
# own repair flag. Not adopted.
CODE_CTX_BITS = 22
CODE_CTX_BITS_V1 = 20
# rough-evidence layout (cfg.rough): the level field widens to 3 bits to
# fit the RSMER rough level, shifting every later field up one bit
CODE_CTX_BITS_ROUGH = 23
LET_CTX_BITS = 19
N_MODEL_CTX = (1 << CODE_CTX_BITS) + (1 << LET_CTX_BITS)


def _ctx_bits(cfg) -> int:
    if cfg.rough:
        return CODE_CTX_BITS_ROUGH
    return CODE_CTX_BITS if cfg.ctx_v >= 2 else CODE_CTX_BITS_V1


def _n_model_ctx(cfg) -> int:
    return (1 << _ctx_bits(cfg)) + (1 << LET_CTX_BITS)
LET_SENTINEL = 5          # "before start of read" letter history filler
LH_MASK = (1 << 15) - 1
LH_RESET = 0b101_101_101_101_101  # five sentinel-5 slots

# count quantization thresholds (coarse analog of convert_lev_* quantizers,
# code_ctx.cpp:26-239)
_Q0 = (1, 2, 3, 4, 5, 6, 8, 10, 13, 16, 24, 32, 48, 64, 128)   # 4 bits
_Q1 = (1, 2, 3, 4, 6, 8, 16)                                     # 3 bits
_Q23 = (1, 2, 4)                                                 # 2 bits

LEVEL_NONE, LEVEL_PMER, LEVEL_SMER, LEVEL_MIXED, LEVEL_BMER = 0, 1, 2, 3, 4
# rough 1-substitution s-mer evidence (cfg.rough): evidence-wise between
# PMER and SMER, numbered past BMER so the existing >= comparisons (repair
# triggers, which see only the DIRECT cascade) stay untouched
LEVEL_RSMER = 5

# coarse (parent) contexts for the two-level model mix (models.model_cdf_mix):
# code branch keeps (level, q0, q1) = 9 bits; letters branch keeps the
# previous 2 letters + position bucket = 10 bits. Richer coarse contexts
# (q2/q3, a third letter) were measured WORSE on the standard corpus
# (1,537,710 vs 1,535,066 DNA bytes at w=b=2048): the parent must stay
# coarse enough to be mature everywhere.
N_COARSE_CODE = 1 << 9
N_COARSE_CTX = N_COARSE_CODE + (1 << 10)
# rough layout: the coarse code context keeps (level, q0, q1) like v2, but
# the 3-bit level field makes it 10 bits
N_COARSE_CODE_ROUGH = 1 << 10
N_COARSE_CTX_ROUGH = N_COARSE_CODE_ROUGH + (1 << 10)


def _n_coarse_ctx(cfg) -> int:
    return N_COARSE_CTX_ROUGH if cfg.rough else N_COARSE_CTX


def _coarse_ctx(cfg, ctx_all):
    """Derive the coarse context from the packed fine context (same bit
    layout as _code_ctx / _letters_plane, so no extra plumbing; the v2
    fields at bits 20-23 stay out of the coarse parent by construction)."""
    is_let = ctx_all >= (1 << _ctx_bits(cfg))
    if cfg.rough:
        code_c = ctx_all & 0x3FF                   # lev3 | q0<<3 | q1<<7
        n_code = N_COARSE_CODE_ROUGH
    else:
        code_c = ctx_all & 0x1FF                   # level | q0<<2 | q1<<6
        n_code = N_COARSE_CODE
    let_c = (ctx_all & 0x3F) | (((ctx_all >> 15) & 0xF) << 6)
    return jnp.where(is_let, n_code + let_c, code_c)

# k-mer repair (reference repair_kmers_existing/missing, dna.cpp:333-454):
# when the actual base is unseen in a confident context, the rolling k-mer
# registers carry the most-likely base instead, so one sequencing error does
# not poison the next k positions' lookups. MAX_REPAIRS bounds the encoder's
# committed-repair iterations AND the decoder's per-read repair budget, so
# both sides apply the identical greedy left-to-right rule.
MAX_REPAIRS = 3
REPAIR_MIN_COUNT = 2

# Decode inner-scan unroll: every scan step is tiny ([n_lanes] vectors = a
# handful of VREGs), so the XLA while-loop's fixed per-iteration cost (loop
# bookkeeping, fusion boundaries around the table gathers) is a real tax on
# L*r_pl thin steps. Unrolling U positions per iteration is bit-identical —
# the same op sequence with fewer loop trips — at U x body compile size.
DECODE_UNROLL = int(os.environ.get("FQTZ_DECODE_UNROLL", "4"))


@dataclasses.dataclass(frozen=True)
class DnaConfig:
    siv_len: int = 13
    smer_len: int = 15
    bmer_len: int = 26
    prefix_len: int = 14
    scale_bits: int = 14
    n_lanes: int = 1024
    smer_log2_buckets: int = 20
    bmer_log2_buckets: int = 20
    # in-batch local s/b-mer tables (reference ht_*_local, dna.cpp:95-107);
    # 0 disables. See ops/tables.py local_* and the row-synced machinery
    # below.
    local_log2_cells: int = 22
    # in-batch model-delta increment (0 disables model deltas; measured a
    # net ratio LOSS on the standard corpus — see params.py)
    local_model_inc: int = 0
    # PE minimizer pair table (reference CHT_pair_kmers, ht_kmer.h:559-663);
    # 0 disables the anchor machinery (SE modes, and the mesh path for now)
    pe_log2_buckets: int = 0
    # two-level model mix (models.model_cdf_mix): coarse pseudo-count budget
    # at t_fine=0 (0 disables) and its fade constant
    mix_w: int = 0
    mix_b: int = 64
    # sorted-mode LCP-distance position bucket (_pos_bucket_sorted)
    sorted_ctx: bool = False
    # greedy repair iterations (encoder) == per-read repair budget (decoder);
    # each encoder iteration is one full s+b window pass over the batch
    repair_iters: int = MAX_REPAIRS
    # global-table update protocol (tables.table_update): 0 = fused
    # 3-pass probe+claim+delta, >=1 = legacy claim rounds
    claim_rounds: int = 2
    # in-batch local insert protocol (tables.local_insert): True = 2-pass
    # (no ownership gather; deterministic collision pollution)
    local_lite: bool = False
    # insert the reverse-complement strand into the in-batch local tables
    # (the global tables always take both strands)
    local_rc: bool = True
    # pmer-level position gate: SIV evidence enters the cascade only at
    # positions < pmer_gate (0 = no gate). Motivated by the reference's
    # lev:1 contexts firing almost only in the read-prefix zone (ctx.log at
    # -v 2, pos 10-14) — but measured a NET LOSS here (standard corpus DNA:
    # ungated 1,535,058; gate 18/22/28/40 → 1,547,420/1,547,626/1,546,644/
    # 1,544,606): the count-profile-conditioned rank model already prices
    # weak mid-read SIV evidence correctly (avg 1.74 b < the 2.02 b letters
    # floor), so dropping it loses information. Kept as an archive-header
    # knob for real-data re-evaluation; default off.
    pmer_gate: int = 0
    # read-prefix partial-SIV ramp (_prefix_ramp): positions
    # [prefix_len, siv_len-2] — before a full SIV window exists — get
    # cascade counts from contiguous range sums over the dense SIV, the
    # analog of the reference's partial-kmer pmer queries
    # (find_counts_p, dna.cpp:210-226; bit_vec.h test_shorter). Those
    # positions otherwise code pure letters at the 2-bit floor.
    prefix_ramp: bool = False
    # canonical-strand s/b-mer tables (tables.ktable_*): one insert event
    # per k-mer occurrence covers both strands (the reference's kernel
    # canonicalization, kmer.h:199-207) — halves the table-update event
    # count, the largest block of the encode profile. Decode-affecting
    # (cell layout + statistics), stored in the archive header.
    canon: bool = False
    # row-global updates (round 3): the GLOBAL s/b-mer tables evolve at read
    # row granularity inside the batch — the row scan carries them and each
    # row's insert events apply at its boundary — replacing the separate
    # in-batch local tables (local_log2_cells) entirely. Same statistics
    # freshness as the reference's ht_*_local + barrier-synced global
    # inserts (dna.cpp:95-107, 2393-2472), with one table instead of two:
    # profiling showed the local-table machinery (klocal queries + row
    # inserts) was the single largest block of BOTH the encode modeling
    # pass (~157 of 206 ms/batch) and the decode scan (~170 of 247 ms).
    # Repair runs per row against the row-fresh tables on both sides.
    # Decode-affecting (statistics + repair decisions), in the header.
    row_global: bool = False
    # PE-aware position contexts for the anchored 3-row recoding
    # (reference compress_suffix: rowA codes from start_pos = anchor + B in
    # TRUE read2 coordinates, dna.cpp:1595; the reversed rowB conditions on
    # the position counted back toward read2's start and never sees an
    # end-of-read flag, determine_ctx_codes(size - i - 1, ..., ~0u),
    # dna.cpp:745-755). Off = expanded rows pretend to be fresh reads.
    # Decode-affecting, in the header (params.dna_pe_pos_ctx).
    pe_pos_ctx: bool = False
    # code-context layout version (see CODE_CTX_BITS note); decode-affecting
    ctx_v: int = 1
    # suspect-tracked 1-substitution s-mer miss evidence (round 5; the TPU
    # answer to the reference's find_counts_rough_s, dna.cpp:257-292): when
    # the s/b levels both miss, the likely error position is the context
    # base that entered the window when the current miss streak began — a
    # streak-age register both sides carry deterministically. The 4
    # substitutions of that ONE position are probed in the existing
    # canonical s-table (O(4) finds; no new table, no insert traffic) and
    # their summed counts become the RSMER cascade level. Offline pricing
    # (tools/study_rough.py): -68.5 KB of the +78 KB pmer-level gap, 98.3%
    # rank-0 among rescued positions. Decode-affecting; requires
    # row_global + canon + ctx_v >= 2 (gated in make_configs).
    rough: int = 0
    # s/b-mer table update protocol (canon tables only): 0 = u16 slot
    # counters, 3 engine passes per update; 1 = K2 single-word cells
    # (tag24|cnt8), ONE gather + ONE scatter-max per update — see
    # tables.k2_update. Decode-affecting (cell layout + duplicate-count
    # semantics), stored in the archive header (params.dna_sb_proto).
    sb_proto: int = 0
    # owner-routed mesh update exchange (sharded.sb_routed_updates): events
    # filter+compact to their tp owner range BEFORE the dp gather. Mesh
    # paths only; bit-identical to the replicated exchange except past the
    # 2x route cap (deterministic drop, hence in the header).
    route_sb: int = 0
    # coarse letters-branch position bucket (round 5): the letters contexts
    # keep only pb>>2 (4 position classes) instead of the 16-bucket pb —
    # fewer contexts mature faster where the signal is the letter history,
    # not the exact position. Offline pricing (tools/study_letters.py,
    # sequential Laplace on the real letters-branch stream): -11.5 KB on
    # the standard corpus; LONGER histories all priced WORSE (order-6
    # +33 KB, order-9 +150 KB — context thinning dominates), so the
    # reference's order-9 letters depth (code_ctx.cpp:465-484) is NOT the
    # right trade here. Decode-affecting; legacy archives decode with 0.
    let_pb2: int = 0


# position-bucket "length" for rowB under pe_pos_ctx: large enough that the
# end-of-read buckets (rem <= 4) can never trigger (the reference's ~0u)
_PE_NO_END = 1 << 20


def _pe_pos_map(lengths, a_start, has, lenB, B):
    """(off, sign, plen) per EXPANDED row for pe_pos_ctx position buckets:
    read1 rows keep true coordinates, rowA offsets by the anchor start into
    read2's frame, rowB counts back toward read2's start (no end flag)."""
    L1, L2 = lengths[0::2], lengths[1::2]
    a = jnp.where(has, a_start, 0)
    z = jnp.zeros_like(L1)
    one = jnp.ones_like(L1)
    off3 = jnp.stack([z, a, lenB - 1], axis=1).reshape(-1)
    sign3 = jnp.stack([one, one, -one], axis=1).reshape(-1)
    plen3 = jnp.stack(
        [L1, L2, jnp.full_like(L1, _PE_NO_END)], axis=1).reshape(-1)
    return off3, sign3, plen3


class DnaState(NamedTuple):
    siv: jax.Array
    s_tc: jax.Array   # interleaved (tags | packed counts) rows, tables.py
    b_tc: jax.Array
    # [N_MODEL_CTX (+ N_COARSE_CTX if cfg.mix_w > 0), A_SYM]: the coarse
    # parent family lives BEHIND the fine rows in the same array, so a mix
    # lookup fetches both rows in ONE gather and a batch update applies
    # both families' events in ONE scatter (models.model_cdf_mix)
    model: jax.Array
    # PE anchor state: (pair tags, vlo, vhi, cnt, pe stream model) or None
    pe: tuple | None = None


def dna_state_create(cfg: DnaConfig) -> DnaState:
    pe_state = None
    if cfg.pe_log2_buckets > 0:
        from . import pe as _pe

        pe_state = tables.pair_create(cfg.pe_log2_buckets) + (
            models.model_create(_pe.PE_N_CTX, _pe.PE_N_SYM),)
    if cfg.canon:
        mk = tables.k2_create if cfg.sb_proto else tables.ktable_create
    else:
        mk = tables.table_create
    n_model = _n_model_ctx(cfg) + (_n_coarse_ctx(cfg) if cfg.mix_w > 0
                                   else 0)
    return DnaState(
        siv=tables.siv_create(cfg.siv_len),
        s_tc=mk(cfg.smer_log2_buckets),
        b_tc=mk(cfg.bmer_log2_buckets),
        model=models.model_create(n_model, A_SYM),
        pe=pe_state,
    )


# ---------------------------------------------------------------------------
# shared modeling math (shape-agnostic: works on [R, L] or [N])
# ---------------------------------------------------------------------------

def _quant(v, thresholds):
    q = jnp.zeros_like(v)
    for t in thresholds:
        q = q + (v >= t).astype(v.dtype)
    return q


def _pos_bucket(i, length):
    """4-bit position bucket: exact-ish early, /16 mid, end-of-read flagged
    (analog of the reference position context, code_ctx.cpp:281-287)."""
    rem = length - i
    mid = jnp.minimum(6 + (i - 24) // 16, 13)
    early = i // 4
    pb = jnp.where(i < 24, early, mid)
    pb = jnp.where(rem <= 4, 14, pb)
    pb = jnp.where(rem <= 2, 15, pb)
    return pb


def _pos_bucket_sorted(pb, i, length, lcp):
    """Sorted-mode position bucket (cfg.sorted_ctx): distance past the shared
    prefix instead of absolute position. In sorted order the strongest signal
    at a coded position is how far past the predecessor's LCP it sits (the
    reference's prefix_sorted contexts condition on the same quantity,
    code_ctx.cpp determine_ctx_codes sorted variant / dna.cpp:2029-2105);
    absolute position adds little once reads are prefix-clustered. Same
    4-bit budget, so the model layout is unchanged — the override is gated
    by the archive header (params.dna_sorted_ctx) and replayed identically
    by the decoder."""
    d = jnp.minimum(i - lcp, 13)
    rem = length - i
    pbs = jnp.where(rem <= 2, 15, jnp.where(rem <= 4, 14, jnp.maximum(d, 0)))
    return jnp.where(lcp > 0, pbs, pb)


def _cascade_parts(state: DnaState, pm_ctx, s_lo, s_hi, b_lo, b_hi, vp, vs, vb,
                   be=tables.LOCAL, s_log2b=-1, b_log2b=-1):
    """Raw per-level finds of the count cascade (reference find_counts,
    dna.cpp:457-502). Returns (cp, cs, cb [..., 4] int32, fp, fs, fb bool).
    s_log2b/b_log2b: CREATION bucket sizes (tables may have grown since)."""
    cp = be.siv_find(state.siv, pm_ctx)
    cs, fs = be.table_find(state.s_tc, s_lo, s_hi, s_log2b)
    cb, fb = be.table_find(state.b_tc, b_lo, b_hi, b_log2b)
    fp = vp & (jnp.sum(cp, axis=-1) > 0)
    return cp, cs, cb, fp, fs & vs, fb & vb


_SLOT_MASK = jnp.uint32(0xF)


def _canon_query(c_lo, c_hi, r_lo, r_hi, k: int, log2_cells: int):
    """Canonical 4-candidate query keys for the width-k k-mer table
    (tables.ktable_find). c = fwd context K[0:k-1] (packed, earliest base
    most significant), r = rc(c). Returns (bkt [...], tags4 [..., 4],
    strand [...], mid_lo, mid_hi, c0 [...]) — the tail fields let the
    in-batch local table derive its own keys without recomputing the
    canonical strand (see _klocal_slots).

    Cell tag = (middle hash & ~0xF) | end-letter slot: (middle, first,
    last) determines the k-mer exactly, so packing the canonical end
    letters into the tag's low nibble replaces the per-candidate full-kmer
    hash (4 hash chains per table per decode-scan step — the scan is
    VPU-op-bound, profile_scan.py) with ONE middle hash + 4 ORs. The
    growth bits [23, 27) land inside the middle hash, so they stay
    mid-derived and kbucket_of keeps candidates co-bucketed after regrows
    for free."""
    s, m_lo, m_hi = kmers.canon_strand(c_lo, c_hi, r_lo, r_hi, k)
    bkt = kmers.hash_bucket(m_lo, m_hi, log2_cells)
    mt = kmers.hash_tag(m_lo, m_hi) & ~_SLOT_MASK
    c0 = kmers.top_base(c_lo, c_hi, k - 1)
    tags4 = mt[..., None] | _klocal_slots(s, c0).astype(jnp.uint32)
    return bkt, tags4, s, m_lo, m_hi, c0


def _klocal_slots(s, c0):
    """[..., 4] canonical (first, last)-letter slots of the 4 next-base
    candidates: slot = 4*first + last with (first, last) = (c0, b) on the
    fwd strand and (3-b, 3-c0) on the rc strand."""
    b4 = jnp.arange(4, dtype=jnp.int32)
    return jnp.where(s[..., None], 4 * (3 - b4) + (3 - c0)[..., None],
                     4 * c0[..., None] + b4)


def _canon_insert(c_lo, c_hi, r_lo, r_hi, base, k: int, log2_cells: int):
    """(bkt, tag) of the canonical full k-mer c·base — ONE event per
    occurrence covers both strands (reference kernel canonicalization).
    Tag = mid-hash | canonical end-letter slot, matching _canon_query."""
    s, m_lo, m_hi = kmers.canon_strand(c_lo, c_hi, r_lo, r_hi, k)
    bkt = kmers.hash_bucket(m_lo, m_hi, log2_cells)
    mt = kmers.hash_tag(m_lo, m_hi) & ~_SLOT_MASK
    b = base.astype(jnp.int32)
    c0 = kmers.top_base(c_lo, c_hi, k - 1)
    slot = jnp.where(s, 4 * (3 - b) + (3 - c0), 4 * c0 + b)
    return bkt, mt | slot.astype(jnp.uint32)


def _cascade_parts_k(state: DnaState, pm_ctx, s_q, b_q, vp, vs, vb,
                     be=tables.LOCAL, s_log2b=-1, b_log2b=-1):
    """_cascade_parts over canonical k-mer tables: s_q/b_q from
    _canon_query (only the (bkt, tags4) head is used here)."""
    cp = be.siv_find(state.siv, pm_ctx)
    cs, fs = be.ktable_find(state.s_tc, s_q[0], s_q[1], s_log2b)
    cb, fb = be.ktable_find(state.b_tc, b_q[0], b_q[1], b_log2b)
    fp = vp & (jnp.sum(cp, axis=-1) > 0)
    return cp, cs, cb, fp, fs & vs, fb & vb


def _cascade_combine(cp, cs, cb, fp, fs, fb):
    """Collapse per-level finds into (counts [..., 4], level [...])."""
    nzb = jnp.sum((cb > 0).astype(jnp.int32), axis=-1)
    mixed = fb & (nzb > 1)
    counts = jnp.where(
        fb[..., None], cb + jnp.where(mixed[..., None], cs, 0),
        jnp.where(fs[..., None], cs, jnp.where(fp[..., None], cp, 0)))
    level = jnp.where(
        fb, jnp.where(mixed, LEVEL_MIXED, LEVEL_BMER),
        jnp.where(fs, LEVEL_SMER, jnp.where(fp, LEVEL_PMER, LEVEL_NONE)))
    return counts, level


def _rough_counts(cfg, be, s_tc, lo, hi, rlo, rhi, age, valid):
    """Summed s-table counts of the 4 single-base substitutions at context
    offset `age` (TPU rederivation of find_counts_rough_s, reference
    dna.cpp:257-292, restricted to the ONE suspect position — see
    DnaConfig.rough). lo/hi: (smer_len-1)-base context windows (newest
    base in the low bits), rlo/rhi their reverse complements, age: [...]
    int32 suspect offsets in [0, smer_len-2] (clipped by the caller),
    valid: [...] bool. Returns [..., 4] int32 counts clipped to 255.

    The probe whose substitution equals the original base would re-query
    the direct (missed) s-mer and contribute zeros, so only the 3 true
    neighbors are probed: per lane, probe k substitutes j_k = k + (k >=
    original base) — 3 row gathers per position."""
    w = cfg.smer_len - 1
    a2 = (2 * age).astype(jnp.uint32)                 # fwd bit offset
    d2 = (2 * (w - 1 - age)).astype(jnp.uint32)       # rc bit offset
    a2l = jnp.minimum(a2, 31)
    a2h = jnp.where(a2 >= 32, a2 - 32, 0)
    d2l = jnp.minimum(d2, 31)
    d2h = jnp.where(d2 >= 32, d2 - 32, 0)
    fwd_lo = a2 < 32
    rc_lo = d2 < 32
    orig = jnp.where(fwd_lo, lo >> a2l, hi >> a2h) & jnp.uint32(3)
    acc = jnp.zeros(lo.shape + (4,), jnp.int32)
    for k in range(3):
        ju = jnp.uint32(k) + (jnp.uint32(k) >= orig).astype(jnp.uint32)
        cj = jnp.uint32(3) - ju
        lo_j = jnp.where(fwd_lo,
                         (lo & ~(jnp.uint32(3) << a2l)) | (ju << a2l), lo)
        hi_j = jnp.where(fwd_lo, hi,
                         (hi & ~(jnp.uint32(3) << a2h)) | (ju << a2h))
        rlo_j = jnp.where(rc_lo,
                          (rlo & ~(jnp.uint32(3) << d2l)) | (cj << d2l), rlo)
        rhi_j = jnp.where(rc_lo, rhi,
                          (rhi & ~(jnp.uint32(3) << d2h)) | (cj << d2h))
        q = _canon_query(lo_j, hi_j, rlo_j, rhi_j, cfg.smer_len,
                         cfg.smer_log2_buckets)
        c, _ = be.ktable_find(s_tc, q[0], q[1], cfg.smer_log2_buckets)
        acc = acc + c
    return jnp.minimum(jnp.where(valid[..., None], acc, 0), 255)


def _combine_rough(counts, level, cr, fr):
    """Fold rough 1-sub evidence into a combined cascade result: it ranks
    above SIV/none and below direct s/b evidence."""
    use = fr & (level <= LEVEL_PMER)
    counts = jnp.where(use[..., None], cr, counts)
    level = jnp.where(use, LEVEL_RSMER, level)
    return counts, level


def _miss_age(miss, pos):
    """[.., L] suspect age per position from the consecutive-miss run
    length: age = pos - (last non-miss position) - 1, vectorized with a
    cummax along the read axis — identical to the decoder's carried
    streak-age register."""
    last_hit = jax.lax.cummax(jnp.where(miss, -1, pos), axis=miss.ndim - 1)
    return pos - last_hit - 1


def _merge_local(parts, cs_l, cb_l):
    """Fold in-batch local s/b counts into the cascade parts (the reference
    consults ht_*_local alongside the globals in the find cascade,
    dna.h:218-228): counts add, found-ness ORs."""
    cp, cs, cb, fp, fs, fb = parts
    if cs_l is None:
        return parts
    fs = fs | (jnp.sum(cs_l, axis=-1) > 0)
    fb = fb | (jnp.sum(cb_l, axis=-1) > 0)
    return cp, cs + cs_l, cb + cb_l, fp, fs, fb


def _lookup_counts(state: DnaState, pm_ctx, s_lo, s_hi, b_lo, b_hi, vp, vs, vb,
                   be=tables.LOCAL, cs_l=None, cb_l=None):
    """Count cascade with optional local-table merge.
    Returns (counts [..., 4] int32, level [...] int32)."""
    parts = _cascade_parts(state, pm_ctx, s_lo, s_hi, b_lo, b_hi, vp, vs, vb, be)
    return _cascade_combine(*_merge_local(parts, cs_l, cb_l))


def _rank_all(counts):
    """[..., 4] rank of each base under (count desc, base asc) ordering
    (deterministic analog of sort_copy_stats + rank, utils.cpp:109-126,
    dna.cpp:177-207)."""
    c = counts
    gt = (c[..., None, :] > c[..., :, None]).astype(jnp.int32)  # [b, b'] c[b']>c[b]
    eq = (c[..., None, :] == c[..., :, None]).astype(jnp.int32)
    lower = jnp.tril(jnp.ones((4, 4), jnp.int32), k=-1)  # b' < b
    return jnp.sum(gt + eq * lower, axis=-1)


def _rank_of(counts, sym):
    """Rank of symbol (N -> 4). Masked sum over the 4-wide axis instead of
    take_along_axis: a take_along lowers to a per-element gather, and the
    decode scan is gather-event bound (see rans.cdf_lookup)."""
    ranks = _rank_all(counts)
    s4 = jnp.minimum(sym, 3)[..., None]
    r = jnp.sum(jnp.where(jnp.arange(4) == s4, ranks, 0), axis=-1)
    return jnp.where(sym >= 4, 4, r)


def _base_of_rank(counts, r):
    """Inverse of _rank_of (rank 4 -> N)."""
    ranks = _rank_all(counts)
    base = jnp.sum(jnp.arange(4) * (ranks == r[..., None]).astype(jnp.int32), axis=-1)
    return jnp.where(r >= 4, 4, base)


def _code_ctx(level, counts, pb, nz_hist, prevc=None, rough: bool = False):
    """Pack the count-conditioned context (analog of determine_ctx_codes
    bit-fields, code_ctx.cpp:257-324, single level — the reference's 7-level
    hierarchy is replaced by direct indexing + smoothing). v2 (prevc not
    None) appends the previous-position level class (see CODE_CTX_BITS
    note). The rough layout widens the level field to 3 bits (RSMER maps
    to field value 4), shifting every later field up one bit. Adding
    let_max (lv5's most-likely-base identity) was measured WORSE on the
    benchmark corpus (+4KB DNA): context splitting beats its signal."""
    cs = jnp.sort(counts, axis=-1)[..., ::-1]
    if rough:
        lf = jnp.where(level == LEVEL_RSMER, 4, level - 1).astype(jnp.int32)
        ctx = lf
        ctx = ctx | (_quant(cs[..., 0], _Q0) << 3)
        ctx = ctx | (_quant(cs[..., 1], _Q1) << 7)
        ctx = ctx | (_quant(cs[..., 2], _Q23) << 10)
        ctx = ctx | (_quant(cs[..., 3], _Q23) << 12)
        ctx = ctx | (pb << 14)
        ctx = ctx | (jnp.minimum(nz_hist, 4) << 18)
        if prevc is not None:
            ctx = ctx | (prevc << 21)
        return ctx
    ctx = (level - 1).astype(jnp.int32)
    ctx = ctx | (_quant(cs[..., 0], _Q0) << 2)
    ctx = ctx | (_quant(cs[..., 1], _Q1) << 6)
    ctx = ctx | (_quant(cs[..., 2], _Q23) << 9)
    ctx = ctx | (_quant(cs[..., 3], _Q23) << 11)
    ctx = ctx | (pb << 13)
    ctx = ctx | (jnp.minimum(nz_hist, 4) << 17)
    if prevc is not None:
        ctx = ctx | (prevc << 20)
    return ctx


def _level_class(cfg, level, use_code):
    """0 = letters/none, 1 = pmer-only evidence, 2 = s/mixed/b evidence,
    3 = rough 1-sub evidence (cfg.rough only) — the coverage-state signal
    that separates genuine low-level evidence from short-context genome
    collisions."""
    cls = jnp.where(level >= LEVEL_SMER, 2, 1)
    if cfg.rough:
        cls = jnp.where(level == LEVEL_RSMER, 3, cls)
    return jnp.where(use_code, cls, 0)


def _popcount4(v):
    return (v & 1) + ((v >> 1) & 1) + ((v >> 2) & 1) + ((v >> 3) & 1)


def _best_base(counts):
    """Rank-0 base: count desc, base asc (matches _rank_all ordering).
    Returns (best_base, best_count)."""
    key = (counts << 2) + (3 - jnp.arange(4, dtype=jnp.int32))
    best = jnp.argmax(key, axis=-1).astype(jnp.int32)
    bestc = jnp.max(counts, axis=-1)
    return best, bestc


def _repair_trigger(counts, level, base):
    """True where the repair rule fires: confident context (>= smer level),
    actual base unseen, best base well-supported and different."""
    b4 = jnp.minimum(base, 3)[..., None]
    cb = jnp.sum(jnp.where(jnp.arange(4) == b4, counts, 0), axis=-1)
    cb = jnp.where(base >= 4, 0, cb)
    best, bestc = _best_base(counts)
    kc = jnp.where(base >= 4, 0, base)
    trig = ((level >= LEVEL_SMER) & (cb == 0)
            & (bestc >= REPAIR_MIN_COUNT) & (best != kc))
    return trig, best


def _ramp_cols(cfg):
    """Read positions served by the prefix ramp: a full prefix_len-base
    prefix exists but the full (siv_len-1)-base SIV window does not."""
    return list(range(cfg.prefix_len, cfg.siv_len - 1))


def _prefix_ramp_counts(cfg, be, siv, kcodes, q: int):
    """[R, 4] summed SIV counts of all siv_len-mers whose first q bases are
    the read prefix kcodes[:, :q] and whose base q is the candidate — the
    TPU analog of the reference's partial-kmer pmer query (find_counts_p,
    dna.cpp:210-226: bit_vec test_shorter range sum). The SIV packs the
    earliest context base in the most significant index bits, so the
    matching cells of one (prefix, candidate) pair are one CONTIGUOUS word
    range; the free low bits (unseen context tail + the next-base lane) are
    summed out."""
    R = kcodes.shape[0]
    w = (4 ** jnp.arange(q - 1, -1, -1, dtype=jnp.int32))[None, :]
    pfx = jnp.sum(kcodes[:, :q].astype(jnp.int32) * w, axis=1)      # [R]
    free = cfg.siv_len - 2 - q            # context bases below the candidate
    nw = 4 ** free                        # words per candidate
    start = ((pfx[:, None] << 2) + jnp.arange(4, dtype=jnp.int32)[None, :]
             ) << (2 * free)                                        # [R, 4]
    idx = start[:, :, None] + jnp.arange(nw, dtype=jnp.int32)[None, None, :]
    c = tables.unpack_counts(be.siv_words(siv, idx))                # [R,4,nw,4]
    return jnp.minimum(jnp.sum(c, axis=(2, 3)), 255)


def _prefix_ramp_counts_static(cfg, be, siv, pfx, q: int):
    """_prefix_ramp_counts for the decode scan's statically-unrolled ramp
    steps: q is a compile-time position, so the gather covers the EXACT
    4^(siv_len-2-q) word range (no masked max-width over-read) and per-word
    totals fold with one SWAR pass instead of a [.., 4]-unpack stack.
    pfx: [N] int32 packed first-q decoded bases (pkey low bits)."""
    free = cfg.siv_len - 2 - q
    nw = 4 ** free
    start = ((pfx[:, None] << 2)
             + jnp.arange(4, dtype=jnp.int32)[None, :]) << (2 * free)
    idx = start[:, :, None] + jnp.arange(nw, dtype=jnp.int32)[None, None, :]
    w = be.siv_words(siv, idx)                        # [N, 4, nw] u32
    x = (w & jnp.uint32(0x00FF00FF)) + ((w >> 8) & jnp.uint32(0x00FF00FF))
    tot = ((x & jnp.uint32(0xFFFF)) + (x >> 16)).astype(jnp.int32)
    return jnp.minimum(jnp.sum(tot, axis=-1), 255)


def _window_parts(cfg, state, kcodes, lengths, be=tables.LOCAL,
                  with_siv: bool = True):
    """Pack all three window widths over kcodes and run the GLOBAL cascade
    finds. Returns ((cp, cs, cb, fp, fs, fb), active) — all [R, L(,4)].

    with_siv=False skips the SIV gather (cp=0, fp=False): the repair pass
    uses it — repair triggers require level >= LEVEL_SMER (see
    _repair_trigger), and the cascade gives s/b-level positions counts that
    never include SIV, so trig/best (and therefore eff and the archive) are
    bit-identical while one gather per position per iteration disappears."""
    R, L = kcodes.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    active = pos < lengths[:, None]

    s_lo, s_hi = kmers.pack_windows(kcodes, cfg.smer_len - 1)
    s_lo, s_hi = kmers.shift_right(s_lo, 1), kmers.shift_right(s_hi, 1)
    b_lo, b_hi = kmers.pack_windows(kcodes, cfg.bmer_len - 1)
    b_lo, b_hi = kmers.shift_right(b_lo, 1), kmers.shift_right(b_hi, 1)
    if cfg.canon:
        rs = kmers.pack_windows_rc(kcodes, cfg.smer_len - 1)
        rb = kmers.pack_windows_rc(kcodes, cfg.bmer_len - 1)
        s_q = _canon_query(s_lo, s_hi, kmers.shift_right(rs[0], 1),
                           kmers.shift_right(rs[1], 1), cfg.smer_len,
                           cfg.smer_log2_buckets)
        b_q = _canon_query(b_lo, b_hi, kmers.shift_right(rb[0], 1),
                           kmers.shift_right(rb[1], 1), cfg.bmer_len,
                           cfg.bmer_log2_buckets)

    vp = pos >= cfg.siv_len - 1
    if cfg.pmer_gate > 0:
        vp = vp & (pos < cfg.pmer_gate)
    vs = pos >= cfg.smer_len - 1
    vb = pos >= cfg.bmer_len - 1
    if with_siv:
        pm = kmers.shift_right(
            kmers.pack_windows(kcodes, cfg.siv_len - 1)[0], 1)
        pm = (pm & jnp.uint32(4 ** (cfg.siv_len - 1) - 1)).astype(jnp.int32)
        if cfg.canon:
            parts = _cascade_parts_k(
                state, pm, s_q, b_q, vp, vs, vb, be,
                cfg.smer_log2_buckets, cfg.bmer_log2_buckets)
        else:
            parts = _cascade_parts(
                state, pm, s_lo, s_hi, b_lo, b_hi, vp, vs, vb, be,
                cfg.smer_log2_buckets, cfg.bmer_log2_buckets)
        if cfg.prefix_ramp:
            cp, cs, cb, fp, fs, fb = parts
            for q in _ramp_cols(cfg):
                cq = _prefix_ramp_counts(cfg, be, state.siv, kcodes, q)
                ok = (jnp.sum(cq, axis=-1) > 0) & active[:, q]
                cp = cp.at[:, q].set(jnp.where(ok[:, None], cq, cp[:, q]))
                fp = fp.at[:, q].set(fp[:, q] | ok)
            parts = (cp, cs, cb, fp, fs, fb)
    else:
        if cfg.canon:
            cs, fs = be.ktable_find(state.s_tc, s_q[0], s_q[1],
                                    cfg.smer_log2_buckets)
            cb, fb = be.ktable_find(state.b_tc, b_q[0], b_q[1],
                                    cfg.bmer_log2_buckets)
        else:
            cs, fs = be.table_find(state.s_tc, s_lo, s_hi,
                                   cfg.smer_log2_buckets)
            cb, fb = be.table_find(state.b_tc, b_lo, b_hi,
                                   cfg.bmer_log2_buckets)
        cp = jnp.zeros_like(cs)
        fp = jnp.zeros_like(vp & active)
        parts = (cp, cs, cb, fp, fs & vs, fb & vb)
    return parts, active


def _window_lookup(cfg, state, kcodes, lengths, be=tables.LOCAL,
                   with_siv: bool = True):
    """Global-only cascade over a whole batch.
    Returns (counts [R, L, 4], level [R, L], active)."""
    parts, active = _window_parts(cfg, state, kcodes, lengths, be, with_siv)
    counts, level = _cascade_combine(*parts)
    return counts, level, active


# ---------------------------------------------------------------------------
# in-batch local statistics, row-synced
# ---------------------------------------------------------------------------
# TPU re-derivation of the reference's per-thread local k-mer tables
# (ht_*_local, dna.cpp:95-107, consulted in the cascade dna.h:218-228) AND of
# its per-symbol adaptive model updates (rc.h:120-127): within a batch, local
# k-mer tables and local MODEL deltas are updated once per read row (row rd =
# read rd of every lane, processed in lockstep). A position in row rd sees
# the statistics of all rows < rd — a causal order both sides replay exactly:
# the encoder as a short scan over r_pl wide row blocks, the decoder by
# freezing the local state during each row's decode scan and applying the
# row's events vectorized at the row boundary. Compared to per-scan-step
# locality this only forgoes same-row sharing (1/r_pl of pairs) and
# within-read self-repeats, and it keeps every op [N*L]-wide.

def _row_query_keys(cfg, eff_row, len_row, k):
    """(cell, tag, valid) of the width-(k-1) QUERY context at each position
    of a row block: the window ending one base left (predicts this base)."""
    L = eff_row.shape[1]
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    lo, hi = kmers.pack_windows(eff_row, k - 1)
    lo, hi = kmers.shift_right(lo, 1), kmers.shift_right(hi, 1)
    cell, tag = tables.local_keys(lo, hi, cfg.local_log2_cells)
    valid = (pos >= k - 1) & (pos < len_row[:, None])
    return cell, tag, valid


def _row_canon_query(cfg, eff_row, len_row, k):
    """Canonical-local variant of _row_query_keys: (cell, tag, slots4,
    valid) keys for tables.klocal_query."""
    L = eff_row.shape[1]
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    lo, hi = kmers.pack_windows(eff_row, k - 1)
    lo, hi = kmers.shift_right(lo, 1), kmers.shift_right(hi, 1)
    rlo, rhi = kmers.pack_windows_rc(eff_row, k - 1)
    rlo, rhi = kmers.shift_right(rlo, 1), kmers.shift_right(rhi, 1)
    s, m_lo, m_hi = kmers.canon_strand(lo, hi, rlo, rhi, k)
    cell, tag = tables.local_keys(m_lo, m_hi, cfg.local_log2_cells)
    slots = _klocal_slots(s, kmers.top_base(lo, hi, k - 1))
    valid = (pos >= k - 1) & (pos < len_row[:, None])
    return cell, tag, slots, valid


def local_row_update(cfg, ls, lb, lm, eff_row, ctx_row, sym_row, act_row,
                     len_row, row=0):
    """Apply one read row's events to the in-batch local state — shared
    VERBATIM by encoder (dna_modeling row scan) and decoder (row boundary in
    dna_decode_batch), so both sides' local statistics are bit-identical.

    k-mer events: forward (ctx ending at i-1 -> base i) and reverse
    complement (rc of the k-mer ending at i), both strands like the global
    updates. Model events: (ctx, coded symbol) at coded positions."""
    m = cfg.local_log2_cells
    L = eff_row.shape[1]
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    in_len = pos < len_row[:, None]

    def upd(tbl, k):
        w = k - 1
        c0 = k - 1   # slice to columns with a full window (see
        #              dna_collect_updates: masked events are not free)
        lo, hi = kmers.pack_windows(eff_row, w)
        lo = kmers.shift_right(lo, 1)[:, c0:]
        hi = kmers.shift_right(hi, 1)[:, c0:]
        v = in_len[:, c0:].reshape(-1)
        if cfg.canon:
            # ONE canonical event per k-mer occurrence into the
            # middle-keyed (first, last)-slot cells (tables.klocal_*)
            rlo, rhi = kmers.pack_windows_rc(eff_row, w)
            rlo = kmers.shift_right(rlo, 1)[:, c0:]
            rhi = kmers.shift_right(rhi, 1)[:, c0:]
            s, m_lo, m_hi = kmers.canon_strand(lo, hi, rlo, rhi, k)
            cell, tag = tables.local_keys(m_lo, m_hi, m)
            cb0 = kmers.top_base(lo, hi, w)
            base = eff_row[:, c0:]
            slot = jnp.where(s, 4 * (3 - base) + (3 - cb0),
                             4 * cb0 + base)
            return tables.klocal_insert(
                tbl, cell.reshape(-1), tag.reshape(-1), slot.reshape(-1),
                v, row=row, lite=cfg.local_lite)
        cf, tf = tables.local_keys(lo, hi, m)
        cells, tags_, bases, vs_ = (cf.reshape(-1), tf.reshape(-1),
                                    eff_row[:, c0:].reshape(-1), v)
        if cfg.local_rc:
            rlo, rhi = kmers.pack_windows_rc(eff_row, w)
            cr, tr = tables.local_keys(rlo[:, c0:], rhi[:, c0:], m)
            br = (3 - kmers.shift_right(eff_row, k - 1))[:, c0:]
            cells = jnp.concatenate([cells, cr.reshape(-1)])
            tags_ = jnp.concatenate([tags_, tr.reshape(-1)])
            bases = jnp.concatenate([bases, br.reshape(-1)])
            vs_ = jnp.concatenate([vs_, v])
        return tables.local_insert(tbl, cells, tags_, bases, vs_, row=row,
                                   lite=cfg.local_lite)

    ls = upd(ls, cfg.smer_len)
    lb = upd(lb, cfg.bmer_len)
    if cfg.local_model_inc > 0:
        lm = models.local_model_update(lm, ctx_row, sym_row, act_row,
                                       inc=cfg.local_model_inc)
    return ls, lb, lm


def _model_view(cfg, state: DnaState):
    """Batch-frozen find view of the DNA model. When in-batch model deltas
    are off (the default), the fine+letters rows are packed into a u16
    mirror (models.pack_freqs — the model gather was the decode scan's
    single largest cost, ~8x cheaper packed) and the coarse family gets its
    own tiny i32 array; otherwise the raw i32 array is used directly.
    Pure storage-layout change: cdf values (and archives) are identical."""
    if cfg.local_model_inc > 0:
        return ("raw", state.model)
    n_fine = _n_model_ctx(cfg)
    mp = models.pack_freqs(state.model[:n_fine])
    coarse = state.model[n_fine:] if cfg.mix_w > 0 else None
    return ("packed", mp, coarse)


def _dna_cdf(cfg, mv, lm, ctx, sb):
    """DNA model cdf from a _model_view: fine row, optional in-batch local
    deltas, optional coarse-parent mix (cfg.mix_w)."""
    if mv[0] == "packed":
        _, mp, coarse = mv
        if cfg.mix_w > 0:
            return models.model_cdf_mix_packed(
                mp, A_SYM, coarse, ctx, _coarse_ctx(cfg, ctx), sb,
                cfg.mix_w, cfg.mix_b)
        return models.model_cdf_packed(mp, A_SYM, ctx, sb)
    model = mv[1]
    local = lm if cfg.local_model_inc > 0 else None
    if cfg.mix_w > 0:
        return models.model_cdf_mix(model, ctx,
                                    _n_model_ctx(cfg) + _coarse_ctx(cfg, ctx),
                                    sb, cfg.mix_w, cfg.mix_b, local)
    if local is not None:
        return models.model_cdf_local(model, local, ctx, sb)
    return models.model_cdf(model, ctx, sb)


def _local_state_create(cfg):
    lm_shape = ((_n_model_ctx(cfg), A_SYM) if cfg.local_model_inc > 0
                else (1, 1))
    mk = tables.klocal_create if cfg.canon else tables.local_create
    return (mk(cfg.local_log2_cells), mk(cfg.local_log2_cells),
            jnp.zeros(lm_shape, jnp.int32))


def dna_effective_kcodes(cfg, state, codes, kcodes, lengths, be=tables.LOCAL):
    """Encoder-side repair: MAX_REPAIRS committed-repair iterations, each
    recomputing the cascade over the current effective windows and committing
    the FIRST trigger per read past the previous commit — exactly the
    decoder's sequential greedy rule (see MAX_REPAIRS note above)."""
    R, L = kcodes.shape
    pos_row = jnp.arange(L, dtype=jnp.int32)[None, :]
    rows = jnp.arange(R, dtype=jnp.int32)

    def body(_, carry):
        eff, frontier = carry
        counts, level, active = _window_lookup(cfg, state, eff, lengths, be,
                                               with_siv=False)
        trig, best = _repair_trigger(counts, level, codes)
        trig = trig & active & (pos_row > frontier[:, None])
        first = jnp.min(jnp.where(trig, pos_row, L), axis=1)  # [R]
        has = first < L
        idx = jnp.minimum(first, L - 1)
        newb = best[rows, idx]
        eff = eff.at[rows, jnp.where(has, idx, L)].set(
            jnp.where(has, newb, 0), mode="drop")
        frontier = jnp.where(has, first, jnp.int32(L))
        return eff, frontier

    # fori_loop: ONE compiled window pass instead of repair_iters unrolled
    # copies — same runtime (the loop is sequential either way), much
    # smaller HLO (compiles go through a remote service here)
    eff, _ = jax.lax.fori_loop(
        0, cfg.repair_iters, body, (kcodes, jnp.full((R,), -1, jnp.int32)))
    return eff


# ---------------------------------------------------------------------------
# encoder: fully-parallel modeling over the batch
# ---------------------------------------------------------------------------

def _ctx_sym_from_counts(cfg, counts, level, codes_blk, code_active_blk,
                         pb_blk, let_blk, pos_row):
    """Shared modeling math from merged counts to (ctx, sym): rank the coded
    base, build rank-history and the packed context. Works on any [.., L]
    block ([R, L] whole batch or [N, L] row)."""
    ranks = _rank_of(counts, codes_blk)
    use_code = (pos_row >= cfg.prefix_len) & (level > LEVEL_NONE)
    rbit = (use_code & code_active_blk & (ranks > 0)).astype(jnp.int32)
    nz_hist = sum(kmers.shift_right(rbit, d) for d in (1, 2, 3, 4))
    if cfg.ctx_v >= 2:
        prevc = kmers.shift_right(_level_class(cfg, level, use_code), 1)
        code_ctx = _code_ctx(level, counts, pb_blk, nz_hist, prevc,
                             rough=cfg.rough > 0)
    else:
        code_ctx = _code_ctx(level, counts, pb_blk, nz_hist)
    ctx_all = jnp.where(use_code, code_ctx, (1 << _ctx_bits(cfg)) + let_blk)
    sym_enc = jnp.where(use_code, ranks, codes_blk)
    return ctx_all, sym_enc


def _letters_plane(cfg, codes, pos, pb):
    lh = jnp.zeros_like(codes)
    for d in (5, 4, 3, 2, 1):
        sym_d = jnp.where(pos - d >= 0, kmers.shift_right(codes, d),
                          LET_SENTINEL)
        lh = (lh << 3) | sym_d
    return lh | (_let_pb(cfg, pb) << 15)


def _let_pb(cfg, pb):
    """Letters-branch position bucket: coarse 4-class under cfg.let_pb2
    (same bit layout, high 2 bits zero — the coarse-parent extraction at
    _coarse_ctx is unchanged)."""
    return (pb >> 2) if cfg.let_pb2 else pb


def _pos_buckets(cfg, pos, lens, lcp, pos_map):
    """[R, L] position buckets, honoring the pe_pos_ctx row coordinate map
    and the sorted-mode LCP override (mutually exclusive by construction:
    pos_map rows with lcp > 0 are read1 rows with identity mapping)."""
    if pos_map is None:
        pb = _pos_bucket(pos, lens)
    else:
        off, sign, plen = pos_map
        p_eff = jnp.maximum(off[:, None] + sign[:, None] * pos, 0)
        pb = _pos_bucket(p_eff, plen[:, None])
    if cfg.sorted_ctx and lcp is not None:
        pb = _pos_bucket_sorted(pb, pos, lens, lcp[:, None])
    return pb


def dna_modeling(cfg: DnaConfig, state: DnaState, codes, kcodes, lengths,
                 be=tables.LOCAL, lcp=None, anchor_mask=None, pos_map=None):
    """Compute per-position (ctx, coded symbol, freq, cum) for a whole batch.

    codes/kcodes: [R, L] int32; lengths: [R] int32. lcp (sorted mode): [R]
    shared-prefix lengths — positions < lcp are copied from the previous
    read in the lane and cost zero bits (masked rANS no-ops).

    With local statistics enabled (cfg.local_log2_cells > 0), runs a short
    scan over the r_pl read rows: each row is modeled fully vectorized
    against the batch-frozen global state PLUS the in-batch local k-mer
    tables and model deltas of all earlier rows, then contributes its own
    events (local_row_update) — exactly the order the decoder replays.

    Returns (ctx_all, sym_enc, freq, cum, code_active): all [R, L].
    """
    R, L = codes.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    lens = lengths[:, None]
    active = pos < lens
    code_active = active if lcp is None else active & (pos >= lcp[:, None])
    if anchor_mask is not None:
        # PE anchor span: preset from the candidate value, never coded
        code_active = code_active & ~anchor_mask
    pb = _pos_buckets(cfg, pos, lens, lcp, pos_map)
    let_ctx = _letters_plane(cfg, codes, pos, pb)

    parts, _ = _window_parts(cfg, state, kcodes, lengths, be)

    mv = _model_view(cfg, state)
    if cfg.local_log2_cells <= 0:
        counts, level = _cascade_combine(*parts)
        ctx_all, sym_enc = _ctx_sym_from_counts(
            cfg, counts, level, codes, code_active, pb, let_ctx, pos)
        cdf = _dna_cdf(cfg, mv, None, ctx_all, cfg.scale_bits)
        f, c = models.cdf_encode_lookup(cdf, sym_enc)
        f = jnp.where(code_active, f, 1 << cfg.scale_bits)
        c = jnp.where(code_active, c, 0)
        return ctx_all, sym_enc, f, c, code_active

    N = cfg.n_lanes
    rb = partial(common.to_row_blocks, n_lanes=N)
    len_rows = common.to_read_grid(lengths, N).T          # [r_pl, N]
    xs = (rb(codes), rb(kcodes), tuple(rb(p) for p in parts),
          rb(code_active), rb(pb), rb(let_ctx), len_rows,
          jnp.arange(R // N, dtype=jnp.int32))

    def row_step(carry, x):
        ls, lb, lm = carry
        codes_r, eff_r, parts_r, cact_r, pb_r, let_r, len_r, rd = x
        if cfg.canon:
            cs_l = tables.klocal_query(
                ls, *_row_canon_query(cfg, eff_r, len_r, cfg.smer_len))
            cb_l = tables.klocal_query(
                lb, *_row_canon_query(cfg, eff_r, len_r, cfg.bmer_len))
        else:
            s_cell, s_tag, s_v = _row_query_keys(cfg, eff_r, len_r,
                                                 cfg.smer_len)
            b_cell, b_tag, b_v = _row_query_keys(cfg, eff_r, len_r,
                                                 cfg.bmer_len)
            cs_l = tables.local_query(ls, s_cell, s_tag, s_v)
            cb_l = tables.local_query(lb, b_cell, b_tag, b_v)
        counts, level = _cascade_combine(*_merge_local(parts_r, cs_l, cb_l))
        ctx_r, sym_r = _ctx_sym_from_counts(
            cfg, counts, level, codes_r, cact_r, pb_r, let_r, pos)
        cdf = _dna_cdf(cfg, mv, lm, ctx_r, cfg.scale_bits)
        f, c = models.cdf_encode_lookup(cdf, sym_r)
        f = jnp.where(cact_r, f, 1 << cfg.scale_bits)
        c = jnp.where(cact_r, c, 0)
        ls, lb, lm = local_row_update(cfg, ls, lb, lm, eff_r, ctx_r, sym_r,
                                      cact_r, len_r, row=rd)
        return (ls, lb, lm), (ctx_r, sym_r, f, c)

    _, (ctx_b, sym_b, f_b, c_b) = jax.lax.scan(
        row_step, _local_state_create(cfg), xs)
    fb = common.from_row_blocks
    return fb(ctx_b), fb(sym_b), fb(f_b), fb(c_b), code_active


def dna_process_batch_rg(cfg: DnaConfig, state: DnaState, codes, kcodes,
                         lengths, be=tables.LOCAL, lcp=None,
                         anchor_mask=None, pos_map=None):
    """Row-global encoder pass (cfg.row_global): a scan over the r_pl read
    rows carrying the GLOBAL s/b-mer tables. Per row: greedy repair against
    the row-fresh tables, the cascade find, context/rank modeling against
    the batch-frozen models, then the row's s/b insert events apply to the
    carried tables (_apply_sb_updates) — the exact order the decoder's outer
    scan replays. Replaces the (repair pass -> flat modeling -> batch-level
    s/b collect) trio of the legacy path.

    Returns (eff, ctx_all, sym_enc, f, c, code_active, s_tc, b_tc)."""
    R, L = codes.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    lens = lengths[:, None]
    active = pos < lens
    code_active = active if lcp is None else active & (pos >= lcp[:, None])
    if anchor_mask is not None:
        code_active = code_active & ~anchor_mask
    pb = _pos_buckets(cfg, pos, lens, lcp, pos_map)
    let_ctx = _letters_plane(cfg, codes, pos, pb)

    N = cfg.n_lanes
    rb = partial(common.to_row_blocks, n_lanes=N)
    len_rows = common.to_read_grid(lengths, N).T              # [rows, N]
    xs = (rb(codes), rb(kcodes), rb(code_active), rb(pb), rb(let_ctx),
          len_rows)
    mv = _model_view(cfg, state)

    def row_step(carry, x):
        s_tc, b_tc = carry
        codes_r, kc_r, cact_r, pb_r, let_r, len_r = x
        st_r = state._replace(s_tc=s_tc, b_tc=b_tc)
        eff_r = dna_effective_kcodes(cfg, st_r, codes_r, kc_r, len_r, be)
        parts_r, _ = _window_parts(cfg, st_r, eff_r, len_r, be)
        counts, level = _cascade_combine(*parts_r)
        if cfg.rough:
            # suspect-tracked 1-sub s-mer rescue (see DnaConfig.rough):
            # miss runs over the DIRECT finds give each position its
            # suspect age; 4 substituted probes of the row-fresh s-table
            sw = cfg.smer_len - 1
            act_rr = pos < len_r[:, None]
            fs_d, fb_d = parts_r[4], parts_r[5]
            miss = act_rr & (pos >= sw) & ~fs_d & ~fb_d
            age = _miss_age(miss, jnp.broadcast_to(pos, miss.shape))
            ok = miss & (age >= 0) & (age <= sw - 1)
            s_lo, s_hi = kmers.pack_windows(eff_r, sw)
            s_lo, s_hi = kmers.shift_right(s_lo, 1), kmers.shift_right(s_hi, 1)
            rs_lo, rs_hi = kmers.pack_windows_rc(eff_r, sw)
            rs_lo = kmers.shift_right(rs_lo, 1)
            rs_hi = kmers.shift_right(rs_hi, 1)
            # probe only columns >= sw (misses are impossible earlier, and
            # masked events still pay full engine cost)
            cr_t = _rough_counts(
                cfg, be, s_tc, s_lo[:, sw:], s_hi[:, sw:], rs_lo[:, sw:],
                rs_hi[:, sw:], jnp.clip(age[:, sw:], 0, sw - 1), ok[:, sw:])
            cr = jnp.concatenate(
                [jnp.zeros(ok.shape[:1] + (sw, 4), jnp.int32), cr_t], axis=1)
            fr = ok & (jnp.sum(cr, axis=-1) > 0)
            counts, level = _combine_rough(counts, level, cr, fr)
        ctx_r, sym_r = _ctx_sym_from_counts(
            cfg, counts, level, codes_r, cact_r, pb_r, let_r, pos)
        cdf = _dna_cdf(cfg, mv, None, ctx_r, cfg.scale_bits)
        f, c = models.cdf_encode_lookup(cdf, sym_r)
        f = jnp.where(cact_r, f, 1 << cfg.scale_bits)
        c = jnp.where(cact_r, c, 0)
        act_r = pos < len_r[:, None]
        s_tc, b_tc = _apply_sb_updates(cfg, be, s_tc, b_tc, eff_r, act_r)
        return (s_tc, b_tc), (eff_r, ctx_r, sym_r, f, c)

    (s_tc, b_tc), (eff_b, ctx_b, sym_b, f_b, c_b) = jax.lax.scan(
        row_step, (state.s_tc, state.b_tc), xs)
    fb = common.from_row_blocks
    return (fb(eff_b), fb(ctx_b), fb(sym_b), fb(f_b), fb(c_b), code_active,
            s_tc, b_tc)


def dna_pe_encode(cfg: DnaConfig, state: DnaState, codes, lengths, lcp=None):
    """Encoder-side PE anchor pass over an interleaved batch (reference
    CompressPE, dna.cpp:1790-1872): find anchors against the batch-frozen
    pair table, emit the (id, pos) PE-stream symbols, and build the anchored
    3-row recoding (expand_pe_rows) that the DNA codec actually processes.

    Returns (codes3 [R3, L], lengths3 [R3], anchor_mask3 [R3, L],
    lcp3 [R3] | None, pe_syms [P, 3], pe_act [P, 3], f [P, 3], c [P, 3],
    pos_map3 (off, sign, plen) [R3] each | None)."""
    from . import pe as _pe

    B = cfg.bmer_len
    R, L = codes.shape
    raw_k = jnp.where(codes >= 4, 0, codes)
    cand_any, mid, pos, a_lo, a_hi = _pe.find_anchors(
        state.pe[:4], codes, raw_k, lengths, B)
    has = cand_any & (mid < _pe.N_CAND)
    codes3, lengths3 = _pe.expand_pe_rows(codes, lengths, pos, has, B)
    anchor_mask3 = _pe.expand_lengths_mask(codes3.shape[0], L, has, B)
    pos_map3 = None
    if cfg.pe_pos_ctx:
        lenB = jnp.where(has, jnp.minimum(
            jnp.where(has, pos, 0) + B, lengths[1::2]), 0)
        pos_map3 = _pe_pos_map(lengths, pos, has, lenB, B)
    lcp3 = None
    if lcp is not None:
        lcp3 = jnp.zeros((codes3.shape[0],), jnp.int32).at[0::3].set(
            lcp[0::2])
    pe_syms = jnp.stack([mid, pos & 0xFF, (pos >> 8) & 0xFF], axis=-1)
    pe_act = jnp.stack([cand_any, has, has], axis=-1)
    ctx3 = jnp.broadcast_to(
        jnp.arange(_pe.PE_N_CTX, dtype=jnp.int32)[None, :], pe_syms.shape)
    cdf = models.model_cdf(state.pe[4], ctx3, cfg.scale_bits)
    f, c = models.cdf_encode_lookup(cdf, pe_syms)
    f = jnp.where(pe_act, f, 1 << cfg.scale_bits)
    c = jnp.where(pe_act, c, 0)
    return (codes3, lengths3, anchor_mask3, lcp3, pe_syms, pe_act, f, c,
            pos_map3)


# ---------------------------------------------------------------------------
# shared state evolution
# ---------------------------------------------------------------------------

def sb_canon_events(cfg: DnaConfig, kcodes, active, k: int, log2b: int):
    """Flat (bkt, tag, valid) canonical insert events of the width-k table
    for a [rows, L] block — the event math of _apply_sb_updates' canon
    branch, shared with the owner-routed mesh exchange (sharded.py)."""
    c0 = k - 1
    ctx_lo, ctx_hi = kmers.pack_windows(kcodes, k - 1)
    ctx_lo = kmers.shift_right(ctx_lo, 1)[:, c0:]
    ctx_hi = kmers.shift_right(ctx_hi, 1)[:, c0:]
    fwd_base = kcodes[:, c0:]
    vk = active[:, c0:]
    r_lo, r_hi = kmers.pack_windows_rc(kcodes, k - 1)
    r_lo = kmers.shift_right(r_lo, 1)[:, c0:]
    r_hi = kmers.shift_right(r_hi, 1)[:, c0:]
    bkt, tag = _canon_insert(ctx_lo, ctx_hi, r_lo, r_hi, fwd_base, k, log2b)
    return bkt.reshape(-1), tag.reshape(-1), vk.reshape(-1)


def _apply_sb_updates(cfg: DnaConfig, be, s_tc, b_tc, kcodes, active):
    """Apply one block's s/b-mer insert events (both strands; one canonical
    event per occurrence under cfg.canon). kcodes/active: [rows, L]. Shared
    VERBATIM by the batch-level collect (legacy), the encoder's row-global
    scan, and the decoder's row boundaries — so statistics match exactly."""

    def upd(tc, k, log2b):
        c0 = k - 1
        if cfg.canon:
            # ONE canonical event per k-mer occurrence (both strands)
            bkt, tag, vk = sb_canon_events(cfg, kcodes, active, k, log2b)
            return be.ktable_update(tc, bkt, tag, vk, log2_base=log2b)
        ctx_lo, ctx_hi = kmers.pack_windows(kcodes, k - 1)
        ctx_lo = kmers.shift_right(ctx_lo, 1)[:, c0:]
        ctx_hi = kmers.shift_right(ctx_hi, 1)[:, c0:]
        fwd_base = kcodes[:, c0:]
        vk = active[:, c0:]
        rc_lo, rc_hi = kmers.pack_windows_rc(kcodes, k - 1)
        rc_lo, rc_hi = rc_lo[:, c0:], rc_hi[:, c0:]
        rc_base = (3 - kmers.shift_right(kcodes, k - 1))[:, c0:]
        lo = jnp.concatenate([ctx_lo.reshape(-1), rc_lo.reshape(-1)])
        hi = jnp.concatenate([ctx_hi.reshape(-1), rc_hi.reshape(-1)])
        base = jnp.concatenate([fwd_base.reshape(-1), rc_base.reshape(-1)])
        valid = jnp.concatenate([vk.reshape(-1), vk.reshape(-1)])
        return be.table_update(tc, lo, hi, base, valid,
                               log2_base=log2b, rounds=cfg.claim_rounds)

    return (upd(s_tc, cfg.smer_len, cfg.smer_log2_buckets),
            upd(b_tc, cfg.bmer_len, cfg.bmer_log2_buckets))


def dna_collect_updates(cfg: DnaConfig, state: DnaState, codes, kcodes, lengths,
                        ctx_all, sym_enc, code_active, be=tables.LOCAL,
                        pe_syms=None, pe_act=None,
                        codes_true=None, lengths_true=None,
                        skip_sb: bool = False) -> DnaState:
    """Apply one batch's k-mer/model statistics (both strands; reference
    queues inserts per owner shard, dna.cpp:810-852, and SIV inserts both
    strands, bit_vec semantics). Model updates count only CODED positions
    (code_active); k-mer tables ingest every in-length position, including
    sorted-mode copied prefixes.

    With the PE anchor machinery on (cfg.pe_log2_buckets > 0) this also
    cross-inserts the batch's minimizer pair events (reference
    append_pe_mers3, dna.cpp:1058-1136) and, when pe_syms/pe_act [P, 3] are
    given, evolves the PE stream model (id + pos bytes)."""
    R, L = codes.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    active = pos < lengths[:, None]

    if cfg.mix_w > 0:
        # fine + coarse families live in ONE array: both event streams
        # apply in a single scatter + one rescale sweep
        mctx = jnp.concatenate(
            [ctx_all.reshape(-1),
             _n_model_ctx(cfg) + _coarse_ctx(cfg, ctx_all).reshape(-1)])
        msym = jnp.concatenate([sym_enc.reshape(-1)] * 2)
        mact = jnp.concatenate([code_active.reshape(-1)] * 2)
        model = models.model_update(state.model, mctx, msym, mact)
    else:
        model = models.model_update(
            state.model, ctx_all.reshape(-1), sym_enc.reshape(-1),
            code_active.reshape(-1))

    # SIV: packed siv_len windows are exactly (ctx<<2 | next_base) cell
    # indices. Event planes are SLICED to the columns where a full window
    # exists (pos >= k-1) before flattening: engine passes charge per event
    # whether masked or live (measured — see axon notes in profile_r4), so
    # physically dropping the 13-20% never-valid columns is free speed.
    c0 = cfg.siv_len - 1
    siv_f = kmers.pack_windows(kcodes, cfg.siv_len)[0].astype(jnp.int32)[:, c0:]
    siv_r = kmers.pack_windows_rc(kcodes, cfg.siv_len)[0].astype(jnp.int32)[:, c0:]
    v_siv = active[:, c0:]
    siv = be.siv_update(
        state.siv,
        jnp.concatenate([siv_f.reshape(-1), siv_r.reshape(-1)]),
        jnp.concatenate([v_siv.reshape(-1), v_siv.reshape(-1)]))

    if skip_sb:
        # row-global mode: the s/b tables already evolved inside the row
        # scan (dna_process_batch_rg / the decode scan's row boundaries)
        s_tc, b_tc = state.s_tc, state.b_tc
    elif cfg.row_global:
        # mesh row-global: the authoritative s/b evolution replays the
        # batch's row blocks IN ORDER — the exact event sequence the
        # single-chip row-global scan applies — so a dp=1/tp=N mesh
        # reproduces the local tables bit-for-bit (slot claims included)
        # and every dp replica computes the identical result from the
        # gathered batch.
        rb = partial(common.to_row_blocks, n_lanes=cfg.n_lanes)

        def sb_step(carry, x):
            kc_r, act_r = x
            return _apply_sb_updates(cfg, be, *carry, kc_r, act_r), ()

        (s_tc, b_tc), _ = jax.lax.scan(
            sb_step, (state.s_tc, state.b_tc), (rb(kcodes), rb(active)))
    else:
        s_tc, b_tc = _apply_sb_updates(cfg, be, state.s_tc, state.b_tc,
                                       kcodes, active)

    pe_state = state.pe
    if cfg.pe_log2_buckets > 0:
        from . import pe as _pe

        # pair events come from the TRUE interleaved reads (the main args
        # are the anchored 3-row recoding in PE mode)
        c_t = codes if codes_true is None else codes_true
        l_t = lengths if lengths_true is None else lengths_true
        raw_k = jnp.where(c_t >= 4, 0, c_t)
        ev = _pe.pair_events(c_t, raw_k, l_t, cfg.bmer_len)
        pair = tables.pair_update(state.pe[:4], *ev)
        pe_model = state.pe[4]
        if pe_syms is not None:
            ctx3 = jnp.broadcast_to(
                jnp.arange(_pe.PE_N_CTX, dtype=jnp.int32)[None, :],
                pe_syms.shape)
            pe_model = models.model_update(
                pe_model, ctx3.reshape(-1), pe_syms.reshape(-1),
                pe_act.reshape(-1))
        pe_state = pair + (pe_model,)

    return DnaState(siv=siv, s_tc=s_tc, b_tc=b_tc, model=model, pe=pe_state)


def dna_apply_batch(cfg: DnaConfig, state: DnaState, codes, kcodes, lengths,
                    be=tables.LOCAL, lcp=None) -> DnaState:
    """Recompute contexts for a (decoded) batch and evolve the state —
    identical math to the encoder's pass, guaranteeing convergence."""
    if cfg.row_global:
        eff, ctx_all, sym_enc, _, _, code_active, s_tc, b_tc = \
            dna_process_batch_rg(cfg, state, codes, kcodes, lengths, be, lcp)
        return dna_collect_updates(
            cfg, state._replace(s_tc=s_tc, b_tc=b_tc), codes, eff, lengths,
            ctx_all, sym_enc, code_active, be, skip_sb=True)
    eff = dna_effective_kcodes(cfg, state, codes, kcodes, lengths, be)
    ctx_all, sym_enc, _, _, code_active = dna_modeling(
        cfg, state, codes, eff, lengths, be, lcp)
    return dna_collect_updates(cfg, state, codes, eff, lengths, ctx_all,
                               sym_enc, code_active, be)


# ---------------------------------------------------------------------------
# batch encode / decode
# ---------------------------------------------------------------------------

def dna_encode_batch(cfg: DnaConfig, state: DnaState, codes, kcodes, lengths,
                     lcp=None):
    """Returns (words, n_words, init_decoder_states, new_state)."""
    if cfg.row_global:
        eff, ctx_all, sym_enc, f, c, code_active, s_tc, b_tc = \
            dna_process_batch_rg(cfg, state, codes, kcodes, lengths,
                                 tables.LOCAL, lcp)
        state = state._replace(s_tc=s_tc, b_tc=b_tc)
        skip_sb = True
    else:
        eff = dna_effective_kcodes(cfg, state, codes, kcodes, lengths)
        ctx_all, sym_enc, f, c, code_active = dna_modeling(
            cfg, state, codes, eff, lengths, tables.LOCAL, lcp)
        skip_sb = False
    fg = common.to_grid(f, cfg.n_lanes)
    cg = common.to_grid(c, cfg.n_lanes)
    words, n_words, states = rans.rans_encode(fg, cg, cfg.scale_bits)
    new_state = dna_collect_updates(cfg, state, codes, eff, lengths,
                                    ctx_all, sym_enc, code_active,
                                    skip_sb=skip_sb)
    return words, n_words, states, new_state


def dna_decode_batch(cfg: DnaConfig, state: DnaState, lengths, words, init_states,
                     L: int, be=tables.LOCAL, apply_update: bool = True,
                     lcp=None, lcp_stride: int = 1,
                     pe_words=None, pe_states=None):
    """Decode a batch. lengths: [R] int32 (R multiple of n_lanes), words:
    [W] uint32 stream, init_states: [N] uint32 (encoder's final states).
    lcp (sorted mode): [R] — positions < lcp are copied from the previous
    read in the lane instead of entropy-decoded.

    Structure: an outer scan over the r_pl read rows, an inner scan over the
    L positions of the row. The in-batch local state (k-mer tables + model
    deltas) is FROZEN during a row's inner scan and the row's events are
    applied vectorized at the boundary (local_row_update — the identical
    function the encoder's dna_modeling row scan uses), so both sides see
    bit-identical local statistics.

    PE anchor machinery (cfg.pe_log2_buckets > 0 and pe_words/pe_states
    given): after each EVEN row (read1) decodes, its minimizer candidates
    are recomputed from the decoded bases (the reference's decoder symmetry,
    dna.cpp:1931-2044), 3 symbols (candidate id + anchor position) are
    decoded from the dedicated PE stream, and the following read2 row takes
    its anchor span [a, a+B) verbatim from the candidate value instead of
    entropy-decoding it.

    Returns (codes [R, L] int32, new_state, final_states, n_words_consumed,
    extras) where extras = (eff, ctx_all, sym, code_active[, pe_x]) —
    everything a caller needs to apply table/model updates without
    re-deriving contexts (the encoder's modeling pass is not repeated on the
    decode side).
    """
    N = cfg.n_lanes
    R = lengths.shape[0]
    r_pl = R // N
    lengths_grid = common.to_read_grid(lengths, N)  # [N, r_pl] TRUE lengths
    with_lcp = lcp is not None
    with_rg = cfg.row_global
    with_local = cfg.local_log2_cells > 0 and not with_rg
    with_pe = cfg.pe_log2_buckets > 0 and pe_words is not None
    if with_pe:
        from . import pe as _pe
    # in PE-anchor mode the scan walks the anchored 3-row recoding
    # (read1 / rowA / rowB per pair, see pe.expand_pe_rows)
    n_rows = (3 * (R // 2)) // N if with_pe else r_pl
    if with_lcp and with_pe:
        lcp3 = jnp.zeros((3 * (R // 2),), jnp.int32).at[0::3].set(lcp[0::2])
        lcp_grid = common.to_read_grid(lcp3, N)        # [N, n_rows]
    elif with_lcp:
        lcp_grid = common.to_read_grid(lcp, N)
    else:
        lcp_grid = None
    sb = cfg.scale_bits
    m = cfg.local_log2_cells
    pos_row = jnp.arange(L, dtype=jnp.int32)[None, :]
    B_anch = cfg.bmer_len

    pm_mask = jnp.uint32(4 ** (cfg.siv_len - 1) - 1)
    s_w = cfg.smer_len - 1
    b_w = cfg.bmer_len - 1
    mv = _model_view(cfg, state)   # batch-frozen packed find mirror

    def key_mask(width_bases):
        bits = 2 * width_bases
        lo = jnp.uint32(0xFFFFFFFF if bits >= 32 else (1 << bits) - 1)
        hi = jnp.uint32(0 if bits <= 32 else (1 << (bits - 32)) - 1)
        return lo, hi

    s_mlo, s_mhi = key_mask(s_w)
    b_mlo, b_mhi = key_mask(b_w)

    def outer(carry, rd):
        (x, ptr, pkey, slo, shi, blo, bhi, rregs, prev_rows, loc,
         pe_c) = carry
        # row-global mode: the cascade (and repair) read the CARRIED s/b
        # tables — fresh with all earlier rows' events, like the encoder's
        # dna_process_batch_rg row scan
        st_row = state._replace(s_tc=loc[0], b_tc=loc[1]) if with_rg \
            else state
        if with_pe:
            (pe_x, pe_ptr, anc_lo, anc_hi, anc_start, anc_has,
             lenA, lenB) = pe_c
            k3 = rd % 3
            q2 = 2 * (rd // 3)
            L1 = jax.lax.dynamic_index_in_dim(lengths_grid, q2, axis=1,
                                              keepdims=False)
            L2 = jax.lax.dynamic_index_in_dim(lengths_grid, q2 + 1, axis=1,
                                              keepdims=False)
            length = jnp.where(k3 == 0, L1, jnp.where(k3 == 1, lenA, lenB))
            anchor_row = anc_has & (k3 != 0)
            row_is_B = k3 == 2
        else:
            length = jax.lax.dynamic_index_in_dim(lengths_grid, rd, axis=1,
                                                  keepdims=False)
            anchor_row = jnp.zeros((N,), bool)
            anc_lo = anc_hi = jnp.zeros((N,), jnp.uint32)
            row_is_B = jnp.zeros((N,), bool)
        if with_lcp:
            my_lcp = jax.lax.dynamic_index_in_dim(lcp_grid, rd, axis=1,
                                                  keepdims=False)
            # prefix source: previous read1 in the lane — 3 expanded rows
            # back in PE-anchor mode, lcp_stride true rows otherwise
            stride_rows = 3 if with_pe else lcp_stride
            src_row = prev_rows[stride_rows - 1]
        else:
            my_lcp = jnp.zeros((N,), jnp.int32)
            src_row = jnp.zeros((N, 1), jnp.int32)

        def mk_inner(ramp_q, rough_on=False):
            return partial(inner, ramp_q, rough_on)

        def inner(ramp_q, rough_on, c2, i):
            (x, ptr, pkey, slo, shi, blo, bhi, rregs, lh, rh, rep_cnt,
             prevc, srun) = c2
            active = i < length
            in_prefix = active & (i < my_lcp) if with_lcp \
                else jnp.zeros_like(active)
            prefix_base = (jax.lax.dynamic_index_in_dim(
                src_row, i, axis=1, keepdims=False) if with_lcp
                else jnp.zeros((N,), jnp.int32))
            if with_pe:
                in_anchor = anchor_row & (i < B_anch) & active
                symA = _pe.anchor_base(anc_lo, anc_hi, i, B_anch)
                symB = _pe.comp_codes(_pe.anchor_base(
                    anc_lo, anc_hi, B_anch - 1 - i, B_anch))
                anchor_sym = jnp.where(row_is_B, symB, symA)
            else:
                in_anchor = jnp.zeros_like(active)
                anchor_sym = jnp.zeros((N,), jnp.int32)

            vp_i = i >= cfg.siv_len - 1
            if cfg.pmer_gate > 0:
                vp_i = vp_i & (i < cfg.pmer_gate)
            vp = jnp.broadcast_to(vp_i & active, x.shape)
            vs = jnp.broadcast_to((i >= s_w) & active, x.shape)
            vb = jnp.broadcast_to((i >= b_w) & active, x.shape)
            s_ctx = (slo & s_mlo, shi & s_mhi)
            b_ctx = (blo & b_mlo, bhi & b_mhi)
            if cfg.canon:
                rslo, rshi, rblo, rbhi = rregs
                s_q = _canon_query(s_ctx[0], s_ctx[1], rslo, rshi,
                                   cfg.smer_len, cfg.smer_log2_buckets)
                b_q = _canon_query(b_ctx[0], b_ctx[1], rblo, rbhi,
                                   cfg.bmer_len, cfg.bmer_log2_buckets)
                parts = _cascade_parts_k(
                    st_row, (pkey & pm_mask).astype(jnp.int32),
                    s_q, b_q, vp, vs, vb, be,
                    cfg.smer_log2_buckets, cfg.bmer_log2_buckets)
            else:
                parts = _cascade_parts(
                    st_row, (pkey & pm_mask).astype(jnp.int32),
                    s_ctx[0], s_ctx[1], b_ctx[0], b_ctx[1], vp, vs, vb, be,
                    cfg.smer_log2_buckets, cfg.bmer_log2_buckets)
            if ramp_q is not None:
                # partial-prefix SIV evidence where no full window exists
                # yet (mirror of the _window_parts injection; pkey's low 2q
                # bits are exactly this row's decoded prefix, and repair
                # never rewrites positions this early). Each ramp position
                # is ONE statically-unrolled step (i == ramp_q), so the
                # range read is exact-width and the rest of the scan never
                # compiles any ramp code (the masked max-width variant
                # inside the early scan segment was 70 of 186 ms/batch,
                # tools/profile_scan.py)
                cq = _prefix_ramp_counts_static(
                    cfg, be, state.siv,
                    (pkey & jnp.uint32(4 ** ramp_q - 1)).astype(jnp.int32),
                    ramp_q)
                ok = active & (jnp.sum(cq, axis=-1) > 0)
                cp_, cs_, cb_, fp_, fs_, fb_ = parts
                parts = (jnp.where(ok[:, None], cq, cp_), cs_, cb_,
                         fp_ | ok, fs_, fb_)
            counts_g, level_g = _cascade_combine(*parts)
            if with_local:
                ls, lb, lm = loc
                if cfg.canon:
                    sc, st_ = tables.local_keys(s_q[3], s_q[4], m)
                    bc, bt_ = tables.local_keys(b_q[3], b_q[4], m)
                    cs_l = tables.klocal_query(
                        ls, sc, st_, _klocal_slots(s_q[2], s_q[5]), vs)
                    cb_l = tables.klocal_query(
                        lb, bc, bt_, _klocal_slots(b_q[2], b_q[5]), vb)
                else:
                    s_cell, s_tag = tables.local_keys(s_ctx[0], s_ctx[1], m)
                    b_cell, b_tag = tables.local_keys(b_ctx[0], b_ctx[1], m)
                    cs_l = tables.local_query(ls, s_cell, s_tag, vs)
                    cb_l = tables.local_query(lb, b_cell, b_tag, vb)
                counts, level = _cascade_combine(
                    *_merge_local(parts, cs_l, cb_l))
            else:
                counts, level = counts_g, level_g

            if cfg.rough and rough_on:
                # suspect-tracked 1-sub rescue, mirror of the encoder's
                # block in dna_process_batch_rg: the carried streak-age
                # register srun counts consecutive s/b misses in this lane
                # (rough_on is static: segments below the s window compile
                # no probe code — misses are impossible there and srun
                # provably stays 0)
                sw_r = cfg.smer_len - 1
                miss = vs & ~parts[4] & ~parts[5]
                srun = jnp.where(miss, srun + 1, 0)
                age = srun - 1
                ok_r = miss & (age <= sw_r - 1)
                cr = _rough_counts(cfg, be, st_row.s_tc, s_ctx[0], s_ctx[1],
                                   rslo, rshi, jnp.clip(age, 0, sw_r - 1),
                                   ok_r)
                fr = ok_r & (jnp.sum(cr, axis=-1) > 0)
                counts, level = _combine_rough(counts, level, cr, fr)

            use_code = (i >= cfg.prefix_len) & (level > LEVEL_NONE)
            if with_pe and cfg.pe_pos_ctx:
                # pe_pos_ctx row coordinate map (mirror of _pe_pos_map):
                # rowA at true read2 coordinate a+i, rowB counted back
                # toward read2's start with no end-of-read flag
                a_off = jnp.where(anc_has, anc_start, 0)
                pe_pos = jnp.where(k3 == 1, a_off + i,
                                   jnp.maximum(lenB - 1 - i, 0))
                pos_i = jnp.where(k3 == 0, i, pe_pos)
                len_i = jnp.where(k3 == 0, L1,
                                  jnp.where(k3 == 1, L2,
                                            jnp.int32(_PE_NO_END)))
                pb = _pos_bucket(jnp.broadcast_to(pos_i, level.shape),
                                 jnp.broadcast_to(len_i, level.shape))
            else:
                pb = _pos_bucket(jnp.full_like(level, i),
                                 jnp.broadcast_to(length, level.shape))
            if cfg.sorted_ctx and with_lcp:
                pb = _pos_bucket_sorted(
                    pb, jnp.full_like(level, i),
                    jnp.broadcast_to(length, level.shape),
                    jnp.broadcast_to(my_lcp, level.shape))
            nz = _popcount4(rh)
            if cfg.ctx_v >= 2:
                # v2 field: previous-position level class (carried)
                code_ctx = _code_ctx(level, counts, pb, nz, prevc,
                                     rough=cfg.rough > 0)
            else:
                code_ctx = _code_ctx(level, counts, pb, nz)
            let_ctx = (lh & LH_MASK) | (_let_pb(cfg, pb) << 15)
            ctx_all = jnp.where(use_code, code_ctx,
                                (1 << _ctx_bits(cfg)) + let_ctx)

            cdf = _dna_cdf(cfg, mv, loc[2] if with_local else None,
                           ctx_all, sb)
            slot = rans.rans_decode_slots(x, sb)
            sym, f, c = rans.cdf_lookup(cdf, slot)
            coded = active & ~in_prefix & ~in_anchor
            f = jnp.where(coded, f, 1 << sb)
            c = jnp.where(coded, c, 0)
            x, ptr = rans.rans_decode_advance(x, ptr, words, f, c, sb)

            base = jnp.where(use_code, _base_of_rank(counts, sym), sym)
            base = jnp.where(in_prefix, prefix_base, base)
            base = jnp.where(in_anchor, anchor_sym, base)
            base = jnp.where(active, base, 0)
            # repair triggers on GLOBAL counts only (the encoder's
            # dna_effective_kcodes runs before any local statistics)
            trig, best = _repair_trigger(counts_g, level_g, base)
            do_rep = trig & active & (rep_cnt < cfg.repair_iters)
            rep_cnt = rep_cnt + do_rep.astype(jnp.int32)
            kc = jnp.where(base >= 4, 0, base)
            kc = jnp.where(do_rep, best, kc).astype(jnp.uint32)

            pkey = ((pkey << 2) | kc) & pm_mask
            shi = ((shi << 2) | (slo >> 30)) & s_mhi
            slo = ((slo << 2) | kc) & s_mlo
            bhi = ((bhi << 2) | (blo >> 30)) & b_mhi
            blo = ((blo << 2) | kc) & b_mlo
            if cfg.canon:
                comp = jnp.uint32(3) - kc
                rslo, rshi = kmers.or_top_base(
                    *kmers.shr2(rslo, rshi), comp, s_w)
                rblo, rbhi = kmers.or_top_base(
                    *kmers.shr2(rblo, rbhi), comp, b_w)
                rregs2 = (rslo, rshi, rblo, rbhi)
            else:
                rregs2 = rregs
            lh = ((lh << 3) | base) & LH_MASK
            rbit = (use_code & (sym > 0) & coded).astype(jnp.int32)
            rh = ((rh << 1) | rbit) & 0xF

            prevc2 = _level_class(cfg, level, use_code)
            ys = (base, kc.astype(jnp.int32), ctx_all, sym, in_anchor)
            return (x, ptr, pkey, slo, shi, blo, bhi, rregs2, lh, rh,
                    rep_cnt, prevc2, srun), ys

        zeros_i = jnp.zeros((N,), jnp.int32)
        inner0 = (x, ptr, pkey, slo, shi, blo, bhi, rregs,
                  jnp.full((N,), LH_RESET, jnp.int32), zeros_i, zeros_i,
                  zeros_i, zeros_i)
        ramp_steps = ([q for q in _ramp_cols(cfg) if q < L]
                      if cfg.prefix_ramp else [])
        # static segmentation of the L positions: plain scan below the ramp
        # zone, ONE static step per ramp position (exact-width range
        # reads), plain scan after. With rough evidence on, scan segments
        # additionally split at the s-window boundary so the probe block
        # only compiles into steps that can actually miss (i >= s_w).
        segs = []                       # ("scan", s, e) | ("ramp", q)
        if ramp_steps:
            if ramp_steps[0] > 0:
                segs.append(("scan", 0, ramp_steps[0]))
            for q in ramp_steps:
                segs.append(("ramp", q))
            if ramp_steps[-1] + 1 < L:
                segs.append(("scan", ramp_steps[-1] + 1, L))
        else:
            segs.append(("scan", 0, L))
        if cfg.rough:
            split = []
            for sg in segs:
                if sg[0] == "scan" and sg[1] < s_w < sg[2]:
                    split.append(("scan", sg[1], s_w))
                    split.append(("scan", s_w, sg[2]))
                else:
                    split.append(sg)
            segs = split
        c_cur = inner0
        ys_parts = []
        for sg in segs:
            if sg[0] == "ramp":
                q = sg[1]
                c_cur, ys_q = inner(q, q >= s_w, c_cur, jnp.int32(q))
                ys_parts.append(jax.tree.map(lambda a: a[None], ys_q))
            else:
                _, s0, e0 = sg
                c_cur, ys_s = jax.lax.scan(
                    mk_inner(None, rough_on=e0 > s_w), c_cur,
                    jnp.arange(s0, e0, dtype=jnp.int32),
                    unroll=min(DECODE_UNROLL, e0 - s0))
                ys_parts.append(ys_s)
        ys = (ys_parts[0] if len(ys_parts) == 1 else
              jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                           *ys_parts))
        (x, ptr, pkey, slo, shi, blo, bhi, rregs,
         _, _, _, _, _) = c_cur
        base_r = ys[0].T                       # [L, N] -> [N, L]
        eff_r = ys[1].T
        ctx_r = ys[2].T
        sym_r = ys[3].T
        anch_r = ys[4].T
        if with_rg:
            # apply this row's s/b insert events to the carried GLOBAL
            # tables (all in-length positions, like the encoder's collect)
            act_r = pos_row < length[:, None]
            loc = _apply_sb_updates(cfg, be, loc[0], loc[1], eff_r, act_r)
        elif with_local:
            act_r = pos_row < length[:, None]
            if with_lcp:
                act_r = act_r & (pos_row >= my_lcp[:, None])
            loc = local_row_update(cfg, loc[0], loc[1], loc[2], eff_r, ctx_r,
                                   sym_r, act_r, length, row=rd)
        if with_lcp:
            prev_rows = (base_r,) + prev_rows[:-1]

        pe_syms_row = jnp.zeros((N, 3), jnp.int32)
        pe_act_row = jnp.zeros((N, 3), bool)
        pe_meta_row = jnp.zeros((N, 2), jnp.int32)   # (a_start, has)
        if with_pe:
            # a read1 row just decoded: recompute its candidates from the
            # decoded bases, decode (id, pos lo, pos hi) from the PE stream,
            # and arm the anchor for the pair's rowA/rowB (all no-ops on
            # rowA/rowB boundaries via the k3 mask)
            raw_k = jnp.where(base_r >= 4, 0, base_r)
            q_lo, q_hi = _pe.segment_minimizers(
                base_r, raw_k, length, B_anch, 4)
            c_lo, c_hi, c_cnt = _pe.find_candidates(
                state.pe[:4], q_lo, q_hi, B_anch)
            cand_any = jnp.any(c_cnt > 0, axis=-1) & (k3 == 0)

            pe_model = state.pe[4]
            syms3 = []
            mid = jnp.full((N,), _pe.N_CAND, jnp.int32)
            for j in range(3):
                cdfj = models.model_cdf(
                    pe_model, jnp.full((N,), j, jnp.int32), sb)
                act = cand_any if j == 0 else cand_any & (mid < _pe.N_CAND)
                slot = rans.rans_decode_slots(pe_x, sb)
                symj, fj, cj = rans.cdf_lookup(cdfj, slot)
                fj = jnp.where(act, fj, 1 << sb)
                cj = jnp.where(act, cj, 0)
                pe_x, pe_ptr = rans.rans_decode_advance(
                    pe_x, pe_ptr, pe_words, fj, cj, sb)
                symj = jnp.where(act, symj, 0)
                if j == 0:
                    mid = jnp.where(cand_any, symj, _pe.N_CAND)
                syms3.append(symj)
            pos_dec = syms3[1] | (syms3[2] << 8)
            g = lambda c: jnp.take_along_axis(
                c, jnp.minimum(mid, _pe.N_CAND - 1)[:, None], axis=-1)[:, 0]
            new_has = cand_any & (mid < _pe.N_CAND)
            anc_lo2 = jnp.where(new_has, g(c_lo), 0)
            anc_hi2 = jnp.where(new_has, g(c_hi), 0)
            a_eff = jnp.where(new_has, pos_dec, 0)
            # row lengths of the pair's expanded rows (expand_pe_rows rules)
            lenA2 = L2 - a_eff
            lenB2 = jnp.where(new_has, jnp.minimum(a_eff + B_anch, L2), 0)
            # arm only at read1 boundaries; rowA keeps the carry for rowB
            keep = k3 != 0
            pe_c = (pe_x, pe_ptr,
                    jnp.where(keep, anc_lo, anc_lo2),
                    jnp.where(keep, anc_hi, anc_hi2),
                    jnp.where(keep, anc_start, a_eff),
                    jnp.where(keep, anc_has, new_has),
                    jnp.where(keep, lenA, lenA2),
                    jnp.where(keep, lenB, lenB2))
            pe_syms_row = jnp.stack([mid, syms3[1], syms3[2]], axis=-1)
            pe_act_row = jnp.stack([cand_any, new_has, new_has], axis=-1)
            pe_meta_row = jnp.stack(
                [a_eff, new_has.astype(jnp.int32)], axis=-1)

        return (x, ptr, pkey, slo, shi, blo, bhi, rregs, prev_rows,
                loc, pe_c), (base_r, eff_r, ctx_r, sym_r, anch_r,
                             pe_syms_row, pe_act_row, pe_meta_row, length)

    zeros_u = jnp.zeros((N,), jnp.uint32)
    row0 = (jnp.zeros((N, L), jnp.int32) if with_lcp
            else jnp.zeros((N, 1), jnp.int32))
    prev0 = (row0, row0, row0) if with_lcp else (row0,)
    if with_rg:
        loc0 = (state.s_tc, state.b_tc)
    else:
        loc0 = _local_state_create(cfg) if with_local else ()
    zeros_i0 = jnp.zeros((N,), jnp.int32)
    pe_c0 = ((pe_states, jnp.int32(0), zeros_u, zeros_u, zeros_i0,
              jnp.zeros((N,), bool), zeros_i0, zeros_i0)
             if with_pe else ())
    rregs0 = ((zeros_u, zeros_u, zeros_u, zeros_u) if cfg.canon else ())
    carry0 = (init_states, jnp.int32(0), zeros_u, zeros_u, zeros_u,
              zeros_u, zeros_u, rregs0, prev0, loc0, pe_c0)
    # outer rows fully unrolled: n_rows is small and static (R / n_lanes),
    # and keeping the row-boundary table updates out of a while-loop body
    # lets XLA overlap/schedule their scatter passes with the neighboring
    # rows' work (measured: the same 4 ktable_update calls cost ~30 ms
    # free-standing vs ~49 ms inside the lax.scan body)
    carry, ys = jax.lax.scan(outer, carry0,
                             jnp.arange(n_rows, dtype=jnp.int32),
                             unroll=True)
    x, ptr = carry[0], carry[1]
    if with_rg:
        # the scan's carried tables hold every row's events already; the
        # remaining collect skips s/b (carry[-2] = the loc slot, carry[-1]
        # = pe_c)
        state = state._replace(s_tc=carry[-2][0], b_tc=carry[-2][1])

    codes = common.from_row_blocks(ys[0])      # [R3, L] in PE-anchor mode
    eff = common.from_row_blocks(ys[1])
    ctx_all = common.from_row_blocks(ys[2])
    sym = common.from_row_blocks(ys[3])
    pe_syms = pe_act = None
    pe_extra = ()
    if with_pe:
        from . import pe as _pe

        lengths3 = ys[8].swapaxes(0, 1).reshape(-1)        # [R3]
        code_active = (pos_row < lengths3[:, None]) \
            & ~common.from_row_blocks(ys[4])
        if with_lcp:
            code_active = code_active & (pos_row >= lcp3[:, None])
        # read1-boundary (id, pos) symbols and (a, has) in pair order [P, .]
        pe_syms = ys[5][0::3].swapaxes(0, 1).reshape(-1, 3)
        pe_act = ys[6][0::3].swapaxes(0, 1).reshape(-1, 3)
        pe_meta = ys[7][0::3].swapaxes(0, 1).reshape(-1, 2)
        a_pairs = pe_meta[:, 0]
        has_pairs = pe_meta[:, 1] > 0
        codes_true = _pe.collapse_pe_rows(codes, lengths, a_pairs,
                                          has_pairs, B_anch)
        pe_extra = (carry[-1][0],)             # final PE lane states (pe_c.x)
        # trailing fields let an apply_update=False caller (the mesh decode
        # step) run dna_collect_updates on the gathered full batch: the
        # expanded rows/lengths plus the decoded PE stream symbols
        extras = (eff, ctx_all, sym, code_active) + pe_extra + (
            pe_syms, pe_act, codes, lengths3)
        if apply_update:
            new_state = dna_collect_updates(
                cfg, state, codes, eff, lengths3, ctx_all, sym, code_active,
                be, pe_syms=pe_syms, pe_act=pe_act,
                codes_true=codes_true, lengths_true=lengths,
                skip_sb=with_rg)
        else:
            new_state = state
        return codes_true, new_state, x, ptr, extras

    code_active = pos_row < lengths[:, None]
    if with_lcp:
        code_active = code_active & (pos_row >= lcp[:, None])
    extras = (eff, ctx_all, sym, code_active)
    if apply_update:
        new_state = dna_collect_updates(cfg, state, codes, eff, lengths,
                                        ctx_all, sym, code_active, be,
                                        pe_syms=None, pe_act=None,
                                        skip_sb=with_rg)
    else:
        new_state = state
    return codes, new_state, x, ptr, extras
