"""Interleaved vectorized rANS entropy coder.

TPU-native replacement for the reference's serial 64-bit range coder
(/root/reference/fqs/sub_rc.h:32-158). N independent lanes share ONE word
stream: the encoder emits words in the exact reverse of the decoder's
consumption order (position ascending, lane ascending), so no per-lane framing
is needed — only the N final states (4 bytes each) are stored per flush.

State: uint32 in [2^16, 2^32); renormalization emits/consumes one uint16 word.
Probabilities are quantized to scale_bits (SB) bits: a symbol is (cum, freq)
with 0 <= cum < cum+freq <= 2^SB. With SB <= 16 each encode/decode step moves
at most one word (proof: after a 16-bit shift the state is < 2^16 <= freq<<18's
minimum 2^18; see DESIGN.md).

Masked (padding) positions use freq = 2^SB, cum = 0: the state update and the
renorm conditions are exact no-ops, so ragged read batches cost zero bits.

All arithmetic is integer; encode uses uint32 div/mod (the only division in the
codec — decode is division-free).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

RANS_L = 1 << 16  # lower bound of normalized state interval
WORD_BITS = 16
WORD_MASK = (1 << 16) - 1

# Pallas kernel path (TPU only): the whole T-step encode loop runs inside ONE
# kernel per (batch, stream) with the lane states resident in VMEM scratch —
# the XLA while-loop pays per-step dispatch on hundreds of thin steps, the
# kernel pays VPU cost only. Chunked over rows so (freq, cum) stream through
# VMEM with automatic double buffering.
_PALLAS_CHUNK = 256


def _div_u32_by_u16(x: jax.Array, f: jax.Array):
    """Exact (x // f, x % f) for u32 x and u16-range f (1 <= f <= 2^16),
    without integer division: base-2^8 long division, each digit an exact
    f32 divide (numerator < f * 2^8 <= 2^24) with a +/-1 correction step.
    Mosaic has no u32 vector divide; this is ~20 cheap VPU ops."""
    xi = x
    q = jnp.zeros_like(x)
    r = jnp.zeros_like(x)
    # route u32<->f32 casts through i32 (all values < 2^24 so exact);
    # Mosaic has no direct uint32<->float32 cast
    finv = 1.0 / f.astype(jnp.int32).astype(jnp.float32)
    for d in (24, 16, 8, 0):
        num = (r << 8) | ((xi >> d) & jnp.uint32(0xFF))
        qd = (num.astype(jnp.int32).astype(jnp.float32)
              * finv).astype(jnp.int32).astype(jnp.uint32)
        rd = num - qd * f
        # correctly-rounded f32 divide of exact ints < 2^24 puts qd within
        # +/-1 of the true digit; fix over-estimate (rd wrapped negative —
        # top bit set, since true r < 2^17) BEFORE the under-estimate check
        wrap = rd > jnp.uint32(0x80000000)
        qd = jnp.where(wrap, qd - 1, qd)
        rd = jnp.where(wrap, rd + f, rd)
        under = rd >= f
        qd = jnp.where(under, qd + 1, qd)
        rd = jnp.where(under, rd - f, rd)
        q = (q << 8) | qd
        r = rd
    return q, r


def _rans_encode_kernel(init_ref, f_ref, c_ref, w_ref, e_ref, st_ref, x_ref,
                        *, scale_bits: int, chunk: int):
    shift = 32 - scale_bits
    i = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        x_ref[:] = init_ref[:]

    def body(j, _):
        t = chunk - 1 - j
        x = x_ref[:]
        f = f_ref[t, :].astype(jnp.uint32)
        c = c_ref[t, :].astype(jnp.uint32)
        emit = (x >> shift) >= f
        w_ref[t, :] = x & jnp.uint32(WORD_MASK)
        e_ref[t, :] = emit.astype(jnp.uint32)
        x = jnp.where(emit, x >> WORD_BITS, x)
        q, r = _div_u32_by_u16(x, f)
        x_ref[:] = (q << scale_bits) + c + r
        return 0

    jax.lax.fori_loop(0, chunk, body, 0)

    @pl.when(i == n_chunks - 1)
    def _():
        st_ref[:] = x_ref[:]


def _rans_encode_pallas(freq: jax.Array, cum: jax.Array, scale_bits: int,
                        init_states: jax.Array, interpret: bool = False):
    """(wplane, eplane, final_states) of the reverse encode walk — identical
    values to the lax.scan path, produced by one chunked Pallas kernel."""
    T, N = freq.shape
    CT = _PALLAS_CHUNK
    T_pad = -(-T // CT) * CT
    if T_pad != T:
        # (f=2^SB, c=0) rows are exact no-ops for state and emission
        pad = ((0, T_pad - T), (0, 0))
        freq = jnp.pad(freq, pad, constant_values=1 << scale_bits)
        cum = jnp.pad(cum, pad)
    n_chunks = T_pad // CT
    rev = lambda i: (n_chunks - 1 - i, 0)
    wplane, eplane, st = pl.pallas_call(
        functools.partial(_rans_encode_kernel, scale_bits=scale_bits,
                          chunk=CT),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # init states
            pl.BlockSpec((CT, N), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, N), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CT, N), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, N), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),          # final states
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, N), jnp.uint32),
            jax.ShapeDtypeStruct((T_pad, N), jnp.uint32),
            jax.ShapeDtypeStruct((N,), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((N,), jnp.uint32)],
        interpret=interpret,
    )(init_states, freq.astype(jnp.uint32), cum.astype(jnp.uint32))
    return wplane[:T], eplane[:T].astype(bool), st


try:  # Pallas is TPU-only here; CPU tests use the lax.scan path
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


def _use_pallas(n_lanes: int) -> bool:
    return (_HAVE_PALLAS and n_lanes % 128 == 0
            and jax.default_backend() == "tpu")


def rans_initial_states(n_lanes: int) -> jax.Array:
    return jnp.full((n_lanes,), RANS_L, dtype=jnp.uint32)


def rans_encode(freq: jax.Array, cum: jax.Array, scale_bits: int,
                init_states: jax.Array | None = None):
    """Encode a [T, N] grid of symbols given their (freq, cum) in decode order.

    Args:
      freq: [T, N] uint32, quantized symbol frequencies (2^SB for masked slots).
      cum:  [T, N] uint32, cumulative frequency below the symbol (0 for masked).
      scale_bits: SB.
      init_states: [N] uint32 states to *end* at (i.e. the states the decoder
        will carry after this block); defaults to RANS_L (fresh lanes).

    Returns:
      words: [T*N] uint32 buffer holding uint16 words in decode order
        (only the first n_words are meaningful).
      n_words: scalar int32.
      states: [N] uint32 final encoder states = the decoder's initial states.
    """
    T, N = freq.shape
    shift = 32 - scale_bits
    cap = T * N

    if init_states is None:
        init_states = rans_initial_states(N)

    # Thin sequential steps: the scan carries ONLY the [N] states and stacks
    # per-step (word, emit) rows — no per-step cumsum/scatter, no carried
    # word buffer. Compaction to the tightly-packed decode-order stream is
    # ONE vectorized pass afterwards. Encode emission order is the exact
    # reverse of decode consumption order, so the packed sequence is simply
    # the emitted entries of the [T, N] planes in row-major (t, lane) order
    # — byte-identical to the per-step packing this replaces.
    if _use_pallas(N):
        wplane, eplane, x = _rans_encode_pallas(freq, cum, scale_bits,
                                                init_states)
    else:
        def step(x, inp):
            f, c = inp
            f = f.astype(jnp.uint32)
            c = c.astype(jnp.uint32)

            # renorm before encoding: emit low 16 bits when x >= f << shift
            emit = (x >> shift) >= f
            word = x & WORD_MASK
            x = jnp.where(emit, x >> WORD_BITS, x)

            # state update: x' = (x/f) << SB + c + x%f
            q = x // f
            r = x - q * f
            x = (q << scale_bits) + c + r
            return x, (word, emit)

        x, (wplane, eplane) = jax.lax.scan(
            step,
            init_states,
            (freq.astype(jnp.uint32), cum.astype(jnp.uint32)),
            reverse=True,
        )
    e = eplane.reshape(-1)
    ei = e.astype(jnp.int32)
    pos = jnp.cumsum(ei) - ei            # exclusive prefix, decode order
    wptr = jnp.sum(ei)
    words = jnp.zeros((cap,), jnp.uint32).at[
        jnp.where(e, pos, cap)].set(wplane.reshape(-1), mode="drop")
    return words, wptr, x


GROUP_PAD_ROWS = 512   # fused-group grid rows pad granularity (bounded
#                        compile-shape set; padding rows are exact no-ops)
GROUP_MAX_BATCHES = 64


def rans_encode_group(freq: jax.Array, cum: jax.Array, scale_bits: int,
                      row_bounds: jax.Array):
    """Encode a whole GROUP's concatenated [T, N] grid as ONE chained walk
    (replaces one rans_encode launch per batch — the encoder's per-stream
    reverse chain across batches is exactly a reverse walk over the
    concatenation in batch order). Trailing padding rows must carry
    (freq=2^SB, cum=0) no-ops.

    row_bounds: [GROUP_MAX_BATCHES + 1] int32 cumulative ROW offsets of each
    batch (b_k = rows of batches 0..k-1; unused tail entries repeat the last
    value). Returns (words, n_per_batch [GROUP_MAX_BATCHES], states): the
    packed word stream is in global decode order, so batch k's words are the
    contiguous slice [sum(n_per[:k]), sum(n_per[:k+1])) — byte-identical to
    per-batch encoding with chained states."""
    T, N = freq.shape
    if _use_pallas(N):
        wplane, eplane, x = _rans_encode_pallas(freq, cum, scale_bits,
                                                rans_initial_states(N))
    else:
        def step(x, inp):
            f, c = inp
            f = f.astype(jnp.uint32)
            c = c.astype(jnp.uint32)
            emit = (x >> (32 - scale_bits)) >= f
            word = x & WORD_MASK
            x = jnp.where(emit, x >> WORD_BITS, x)
            q = x // f
            x = (q << scale_bits) + c + (x - q * f)
            return x, (word, emit)

        x, (wplane, eplane) = jax.lax.scan(
            step, rans_initial_states(N),
            (freq.astype(jnp.uint32), cum.astype(jnp.uint32)), reverse=True)
    e = eplane.reshape(-1)
    ei = e.astype(jnp.int32)
    pos = jnp.cumsum(ei) - ei
    words = jnp.zeros((T * N,), jnp.uint32).at[
        jnp.where(e, pos, T * N)].set(wplane.reshape(-1), mode="drop")
    row_sums = jnp.sum(eplane.astype(jnp.int32), axis=1)        # [T]
    crow = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(row_sums)])              # [T+1]
    at = crow[jnp.minimum(row_bounds, T)]
    n_per = at[1:] - at[:-1]
    return words.astype(jnp.uint16), n_per, x


def rans_decode_slots(states: jax.Array, scale_bits: int) -> jax.Array:
    """Current slot (low SB bits) of each lane's state: the value the symbol
    lookup inverts through the cdf."""
    return (states & jnp.uint32((1 << scale_bits) - 1)).astype(jnp.int32)


def rans_decode_advance(states: jax.Array, ptr: jax.Array, words: jax.Array,
                        freq: jax.Array, cum: jax.Array, scale_bits: int):
    """Advance all lanes one symbol after the caller resolved (freq, cum).

    Args:
      states: [N] uint32. ptr: scalar int32 read cursor into words.
      words: [W] uint32 (uint16 values) in decode order.
      freq, cum: [N] resolved symbol stats (freq=2^SB, cum=0 for masked lanes).
    Returns: (new_states, new_ptr).
    """
    slot = states & jnp.uint32((1 << scale_bits) - 1)
    f = freq.astype(jnp.uint32)
    c = cum.astype(jnp.uint32)
    x = f * (states >> scale_bits) + slot - c

    consume = x < RANS_L
    ci = consume.astype(jnp.int32)
    off = jnp.cumsum(ci) - ci  # exclusive cumsum, lane-ascending
    w = words[ptr + off]
    x = jnp.where(consume, (x << WORD_BITS) | w, x)
    return x, ptr + jnp.sum(ci)


def cdf_lookup(cdf: jax.Array, slots: jax.Array):
    """Map rANS slots to symbols through per-lane cdf rows.

    Args:
      cdf: [N, A+1] int32 with cdf[:,0]=0, cdf[:,A]=2^SB (strictly increasing
        over real symbols).
      slots: [N] int32.
    Returns: (sym [N] int32, freq [N] int32, cum [N] int32).

    cum/freq come from masked reductions over the (narrow) cdf row instead
    of take_along_axis: a take_along lowers to a gather, and the decode
    scan's per-lane cost is gather-EVENT bound (~12 ns/event on the engine,
    round-4 lane probe) — two compare/select sweeps over A+1 lanes-wide
    columns are VPU-cheap by comparison."""
    # sym = number of cdf boundaries <= slot, minus 1
    le = cdf[:, 1:] <= slots[:, None]                  # [N, A]
    sym = jnp.sum(le.astype(jnp.int32), axis=1)
    # cum = largest boundary <= slot; nxt = smallest boundary > slot
    cum = jnp.max(jnp.where(le, cdf[:, 1:], 0), axis=1)   # 0 when sym == 0
    nxt = jnp.min(jnp.where(le, cdf.shape[1] << 16, cdf[:, 1:]), axis=1)
    return sym, nxt - cum, cum
