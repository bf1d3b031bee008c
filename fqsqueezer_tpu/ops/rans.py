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

import jax
import jax.numpy as jnp

RANS_L = 1 << 16  # lower bound of normalized state interval
WORD_BITS = 16
WORD_MASK = (1 << 16) - 1


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

    lane_rev = jnp.arange(N - 1, -1, -1)

    def step(carry, inp):
        x, wptr, buf = carry
        f, c = inp
        f = f.astype(jnp.uint32)
        c = c.astype(jnp.uint32)

        # renorm before encoding: emit low 16 bits when x >= f << shift
        emit = (x >> shift) >= f
        word = x & WORD_MASK
        x = jnp.where(emit, x >> WORD_BITS, x)

        # emission order within a step is lane-descending (reverse of decode)
        emit_rev = emit[lane_rev]
        off_rev = jnp.cumsum(emit_rev.astype(jnp.int32)) - emit_rev.astype(jnp.int32)
        off = off_rev[lane_rev]
        pos = jnp.where(emit, wptr + off, cap)  # cap -> dropped by scatter
        buf = buf.at[pos].set(word, mode="drop")
        wptr = wptr + jnp.sum(emit.astype(jnp.int32))

        # state update: x' = (x/f) << SB + c + x%f
        q = x // f
        r = x - q * f
        x = (q << scale_bits) + c + r
        return (x, wptr, buf), None

    buf0 = jnp.zeros((cap,), dtype=jnp.uint32)
    (x, wptr, buf), _ = jax.lax.scan(
        step,
        (init_states, jnp.int32(0), buf0),
        (freq.astype(jnp.uint32), cum.astype(jnp.uint32)),
        reverse=True,
    )
    # buffer was written in encode (reverse) order; decode order = reversed prefix
    words = jnp.flip(buf)  # decode-order words live at [cap-n_words:], flipped -> [:n_words]
    # after flip, the first (cap - wptr) entries are the unused zeros; shift:
    words = jnp.roll(words, wptr - cap)
    return words, wptr, x


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
    """
    # sym = number of cdf boundaries <= slot, minus 1
    le = (cdf[:, 1:] <= slots[:, None]).astype(jnp.int32)
    sym = jnp.sum(le, axis=1)
    cum = jnp.take_along_axis(cdf, sym[:, None], axis=1)[:, 0]
    nxt = jnp.take_along_axis(cdf, sym[:, None] + 1, axis=1)[:, 0]
    return sym, nxt - cum, cum
