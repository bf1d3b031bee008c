"""Lane-grid plumbing shared by all stream codecs.

A batch of R reads (R a multiple of n_lanes N) is processed by N interleaved
rANS lanes; lane l owns the contiguous read range [l*R/N, (l+1)*R/N) and steps
through its reads sequentially (read-major, position-minor), mirroring the
reference's per-thread contiguous read ranges (reads_block.h:197-214). Batches
are padded with zero-length reads, which cost zero bits (masked rANS no-ops).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def to_grid(x: jax.Array, n_lanes: int) -> jax.Array:
    """[R, L] per-read values -> [T, N] lane grid with T = (R/N)*L,
    t = read_in_lane * L + position."""
    R, L = x.shape
    r_pl = R // n_lanes
    return x.reshape(n_lanes, r_pl, L).transpose(1, 2, 0).reshape(r_pl * L, n_lanes)


def from_grid(y: jax.Array, n_lanes: int, L: int) -> jax.Array:
    """[T, N] -> [R, L]."""
    T, N = y.shape
    r_pl = T // L
    return y.reshape(r_pl, L, N).transpose(2, 0, 1).reshape(N * r_pl, L)


def to_read_grid(x: jax.Array, n_lanes: int) -> jax.Array:
    """[R] per-read values -> [N, r_pl] (lane-major)."""
    return x.reshape(n_lanes, -1)


def pad_reads(n: int, n_lanes: int) -> int:
    """Smallest multiple of n_lanes >= n."""
    return -(-n // n_lanes) * n_lanes
