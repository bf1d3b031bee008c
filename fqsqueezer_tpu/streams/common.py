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


def from_grid_vec(y: jax.Array, n_lanes: int, L: int) -> jax.Array:
    """[T, N, D] -> [R, L, D] (vector-valued per-position outputs)."""
    T, N, D = y.shape
    r_pl = T // L
    return y.reshape(r_pl, L, N, D).transpose(2, 0, 1, 3).reshape(
        N * r_pl, L, D)


def to_read_grid(x: jax.Array, n_lanes: int) -> jax.Array:
    """[R] per-read values -> [N, r_pl] (lane-major)."""
    return x.reshape(n_lanes, -1)


def to_row_blocks(x: jax.Array, n_lanes: int) -> jax.Array:
    """[R, L, ...] -> [r_pl, N, L, ...]: row rd holds read rd of every lane
    (read r = lane * r_pl + rd). Rows are the in-batch sync granularity of
    the local statistics (see streams/dna.py)."""
    R, L = x.shape[:2]
    r_pl = R // n_lanes
    return x.reshape((n_lanes, r_pl, L) + x.shape[2:]).swapaxes(0, 1)


def from_row_blocks(y: jax.Array) -> jax.Array:
    """[r_pl, N, L, ...] -> [R, L, ...]."""
    r_pl, N, L = y.shape[:3]
    return y.swapaxes(0, 1).reshape((N * r_pl, L) + y.shape[3:])


def pad_reads(n: int, n_lanes: int) -> int:
    """Smallest multiple of n_lanes >= n."""
    return -(-n // n_lanes) * n_lanes
