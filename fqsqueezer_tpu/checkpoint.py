"""Checkpoint / resume: codec-state snapshots at group boundaries.

The reference has no checkpointing (SURVEY.md §5): block N's decode depends on
all prior blocks' k-mer table state, so decompression is strictly serial from
the start. Here the archive is group-framed (archive.py) and the full codec
state is a flat pytree of dense integer arrays, so a snapshot per group gives:

  * resumable decompression — restart from group k after an interruption;
  * parallel decode — workers start at different groups from snapshots;
  * compression restart — the encoder state is the same pytree.

Snapshots are plain .npz (integer arrays only, no pickle).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .pipeline import CodecState
from .streams import dna


def state_to_arrays(state: CodecState) -> dict:
    out = {
        "dna_siv": np.asarray(state.dna.siv),
        "dna_s_tc": np.asarray(state.dna.s_tc),
        "dna_b_tc": np.asarray(state.dna.b_tc),
        "dna_model": np.asarray(state.dna.model),
        "meta": np.asarray(state.meta),
    }
    if state.dna.pe is not None:
        # PE anchor state: (pair tags, vlo, vhi, cnt, pe stream model) —
        # resuming a PE archive without it would replay an empty pair table
        # and diverge from the encoder's anchor choices
        for i, a in enumerate(state.dna.pe):
            out[f"dna_pe_{i}"] = np.asarray(a)
    if state.qual is not None:
        out["qual"] = np.asarray(state.qual)
    if state.id is not None:
        out["id"] = np.asarray(state.id)
    return out


def arrays_to_state(d: dict) -> CodecState:
    return CodecState(
        dna=dna.DnaState(
            siv=jnp.asarray(d["dna_siv"]),
            s_tc=jnp.asarray(d["dna_s_tc"]),
            b_tc=jnp.asarray(d["dna_b_tc"]),
            model=jnp.asarray(d["dna_model"]),
            pe=(tuple(jnp.asarray(d[f"dna_pe_{i}"]) for i in range(5))
                if "dna_pe_0" in d else None)),
        meta=jnp.asarray(d["meta"]),
        qual=jnp.asarray(d["qual"]) if "qual" in d else None,
        id=jnp.asarray(d["id"]) if "id" in d else None)


def save_state(state: CodecState, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **state_to_arrays(state))


def load_state(path: str) -> CodecState:
    with np.load(path) as z:
        return arrays_to_state(dict(z.items()))


def snapshot_path(prefix: str, group_idx: int) -> str:
    return f"{prefix}.g{group_idx:05d}.npz"
