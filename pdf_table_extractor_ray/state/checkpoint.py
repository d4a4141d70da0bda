"""Checkpointed iterative computation — resume for multi-round jobs.

The extraction pipeline already resumes per-partition (lineage
records); ITERATIVE jobs (BFS, PageRank, label propagation, k-core)
carry a state TABLE across rounds instead, and at 100 TB a 40-round
graph job that dies at round 37 must not start over. This harness
makes any fixed-point loop resumable:

- after each round the carried state writes to
  ``<dir>/round=K/`` as parquet, committed by an atomic ``_COMPLETE``
  marker (write → fsync-free rename-equivalent: the marker is written
  LAST, so a torn round directory is simply ignored on resume);
- a rerun reads the highest complete round and continues from it —
  the step function never knows it was resumed;
- early convergence is recorded in the marker (``done``), so a
  resumed converged job returns immediately.

State tables must be deterministic per round for resume-equivalence
(true of every iterative op in this repo — integer arithmetic,
layout-invariant kernels), and the checkpoint I/O is one parquet
write of the CARRIED STATE only (slim (node, value) rows, never
edges/adjacency — those rebuild from the immutable input).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable, Optional, Tuple

import ray.data


def _round_dir(ckpt_dir: str, r: int) -> str:
    return os.path.join(ckpt_dir, f"round={r}")


def _marker(ckpt_dir: str, r: int) -> str:
    return os.path.join(_round_dir(ckpt_dir, r), "_COMPLETE")


def latest_checkpoint(ckpt_dir: str) -> Optional[Tuple[int, bool]]:
    """(round, done) of the highest COMMITTED round, or None."""
    best = None
    if not os.path.isdir(ckpt_dir):
        return None
    for name in os.listdir(ckpt_dir):
        if not name.startswith("round="):
            continue
        try:
            r = int(name.split("=", 1)[1])
        except ValueError:
            continue
        m = _marker(ckpt_dir, r)
        if os.path.exists(m):
            with open(m) as f:
                meta = json.load(f)
            if best is None or r > best[0]:
                best = (r, bool(meta.get("done", False)))
    return best


def run_checkpointed(
    initial: "ray.data.Dataset",
    step: Callable[["ray.data.Dataset", int], Tuple["ray.data.Dataset", bool]],
    rounds: int,
    ckpt_dir: str,
) -> "ray.data.Dataset":
    """Run ``state = step(state, r)`` for ``r`` in 1..rounds with a
    committed checkpoint after every round; resume from the highest
    committed round on rerun. ``step`` returns (next_state, done) —
    ``done=True`` ends the loop early and is itself checkpointed.

    Returns the final state as a Dataset (read back from the last
    checkpoint, so the result is exactly what a resumed run would
    see)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    last = latest_checkpoint(ckpt_dir)
    if last is None:
        state = initial
        start, done = 0, False
        _commit(state, ckpt_dir, 0, done=False)
    else:
        start, done = last
        state = _read_round(ckpt_dir, start)
    r = start
    while not done and r < rounds:
        r += 1
        state, done = step(state, r)
        state = _commit(state, ckpt_dir, r, done=done or r == rounds)
        done = done or r == rounds
    return state


def _commit(state: "ray.data.Dataset", ckpt_dir: str, r: int, done: bool):
    """Write round r's state and publish the marker LAST (torn writes
    leave an uncommitted directory that resume ignores)."""
    d = _round_dir(ckpt_dir, r)
    if os.path.isdir(d):
        # an UNCOMMITTED leftover from a torn run: replace, never append
        shutil.rmtree(d)
    os.makedirs(d)
    state.write_parquet(d)
    with open(_marker(ckpt_dir, r), "w") as f:
        json.dump({"round": r, "done": done}, f)
    # re-read: the continuing loop (and the caller) consume the
    # committed bytes, so straight and resumed runs see identical state
    return _read_round(ckpt_dir, r)


def _read_round(ckpt_dir: str, r: int) -> "ray.data.Dataset":
    """Read one round's parquet WITHOUT hive-partition inference (the
    ``round=K`` directory name must not become a column) and without
    picking up the marker file."""
    d = _round_dir(ckpt_dir, r)
    files = [
        os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
    ]
    return ray.data.read_parquet(files, partitioning=None)
