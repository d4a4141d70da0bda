"""Incremental rollup maintenance (pipelines/incremental.py):
delta-only updates, changed-shard retraction, shard removal,
no-op idempotence, generation atomicity."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from pdf_table_extractor_ray.pipelines.incremental import (
    RollupSpec,
    current_generation,
    update_rollup,
)


def _spec() -> RollupSpec:
    def combine(b: pa.Table) -> pa.Table:
        k = b.column("k").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, v)
        n = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(uk, pa.int64()),
                "total": pa.array(s, pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    return RollupSpec(keys=("k",), measures=("total", "n"), combine=combine)


def _write_shard(path: str, ks, vs) -> str:
    pq.write_table(
        pa.table({"k": pa.array(ks, pa.int64()), "v": pa.array(vs, pa.int64())}),
        path,
    )
    return path


def _snap_dict(ds) -> dict:
    return {r["k"]: (r["total"], r["n"]) for r in ds.take_all()}


def test_incremental_rollup_lifecycle(ray_session, tmp_path):
    store = str(tmp_path / "store")
    s1 = _write_shard(str(tmp_path / "s1.parquet"), [1, 1, 2], [10, 20, 5])
    s2 = _write_shard(str(tmp_path / "s2.parquet"), [2, 3], [7, 100])

    # add shard 1
    snap = update_rollup(store, _spec(), {"a": s1})
    assert _snap_dict(snap) == {1: (30, 2), 2: (5, 1)}
    assert current_generation(store) == 1

    # add shard 2 — only the new shard's keys change
    snap = update_rollup(store, _spec(), {"a": s1, "b": s2})
    assert _snap_dict(snap) == {1: (30, 2), 2: (12, 2), 3: (100, 1)}
    g2 = current_generation(store)
    assert g2 == 2

    # no-op: same shard set + fingerprints → snapshot unchanged, no new gen
    snap = update_rollup(store, _spec(), {"a": s1, "b": s2})
    assert _snap_dict(snap) == {1: (30, 2), 2: (12, 2), 3: (100, 1)}
    assert current_generation(store) == g2

    # changed shard: rewrite s2 with different rows → old contribution
    # retracted, new one added (parity with a full recompute)
    _write_shard(str(tmp_path / "s2.parquet"), [3, 4], [1, 2])
    snap = update_rollup(store, _spec(), {"a": s1, "b": s2})
    assert _snap_dict(snap) == {1: (30, 2), 2: (5, 1), 3: (1, 1), 4: (2, 1)}
    assert current_generation(store) == g2 + 1

    # removed shard: key 2 came only from s1 — removing s1 retracts
    # keys 1 and 2 entirely (zero rows must vanish, not linger)
    snap = update_rollup(store, _spec(), {"b": s2})
    assert _snap_dict(snap) == {3: (1, 1), 4: (2, 1)}


def test_incremental_rollup_crash_atomicity(ray_session, tmp_path):
    """A torn generation directory (crash after writing gen files but
    before the _CURRENT swap) is rewritten wholesale on rerun; the
    store never serves a half-written snapshot."""
    store = str(tmp_path / "store")
    s1 = _write_shard(str(tmp_path / "s1.parquet"), [1], [10])
    update_rollup(store, _spec(), {"a": s1})

    # simulate a crashed second update: gen=2 exists, _CURRENT still 1
    torn = os.path.join(store, "gen=2")
    os.makedirs(os.path.join(torn, "snapshot.parquet"), exist_ok=True)
    with open(os.path.join(torn, "state.json"), "w") as f:
        f.write("{bogus")
    assert current_generation(store) == 1

    s2 = _write_shard(str(tmp_path / "s2.parquet"), [2], [7])
    snap = update_rollup(store, _spec(), {"a": s1, "b": s2})
    assert _snap_dict(snap) == {1: (10, 1), 2: (7, 1)}
    assert current_generation(store) == 2


def test_incremental_matches_oneshot(ray_session, tmp_path):
    """Random shard streams: incremental fold == one-shot rollup."""
    rng = np.random.default_rng(7)
    store = str(tmp_path / "store")
    shards = {}
    want_k = np.array([], np.int64)
    want_v = np.array([], np.int64)
    for i in range(5):
        ks = rng.integers(0, 20, size=50)
        vs = rng.integers(-100, 100, size=50)
        p = _write_shard(str(tmp_path / f"r{i}.parquet"), ks, vs)
        shards[str(i)] = p
        want_k = np.concatenate([want_k, ks])
        want_v = np.concatenate([want_v, vs])
        snap = update_rollup(store, _spec(), dict(shards))
    got = _snap_dict(snap)
    uk = np.unique(want_k)
    for k in uk:
        m = want_k == k
        tot, n = int(want_v[m].sum()), int(m.sum())
        if tot == 0 and n == 0:
            assert k not in got
        else:
            assert got[int(k)] == (tot, n), k
