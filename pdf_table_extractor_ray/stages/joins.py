"""Join operators.

The reference's only join-like op is a dead-code broadcast of header
info onto content rows (`add_infos`, conversor_itau.py:119-123 — T5 in
SURVEY §2.6). Generalized here as the canonical small-side broadcast
join: the build side is collected ONCE into an Arrow hash map, shipped
through one ``ray.put``, and probed inside every ``map_batches`` task —
no shuffle of the probe side, which is the only join strategy that
makes sense when one side is orders of magnitude smaller (dimension
tables, per-host metadata) at 100 TB probe scale.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data


def broadcast_join(
    probe: "ray.data.Dataset",
    build: "ray.data.Dataset",
    key: str,
    build_key: Optional[str] = None,
    build_cols: Optional[List[str]] = None,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Join ``probe`` (large, streamed) with ``build`` (small,
    broadcast) on ``key``. ``how`` ∈ {inner, left}.

    The build side is materialized to the driver — by contract it is a
    dimension-table-sized input (the caller is asserting smallness by
    choosing a broadcast join).
    """
    if build_key is None:
        build_key = key
    build_tbl = pa.Table.from_pylist(build.take_all())
    if build_cols is None:
        build_cols = [c for c in build_tbl.column_names if c != build_key]
    keys = build_tbl.column(build_key).to_pylist()
    lookup: Dict = {}
    for i, k in enumerate(keys):
        lookup.setdefault(k, i)  # first match wins (deterministic)
    payload = {c: build_tbl.column(c).to_pylist() for c in build_cols}
    handle = ray.put((lookup, payload, build_cols))

    def probe_batch(batch: pa.Table) -> pa.Table:
        lk, pl, cols = ray.get(handle)
        probe_keys = batch.column(key).to_pylist()
        idx = np.array([lk.get(k, -1) for k in probe_keys], dtype=np.int64)
        hit = idx >= 0
        out = batch
        if how == "inner":
            out = out.filter(pa.array(hit))
            idx = idx[hit]
        for c in cols:
            vals = pl[c]
            col = [vals[i] if i >= 0 else None for i in idx]
            out = out.append_column(c, pa.array(col))
        return out

    return probe.map_batches(probe_batch, batch_format="pyarrow", zero_copy_batch=True)
