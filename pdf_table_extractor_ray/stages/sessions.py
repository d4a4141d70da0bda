"""Sessionization — a windowed aggregate the Dataset API lacks as a
primitive (SURVEY §2.6 "absent in the reference"; built per the task's
custom-operator guidance: groupby().map_groups with an explicit
partitioning assumption).

Partitioning assumption: one user's events fit in one group (true for
user-keyed web/event data at any realistic per-user volume); the hash
shuffle moves only the projected (user_id, ts, value) columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def sessionize(
    events: "ray.data.Dataset",
    gap_us: int = DEFAULT_GAP_US,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> "ray.data.Dataset":
    """Per-user session summary: a new session starts when the gap
    since the previous event exceeds ``gap_us``.

    Returns (user_id, session_id, n_events, start_ts_us, end_ts_us)
    with session_id numbered 1.. per user in time order.
    """

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_arrays(
            [batch.column(user_col), pc.cast(batch.column(ts_col), pa.int64())],
            names=["user_id", "ts_us"],
        )

    def per_user(group: pa.Table) -> pa.Table:
        ts = np.sort(group.column("ts_us").to_numpy(zero_copy_only=False))
        uid = group.column("user_id")[0].as_py()
        if len(ts) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 5,
                names=["user_id", "session_id", "n_events", "start_ts_us", "end_ts_us"],
            )
        new_session = np.empty(len(ts), dtype=bool)
        new_session[0] = True
        new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
        sess = np.cumsum(new_session)  # 1-based session ids
        starts = ts[new_session]
        bounds = np.nonzero(new_session)[0].tolist() + [len(ts)]
        n_events = np.diff(bounds)
        ends = ts[np.array(bounds[1:]) - 1]
        n = len(starts)
        return pa.Table.from_arrays(
            [
                pa.array([uid] * n, pa.int64()),
                pa.array(np.arange(1, n + 1, dtype=np.int64)),
                pa.array(n_events.astype(np.int64)),
                pa.array(starts, pa.int64()),
                pa.array(ends, pa.int64()),
            ],
            names=["user_id", "session_id", "n_events", "start_ts_us", "end_ts_us"],
        )

    projected = events.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return projected.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
