"""Calendar densification (time-series gap fill) — generate the dense
periodic grid over a time range and left-join aggregated facts onto
it, so buckets with no facts surface as explicit fill rows (the rows a
plain GROUP BY silently loses). SURVEY §2.6 "absent in the reference";
the reference never needs it because its statements are already dense.

Scale shape: the heavy side (the fact aggregation) happens BEFORE this
operator with the usual partial-combiner pattern; what arrives here is
one row per POPULATED bucket. The grid is generated distributed
(``ray.data.range`` → arithmetic map, no driver loop) and the fill is
a hash-shuffle LEFT OUTER join on the bucket key — no driver-side
materialization of either side, so it holds even when the bucket
domain itself is large (per-key × per-minute grids).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def dense_time_fill(
    agg: "ray.data.Dataset",
    time_col: str,
    value_col: str,
    step_us: int,
    lo_us: int,
    hi_us: int,
    fill: int = 0,
) -> "ray.data.Dataset":
    """Densify ``agg`` (one row per populated time bucket, int64
    ``time_col`` in epoch-us aligned to ``step_us``) over the
    inclusive grid ``lo_us, lo_us+step_us, …, hi_us``: every grid
    bucket appears exactly once, missing buckets carry
    ``value_col = fill``. ``value_col`` must be int64 (exactness
    contract). Buckets in ``agg`` outside the grid are dropped by the
    grid-side join direction.
    """
    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    if step_us <= 0 or hi_us < lo_us:
        raise ValueError(f"dense_time_fill: bad grid [{lo_us}, {hi_us}] step {step_us}")
    n = (hi_us - lo_us) // step_us + 1

    def to_bucket(b: pa.Table) -> pa.Table:
        i = b.column("id").to_numpy(zero_copy_only=False)
        return pa.table({time_col: pa.array(lo_us + i * step_us, pa.int64())})

    grid = ray.data.range(n).map_batches(to_bucket, batch_format="pyarrow")
    joined = hash_shuffle_join(grid, agg, on=time_col, how="left")

    def coalesce(b: pa.Table) -> pa.Table:
        v = pc.coalesce(pc.cast(b.column(value_col), pa.int64()), pa.scalar(fill, pa.int64()))
        return pa.table({time_col: b.column(time_col), value_col: v})

    return joined.map_batches(coalesce, batch_format="pyarrow")
