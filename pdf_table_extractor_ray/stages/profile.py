"""Table profiling — the ANALYZE/statistics pass a catalog needs
before planning over an unknown 100 TB table.

One streaming pass over the dataset computes, per column: row count,
null count, HLL approximate distinct (the same 2^12-register sketch as
``sketches.hll_registers`` — mergeable, 4 KB per (batch, column)),
numeric min/max (float64 view, also covers timestamps as µs) and
lexicographic min/max for string columns. Per-batch partials are one
row per column; the merge is ONE ``groupby(column)`` whose group count
is the COLUMN count — bounded by the schema, never by the data — so
``map_groups`` is safe here by the same bounded-domain contract as
per-nation windows.

The reference repo eyeballs intermediate DataFrames to understand its
inputs (debug_dataframes, ``conversor_itau.py:75-86``; first-5-line
echoes, ``conversor_caixa.py:112-114``); this operator is that
instinct as a distributed primitive.

Output: (column, dtype, n_rows, n_nulls, approx_distinct,
min_num, max_num, min_str, max_str) — ``min_num``/``max_num`` are null
for non-numeric columns, ``min_str``/``max_str`` null for non-string.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pdf_table_extractor_ray.stages.sketches import hll_estimate, hll_registers

_M = 1 << 12  # register count, matches sketches.HLL_P


def _col_partial(name: str, col) -> dict:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    n = len(col)
    n_null = col.null_count
    regs = hll_registers(col) if n > n_null else np.zeros(_M, np.uint8)
    vmin = vmax = None
    smin = smax = None
    valid = col.drop_null()
    if len(valid):
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            mm = pc.min_max(valid)
            vmin, vmax = float(mm["min"].as_py()), float(mm["max"].as_py())
        elif pa.types.is_timestamp(t) or pa.types.is_date(t):
            iv = pc.cast(pc.cast(valid, pa.timestamp("us")), pa.int64())
            mm = pc.min_max(iv)
            vmin, vmax = float(mm["min"].as_py()), float(mm["max"].as_py())
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            mm = pc.min_max(valid)
            smin, smax = mm["min"].as_py(), mm["max"].as_py()
    return {
        "column": name,
        "dtype": str(t),
        "n_rows": n,
        "n_nulls": n_null,
        "regs": regs.tobytes(),
        "min_num": vmin,
        "max_num": vmax,
        "min_str": smin,
        "max_str": smax,
    }


_PARTIAL_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("dtype", pa.string()),
        ("n_rows", pa.int64()),
        ("n_nulls", pa.int64()),
        ("regs", pa.binary()),
        ("min_num", pa.float64()),
        ("max_num", pa.float64()),
        ("min_str", pa.string()),
        ("max_str", pa.string()),
    ]
)


def table_profile(
    ds: "ray.data.Dataset", columns: Optional[List[str]] = None
) -> "ray.data.Dataset":
    """Profile ``columns`` (default: all) of ``ds`` in one pass;
    returns one row per column, ordered by column name."""

    def partial(b: pa.Table) -> pa.Table:
        cols = columns or b.column_names
        return pa.Table.from_pylist(
            [_col_partial(c, b.column(c)) for c in cols], schema=_PARTIAL_SCHEMA
        )

    def merge(g: pa.Table) -> pa.Table:
        regs = np.zeros(_M, np.uint8)
        for r in g.column("regs").to_pylist():
            regs = np.maximum(regs, np.frombuffer(r, np.uint8))
        nn = pc.sum(g.column("n_rows")).as_py() or 0
        approx = 0 if nn == (pc.sum(g.column("n_nulls")).as_py() or 0) else int(
            round(hll_estimate(regs))
        )

        def agg(col, fn):
            v = g.column(col).drop_null()
            return fn(v).as_py() if len(v) else None

        return pa.Table.from_pylist(
            [
                {
                    "column": g.column("column")[0].as_py(),
                    "dtype": g.column("dtype")[0].as_py(),
                    "n_rows": nn,
                    "n_nulls": pc.sum(g.column("n_nulls")).as_py() or 0,
                    "approx_distinct": approx,
                    "min_num": agg("min_num", pc.min),
                    "max_num": agg("max_num", pc.max),
                    "min_str": agg("min_str", pc.min),
                    "max_str": agg("max_str", pc.max),
                }
            ],
            schema=pa.schema(
                [
                    ("column", pa.string()),
                    ("dtype", pa.string()),
                    ("n_rows", pa.int64()),
                    ("n_nulls", pa.int64()),
                    ("approx_distinct", pa.int64()),
                    ("min_num", pa.float64()),
                    ("max_num", pa.float64()),
                    ("min_str", pa.string()),
                    ("max_str", pa.string()),
                ]
            ),
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        # group count == column count: bounded by the schema, so
        # map_groups here is per-COLUMN Python, not per-key-value
        .groupby("column")
        .map_groups(merge, batch_format="pyarrow")
        .sort("column")
    )
