"""Local replica of the driver's correctness gate: run each
``queries()`` entry AND its ``oracle_sql()`` on the same sf dir,
compare row count + schema + order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [name_substr,name_substr,...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()


def main(sf_dir: str, only=None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from bench import _quiet_empty_bundle_warnings

    _quiet_empty_bundle_warnings()

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and not any(s in name for s in only):
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"{name:24s} RAY-ERROR {type(exc).__name__}: {exc}")
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only   rows={len(mine):>8d}  {elapsed:5.1f}s")
            continue
        want = con.sql(oracles[name]).df()
        ok_rows = len(mine) == len(want)
        ok_cols = sorted(mine.columns) == sorted(want.columns)
        ok_vals = ok_rows and ok_cols and value_hash(mine) == value_hash(want)
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
        if status != "OK":
            failures.append(name)
        print(
            f"{name:24s} {status:9s} rows={len(mine):>8d}/{len(want):<8d} "
            f"cols={'=' if ok_cols else sorted(mine.columns)} vals={'=' if ok_vals else 'DIFF'}  {elapsed:5.1f}s"
        )
        if status != "OK" and ok_rows and ok_cols:
            m = mine[sorted(mine.columns)].sort_values(sorted(mine.columns)).reset_index(drop=True)
            w = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
            diff = (m != w) & ~(m.isna() & w.isna())
            bad = diff.any(axis=1)
            print(m[bad].head(3))
            print(w[bad].head(3))
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            sys.argv[2].split(",") if len(sys.argv) > 2 else None,
        )
    )
