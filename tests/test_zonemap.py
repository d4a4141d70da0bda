"""Zone-map file pruning (stages/zonemap.py): clustered layouts skip
files, unclustered layouts stay correct, stats-less files are read
conservatively, empty bands keep the schema."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdf_table_extractor_ray.stages.zonemap import build_zone_map, pruned_read


def _write(path, vals, stats=True):
    pq.write_table(
        pa.table({"v": pa.array(vals, pa.int64()), "tag": pa.array([os.path.basename(path)] * len(vals))}),
        path,
        write_statistics=stats,
    )
    return path


def test_clustered_layout_prunes(ray_session, tmp_path):
    paths = [
        _write(str(tmp_path / f"f{i}.parquet"), list(range(i * 100, i * 100 + 100)))
        for i in range(8)
    ]
    zmap = build_zone_map(paths, "v")
    assert [z["min"] for z in zmap] == [i * 100 for i in range(8)]
    assert all(z["rows"] == 100 for z in zmap)

    ds, cert = pruned_read(paths, "v", 150, 320)
    assert cert.files_total == 8 and cert.files_read == 3  # f1, f2, f3
    got = sorted(r["v"] for r in ds.take_all())
    assert got == list(range(150, 321))  # residual filter still exact


def test_unclustered_layout_reads_all_still_correct(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    all_vals = rng.permutation(400)
    paths = [
        _write(str(tmp_path / f"r{i}.parquet"), all_vals[i * 100 : (i + 1) * 100].tolist())
        for i in range(4)
    ]
    ds, cert = pruned_read(paths, "v", 50, 99)
    assert cert.files_read == 4  # random layout: every envelope intersects
    assert sorted(r["v"] for r in ds.take_all()) == list(range(50, 100))


def test_statless_file_read_conservatively(ray_session, tmp_path):
    p1 = _write(str(tmp_path / "a.parquet"), [0, 1, 2])
    p2 = _write(str(tmp_path / "b.parquet"), [1000, 1001], stats=False)
    zmap = build_zone_map([p1, p2], "v")
    nostats = [z for z in zmap if z["min"] is None]
    assert len(nostats) == 1  # b.parquet carries no envelope
    ds, cert = pruned_read([p1, p2], "v", 0, 5)
    # b must be READ (no envelope → cannot prove disjoint) but its rows
    # are filtered out by the residual predicate
    assert cert.files_read == 2
    assert sorted(r["v"] for r in ds.take_all()) == [0, 1, 2]


def test_empty_band_keeps_schema(ray_session, tmp_path):
    paths = [_write(str(tmp_path / "x.parquet"), [10, 20])]
    ds, cert = pruned_read(paths, "v", 500, 600)
    assert cert.files_read == 0 and cert.files_skipped == 1
    assert ds.count() == 0
    assert set(ds.schema().names) == {"v", "tag"}


def test_bloom_pruned_read_parity_and_prune(ray_session, tmp_path):
    """Bloom-index point lookup: result parity vs a direct IN filter,
    real file skipping on a key-split layout, empty-probe path, and
    index reuse across lookups."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_table_extractor_ray.stages.zonemap import (
        bloom_pruned_read,
        build_bloom_index,
    )

    rng = np.random.default_rng(13)
    keys = np.arange(4000, dtype=np.int64)
    vals = rng.integers(0, 1000, size=4000)
    paths = []
    for i in range(8):
        sl = slice(i * 500, (i + 1) * 500)
        p = str(tmp_path / f"part-{i}.parquet")
        pq.write_table(pa.table({"k": keys[sl], "v": vals[sl]}), p)
        paths.append(p)

    idx = build_bloom_index(paths, "k")
    probe = [3, 777, 3999, 10**9]  # three present (files 0, 1, 7), one absent
    ds, cert = bloom_pruned_read(paths, "k", probe, index=idx)
    got = sorted((r["k"], r["v"]) for r in ds.take_all())
    want = sorted((int(k), int(v)) for k, v in zip(keys, vals) if k in probe)
    assert got == want
    assert cert.files_total == 8 and 3 <= cert.files_read < 8

    # all-absent probe: zero files read, empty result, schema intact
    ds0, cert0 = bloom_pruned_read(paths, "k", [10**9, 10**9 + 1], index=idx)
    assert cert0.files_read == 0 and ds0.take_all() == []


def test_compact_shards_row_preserving(ray_session, tmp_path):
    """Compaction: exact row-multiset parity, deterministic FFD plan,
    oversize files get their own bin, certificate consistency."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_table_extractor_ray.stages.compaction import (
        compact_shards,
        plan_compaction,
    )

    rng = np.random.default_rng(29)
    paths = []
    all_rows = []
    for i in range(10):
        n = int(rng.integers(5, 400))  # very uneven file sizes
        ks = rng.integers(0, 10**6, size=n).astype(np.int64)
        all_rows += ks.tolist()
        p = str(tmp_path / f"in-{i}.parquet")
        pq.write_table(pa.table({"k": ks}), p)
        paths.append(p)

    target = 3 * max(os.path.getsize(p) for p in paths)
    plan = plan_compaction(paths, target)
    assert plan == plan_compaction(list(reversed(paths)), target)  # deterministic
    assert sorted(p for b in plan for p in b) == sorted(paths)

    out = str(tmp_path / "out")
    cert = compact_shards(paths, out, target_bytes=target)
    assert cert.files_in == 10 and cert.files_out == len(plan) < 10
    assert cert.rows == len(all_rows)
    got = []
    for f in sorted(os.listdir(out)):
        got += pq.read_table(os.path.join(out, f)).column("k").to_pylist()
    assert sorted(got) == sorted(all_rows)

    # a file bigger than the target compacts alone
    big = str(tmp_path / "big.parquet")
    pq.write_table(pa.table({"k": np.arange(50000, dtype=np.int64)}), big)
    plan2 = plan_compaction([*paths, big], target_bytes=os.path.getsize(big) // 2)
    assert [big] in plan2
