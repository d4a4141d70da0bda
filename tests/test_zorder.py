"""Z-order layout keys: bit-exact reference parity and invariants."""

import numpy as np
import pyarrow as pa


def _slow_interleave(a, b, nbits):
    out = 0
    for i in range(nbits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_interleave_reference_parity():
    from pdf_table_extractor_ray.stages.zorder import morton_interleave

    rng = np.random.default_rng(3)
    for nbits in (1, 4, 8, 16, 32):
        a = rng.integers(0, 1 << nbits, 200).astype(np.uint64)
        b = rng.integers(0, 1 << nbits, 200).astype(np.uint64)
        got = morton_interleave(a, b, nbits)
        want = np.array(
            [_slow_interleave(int(x), int(y), nbits) for x, y in zip(a, b)], np.uint64
        )
        assert (got == want).all(), nbits


def test_quantize_edges():
    from pdf_table_extractor_ray.stages.zorder import quantize

    v = np.array([0.0, 5.0, 10.0, -1.0, 11.0])
    q = quantize(v, 0.0, 10.0, 3)  # 8 cells
    assert q.tolist() == [0, 4, 7, 0, 7]  # hi clamps into top cell, lo clamps to 0
    assert quantize(v, 5.0, 5.0, 3).tolist() == [0] * 5  # degenerate bounds


def test_zorder_partition_stats_brute(ray_session):
    """Distributed certificate == single-process numpy replication, and
    z-ordered partitions stay local in BOTH dimensions (each partition
    touches a strict subset of each dimension's cells)."""
    import ray.data

    from pdf_table_extractor_ray.stages.zorder import (
        morton_interleave,
        quantize,
        zorder_partition_stats,
    )

    rng = np.random.default_rng(7)
    n, nbits, n_parts = 5000, 4, 8
    a = rng.uniform(0, 1000, n)
    b = rng.uniform(-50, 50, n)
    ds = ray.data.from_arrow(pa.table({"x": a, "y": b})).repartition(6)
    rows = zorder_partition_stats(ds, "x", "y", nbits=nbits, n_parts=n_parts).take_all()
    got = {r["part"]: (r["n_rows"], r["a_cells"], r["b_cells"]) for r in rows}

    qa = quantize(a, a.min(), a.max(), nbits)
    qb = quantize(b, b.min(), b.max(), nbits)
    z = morton_interleave(qa, qb, nbits)
    width = (1 << (2 * nbits)) // n_parts + 1
    part = (z // np.uint64(width)).astype(np.int64)
    want = {}
    for p in np.unique(part):
        m = part == p
        want[int(p)] = (
            int(m.sum()),
            len(np.unique(qa[m])),
            len(np.unique(qb[m])),
        )
    assert got == want
    assert sum(v[0] for v in got.values()) == n
    cells = 1 << nbits
    for p, (_nr, ac, bc) in got.items():
        # locality: a partition never spans a whole dimension
        assert ac < cells and bc < cells, p
