"""k-means|| scalable seeding (stages/similarity.py:kmeans_parallel_init)."""

import numpy as np
import pyarrow as pa
import pytest


def _planted(n_per=60, k=4, d=16, seed=9):
    rng = np.random.default_rng(seed)
    modes = rng.normal(size=(k, d))
    modes /= np.linalg.norm(modes, axis=1, keepdims=True)
    vecs, labels = [], []
    for c in range(k):
        pts = modes[c] + 0.05 * rng.normal(size=(n_per, d))
        vecs.append(pts)
        labels += [c] * n_per
    m = np.vstack(vecs)
    ids = np.arange(len(m), dtype=np.int64)
    perm = rng.permutation(len(m))
    return m[perm], np.array(labels)[perm], ids


@pytest.fixture(scope="module")
def planted_ds(ray_session):
    import ray.data

    m, labels, ids = _planted()
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(m.tolist(), pa.list_(pa.float64())),
        }
    )
    return m, labels, ray.data.from_arrow(tbl).repartition(6)


def test_kmeanspp_recovers_planted_modes(planted_ds):
    from pdf_table_extractor_ray.stages.similarity import (
        kmeans_assign,
        kmeans_parallel_init,
    )

    m, labels, ds = planted_ds
    cents = kmeans_parallel_init(ds, k=4, seed=3)
    assert cents.shape == (4, m.shape[1])
    rows = kmeans_assign(ds, centroids=cents).take_all()
    byid = {r["vec_id"]: r["cluster"] for r in rows}
    # each planted mode maps (almost) entirely to one distinct cluster
    ids = np.arange(len(m))
    purity_total = 0
    used = set()
    for c in range(4):
        members = [byid[i] for i in ids[labels == c]]
        top = max(set(members), key=members.count)
        purity_total += members.count(top)
        used.add(top)
    assert len(used) == 4  # modes land in distinct clusters
    assert purity_total / len(m) > 0.95


def test_kmeanspp_layout_invariant(planted_ds):
    from pdf_table_extractor_ray.stages.similarity import kmeans_parallel_init

    m, _labels, ds = planted_ds
    a = kmeans_parallel_init(ds, k=3, seed=7)
    b = kmeans_parallel_init(ds.repartition(2), k=3, seed=7)
    assert np.allclose(a, b)


def test_kmeanspp_candidate_bound_and_degenerate(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import kmeans_parallel_init

    # all-identical corpus: phi = 0 after the first candidate → early
    # exit with a single center
    tbl = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array([[1.0, 0.0, 0.0]] * 50, pa.list_(pa.float64())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    cents = kmeans_parallel_init(ds, k=5, seed=1)
    assert cents.shape[0] == 1
    assert np.allclose(cents[0], [1.0, 0.0, 0.0])
