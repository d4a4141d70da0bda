"""Incremental dedup against a persisted fingerprint index
(pipelines/incremental.py:dedup_index_append / dedup_against_index)."""

import glob

import pyarrow as pa

from pdf_table_extractor_ray.pipelines.incremental import (
    dedup_against_index,
    dedup_index_append,
)


def _docs(rows):
    ids, texts = zip(*rows)
    return pa.table(
        {
            "doc_id": pa.array(list(ids), pa.int64()),
            "text": pa.array(list(texts), pa.string()),
        }
    )


def test_three_run_rolling_dedup(ray_session, tmp_path):
    import ray

    idx = str(tmp_path / "fp")
    run1 = ray.data.from_arrow(_docs([(1, "alpha"), (2, "beta")]))
    dedup_index_append(run1, idx)
    assert glob.glob(idx + "/fp-*.parquet") and not glob.glob(idx + "/*.tmp")

    # run 2: one re-crawl of run1 content, one internal dup pair, one new
    run2 = ray.data.from_arrow(
        _docs([(10, "alpha"), (11, "gamma"), (12, "gamma"), (13, "delta")])
    )
    kept2 = dedup_against_index(run2, idx)
    ids2 = sorted(r["doc_id"] for r in kept2.take_all())
    assert ids2 == [11, 13]  # alpha known; gamma keeps min id; delta new

    # roll the index forward with run 2's survivors, then run 3 sees both
    dedup_index_append(kept2, idx)
    run3 = ray.data.from_arrow(_docs([(20, "gamma"), (21, "epsilon")]))
    ids3 = sorted(r["doc_id"] for r in dedup_against_index(run3, idx).take_all())
    assert ids3 == [21]


def test_survivors_keep_full_rows(ray_session, tmp_path):
    import ray

    idx = str(tmp_path / "fp")
    dedup_index_append(ray.data.from_arrow(_docs([(1, "old")])), idx)
    run = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([5, 6], pa.int64()),
                "text": pa.array(["old", "new"], pa.string()),
                "lang": pa.array(["en", "de"], pa.string()),
            }
        )
    )
    out = dedup_against_index(run, idx).take_all()
    assert len(out) == 1
    assert out[0] == {"doc_id": 6, "text": "new", "lang": "de"}
