"""Blocklist admission filtering (stages/blocklists.py)."""

import pyarrow as pa

from pdf_table_extractor_ray.stages.blocklists import (
    blocklist_admit,
    blocklist_hits,
    blocklist_pattern,
)

CATS = {"bad": ["spam", "click here"], "meh": ["slow"]}


def _docs():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "pure content nothing flagged",
                    "SPAM and more Spam spam",  # case-folded, 3 hits
                    "please click here now",  # phrase match
                    "clicked herein spamming",  # word boundaries: no hits
                    None,  # null text → no hits
                ],
                pa.string(),
            ),
        }
    )


def test_pattern_longest_first_and_escaping():
    p = blocklist_pattern(["a.b", "a.b c"])
    assert p == r"\b(?:a\.b\ c|a\.b)\b" or p == r"\b(?:a\.b c|a\.b)\b"


def test_hits_and_admission(ray_session):
    import ray

    out = {
        r["doc_id"]: r
        for r in blocklist_hits(
            ray.data.from_arrow(_docs()), CATS, max_hits=2
        ).take_all()
    }
    assert out[1]["bad_hits"] == 0 and out[1]["admitted"] == 1
    assert out[2]["bad_hits"] == 3 and out[2]["admitted"] == 0
    assert out[3]["bad_hits"] == 1 and out[3]["admitted"] == 1
    assert out[4]["bad_hits"] == 0 and out[4]["meh_hits"] == 0
    assert out[5]["bad_hits"] == 0 and out[5]["admitted"] == 1


def test_admit_gate_keeps_full_rows(ray_session):
    import ray

    kept = blocklist_admit(ray.data.from_arrow(_docs()), CATS, max_hits=0).take_all()
    ids = sorted(r["doc_id"] for r in kept)
    assert ids == [1, 4, 5]
    assert set(kept[0].keys()) == {"doc_id", "text"}


def test_phrase_beats_prefix_term(ray_session):
    import ray

    docs = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["click here click elsewhere"], pa.string()),
        }
    )
    out = blocklist_hits(
        ray.data.from_arrow(docs), {"bad": ["click", "click here"]}
    ).take_all()
    # "click here" consumes the first occurrence (longest-first
    # alternation); the second "click" matches alone → 2 total
    assert out[0]["bad_hits"] == 2


def test_empty_category_blocks_nothing(ray_session):
    """An empty term list must admit everything, not reject everything
    via the degenerate '\\b(?:)\\b' pattern (ADVICE-r4): the pattern
    builder raises, and the hits/admit stages skip empty categories
    while keeping the schema stable."""
    import pytest
    import ray

    with pytest.raises(ValueError):
        blocklist_pattern([])

    ds = ray.data.from_arrow(_docs())
    cats = {"bad": ["spam", "click here"], "empty": []}
    rows = {r["doc_id"]: r for r in blocklist_hits(ds, cats).take_all()}
    assert all(r["empty_hits"] == 0 for r in rows.values())
    # admission is decided only by the non-empty category
    assert [rows[i]["admitted"] for i in (1, 2, 3, 4, 5)] == [1, 0, 0, 1, 1]

    kept = sorted(
        r["doc_id"]
        for r in blocklist_admit(ray.data.from_arrow(_docs()), cats).take_all()
    )
    assert kept == [1, 4, 5]

    # all-empty categories: everything admitted
    kept_all = blocklist_admit(ray.data.from_arrow(_docs()), {"e": []}).count()
    assert kept_all == 5
