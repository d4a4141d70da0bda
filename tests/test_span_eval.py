"""Span-eval harness (stages/span_eval.py): explode, segmented
interval sweep vs a brute-force reference, P/R/F rollup."""

import random

import numpy as np
import pyarrow as pa

from pdf_table_extractor_ray.stages.span_eval import (
    explode_spans,
    prf_rollup,
    span_overlap_by_url,
)


def _spans_table(rows):
    span_t = pa.list_(
        pa.struct([("start", pa.int32()), ("end", pa.int32()), ("kind", pa.string())])
    )
    return pa.table(
        {
            "url": pa.array([u for u, _ in rows], pa.string()),
            "strategy": pa.array([f"s{int(u[-1]) % 2}" for u, _ in rows], pa.string()),
            "spans": pa.array(
                [[{"start": a, "end": b, "kind": k} for a, b, k in sp] for _, sp in rows],
                span_t,
            ),
        }
    )


def _brute_overlap(pred, gold):
    """Coverage-based char overlap of two span sets."""
    cover_p = set()
    for a, b, _ in pred:
        cover_p.update(range(a, b))
    cover_g = set()
    for a, b, _ in gold:
        cover_g.update(range(a, b))
    return len(cover_p & cover_g)


def test_overlap_matches_brute_force_random(ray_session):
    import ray.data

    rng = random.Random(11)
    pred_rows, gold_rows, want = [], [], {}
    for i in range(40):
        url = f"https://e.test/{i}"
        pred = sorted(
            (lambda a: (a, a + rng.randint(0, 30), "x"))(rng.randint(0, 200))
            for _ in range(rng.randint(0, 6))
        )
        gold = sorted(
            (lambda a: (a, a + rng.randint(0, 30), "x"))(rng.randint(0, 200))
            for _ in range(rng.randint(0, 6))
        )
        pred_rows.append((url, pred))
        gold_rows.append((url, gold))
        want[url] = (
            _brute_overlap(pred, gold),
            sum(b - a for a, b, _ in pred),
            sum(b - a for a, b, _ in gold),
        )
    p = explode_spans(ray.data.from_arrow(_spans_table(pred_rows)).repartition(3), 0,
                      carry_col="strategy")
    g = explode_spans(ray.data.from_arrow(_spans_table(gold_rows)).repartition(2), 1,
                      carry_col="strategy")
    got = {
        r["url"]: (r["overlap"], r["pred_len"], r["gold_len"])
        for r in span_overlap_by_url(p, g, carry_col="strategy").take_all()
    }
    assert got == want


def test_one_sided_urls_and_rollup(ray_session):
    import ray.data

    pred = _spans_table([("https://e.test/1", [(0, 10, "x")]),
                         ("https://e.test/2", [])])
    gold = _spans_table([("https://e.test/1", [(5, 15, "x")]),
                         ("https://e.test/3", [(0, 4, "x")])])
    p = explode_spans(ray.data.from_arrow(pred), 0, carry_col="strategy")
    g = explode_spans(ray.data.from_arrow(gold), 1, carry_col="strategy")
    per_url = span_overlap_by_url(p, g, carry_col="strategy")
    got = {r["url"]: (r["overlap"], r["pred_len"], r["gold_len"]) for r in per_url.take_all()}
    assert got == {
        "https://e.test/1": (5, 10, 10),
        "https://e.test/2": (0, 0, 0),
        "https://e.test/3": (0, 0, 4),
    }
    roll = prf_rollup(per_url).take_all()
    assert len(roll) == 1
    r = roll[0]
    assert r["n_urls"] == 3 and r["overlap"] == 5
    assert abs(r["precision"] - 0.5) < 1e-12
    assert abs(r["recall"] - 5 / 14) < 1e-12


def test_kind_filter_degraded_mode(ray_session):
    import ray.data

    tbl = _spans_table([("https://e.test/1", [(0, 10, "description"), (10, 20, "date")])])
    p = explode_spans(ray.data.from_arrow(tbl), 0, kind_filter="description")
    g = explode_spans(ray.data.from_arrow(tbl), 1)
    got = span_overlap_by_url(p, g).take_all()
    assert got[0]["overlap"] == 10 and got[0]["pred_len"] == 10 and got[0]["gold_len"] == 20


def test_within_side_overlaps_count_once(ray_session):
    import ray.data

    pred = _spans_table([("https://e.test/1", [(0, 10, "x"), (5, 15, "x")])])
    gold = _spans_table([("https://e.test/1", [(0, 20, "x")])])
    p = explode_spans(ray.data.from_arrow(pred), 0)
    g = explode_spans(ray.data.from_arrow(gold), 1)
    got = span_overlap_by_url(p, g).take_all()[0]
    # coverage of pred = [0,15) → overlap 15; pred_len is
    # multiplicity-counted (20) by documented contract
    assert got["overlap"] == 15 and got["pred_len"] == 20
