"""Template mining (stages/templates.py): cross-page frequent lines,
thresholds, within-page dedup, stripping."""

import pyarrow as pa

from pdf_table_extractor_ray.stages.templates import (
    mine_template_lines,
    strip_template_lines,
)


def _pages(rows, ray_module):
    return ray_module.data.from_arrow(
        pa.table(
            {
                "host": pa.array([h for h, _ in rows], pa.string()),
                "text": pa.array([t for _, t in rows], pa.string()),
            }
        )
    ).repartition(3)


def test_mine_threshold_and_share(ray_session):
    import ray

    # host a: NAV on 4/4 pages, PROMO on 2/4 (below 0.5 share with
    # min_count=3), unique bodies never
    rows = [("a.test", f"NAV\nbody {i}\n" + ("PROMO\n" if i < 2 else "") + "FOOTER")
            for i in range(4)]
    rows += [("b.test", f"OTHER\nbody {i}") for i in range(2)]  # below min_count
    got = mine_template_lines(_pages(rows, ray), "host", min_share=0.5, min_count=3).take_all()
    mined = {(r["key"], r["line"]): (r["n_docs"], r["n_docs_key"]) for r in got}
    assert mined == {
        ("a.test", "NAV"): (4, 4),
        ("a.test", "FOOTER"): (4, 4),
    }


def test_within_page_repeats_count_once(ray_session):
    import ray

    rows = [("a.test", "DUP\nDUP\nDUP\nx"), ("a.test", "y"), ("a.test", "z")]
    got = mine_template_lines(_pages(rows, ray), "host", min_share=0.5, min_count=2).take_all()
    # DUP appears in only 1 of 3 docs — document frequency, not raw count
    assert got == []


def test_strip_template_lines(ray_session):
    import ray

    rows = [("a.test", f"NAV\nbody {i}\nFOOTER") for i in range(4)]
    pages = _pages(rows, ray)
    template = pa.table(
        {
            "key": pa.array(["a.test", "a.test"], pa.string()),
            "line": pa.array(["NAV", "FOOTER"], pa.string()),
        }
    )
    out = strip_template_lines(pages, template, "host", concurrency=1).take_all()
    assert sorted(r["text"] for r in out) == [f"body {i}" for i in range(4)]
    assert all(r["n_template_lines"] == 2 for r in out)


def test_mine_then_strip_end_to_end(ray_session):
    import ray

    rows = [("h.test", f"HEAD\ncontent {i}\nLEGAL") for i in range(5)]
    pages = _pages(rows, ray)
    mined = mine_template_lines(pages, "host", min_share=0.6, min_count=2)
    tbl = pa.concat_tables(
        [pa.Table.from_pylist(mined.take_all()).select(["key", "line"])]
    )
    out = strip_template_lines(pages, tbl, "host", concurrency=1).take_all()
    assert sorted(r["text"] for r in out) == [f"content {i}" for i in range(5)]
