"""HTML <table> grid reconstruction (stages/html_tables.py) — the
markup twin of the lattice reader: spans, entities, inline markup,
header promotion, and the renderer→extractor round-trip."""

import pyarrow as pa
import pytest

from pdf_table_extractor_ray.stages.html_tables import (
    extract_html_tables,
    records_from_html_tables,
    render_html_table_page,
    render_pages_from_batch,
    table_grid,
)


def test_grid_basic_and_entities():
    grid = table_grid(
        "<tr><th>A</th><th>B</th></tr>"
        "<tr><td> x &amp; y </td><td>&#66;ee&lt;1&gt;</td></tr>"
    )
    assert grid == [[("A", True), ("B", True)], [("x & y", False), ("Bee<1>", False)]]


def test_grid_colspan_rowspan_expand():
    grid = table_grid(
        "<tr><td colspan=2>w</td><td rowspan='2'>r</td></tr>"
        "<tr><td>a</td><td>b</td></tr>"
    )
    assert [[c for c, _ in row] for row in grid] == [["w", "w", "r"], ["a", "b", "r"]]


def test_grid_inline_markup_and_br():
    grid = table_grid("<tr><td><b>bold</b><br>next<span> s</span></td></tr>")
    assert grid == [[("bold next s", False)]]


def test_grid_uppercase_tags_and_attr_noise():
    grid = table_grid(
        '<TR class=r1>\n  <TD style="x:1">v1</TD>\n  <TD align="left">v2</TD>\n</TR>'
    )
    assert [[c for c, _ in row] for row in grid] == [["v1", "v2"]]


def test_records_header_promotion(ray_session):
    import ray.data

    html = (
        b"<html><table><tr><th>Part Key</th><th>Name</th></tr>"
        b"<tr><td>1</td><td>alpha</td></tr>"
        b"<tr><td>2</td><td>beta</td></tr></table></html>"
    )
    ds = ray.data.from_arrow(
        pa.table({"url": ["u1"], "html": pa.array([html], pa.binary())})
    )
    out = records_from_html_tables(ds, ["part_key", "name"]).take_all()
    assert [(r["part_key"], r["name"]) for r in out] == [("1", "alpha"), ("2", "beta")]


def test_cell_level_extraction_skips_non_html(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": ["p", "h"],
                "html": pa.array(
                    [b"%PDF-1.4 junk", b"<table><tr><td>z</td></tr></table>"],
                    pa.binary(),
                ),
            }
        )
    )
    rows = extract_html_tables(ds).take_all()
    assert len(rows) == 1 and rows[0]["cell"] == "z" and rows[0]["url"] == "h"


@pytest.mark.parametrize("k", [0, 3, 4, 5, 7, 11, 60])
def test_render_roundtrip_quirks(k):
    headers = ["id", "name", "brand", "type"]
    rows = [[str(k), "some name", "Brand#13", "a b c"]]
    page = render_html_table_page(headers, rows, [k]).decode()
    grid = table_grid(page[page.index("<table") : page.index("</table>") + 9])
    assert [c for c, _ in grid[0]] == headers
    assert [c for c, _ in grid[1]] == rows[0]


def test_render_pages_from_batch_chunks():
    batch = pa.table({"k": list(range(130)), "v": [f"v{i}" for i in range(130)]})
    pages = render_pages_from_batch(batch, ["k", "v"], key_col="k", rows_per_page=64)
    assert pages.num_rows == 3
    assert pages.column("url").to_pylist() == [
        "synth://table/0",
        "synth://table/64",
        "synth://table/128",
    ]
