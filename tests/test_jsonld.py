"""JSON-LD extraction (stages/jsonld.py): block scan, @graph/array
explode, malformed-JSON skip, field projection."""

import pyarrow as pa

from pdf_table_extractor_ray.stages.jsonld import (
    extract_jsonld,
    project_jsonld_fields,
    render_jsonld_page,
)


def _ds(pages, ray_module):
    return ray_module.data.from_arrow(
        pa.table(
            {
                "url": pa.array([u for u, _ in pages], pa.string()),
                "html": pa.array([h for _, h in pages], pa.binary()),
            }
        )
    )


def test_blocks_and_noise_script_skipped(ray_session):
    import ray

    page = render_jsonld_page(
        [{"@type": "Product", "sku": "1"}, {"@type": "Organization", "name": "o"}],
        noise_script="var ld = '{\"@type\": \"Fake\"}';",
    )
    rows = extract_jsonld(_ds([("u1", page)], ray)).take_all()
    assert [(r["block_idx"], r["jtype"]) for r in rows] == [
        (0, "Product"),
        (1, "Organization"),
    ]


def test_graph_container_and_array_explode(ray_session):
    import ray

    page = (
        b'<html><script type="application/ld+json">'
        b'{"@graph": [{"@type": "A"}, {"@type": "B"}]}'
        b'</script><script type="application/ld+json">'
        b'[{"@type": "C"}, 42, {"@type": "D"}]'
        b"</script></html>"
    )
    rows = extract_jsonld(_ds([("u1", page)], ray)).take_all()
    assert [(r["block_idx"], r["entity_idx"], r["jtype"]) for r in rows] == [
        (0, 0, "A"),
        (0, 1, "B"),
        (1, 0, "C"),
        (1, 1, "D"),
    ]


def test_malformed_json_and_non_html_skipped(ray_session):
    import ray

    pages = [
        ("u1", b'<html><script type="application/ld+json">{nope</script></html>'),
        ("u2", b"%PDF-1.4 whatever"),
        ("u3", render_jsonld_page([{"@type": "X"}])),
    ]
    rows = extract_jsonld(_ds(pages, ray)).take_all()
    assert [(r["url"], r["jtype"]) for r in rows] == [("u3", "X")]


def test_project_fields_type_filter_and_nonscalar_null(ray_session):
    import ray

    page = render_jsonld_page(
        [
            {"@type": "Product", "sku": "7", "offers": {"price": 1}, "ok": True},
            {"@type": "Organization", "sku": "ignored"},
        ]
    )
    rows = project_jsonld_fields(
        extract_jsonld(_ds([("u1", page)], ray)), ["sku", "offers", "ok"], jtype="Product"
    ).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["sku"] == "7" and r["offers"] is None and r["ok"] == "True"
