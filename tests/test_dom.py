"""DOM tree + CSS selectors (stages/dom.py): parse leniency,
selector semantics, actor stage."""

import pyarrow as pa
import pytest

from pdf_table_extractor_ray.stages.dom import (
    DomSelect,
    Selector,
    parse_dom,
    select_text,
)


def _sel(html, selector):
    return [n.text() for n in Selector(selector).select(parse_dom(html))]


def test_tag_class_id_and_descendant():
    html = (
        b'<div class="card big" id="c1"><span class="name">Alice</span>'
        b'<span class="bal">10</span></div>'
        b'<div class="other"><span class="name">nope</span></div>'
        b'<span class="name">loose</span>'
    )
    assert _sel(html, ".card .name") == ["Alice"]
    assert _sel(html, "div.card span.bal") == ["10"]
    # textContent semantics: no whitespace in source → none in text
    assert _sel(html, "#c1") == ["Alice10"]
    assert sorted(_sel(html, "span.name")) == ["Alice", "loose", "nope"]


def test_attribute_selectors():
    html = b'<a href="/x" data-k="v">one</a><a data-k="w">two</a><a>three</a>'
    assert _sel(html, "a[href]") == ["one"]
    assert _sel(html, "a[data-k=w]") == ["two"]
    assert sorted(_sel(html, "[data-k]")) == ["one", "two"]


def test_lenient_nesting_and_void_elements():
    html = b"<div><p>a<br>b</div></p><p>tail</p>"
    # unclosed <p>, stray </p>, void <br>: parser must not throw
    assert _sel(html, "div") == ["ab"]
    assert "tail" in _sel(html, "p")


def test_script_style_text_excluded():
    html = b"<div>keep<script>var x;</script><style>.a{}</style></div>"
    assert _sel(html, "div") == ["keep"]


def test_unsupported_selector_rejected():
    with pytest.raises(ValueError):
        Selector("div > p")
    with pytest.raises(ValueError):
        Selector("")


def test_select_text_stage_with_attr(ray_session):
    import ray

    pages = pa.table(
        {
            "url": pa.array(["u1", "u2"], pa.string()),
            "html": pa.array(
                [b'<a class="x" href="/l1">one</a><a class="x" href="/l2">two</a>',
                 b"%PDF-1.4 not html"],
                pa.binary(),
            ),
        }
    )
    rows = select_text(
        ray.data.from_arrow(pages), "a.x", attr="href", concurrency=1
    ).take_all()
    assert [(r["url"], r["match_idx"], r["text"], r["href"]) for r in rows] == [
        ("u1", 0, "one", "/l1"),
        ("u1", 1, "two", "/l2"),
    ]


# ---------------------------------------------------------------------------
# main-content extraction (density pick)

from pdf_table_extractor_ray.stages.dom import (  # noqa: E402
    extract_dom_content,
    extract_main_content,
    raw_text,
)
import html as _html  # noqa: E402


def _main(html_bytes):
    return extract_main_content(parse_dom(html_bytes))


def test_density_pick_beats_link_boilerplate():
    body = "Article text long enough to dominate.\nSecond line."
    page = (
        '<html><body><nav><a href="/a">Home</a><a href="/b">About</a></nav>'
        f'<div class="c">{_html.escape(body)}</div>'
        '<footer><a href="/l">Legal</a><a href="/p">Privacy</a></footer>'
        "</body></html>"
    ).encode()
    assert _main(page) == body


def test_density_entities_and_whitespace_byte_exact():
    body = "a & b < c\n  indented\ttabbed  \ntrailing "
    page = (
        '<body><nav><a>x</a><a>y</a></nav>'
        f"<div>{_html.escape(body)}</div></body>"
    ).encode()
    assert _main(page) == body


def test_density_inline_markup_text_counts():
    page = b"<body><nav><a>n1</a><a>n2</a></nav><div>pre <b>bold</b> post</div></body>"
    assert _main(page) == "pre bold post"


def test_density_all_links_or_empty_yields_empty():
    assert _main(b"<body><nav><a>one</a><a>two</a></nav></body>") == ""
    assert _main(b"<body><div></div></body>") == ""


def test_density_script_style_invisible():
    page = (
        b"<body><nav><a>n</a><a>m</a></nav>"
        b"<div>keep<script>var very_long_script_payload;</script></div></body>"
    )
    assert _main(page) == "keep"


def test_extract_dom_content_stage(ray_session):
    import ray

    body = "Main body content for the stage test."
    page = (
        '<body><nav><a>h</a><a>a</a></nav>'
        f"<div>{_html.escape(body)}</div></body>"
    ).encode()
    pages = pa.table(
        {
            "url": pa.array(["u1", "u2"], pa.string()),
            "html": pa.array([page, b"%PDF-1.4 binary"], pa.binary()),
        }
    )
    rows = extract_dom_content(ray.data.from_arrow(pages), concurrency=1).take_all()
    assert [(r["url"], r["text"], r["n_chars"]) for r in rows] == [("u1", body, len(body))]


def test_dom_density_registry_strategy():
    from pdf_table_extractor_ray.stages.registry import make_strategies

    body = "Registry strategy content body."
    page = (
        '<body><nav><a>h</a><a>a</a></nav>'
        f"<div>{_html.escape(body)}</div></body>"
    ).encode()
    res = make_strategies()["dom_density"]({"url": "u", "html": page, "text": None})
    assert res.status == "ok"
    assert res.extracted_text == body
    assert res.spans == [(0, len(body), "content")]
    empty = make_strategies()["dom_density"]({"url": "u", "html": b"<body><a>x</a><a>y</a></body>", "text": None})
    assert empty.status == "empty"


def test_shape_fingerprint_content_invariant_template_sensitive():
    from pdf_table_extractor_ray.stages.dom import shape_fingerprint

    a1 = parse_dom(b'<html><body><div class="x"><p>alpha</p></div></body></html>')
    a2 = parse_dom(b'<html><body><div class="y" id="z"><p>totally other</p></div></body></html>')
    b1 = parse_dom(b"<html><body><table><tr><td>alpha</td></tr></table></body></html>")
    assert shape_fingerprint(a1) == shape_fingerprint(a2)  # attrs/text ignored
    assert shape_fingerprint(a1) != shape_fingerprint(b1)


def test_nesting_bomb_skipped_in_band(ray_session):
    import sys

    import ray

    from pdf_table_extractor_ray.stages.dom import DomShape, extract_dom_content

    deep = b"<html>" + b"<div>" * (sys.getrecursionlimit() + 200)
    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["ok", "bomb"], pa.string()),
                "html": pa.array([b"<html><p>hello</p></html>", deep], pa.binary()),
            }
        )
    )
    out = extract_dom_content(pages).take_all()
    assert [r["url"] for r in out] == ["ok"]
    shapes = pages.map_batches(DomShape, batch_format="pyarrow", concurrency=2).take_all()
    assert [r["url"] for r in shapes] == ["ok"]
