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
