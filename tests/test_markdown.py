"""HTML → Markdown conversion (stages/markdown.py): block/inline
semantics, whitespace collapse, lists, tables, and the actor stage."""

import pyarrow as pa

from pdf_table_extractor_ray.stages.markdown import (
    html_bytes_to_markdown,
    html_to_markdown,
)


def md(html: str) -> str:
    return html_bytes_to_markdown(html.encode("utf-8"))


def test_headings_and_paragraphs():
    html = "<h1> Title </h1><p>one</p><h3>sub</h3><p>two\n  three</p>"
    assert md(html) == "# Title\n\none\n\n### sub\n\ntwo\nthree"


def test_inline_markup_and_whitespace_collapse():
    html = (
        "<p>a <strong> bold </strong> and <em>it</em> plus "
        "<code>  x = 1  </code> end</p>"
    )
    assert md(html) == "a **bold** and *it* plus `x = 1` end"


def test_links_and_images():
    assert md('<p><a href="/x">a  b</a></p>') == "[a b](/x)"
    assert md("<p><a>no href</a></p>") == "no href"
    assert md('<p><img src="i.png" alt="pic"></p>') == "![pic](i.png)"


def test_lists_nested_and_ordered():
    html = "<ul><li>a</li><li>b<ul><li>c</li></ul></li></ul>"
    assert md(html) == "- a\n- b\n  - c"
    html = "<ol><li>first</li><li>second</li></ol>"
    assert md(html) == "1. first\n2. second"


def test_blockquote_hr_pre():
    html = "<blockquote><p>q1</p><p>q2</p></blockquote><hr><pre>raw  keep\n  indent</pre>"
    assert md(html) == "> q1\n>\n> q2\n\n---\n\n```\nraw  keep\n  indent\n```"


def test_script_style_head_dropped_and_divs_transparent():
    html = (
        "<html><head><title>t</title><script>x()</script></head>"
        "<body><div><p>keep</p></div><style>.a{}</style></body></html>"
    )
    assert md(html) == "keep"


def test_loose_inline_text_becomes_paragraph():
    assert md("<div>loose <b>text</b></div><p>next</p>") == "loose **text**\n\nnext"


def test_br_keeps_line_break():
    assert md("<p>a<br>b</p>") == "a\nb"


def test_pipe_table_with_header():
    html = (
        "<table><tr><th>k</th><th>v</th></tr>"
        "<tr><td>1</td><td>x|y</td></tr></table>"
    )
    assert md(html) == "| k | v |\n| --- | --- |\n| 1 | x\\|y |"


def test_pipe_table_headerless():
    html = "<table><tr><td>a</td><td>b</td></tr></table>"
    assert md(html) == "| a | b |"


def test_empty_and_noise_only():
    assert md("") == ""
    assert md("<script>x</script>  \n ") == ""


def test_actor_stage(ray_session):
    import ray

    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["u1", "u2"], pa.string()),
                "html": pa.array(
                    [b"<h2>A</h2><p>b</p>", b"<p><em>c</em></p>"], pa.binary()
                ),
            }
        )
    )
    rows = {r["url"]: r for r in html_to_markdown(pages, concurrency=2).take_all()}
    assert rows["u1"]["markdown"] == "## A\n\nb"
    assert rows["u2"]["markdown"] == "*c*"
    assert rows["u2"]["n_chars"] == 3


def test_actor_stage_fault_isolation(ray_session):
    import ray
    import sys

    deep = ("<div>" * (sys.getrecursionlimit() + 200)).encode()
    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["ok", "deep"], pa.string()),
                "html": pa.array([b"<p>fine</p>", deep], pa.binary()),
            }
        )
    )
    rows = {r["url"]: r for r in html_to_markdown(pages, concurrency=2).take_all()}
    assert rows["ok"]["markdown"] == "fine" and rows["ok"]["error"] is None
    assert rows["deep"]["markdown"] is None and "RecursionError" in rows["deep"]["error"]
