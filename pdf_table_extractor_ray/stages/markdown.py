"""HTML → Markdown conversion over the stdlib DOM tree.

The modern web-extraction sinks (FineWeb/trafilatura-style pipelines)
emit Markdown rather than flat text because it preserves the document
structure (headings, lists, links, emphasis) that flat WET extraction
destroys — structure an LLM training corpus wants to keep. This module
walks the lenient DOM of ``stages/dom.py`` and renders a deterministic
CommonMark subset:

- ``h1``–``h6`` → ``#``·n headings; ``p`` / loose inline runs →
  paragraphs; ``hr`` → ``---``; blocks join with ONE blank line.
- ``ul``/``ol`` → ``- `` / ``1.`` items (nested lists indent 2 spaces,
  ordered markers count per level); ``blockquote`` → ``> `` prefixed
  lines; ``pre`` → fenced ``` blocks with raw (uncollapsed) text.
- ``table`` → pipe tables (header row = first row iff it has ``th``).
- inline: ``a[href]`` → ``[text](href)``, ``strong``/``b`` →
  ``**x**``, ``em``/``i`` → ``*x*``, ``code`` → `` `x` ``, ``img`` →
  ``![alt](src)``; other inline tags pass their content through.
- ``script``/``style``/``head``/``noscript``/``template`` drop.
- whitespace collapses per rendered line (runs → one space, block
  edges stripped) — matching the browser's inline layout — EXCEPT
  inside ``pre``.

Scale shape: per-document pure compute. ``DomMarkdown`` is the
actor-pool ``map_batches`` stage (parser state per actor, SURVEY §2.7);
no shuffle anywhere. The reference has no HTML path — this extends the
extraction family the north rule asks for (HTML boilerplate strip /
DOM heuristics) with the structured-output face.
"""

from __future__ import annotations

import re
from typing import List

import pyarrow as pa

import ray.data

from pdf_table_extractor_ray.stages.dom import DomNode, parse_dom

_SKIP = frozenset(("script", "style", "head", "noscript", "template"))
_INLINE = frozenset(
    (
        "a",
        "abbr",
        "b",
        "code",
        "em",
        "i",
        "img",
        "mark",
        "small",
        "span",
        "strong",
        "sub",
        "sup",
        "time",
        "u",
    )
)
_HEADINGS = {f"h{i}": i for i in range(1, 7)}
_HSPACE_RE = re.compile(r"[^\S\n]+")


def _collapse(s: str) -> str:
    """Collapse horizontal whitespace per line; strip line edges and
    drop empty edge lines (a ``br`` keeps its interior newline)."""
    lines = [_HSPACE_RE.sub(" ", ln).strip() for ln in s.split("\n")]
    while lines and not lines[0]:
        lines.pop(0)
    while lines and not lines[-1]:
        lines.pop()
    return "\n".join(lines)


def _raw_text(node: DomNode) -> str:
    parts: List[str] = []

    def walk(n: DomNode) -> None:
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            elif c.tag not in _SKIP:
                walk(c)

    walk(node)
    return "".join(parts)


def _inline(c) -> str:
    if isinstance(c, str):
        return c
    t = c.tag
    if t in _SKIP:
        return ""
    if t == "br":
        return "\n"
    if t == "img":
        return f"![{c.attrs.get('alt', '')}]({c.attrs.get('src', '')})"
    inner = "".join(_inline(x) for x in c.children)
    if t in ("strong", "b"):
        core = inner.strip()
        return f"**{core}**" if core else ""
    if t in ("em", "i"):
        core = inner.strip()
        return f"*{core}*" if core else ""
    if t == "code":
        core = _HSPACE_RE.sub(" ", inner).strip()
        return f"`{core}`" if core else ""
    if t == "a":
        label = _HSPACE_RE.sub(" ", inner.replace("\n", " ")).strip()
        href = c.attrs.get("href", "")
        return f"[{label}]({href})" if href else label
    return inner


def _inline_text(node: DomNode) -> str:
    return _collapse("".join(_inline(c) for c in node.children))


def _indent(block: str, pad: str) -> str:
    return "\n".join(pad + ln if ln else ln for ln in block.split("\n"))


def _render_list(node: DomNode, ordered: bool) -> str:
    items: List[str] = []
    n = 0
    for c in node.children:
        if not (isinstance(c, DomNode) and c.tag == "li"):
            continue
        n += 1
        marker = f"{n}. " if ordered else "- "
        sub: List[str] = []
        _render_blocks(c, sub)
        if not sub:
            sub = [""]
        first = marker + sub[0]
        pad = " " * len(marker) if ordered else "  "
        rest = [_indent(b, pad) for b in sub[1:]]
        items.append("\n".join([first] + rest))
    return "\n".join(items)


def _render_table(node: DomNode) -> str:
    rows: List[List[str]] = []
    header = False

    def cells_of(tr: DomNode) -> List[str]:
        return [
            _inline_text(c).replace("\n", " ").replace("|", "\\|")
            for c in tr.children
            if isinstance(c, DomNode) and c.tag in ("td", "th")
        ]

    trs = [n for n in node.iter_nodes() if n.tag == "tr"]
    for i, tr in enumerate(trs):
        cells = cells_of(tr)
        if cells:
            if i == 0 and any(
                isinstance(c, DomNode) and c.tag == "th" for c in tr.children
            ):
                header = True
            rows.append(cells)
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    out = []
    if header:
        out.append("| " + " | ".join(rows[0]) + " |")
        out.append("|" + " --- |" * width)
        body = rows[1:]
    else:
        body = rows
    out.extend("| " + " | ".join(r) + " |" for r in body)
    return "\n".join(out)


def _render_blocks(node: DomNode, out: List[str]) -> None:
    buf: List[str] = []

    def flush() -> None:
        if buf:
            text = _collapse("".join(buf))
            buf.clear()
            if text:
                out.append(text)

    for c in node.children:
        if isinstance(c, str) or (isinstance(c, DomNode) and c.tag in _INLINE):
            buf.append(_inline(c))
            continue
        if c.tag == "br":
            buf.append("\n")
            continue
        if c.tag in _SKIP:
            continue
        flush()
        t = c.tag
        if t in _HEADINGS:
            text = _inline_text(c).replace("\n", " ")
            if text:
                out.append("#" * _HEADINGS[t] + " " + text)
        elif t == "p":
            text = _inline_text(c)
            if text:
                out.append(text)
        elif t == "hr":
            out.append("---")
        elif t == "pre":
            raw = _raw_text(c).strip("\n")
            out.append("```\n" + raw + "\n```")
        elif t in ("ul", "ol"):
            block = _render_list(c, ordered=(t == "ol"))
            if block:
                out.append(block)
        elif t == "blockquote":
            sub: List[str] = []
            _render_blocks(c, sub)
            joined = "\n\n".join(sub)
            if joined:
                out.append(
                    "\n".join("> " + ln if ln else ">" for ln in joined.split("\n"))
                )
        elif t == "table":
            block = _render_table(c)
            if block:
                out.append(block)
        else:  # div/section/article/body/html/nav/...: transparent container
            _render_blocks(c, out)
    flush()


def to_markdown(root: DomNode) -> str:
    """Render a parsed DOM tree to the Markdown subset above."""
    out: List[str] = []
    _render_blocks(root, out)
    return "\n\n".join(out)


def html_bytes_to_markdown(payload: bytes) -> str:
    return to_markdown(parse_dom(payload))


class DomMarkdown:
    """Actor-pool stage: (url, html:binary) → (url, markdown, n_chars,
    error). Per-document fault isolation is IN-BAND (the engine-wide
    convention): a pathological page (e.g. nesting past the recursion
    limit) yields a null markdown + error string, never a dead task.

    Stateless per document but held in an actor pool like the other
    DOM stages so the (cheap) parser/renderer setup amortizes and the
    stage slots into the same fractional-CPU sizing as its siblings.
    """

    def __init__(self, html_col: str = "html", url_col: str = "url"):
        self.html_col = html_col
        self.url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column(self.url_col).to_pylist()
        payloads = batch.column(self.html_col).to_pylist()
        mds, errs = [], []
        for p in payloads:
            try:
                mds.append(html_bytes_to_markdown(p or b""))
                errs.append(None)
            except Exception as ex:  # noqa: BLE001 — in-band fault channel
                mds.append(None)
                errs.append(f"{type(ex).__name__}: {ex}")
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "markdown": pa.array(mds, pa.string()),
                "n_chars": pa.array(
                    [len(m) if m is not None else 0 for m in mds], pa.int64()
                ),
                "error": pa.array(errs, pa.string()),
            }
        )


def html_to_markdown(
    pages: "ray.data.Dataset",
    html_col: str = "html",
    url_col: str = "url",
    concurrency=(2, 8),
    batch_size: int = 64,
) -> "ray.data.Dataset":
    return pages.map_batches(
        DomMarkdown,
        fn_constructor_kwargs={"html_col": html_col, "url_col": url_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=0.5,
    )
