"""DOM tree + CSS-selector extraction — the "warm DOM model" stage: a
real parsed tree (stdlib ``html.parser``, lenient like browsers) with
a compiled selector engine held by an ACTOR pool, for the extractions
where the regex scanners (``links.py``, ``jsonld.py``,
``html_tables.py``) are not enough: structure-addressed pulls like
``div.article p`` or ``#price``.

Selector subset (the working core of CSS): a selector is
whitespace-separated compound steps joined by the DESCENDANT
combinator; each compound is ``tag``, ``.class``, ``#id``, ``[attr]``,
``[attr=value]`` or any conjunction (``div.card[data-x]``). Matching
is the standard right-to-left walk: a node matches if its compound
matches and some ancestor chain matches the remaining steps.

Scale shape: parse + select are per-document work inside
``map_batches`` (the same compute-bound actor contract as the
extraction pipeline); the selector compiles ONCE per actor in
``__init__``. Zero shuffle; malformed markup parses leniently (the
stdlib parser never throws on bad nesting) and non-HTML payloads
contribute zero rows in-band.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple

import pyarrow as pa

import ray.data

_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_WS_RE = re.compile(r"\s+")


class DomNode:
    __slots__ = ("tag", "attrs", "children", "parent", "_text")

    def __init__(self, tag: str, attrs: Dict[str, str], parent: "DomNode" = None):
        self.tag = tag
        self.attrs = attrs
        self.children: List[object] = []  # DomNode | str
        self.parent = parent
        self._text: Optional[str] = None

    def text(self) -> str:
        """Whitespace-collapsed recursive text content."""
        if self._text is None:
            parts: List[str] = []

            def walk(n: "DomNode") -> None:
                for c in n.children:
                    if isinstance(c, str):
                        parts.append(c)
                    elif c.tag not in ("script", "style"):
                        walk(c)

            walk(self)
            self._text = _WS_RE.sub(" ", "".join(parts)).strip()
        return self._text

    def iter_nodes(self):
        yield self
        for c in self.children:
            if isinstance(c, DomNode):
                yield from c.iter_nodes()


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = DomNode("#root", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = DomNode(tag, dict(attrs), self._stack[-1])
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(DomNode(tag, dict(attrs), self._stack[-1]))

    def handle_endtag(self, tag):
        # lenient close: pop to the nearest matching open tag, if any
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def parse_dom(payload: bytes) -> DomNode:
    p = _TreeBuilder()
    p.feed(payload.decode("utf-8", "replace"))
    return p.root


_STEP_RE = re.compile(
    r"([a-zA-Z][\w-]*)?((?:[.#][\w-]+|\[[\w-]+(?:=[^\]]*)?\])*)"
)
_QUAL_RE = re.compile(r"[.#][\w-]+|\[[\w-]+(?:=[^\]]*)?\]")


class Selector:
    """Compiled descendant-combinator selector."""

    def __init__(self, selector: str):
        self.steps: List[Tuple[Optional[str], List[Tuple[str, str, Optional[str]]]]] = []
        for step in selector.split():
            m = _STEP_RE.fullmatch(step)
            if not m:
                raise ValueError(f"unsupported selector step: {step!r}")
            tag = m.group(1).lower() if m.group(1) else None
            quals: List[Tuple[str, str, Optional[str]]] = []
            for q in _QUAL_RE.findall(m.group(2) or ""):
                if q.startswith("."):
                    quals.append(("class", q[1:], None))
                elif q.startswith("#"):
                    quals.append(("id", q[1:], None))
                else:
                    body = q[1:-1]
                    k, eq, v = body.partition("=")
                    quals.append(("attr", k, v if eq else None))
            self.steps.append((tag, quals))
        if not self.steps:
            raise ValueError("empty selector")

    @staticmethod
    def _match_step(node: DomNode, step) -> bool:
        tag, quals = step
        if tag is not None and node.tag != tag:
            return False
        for kind, k, v in quals:
            if kind == "class":
                if k not in (node.attrs.get("class") or "").split():
                    return False
            elif kind == "id":
                if node.attrs.get("id") != k:
                    return False
            else:
                if k not in node.attrs:
                    return False
                if v is not None and node.attrs.get(k) != v:
                    return False
        return True

    def matches(self, node: DomNode) -> bool:
        if not self._match_step(node, self.steps[-1]):
            return False
        i = len(self.steps) - 2
        cur = node.parent
        while i >= 0 and cur is not None:
            if self._match_step(cur, self.steps[i]):
                i -= 1
            cur = cur.parent
        return i < 0

    def select(self, root: DomNode) -> List[DomNode]:
        return [n for n in root.iter_nodes() if n.tag != "#root" and self.matches(n)]


def _looks_like_html(payload: bytes) -> bool:
    head = payload[:256]
    return not head.startswith(b"%PDF") and b"<" in head


class DomSelect:
    """Actor-pool stage: (url, html) pages → one row per selector
    match, ``(url, match_idx, text)`` plus one requested attribute if
    ``attr`` is given. Selectors compile once per actor here."""

    def __init__(self, selector: str, attr: str = None,
                 html_col: str = "html", url_col: str = "url"):
        self._sel = Selector(selector)
        self._attr = attr
        self._html_col = html_col
        self._url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column(self._url_col).to_pylist()
        payloads = batch.column(self._html_col).to_pylist()
        o_url, o_idx, o_text, o_attr = [], [], [], []
        for url, payload in zip(urls, payloads):
            if payload is None or url is None:
                continue
            if isinstance(payload, str):
                payload = payload.encode("utf-8", "replace")
            if not _looks_like_html(payload):
                continue
            try:
                root = parse_dom(payload)
                rows = [
                    (i, node.text(), node.attrs.get(self._attr) if self._attr else None)
                    for i, node in enumerate(self._sel.select(root))
                ]
            except RecursionError:  # nesting bomb — skip like non-HTML
                continue
            for i, text, attr in rows:
                o_url.append(url)
                o_idx.append(i)
                o_text.append(text)
                o_attr.append(attr)
        cols = {
            "url": pa.array(o_url, pa.string()),
            "match_idx": pa.array(o_idx, pa.int32()),
            "text": pa.array(o_text, pa.string()),
        }
        if self._attr:
            cols[self._attr] = pa.array(o_attr, pa.string())
        return pa.table(cols)


def _density(node: DomNode, in_link: bool, acc: Dict[int, Tuple[int, int]]) -> Tuple[int, int]:
    """Post-order (text_len, link_text_len) per element subtree.

    script/style text is invisible and never counts; text anywhere
    under an ``<a>`` counts toward link_text_len (the Readability /
    Boilerpipe link-density signal).
    """
    text_len = 0
    link_len = 0
    is_link = in_link or node.tag == "a"
    for c in node.children:
        if isinstance(c, str):
            text_len += len(c)
            if is_link:
                link_len += len(c)
        elif c.tag not in ("script", "style"):
            t, l = _density(c, is_link, acc)
            text_len += t
            link_len += l
    acc[id(node)] = (text_len, link_len)
    return text_len, link_len


def raw_text(node: DomNode) -> str:
    """Subtree text with NO whitespace collapsing — the byte-exact
    concatenation of visible text nodes (script/style excluded).
    ``convert_charrefs`` already unescaped entities at parse time, so
    an escaped render round-trips byte-identically."""
    parts: List[str] = []

    def walk(n: DomNode) -> None:
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            elif c.tag not in ("script", "style"):
                walk(c)

    walk(node)
    return "".join(parts)


# block-level candidates for main-content selection — inline nodes and
# boilerplate containers (<a>, <nav>…) may win on raw length but are
# never the article body
_CONTENT_TAGS = frozenset(
    "article main section div td body blockquote pre p".split()
)


def extract_main_content(root: DomNode) -> str:
    """Arc90/Boilerpipe-style densest-subtree pick: score every
    block-level node by ``text_len · (1 − link_density)²`` and return
    the best subtree's raw text.

    The SQUARED link-density penalty makes the tight content node beat
    every ancestor that also holds link-bearing boilerplate: for
    content C chars and sibling link text L, the ancestor scores
    C²/(C+L) < C while the content node scores C. Ties (an ancestor
    adding zero extra text) resolve to the LATER pre-order node — the
    tightest match. Pages with no positive-scoring block (all text in
    links, or empty) yield ''.
    """
    acc: Dict[int, Tuple[int, int]] = {}
    _density(root, False, acc)
    best: Optional[DomNode] = None
    best_score = 0.0
    for n in root.iter_nodes():
        if n.tag not in _CONTENT_TAGS:
            continue
        text_len, link_len = acc[id(n)]
        if text_len == 0:
            continue
        keep = 1.0 - link_len / text_len
        score = text_len * keep * keep
        if score > 0.0 and score >= best_score:
            best, best_score = n, score
    return raw_text(best) if best is not None else ""


def extract_dom_density(html: str) -> "ExtractResult":
    """Registry strategy: DOM-density main-content extraction as an
    ``ExtractResult`` (one whole-content span), the tree-based
    alternative to the line-density ``boilerplate_strip`` strategy.
    Routed explicitly (``use_strategy_column`` / ``register_strategy``)
    rather than by ``detect_format`` so existing golden routing is
    unchanged."""
    from pdf_table_extractor_ray.stages.result import ExtractResult

    text = extract_main_content(parse_dom(html.encode("utf-8", "replace")))
    if not text:
        return ExtractResult(status="empty", error="no content subtree")
    return ExtractResult(extracted_text=text, spans=[(0, len(text), "content")])


class DomMainContent:
    """Actor-pool stage: (url, html) → (url, text, n_chars) via the
    DOM density pick. Parse + score are per-document compute inside
    ``map_batches`` — zero shuffle; non-HTML payloads yield zero rows
    in-band."""

    def __init__(self, html_col: str = "html", url_col: str = "url"):
        self._html_col = html_col
        self._url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column(self._url_col).to_pylist()
        payloads = batch.column(self._html_col).to_pylist()
        o_url, o_text = [], []
        for url, payload in zip(urls, payloads):
            if payload is None or url is None:
                continue
            if isinstance(payload, str):
                payload = payload.encode("utf-8", "replace")
            if not _looks_like_html(payload):
                continue
            try:
                text = extract_main_content(parse_dom(payload))
            except RecursionError:  # nesting bomb — skip like non-HTML
                continue
            o_url.append(url)
            o_text.append(text)
        return pa.table({
            "url": pa.array(o_url, pa.string()),
            "text": pa.array(o_text, pa.string()),
            "n_chars": pa.array([len(t) for t in o_text], pa.int64()),
        })


def extract_dom_content(
    ds: "ray.data.Dataset",
    html_col: str = "html",
    url_col: str = "url",
    concurrency: int = 4,
) -> "ray.data.Dataset":
    return ds.map_batches(
        DomMainContent,
        fn_constructor_kwargs={"html_col": html_col, "url_col": url_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def shape_fingerprint(root: DomNode) -> int:
    """Structural fingerprint of a page: crc32 over the sorted DISTINCT
    root-to-node TAG paths (attributes and text excluded) — two pages
    rendered from the same template collide regardless of content,
    the cheap exact form of template clustering (the MinHash treatment
    applies when templates drift)."""
    import zlib

    paths = set()

    def walk(n: DomNode, prefix: str) -> None:
        for c in n.children:
            if isinstance(c, DomNode):
                p = prefix + "/" + c.tag
                paths.add(p)
                walk(c, p)

    walk(root, "")
    return zlib.crc32("\n".join(sorted(paths)).encode()) & 0x7FFFFFFF


class DomShape:
    """Actor-pool stage: (url, html) → (url, shape_fp) structural
    fingerprints; non-HTML payloads yield zero rows in-band."""

    def __init__(self, html_col: str = "html", url_col: str = "url"):
        self._html_col = html_col
        self._url_col = url_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column(self._url_col).to_pylist()
        payloads = batch.column(self._html_col).to_pylist()
        o_url, o_fp = [], []
        for url, payload in zip(urls, payloads):
            if payload is None or url is None:
                continue
            if isinstance(payload, str):
                payload = payload.encode("utf-8", "replace")
            if not _looks_like_html(payload):
                continue
            try:
                fp = shape_fingerprint(parse_dom(payload))
            except RecursionError:  # nesting bomb — skip like non-HTML
                continue
            o_url.append(url)
            o_fp.append(fp)
        return pa.table(
            {"url": pa.array(o_url, pa.string()), "shape_fp": pa.array(o_fp, pa.int64())}
        )


def select_text(
    ds: "ray.data.Dataset",
    selector: str,
    attr: str = None,
    html_col: str = "html",
    url_col: str = "url",
    concurrency: int = 4,
) -> "ray.data.Dataset":
    return ds.map_batches(
        DomSelect,
        fn_constructor_kwargs={
            "selector": selector, "attr": attr,
            "html_col": html_col, "url_col": url_col,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )
