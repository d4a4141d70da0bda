"""Arc90/Boilerpipe-style main-content extraction for HTML payloads.

Generalizes the reference's skip-word boilerplate line filters
(conversor_caixa.py:174-176, conversor_bbmod1.py:46-49,
conversor_bradesco.py:33-50 — L1/L2 in SURVEY §2.5) from hardcoded
substring lists to the published text-density + link-density block
heuristics (Readability/Arc90, Kohlschütter et al. "Boilerplate
Detection using Shallow Text Features", WSDM 2010): a block of markup
is content iff it carries enough plain text and little of that text is
anchor text.

Pure per-document function; runs inside Ray ``map_batches``.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import List

from pdf_table_extractor_ray.stages.result import ExtractResult

# Block-level container tags that delimit candidate text blocks.
_BLOCK_TAGS = {
    "p", "div", "li", "td", "th", "section", "article", "header", "footer",
    "nav", "aside", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "tr", "table", "body",
}
_SKIP_CONTENT_TAGS = {"script", "style", "noscript", "svg", "template"}

# Classification thresholds (Arc90-style): a block is content when it
# has at least MIN_TEXT_LEN chars, link density below MAX_LINK_DENSITY,
# and at least MIN_WORDS words.
MAX_LINK_DENSITY = 0.33
MIN_TEXT_LEN = 25
MIN_WORDS = 4


class _Block:
    __slots__ = ("parts", "link_chars", "tag")

    def __init__(self, tag: str):
        self.parts: List[str] = []
        self.link_chars = 0
        self.tag = tag

    @property
    def text(self) -> str:
        return " ".join("".join(self.parts).split())

    @property
    def link_density(self) -> float:
        n = len("".join(self.parts).strip())
        return (self.link_chars / n) if n else 1.0


class _BlockParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: List[_Block] = []
        self._current: _Block | None = None
        self._anchor_depth = 0
        self._skip_depth = 0

    def _flush(self):
        if self._current is not None and self._current.parts:
            self.blocks.append(self._current)
        self._current = None

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT_TAGS:
            self._skip_depth += 1
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()
            self._current = _Block(tag)

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth or not data.strip():
            return
        if self._current is None:
            self._current = _Block("body")
        self._current.parts.append(data)
        if self._anchor_depth:
            self._current.link_chars += len(data.strip())


def classify_blocks(html: str) -> List[tuple]:
    """Return [(text, is_content), ...] per block, in document order."""
    parser = _BlockParser()
    parser.feed(html)
    out = []
    for b in parser.blocks:
        text = b.text
        if not text:
            continue
        is_content = (
            len(text) >= MIN_TEXT_LEN
            and len(text.split()) >= MIN_WORDS
            and b.link_density < MAX_LINK_DENSITY
        )
        out.append((text, is_content))
    return out


def extract_boilerplate(html: str) -> ExtractResult:
    """Main content = content-classified blocks joined with blank
    lines; spans mark each kept paragraph."""
    blocks = classify_blocks(html)
    kept = [t for t, is_content in blocks if is_content]
    if not kept:
        return ExtractResult(status="empty", error="no content blocks")
    text = "\n\n".join(kept)
    spans = []
    offset = 0
    for t in kept:
        spans.append((offset, offset + len(t), "paragraph"))
        offset += len(t) + 2
    return ExtractResult(extracted_text=text, spans=spans)
