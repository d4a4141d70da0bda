"""Outlink / anchor-text extraction over crawled HTML payloads — the
link-structure half of a web-extraction pipeline (the text half is
``stages/boilerplate.py``; Arc90/Boilerpipe treat link density as the
boilerplate signal, this module keeps the links themselves: host
graphs, anchor corpora and nav-vs-content link stats all start here).

The reference has no link surface (per-file PDF extractor); this
belongs to the engine's web family next to ``stages/boilerplate.py``.

Scale shape: pure map — one compiled-regex pass per document inside
``map_batches`` (document parsing is inherently per-doc; this is the
same compute-bound-actor contract as the extraction pipeline), zero
shuffle. Non-HTML payloads (PDF magic, encrypted blobs, no markup in
the sniff window) contribute zero rows in-band — no task failures.
Downstream reductions (target counts) are slim-string groupbys.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_A_RE = re.compile(
    rb"<a\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)')[^>]*>(.*?)</a>",
    re.I | re.S,
)
_TAG_RE = re.compile(rb"<[^>]+>")
_WS_RE = re.compile(rb"\s+")


def _looks_like_html(payload: bytes) -> bool:
    head = payload[:256]
    return not head.startswith(b"%PDF") and b"<" in head


def extract_outlinks(
    ds: "ray.data.Dataset",
    html_col: str = "html",
    url_col: str = "url",
) -> "ray.data.Dataset":
    """One row per ``<a href>`` occurrence: (url, href, target_host,
    anchor). Relative hrefs resolve to the page's own host; anchors
    are tag-stripped and whitespace-collapsed. Duplicate links are
    kept — they are the edge weights of the link graph."""

    def per_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        payloads = batch.column(html_col).to_pylist()
        out_url, out_href, out_thost, out_anchor = [], [], [], []
        for url, payload in zip(urls, payloads):
            if payload is None or url is None:
                continue
            if isinstance(payload, str):
                payload = payload.encode("utf-8", "replace")
            if not _looks_like_html(payload):
                continue
            page_host = urlsplit(url).netloc
            for m in _A_RE.finditer(payload):
                href = (m.group(1) or m.group(2) or b"").decode("utf-8", "replace")
                anchor = _WS_RE.sub(b" ", _TAG_RE.sub(b"", m.group(3))).strip()
                if "://" in href:
                    thost = urlsplit(href).netloc
                else:
                    thost = page_host
                out_url.append(url)
                out_href.append(href)
                out_thost.append(thost)
                out_anchor.append(anchor.decode("utf-8", "replace"))
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "href": pa.array(out_href, pa.string()),
                "target_host": pa.array(out_thost, pa.string()),
                "anchor": pa.array(out_anchor, pa.string()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def link_target_counts(
    links: "ray.data.Dataset", k: int = 20
) -> "ray.data.Dataset":
    """Top-``k`` (target_host, href) by in-link count — the inverted
    view of the link graph (what everybody points at). Per-batch
    Arrow pre-count combiner, one slim groupby-Sum, partial top-k
    merge (no global sort)."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.topk import global_top_k

    def precount(b: pa.Table) -> pa.Table:
        t = (
            b.select(["target_host", "href"])
            .group_by(["target_host", "href"])
            .aggregate([("href", "count")])
        )
        return pa.table(
            {
                "target_host": t.column("target_host"),
                "href": t.column("href"),
                "n_part": pc.cast(t.column("href_count"), pa.int64()),
            }
        )

    agg = (
        links.map_batches(precount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["target_host", "href"])
        .aggregate(Sum("n_part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "target_host": b.column("target_host"),
                "href": b.column("href"),
                "n": pc.cast(b.column("sum(n_part)"), pa.int64()),
            }
        )

    counted = agg.map_batches(finish, batch_format="pyarrow")
    return global_top_k(
        counted,
        [("n", "descending"), ("target_host", "ascending"), ("href", "ascending")],
        k,
    )


# ---------------------------------------------------------------------------
# URL canonicalization — crawl-frontier / dedup-key normalization

# tracking parameters that never change page identity (Google/Facebook/
# Microsoft click ids, utm_* campaign tags)
_TRACKING_EXACT = {
    "gclid", "fbclid", "msclkid", "dclid", "igshid", "mc_cid", "mc_eid",
    "ref", "ref_src",
}
_TRACKING_PREFIX = ("utm_",)
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize_url(url: str) -> str:
    """Canonical form for URL-level dedup / frontier keys: lowercase
    scheme+host, default port stripped, fragment dropped, tracking
    params (utm_*, gclid, …) removed, remaining query params sorted
    (stable for equal keys), empty path → '/'. Non-URL junk returns
    unchanged — canonicalization must never lose a row."""
    from urllib.parse import urlsplit, urlunsplit, parse_qsl, urlencode

    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    if not parts.scheme or not parts.netloc:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    default = _DEFAULT_PORTS.get(scheme)
    if default and netloc.endswith(default):
        netloc = netloc[: -len(default)]
    keep = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if k not in _TRACKING_EXACT and not k.startswith(_TRACKING_PREFIX)
    ]
    keep.sort()
    return urlunsplit(
        (scheme, netloc, parts.path or "/", urlencode(keep), "")
    )


def url_dup_groups(
    ds: "ray.data.Dataset", url_col: str = "url"
) -> "ray.data.Dataset":
    """Groups of distinct raw URLs that collapse to one canonical form
    — the crawl-dedup report (tracking-tag/port/fragment variants of
    the same page). Returns (canonical_url, n_variants) for groups
    with ≥ 2 distinct raw members.

    Shape: map-side canonicalize + per-batch distinct (canonical, raw)
    combiner, then TWO native Arrow groupby-aggregates — a global
    (canonical, raw) distinct and a per-canonical row count — and a
    filter. No ``map_groups`` anywhere: zero per-URL Python beyond the
    urlsplit itself (per-string parsing, the same per-document
    granularity as the HTML parse stages)."""
    from ray.data.aggregate import Count

    def canon(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        c = [canonicalize_url(u) if u is not None else None for u in urls]
        t = pa.table(
            {
                "canonical_url": pa.array(c, pa.string()),
                "raw": batch.column(url_col),
            }
        )
        t = t.filter(pc.is_valid(t.column("canonical_url")))
        # per-batch distinct (canonical, raw) pairs
        return t.group_by(["canonical_url", "raw"]).aggregate([])

    pairs = ds.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
    # global distinct (a raw form may recur across batches), then count
    # raw variants per canonical — both native Arrow aggregates
    distinct = (
        pairs.groupby(["canonical_url", "raw"])
        .aggregate(Count())  # Dataset.aggregate requires ≥1 agg; unused
        .map_batches(
            lambda b: b.select(["canonical_url", "raw"]), batch_format="pyarrow"
        )
    )
    counted = distinct.groupby("canonical_url").aggregate(Count())

    def finish(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "canonical_url": b.column("canonical_url"),
                "n_variants": pc.cast(b.column("count()"), pa.int64()),
            }
        )
        return t.filter(pc.greater(t.column("n_variants"), 1))

    return counted.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Page metadata extraction — the crawl-index head fields
# ---------------------------------------------------------------------------

_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.I | re.S)
_META_RE = re.compile(r"<meta\b[^>]*>", re.I)
_LINK_TAG_RE = re.compile(r"<link\b[^>]*>", re.I)
_HTML_LANG_RE = re.compile(
    r"<html\b[^>]*?\blang\s*=\s*(?:\"([^\"]*)\"|'([^']*)')", re.I
)
_ATTR_RE = re.compile(
    r"([a-zA-Z-]+)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s\"'>]+))"
)
_WS_STR_RE = re.compile(r"\s+")

# the 5 predefined XML entities only — full HTML5 entity tables are a
# declared non-goal (the fixture corpus never emits them; real crawls
# would route through a proper DOM in the WarmParser actor)
_ENTITIES = (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"))


def _unescape_basic(s: str) -> str:
    for k, v in _ENTITIES:
        if k in s:
            s = s.replace(k, v)
    return s


def _attrs(tag: str) -> dict:
    """Lowercased attr dict of one tag — attribute ORDER must never
    matter (real-world meta tags put name/content in either order)."""
    out = {}
    for m in _ATTR_RE.finditer(tag):
        key = m.group(1).lower()
        if key not in out:
            out[key] = m.group(2) or m.group(3) or m.group(4) or ""
    return out


def extract_page_metadata(
    ds: "ray.data.Dataset",
    html_col: str = "html",
    url_col: str = "url",
) -> "ray.data.Dataset":
    """One row per HTML page with the crawl-index head fields:

    (url, title, meta_description, canonical_url, og_title,
    robots_noindex, robots_nofollow, html_lang, n_meta_tags)

    Semantics (first-wins, matching what crawl indexers keep):
    - ``title``: first ``<title>`` body, whitespace-collapsed, basic
      XML entities unescaped; '' when absent.
    - ``meta_description`` / ``og_title``: first ``<meta>`` whose
      ``name``/``property`` matches (case-insensitive, attr order
      irrelevant); '' when absent.
    - ``canonical_url``: first ``<link rel=canonical href>``; relative
      hrefs resolve against the page url (rel may be a space-separated
      token list).
    - ``robots_noindex`` / ``robots_nofollow``: token present in the
      comma-split content of the first ``<meta name=robots>``.
    - payload decode is charset-sniffed (``functions/charset.py``) so
      latin-1 / BOM'd pages index without U+FFFD damage.

    Scale shape: pure map — one compiled-regex pass per document in
    ``map_batches``, zero shuffle; non-HTML payloads (PDF magic,
    binary) contribute zero rows in-band, same contract as
    ``extract_outlinks``.
    """
    from urllib.parse import urljoin

    from pdf_table_extractor_ray.functions.charset import decode_html

    def per_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        payloads = batch.column(html_col).to_pylist()
        cols = {
            "url": [],
            "title": [],
            "meta_description": [],
            "canonical_url": [],
            "og_title": [],
            "robots_noindex": [],
            "robots_nofollow": [],
            "html_lang": [],
            "n_meta_tags": [],
        }
        for url, payload in zip(urls, payloads):
            if payload is None or url is None:
                continue
            raw = payload.encode("utf-8", "replace") if isinstance(payload, str) else bytes(payload)
            if not _looks_like_html(raw):
                continue
            text = decode_html(raw)
            tm = _TITLE_RE.search(text)
            title = _unescape_basic(_WS_STR_RE.sub(" ", tm.group(1)).strip()) if tm else ""
            desc = og_title = robots = None
            metas = _META_RE.findall(text)
            for tag in metas:
                a = _attrs(tag)
                name = a.get("name", "").lower()
                prop = a.get("property", "").lower()
                if desc is None and name == "description":
                    desc = a.get("content", "")
                elif og_title is None and prop == "og:title":
                    og_title = a.get("content", "")
                elif robots is None and name == "robots":
                    robots = a.get("content", "")
                if desc is not None and og_title is not None and robots is not None:
                    break
            canonical = ""
            for tag in _LINK_TAG_RE.finditer(text):
                a = _attrs(tag.group(0))
                rel = a.get("rel", "").lower().split()
                if "canonical" in rel and a.get("href"):
                    canonical = urljoin(url, a["href"])
                    break
            robots_tokens = (
                {t.strip().lower() for t in robots.split(",")} if robots else set()
            )
            lm = _HTML_LANG_RE.search(text)
            cols["url"].append(url)
            cols["title"].append(title)
            cols["meta_description"].append(_unescape_basic(desc or ""))
            cols["canonical_url"].append(canonical)
            cols["og_title"].append(_unescape_basic(og_title or ""))
            cols["robots_noindex"].append("noindex" in robots_tokens)
            cols["robots_nofollow"].append("nofollow" in robots_tokens)
            cols["html_lang"].append((lm.group(1) or lm.group(2)) if lm else "")
            cols["n_meta_tags"].append(len(metas))
        return pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "title": pa.array(cols["title"], pa.string()),
                "meta_description": pa.array(cols["meta_description"], pa.string()),
                "canonical_url": pa.array(cols["canonical_url"], pa.string()),
                "og_title": pa.array(cols["og_title"], pa.string()),
                "robots_noindex": pa.array(cols["robots_noindex"], pa.bool_()),
                "robots_nofollow": pa.array(cols["robots_nofollow"], pa.bool_()),
                "html_lang": pa.array(cols["html_lang"], pa.string()),
                "n_meta_tags": pa.array(cols["n_meta_tags"], pa.int64()),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# deterministic synthetic crawl with cross-host links (for the host
# link-graph family — the fixture corpus is single-host by design, so
# host-level centrality needs its own corpus, same pattern as
# multimodal.synth_media_corpus)


def synth_link_corpus(
    n_pages: int = 400, n_hosts: int = 24, seed: int = 101
) -> pa.Table:
    """(url, html) crawl pages across ``n_hosts`` hosts. Page ``j``
    lives on host ``j % n_hosts`` and links out with a quadratic skew
    toward low host ids (the web's preferential-attachment shape);
    every page of the LAST host has no out-links, making that host a
    dangling node that is still linked to. Deterministic per page id."""
    import random

    urls, payloads = [], []
    for j in range(n_pages):
        h = j % n_hosts
        url = f"https://site{h}.test/p{j}"
        rng = random.Random(seed * 1_000_003 + j)
        links = []
        if h != n_hosts - 1:
            for _ in range(3 + rng.randrange(8)):
                t = int(n_hosts * rng.random() ** 2)
                if rng.random() < 0.2:
                    links.append(f'<a href="/local{rng.randrange(50)}">me</a>')
                else:
                    links.append(
                        f'<a href="https://site{t}.test/p{rng.randrange(n_pages)}">x</a>'
                    )
        body = f"<html><body><h1>page {j}</h1><p>content</p>{''.join(links)}</body></html>"
        urls.append(url)
        payloads.append(body.encode())
    return pa.table(
        {"url": pa.array(urls, pa.string()), "html": pa.array(payloads, pa.binary())}
    )


def host_edges(links: "ray.data.Dataset") -> "ray.data.Dataset":
    """Outlink rows → weighted host-graph edges (src, dst, w): source
    host from the page url, per-batch Arrow pre-count combiner, one
    slim (src, dst)-string groupby-Sum — the standard edge-weight
    reduction before ``graph.pagerank_directed``."""
    from ray.data.aggregate import Sum

    def precount(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        src = pa.array([urlsplit(u).netloc for u in urls], pa.string())
        t = (
            pa.Table.from_arrays([src, b.column("target_host")], names=["src", "dst"])
            .group_by(["src", "dst"])
            .aggregate([("dst", "count")])
        )
        return pa.table(
            {
                "src": t.column("src"),
                "dst": t.column("dst"),
                "n_part": pc.cast(t.column("dst_count"), pa.int64()),
            }
        )

    agg = (
        links.map_batches(precount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"])
        .aggregate(Sum("n_part"))
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("src"), b.column("dst"), pc.cast(b.column("sum(n_part)"), pa.int64())],
            names=["src", "dst", "w"],
        ),
        batch_format="pyarrow",
    )
