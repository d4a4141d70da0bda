"""robots.txt politeness gate (RFC 9309) — the crawl-side admission
filter that sits in front of every fetch/extract pipeline.

Parsing follows RFC 9309 §2: ``User-agent`` lines open groups (several
agents may share one group), ``Allow``/``Disallow`` rules belong to
the group, matching uses the MOST-SPECIFIC (longest-pattern) rule with
Allow winning exact ties, ``*`` matches any octet sequence and ``$``
anchors the pattern end; an empty Disallow allows everything; an
unknown agent falls back to the ``*`` group.

Scale shape: the host→rules table is a broadcast-by-contract small
side (one row per crawled HOST — bounded by the frontier's host set,
orders of magnitude below the page count; the same bounded-broadcast
contract as ``joins.broadcast_join``): ``ray.put`` once, and the
``RobotsGate`` ACTOR pool compiles every pattern to a regex once per
actor in ``__init__`` — per batch it only evaluates. Page URLs never
shuffle; the gate is a pure map stage.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa

import ray
import ray.data

# (is_allow, pattern) rules per agent group
Rules = List[Tuple[bool, str]]


def parse_robots(content: bytes, agent: str = "*") -> Rules:
    """Extract the rule group that applies to ``agent``: the group
    naming it exactly (case-insensitive) if present, else the ``*``
    group. Returns [(is_allow, pattern), ...] in file order."""
    groups: Dict[str, Rules] = {}
    current: List[str] = []
    rules_seen_for_current = False
    text = content.decode("utf-8", "replace")
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if rules_seen_for_current:
                current = []
                rules_seen_for_current = False
            current.append(val.lower())
            for a in current:
                groups.setdefault(a, [])
        elif key in ("allow", "disallow"):
            if not current:
                continue  # rule before any user-agent line: ignore
            rules_seen_for_current = True
            if key == "disallow" and val == "":
                continue  # empty Disallow = allow all (no rule)
            for a in current:
                groups[a].append((key == "allow", val))
    a = agent.lower()
    if a in groups:
        return groups[a]
    return groups.get("*", [])


def parse_robots_sitemaps(content: bytes) -> List[str]:
    """``Sitemap:`` directive URLs in file order — per sitemaps.org
    these are GROUP-INDEPENDENT (valid anywhere in the file, any
    agent), which is why they don't ride the Rules extraction. The
    frontier-seeding half of robots.txt: discovery feeds the sitemap
    source (sources/sitemap.py)."""
    out: List[str] = []
    for raw in content.decode("utf-8", "replace").splitlines():
        line = raw.split("#", 1)[0].strip()
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap" and val.strip():
            out.append(val.strip())
    return out


def _pattern_to_regex(pattern: str) -> "re.Pattern":
    out = []
    i = 0
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    for ch in body:
        out.append(".*" if ch == "*" else re.escape(ch))
    return re.compile("".join(out) + (r"\Z" if anchored else ""))


class CompiledRules:
    """Rules compiled once; evaluation = longest-pattern match wins,
    Allow beats Disallow on equal length, no match = allowed."""

    def __init__(self, rules: Rules):
        self._compiled = [
            (is_allow, len(pat), _pattern_to_regex(pat)) for is_allow, pat in rules
        ]

    def allowed(self, path: str) -> bool:
        best_len = -1
        best_allow = True
        for is_allow, plen, rx in self._compiled:
            if rx.match(path):
                if plen > best_len or (plen == best_len and is_allow and not best_allow):
                    best_len = plen
                    best_allow = is_allow
        return best_allow


class RobotsGate:
    """Actor-pool stage: tag each URL row with ``allowed``. The
    host→robots.txt table rides in as an object-store ref (broadcast
    once); every pattern compiles ONCE per actor here in
    ``__init__`` — ``__call__`` only evaluates."""

    def __init__(self, robots_ref, agent: str = "*", url_col: str = "url"):
        self._url_col = url_col
        tbl: pa.Table = ray.get(robots_ref) if not isinstance(robots_ref, pa.Table) else robots_ref
        self._rules: Dict[str, CompiledRules] = {
            h: CompiledRules(parse_robots(r, agent))
            for h, r in zip(tbl.column("host").to_pylist(), tbl.column("robots").to_pylist())
            if h is not None and r is not None
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column(self._url_col).to_pylist()
        allowed = np.empty(len(urls), dtype=bool)
        for i, u in enumerate(urls):
            if u is None:
                allowed[i] = False
                continue
            parts = urlsplit(u)
            cr = self._rules.get(parts.netloc)
            # a host with no robots.txt allows everything (RFC 9309 §2.3.1)
            allowed[i] = True if cr is None else cr.allowed(parts.path or "/")
        return batch.append_column("allowed", pa.array(allowed))


def filter_by_robots(
    urls: "ray.data.Dataset",
    robots: pa.Table,
    agent: str = "*",
    url_col: str = "url",
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """URL rows → the same rows + ``allowed`` flag; broadcast-compile
    ``robots`` (host, robots) once per actor."""
    ref = ray.put(robots)
    return urls.map_batches(
        RobotsGate,
        fn_constructor_kwargs={"robots_ref": ref, "agent": agent, "url_col": url_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def synth_robots_corpus(n_hosts: int = 32) -> pa.Table:
    """Deterministic robots.txt per synthetic host (matching
    ``links.synth_link_corpus`` hosts): a rotation of RFC shapes —
    blanket disallow, prefix disallow with an Allow carve-out,
    wildcard + anchored patterns, agent-specific groups, and hosts
    with no robots at all (absent row = allow everything)."""
    hosts, bodies = [], []
    for i in range(n_hosts):
        host = f"site{i}.test"
        mode = i % 5
        if mode == 0:
            body = b"User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
        elif mode == 1:
            body = b"User-agent: *\nDisallow: /\nAllow: /p1*\n"
        elif mode == 2:
            body = (
                b"User-agent: badbot\nDisallow: /\n\n"
                b"User-agent: *\nDisallow: /*.tmp$\n"
            )
        elif mode == 3:
            continue  # no robots.txt for this host
        else:
            body = b"User-agent: *\nDisallow:\n"  # empty = allow all
        hosts.append(host)
        bodies.append(body)
    return pa.table(
        {"host": pa.array(hosts, pa.string()), "robots": pa.array(bodies, pa.binary())}
    )
