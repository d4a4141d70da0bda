"""Registrable-domain (eTLD+1) extraction — the key real web
pipelines cap, group, and rate-limit on: ``a.b.example.co.uk`` and
``example.co.uk`` are the same OWNER; bare host grouping is wrong for
every multi-label public suffix.

Implements the standard publicsuffix.org match algorithm — longest
matching rule wins, ``*.`` wildcards match exactly one label,
``!`` exception rules carve a registrable name back out of a wildcard
— over an embedded SNAPSHOT of common suffixes (the full list is a
~15k-line data file; in production it ships as a data asset and loads
in an actor's ``__init__``; the algorithm is identical). Unknown TLDs
fall back to the implicit ``*`` rule (last label is public), per spec.

Scale shape: pure scalar kernel; callers apply it per batch over the
UNIQUE hosts (Zipf collapse — a crawl's host column repeats heavily)
and scatter back.
"""

from __future__ import annotations

from typing import List, Optional

# snapshot of publicsuffix.org rules: common gTLDs/ccTLDs, the
# multi-label suffixes that make naive "last two labels" wrong, one
# wildcard family (ck) and its exception (www.ck) for rule coverage
_RULES = frozenset(
    """
    com org net edu gov mil int io co ai app dev info biz xyz test example
    uk co.uk org.uk ac.uk gov.uk
    br com.br net.br org.br gov.br
    jp co.jp ne.jp or.jp ac.jp
    au com.au net.au org.au edu.au
    de fr it nl es se ch at pl ru cn in ca mx ar
    com.cn net.cn org.cn
    com.ar com.mx co.in
    github.io gitlab.io web.app s3.amazonaws.com
    """.split()
)
_WILDCARDS = frozenset({"ck", "er", "fk"})  # rules of the form *.<x>
_EXCEPTIONS = frozenset({"www.ck"})  # !www.ck


def public_suffix(host: str) -> str:
    """The public suffix of ``host`` per the PSL algorithm (longest
    rule; wildcard matches one extra label; exception beats wildcard;
    implicit ``*`` when nothing matches)."""
    labels = host.lower().strip(".").split(".")
    n = len(labels)
    for i in range(n):
        cand = ".".join(labels[i:])
        if cand in _EXCEPTIONS:
            # exception rule: the suffix is the rule minus its first label
            return ".".join(labels[i + 1 :])
    best = n - 1  # implicit * rule: last label
    for i in range(n - 1, -1, -1):
        cand = ".".join(labels[i:])
        if cand in _RULES:
            best = i
        if i - 1 >= 0 and cand in _WILDCARDS:
            # *.cand matches labels[i-1:]
            best = min(best, i - 1)
    return ".".join(labels[best:])


def registrable_domain(host: Optional[str]) -> Optional[str]:
    """eTLD+1: the public suffix plus one owner label, or None when the
    host IS a public suffix (nothing registrable) or empty."""
    if not host:
        return None
    host = host.lower().strip(".")
    suffix = public_suffix(host)
    if host == suffix:
        return None
    owner = host[: len(host) - len(suffix) - 1].rsplit(".", 1)[-1]
    return owner + "." + suffix


def registrable_domains(hosts: List[Optional[str]]) -> List[Optional[str]]:
    """Batch form with a per-batch memo over unique hosts (crawl host
    columns are Zipf-heavy; the kernel runs once per distinct host)."""
    memo: dict = {}
    out: List[Optional[str]] = []
    for h in hosts:
        if h not in memo:
            memo[h] = registrable_domain(h)
        out.append(memo[h])
    return out
