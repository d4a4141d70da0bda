"""Blocklist admission filtering — the UT1/word-list gate every
production web-text pipeline runs (CCNet, RefinedWeb, FineWeb all
drop pages by category word lists: adult, gambling, spam, …).

Shape: MAP-ONLY. Each category compiles to ONE alternation regex with
word boundaries; per batch the text lowercases once
(``pc.utf8_lower``) and each category costs one vectorized RE2
``count_substring_regex`` kernel call — no Python over rows, no
shuffle, nothing leaves the stage but (id, counts, admitted). At
100 TB this is embarrassingly parallel and reads only (id, text).

The category lists here are arguments, not policy: callers pass their
own term lists (the real UT1 lists are external data and don't ship
with this repo).
"""

from __future__ import annotations

import re
from typing import Dict, List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def blocklist_pattern(terms: Sequence[str]) -> str:
    """One RE2 alternation with word boundaries, longest-first so a
    multi-word phrase wins over its own prefix term (RE2 alternation
    is leftmost-first, not leftmost-longest).

    An empty term list raises: ``\\b(?:)\\b`` matches the empty string
    at every word boundary, so an "empty category" would silently
    reject essentially every document instead of admitting everything
    (ADVICE-r4)."""
    if not terms:
        raise ValueError(
            "blocklist_pattern: empty term list (the degenerate pattern would "
            "match every document); drop the category instead"
        )
    ordered = sorted(terms, key=len, reverse=True)
    return r"\b(?:" + "|".join(re.escape(t.lower()) for t in ordered) + r")\b"


def blocklist_hits(
    ds: "ray.data.Dataset",
    categories: Dict[str, List[str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hits: int = 0,
) -> "ray.data.Dataset":
    """(id, <category>_hits…, admitted): non-overlapping case-folded
    whole-word match counts per category; ``admitted = 1`` iff every
    category count ≤ ``max_hits``. Column order = sorted category
    names (deterministic schema)."""
    names = sorted(categories)
    # A category with no terms blocks nothing: keep its column (stable
    # schema) but emit constant-0 hits instead of the degenerate regex.
    patterns = {n: blocklist_pattern(categories[n]) for n in names if categories[n]}

    def score(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
        cols = {id_col: batch.column(id_col)}
        admitted = np.ones(batch.num_rows, dtype=bool)
        for n in names:
            if n not in patterns:
                cols[f"{n}_hits"] = pa.array(
                    np.zeros(batch.num_rows, np.int64), pa.int64()
                )
                continue
            cnt = pc.count_substring_regex(low, patterns[n])
            cnt64 = pc.cast(cnt, pa.int64())
            cols[f"{n}_hits"] = cnt64
            admitted &= cnt64.to_numpy(zero_copy_only=False) <= max_hits
        cols["admitted"] = pa.array(admitted.astype(np.int64), pa.int64())
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def blocklist_admit(
    ds: "ray.data.Dataset",
    categories: Dict[str, List[str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hits: int = 0,
) -> "ray.data.Dataset":
    """The admission gate itself: full input rows whose text passes
    every category (hits ≤ ``max_hits``). Same map-only shape, but the
    filter applies in place so rejected payloads drop inside the task
    that scored them."""
    # Empty categories block nothing — skip them (ADVICE-r4).
    patterns = [
        blocklist_pattern(categories[n]) for n in sorted(categories) if categories[n]
    ]

    def gate(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(pc.fill_null(batch.column(text_col), ""))
        keep = np.ones(batch.num_rows, dtype=bool)
        for p in patterns:
            cnt = pc.cast(pc.count_substring_regex(low, p), pa.int64())
            keep &= cnt.to_numpy(zero_copy_only=False) <= max_hits
        return batch.filter(pa.array(keep))

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
