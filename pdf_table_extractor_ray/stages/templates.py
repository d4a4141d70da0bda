"""Corpus-level template mining — find the lines a site stamps on
every page (nav, footer, legal) by cross-page frequency, the signal a
single-page heuristic cannot see. ``stages/boilerplate.py`` (L1) is
the per-page Arc90-style density strip; this module is its corpus
complement: a line that appears in ≥ ``min_share`` of a key's pages is
template by definition, however content-like it looks.

Scale shape: per batch, each page's DISTINCT lines explode to slim
(key, line) partial counts (np.unique per batch — within-page repeats
count once, so share is a true document frequency) alongside (key,
n_docs) partials; ONE (key, line) groupby-Sum + one tiny per-key
totals groupby later, lines above the threshold are the template set.
Stripping broadcasts that set (``ray.put`` once, hash-set membership
per actor): template sets are small BY CONSTRUCTION — a line must
recur on ≥ min_share of a site's pages to qualify, which bounds the
set to roughly one site template (the nav/footer/header block), not
the corpus. The mine side never broadcasts anything.
"""

from __future__ import annotations

from typing import Dict, List, Set, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum


def mine_template_lines(
    pages: "ray.data.Dataset",
    key_col: str,
    text_col: str = "text",
    min_share: float = 0.5,
    min_count: int = 3,
) -> "ray.data.Dataset":
    """(key, line, n_docs, n_docs_key) for every line that appears in
    ≥ max(min_count, ceil(min_share · n_docs_key)) of the key's pages.
    Empty lines never qualify."""

    def explode(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_pylist()
        texts = b.column(text_col).to_pylist()
        o_key: List[str] = []
        o_line: List[str] = []
        d_key: List[str] = []
        for k, t in zip(keys, texts):
            if k is None:
                continue
            d_key.append(k)
            if not t:
                continue
            for line in set(t.split("\n")):
                line = line.strip()
                if line:
                    o_key.append(k)
                    o_line.append(line)
        lines = (
            pa.table({"key": pa.array(o_key, pa.string()),
                      "line": pa.array(o_line, pa.string())})
            .group_by(["key", "line"])
            .aggregate([("line", "count")])
            .rename_columns(["key", "line", "n_part"])
        )
        docs = (
            pa.table({"key": pa.array(d_key, pa.string())})
            .group_by(["key"])
            .aggregate([("key", "count")])
            .rename_columns(["key", "n_part"])
        )
        lines = lines.append_column(
            "is_doc", pa.array(np.zeros(lines.num_rows, np.int8))
        )
        # "" sentinel (never a real line — lines are stripped non-empty):
        # null group keys trip Ray's aggregate sort
        docs = pa.Table.from_arrays(
            [docs.column("key"),
             pa.array([""] * docs.num_rows, pa.string()),
             docs.column("n_part"),
             pa.array(np.ones(docs.num_rows, np.int8))],
            names=["key", "line", "n_part", "is_doc"],
        )
        return pa.concat_tables([lines.select(["key", "line", "n_part", "is_doc"]), docs])

    counts = (
        pages.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["key", "line", "is_doc"])
        .aggregate(Sum("n_part"))
    )

    # per-key doc totals are ONE row per key — bounded by the key
    # cardinality (hosts/families), read to the driver as a broadcast
    # dict by that contract
    mat = counts.materialize()
    doc_totals: Dict[str, int] = {
        r["key"]: int(r["sum(n_part)"])
        for r in mat.map_batches(
            lambda b: b.filter(pc.equal(b.column("is_doc"), pa.scalar(1, pa.int8()))),
            batch_format="pyarrow",
        ).take_all()
    }
    totals_ref = ray.put(doc_totals)

    def threshold(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("is_doc"), pa.scalar(0, pa.int8())))
        if b.num_rows == 0:
            return pa.table({
                "key": pa.array([], pa.string()),
                "line": pa.array([], pa.string()),
                "n_docs": pa.array([], pa.int64()),
                "n_docs_key": pa.array([], pa.int64()),
            })
        totals: Dict[str, int] = ray.get(totals_ref)
        keys = b.column("key").to_pylist()
        cnt = pc.cast(b.column("sum(n_part)"), pa.int64()).to_numpy(zero_copy_only=False)
        tot = np.array([int(totals.get(k, 0)) for k in keys], np.int64)
        need = np.maximum(min_count, np.ceil(min_share * tot).astype(np.int64))
        keep = cnt >= need
        return pa.table({
            "key": pa.array([k for k, m in zip(keys, keep) if m], pa.string()),
            "line": pa.array(
                [v for v, m in zip(b.column("line").to_pylist(), keep) if m], pa.string()
            ),
            "n_docs": pa.array(cnt[keep]),
            "n_docs_key": pa.array(tot[keep]),
        })

    return mat.map_batches(threshold, batch_format="pyarrow")


class TemplateStripper:
    """Actor-pool stage: remove mined template lines from each page's
    text. The (key, line) template table rides in as an object-store
    ref (bounded by the template-set contract above) and becomes one
    hash-set per key, built once per actor."""

    def __init__(self, template_ref, key_col: str, text_col: str = "text"):
        self._key_col = key_col
        self._text_col = text_col
        tbl: pa.Table = ray.get(template_ref) if not isinstance(template_ref, pa.Table) else template_ref
        self._sets: Dict[str, Set[str]] = {}
        for k, line in zip(tbl.column("key").to_pylist(), tbl.column("line").to_pylist()):
            self._sets.setdefault(k, set()).add(line)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self._key_col).to_pylist()
        texts = batch.column(self._text_col).to_pylist()
        out: List[str] = []
        removed: List[int] = []
        for k, t in zip(keys, texts):
            tset = self._sets.get(k)
            if not t or not tset:
                out.append(t or "")
                removed.append(0)
                continue
            kept = [ln for ln in t.split("\n") if ln.strip() not in tset]
            out.append("\n".join(kept))
            removed.append(len(t.split("\n")) - len(kept))
        batch = batch.drop_columns([self._text_col])
        return batch.append_column(
            self._text_col, pa.array(out, pa.string())
        ).append_column("n_template_lines", pa.array(removed, pa.int64()))


def strip_template_lines(
    pages: "ray.data.Dataset",
    template: pa.Table,
    key_col: str,
    text_col: str = "text",
    concurrency: int = 4,
) -> "ray.data.Dataset":
    ref = ray.put(template)
    return pages.map_batches(
        TemplateStripper,
        fn_constructor_kwargs={"template_ref": ref, "key_col": key_col, "text_col": text_col},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        # fractional CPUs: a pool of n×1.0 on an n-CPU cluster starves
        # the task stages fused around it and deadlocks the stream
        # (the extract pipeline's documented contract)
        num_cpus=0.7,
    )
