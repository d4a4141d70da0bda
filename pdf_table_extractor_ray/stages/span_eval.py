"""Extraction-quality evaluation — char-span precision/recall/F1 of a
predicted extraction against a gold one, at corpus scale.

Boilerplate-removal work (Boilerpipe's CleanEval numbers, trafilatura's
benchmark) scores extractors by character overlap between predicted
and gold main-content spans; this module is that metric as a Ray
stage, so a candidate extractor can be scored against the golden
corpus (or against production output before/after a change) without
collecting anything to the driver.

Scale shape: spans explode to slim (url, start, end, side) rows
(vectorized ``list_flatten``/``list_parent_indices`` — no Python per
row), both sides co-locate with ONE ``groupby(fnv(url) % 64)`` bucket
shuffle, and each bucket computes every url's interval intersection in
one segmented sweep: factorize urls, lexsort events, segmented cumsum
per side, gap-weighted AND of the two coverage counters. Per-bucket
work is numpy end-to-end — no per-url Python. Output is one slim row
per url; micro/macro rollups are ordinary groupbys.

Span semantics: intervals are half-open ``[start, end)`` in
``extracted_text`` offsets (the contract of ``stages/result.py``);
overlapping spans WITHIN one side count coverage once (the sweep uses
coverage > 0, not multiplicity), matching how CleanEval treats
repeated text.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pdf_table_extractor_ray.stages.sketches import _fnv1a_bytes_array

_NB = 64


def explode_spans(
    ds: "ray.data.Dataset",
    side: int,
    spans_col: str = "spans",
    url_col: str = "url",
    carry_col: str = None,
    kind_filter: str = None,
) -> "ray.data.Dataset":
    """(url, spans: list<struct{start,end,...}>) rows → slim
    (url, start, end, side[, carry]) rows, one per span, fully
    vectorized. ``kind_filter`` keeps only spans of that kind (the
    degraded-extractor evaluation mode). Rows whose span list is
    empty/null (or fully filtered) still emit one ZERO-LENGTH marker
    row (start == end == 0) so a url that one side extracted nothing
    from keeps a presence row on that side (length contribution 0)."""

    def per_batch(b: pa.Table) -> pa.Table:
        spans = b.column(spans_col)
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        urls = b.column(url_col)
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(spans)
        start = pc.cast(pc.struct_field(flat, "start"), pa.int64())
        end = pc.cast(pc.struct_field(flat, "end"), pa.int64())
        if kind_filter is not None:
            keep = pc.fill_null(pc.equal(pc.struct_field(flat, "kind"), kind_filter), False)
            start = start.filter(keep)
            end = end.filter(keep)
            parent = parent[keep.to_numpy(zero_copy_only=False).astype(bool)]
        out_url = pc.take(urls, pa.array(parent))
        # marker rows for span-less urls
        n_spans = np.bincount(parent, minlength=b.num_rows)
        empty_idx = np.flatnonzero(n_spans == 0)
        cols = {
            "url": pa.concat_arrays(
                [out_url.combine_chunks() if isinstance(out_url, pa.ChunkedArray) else out_url,
                 pc.take(urls, pa.array(empty_idx)).combine_chunks()
                 if isinstance(urls, pa.ChunkedArray)
                 else pc.take(urls, pa.array(empty_idx))]
            ),
            "start": pa.concat_arrays(
                [start.combine_chunks() if isinstance(start, pa.ChunkedArray) else start,
                 pa.array(np.zeros(len(empty_idx), np.int64))]
            ),
            "end": pa.concat_arrays(
                [end.combine_chunks() if isinstance(end, pa.ChunkedArray) else end,
                 pa.array(np.zeros(len(empty_idx), np.int64))]
            ),
        }
        total = len(parent) + len(empty_idx)
        cols["side"] = pa.array(np.full(total, side, np.int8))
        if carry_col is not None:
            carry = b.column(carry_col)
            cols[carry_col] = pa.concat_arrays(
                [pc.take(carry, pa.array(parent)).combine_chunks()
                 if isinstance(carry, pa.ChunkedArray) else pc.take(carry, pa.array(parent)),
                 pc.take(carry, pa.array(empty_idx)).combine_chunks()
                 if isinstance(carry, pa.ChunkedArray) else pc.take(carry, pa.array(empty_idx))]
            )
        t = pa.table(cols)
        u = t.column("url")
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        bucket = pa.array((_fnv1a_bytes_array(u) % np.uint64(_NB)).astype(np.int64))
        return t.append_column("bucket", bucket)

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def span_overlap_by_url(
    pred_spans: "ray.data.Dataset",
    gold_spans: "ray.data.Dataset",
    carry_col: str = None,
) -> "ray.data.Dataset":
    """Exploded pred (side 0) ∪ gold (side 1) rows →
    (url, overlap, pred_len, gold_len[, carry]) per url: one bucket
    co-location shuffle, one segmented numpy sweep per bucket."""

    def per_bucket(group: pa.Table) -> pa.Table:
        names = ["url", "overlap", "pred_len", "gold_len"]
        if carry_col is not None:
            names.append(carry_col)
        n = group.num_rows
        if n == 0:
            arrays = [pa.array([], pa.string())] + [pa.array([], pa.int64())] * 3
            if carry_col is not None:
                arrays.append(pa.array([], pa.string()))
            return pa.Table.from_arrays(arrays, names=names)
        urls = group.column("url").to_numpy(zero_copy_only=False)
        start = group.column("start").to_numpy(zero_copy_only=False).astype(np.int64)
        end = group.column("end").to_numpy(zero_copy_only=False).astype(np.int64)
        side = group.column("side").to_numpy(zero_copy_only=False)
        uniq, code = np.unique(urls, return_inverse=True)
        nu = len(uniq)
        # per-url per-side total lengths (multiplicity-counted)
        lens = end - start
        pred_len = np.bincount(code[side == 0], weights=lens[side == 0], minlength=nu).astype(np.int64)
        gold_len = np.bincount(code[side == 1], weights=lens[side == 1], minlength=nu).astype(np.int64)
        # events: +1 at start, -1 at end, per side (skip zero-length markers)
        live = lens > 0
        ev_code = np.concatenate([code[live], code[live]])
        ev_pos = np.concatenate([start[live], end[live]])
        ev_side = np.concatenate([side[live], side[live]])
        ev_delta = np.concatenate(
            [np.ones(int(live.sum()), np.int64), -np.ones(int(live.sum()), np.int64)]
        )
        if len(ev_pos):
            order = np.lexsort((ev_delta, ev_pos, ev_code))
            ec, ep = ev_code[order], ev_pos[order]
            es, ed = ev_side[order], ev_delta[order]
            covA = np.cumsum(np.where(es == 0, ed, 0))
            covB = np.cumsum(np.where(es == 1, ed, 0))
            # reset counters at url boundaries: subtract the running
            # total as of the segment start (counts are zero there —
            # every interval opens and closes within its url)
            gap = np.empty(len(ep), np.int64)
            gap[:-1] = ep[1:] - ep[:-1]
            gap[-1] = 0
            same_url = np.empty(len(ep), bool)
            same_url[:-1] = ec[1:] == ec[:-1]
            same_url[-1] = False
            both = (covA > 0) & (covB > 0) & same_url
            seg = np.where(both, gap, 0)
            overlap = np.bincount(ec, weights=seg, minlength=nu).astype(np.int64)
        else:
            overlap = np.zeros(nu, np.int64)
        arrays = [
            pa.array(uniq, pa.string()),
            pa.array(overlap),
            pa.array(pred_len),
            pa.array(gold_len),
        ]
        if carry_col is not None:
            carry = group.column(carry_col).to_numpy(zero_copy_only=False)
            first_of = np.full(nu, -1, np.int64)
            has_carry = np.flatnonzero(np.array([c is not None for c in carry]))
            # last writer wins is fine: carry is constant per url by contract
            first_of[code[has_carry]] = has_carry
            vals = [None if i < 0 else carry[i] for i in first_of]
            arrays.append(pa.array(vals, pa.string()))
        return pa.Table.from_arrays(arrays, names=names)

    return (
        pred_spans.union(gold_spans)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def prf_rollup(
    per_url: "ray.data.Dataset", key_col: str = None
) -> "ray.data.Dataset":
    """Per-url overlap rows → micro precision/recall/F1, overall or
    per ``key_col``: exact integer sums, one slim groupby, the P/R/F
    division is the only float step."""
    from ray.data.aggregate import Count, Sum

    keys = [key_col] if key_col else []

    def mark(b: pa.Table) -> pa.Table:
        return b.append_column("n_urls", pa.array(np.ones(b.num_rows, np.int64)))

    g = per_url.map_batches(mark, batch_format="pyarrow")
    if key_col:
        agg = g.groupby(key_col).aggregate(
            Sum("overlap"), Sum("pred_len"), Sum("gold_len"), Sum("n_urls")
        )
    else:
        agg = g.groupby("n_urls").aggregate(
            Sum("overlap"), Sum("pred_len"), Sum("gold_len"), Sum("n_urls")
        )

    def finish(b: pa.Table) -> pa.Table:
        ov = pc.cast(b.column("sum(overlap)"), pa.float64())
        pl = pc.cast(b.column("sum(pred_len)"), pa.float64())
        gl = pc.cast(b.column("sum(gold_len)"), pa.float64())
        # empty-side convention (CleanEval): predicting nothing has
        # perfect precision, an empty gold is perfectly recalled —
        # so empty-vs-empty scores F1 = 1, not 0
        p = pc.if_else(pc.greater(pl, 0.0), pc.divide(ov, pl), pa.scalar(1.0))
        r = pc.if_else(pc.greater(gl, 0.0), pc.divide(ov, gl), pa.scalar(1.0))
        pr = pc.add(p, r)
        f1 = pc.if_else(
            pc.greater(pr, 0.0),
            pc.divide(pc.multiply(pa.scalar(2.0), pc.multiply(p, r)), pr),
            pa.scalar(0.0),
        )
        arrays = []
        names = []
        if key_col:
            arrays.append(b.column(key_col))
            names.append(key_col)
        arrays += [
            pc.cast(b.column("sum(n_urls)"), pa.int64()),
            pc.cast(b.column("sum(overlap)"), pa.int64()),
            pc.cast(b.column("sum(pred_len)"), pa.int64()),
            pc.cast(b.column("sum(gold_len)"), pa.int64()),
            p, r, f1,
        ]
        names += ["n_urls", "overlap", "pred_len", "gold_len",
                  "precision", "recall", "f1"]
        return pa.Table.from_arrays(arrays, names=names)

    return agg.map_batches(finish, batch_format="pyarrow")
