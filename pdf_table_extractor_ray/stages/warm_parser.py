"""Warm extraction actor — the stateful stage of SURVEY §2.7.

The reference re-opens its parser libraries per document
(conversor_bbmod1.py:52, conversor_itau.py:101); here the compiled
regex packs, HTML parsers and the strategy registry are process-warm:
imported once when the actor starts, reused for every batch. Run it as

    ds.map_batches(WarmExtractor, concurrency=(m, n), batch_size=B,
                   batch_format="pyarrow", zero_copy_batch=True)

Batches arrive as zero-copy Arrow tables; per-document parsing is
inherently row-sequential (carried scan state is row-scoped, SURVEY
§2.7), so the batch loop iterates documents while batch assembly uses
flat Arrow builders (offset + struct arrays) — never
``from_pylist`` over nested dicts, which costs more than the parse
itself.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from pdf_table_extractor_ray.schemas import EXTRACTED_SCHEMA, RECORD_TYPE, SPAN_TYPE
from pdf_table_extractor_ray.stages.registry import detect_format, extract_document, make_strategies
from pdf_table_extractor_ray.stages.result import ExtractResult


class WarmExtractor:
    """Callable-class stage: detection + strategy execution with
    in-band fault capture. ``strategy_key`` pins a single strategy
    (≈ the reference user picking a bank, Conversor.py:153-174);
    default is per-row content detection. ``config`` is the job's
    ``StrategyConfig`` (column thresholds, skip words, credentials) —
    bound ONCE per actor here, shipped via ``fn_constructor_kwargs``,
    never per batch. ``extra_strategies`` ships user-registered
    strategies to the worker process (driver-side
    ``register_strategy`` mutates driver module state only — actor
    processes need the callables cloudpickled through the ctor)."""

    def __init__(
        self,
        strategy_key: Optional[str] = None,
        config=None,
        extra_strategies: Optional[dict] = None,
        use_strategy_column: bool = False,
    ):
        # build the config-bound strategy table now so all strategy
        # modules (and their compiled regexes) are resident before the
        # first batch
        self._strategies = make_strategies(config)
        if extra_strategies:
            self._strategies.update(extra_strategies)
        if strategy_key is not None and strategy_key not in self._strategies:
            raise KeyError(f"unknown strategy {strategy_key!r}")
        self.strategy_key = strategy_key
        # honor a precomputed per-row "strategy" column (DetectOnly
        # upstream) instead of re-detecting — the routed pipeline's
        # detect-once path
        self.use_strategy_column = use_strategy_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        texts = batch.column("text").to_pylist()
        has_keys = "part_id" in batch.column_names
        part_ids = batch.column("part_id") if has_keys else pa.nulls(n, pa.int64())
        size_classes = batch.column("size_class") if has_keys else pa.nulls(n, pa.int32())
        keys_in = (
            batch.column("strategy").to_pylist()
            if self.use_strategy_column and "strategy" in batch.column_names
            else None
        )

        strategy_out, text_out = [], []
        n_records, n_chars, status_out, error_out = [], [], [], []
        span_offsets = [0]
        span_start, span_end, span_kind = [], [], []
        rec_offsets = [0]
        rec_date, rec_desc, rec_amount, rec_doc = [], [], [], []

        for i, (url, html, text) in enumerate(zip(urls, htmls, texts)):
            doc = {"url": url, "html": html, "text": text}
            if keys_in is not None:
                # pinned by the upstream detect — same fault semantics
                # as extract_document (in-band, never raises)
                key = keys_in[i]
                if key == "unknown" or key not in self._strategies:
                    key = "unknown"
                    res = ExtractResult(status="error", error="no strategy detected")
                else:
                    try:
                        res = self._strategies[key](doc)
                    except Exception as exc:  # noqa: BLE001 — in-band faults
                        res = ExtractResult(
                            status="error", error=f"{type(exc).__name__}: {exc}"
                        )
            elif self.strategy_key is None:
                key, res = extract_document(doc, self._strategies)
            else:
                key = self.strategy_key
                try:
                    res = self._strategies[key](doc)
                except Exception as exc:  # noqa: BLE001 — in-band faults
                    res = ExtractResult(status="error", error=f"{type(exc).__name__}: {exc}")

            strategy_out.append(key)
            text_out.append(res.extracted_text)
            n_records.append(len(res.records))
            n_chars.append(len(res.extracted_text))
            status_out.append(res.status)
            error_out.append(res.error)
            if res.spans:
                a, b, c = zip(*res.spans)  # C-speed columnarization
                span_start.extend(a)
                span_end.extend(b)
                span_kind.extend(c)
            span_offsets.append(len(span_start))
            for r in res.records:
                rec_date.append(r.date)
                rec_desc.append(r.description)
                rec_amount.append(r.amount)
                rec_doc.append(r.doc)
            rec_offsets.append(len(rec_date))

        spans_arr = pa.ListArray.from_arrays(
            pa.array(span_offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [
                    pa.array(span_start, pa.int32()),
                    pa.array(span_end, pa.int32()),
                    pa.array(span_kind, pa.string()),
                ],
                fields=list(SPAN_TYPE),
            ),
        )
        records_arr = pa.ListArray.from_arrays(
            pa.array(rec_offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [
                    pa.array(rec_date, pa.string()),
                    pa.array(rec_desc, pa.string()),
                    pa.array(rec_amount, pa.float64()),
                    pa.array(rec_doc, pa.string()),
                ],
                fields=list(RECORD_TYPE),
            ),
        )
        return pa.Table.from_arrays(
            [
                batch.column("url"),
                pa.array(strategy_out, pa.string()),
                pa.array(text_out, pa.string()),
                spans_arr,
                records_arr,
                pa.array(n_records, pa.int64()),
                pa.array(n_chars, pa.int64()),
                pa.array(status_out, pa.string()),
                pa.array(error_out, pa.string()),
                part_ids,
                size_classes,
            ],
            schema=EXTRACTED_SCHEMA,
        )


class DetectOnly:
    """Cheap format-sniff stage: adds a ``strategy`` column without
    extracting — the routed pipeline runs it once per row, filters on
    the column, and the downstream ``WarmExtractor`` (with
    ``use_strategy_column=True``) extracts without re-detecting."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        texts = batch.column("text").to_pylist()
        keys = []
        for h, t in zip(htmls, texts):
            try:
                keys.append(detect_format(h, t) or "unknown")
            except Exception:  # noqa: BLE001 — in-band: route to error row
                keys.append("unknown")
        return batch.append_column("strategy", pa.array(keys, pa.string()))
