"""Routed extraction: per-strategy-class pools (the heterogeneous
resource-sizing pattern).

The flagship pipeline (`pipelines.extract`) runs ONE warm actor pool
for every document. On corpora where a slow family dominates batches
(multi-page statements vs one-liner boilerplate pages), a single pool
head-of-line-blocks the cheap documents behind the expensive ones.
This variant routes by detected class:

- **heavy** (statement parsers: multi-pass line scans, carried state)
  → warm actor pool, small batches, fractional CPUs;
- **light** (markup strategies: boilerplate/lattice/coordinate/OFX)
  → stateless task pool, large batches.

Routing without a mid-pipeline materialization: each branch is its own
column-pruned parquet scan + cheap detect + filter — re-scanning the
input twice is deliberate (a streamed re-read costs far less than the
extraction itself at 100 TB, while materializing the tagged corpus
would stage the whole input through the object store). Within a
branch, detection runs ONCE per row (``DetectOnly`` tags the batch,
the filter reads the tag, and the extractor honors it via
``use_strategy_column`` instead of re-sniffing). Outputs are
byte-identical per url to the flagship path (asserted in tests).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pdf_table_extractor_ray.pipelines.extract import _add_shard_keys, default_concurrency
from pdf_table_extractor_ray.stages.warm_parser import DetectOnly, WarmExtractor

# statement families carry per-document scan state and dominate CPU;
# markup families are single-pass extractors
HEAVY_KEYS = frozenset(
    {
        "regex_listing",
        "santander_merge",
        "bb1_buffer",
        "bb2_nextdate",
        "sicoob1_lines",
        "sicoob2_blocks",
        "c6_date_context",
        "inter_months",
        "cef_simple",
        "pagbank_findall",
        "bradesco_triples",
        "encrypted",
    }
)


_HEAVY_SET = pa.array(sorted(HEAVY_KEYS), pa.string())


def _branch_filter(batch: pa.Table, want_heavy: bool) -> pa.Table:
    """Keep the branch's rows using the ``strategy`` tag DetectOnly
    already computed — vectorized, no re-detection."""
    is_heavy = pc.is_in(batch.column("strategy"), value_set=_HEAVY_SET)
    return batch.filter(is_heavy if want_heavy else pc.invert(is_heavy))


def build_extracted_dataset_routed(
    pages_path,
    *,
    heavy_batch_size: int = 8,
    light_batch_size: int = 64,
    concurrency=None,
    config=None,
    read_pages_fn=None,
) -> "ray.data.Dataset":
    """Two-branch extraction over the same input path; returns the
    union of both branches (same schema as the flagship output)."""
    from pdf_table_extractor_ray.pipelines.extract import read_pages

    reader = read_pages_fn or read_pages
    n = default_concurrency()
    if concurrency is None:
        # heavy branch owns ~3/4 of the pool; light work is cheap enough
        # for a task pool sized by the scheduler
        heavy_n = max(2, (3 * n) // 4)
        concurrency = (heavy_n, heavy_n)

    detect = DetectOnly()

    def branch(want_heavy: bool):
        ds = reader(pages_path, include_paths=True)
        ds = ds.map_batches(_add_shard_keys, batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.map_batches(detect, batch_format="pyarrow", zero_copy_batch=True)
        ds = ds.map_batches(
            lambda b, w=want_heavy: _branch_filter(b, w),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        if want_heavy:
            return ds.map_batches(
                WarmExtractor,
                fn_constructor_kwargs={
                    "strategy_key": None,
                    "config": config,
                    "use_strategy_column": True,
                },
                batch_size=heavy_batch_size,
                batch_format="pyarrow",
                zero_copy_batch=True,
                concurrency=concurrency,
                num_cpus=0.7,
            )
        # light branch: stateless task pool (strategy table rebuilt per
        # task is acceptable — markup strategies hold no warm state
        # beyond module imports, which worker processes cache anyway)
        extractor = WarmExtractor(strategy_key=None, config=config, use_strategy_column=True)
        return ds.map_batches(
            extractor,
            batch_size=light_batch_size,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    return branch(True).union(branch(False))
