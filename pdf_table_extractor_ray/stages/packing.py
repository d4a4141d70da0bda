"""Sequence packing — the pretraining-batch assembly step.

An LLM training pipeline's last mile: documents (token counts) are
packed into fixed-capacity training sequences (e.g. 2048/4096 tokens)
so padding waste is bounded. Packing is inherently ORDER-dependent —
a global greedy pass is a serial scan, which does not distribute. The
scalable shape used here (and by the published pipelines: GPT-NeoX's
preprocessing, ESM/t5x packing) is SHARDED greedy packing: documents
are deterministically sharded (id mod n_shards), each shard packs
independently in stable id order, and shards map 1:1 to output files.
Fill efficiency is within noise of the global pass when shards hold
thousands of docs, and the result is reproducible across cluster
sizes, block layouts and reruns — the property that actually matters
for training-data lineage.

Only (id, n_tokens, shard) rows ever shuffle — text never moves. A
document longer than the capacity is split into ⌈n/capacity⌉ chunks
(full chunks fill a bin each; the remainder packs with other docs),
matching the standard "document concatenation with splitting" recipe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pdf_table_extractor_ray.stages.textstats import token_count_batch


def pack_counts(ids: np.ndarray, toks: np.ndarray, capacity: int):
    """Greedy in-order packing of (id, token-count) pairs.

    Returns (bin_id per CHUNK, chunk_tokens, chunk_ids). Pure numpy-in
    /python-loop-over-chunks core, reused by the distributed stage per
    shard AND by tests as the reference semantics. Zero-token docs are
    skipped (they occupy no sequence positions)."""
    bin_ids, chunk_toks, chunk_ids = [], [], []
    cur_bin, fill = 0, 0
    for i, t in zip(ids, toks):
        t = int(t)
        if t <= 0:
            continue
        while t > 0:
            c = min(t, capacity)
            if fill + c > capacity:
                cur_bin += 1
                fill = 0
            bin_ids.append(cur_bin)
            chunk_toks.append(c)
            chunk_ids.append(int(i))
            fill += c
            t -= c
    return (
        np.array(bin_ids, np.int64),
        np.array(chunk_toks, np.int64),
        np.array(chunk_ids, np.int64),
    )


def pack_sequences(
    ds: "ray.data.Dataset",
    capacity: int,
    n_shards: int = 32,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Shard-parallel greedy sequence packing over a document table.

    Per output row: one PACKED BIN — (shard, bin_id, n_items,
    n_tokens) where n_items counts the doc chunks placed in the bin
    and n_tokens ≤ capacity its fill. Deterministic for a given
    (capacity, n_shards): shard = id mod n_shards, in-shard order is
    ascending id. At 100 TB each shard's shuffle payload is the slim
    (id, n_tokens) pair — size n_shards so a shard's pairs fit one
    aggregator (10^12 docs / 65536 shards ≈ 15M pairs ≈ 240 MB)."""
    if capacity <= 0:
        raise ValueError(f"pack_sequences: capacity must be > 0, got {capacity}")

    def project(b: pa.Table) -> pa.Table:
        t = token_count_batch(b, text_col=text_col)
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "shard": pa.array(np.mod(ids, n_shards), pa.int64()),
                "id": pa.array(ids, pa.int64()),
                "n_tokens": t.column("n_tokens"),
            }
        )

    def pack_shard(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g.column("id"))
        ids = g.column("id").take(order).to_numpy(zero_copy_only=False)
        toks = g.column("n_tokens").take(order).to_numpy(zero_copy_only=False)
        bins, ctoks, _cids = pack_counts(ids, toks, capacity)
        shard = int(g.column("shard")[0].as_py())
        if not len(bins):
            return pa.table(
                {
                    "shard": pa.array([], pa.int64()),
                    "bin_id": pa.array([], pa.int64()),
                    "n_items": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        n_items = np.bincount(bins).astype(np.int64)
        fill = np.bincount(bins, weights=ctoks).astype(np.int64)
        bin_ids = np.arange(len(n_items), dtype=np.int64)
        return pa.table(
            {
                "shard": pa.array(np.full(len(bin_ids), shard, np.int64)),
                "bin_id": pa.array(bin_ids),
                "n_items": pa.array(n_items),
                "n_tokens": pa.array(fill),
            }
        )

    slim = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    return slim.groupby("shard").map_groups(pack_shard, batch_format="pyarrow")


def epoch_pack(
    ds: "ray.data.Dataset",
    capacity: int,
    seed: int = 0,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Epoch-ordered sequence packing: the training-batch assembly
    done in the DETERMINISTIC SHUFFLE's order instead of id order —
    consecutive training sequences then hold unrelated documents (the
    property epoch shuffling exists for), and a new ``seed`` re-packs
    a fresh epoch with zero carried state.

    Composition: ``deterministic_shuffle`` (the permutation key's top
    bits are the shard — balanced by avalanche, each shard a
    CONTIGUOUS range of epoch positions, so concatenating shards 0..S
    in order replays the exact epoch stream) + per-shard greedy
    ``pack_counts`` in position order. Only slim (id, n_tokens) pairs
    cross the single bucket exchange; text never moves.

    Per output row: one packed bin — (shard, bin_id, n_items,
    n_tokens, first_pos) with ``first_pos`` the epoch position of the
    bin's first chunk (bins are emitted in epoch order within a
    shard: bin_id ascends with position). Reproducible across reruns,
    layouts and cluster sizes for a given (capacity, seed, n_shards).
    """
    from pdf_table_extractor_ray.stages.shuffle import deterministic_shuffle

    if capacity <= 0:
        raise ValueError(f"epoch_pack: capacity must be > 0, got {capacity}")

    def project(b: pa.Table) -> pa.Table:
        t = token_count_batch(b, text_col=text_col)
        return pa.table(
            {
                "id": pc.cast(t.column("doc_id"), pa.int64()),
                "n_tokens": t.column("n_tokens"),
            }
        )

    slim = ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    shuffled = deterministic_shuffle(
        slim, id_col="id", seed=seed, n_buckets=n_shards, bucket_col="shard"
    )

    def pack_shard(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(g.column("pos"))
        ids = g.column("id").take(order).to_numpy(zero_copy_only=False)
        toks = g.column("n_tokens").take(order).to_numpy(zero_copy_only=False)
        pos = g.column("pos").take(order).to_numpy(zero_copy_only=False)
        bins, ctoks, _cids = pack_counts(ids, toks, capacity)
        shard = int(g.column("shard")[0].as_py())
        empty = pa.table(
            {
                "shard": pa.array([], pa.int64()),
                "bin_id": pa.array([], pa.int64()),
                "n_items": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "first_pos": pa.array([], pa.int64()),
            }
        )
        if not len(bins):
            return empty
        # chunk i came from the doc at sorted index: map via repeat of
        # per-doc chunk counts — pack_counts emits chunks in input
        # (epoch) order, so the bin's first chunk is its first row
        n_items = np.bincount(bins).astype(np.int64)
        fill = np.bincount(bins, weights=ctoks).astype(np.int64)
        first_chunk = np.concatenate([[0], np.cumsum(n_items)[:-1]])
        # epoch position per chunk: positions of the packed docs,
        # repeated per chunk of that doc (pack_counts emits chunks in
        # input order, so this aligns 1:1 with its output)
        kept = toks > 0
        chunks_per_doc = np.ceil(toks[kept] / capacity).astype(np.int64)
        chunk_pos = np.repeat(pos[kept], chunks_per_doc)
        first_pos = chunk_pos[first_chunk]
        bin_ids = np.arange(len(n_items), dtype=np.int64)
        return pa.table(
            {
                "shard": pa.array(np.full(len(bin_ids), shard, np.int64)),
                "bin_id": pa.array(bin_ids),
                "n_items": pa.array(n_items),
                "n_tokens": pa.array(fill),
                "first_pos": pa.array(first_pos),
            }
        )

    return shuffled.groupby("shard").map_groups(pack_shard, batch_format="pyarrow")
