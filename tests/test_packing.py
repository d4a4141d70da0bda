"""Sequence packing: reference-semantics parity and invariants."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_table(rng, n):
    # word counts spanning: empty, tiny, around-capacity, multi-capacity
    toks = np.concatenate(
        [
            np.zeros(3, np.int64),
            rng.integers(1, 40, n),
            rng.integers(200, 300, 10),
            np.array([1000, 513, 512]),
        ]
    )
    texts = ["w " * int(t) for t in toks]
    ids = np.arange(len(texts), dtype=np.int64)
    # shuffle row order: packing must not depend on input layout
    perm = rng.permutation(len(ids))
    return pa.table(
        {"doc_id": ids[perm], "text": pa.array([texts[i] for i in perm])}
    ), dict(zip(ids.tolist(), toks.tolist()))


def _reference_bins(tok_by_id, capacity, n_shards):
    """Pure-python replica of the documented semantics."""
    from pdf_table_extractor_ray.stages.packing import pack_counts

    out = {}
    for shard in range(n_shards):
        ids = sorted(i for i in tok_by_id if i % n_shards == shard)
        toks = np.array([tok_by_id[i] for i in ids], np.int64)
        bins, ctoks, _ = pack_counts(np.array(ids, np.int64), toks, capacity)
        for b, t in zip(bins, ctoks):
            key = (shard, int(b))
            n_items, n_tok = out.get(key, (0, 0))
            out[key] = (n_items + 1, n_tok + int(t))
    return out


CAP, SHARDS = 256, 4


def test_pack_sequences_matches_reference(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(31)
    tbl, tok_by_id = _docs_table(rng, 80)
    ds = ray.data.from_arrow(tbl).repartition(5)
    rows = pack_sequences(ds, capacity=CAP, n_shards=SHARDS).take_all()
    got = {(r["shard"], r["bin_id"]): (r["n_items"], r["n_tokens"]) for r in rows}
    assert got == _reference_bins(tok_by_id, CAP, SHARDS)

    # invariants: fill bounded, token mass conserved, bins contiguous
    assert all(r["n_tokens"] <= CAP for r in rows)
    assert sum(r["n_tokens"] for r in rows) == sum(tok_by_id.values())
    for s in range(SHARDS):
        bins = sorted(r["bin_id"] for r in rows if r["shard"] == s)
        assert bins == list(range(len(bins)))


def test_pack_sequences_layout_invariant(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(37)
    tbl, _ = _docs_table(rng, 60)
    a = pack_sequences(ray.data.from_arrow(tbl), capacity=CAP, n_shards=SHARDS).take_all()
    b = pack_sequences(
        ray.data.from_arrow(tbl).repartition(7), capacity=CAP, n_shards=SHARDS
    ).take_all()
    key = lambda r: (r["shard"], r["bin_id"])  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_pack_counts_splits_long_docs(ray_session):
    from pdf_table_extractor_ray.stages.packing import pack_counts

    bins, ctoks, cids = pack_counts(
        np.array([1, 2, 3], np.int64), np.array([600, 10, 0], np.int64), 256
    )
    # doc 1 → chunks 256+256+88; doc 2 (10) packs after the remainder
    assert ctoks.tolist() == [256, 256, 88, 10]
    assert bins.tolist() == [0, 1, 2, 2]
    assert cids.tolist() == [1, 1, 1, 2]  # zero-token doc 3 skipped

    with pytest.raises(ValueError, match="capacity"):
        from pdf_table_extractor_ray.stages.packing import pack_sequences
        import ray.data

        pack_sequences(ray.data.from_items([{"doc_id": 1, "text": "x"}]), capacity=0)


def _epoch_reference(tok_by_id, capacity, seed, n_shards):
    """Pure-python replica of epoch_pack's documented semantics:
    shard = shuffle key top bits, in-shard order = epoch position."""
    from pdf_table_extractor_ray.stages.packing import pack_counts
    from pdf_table_extractor_ray.stages.shuffle import shuffle_key

    ids = np.array(sorted(tok_by_id), np.int64)
    key = shuffle_key(ids, seed)
    shift = np.uint64(64 - (n_shards.bit_length() - 1))
    shard = (key >> shift).astype(np.int64)
    out = {}
    for s in range(n_shards):
        m = shard == s
        sids = ids[m][np.argsort(key[m], kind="stable")]
        toks = np.array([tok_by_id[int(i)] for i in sids], np.int64)
        bins, ctoks, _ = pack_counts(sids, toks, capacity)
        for b, t in zip(bins, ctoks):
            k = (s, int(b))
            n_items, n_tok = out.get(k, (0, 0))
            out[k] = (n_items + 1, n_tok + int(t))
    return out


def test_epoch_pack_matches_reference_and_is_layout_invariant(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.packing import epoch_pack

    rng = np.random.default_rng(5)
    tbl, tok_by_id = _docs_table(rng, 60)
    ref = _epoch_reference(tok_by_id, CAP, 3, SHARDS)

    def run(parts):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        rows = epoch_pack(ds, capacity=CAP, seed=3, n_shards=SHARDS).take_all()
        return {
            (r["shard"], r["bin_id"]): (r["n_items"], r["n_tokens"])
            for r in rows
        }, rows

    got, rows = run(5)
    assert got == ref
    got2, _ = run(2)
    assert got2 == got  # layout-invariant
    # token conservation: every non-empty doc's tokens all placed
    assert sum(t for _, t in got.values()) == sum(tok_by_id.values())
    # fill bound + first_pos ascends with bin_id within a shard
    by_shard = {}
    for r in rows:
        assert r["n_tokens"] <= CAP
        by_shard.setdefault(r["shard"], []).append((r["bin_id"], r["first_pos"]))
    for pairs in by_shard.values():
        pairs.sort()
        fps = [p for _, p in pairs]
        assert fps == sorted(fps)  # epoch order within the shard


def test_epoch_pack_new_seed_new_order(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.packing import epoch_pack

    rng = np.random.default_rng(9)
    tbl, tok_by_id = _docs_table(rng, 60)
    ds = ray.data.from_arrow(tbl)

    def sig(seed):
        rows = epoch_pack(ds, capacity=CAP, seed=seed, n_shards=SHARDS).take_all()
        return tuple(
            sorted((r["shard"], r["bin_id"], r["n_items"], r["n_tokens"]) for r in rows)
        )

    a, b = sig(1), sig(2)
    assert a != b  # a different epoch is a different packing
    assert sig(1) == a  # same seed reproduces exactly
