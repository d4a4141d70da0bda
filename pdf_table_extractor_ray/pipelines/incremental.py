"""Incremental materialized-rollup maintenance — delta aggregation of
newly-ingested shards merged into a stored rollup, the ingestion-side
twin of the extraction pipeline's incremental re-extraction
(``pipelines/extract.py`` input-shard fingerprints).

A production corpus ingests continuously; recomputing a day-level
rollup over the full history for every arriving shard is O(corpus)
per update. This module maintains the rollup with work proportional
to the CHANGED data only:

- **per-shard partials**: each input shard's own rollup rows live in
  a fingerprint-keyed parquet (``partials/part=<pid>-<fp>.parquet``).
  A changed or removed shard is *retracted* by re-merging its old
  partial with the measure columns negated — legal because the
  contract is ADDITIVE measures only (Sum/Count; never Min/Max).
- **generation-atomic snapshots**: every update writes
  ``gen=<N+1>/snapshot.parquet`` + ``state.json`` and then swaps the
  ``_CURRENT`` pointer by atomic rename. A crash mid-update leaves
  ``_CURRENT`` on the old generation; the rerun is idempotent
  (partials are fingerprint-keyed, the new generation directory is
  rewritten wholesale).
- **scale shape**: the delta pass reads ONLY the new/changed shard
  files (one distributed combiner + groupby-Sum); the merge unions
  rollup-SIZED inputs (previous snapshot, retractions, new partials)
  — bounded by the key-space, never by the corpus. State metadata is
  one JSON row per shard, the same bounded contract as extraction
  lineage.

The reference has no incremental surface at all (rerun = redo
everything, ``/root/reference/conversor_bradesco.py:19-31`` is its
only disk state); this generalizes the north rule's "resumable with
per-partition lineage" to continuously-maintained aggregates.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from pdf_table_extractor_ray.pipelines.extract import shard_fingerprint


@dataclass(frozen=True)
class RollupSpec:
    """What the maintained rollup computes.

    ``combine`` maps one Arrow batch of raw rows to partial rollup
    rows ``keys + measures`` (pre-reduced within the batch); partials
    from any subset of the data merge by ``groupby(keys).Sum(measures)``
    — i.e. the measures MUST be additive (sums/counts). Non-additive
    aggregates (min/max/distinct) are rejected by this design: they
    cannot be retracted when a shard changes.
    """

    keys: Sequence[str]
    measures: Sequence[str]
    combine: Callable[[pa.Table], pa.Table] = field(repr=False)


def _current_path(store_dir: str) -> str:
    return os.path.join(store_dir, "_CURRENT")


def current_generation(store_dir: str) -> int:
    """Generation the store points at; 0 = empty store."""
    try:
        with open(_current_path(store_dir)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def _gen_dir(store_dir: str, gen: int) -> str:
    return os.path.join(store_dir, f"gen={gen}")


def _load_state(store_dir: str, gen: int) -> Dict[str, dict]:
    """pid(str) → {fingerprint, partial, shard} for generation gen."""
    if gen == 0:
        return {}
    with open(os.path.join(_gen_dir(store_dir, gen), "state.json")) as f:
        return json.load(f)


def read_snapshot(store_dir: str) -> Optional["ray.data.Dataset"]:
    """The current merged rollup as a Dataset (None if the store is
    empty)."""
    gen = current_generation(store_dir)
    if gen == 0:
        return None
    return ray.data.read_parquet(os.path.join(_gen_dir(store_dir, gen), "snapshot.parquet"))


def _partial_rollup(
    spec: RollupSpec, shard_paths: Sequence[str]
) -> "ray.data.Dataset":
    """Distributed rollup over exactly the given shard files."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(list(shard_paths))
    agg = (
        ds.map_batches(spec.combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(list(spec.keys))
        .aggregate(*[Sum(m) for m in spec.measures])
    )

    def finish(b: pa.Table) -> pa.Table:
        cols = {k: b.column(k) for k in spec.keys}
        for m in spec.measures:
            cols[m] = pc.cast(b.column(f"sum({m})"), pa.int64())
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


def _negate(spec: RollupSpec, t: pa.Table) -> pa.Table:
    cols = {k: t.column(k) for k in spec.keys}
    for m in spec.measures:
        cols[m] = pc.multiply(t.column(m), pa.scalar(-1, pa.int64()))
    return pa.table(cols)


def update_rollup(
    store_dir: str,
    spec: RollupSpec,
    shards: Dict[str, str],
) -> "ray.data.Dataset":
    """Fold the current shard set into the store and return the new
    (or unchanged) snapshot Dataset.

    ``shards``: pid → shard parquet path for every shard that SHOULD
    be reflected in the rollup now — pids absent vs the recorded state
    are retracted, new pids are added, fingerprint-changed pids are
    retracted-then-readded. No raw data outside the changed shards is
    read.
    """
    os.makedirs(os.path.join(store_dir, "partials"), exist_ok=True)
    gen = current_generation(store_dir)
    state = _load_state(store_dir, gen)

    fps = {pid: shard_fingerprint(path) for pid, path in shards.items()}
    added = [pid for pid in shards if pid not in state]
    changed = [
        pid for pid in shards if pid in state and state[pid]["fingerprint"] != fps[pid]
    ]
    removed = [pid for pid in state if pid not in shards]
    if not added and not changed and not removed:
        return read_snapshot(store_dir)

    # 1. new partials for added+changed shards — the ONLY raw-data read
    new_partials: Dict[str, str] = {}
    for pid in added + changed:
        ppath = os.path.join(store_dir, "partials", f"part={pid}-{fps[pid][:12]}.parquet")
        if not os.path.exists(ppath):
            # a partial is rollup-sized (bounded by the key space per
            # shard) — one small local parquet per shard, written
            # tmp+rename so a crash never leaves a torn file
            import ray as _ray

            refs = _partial_rollup(spec, [shards[pid]]).to_arrow_refs()
            tbl = pa.concat_tables(_ray.get(refs), promote_options="default")
            pq.write_table(tbl, ppath + ".tmp")
            os.replace(ppath + ".tmp", ppath)
        new_partials[pid] = ppath

    # 2. merge rollup-sized inputs: previous snapshot + retractions of
    #    changed/removed old partials + new partials
    parts: List["ray.data.Dataset"] = []
    prev = read_snapshot(store_dir)
    if prev is not None:
        parts.append(prev)
    retract_paths = [state[pid]["partial"] for pid in changed + removed]
    if retract_paths:
        parts.append(
            ray.data.read_parquet(retract_paths).map_batches(
                lambda b: _negate(spec, b), batch_format="pyarrow"
            )
        )
    add_paths = [new_partials[pid] for pid in added + changed]
    if add_paths:
        parts.append(ray.data.read_parquet(add_paths))

    from ray.data.aggregate import Sum

    merged = parts[0]
    for p in parts[1:]:
        merged = merged.union(p)
    agg = merged.groupby(list(spec.keys)).aggregate(*[Sum(m) for m in spec.measures])

    def finish(b: pa.Table) -> pa.Table:
        cols = {k: b.column(k) for k in spec.keys}
        for m in spec.measures:
            cols[m] = pc.cast(b.column(f"sum({m})"), pa.int64())
        # rows whose every measure retracted to 0 vanish (a fully
        # removed key must not linger as a zero row)
        nz = None
        for m in spec.measures:
            m_nz = pc.not_equal(cols[m], 0)
            nz = m_nz if nz is None else pc.or_(nz, m_nz)
        t = pa.table(cols)
        return t.filter(nz) if nz is not None else t

    snapshot = agg.map_batches(finish, batch_format="pyarrow")

    # 3. write generation N+1, then swap the pointer atomically
    new_gen = gen + 1
    gdir = _gen_dir(store_dir, new_gen)
    snap_dir = os.path.join(gdir, "snapshot.parquet")
    if os.path.exists(gdir):  # crashed attempt: rewrite wholesale
        import shutil

        shutil.rmtree(gdir)
    os.makedirs(snap_dir, exist_ok=True)
    snapshot = snapshot.materialize()
    snapshot.write_parquet(snap_dir)
    new_state = {
        pid: {
            "fingerprint": fps[pid],
            "partial": new_partials.get(pid, state.get(pid, {}).get("partial")),
            "shard": shards[pid],
        }
        for pid in shards
    }
    with open(os.path.join(gdir, "state.json"), "w") as f:
        json.dump(new_state, f, indent=1, sort_keys=True)
    tmp = _current_path(store_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(new_gen))
    os.replace(tmp, _current_path(store_dir))
    return snapshot


# ---------------------------------------------------------------------------
# incremental crawl dedup against a persisted fingerprint index


def dedup_index_append(ds, index_dir: str, text_col: str = "text") -> None:
    """Append ``ds``'s distinct content hashes to the on-disk
    fingerprint index (one parquet shard per batch, atomic rename) —
    the state a rolling crawl carries between runs. Index rows are
    (content_md5) only; at 10^12 documents the index is a few TB of
    hashes, hash-partitioned parquet the anti-join below can shuffle,
    never anything a driver must hold."""
    import uuid

    import pyarrow.parquet as pq

    from pdf_table_extractor_ray.stages.dedup import add_md5_batch

    os.makedirs(index_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        b = add_md5_batch(batch, text_col)
        hashes = b.select(["content_md5"])
        import pyarrow.compute as pc

        # per-batch distinct combiner — cross-batch dups are fine in
        # the index (the anti-join is membership, not a count)
        hashes = hashes.group_by("content_md5").aggregate([])
        path = os.path.join(index_dir, f"fp-{uuid.uuid4().hex[:12]}.parquet")
        tmp = path + ".tmp"
        pq.write_table(hashes, tmp)
        os.rename(tmp, path)
        return pa.table({"n": pa.array([hashes.num_rows], pa.int64())})

    ds.map_batches(write_shard, batch_format="pyarrow", zero_copy_batch=True).count()


def dedup_against_index(
    ds,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Incremental exact dedup — today's crawl against ALL previous
    runs plus itself: (1) within-run keepers (min id per content
    hash — one slim (hash, id) groupby), (2) LEFT ANTI hash-shuffle
    join of the keepers' hashes against the persisted index (both
    sides partition on the hash; the index never broadcasts and never
    lands on the driver), (3) the surviving ids filter the full rows.
    Returns the survivor Dataset; call ``dedup_index_append`` on it to
    roll the index forward."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    from pdf_table_extractor_ray.stages.dedup import add_md5_batch, drop_by_ids
    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    def project(batch: pa.Table) -> pa.Table:
        b = add_md5_batch(batch, text_col)
        return b.select(["content_md5", id_col])

    keepers = (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("content_md5")
        .aggregate(Min(id_col))
    )

    def tidy(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("content_md5"), pc.cast(b.column(f"min({id_col})"), pa.int64())],
            names=["content_md5", id_col],
        )

    keepers = keepers.map_batches(tidy, batch_format="pyarrow")
    index = ray.data.read_parquet(index_dir, columns=["content_md5"])
    fresh = hash_shuffle_join(
        keepers, index, on="content_md5", how="left_anti"
    )

    def ids_only(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays([b.column(id_col)], names=[id_col])

    keep_ids = fresh.map_batches(ids_only, batch_format="pyarrow", zero_copy_batch=True)
    # survivors = keep_ids ⋉ ds: reuse the adaptive filter in reverse —
    # drop everything NOT kept via a keep-set semi filter
    import ray as _ray

    keep_tbl = keep_ids.materialize()
    n_keep = keep_tbl.count()
    if n_keep <= 1_000_000:
        id_arr = pa.array([r[id_col] for r in keep_tbl.take_all()], pa.int64())
        handle = _ray.put(id_arr)

        def keep_filter(b: pa.Table) -> pa.Table:
            wanted = _ray.get(handle)
            return b.filter(pc.is_in(b.column(id_col), value_set=wanted))

        return ds.map_batches(keep_filter, batch_format="pyarrow", zero_copy_batch=True)
    return hash_shuffle_join(ds, keep_tbl, on=id_col, how="left_semi")
