"""Join operators.

The reference's only join-like op is a dead-code broadcast of header
info onto content rows (`add_infos`, conversor_itau.py:119-123 — T5 in
SURVEY §2.6). Generalized here as the canonical small-side broadcast
join: the build side is collected ONCE into an Arrow hash map, shipped
through one ``ray.put``, and probed inside every ``map_batches`` task —
no shuffle of the probe side, which is the only join strategy that
makes sense when one side is orders of magnitude smaller (dimension
tables, per-host metadata) at 100 TB probe scale.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


_EMPTY_PARTITION_PATCHED = False

try:  # Ray internals — degrade to stock behavior if they move
    from ray.data._internal.execution.operators.join import (
        JoiningShuffleAggregation as _RayJoinAggregation,
    )
    from ray.data._internal.logical.operators.join_operator import (
        JoinType as _RayJoinType,
    )
except ImportError:  # pragma: no cover - exercised only on Ray upgrades
    _RayJoinAggregation = None
    _RayJoinType = None


if _RayJoinAggregation is not None:

    class _EmptySafeJoinAggregation(_RayJoinAggregation):
        """Ray's join aggregation, hardened for EMPTY partitions.

        Module-level (not defined inside the patch function) so
        cloudpickle ships it BY REFERENCE and aggregator actors import
        it from this package — a by-value pickle would also drag the
        rebound base class along by value and break its zero-arg
        ``super()`` cells. No zero-arg ``super()`` here for the same
        reason."""

        _pdfx_empty_safe = True

        def finalize(self, partition_id: int):
            lb = self._get_partition_builder(
                input_seq_id=0, partition_id=partition_id
            )
            rb = self._get_partition_builder(
                input_seq_id=1, partition_id=partition_id
            )
            # hot path untouched: only a side with ZERO ROWS can have
            # zero columns (build() is non-destructive, re-build cheap)
            if lb.num_rows() == 0 or rb.num_rows() == 0:
                left, right = lb.build(), rb.build()
                if left.num_columns and right.num_columns:
                    # schema'd empty side: stock join handles it and
                    # keeps the joined schema — don't change behavior
                    return _RayJoinAggregation.finalize(self, partition_id)
                jt = self._join_type
                if right.num_columns == 0 and jt == _RayJoinType.LEFT_ANTI:
                    return left  # nothing to match ⇒ every left row kept
                if left.num_columns == 0 and jt == _RayJoinType.RIGHT_ANTI:
                    return right
                empty_is_correct = jt in (
                    _RayJoinType.INNER,
                    _RayJoinType.LEFT_SEMI,
                    _RayJoinType.RIGHT_SEMI,
                ) or (
                    # outer joins: empty is correct iff the PRESERVED
                    # side is the absent one; otherwise fall through
                    # and raise rather than null-type unseen columns
                    jt in (_RayJoinType.LEFT_OUTER, _RayJoinType.LEFT_ANTI)
                    and left.num_columns == 0
                ) or (
                    jt in (_RayJoinType.RIGHT_OUTER, _RayJoinType.RIGHT_ANTI)
                    and right.num_columns == 0
                )
                if empty_is_correct:
                    return pa.table({})
            return _RayJoinAggregation.finalize(self, partition_id)


def _patch_join_empty_partitions() -> None:
    """Harden Ray's hash-shuffle join against EMPTY partitions.

    ``JoiningShuffleAggregation.finalize`` builds each side of a
    partition from the shards it received; a partition that received
    none on one side builds a ZERO-COLUMN table, and
    ``pa.Table.join`` then raises ``No match ... FieldRef.Name(k)``
    (ray 2.49, ray/data/_internal/execution/operators/join.py:104-126).
    Any join whose distinct-key count is comparable to num_partitions
    can hit it — at web scale, every join downstream of a selective
    filter.

    The shim intercepts ONLY that previously-always-crashing case
    (side.num_columns == 0 ⇔ no shard arrived) and returns what the
    join semantics dictate: an empty block when the missing side
    eliminates all rows (inner/semi, or the missing side is the
    preserved one), the left block unchanged for ``left anti`` (its
    output schema IS the left schema). Outer joins that would need to
    null-type the absent side still raise — typing columns we never
    saw would silently drift schemas. Zero-column empty blocks are
    then dropped by ``hash_shuffle_join``'s normalization map so
    chained shuffles see one consistent schema.

    Mechanism: ``JoinOperator.__init__`` captures the module global
    ``JoiningShuffleAggregation`` at plan-build time on the driver, so
    rebinding that global to the subclass above is sufficient — the
    factory closure ships the subclass by reference and aggregator
    actors import it from this package."""
    global _EMPTY_PARTITION_PATCHED
    if _EMPTY_PARTITION_PATCHED or _RayJoinAggregation is None:
        return
    _EMPTY_PARTITION_PATCHED = True
    from ray.data._internal.execution.operators import join as _ray_join

    if not getattr(_ray_join.JoiningShuffleAggregation, "_pdfx_empty_safe", False):
        _ray_join.JoiningShuffleAggregation = _EmptySafeJoinAggregation


def broadcast_join(
    probe: "ray.data.Dataset",
    build: "ray.data.Dataset",
    key: str,
    build_key: Optional[str] = None,
    build_cols: Optional[List[str]] = None,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Join ``probe`` (large, streamed) with ``build`` (small,
    broadcast) on ``key``. ``how`` ∈ {inner, left}.

    The build side is materialized to the driver — by contract it is a
    dimension-table-sized input (the caller is asserting smallness by
    choosing a broadcast join).
    """
    if build_key is None:
        build_key = key
    build_tbl = pa.Table.from_pylist(build.take_all())
    if build_cols is None:
        build_cols = [c for c in build_tbl.column_names if c != build_key]
    # dedup build keys, first match wins (deterministic): position of the
    # first occurrence of every distinct key
    keys_arr = build_tbl.column(build_key).combine_chunks()
    uniq = pc.unique(keys_arr)
    first_pos = pc.index_in(uniq, value_set=keys_arr)
    payload_tbl = build_tbl.select(build_cols).take(first_pos)
    # SQL join semantics: NULL never equals NULL — drop a null build key
    # so null probe keys always miss (index_in would otherwise match
    # null → null and attach that payload)
    valid_keys = pc.is_valid(uniq)
    uniq = uniq.filter(valid_keys)
    if build_cols:  # a 0-column payload (semi-join use) has no row count to filter
        payload_tbl = payload_tbl.filter(valid_keys)
    handle = ray.put((uniq, payload_tbl, build_cols))

    def probe_batch(batch: pa.Table) -> pa.Table:
        uk, payload, cols = ray.get(handle)
        # vectorized probe: index of each probe key in the (deduped) build
        # key array; null → miss
        idx = pc.index_in(batch.column(key), value_set=uk)
        if isinstance(idx, pa.ChunkedArray):
            idx = idx.combine_chunks()
        out = batch
        if how == "inner":
            hit = pc.is_valid(idx)
            out = out.filter(hit)
            idx = idx.filter(hit)
        # Table.take propagates null indices → nulls for left-join misses
        picked = payload.take(idx)
        for c in cols:
            out = out.append_column(c, picked.column(c))
        return out

    return probe.map_batches(probe_batch, batch_format="pyarrow", zero_copy_batch=True)


_JOIN_TYPES = {
    "inner": "inner",
    "left": "left_outer",
    "right": "right_outer",
    "full": "full_outer",
    "left_semi": "left_semi",
    "left_anti": "left_anti",
}


def hash_shuffle_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on,
    right_on=None,
    how: str = "inner",
    num_partitions: Optional[int] = None,
) -> "ray.data.Dataset":
    """Large-large join: hash-partition BOTH sides on the key (one
    all-to-all exchange each) and join per partition.

    ``on`` / ``right_on`` accept a single column name or a SEQUENCE of
    names — the composite-key join (e.g. (nationkey, year)) hashes the
    whole tuple in one exchange; never pre-concatenate key columns
    into a synthetic string key, which doubles the shuffled bytes.

    The relational primitive broadcast_join can't cover: when neither
    side fits in a worker heap (fact ⋈ fact, e.g. lineitem ⋈ orders at
    100 TB), the only scalable plan is a co-partitioned shuffle join.
    Delegates to ``ray.data.Dataset.join`` (hash-shuffle aggregators)
    with engine defaults. ``num_partitions`` trades aggregator-actor
    startup against per-partition memory: each partition must fit in
    one aggregator's heap, but every partition spins an actor
    (measured r4: the same 600k⋈150k join runs 5.7 s at 8 partitions,
    19.8 s at 16, 41.2 s at 32 — startup dominates mid-size inputs,
    and aggregator actors are NOT reused across joins). Default is a
    QUARTER of the cluster CPUs; at true 100-TB scale SET IT ≈ total
    cluster cores so partitions stay heap-sized. Skewed keys should be pre-salted or
    routed to broadcast_join.

    ``how``: inner | left | right | full | left_semi | left_anti.
    """
    _patch_join_empty_partitions()
    if num_partitions is None:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)) // 4)
    on_t = (on,) if isinstance(on, str) else tuple(on)
    right_t = None
    if right_on is not None:
        right_t = (right_on,) if isinstance(right_on, str) else tuple(right_on)
    joined = left.join(
        right,
        join_type=_JOIN_TYPES[how],
        num_partitions=num_partitions,
        on=on_t,
        right_on=right_t,
    )

    def _drop_schemaless(batch: pa.Table):
        # A join partition that received no rows finalizes to a
        # ZERO-COLUMN block; feeding such a block into the next keyed
        # shuffle (another join / groupby) fails with "No match for
        # FieldRef.Name(...)". Dropping zero-column blocks is row-wise
        # a no-op and restores one consistent schema. Generator UDF so
        # empty partitions emit nothing (fuses with downstream maps).
        if batch.num_columns:
            yield batch

    return joined.map_batches(
        _drop_schemaless, batch_format="pyarrow", zero_copy_batch=True
    )


def salted_hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    salt: int = 8,
    num_partitions: Optional[int] = None,
) -> "ray.data.Dataset":
    """Skew-defeating hash join. A hot key sends ALL its rows to one
    join aggregator — the classic all-to-all stall (one straggler holds
    10^9 rows while 63 partitions idle). Here every left row takes a
    salt in [0, salt) (position-derived; ANY assignment yields the
    same join result, so block layout doesn't matter), the right side
    replicates ``salt``× with an explicit salt column, and the join
    key becomes (key, salt): a hot key's rows now spread over ``salt``
    partitions.

    Cost model: right-side shuffle volume × ``salt`` — the textbook
    trade when the probe side is skewed and the build side is too big
    to broadcast but replicable (``salt`` × |right| ≪ |left|). For a
    build side that fits in a heap, prefer ``broadcast_join`` (zero
    shuffle); for balanced keys, prefer ``hash_shuffle_join`` (no
    replication).

    ``how`` ∈ {inner, left, left_semi, left_anti}: each left row
    carries exactly ONE salt and every key exists in all replicas, so
    per-row match semantics equal the unsalted join. right/full outer
    are rejected — preserved right rows would surface once per replica.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(f"salted_hash_join: how={how!r} not supported")
    rk = right_on or on

    def salt_left(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_salt", pa.array((np.arange(b.num_rows) % salt).astype(np.int64))
        )

    def replicate_right(b: pa.Table) -> pa.Table:
        reps = [
            b.append_column(
                "_salt", pa.array(np.full(b.num_rows, s, np.int64))
            )
            for s in range(salt)
        ]
        return pa.concat_tables(reps)

    _patch_join_empty_partitions()
    if num_partitions is None:
        num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)) // 4)
    joined = left.map_batches(
        salt_left, batch_format="pyarrow", zero_copy_batch=True
    ).join(
        right.map_batches(
            replicate_right, batch_format="pyarrow", zero_copy_batch=True
        ),
        join_type=_JOIN_TYPES[how],
        num_partitions=num_partitions,
        on=(on, "_salt"),
        right_on=(rk, "_salt") if right_on else None,
    )

    def cleanup(batch: pa.Table):
        if batch.num_columns:  # drop empty-partition zero-column blocks
            yield batch.drop_columns(["_salt"])

    return joined.map_batches(cleanup, batch_format="pyarrow", zero_copy_batch=True)


def bloom_filtered_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    m_bits: int = 1 << 20,
    k: int = 7,
    num_partitions: Optional[int] = None,
) -> "ray.data.Dataset":
    """Hash-shuffle join with a BLOOM PRE-FILTER on the probe side —
    the standard shuffle-volume cut when the build side is selective
    but too large (or too hot) to broadcast as an exact key set.

    A Bloom bitmap of the build keys (zero false negatives) is built
    distributed (per-batch partial bitmaps OR-merged, stages/bloom.py),
    shipped once via ``ray.put``, and probed map-side BEFORE the
    all-to-all: left rows that cannot match never enter the shuffle.
    False positives only re-admit a few rows the join itself then
    drops, so the result is IDENTICAL to ``hash_shuffle_join`` —
    which is exactly how it is tested.

    Only ``inner`` and ``left_semi`` are accepted: for left/anti/outer
    joins the pre-filter would drop rows those semantics must preserve.

    The build side is streamed TWICE (once for the bitmap, once into
    the join) — pass a cheap re-scan (a filtered parquet read) or a
    ``materialize()``d dataset. At 10% build selectivity this trades
    one extra slim scan for ~90% less probe-side shuffle volume."""
    from pdf_table_extractor_ray.stages.bloom import bloom_build, bloom_contains

    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_filtered_join: how={how!r} would drop preserved rows; "
            "use hash_shuffle_join"
        )
    rk = right_on or on
    bits_ref = ray.put(bloom_build(right, rk, m_bits, k))

    def prefilter(b: pa.Table) -> pa.Table:
        mask = bloom_contains(b.column(on), ray.get(bits_ref), m_bits, k)
        return b.filter(pa.array(mask))

    filtered = left.map_batches(prefilter, batch_format="pyarrow", zero_copy_batch=True)
    return hash_shuffle_join(filtered, right, on, right_on, how, num_partitions)


ADAPTIVE_BROADCAST_MAX = 1_000_000  # build-side rows; ~tens of MB of slim columns


def adaptive_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    broadcast_max: int = ADAPTIVE_BROADCAST_MAX,
    num_partitions: Optional[int] = None,
) -> "ray.data.Dataset":
    """Count-then-choose join: one cheap distributed ``count()`` of the
    build side picks BROADCAST (zero shuffle of the probe side) when it
    is small enough, HASH-SHUFFLE otherwise — the ``drop_by_ids``
    adaptive pattern generalized to the relational join.

    Use when the build side's size is data-dependent (a filtered read
    whose selectivity varies by input) so neither plan is safe to
    hardcode: a fact-sized broadcast floods the driver (VERDICT r3 #4),
    a dimension-sized shuffle pays two all-to-alls for nothing.

    ``how``: inner | left | left_semi | left_anti (the set both
    underlying plans implement with identical semantics). The build
    side is traversed twice on the broadcast path (count + collect) —
    pass a cheap re-scan or a ``materialize()``d dataset.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(f"adaptive_join: how={how!r} not supported")
    rk = right_on or on
    n_right = right.count()
    if n_right <= broadcast_max:
        if how in ("inner", "left"):
            return broadcast_join(left, right, key=on, build_key=rk, how=how)
        # semi/anti via the broadcast key-set probe
        keys_tbl = pa.Table.from_pylist(
            right.select_columns([rk]).take_all()
        )  # bounded: ≤ broadcast_max rows by the count gate
        key_set = pc.unique(keys_tbl.column(rk).combine_chunks()) if keys_tbl.num_rows else pa.array([], keys_tbl.schema.field(rk).type if keys_tbl.num_columns else pa.int64())
        key_set = key_set.filter(pc.is_valid(key_set))  # NULL never matches
        handle = ray.put(key_set)
        keep_hits = how == "left_semi"

        def probe(batch: pa.Table) -> pa.Table:
            ks = ray.get(handle)
            hit = pc.fill_null(pc.is_in(batch.column(on), value_set=ks), False)
            return batch.filter(hit if keep_hits else pc.invert(hit))

        return left.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)
    return hash_shuffle_join(left, right, on, right_on, how, num_partitions)
