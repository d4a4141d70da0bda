"""Training-mix budget allocation — the UniMax waterfill (Chung et
al. 2023, "UniMax: Fairer and More Effective Language Sampling for
Large-Scale Multilingual Pretraining"): given per-source token masses,
a total token budget, and a per-source epoch cap E, allocate each
source min(E·nᵢ, fair share), smallest sources first, so no source is
over-epoched and the leftover budget spreads equally.

Integer-exact closed form (no iteration): sort sources ascending by
token mass; with capᵢ = E·nᵢ and prefix sums pfx, source i "fits" iff
capᵢ·(k−i+1) + pfx_{i−1} ≤ B — this test is MONOTONE in i (difference
(k−i)(cap_{i+1}−capᵢ) ≥ 0), so the fitting set is a prefix: the
largest fitting index m gets every smaller source its full cap, and
the k−m others each get ⌊(B − pfx_m)/(k−m)⌋ (the sub-floor remainder
stays unallocated — deterministic, SQL-checkable bit-for-bit).

Scale shape: ONE map-side token-count partial + one groupby over the
bounded source axis (the engine's standard bounded-cardinality
contract — sources are a curated list, not a data-scale axis), then a
driver-side closed-form waterfill over ≤ |sources| rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def token_mass_by(
    ds: "ray.data.Dataset", key_col: str = "source", text_col: str = "text"
) -> "ray.data.Dataset":
    """(key, n_tokens) whitespace-token mass per key — map-side count
    reduction (the token stream never shuffles), one slim groupby."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.lm import _flat_tokens

    def partial(b: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(b.column(text_col))
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(b.num_rows), lens)
        ntok = np.bincount(
            doc_idx, weights=nonempty.astype(np.int64), minlength=b.num_rows
        ).astype(np.int64)
        t = pa.table({"key": pc.cast(b.column(key_col), pa.string()), "n": ntok})
        return (
            pa.TableGroupBy(t, ["key"])
            .aggregate([("n", "sum")])
            .rename_columns(["key", "n"])
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("n"))
        .map_batches(
            lambda b: pa.table(
                {"key": b.column("key"), "n": pc.cast(b.column("sum(n)"), pa.int64())}
            ),
            batch_format="pyarrow",
        )
    )


def unimax_allocation(
    masses,
    budget: int,
    epochs: int = 4,
) -> pa.Table:
    """UniMax waterfill over a bounded (key, n) mass table (a Dataset
    or a pyarrow Table): returns (key, n_tokens, alloc_tokens) with
    Σ alloc ≤ budget, allocᵢ ≤ epochs·nᵢ, and every non-capped source
    receiving the same floor share. All arithmetic in Python ints — no
    overflow at any corpus size. The mass table is driver-materialized
    under the bounded source-axis contract (``token_mass_by``)."""
    if isinstance(masses, pa.Table):
        rows = masses.to_pylist()
    else:
        rows = masses.take_all()  # bounded by the source-axis contract
    rows.sort(key=lambda r: (int(r["n"]), str(r["key"])))
    k = len(rows)
    if k == 0:
        return pa.table(
            {
                "key": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
                "alloc_tokens": pa.array([], pa.int64()),
            }
        )
    caps = [int(epochs) * int(r["n"]) for r in rows]
    budget = int(budget)
    pfx = 0
    m = 0  # number of fully-capped (fitting) sources
    pm = 0  # prefix cap mass of the fitting set
    for i, c in enumerate(caps, start=1):
        if c * (k - i + 1) + pfx <= budget:
            m, pm = i, pfx + c
        pfx += c
    share = (budget - pm) // (k - m) if m < k else 0
    alloc = [caps[i] if i < m else share for i in range(k)]
    return pa.table(
        {
            "key": pa.array([str(r["key"]) for r in rows], pa.string()),
            "n_tokens": pa.array([int(r["n"]) for r in rows], pa.int64()),
            "alloc_tokens": pa.array(alloc, pa.int64()),
        }
    )


def temperature_allocation(
    masses,
    budget: int,
) -> pa.Table:
    """Temperature-sampled training-mix allocation — the multilingual
    α-sampling rule (p_i ∝ n_i^α, α=0.5 here): low-resource sources are
    upsampled relative to proportional mixing, high-resource ones
    downsampled. Deterministic INTEGER variant so the result is
    bit-exact and SQL-checkable: weights w_i = isqrt(n_i) (== the
    correctly-rounded floor(sqrt) for every n < 2^52), apportioned by
    the LARGEST-REMAINDER (Hamilton) method — base_i = B·w_i // W, then
    +1 to the ``B − Σbase`` largest remainders (key ascending on ties).
    Σ alloc == budget exactly. All Python-int arithmetic; the mass
    table is driver-materialized under the bounded source-axis
    contract (``token_mass_by``)."""
    import math

    if isinstance(masses, pa.Table):
        rows = masses.to_pylist()
    else:
        rows = masses.take_all()  # bounded by the source-axis contract
    budget = int(budget)
    rows.sort(key=lambda r: str(r["key"]))
    w = [math.isqrt(int(r["n"])) for r in rows]
    W = sum(w)
    if W == 0 or not rows:
        return pa.table(
            {
                "key": pa.array([str(r["key"]) for r in rows], pa.string()),
                "n_tokens": pa.array([int(r["n"]) for r in rows], pa.int64()),
                "alloc_tokens": pa.array([0] * len(rows), pa.int64()),
            }
        )
    base = [budget * wi // W for wi in w]
    rem = [budget * wi % W for wi in w]
    leftover = budget - sum(base)
    order = sorted(range(len(rows)), key=lambda i: (-rem[i], str(rows[i]["key"])))
    for i in order[:leftover]:
        base[i] += 1
    return pa.table(
        {
            "key": pa.array([str(r["key"]) for r in rows], pa.string()),
            "n_tokens": pa.array([int(r["n"]) for r in rows], pa.int64()),
            "alloc_tokens": pa.array(base, pa.int64()),
        }
    )


def value_stats_by(
    ds: "ray.data.Dataset",
    key_col: str,
    value_col: str,
    scale: int = 100,
) -> "ray.data.Dataset":
    """Integer sufficient statistics per key: (key, n, sx, sxx) with
    values floored to ``scale``-ths (cents). Map-side combiner → one
    slim groupby-Sum; exact Python-int math downstream. Null keys or
    values are excluded (SQL aggregate semantics)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col)
        v = batch.column(value_col)
        mask = pc.and_(pc.is_valid(k), pc.is_valid(v))
        b = batch.filter(mask)
        k = b.column(key_col)
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        x = np.floor(
            b.column(value_col).to_numpy(zero_copy_only=False) * scale
        ).astype(np.int64)
        enc = k.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        V = len(enc.dictionary)
        n = np.bincount(codes, minlength=V)
        sx = np.zeros(V, np.int64)
        np.add.at(sx, codes, x)
        # per-batch Σx² accumulates in int64: exact while a BATCH's
        # total stays < 2^63 (≈2.5·10⁷ rows of $1M-scale cents — far
        # above any block size); CROSS-batch totals ride decimal128
        # through the groupby, exact to 10^38
        sxx = np.zeros(V, np.int64)
        np.add.at(sxx, codes, x * x)
        return pa.table(
            {
                "key": pc.cast(enc.dictionary, pa.string()),
                "n_part": pa.array(n.astype(np.int64), pa.int64()),
                "sx_part": pa.array(sx, pa.int64()),
                "sxx_part": pa.array([int(s) for s in sxx], pa.decimal128(38, 0)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .aggregate(Sum("n_part"), Sum("sx_part"), Sum("sxx_part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b.column("key"),
                "n": pc.cast(b.column("sum(n_part)"), pa.int64()),
                "sx": pc.cast(b.column("sum(sx_part)"), pa.int64()),
                "sxx": b.column("sum(sxx_part)"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def neyman_allocation(stats, budget: int) -> pa.Table:
    """Variance-optimal (Neyman) sample allocation — the survey-
    sampling rule for spending a labeling/inspection budget across
    strata: n_h ∝ N_h·σ_h minimizes the variance of the estimated
    mean. INTEGER-EXACT throughout: with values in cents,
    N_h·σ_h = isqrt(N_h·Σx²_h − (Σx_h)²) (population σ — the sqrt of
    an exact integer), apportioned by the same largest-remainder
    Hamilton method as ``temperature_allocation``. Σ alloc == budget
    exactly; bit-reproducible and SQL-checkable (the oracle emulates
    isqrt with a float sqrt plus monotone ±2 correction)."""
    import math

    if isinstance(stats, pa.Table):
        rows = stats.to_pylist()
    else:
        rows = stats.take_all()  # bounded by the key-axis contract
    budget = int(budget)
    rows.sort(key=lambda r: str(r["key"]))
    w = []
    for r in rows:
        n, sx, sxx = int(r["n"]), int(r["sx"]), int(r["sxx"])
        v = n * sxx - sx * sx
        w.append(math.isqrt(v) if v > 0 else 0)
    W = sum(w)
    keys = [str(r["key"]) for r in rows]
    ns = [int(r["n"]) for r in rows]
    if W == 0 or not rows:
        return pa.table(
            {
                "key": pa.array(keys, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "alloc": pa.array([0] * len(rows), pa.int64()),
            }
        )
    base = [budget * wi // W for wi in w]
    rem = [budget * wi % W for wi in w]
    leftover = budget - sum(base)
    order = sorted(range(len(rows)), key=lambda i: (-rem[i], keys[i]))
    for i in order[:leftover]:
        base[i] += 1
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "alloc": pa.array(base, pa.int64()),
        }
    )
