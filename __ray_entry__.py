"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001.
``queries()`` exposes every implemented operator family from
SURVEY.md §2 (+ the training-data ops: dedup, text stats, similarity);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible query, with matching column names.

Ray is initialised by the driver BEFORE this module is imported — no
``ray.init()`` / ``ray.shutdown()`` anywhere in these code paths.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# fixture corpus sizes per testdata scale factor (deterministic, cached
# under /tmp keyed by generator version; multiples of the fixture families)
_FIXTURE_N = {"sf0.001": 240, "sf0.01": 960, "sf0.1": 3840}
_FIXTURE_ROOT = os.environ.get("PDFX_FIXTURE_DIR", "/tmp/pdfx_fixtures")


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _fixture_pages(sf_dir: str) -> str:
    """Mint (once) and return the fixture pages parquet for this scale."""
    from pdf_table_extractor_ray.fixtures import FIXTURE_VERSION

    n = _FIXTURE_N.get(_sf_name(sf_dir), 240)
    path = os.path.join(_FIXTURE_ROOT, f"v{FIXTURE_VERSION}_n{n}")
    marker = os.path.join(path, "_COMPLETE")
    if not os.path.exists(marker):
        from pdf_table_extractor_ray.fixtures import write_pages_parquet

        write_pages_parquet(path, n)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def _read(sf_dir: str, table: str, columns=None, filter=None):  # noqa: A002
    import pyarrow.parquet as pq

    import ray.data

    path = f"{sf_dir}/{table}.parquet"
    # pass a metadata-free schema: the driver-written files carry pandas
    # key-value metadata whose dict makes pa.Schema unhashable, and Ray's
    # schema-dedup (unify_schemas) then logs a warning per block — at
    # cluster scale that drowns the job logs
    full = pq.read_schema(path).remove_metadata()
    if filter is not None:
        # predicate pushdown: the scanner evaluates the expression against
        # row-group statistics BEFORE decoding — at 100 TB a selective
        # filter here skips whole row groups at the storage layer. The
        # expression may reference columns outside the projection, so the
        # explicit (pruned) schema cannot be passed on this path: an
        # explicit schema must match the projected output, and Ray then
        # resolves the filter against it. Inferred schema instead.
        return ray.data.read_parquet(path, columns=columns, filter=filter)
    schema = pa.schema([full.field(c) for c in columns]) if columns else full
    return ray.data.read_parquet(path, columns=columns, schema=schema)


def _nn(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Arrow column → numpy, rejecting nulls loudly.

    Integer-cents conversions (`np.floor(x*100).astype(int64)`) turn a
    null into NaN and then INT64_MIN *silently* inside a non-null Arrow
    array, bypassing downstream Arrow-level null guards (ADVICE r3).
    Every cents site must route through this guard; callers that
    tolerate nulls must mask/fill first.
    """
    if col.null_count:
        raise ValueError(
            "null values in a numeric column routed to an integer-cents "
            "conversion; drop or fill nulls explicitly before converting"
        )
    return col.to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# flagship


def entry() -> Any:
    """Flagship: fixture corpus → detect → extract → extracted table."""
    from pdf_table_extractor_ray.pipelines.extract import build_extracted_dataset, read_pages

    pages = _fixture_pages("/root/testdata/sf0.001")
    ds = read_pages(pages, include_paths=True)
    out = build_extracted_dataset(ds)
    return out.select_columns(["url", "strategy", "extracted_text", "n_records", "n_chars", "status"])


# ---------------------------------------------------------------------------
# query implementations (each callable: sf_dir -> Dataset/Table)


def _q_doc_stats_by_source(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["source", "n_chars"])
    agg = ds.groupby("source").aggregate(Count(), Sum("n_chars"))

    def finish(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("count()"), pa.int64())
        total = pc.cast(b.column("sum(n_chars)"), pa.int64())
        # avg derived from the integer sum — deterministic across block
        # orders (a float Mean accumulates in arrival order)
        avg = pc.divide(pc.cast(total, pa.float64()), pc.cast(n, pa.float64()))
        return pa.Table.from_arrays(
            [b.column("source"), n, total, avg],
            names=["source", "n_docs", "total_chars", "avg_chars"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_doc_filter_project(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def f(b: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(b.column("lang"), "en"), pc.greater(b.column("n_chars"), 500))
        return b.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _q_exact_dedup_docs(sf_dir: str):
    from pdf_table_extractor_ray.stages.dedup import exact_dedup_ids

    return exact_dedup_ids(_read(sf_dir, "documents", ["doc_id", "text"]))


def _q_normalized_dedup_docs(sf_dir: str):
    from pdf_table_extractor_ray.stages.dedup import normalized_dedup_ids

    return normalized_dedup_ids(_read(sf_dir, "documents", ["doc_id", "text"]))


def _q_props_value_by_type(sf_dir: str):
    """Semi-structured field pull: extract the integer 'k' field from
    the flat-JSON props payload (vectorized RE2, no per-row JSON
    parse) and aggregate per event type."""
    from ray.data.aggregate import Count, Sum

    from pdf_table_extractor_ray.stages.semistructured import json_int_field_batch

    ds = _read(sf_dir, "events", ["event_type", "props"])
    extracted = ds.map_batches(
        lambda b: json_int_field_batch(b, col="props", field="k", out="k", id_cols=("event_type",)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    agg = extracted.groupby("event_type").aggregate(Count(), Sum("k"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("event_type"),
                pc.cast(b.column("count()"), pa.int64()),
                pc.cast(b.column("sum(k)"), pa.int64()),
            ],
            names=["event_type", "n", "total_k"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_pii_scrub(sf_dir: str):
    """PII-style global pattern redaction over the corpus: rewrite the
    target words to <PII>, count redactions, fingerprint the scrubbed
    text (md5) so the oracle compares content without shipping it."""
    from pdf_table_extractor_ray.stages.dedup import add_md5_batch
    from pdf_table_extractor_ray.stages.semistructured import scrub_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        s = scrub_batch(b, col="text")
        s = add_md5_batch(s, "scrubbed")
        return pa.Table.from_arrays(
            [s.column("doc_id"), s.column("n_redactions"), s.column("content_md5")],
            names=["doc_id", "n_redactions", "scrub_md5"],
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _q_kmeans_clusters(sf_dir: str):
    """Semantic k-means clustering of the embedding corpus (seeded
    sample-trained centroids, broadcast assignment): per-cluster size
    and integer mean cosine. Rows-only (iterative k-means isn't
    SQL-expressible); determinism + assignment checked in tests."""
    from pdf_table_extractor_ray.stages.similarity import kmeans_assign, kmeans_cluster_sizes

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_cluster_sizes(kmeans_assign(ds))


def _q_nn_join(sf_dir: str):
    """ANN JOIN: every label≥5 vector matched to its nearest label<5
    exemplar — IVF cells from a right-side sample, left probes nprobe
    cells, one cell-keyed shuffle, per-cell matmul, grouped top-1
    merge. Rows-only (approximate); recall@1 gate in pytest."""
    from pdf_table_extractor_ray.stages.similarity import nn_join

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def split(pred):
        def f(b: pa.Table) -> pa.Table:
            keep = pred(b.column("label"))
            return b.filter(keep).select(["vec_id", "embedding"])

        return f

    left = emb.map_batches(
        split(lambda l: pc.greater_equal(l, 5)), batch_format="pyarrow"
    )
    right = emb.map_batches(
        split(lambda l: pc.less(l, 5)), batch_format="pyarrow"
    )
    return nn_join(left, right, nprobe=8)


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): embedding near-dup removal inside
    k-means clusters — one broadcast-assign pass, one cluster-keyed
    shuffle, vectorized greedy eps-ball scan per cluster. Rows-only
    (centroid training is iterative); exact sequential parity +
    planted-pair collapse verified in pytest."""
    from pdf_table_extractor_ray.stages.similarity import semantic_dedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semantic_dedup(ds, eps=0.92)


def _q_order_price_scaled(sf_dir: str):
    """Per-group min-max feature scaling (ML preprocessing): two-pass
    broadcast of one (min, max) row per priority class, then a single
    vectorized map — no window sort, no data reshuffle."""
    from pdf_table_extractor_ray.stages.stats import grouped_minmax_normalize

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    return grouped_minmax_normalize(ds, "o_orderpriority", "o_totalprice")


def _q_urgent_bigticket(sf_dir: str):
    """Predicate pushdown at the read: the priority+price filter is a
    pyarrow dataset expression evaluated against parquet row-group
    statistics before decode — the 'prune at the read' plan (no
    map-side filter stage at all). Filter references a column outside
    the projection."""
    import pyarrow.dataset as pads

    expr = (pads.field("o_orderpriority") == "1-URGENT") & (
        pads.field("o_totalprice") > 200000.0
    )
    return _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"], filter=expr
    )


def _q_doc_table_checksum(sf_dir: str):
    """Order-invariant table checksum (replica/migration verification
    without moving data): sum of 60-bit md5 prefixes mod 2^40 —
    layout-, order- and cluster-size-invariant by mod-homomorphism."""
    from pdf_table_extractor_ray.stages.sketches import table_checksum

    return table_checksum(_read(sf_dir, "documents", ["text"]), "text")


def _q_edit_distance_pairs(sf_dir: str):
    """String-similarity verification: exact Levenshtein distance over
    a deterministic candidate pair set (id-adjacent docs within id
    buckets of the 1/16 content-hash sample) — the LSH-proposes /
    edit-distance-confirms step of fuzzy dedup. DP batched per bucket
    with the pair axis vectorized; SQL-verified against DuckDB
    levenshtein()."""
    from pdf_table_extractor_ray.stages.dedup import sample_by_content_hash
    from pdf_table_extractor_ray.stages.textstats import adjacent_edit_distances

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    sample = sample_by_content_hash(docs, keep_hex_chars=("0",))
    return adjacent_edit_distances(sample)


def _q_media_features(sf_dir: str):
    """Multimodal pipeline end-to-end: deterministic synthetic binary
    media corpus (real PPM images + PCM WAV clips — no media files
    ship with the test tables), real stdlib decode + featurize through
    the actor-pool stage, per-kind integer feature summary. Rows-only
    (binary media has no SQL analog); decode/feature correctness unit-
    tested in test_corpus_ops."""
    import ray.data

    from pdf_table_extractor_ray.stages.multimodal import (
        featurize_media,
        media_feature_stats,
        synth_media_corpus,
    )

    ds = ray.data.from_arrow(synth_media_corpus()).repartition(4)
    return media_feature_stats(featurize_media(ds, mode="real", concurrency=(1, 4)))


def _q_video_frame_features(sf_dir: str):
    """Video frame-sampling pipeline end-to-end: deterministic synthetic
    RVID clips (length-indexed P6 frames) → decode-free frame-sample
    explode (container seek, k=4 per video) → real decode + featurize of
    ONLY the sampled frames → per-video integer summary ordered by
    media_id. Rows-only (binary video has no SQL analog); container /
    sampler / parity correctness unit-tested in test_corpus_ops."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    from pdf_table_extractor_ray.stages.multimodal import (
        FEATURE_DIM,
        featurize_media,
        sample_video_frames,
        synth_video_corpus,
    )

    ds = ray.data.from_arrow(synth_video_corpus()).repartition(4)
    frames = sample_video_frames(ds, k=4, concurrency=(1, 4))
    feats = featurize_media(frames, media_col="frame", mode="real", concurrency=(1, 4))

    def to_milli(b: pa.Table) -> pa.Table:
        fl = b.column("feature")
        if isinstance(fl, pa.ChunkedArray):
            fl = fl.combine_chunks()
        flat = np.floor(
            fl.flatten().to_numpy(zero_copy_only=False).astype(np.float64) * 1000.0
        ).astype(np.int64)
        per_row = (
            flat.reshape(len(fl), FEATURE_DIM).sum(axis=1)
            if len(fl)
            else np.array([], np.int64)
        )
        return pa.Table.from_arrays(
            [b.column("media_id"), pa.array(per_row)], names=["media_id", "feat_milli"]
        )

    agg = (
        feats.map_batches(to_milli, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("media_id")
        .aggregate(Count(), Sum("feat_milli"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("media_id"),
                pc.cast(b.column("count()"), pa.int64()),
                pc.cast(b.column("sum(feat_milli)"), pa.int64()),
            ],
            names=["media_id", "n_frames", "sum_feat_milli"],
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("media_id")


def _q_image_thumbnails(sf_dir: str):
    """Image-resize pipeline end-to-end (the normalize-before-training
    step), SQL-HASH-VERIFIED: planted closed-form images — pixel
    (r, c, ch) of media ``m`` is ``(m·31 + r·7 + c·3 + ch·11) % 256``
    with dims ∈ {12, 24}, so every 12×12 output cell is a
    power-of-two block average (float mean is exact, uint8 truncation
    == integer division) — flow through the REAL decode (PPM and PNG
    alternating) → area-resample → PPM re-encode actor pool; audio
    rows surface an in-band ``resize_error`` instead of failing the
    job. The summary (ok, resized_len, thumb_sum = Σ resized pixel
    bytes) is recomputed pixel-for-pixel by the DuckDB oracle with
    generate_series."""
    import ray.data

    from pdf_table_extractor_ray.stages.multimodal import (
        encode_png,
        encode_ppm,
        encode_wav,
        resize_images,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id"])

    def render(b: pa.Table) -> pa.Table:
        ids_out, kinds, payloads = [], [], []
        for vid in b.column("vec_id").to_pylist():
            m = int(vid)
            if m % 2 == 0:
                h = 12 * (1 + (m // 2) % 2)
                w = 12 * (1 + (m // 4) % 2)
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                ch = np.arange(3)[None, None, :]
                img = ((m * 31 + r * 7 + c * 3 + ch * 11) % 256).astype(np.uint8)
                payloads.append(encode_ppm(img) if m % 4 == 0 else encode_png(img))
                kinds.append("image")
            else:
                payloads.append(encode_wav(np.zeros(64)))
                kinds.append("audio")
            ids_out.append(m)
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    resized = resize_images(
        media, out_w=12, out_h=12, codec="ppm", batch_size=32, concurrency=(1, 4)
    )

    def summarize(b: pa.Table) -> pa.Table:
        blobs = b.column("resized").to_pylist()
        sums = []
        for blob in blobs:
            if blob is None:
                sums.append(0)
            else:  # P6 header ends after "255\n"
                off = blob.index(b"255\n") + 4
                sums.append(int(np.frombuffer(blob, np.uint8, offset=off).sum()))
        blob_col = b.column("resized")
        return pa.Table.from_arrays(
            [
                b.column("media_id"),
                b.column("kind"),
                pc.cast(pc.is_valid(blob_col), pa.int64()),
                pc.cast(pc.fill_null(pc.binary_length(blob_col), 0), pa.int64()),
                pa.array(sums, pa.int64()),
            ],
            names=["media_id", "kind", "ok", "resized_len", "thumb_sum"],
        )

    return resized.map_batches(
        summarize, batch_format="pyarrow", zero_copy_batch=True
    )


def _q_encrypted_pdf_roundtrip(sf_dir: str):
    """Password-protected-PDF extraction END-TO-END, SQL-HASH-VERIFIED:
    every sampled order key renders a closed-form statement page
    (1 + k%4 lines; line j: day ``01+(k+j)%28``, desc, value cents
    ``100 + (k·7 + j·13) % 9000``) through the real PDF writer, is
    encrypted under the SPEC standard security handler (RC4 /V2 for
    even keys, AES-128 /AESV2 for odd — the conversor_c6 pikepdf
    shape), and flows the full strategy dispatch: detect →
    credential seam → Algorithm 2–6 decrypt → native word-box parse →
    coordinate-column extraction → money parse. The DuckDB oracle
    recomputes records and cent totals from the same closed form —
    a hash mismatch anywhere in writer/crypto/parser/extractor
    breaks it. Per-doc work is embarrassingly parallel; payloads
    never shuffle."""
    from pdf_table_extractor_ray.stages.pdf_crypt import encrypt_pdf
    from pdf_table_extractor_ray.stages.pdf_native import build_pdf
    from pdf_table_extractor_ray.stages.registry import extract_document

    orders = _read(sf_dir, "orders", ["o_orderkey"])

    def pick(b: pa.Table) -> pa.Table:
        kk = pc.cast(b.column("o_orderkey"), pa.int64()).to_numpy(zero_copy_only=False)
        return b.filter(pa.array(kk % 101 == 0))

    def build_and_extract(b: pa.Table) -> pa.Table:
        ks = pc.cast(b.column("o_orderkey"), pa.int64()).to_numpy(zero_copy_only=False)
        out = {"o_orderkey": [], "strategy": [], "status": [], "n_records": [], "total_cents": [], "method": []}
        for k in ks.tolist():
            n_rows = 1 + k % 4
            words = []
            for j in range(n_rows):
                top = 700.0 - 20.0 * j
                v = 100 + (k * 7 + j * 13) % 9000
                words += [
                    (30.0, top, f"{1 + (k + j) % 28:02d}"),
                    (100.0, top, "SERVICO"),
                    (150.0, top, "CONTA"),
                    (500.0, top, f"{v // 100},{v % 100:02d}"),
                ]
            method = "aesv2" if k % 2 else "rc4"
            enc = encrypt_pdf(build_pdf([words]), "pdfx-demo", method=method)
            skey, res = extract_document({"url": f"k{k}", "html": enc, "text": None})
            out["o_orderkey"].append(int(k))
            out["strategy"].append(skey)
            out["status"].append(res.status)
            out["n_records"].append(len(res.records))
            out["total_cents"].append(
                int(sum(round(r.amount * 100) for r in res.records))
            )
            out["method"].append(method)
        return pa.table(
            {
                "o_orderkey": pa.array(out["o_orderkey"], pa.int64()),
                "strategy": pa.array(out["strategy"], pa.string()),
                "status": pa.array(out["status"], pa.string()),
                "n_records": pa.array(out["n_records"], pa.int64()),
                "total_cents": pa.array(out["total_cents"], pa.int64()),
                "method": pa.array(out["method"], pa.string()),
            }
        )

    return orders.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True).map_batches(
        build_and_extract, batch_format="pyarrow", zero_copy_batch=True
    )


def _q_media_dedup_keep(sf_dir: str):
    """Perceptual image dedup END-TO-END (multimodal.image_dedup_keep
    — the media twin of near_dedup_keep_ids): the same planted corpus
    as image_dhash_dups (every base image + a brightness-shifted copy
    for ids % 5 == 0) flows pairs → star edges → distributed
    connected components → drop non-roots; every copy's component
    root is its base (min id), so the survivor set is EXACTLY the
    base ids — the SQL oracle. Payloads never shuffle; the drop set
    broadcasts (bounded by duplicate count)."""
    from pdf_table_extractor_ray.stages.multimodal import (
        encode_png,
        encode_ppm,
        image_dedup_keep,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id"])

    def render(b: pa.Table) -> pa.Table:
        ids_out, payloads = [], []
        for vid in b.column("vec_id").to_pylist():
            rng = np.random.default_rng(9000 + int(vid))
            base = rng.integers(0, 240, (18, 16, 3)).astype(np.uint8)
            enc = encode_ppm if vid % 2 == 0 else encode_png
            ids_out.append(int(vid))
            payloads.append(enc(base))
            if vid % 5 == 0:
                ids_out.append(int(vid) + 10_000_000)
                payloads.append(enc(base + 5))
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    images = ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    kept = image_dedup_keep(images, max_hamming=4)
    return kept.map_batches(
        lambda b: b.select(["media_id"]), batch_format="pyarrow", zero_copy_batch=True
    )


def _q_audio_dup_pairs(sf_dir: str):
    """Perceptual audio near-dup with a SQL oracle
    (multimodal.audio_fingerprint64 + dedup.hash64_hamming_pairs —
    the Haitsma-Kalker energy-trajectory sketch): every vec_id
    renders a seeded gaussian-noise WAV clip (int16, clipped at
    ±15000 — noise rather than sines: smooth periodic envelopes give
    CORRELATED up/down frame patterns that collide in Hamming space,
    measured 62 false pairs at this corpus size); ids
    divisible by 4 also plant a 2× louder copy (id + 10⁷; ×2 of
    int16 ≤ 30000 never clips and /32768 is exact, so energies scale
    by exactly 4 and every frame compare survives) — each copy pairs
    with its base at hamming 0, and the oracle is exactly the planted
    mapping (no false positives at these fixed seeds, verified at
    both sf scales). Clips never shuffle — only (id, hash) rows."""
    import ray.data

    from pdf_table_extractor_ray.stages.multimodal import (
        audio_fingerprint_dups,
        encode_wav,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id"])

    def render(b: pa.Table) -> pa.Table:
        ids_out, payloads = [], []
        for vid in b.column("vec_id").to_pylist():
            rng = np.random.default_rng(7000 + int(vid))
            x = rng.normal(0.0, 3000.0, 2048)
            base = np.clip(x, -15000, 15000).astype(np.int16)
            ids_out.append(int(vid))
            payloads.append(encode_wav(base))
            if vid % 4 == 0:
                ids_out.append(int(vid) + 10_000_000)
                payloads.append(encode_wav((base.astype(np.int32) * 2).astype(np.int16)))
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    clips = ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    return audio_fingerprint_dups(clips, max_hamming=4, concurrency=(1, 4))


def _q_order_price_quantiles_kll(sf_dir: str):
    """ONE-PASS KLL rank-quantile sketch (stages/kll.py — Karnin-Lang-
    Liberty 2016) over o_totalprice: the complement of the existing
    two-pass histogram sketch (no min/max pre-scan, rank-space ±ε·n
    error immune to heavy tails). Per-batch sketches → 64-bucket
    re-compaction merge → ≤64 KB-scale sketches to the driver; the
    value column never shuffles. Rows-only; the ε bound and merge
    parity are pinned in pytest across uniform/Pareto/sorted inputs."""
    from pdf_table_extractor_ray.stages.kll import kll_quantiles

    ds = _read(sf_dir, "orders", ["o_totalprice"])
    return kll_quantiles(ds, "o_totalprice", qs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99))


def _q_label_budget_neyman(sf_dir: str):
    """Variance-optimal (Neyman) labeling-budget allocation across
    order-priority strata (stages/mixing.py:neyman_allocation): with
    values in integer cents, N_h·σ_h = isqrt(N_h·Σx² − (Σx)²) — the
    square root of an EXACT integer — so weights, Hamilton
    apportionment, and Σalloc == budget are all bit-exact Python-int
    math; the DuckDB oracle emulates isqrt with a float sqrt plus a
    monotone ±2 candidate correction on HUGEINTs. One slim
    integer-stats groupby (decimal128 carries Σx² exactly); the
    bounded stratum table drives the driver-side closed form."""
    from pdf_table_extractor_ray.stages.mixing import (
        neyman_allocation,
        value_stats_by,
    )

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    stats = value_stats_by(ds, "o_orderpriority", "o_totalprice")
    return neyman_allocation(stats, 10_000)


def _q_value_quantiles_by_type_kll(sf_dir: str):
    """PER-KEY one-pass KLL quantiles (stages/kll.py:kll_quantiles_by)
    over event values by type — each key carries its own adaptive
    support (the global-bin histogram sketch collapses when key ranges
    diverge; pinned in pytest with a 10⁹-scale separation test). One
    slim (key, sketch-item) shuffle; quantiles answered inside the
    key's group, nothing to the driver. Rows-only; ε bound in pytest."""
    from pdf_table_extractor_ray.stages.kll import kll_quantiles_by

    ds = _read(sf_dir, "events", ["event_type", "value"])
    return kll_quantiles_by(ds, "event_type", "value", qs=(0.25, 0.5, 0.9))


def _q_unigram_pieces(sf_dir: str):
    """Unigram-LM tokenizer TRAINING (stages/unigram_lm.py — Kudo
    2018, the SentencePiece algorithm; the probabilistic sibling of
    the greedy BPE trainer in bpe_merges): EM over the distributed
    (word, count) table with the bounded piece vocabulary broadcast
    per round, coverage-guaranteed single chars, gradual pruning to
    the target size. Returns the (piece, logp) model table. Rows-only
    (float probabilities fold in block order); single-process EM
    parity is pinned in pytest at rel 1e-9."""
    from pdf_table_extractor_ray.stages.unigram_lm import train_unigram

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return train_unigram(ds, vocab_size=96, n_rounds=3, seed_k=512)


def _q_unigram_doc_tokens(sf_dir: str):
    """Viterbi tokenization under the trained unigram model: train on
    the corpus (bounded vocab), broadcast once, per-batch memo over
    distinct words keeps the DP off repeated tokens. (doc_id,
    n_pieces); rows-only with determinism anchored by the pytest
    parity suite."""
    from pdf_table_extractor_ray.stages.unigram_lm import (
        train_unigram,
        unigram_token_counts,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    vocab = train_unigram(ds, vocab_size=96, n_rounds=3, seed_k=512)
    return unigram_token_counts(ds, vocab)


def _q_corpus_data_card(sf_dir: str):
    """Corpus DATA CARD — the datasheet summary every corpus release
    ships (docs, language/source diversity, size distribution, exact
    dup mass) as one (metric, value) table, every number EXACT and
    SQL-verified: counts via streaming aggregates, p50/p95 via the
    slim (value, count) exact-quantile shuffle (distinct lengths
    only — no raw-value sort), distinct-text count via the md5
    groupby the dedup family already uses. Each metric is a scalar to
    the driver; the corpus streams, nothing materializes."""
    from ray.data.aggregate import Count

    from pdf_table_extractor_ray.stages.dedup import exact_dedup_ids
    from pdf_table_extractor_ray.stages.sketches import exact_quantile_disc

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source", "n_chars"])
    n_docs = ds.count()
    n_langs = ds.groupby("lang").aggregate(Count()).count()
    n_sources = ds.groupby("source").aggregate(Count()).count()
    total_chars = ds.sum("n_chars")
    p50 = exact_quantile_disc(ds, "n_chars", 0.5)
    p95 = exact_quantile_disc(ds, "n_chars", 0.95)
    n_distinct = exact_dedup_ids(ds).count()
    metrics = {
        "n_docs": float(n_docs),
        "n_langs": float(n_langs),
        "n_sources": float(n_sources),
        "total_chars": float(total_chars),
        "p50_chars": float(p50),
        "p95_chars": float(p95),
        "n_distinct_texts": float(n_distinct),
    }
    names = sorted(metrics)
    return pa.table(
        {
            "metric": pa.array(names, pa.string()),
            "value": pa.array([metrics[n] for n in names], pa.float64()),
        }
    )


def _q_corpus_prep_v6(sf_dir: str):
    """Round-4 composite with the ingest-hardening front (pipelines/
    corpus_prep.py:prepare_corpus_v6): every third page is BROKEN by
    the latin-1/utf-8 mis-decode and a slice of pages gains blocklist
    terms; v6 repairs the encodings (restoring dedup hash equality),
    drops the flagged pages map-side, then runs the v5 pipeline
    (template strip → NB gate → quality gates → dedup). One summary
    row; the repair-restores-dedup interaction is pinned in pytest."""
    from pdf_table_extractor_ray.pipelines.corpus_prep import (
        corpus_v2_totals,
        prepare_corpus_v6,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "source", "lang", "text"])

    def distort(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out = []
        for i, t in zip(ids, texts):
            t = t or ""
            if i % 7 == 0:
                t = f"{t} casino jackpot casino jackpot casino jackpot casino"
            t = t + " résumé"
            if i % 3 == 0:
                t = t.encode("utf-8").decode("latin-1")
            out.append(t)
        return b.drop_columns(["text"]).append_column(
            "text", pa.array(out, pa.string())
        )

    distorted = docs.map_batches(distort, batch_format="pyarrow", zero_copy_batch=True)
    return corpus_v2_totals(
        prepare_corpus_v6(
            distorted,
            blocklist_categories={"gambling": ["casino", "jackpot"]},
            blocklist_max_hits=3,
        )
    )


def _q_crawl_markdown_export(sf_dir: str):
    """FULL-CHAIN structured-export composite, bit-exact through THREE
    container layers: synthetic HTML pages → WARC shards (gzip
    members, the Common-Crawl layout) → framed parse back →
    DomMarkdown actor conversion → JSONL export shards → explicit-
    schema read-back — and the final markdown still matches the SAME
    chr(10)-concatenated SQL oracle as the direct conversion
    (html_markdown_roundtrip). Archive, convert, and export stages are
    all map-only; zero shuffle anywhere."""
    import tempfile

    from pdf_table_extractor_ray.pipelines.crawl import pages_to_warc
    from pdf_table_extractor_ray.sources.jsonl import read_jsonl, write_jsonl_shards
    from pdf_table_extractor_ray.sources.warc import parse_warc_batches
    from pdf_table_extractor_ray.stages.markdown import html_to_markdown

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_orderpriority"])

    def render(b: pa.Table) -> pa.Table:
        keys = b.column("o_orderkey").to_pylist()
        stats = b.column("o_orderstatus").to_pylist()
        prios = b.column("o_orderpriority").to_pylist()
        payloads = [
            (
                "<html><head><script>var nav_noise;</script></head><body>\n"
                f"  <h1>\n    Order {k}\n  </h1>\n"
                f"  <p>Status: <strong> {s} </strong>.</p>\n"
                f"  <ul><li>priority <em>{p}</em></li><li>id {k}</li></ul>\n"
                "  <blockquote><p>verified</p></blockquote>\n"
                f'  <p><a href="https://orders.test/{k}">details  page</a></p>\n'
                "  <hr>\n"
                f"  <pre>raw {k}</pre>\n"
                "</body></html>"
            ).encode("utf-8")
            for k, s, p in zip(keys, stats, prios)
        ]
        return pa.table(
            {
                "url": pa.array([str(k) for k in keys], pa.string()),
                "html": pa.array(payloads, pa.binary()),
                "text": pa.array([""] * len(keys), pa.string()),
            }
        )

    pages = ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    warc = pages_to_warc(pages, gzip_members=True)
    parsed = parse_warc_batches(warc)
    md = html_to_markdown(parsed)
    out_dir = tempfile.mkdtemp(prefix="md_export_", dir="/tmp")
    write_jsonl_shards(md, out_dir, columns=["url", "markdown"], compress=True)
    back = read_jsonl(
        out_dir, pa.schema([("url", pa.string()), ("markdown", pa.string())])
    )

    def finish(b: pa.Table) -> pa.Table:
        keys = pa.array([int(u) for u in b.column("url").to_pylist()], pa.int64())
        return pa.Table.from_arrays(
            [keys, b.column("markdown")], names=["o_orderkey", "markdown"]
        )

    return back.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_incremental_crawl_dedup(sf_dir: str):
    """Incremental dedup against a PERSISTED fingerprint index
    (pipelines/incremental.py:dedup_against_index — the rolling-crawl
    shape: today's fetch dedups against every previous run without
    re-reading old payloads): run 1 = the even-id half of documents,
    indexed; run 2 = the full corpus re-crawled. Survivors of run 2
    are exactly the docs whose content hash is new to the index, min
    id per hash within the run — the SQL oracle (DuckDB md5 == the
    engine's hash). The index joins hash-partitioned (left anti),
    never broadcast, never on the driver."""
    import tempfile

    from pdf_table_extractor_ray.pipelines.incremental import (
        dedup_against_index,
        dedup_index_append,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    index_dir = tempfile.mkdtemp(prefix="fp_index_", dir="/tmp")

    def evens(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(pc.bit_wise_and(b.column("doc_id"), pa.scalar(1)), pa.scalar(0))
        )

    day1 = ds.map_batches(evens, batch_format="pyarrow", zero_copy_batch=True)
    dedup_index_append(day1, index_dir)
    survivors = dedup_against_index(ds, index_dir)
    return survivors.map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow", zero_copy_batch=True
    )


def _q_jsonl_roundtrip(sf_dir: str):
    """JSONL source/sink round-trip with a SQL oracle
    (sources/jsonl.py — the interchange format corpus releases ship):
    orders project → gzip JSONL shards (one per batch, atomic
    publish, repr-shortest floats, ISO timestamps) → read back with
    an EXPLICIT schema (one C++ parse per shard — no type inference
    drift, no Python per line) → bit-identical to the plain parquet
    projection including float64 totalprice and the timestamp column."""
    import tempfile

    from pdf_table_extractor_ray.sources.jsonl import read_jsonl, write_jsonl_shards

    ds = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    )
    out_dir = tempfile.mkdtemp(prefix="jsonl_rt_", dir="/tmp")
    write_jsonl_shards(ds, out_dir, compress=True)
    schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_orderstatus", pa.string()),
            ("o_totalprice", pa.float64()),
            ("o_orderdate", pa.timestamp("us")),
        ]
    )
    return read_jsonl(out_dir, schema)


def _q_video_dup_pairs(sf_dir: str):
    """Perceptual video near-dup with a SQL oracle
    (multimodal.video_fingerprint64 — temporal-luma trajectory hash,
    third member of the image/audio/video perceptual family): every
    vec_id renders a 12-frame seeded-noise RVID clip (pixels < 240);
    ids divisible by 6 also plant a +5-brightness copy (id + 10⁷ —
    constant shifts cancel in every frame-luma compare, hamming 0).
    Oracle = exactly the planted mapping; random clips' luma
    trajectories are coin-flip bit patterns (verified collision-free
    at both sf scales with these fixed seeds). Payloads never shuffle."""
    import ray.data

    from pdf_table_extractor_ray.stages.multimodal import (
        encode_rvid,
        video_fingerprint_dups,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id"])

    def render(b: pa.Table) -> pa.Table:
        ids_out, payloads = [], []
        for vid in b.column("vec_id").to_pylist():
            rng = np.random.default_rng(11000 + int(vid))
            frames = [
                rng.integers(0, 240, (12, 12, 3)).astype(np.uint8) for _ in range(12)
            ]
            ids_out.append(int(vid))
            payloads.append(encode_rvid(frames))
            if vid % 6 == 0:
                ids_out.append(int(vid) + 10_000_000)
                payloads.append(encode_rvid([f + 5 for f in frames]))
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    clips = ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    return video_fingerprint_dups(clips, max_hamming=4, concurrency=(1, 4))


def _q_mojibake_repair(sf_dir: str):
    """Mojibake repair (functions/charset.py:repair_mojibake — the
    ftfy-style latin-1/utf-8 double-decode undo every crawled corpus
    needs) with a byte-exact SQL oracle: every document gains an
    accented suffix; every third document is then BROKEN by the
    classic mis-decode (utf-8 bytes read as latin-1 — 'café' →
    'cafÃ©'); the repair must return the clean text for ALL rows and
    flag exactly the broken third. Map-only: one RE2 scan per batch,
    Python only on flagged rows."""
    from pdf_table_extractor_ray.functions.charset import repair_mojibake

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    suffix = " café naïve — ação"

    def plant(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out = []
        for i, t in zip(ids, texts):
            clean = (t or "") + suffix
            out.append(
                clean.encode("utf-8").decode("latin-1") if i % 3 == 0 else clean
            )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "text": pa.array(out, pa.string()),
            }
        )

    planted = ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
    return repair_mojibake(planted)


def _q_blocklist_admission(sf_dir: str):
    """Blocklist admission gate (stages/blocklists.py — the UT1-style
    word-list filter of CCNet/RefinedWeb/FineWeb) with a SQL oracle:
    two categories over the documents corpus ("latency" carries a
    multi-word phrase to prove phrase matching; "vendor" a single
    term), non-overlapping case-folded whole-word counts, admitted ⇔
    every category ≤ 3 hits. Map-only — one utf8_lower + one RE2
    count kernel per category per batch; DuckDB's regexp_extract_all
    runs the IDENTICAL RE2 pattern string."""
    from pdf_table_extractor_ray.stages.blocklists import blocklist_hits

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return blocklist_hits(
        ds,
        {"latency": ["slow", "fast scan"], "vendor": ["spark"]},
        max_hits=3,
    )


def _q_image_dhash_dups(sf_dir: str):
    """Perceptual image near-dup with a SQL oracle
    (multimodal.dhash64 + dedup.hash64_hamming_pairs): every vec_id
    renders a seeded-random 18×16 image (pixels in [60, 200), codec
    cycling PPM / PNG / baseline JPEG by vid % 3); ids divisible by 5
    also plant a brightness-shifted copy (+5 every channel, id + 10⁷).
    dHash is provably invariant to the uniform shift (constant offsets
    cancel in every adjacent-cell compare) — and the shift survives
    the LOSSY codec bit-exactly too: +5 RGB adds exactly +5 to luma
    and nothing to chroma, so only the luma DC coefficient moves, by
    5·8 / qdc = 20 whole quantization units at q95 (qdc = 2), leaving
    every rounding decision identical; with pixels in [60, 200) no
    decoded value clips, so decode(copy) == decode(base) + 5 exactly
    and each planted copy pairs with its base at hamming 0 — the
    oracle is exactly the planted mapping. Random unrelated bases sit
    near hamming ~32; the banded join never surfaces them (verified
    empirically at sf 0.001/0.01/0.1 with these fixed seeds).
    Payloads never shuffle — only (id, hash) rows enter the banding."""
    import ray.data

    from pdf_table_extractor_ray.stages.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from pdf_table_extractor_ray.stages.multimodal import (
        encode_png,
        encode_ppm,
        image_dhash_pairs,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id"])

    def render(b: pa.Table) -> pa.Table:
        ids_out, payloads = [], []
        for vid in b.column("vec_id").to_pylist():
            rng = np.random.default_rng(9000 + int(vid))
            base = rng.integers(60, 200, (18, 16, 3)).astype(np.uint8)
            m = vid % 3
            if m == 0:
                enc = encode_ppm
            elif m == 1:
                enc = encode_png
            elif (vid // 3) % 2:  # sequential and progressive JPEG wire
                enc = lambda im: encode_jpeg_progressive(im, quality=95)
            else:
                enc = lambda im: encode_jpeg(im, quality=95, subsampling="4:4:4")
            ids_out.append(int(vid))
            payloads.append(enc(base))
            if vid % 5 == 0:
                ids_out.append(int(vid) + 10_000_000)
                payloads.append(enc(base + 5))
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    images = ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    return image_dhash_pairs(images, max_hamming=4, concurrency=(1, 4))


def _q_late_events(sf_dir: str):
    """Watermark/late-data tagging (streaming semantics over the batch
    replay): per user, arrival order = event_id; an event is late when
    its event-time trails the user's running-max event-time by >30
    minutes. Arrival order is a deterministic shuffle of event_id
    (Knuth multiplicative hash — the synthetic table's event_ids are
    time-ordered, which would make lateness degenerate) with event_id
    tie-break. Bucket-sharded, fully vectorized (composite-key
    cummax)."""
    from pdf_table_extractor_ray.stages.sessions import tag_late_events

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_arrival(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        # mask to 16 bits BEFORE the multiply so the product never
        # exceeds int64 (numpy would wrap silently where DuckDB's
        # overflow-checked BIGINT multiply raises); event_id breaks ties
        arr = ((eid % 65536) * 2654435761) % 4294967296
        return b.append_column("arrival", pa.array(arr, pa.int64()))

    ds = ds.map_batches(add_arrival, batch_format="pyarrow", zero_copy_batch=True)
    return tag_late_events(ds, arrival_col="arrival")


def _q_doc_length_pct_rank(sf_dir: str):
    """Global window function WITHOUT a global sort: percent_rank of
    every doc's length via a slim (value, count) groupby + broadcast
    cumulative lookup. The sort-free plan for global rank statistics
    on bounded-cardinality columns."""
    from pdf_table_extractor_ray.stages.stats import global_percent_rank

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return global_percent_rank(ds, "n_chars")


def _q_value_comoments_by_type(sf_dir: str):
    """Grouped co-moment statistics (the distributed corr/cov building
    block): per event type, integer-exact n/Σx/Σy/Σxy/Σx²/Σy² of
    (value-cents, props.k) — per-batch vectorized pre-reduce, one slim
    groupby of 7 counters per key. Float corr derives at the edge."""
    from pdf_table_extractor_ray.stages.semistructured import json_int_field_batch
    from pdf_table_extractor_ray.stages.stats import grouped_comoments

    ds = _read(sf_dir, "events", ["event_type", "value", "props"])

    def prep(b: pa.Table) -> pa.Table:
        x = np.floor(_nn(b.column("value")) * 100).astype(np.int64)
        y = json_int_field_batch(b, col="props", field="k", out="y", id_cols=()).column("y")
        return pa.Table.from_arrays(
            [b.column("event_type"), pa.array(x), y], names=["event_type", "x", "y"]
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_comoments(prepped, "event_type", "x", "y")


def _q_pagerank_dups(sf_dir: str):
    """Centrality over the MinHash near-dup graph: distributed integer
    PageRank (10 rounds, groupby-only iteration — no driver-side graph,
    no per-round driver traffic). The canonical-representative-picking
    step of a near-dup pipeline. Rows-only (iterative; not
    SQL-expressible); float-PageRank parity + layout invariance
    tested in test_graph."""
    from pdf_table_extractor_ray.stages.dedup import minhash_lsh_pairs
    from pdf_table_extractor_ray.stages.graph import pagerank

    pairs = minhash_lsh_pairs(_read(sf_dir, "documents", ["doc_id", "text"]))
    return pagerank(pairs, "doc_a", "doc_b")


def _q_lpa_communities(sf_dir: str):
    """Community detection over the MinHash near-dup graph:
    synchronous label propagation (5 rounds, groupby-only iteration,
    packed-int64 argmax tie-break — bit-identical across layouts).
    Splits chained near-dup components into dense cores where CC
    alone over-merges. Rows-only (iterative); sequential-reference
    parity + layout invariance tested in test_graph."""
    from pdf_table_extractor_ray.stages.dedup import minhash_lsh_pairs
    from pdf_table_extractor_ray.stages.graph import label_propagation

    pairs = minhash_lsh_pairs(_read(sf_dir, "documents", ["doc_id", "text"]))
    return label_propagation(pairs, "doc_a", "doc_b")


def _q_dup_kcore_nodes(sf_dir: str):
    """Dense-cluster extraction: the 2-core of the MinHash near-dup
    graph — keeps duplicate groups that close a cycle, sheds the
    pendant LSH false-positive fringe (the synthetic corpus's dup
    graph is sparse: its 3-core is empty, so k=2 is the interesting
    core here). Join-free distributed peeling (stages/graph.py
    k_core). Rows-only (iterative); sequential parity + layout
    invariance tested in test_graph."""
    from pdf_table_extractor_ray.stages.dedup import minhash_lsh_pairs
    from pdf_table_extractor_ray.stages.graph import k_core

    pairs = minhash_lsh_pairs(_read(sf_dir, "documents", ["doc_id", "text"]))
    return k_core(pairs, k=2)


def _q_weighted_doc_sample(sf_dir: str):
    """Deterministic weighted sample (Efraimidis-Spirakis, hash
    uniforms): 100 docs drawn with probability ∝ n_chars. Rows-only
    (the draw is hash-seeded, not SQL-expressible); brute-force parity
    and layout invariance tested in test_semistructured."""
    from pdf_table_extractor_ray.stages.dedup import weighted_sample_topk

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return weighted_sample_topk(ds, "doc_id", "n_chars", k=100)


def _q_long_docs_p95(sf_dir: str):
    """Outlier filter: docs above the EXACT global p95 length.
    Threshold found via a slim (value, count) shuffle (distinct
    lengths only), then a streaming filter — no sort, no raw-value
    shuffle."""
    from pdf_table_extractor_ray.stages.sketches import filter_above_quantile

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return filter_above_quantile(ds, "n_chars", 0.95)


def _q_token_counts(sf_dir: str):
    from pdf_table_extractor_ray.stages.textstats import token_count_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(token_count_batch, batch_format="pyarrow", zero_copy_batch=True)


def _q_token_counts_bpe(sf_dir: str):
    from pdf_table_extractor_ray.stages.textstats import bpe_token_count_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(bpe_token_count_batch, batch_format="pyarrow", zero_copy_batch=True)


def _q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-flavored summary with integer-cents partial aggregation
    (pre-reduce in map_batches; deterministic across block orders)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        """Combiner: per-batch group sums → only (groups × batches) rows
        reach the shuffle, not 600k raw rows."""
        qty = np.floor(_nn(b.column("l_quantity")) * 100).astype(np.int64)
        ext = _nn(b.column("l_extendedprice"))
        price = np.floor(ext * 100).astype(np.int64)
        disc = _nn(b.column("l_discount"))
        disc_price = np.floor(ext * (1 - disc) * 100).astype(np.int64)
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "qty_c": qty,
                "price_c": price,
                "disc_price_c": disc_price,
            }
        )
        return pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"), ("disc_price_c", "sum"), ([], "count_all")]
        ).rename_columns(
            ["l_returnflag", "l_linestatus", "qty_c", "price_c", "disc_price_c", "n"]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("qty_c"), Sum("price_c"), Sum("disc_price_c"), Sum("n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("l_returnflag"),
                b.column("l_linestatus"),
                pc.divide(pc.cast(b.column("sum(qty_c)"), pa.float64()), 100.0),
                pc.divide(pc.cast(b.column("sum(price_c)"), pa.float64()), 100.0),
                pc.divide(pc.cast(b.column("sum(disc_price_c)"), pa.float64()), 100.0),
                pc.cast(b.column("sum(n)"), pa.int64()),
            ],
            names=[
                "l_returnflag",
                "l_linestatus",
                "sum_qty",
                "sum_base_price",
                "sum_disc_price",
                "count_order",
            ],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_orders_top10(sf_dir: str):
    """Top 10 orders by price — partial top-k per batch + one small
    merge (stages/topk.py), NOT sort().limit(): the sorted plan
    range-shuffles every block to keep 10 rows."""
    from pdf_table_extractor_ray.stages.topk import global_top_k

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return global_top_k(
        ds, [("o_totalprice", "descending"), ("o_orderkey", "ascending")], 10
    )


def _q_events_by_type(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min, Sum

    ds = _read(sf_dir, "events", ["event_type", "value", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        v = _nn(b.column("value"))
        ts = pc.cast(b.column("ts"), pa.int64())
        return pa.Table.from_arrays(
            [b.column("event_type"), pa.array(np.floor(v * 100).astype(np.int64)), ts],
            names=["event_type", "value_c", "ts_us"],
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Count(), Sum("value_c"), Min("ts_us"), Max("ts_us"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("event_type"),
                pc.cast(b.column("count()"), pa.int64()),
                pc.divide(pc.cast(b.column("sum(value_c)"), pa.float64()), 100.0),
                b.column("min(ts_us)"),
                b.column("max(ts_us)"),
            ],
            names=["event_type", "n_events", "total_value", "first_ts_us", "last_ts_us"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_money_roundtrip(sf_dir: str):
    """F1 exercise with a SQL oracle: price → BR money string →
    clean_monetary_value → float (== floor-cents / 100)."""
    from pdf_table_extractor_ray.functions.money import br_format, clean_monetary_values_arrow

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])

    def f(b: pa.Table) -> pa.Table:
        price = _nn(b.column("l_extendedprice"))
        cents = np.floor(price * 100).astype(np.int64)
        strings = pa.array([br_format(c / 100.0) for c in cents], pa.string())
        amounts = clean_monetary_values_arrow(strings)  # vectorized F1
        return pa.Table.from_arrays(
            [b.column("l_orderkey"), b.column("l_linenumber"), amounts],
            names=["l_orderkey", "l_linenumber", "amount"],
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _q_date_roundtrip(sf_dir: str):
    """F5/F6 exercise with a SQL oracle: timestamp → DD/MM/YYYY string →
    detect + strptime → ISO day string."""
    from pdf_table_extractor_ray.functions.dates import identify_date_pattern, parse_date

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_shipdate"])

    def f(b: pa.Table) -> pa.Table:
        import datetime as _dt

        ts = b.column("l_shipdate").to_pylist()
        out = []
        for t in ts:
            s = t.strftime("%d/%m/%Y")
            pattern = identify_date_pattern(s)
            out.append(parse_date(s, pattern).strftime("%Y-%m-%d"))
        return pa.Table.from_arrays(
            [b.column("l_orderkey"), b.column("l_linenumber"), pa.array(out, pa.string())],
            names=["l_orderkey", "l_linenumber", "ship_day"],
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _q_html_table_roundtrip(sf_dir: str):
    """S3/P8/P10 recast for HTML markup (stages/html_tables.py): part
    rows → quirky ``<table>`` pages (tag-case, attribute noise, inline
    markup, entities, ``<br>``) → grid reconstruct + header promotion
    → records, byte-identical round-trip with a SQL oracle."""
    from pdf_table_extractor_ray.stages.html_tables import (
        records_from_html_tables,
        render_pages_from_batch,
    )

    headers = ["partkey", "name", "brand", "type", "size", "note"]
    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_type", "p_size"])

    def render(b: pa.Table) -> pa.Table:
        pk = b.column("p_partkey")
        note = pa.array([f"a&b<{k}>" for k in pk.to_pylist()], pa.string())
        recs = pa.Table.from_arrays(
            [pk, b.column("p_name"), b.column("p_brand"), b.column("p_type"),
             b.column("p_size"), note],
            names=headers,
        )
        return render_pages_from_batch(recs, headers, key_col="partkey")

    pages = ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    recs = records_from_html_tables(pages, headers)

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pc.cast(b.column("partkey"), pa.int64()),
                b.column("name"),
                b.column("brand"),
                b.column("type"),
                pc.cast(b.column("size"), pa.int64()),
                b.column("note"),
            ],
            names=headers,
        )

    return recs.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_union_sources(sf_dir: str):
    from ray.data.aggregate import Count

    a = _read(sf_dir, "documents", ["source", "lang"])
    b = _read(sf_dir, "documents", ["source", "lang"])

    def keep(src):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("source"), src))

        return f

    u = a.map_batches(keep("src1"), batch_format="pyarrow").union(
        b.map_batches(keep("src2"), batch_format="pyarrow")
    )
    agg = u.groupby("lang").aggregate(Count())
    return agg.map_batches(
        lambda t: pa.Table.from_arrays(
            [t.column("lang"), pc.cast(t.column("count()"), pa.int64())], names=["lang", "n_docs"]
        ),
        batch_format="pyarrow",
    )


def _q_distinct_users(sf_dir: str):
    ds = _read(sf_dir, "events", ["user_id"])
    return ds.groupby("user_id").count().select_columns(["user_id"])


def _q_langid(sf_dir: str):
    from pdf_table_extractor_ray.stages.textstats import langid_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(langid_batch, batch_format="pyarrow", zero_copy_batch=True)


def _q_quality(sf_dir: str):
    from pdf_table_extractor_ray.stages.textstats import quality_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(quality_batch, batch_format="pyarrow", zero_copy_batch=True)


def _q_fingerprints(sf_dir: str):
    """SQL-verifiable fingerprint columns (md5 == DuckDB md5)."""
    from pdf_table_extractor_ray.stages.textstats import fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)
    return out.select_columns(["doc_id", "content_md5"])


def _q_fingerprints_sketch(sf_dir: str):
    """Non-SQL-expressible fingerprints (crc32 / simhash64 — DuckDB has
    no crc32): rows-only check, unit-tested in test_kernels."""
    from pdf_table_extractor_ray.stages.textstats import fingerprint_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True)
    return out.select_columns(["doc_id", "crc32", "simhash64"])


def _q_winnow_fingerprints(sf_dir: str):
    """Winnowing document fingerprints (Schleimer et al. 2003): per-doc
    selected-hash count + min/max hash — rows-only (rolling-hash
    selection is not SQL-expressible); the selection itself is
    unit-tested for the shared-substring property."""
    from pdf_table_extractor_ray.stages.textstats import winnow_fingerprints

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts, lo, hi = [], [], []
        for t in texts:
            fps = winnow_fingerprints(t or "")
            counts.append(len(fps))
            lo.append(min(fps) if fps else None)
            hi.append(max(fps) if fps else None)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                pa.array(counts, pa.int64()),
                pa.array(lo, pa.uint64()),
                pa.array(hi, pa.uint64()),
            ],
            names=["doc_id", "n_fingerprints", "min_fp", "max_fp"],
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _q_minhash_pairs(sf_dir: str):
    from pdf_table_extractor_ray.stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_read(sf_dir, "documents", ["doc_id", "text"]))


def _q_simhash_pairs(sf_dir: str):
    from pdf_table_extractor_ray.stages.dedup import simhash_pairs

    return simhash_pairs(_read(sf_dir, "documents", ["doc_id", "text"]))


def _query_vectors(sf_dir: str, n: int = 3):
    """The ``n`` smallest vec_ids + their embeddings WITHOUT a global
    sort shuffle: a pruned id-only scan pre-reduces to ≤n ids per
    batch, the driver merges the tiny partials, and one pushed-down
    ``is_in`` filter fetches exactly those rows."""
    ids_only = _read(sf_dir, "embeddings", ["vec_id"])

    def partial_min(b: pa.Table) -> pa.Table:
        ids = np.sort(b.column("vec_id").to_numpy(zero_copy_only=False))[:n]
        return pa.Table.from_arrays([pa.array(ids.astype(np.int64))], names=["vec_id"])

    cand = ids_only.map_batches(partial_min, batch_format="pyarrow", zero_copy_batch=True)
    want = sorted(r["vec_id"] for r in cand.take_all())[:n]
    want_arr = pa.array(want, pa.int64())

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def pick(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("vec_id"), value_set=want_arr))

    qrows = sorted(
        ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True).take_all(),
        key=lambda r: r["vec_id"],
    )
    q = np.array([r["embedding"] for r in qrows], np.float64)
    qids = np.array([r["vec_id"] for r in qrows])
    return ds, q, qids


def _q_knn_top5(sf_dir: str):
    from pdf_table_extractor_ray.stages.similarity import knn_bruteforce

    ds, q, qids = _query_vectors(sf_dir)
    out = knn_bruteforce(ds, q, qids, k=5)
    return out.select_columns(["query_id", "rank", "vec_id"])


def _q_knn_lsh(sf_dir: str):
    from pdf_table_extractor_ray.stages.similarity import knn_lsh

    ds, q, qids = _query_vectors(sf_dir)
    return knn_lsh(ds, q, qids, k=5).select_columns(["query_id", "rank", "vec_id"])


def _q_embedding_dups(sf_dir: str):
    """Embedding near-dup pairs. The driver corpus has no natural pairs
    above 0.95 cosine at any sf, so the query plants a deterministic
    near-duplicate of each of the first 8 vectors (seeded perturbation,
    cosine ≈ 0.9999, new ids +10_000_000) — the operator must recover
    the planted pairs end-to-end through bucketing + verify."""
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import embedding_dup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    seeds = ds.limit(8).take_all()
    rng = np.random.RandomState(42)
    planted = []
    for r in seeds:
        v = np.asarray(r["embedding"], np.float64)
        v = v / np.linalg.norm(v)
        v2 = v + 0.002 * rng.standard_normal(v.shape)
        planted.append({"vec_id": int(r["vec_id"]) + 10_000_000, "embedding": v2.tolist()})
    full = ds.union(ray.data.from_items(planted))
    return embedding_dup_pairs(full, threshold=0.95)


def _q_top_revenue_orders(sf_dir: str):
    """TPC-H Q3 flavor: lineitem ⋉ (filtered orders) → per-order
    revenue (integer cents) → top 10.

    The orders side is ~the WHOLE orders table after the date filter
    (TPC-H dates end 1998-08), so it is NOT "small by contract" — a
    broadcast would ship O(|orders|) keys to the driver and into every
    probe task (VERDICT r3 #4). Fact-sized restrict ⇒ hash-shuffle
    LEFT SEMI join, co-partitioned on the order key. Top-10 via the
    partial-top-k merge, not a global sort."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join
    from pdf_table_extractor_ray.stages.topk import global_top_k

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def pre1998(b: pa.Table) -> pa.Table:
        cutoff = pa.scalar(np.datetime64("1998-01-01", "us"))
        return b.filter(pc.less(b.column("o_orderdate"), cutoff)).select(["o_orderkey"])

    keep = orders.map_batches(pre1998, batch_format="pyarrow", zero_copy_batch=True)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    joined = hash_shuffle_join(li, keep, on="l_orderkey", right_on="o_orderkey", how="left_semi")

    def partial(b: pa.Table) -> pa.Table:
        price = _nn(b.column("l_extendedprice"))
        disc = _nn(b.column("l_discount"))
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        t = pa.table({"l_orderkey": b.column("l_orderkey"), "cents": cents})
        return (
            pa.TableGroupBy(t, ["l_orderkey"])
            .aggregate([("cents", "sum")])
            .rename_columns(["l_orderkey", "cents"])
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("cents"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("l_orderkey"),
                pc.divide(pc.cast(b.column("sum(cents)"), pa.float64()), 100.0),
            ],
            names=["l_orderkey", "revenue"],
        )

    out = agg.map_batches(finish, batch_format="pyarrow")
    return global_top_k(out, [("revenue", "descending"), ("l_orderkey", "ascending")], 10)


def _q_revenue_by_region(sf_dir: str):
    """TPC-H Q5 flavor: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region
    (all dimension sides broadcast) → revenue per region."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import broadcast_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])

    j = broadcast_join(li, orders, key="l_orderkey", build_key="o_orderkey")
    j = broadcast_join(j, cust, key="o_custkey", build_key="c_custkey")
    j = broadcast_join(j, nation, key="c_nationkey", build_key="n_nationkey")
    j = broadcast_join(j, region, key="n_regionkey", build_key="r_regionkey")

    def partial(b: pa.Table) -> pa.Table:
        price = _nn(b.column("l_extendedprice"))
        disc = _nn(b.column("l_discount"))
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        t = pa.table({"r_name": b.column("r_name"), "cents": cents})
        return (
            pa.TableGroupBy(t, ["r_name"])
            .aggregate([("cents", "sum"), ([], "count_all")])
            .rename_columns(["r_name", "cents", "n"])
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("r_name")
        .aggregate(Sum("cents"), Sum("n"))
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("r_name"),
                pc.cast(b.column("sum(n)"), pa.int64()),
                pc.divide(pc.cast(b.column("sum(cents)"), pa.float64()), 100.0),
            ],
            names=["r_name", "n_items", "revenue"],
        ),
        batch_format="pyarrow",
    )


def _q_profit_by_nation_year(sf_dir: str):
    """TPC-H Q9 flavor over the previously-unused part/supplier tables:
    PROMO-part line items, profit = disc. revenue − 10% retail cost,
    by supplier nation and order year.

    Join plan (the 100-TB shapes): part/supplier/nation are dimensions
    → broadcast; lineitem ⋈ orders is fact ⋈ fact → hash-shuffle join
    (both sides partitioned on the order key).
    """
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import broadcast_join, hash_shuffle_join

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type", "p_retailprice"])

    def promo_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("p_type"), "PROMO")).select(
            ["p_partkey", "p_retailprice"]
        )

    li = broadcast_join(
        li, part.map_batches(promo_only, batch_format="pyarrow", zero_copy_batch=True),
        key="l_partkey", build_key="p_partkey",
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    supp_nation = broadcast_join(supp, nation, key="s_nationkey", build_key="n_nationkey")
    li = broadcast_join(li, supp_nation, key="l_suppkey", build_key="s_suppkey", build_cols=["n_name"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def with_year(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("o_orderkey"), pc.cast(pc.year(b.column("o_orderdate")), pa.int64())],
            names=["o_orderkey", "o_year"],
        )

    orders_y = orders.map_batches(with_year, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_shuffle_join(li, orders_y, on="l_orderkey", right_on="o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        price = _nn(b.column("l_extendedprice"))
        disc = _nn(b.column("l_discount"))
        qty = _nn(b.column("l_quantity"))
        retail = _nn(b.column("p_retailprice"))
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64) - np.floor(
            retail * qty * 10
        ).astype(np.int64)
        t = pa.table({"nation": b.column("n_name"), "o_year": b.column("o_year"), "cents": cents})
        return (
            pa.TableGroupBy(t, ["nation", "o_year"])
            .aggregate([("cents", "sum"), ([], "count_all")])
            .rename_columns(["nation", "o_year", "cents", "n"])
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["nation", "o_year"])
        .aggregate(Sum("cents"), Sum("n"))
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("nation"),
                b.column("o_year"),
                pc.cast(b.column("sum(n)"), pa.int64()),
                pc.divide(pc.cast(b.column("sum(cents)"), pa.float64()), 100.0),
            ],
            names=["nation", "o_year", "n_items", "profit"],
        ),
        batch_format="pyarrow",
    )


def _urgent_order_custkeys(sf_dir: str):
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def urgent(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("o_orderpriority"), "1-URGENT")).select(
            ["o_custkey"]
        )

    return orders.map_batches(urgent, batch_format="pyarrow", zero_copy_batch=True)


def _q_urgent_customers(sf_dir: str):
    """left_semi hash-shuffle join: customers with ≥1 URGENT order."""
    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    return hash_shuffle_join(
        cust, _urgent_order_custkeys(sf_dir), on="c_custkey", right_on="o_custkey",
        how="left_semi",
    )


def _q_quiet_customers(sf_dir: str):
    """left_anti hash-shuffle join: customers with NO urgent order —
    the distributed complement used by drop_by_ids at scale."""
    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    return hash_shuffle_join(
        cust, _urgent_order_custkeys(sf_dir), on="c_custkey", right_on="o_custkey",
        how="left_anti",
    )


def _q_nation_top_names(sf_dir: str):
    """Ordered string aggregation per group (string_agg analog): the 3
    highest-balance customer names per nation, ';'-joined in rank
    order. Hot-key-safe: grouped_top_k pre-reduces every batch to ≤3
    rows per nation BEFORE the shuffle; the final concat groups are ≤3
    rows × 25 nations by contract."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey", "c_acctbal"])
    from pdf_table_extractor_ray.stages.topk import grouped_top_k

    top3 = grouped_top_k(
        cust,
        "c_nationkey",
        [("c_acctbal", "descending"), ("c_custkey", "ascending")],
        k=3,
    )

    def concat(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("c_acctbal", "descending"), ("c_custkey", "ascending")]
        )
        names = g.column("c_name").take(idx).to_pylist()
        nk = g.column("c_nationkey")[0].as_py()
        return pa.Table.from_arrays(
            [pa.array([int(nk)], pa.int64()), pa.array([";".join(names)], pa.string())],
            names=["c_nationkey", "top_names"],
        )

    return top3.groupby("c_nationkey").map_groups(concat, batch_format="pyarrow")


def _q_cust_order_dist(sf_dir: str):
    """TPC-H Q13 flavor: distribution of orders-per-customer,
    INCLUDING zero-order customers (the rows an inner join loses).

    Plan: per-batch Arrow pre-count on ``o_custkey`` (combiner) →
    groupby-Sum — only (custkey, partial_n) rows shuffle, never the
    orders fact rows — → hash-shuffle LEFT OUTER join onto customer
    keys so order-less customers surface as null→0 → second two-level
    count over the tiny ``c_count`` domain. Exercises the left_outer
    leg of ``hash_shuffle_join`` (reference has no joins; engine-only,
    cf. SURVEY §2.6 "absent in the reference")."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def precount(b: pa.Table) -> pa.Table:
        t = b.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return pa.Table.from_arrays(
            [t.column("o_custkey"), pc.cast(t.column("o_custkey_count"), pa.int64())],
            names=["o_custkey", "n_part"],
        )

    per_cust = (
        orders.map_batches(precount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_custkey")
        .aggregate(Sum("n_part"))
    )
    cust = _read(sf_dir, "customer", ["c_custkey"])
    joined = hash_shuffle_join(cust, per_cust, on="c_custkey", right_on="o_custkey", how="left")

    def ccount(b: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(b.column("sum(n_part)"), pa.int64()), 0)
        t = pa.Table.from_arrays([n], names=["c_count"])
        g = t.group_by("c_count").aggregate([("c_count", "count")])
        return pa.Table.from_arrays(
            [g.column("c_count"), pc.cast(g.column("c_count_count"), pa.int64())],
            names=["c_count", "dist_part"],
        )

    dist = (
        joined.map_batches(ccount, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("dist_part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("c_count"), pc.cast(b.column("sum(dist_part)"), pa.int64())],
            names=["c_count", "custdist"],
        )

    return dist.map_batches(finish, batch_format="pyarrow")


def _q_last_order_asof(sf_dir: str):
    """As-of join under a native DuckDB ASOF JOIN oracle: each event ⋈
    the user's most recent order at-or-before the event time. Orders
    are first reduced to one row per (custkey, orderdate) — max
    orderkey wins — because as-of semantics are undefined on timestamp
    ties (both engines would pick arbitrarily)."""
    from pdf_table_extractor_ray.stages.asof import asof_join
    from pdf_table_extractor_ray.stages.topk import keep_max_per_key

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    # ARGMAX tie-dedup with NO per-(cust, date) Python: bucket-hash
    # shuffle + vectorized run-boundary pick (orderkey unique per pair)
    orders_1 = keep_max_per_key(orders, ["o_custkey", "o_orderdate"], "o_orderkey")
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    joined = asof_join(
        ev,
        orders_1,
        on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    )

    def finish(b: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [
                b.column("event_id"),
                b.column("user_id"),
                pc.cast(b.column("ts"), pa.int64()),
                b.column("o_orderkey"),
                b.column("o_totalprice"),
            ],
            names=["event_id", "user_id", "ts_us", "o_orderkey", "o_totalprice"],
        )
        # DuckDB ASOF JOIN is inner: drop unmatched left rows
        return t.filter(pc.is_valid(t.column("o_orderkey")))

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_first_event_after_order(sf_dir: str):
    """Forward-direction as-of join (smallest right ts ≥ left ts) under
    a native DuckDB ASOF oracle: each order ⋈ the customer's first
    event at-or-after the order date (most custkeys have no events →
    real inner-join misses). Events are pre-reduced to one row per
    (user_id, ts) — max event_id wins — because as-of semantics are
    undefined on timestamp ties."""
    from pdf_table_extractor_ray.stages.asof import asof_join
    from pdf_table_extractor_ray.stages.topk import keep_max_per_key

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    # ARGMAX tie-dedup, bucket-vectorized (event_id unique per (user, ts))
    ev1 = keep_max_per_key(ev, ["user_id", "ts"], "event_id")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    joined = asof_join(
        orders,
        ev1,
        on="o_custkey",
        right_on="user_id",
        left_ts="o_orderdate",
        right_ts="ts",
        direction="forward",
        right_cols=["event_id"],
    )

    def finish(b: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [b.column("o_orderkey"), b.column("o_custkey"), b.column("event_id")],
            names=["o_orderkey", "o_custkey", "event_id"],
        )
        # DuckDB ASOF JOIN is inner: drop unmatched left rows
        return t.filter(pc.is_valid(t.column("event_id")))

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_top_orders_per_cust(sf_dir: str):
    """Top-3 orders per customer (the QUALIFY row_number() pattern) —
    via the hot-key-safe ``grouped_top_k``: each batch pre-reduces to
    ≤3 rows per customer BEFORE the shuffle and the merge group is
    bounded by construction; no per-customer Python (a
    ``groupby(o_custkey).map_groups`` would be one interpreter call
    per customer — 10^7+ at scale)."""
    from pdf_table_extractor_ray.stages.topk import grouped_top_k

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    kept = grouped_top_k(
        ds,
        "o_custkey",
        [("o_totalprice", "descending"), ("o_orderkey", "ascending")],
        3,
    )
    return kept.map_batches(
        lambda b: b.select(["o_custkey", "o_orderkey", "o_totalprice"]),
        batch_format="pyarrow",
    )


def _q_order_price_quantiles(sf_dir: str):
    """Exact per-group discrete quantiles (p25/p50/p75 of order price
    per priority class) — groupby.map_groups sorted index pick, matching
    DuckDB quantile_disc (element at ceil(q·n)−1 of the sorted
    multiset — the textbook discrete quantile; verified empirically)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def qs(group: pa.Table) -> pa.Table:
        v = np.sort(group.column("o_totalprice").to_numpy(zero_copy_only=False))
        n = len(v)
        pick = lambda q: float(v[int(np.ceil(q * n)) - 1])  # noqa: E731
        return pa.Table.from_arrays(
            [
                pa.array([group.column("o_orderpriority")[0].as_py()]),
                pa.array([pick(0.25)], pa.float64()),
                pa.array([pick(0.5)], pa.float64()),
                pa.array([pick(0.75)], pa.float64()),
            ],
            names=["o_orderpriority", "p25", "p50", "p75"],
        )

    return ds.groupby("o_orderpriority").map_groups(qs, batch_format="pyarrow")


def _q_corpus_prep_v2(sf_dir: str):
    """Round-3 composite: Gopher repetition gate → benchmark
    decontamination → corpus-wide chunk dedup; one summary row
    (rows-only: composite of already-oracled stages)."""
    from pdf_table_extractor_ray.pipelines.corpus_prep import (
        corpus_v2_totals,
        prepare_corpus_v2,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return corpus_v2_totals(prepare_corpus_v2(docs))


def _q_corpus_prep_v3(sf_dir: str):
    """Round-4 composite: map-only entropy + compression-ratio
    repetitiveness gates BEFORE the v2 pipeline's shuffles (Gopher →
    decontaminate → chunk-dedup); one summary row."""
    from pdf_table_extractor_ray.pipelines.corpus_prep import (
        corpus_v2_totals,
        prepare_corpus_v3,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return corpus_v2_totals(prepare_corpus_v3(docs))


def _q_revenue_by_price_quartile(sf_dir: str):
    """Partitioner REUSE: quartile boundaries of o_totalprice (exact
    radix-selected order statistics) bucket the orders, then revenue
    aggregates per bucket — the range-partition → aggregate shape a
    skew-proof range shuffle runs. Integer cents throughout."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.sketches import kth_smallest_multi

    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def nvalid(b: pa.Table) -> pa.Table:
        c = b.column("o_totalprice")
        return pa.table({"n": pa.array([c.length() - c.null_count], pa.int64())})

    n = int(
        orders.map_batches(nvalid, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("n"))["sum(n)"]
    )
    ranks = [max(1, (i * n) // 4) for i in (1, 2, 3)]
    bounds = np.array(kth_smallest_multi(orders, "o_totalprice", ranks), np.float64)

    def bucketize(b: pa.Table) -> pa.Table:
        v = b.column("o_totalprice")
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        v = v.drop_null()
        x = v.to_numpy(zero_copy_only=False).astype(np.float64)
        bk = np.searchsorted(bounds, x, side="right").astype(np.int64)
        cents = np.floor(x * 100).astype(np.int64)
        t = pa.table({"bucket": pa.array(bk), "c": pa.array(cents)})
        g = t.group_by("bucket").aggregate([("c", "sum"), ("c", "count")])
        return pa.table(
            {
                "bucket": g.column("bucket"),
                "part": pc.cast(g.column("c_sum"), pa.int64()),
                "n_part": pc.cast(g.column("c_count"), pa.int64()),
            }
        )

    agg = (
        orders.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("part"), Sum("n_part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket": b.column("bucket"),
                "revenue_cents": pc.cast(b.column("sum(part)"), pa.int64()),
                "n": pc.cast(b.column("sum(n_part)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_order_price_quantiles_by_approx(sf_dir: str):
    """Per-key approximate quantiles (the 'p95 per user' shape):
    keyed two-pass histogram sketch — only (key, bin, cnt) partials
    shuffle. Rows-only by nature (brackets, not point values);
    bracket-correctness tested in test_corpus_ops."""
    from pdf_table_extractor_ray.stages.sketches import approx_quantiles_by

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    return approx_quantiles_by(ds, "o_orderpriority", "o_totalprice", [0.5, 0.95])


def _q_customer_balance_rank(sf_dir: str):
    """Ranking windows: per-nation percent_rank and ntile(4) quartile
    of customers by account balance (ties broken by custkey, so
    percent_rank = pos/(n−1) — one exact double division). Vectorized
    per partition group: one lexsort + arange; ntile uses DuckDB's
    ceil-first distribution (first n mod k tiles get the extra row)."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

    def rank(g: pa.Table) -> pa.Table:
        bal = g.column("c_acctbal").to_numpy(zero_copy_only=False)
        ck = g.column("c_custkey").to_numpy(zero_copy_only=False)
        nk = int(g.column("c_nationkey")[0].as_py())
        order = np.lexsort((ck, bal))
        n = len(ck)
        pos = np.arange(n, dtype=np.int64)
        prank = pos.astype(np.float64) / (n - 1) if n > 1 else np.zeros(n, np.float64)
        k = 4
        big, rem = n // k, n % k
        cut = rem * (big + 1)
        tile = np.where(pos < cut, pos // max(big + 1, 1), rem + (pos - cut) // max(big, 1))
        return pa.Table.from_arrays(
            [
                pa.array(ck[order].astype(np.int64), pa.int64()),
                pa.array(np.full(n, nk, np.int64), pa.int64()),
                pa.array(prank, pa.float64()),
                pa.array((tile + 1).astype(np.int64), pa.int64()),
            ],
            names=["c_custkey", "c_nationkey", "prank", "quartile"],
        )

    return ds.groupby("c_nationkey").map_groups(rank, batch_format="pyarrow")


def _q_user_value_timewin(sf_dir: str):
    """RANGE-framed time window: per event, the sum of that user's
    integer-cents values in the last 30 minutes (inclusive, value-based
    frame — peers with equal ts are all included, unlike the ROWS
    window in user_value_rolling).

    One user-bucket shuffle; inside a bucket the whole window family is
    TWO global ``np.searchsorted`` calls over a composite
    (user-rank · span + relative-ts) key — no per-user loop. The span
    guard keeps the composite in int64 (raise ``num_buckets`` if a
    bucket ever holds > 2^63/span users)."""
    HOP = 1_800_000_000  # 30 min in µs

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def bucketize(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column("bucket", pa.array((u % 64).astype(np.int64), pa.int64()))

    def window(g: pa.Table) -> pa.Table:
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.floor(_nn(g.column("value")) * 100).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        su, st, se, sc = uid[order], ts[order], eid[order], cents[order]
        # composite key: user-rank · span + ts-offset; span leaves HOP+1
        # headroom below each user's range so an out-of-window query key
        # never crosses into the previous user's key block
        _, urank = np.unique(su, return_inverse=True)
        t0 = st.min() if len(st) else 0
        span = (st.max() - t0 if len(st) else 0) + HOP + 2
        n_users = int(urank.max()) + 1 if len(su) else 0
        if n_users and span > (2**62) // n_users:
            raise ValueError("bucket too wide for int64 composite keys; raise num_buckets")
        key = urank.astype(np.int64) * span + (st - t0)
        qkey = key - HOP
        prefix = np.zeros(len(sc) + 1, np.int64)
        np.cumsum(sc, out=prefix[1:])
        left = np.searchsorted(key, qkey, side="left")
        right = np.searchsorted(key, key, side="right")
        win = prefix[right] - prefix[left]
        return pa.Table.from_arrays(
            [
                pa.array(se.astype(np.int64)),
                pa.array(su.astype(np.int64)),
                pa.array(st),
                pa.array(win, pa.int64()),
            ],
            names=["event_id", "user_id", "ts_us", "win30_cents"],
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(window, batch_format="pyarrow")
    )


def _q_events_hopping(sf_dir: str):
    """Hopping-window counts (1 h window, 30 min hop → each event in
    exactly 2 overlapping windows): explode per batch with numpy
    repeat (k = window/hop copies), pre-reduce (window_start, n)
    partials, then a small-key groupby-sum. The window assignment
    never shuffles raw events — only the per-batch partial counts."""
    from ray.data.aggregate import Sum

    HOP = 1_800_000_000  # 30 min in µs
    K = 2  # window = K * hop

    ds = _read(sf_dir, "events", ["ts"])

    def partial(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(b.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        base = ts_us // HOP
        w_start = ((np.repeat(base, K) - np.tile(np.arange(K, dtype=np.int64), len(base))) * HOP)
        uniq, n = np.unique(w_start, return_counts=True)
        return pa.table(
            {"w_start_us": pa.array(uniq, pa.int64()), "n": pa.array(n.astype(np.int64), pa.int64())}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("w_start_us")
        .aggregate(Sum("n"))
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("w_start_us"), pc.cast(b.column("sum(n)"), pa.int64())],
            names=["w_start_us", "n_events"],
        ),
        batch_format="pyarrow",
    )


def _q_events_unpivot(sf_dir: str):
    """Unpivot (wide → long): the inverse of events_pivot — each wide
    per-user row explodes to one (user_id, event_type, n) row per type
    column, vectorized with numpy repeat/tile per batch (zero cells
    kept, SQL UNPIVOT INCLUDE NULLS semantics)."""
    wide = _q_events_pivot(sf_dir)

    def explode(b: pa.Table) -> pa.Table:
        users = b.column("user_id").to_numpy()
        k = len(_EVENT_TYPES)
        n_mat = np.stack(
            [b.column(f"n_{et}").to_numpy() for et in _EVENT_TYPES], axis=1
        )  # (users, types)
        return pa.Table.from_arrays(
            [
                pa.array(np.repeat(users, k), pa.int64()),
                pa.array(np.tile(np.asarray(_EVENT_TYPES, dtype=object), len(users))),
                pa.array(n_mat.ravel(), pa.int64()),
            ],
            names=["user_id", "event_type", "n"],
        )

    return wide.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def _q_distinct_users_by_type(sf_dir: str):
    """Per-event-type approximate distinct users (HLL registers merged
    per key — the COUNT(DISTINCT) GROUP BY shape where values never
    shuffle, only 4 KB sketches). Rows-only by nature (approximate);
    accuracy + layout-invariance tested in test_corpus_ops."""
    from pdf_table_extractor_ray.stages.sketches import hll_count_distinct_by

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return hll_count_distinct_by(ds, "event_type", "user_id")


def _q_order_price_quantiles_cont(sf_dir: str):
    """Interpolated (continuous) per-group quantiles — DuckDB
    quantile_cont parity: position p = (n−1)·q, value =
    v[⌊p⌋]·(1−frac) + v[⌈p⌉]·frac (the convex-combination op order is
    what DuckDB computes — verified bit-exact, the `a+(b−a)·frac`
    form is NOT)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def qs(group: pa.Table) -> pa.Table:
        v = np.sort(group.column("o_totalprice").to_numpy(zero_copy_only=False))
        n = len(v)

        def pick(q: float) -> float:
            p = (n - 1) * q
            lo = int(np.floor(p))
            hi = min(lo + 1, n - 1)
            frac = p - lo
            return float(v[lo] * (1.0 - frac) + v[hi] * frac)

        return pa.Table.from_arrays(
            [
                pa.array([group.column("o_orderpriority")[0].as_py()]),
                pa.array([pick(0.25)], pa.float64()),
                pa.array([pick(0.5)], pa.float64()),
                pa.array([pick(0.75)], pa.float64()),
            ],
            names=["o_orderpriority", "p25", "p50", "p75"],
        )

    return ds.groupby("o_orderpriority").map_groups(qs, batch_format="pyarrow")


def _q_user_value_rolling(sf_dir: str):
    """Per-user rolling 3-event sum of value (integer cents) ordered by
    time — the ROWS BETWEEN 2 PRECEDING AND CURRENT ROW window.

    One user-BUCKET shuffle (group count fixed at 64 whatever the user
    count — per-user ``map_groups`` would be 10^8 interpreter
    invocations at 10^8 users, VERDICT r3 #2); inside a bucket the
    whole window family is one lexsort + one prefix sum + a
    user-clamped gather: window start = max(i−2, first row of the
    user), with the per-user first-row index forward-filled by
    ``np.maximum.accumulate`` — no per-user loop."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def bucketize(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column("bucket", pa.array((u % 64).astype(np.int64), pa.int64()))

    def roll(g: pa.Table) -> pa.Table:
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.floor(_nn(g.column("value")) * 100).astype(np.int64)
        order = np.lexsort((eid, ts, uid))  # event_id breaks ts ties within a user
        su, st, se, sc = uid[order], ts[order], eid[order], cents[order]
        n = len(sc)
        prefix = np.zeros(n + 1, np.int64)
        np.cumsum(sc, out=prefix[1:])
        first = np.empty(n, bool)
        if n:
            first[0] = True
            first[1:] = su[1:] != su[:-1]
        idx = np.arange(n, dtype=np.int64)
        ustart = np.maximum.accumulate(np.where(first, idx, 0))
        win_lo = np.maximum(idx - 2, ustart)
        roll3 = prefix[idx + 1] - prefix[win_lo]
        return pa.Table.from_arrays(
            [
                pa.array(se.astype(np.int64)),
                pa.array(su.astype(np.int64)),
                pa.array(st),
                pa.array(roll3),
            ],
            names=["event_id", "user_id", "ts_us", "roll3_cents"],
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(roll, batch_format="pyarrow")
    )


def _q_user_value_cumsum(sf_dir: str):
    """Per-user running total (ROWS UNBOUNDED PRECEDING cumulative
    window) — same bucket-vectorized kernel family as
    user_value_rolling with the window start clamped to each user's
    first row: one bucket shuffle, one lexsort + prefix sum."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def bucketize(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column("bucket", pa.array((u % 64).astype(np.int64), pa.int64()))

    def cumsum(g: pa.Table) -> pa.Table:
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.floor(_nn(g.column("value")) * 100).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        su, st, se, sc = uid[order], ts[order], eid[order], cents[order]
        n = len(sc)
        prefix = np.zeros(n + 1, np.int64)
        np.cumsum(sc, out=prefix[1:])
        first = np.empty(n, bool)
        if n:
            first[0] = True
            first[1:] = su[1:] != su[:-1]
        idx = np.arange(n, dtype=np.int64)
        ustart = np.maximum.accumulate(np.where(first, idx, 0))
        running = prefix[idx + 1] - prefix[ustart]
        return pa.Table.from_arrays(
            [
                pa.array(se.astype(np.int64)),
                pa.array(su.astype(np.int64)),
                pa.array(st),
                pa.array(running),
            ],
            names=["event_id", "user_id", "ts_us", "cum_cents"],
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(cumsum, batch_format="pyarrow")
    )


def _q_distinct_users_approx(sf_dir: str):
    """HyperLogLog distinct-user estimate — rows-only by nature
    (approximate; DuckDB's approx_count_distinct is a different HLL
    implementation), accuracy-tested against the exact count in
    test_corpus_ops. Deterministic across block orders/cluster sizes
    (register max-merge is commutative)."""
    from pdf_table_extractor_ray.stages.sketches import hll_count_distinct

    return hll_count_distinct(_read(sf_dir, "events", ["user_id"]), "user_id")


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _q_events_pivot(sf_dir: str):
    """Pivot: per-user event counts spread to one fixed column per
    event type (long → wide). Widened *inside* the per-batch combiner
    (vectorized `if_else` scatter per type column), so the shuffle moves
    one wide row per (user, batch) and the reduce is a plain Sum
    aggregate — no per-group Python anywhere (at 10^8 users a per-group
    lambda would mean 10^8 interpreter invocations)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial_wide(b: pa.Table) -> pa.Table:
        t = (
            pa.TableGroupBy(
                pa.table({"user_id": b.column("user_id"), "event_type": b.column("event_type")}),
                ["user_id", "event_type"],
            )
            .aggregate([([], "count_all")])
            .rename_columns(["user_id", "event_type", "n"])
        )
        et_col = t.column("event_type")
        n_col = pc.cast(t.column("n"), pa.int64())
        zero = pa.scalar(0, pa.int64())
        arrays = [pc.cast(t.column("user_id"), pa.int64())]
        for et in _EVENT_TYPES:
            arrays.append(pc.if_else(pc.equal(et_col, et), n_col, zero))
        return pa.Table.from_arrays(
            arrays, names=["user_id"] + [f"n_{et}" for et in _EVENT_TYPES]
        )

    agg = (
        ds.map_batches(partial_wide, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(*[Sum(f"n_{et}") for et in _EVENT_TYPES])
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [pc.cast(b.column("user_id"), pa.int64())]
            + [pc.cast(b.column(f"sum(n_{et})"), pa.int64()) for et in _EVENT_TYPES],
            names=["user_id"] + [f"n_{et}" for et in _EVENT_TYPES],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_doc_sample(sf_dir: str):
    """Deterministic 25% content-hash sample (md5 prefix) — same rows
    on every run and at every cluster size; SQL-exact."""
    from pdf_table_extractor_ray.stages.dedup import sample_by_content_hash

    return sample_by_content_hash(
        _read(sf_dir, "documents", ["doc_id", "text", "lang", "source", "n_chars"])
    )


def _q_lm_familiarity(sf_dir: str):
    """Unigram-LM train + score (CCNet-style quality filtering) with an
    integer-exact SQL oracle: distributed token counts → top-1000
    vocab → broadcast → vectorized per-doc vocabulary statistics."""
    from pdf_table_extractor_ray.stages.lm import (
        familiarity_scores,
        top_vocab,
        train_token_counts,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    counts = train_token_counts(docs)
    vocab = top_vocab(counts)
    return familiarity_scores(docs, vocab)


def _q_lm_bigram_familiarity(sf_dir: str):
    """Bigram-LM train + score (the 2-gram rung of CCNet-style
    filtering): distributed bigram counts → top-1000 bigram vocab →
    broadcast → per-doc integer-exact bigram statistics."""
    from pdf_table_extractor_ray.stages.lm import (
        bigram_familiarity_scores,
        top_vocab,
        train_bigram_counts,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    counts = train_bigram_counts(docs)
    vocab = top_vocab(counts)
    return bigram_familiarity_scores(docs, vocab)


def _q_lm_trigram_familiarity(sf_dir: str):
    """Trigram-LM train + score (the 3-gram rung of CCNet-style
    filtering — production CCNet uses 5-gram Kneser-Ney; each rung is
    the same groupby-count + broadcast + vectorized scoring shape):
    distributed trigram counts → top-1000 trigram vocab → broadcast →
    per-doc integer-exact trigram statistics."""
    from pdf_table_extractor_ray.stages.lm import (
        top_vocab,
        train_trigram_counts,
        trigram_familiarity_scores,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    counts = train_trigram_counts(docs)
    vocab = top_vocab(counts)
    return trigram_familiarity_scores(docs, vocab)


def _q_lm_perplexity(sf_dir: str):
    """Float leg of the LM pipeline (rows-only: ln() differs in the
    last ulp between numpy and DuckDB — measured on this host)."""
    from pdf_table_extractor_ray.stages.lm import (
        perplexity_scores,
        top_vocab,
        total_tokens,
        train_token_counts,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    counts = train_token_counts(docs)
    vocab = top_vocab(counts)
    total = total_tokens(counts)
    return perplexity_scores(docs, vocab, total)


def _q_corpus_prep(sf_dir: str):
    from pdf_table_extractor_ray.pipelines.corpus_prep import (
        corpus_token_totals,
        prepare_corpus,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return corpus_token_totals(prepare_corpus(docs))


def _q_knn_ivf(sf_dir: str):
    from pdf_table_extractor_ray.stages.similarity import knn_ivf

    ds, q, qids = _query_vectors(sf_dir)
    return knn_ivf(ds, q, qids, k=5).select_columns(["query_id", "rank", "vec_id"])


def _q_knn_pq(sf_dir: str):
    """Product-quantization ADC top-5 (rows-only: approximate by
    construction; recall@5 gated vs brute force in pytest)."""
    from pdf_table_extractor_ray.stages.similarity import knn_pq

    ds, q, qids = _query_vectors(sf_dir)
    return knn_pq(ds, q, qids, k=5).select_columns(["query_id", "rank", "vec_id"])


def _q_corpus_prep_v4(sf_dir: str):
    """Round-4 composite with a trained-model gate: NB language
    classifier trained on the corpus's own labels, label-inconsistent
    docs dropped map-side, then the v3 pipeline (entropy + compression
    gates → Gopher → decontaminate → chunk-dedup). One summary row
    (pipelines/corpus_prep.py:prepare_corpus_v4)."""
    from pdf_table_extractor_ray.pipelines.corpus_prep import (
        corpus_v2_totals,
        prepare_corpus_v4,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    return corpus_v2_totals(prepare_corpus_v4(docs))


def _q_corpus_prep_v5(sf_dir: str):
    """Round-4 composite with the corpus-level TEMPLATE-STRIP front
    stage: per-source nav/footer sentinels are injected into every
    page (standing in for the boilerplate a real site stamps), v5
    mines + strips them, then runs the full v4 pipeline. One summary
    row (pipelines/corpus_prep.py:prepare_corpus_v5). Rows-only;
    equivalence v5(injected) == v4(clean) is pinned in pytest
    (test_corpus_ops) — the strip must restore the clean corpus
    byte-exactly before the downstream gates."""
    from pdf_table_extractor_ray.pipelines.corpus_prep import (
        corpus_v2_totals,
        prepare_corpus_v5,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "source", "lang", "text"])

    def inject(b: pa.Table) -> pa.Table:
        srcs = b.column("source").to_pylist()
        texts = b.column("text").to_pylist()
        aug = [f"«nav {s}»\n{t or ''}\n«footer {s}»" for s, t in zip(srcs, texts)]
        return b.drop_columns(["text"]).append_column("text", pa.array(aug, pa.string()))

    injected = docs.map_batches(inject, batch_format="pyarrow", zero_copy_batch=True)
    return corpus_v2_totals(prepare_corpus_v5(injected))


def _q_daily_revenue_interp(sf_dir: str):
    """Calendar resampling with LINEAR interpolation: every day from
    the first to the last populated day, missing days filled by
    integer linear interpolation between their populated neighbors
    (c0 + trunc((c1−c0)·j / g) — truncating division both sides, so
    the fill is bit-exact vs the SQL oracle's ffill/bfill window
    construction). The series axis is the bounded daily rollup; the
    fill runs single-block under the same bounded-cardinality
    contract as the other daily series queries."""
    from ray.data.aggregate import Sum

    _DAY = 86_400_000_000
    daily = _daily_order_cents(sf_dir)

    def finish(b: pa.Table) -> pa.Table:
        day = _nn(b.column("day_us")).astype(np.int64)
        cents = _nn(b.column("cents")).astype(np.int64)
        order = np.argsort(day, kind="stable")
        day, cents = day[order], cents[order]
        if len(day) == 0:
            return pa.table(
                {
                    "day_us": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                    "interpolated": pa.array([], pa.int64()),
                }
            )
        di = (day - day[0]) // _DAY
        n_grid = int(di[-1]) + 1
        grid = np.arange(n_grid, dtype=np.int64)
        # prev / next populated index per grid day
        p = np.searchsorted(di, grid, side="right") - 1
        nx = np.searchsorted(di, grid, side="left")
        populated = np.zeros(n_grid, bool)
        populated[di] = True
        c0, c1 = cents[p], cents[np.minimum(nx, len(di) - 1)]
        d0, d1 = di[p], di[np.minimum(nx, len(di) - 1)]
        g = np.maximum(d1 - d0, 1)
        delta = (c1 - c0) * (grid - d0)
        q = np.sign(delta) * (np.abs(delta) // g)  # trunc toward zero
        filled = c0 + q
        out = np.where(populated, 0, filled)
        out[di] = cents
        return pa.table(
            {
                "day_us": pa.array(day[0] + grid * _DAY, pa.int64()),
                "cents": pa.array(out.astype(np.int64), pa.int64()),
                "interpolated": pa.array((~populated).astype(np.int64), pa.int64()),
            }
        )

    return daily.repartition(1).map_batches(finish, batch_format="pyarrow")


def _q_knn_sq8(sf_dir: str):
    """Scalar-quantized (SQ8, 8 bits/dim) top-5 with exact re-rank —
    the memory-8×-cheaper ANN rung between brute force and PQ
    (rows-only: approximate by construction; recall@5 gated vs brute
    force in pytest; stages/similarity.py:knn_sq8)."""
    from pdf_table_extractor_ray.stages.similarity import knn_sq8

    ds, q, qids = _query_vectors(sf_dir)
    return knn_sq8(ds, q, qids, k=5).select_columns(["query_id", "rank", "vec_id"])


def _q_dup_clusters(sf_dir: str):
    """The distributed connected-components operator under a SQL
    oracle: star edges (min orderkey → each other order) within every
    multi-order customer → label propagation → (node, root). Group
    membership is a SQL window partition, so CC's fixed point is
    exactly checkable. (Exact-dup clusters over documents would be the
    production use, but the driver corpus has no exact dups at any sf
    — orders-per-customer gives real multi-member clusters.)"""
    from pdf_table_extractor_ray.stages.dedup import connected_components

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    # star edges with NO per-customer Python: one shuffle by customer
    # BUCKET (fixed 64 groups), per bucket one lexsort + run-boundary
    # masks — keeper = forward-filled first orderkey of each customer
    # run, partner = every non-first member (the sessionize pattern)
    def bucketize(b: pa.Table) -> pa.Table:
        c = b.column("o_custkey").to_numpy(zero_copy_only=False)
        return b.append_column("bucket", pa.array((c % 64).astype(np.int64), pa.int64()))

    def star_edges(g: pa.Table) -> pa.Table:
        cust = g.column("o_custkey").to_numpy(zero_copy_only=False)
        okey = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        n = len(cust)
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64())], names=["doc_a", "doc_b"]
        )
        if n < 2:
            return empty
        order = np.lexsort((okey, cust))
        sc, sk = cust[order], okey[order]
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = sc[1:] != sc[:-1]
        keeper = sk[np.maximum.accumulate(np.where(first, np.arange(n), 0))]
        m = ~first
        if not m.any():
            return empty
        return pa.Table.from_arrays(
            [pa.array(keeper[m].astype(np.int64)), pa.array(sk[m].astype(np.int64))],
            names=["doc_a", "doc_b"],
        )

    pairs = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(star_edges, batch_format="pyarrow")
    )
    return connected_components(pairs).map_batches(
        lambda b: pa.Table.from_arrays(
            [pc.cast(b.column("node"), pa.int64()), pc.cast(b.column("root"), pa.int64())],
            names=["node", "root"],
        ),
        batch_format="pyarrow",
    )


def _q_near_dedup_docs(sf_dir: str):
    from pdf_table_extractor_ray.stages.dedup import near_dedup_keep_ids

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return near_dedup_keep_ids(ds).select_columns(["doc_id"])


def _q_events_hourly(sf_dir: str):
    """Tumbling-window (1h) event counts per user — pre-reduced per
    batch, then a small-key groupby."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(b.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        hour = (ts_us // 3_600_000_000).astype(np.int64)
        t = pa.table({"user_id": b.column("user_id"), "hour_bucket": hour})
        return (
            pa.TableGroupBy(t, ["user_id", "hour_bucket"])
            .aggregate([([], "count_all")])
            .rename_columns(["user_id", "hour_bucket", "n"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "hour_bucket"])
        .aggregate(Sum("n"))
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("user_id"), b.column("hour_bucket"), pc.cast(b.column("sum(n)"), pa.int64())],
            names=["user_id", "hour_bucket", "n_events"],
        ),
        batch_format="pyarrow",
    )


def _q_customer_nation(sf_dir: str):
    """Broadcast dimension join (T5 generalized): customer ⋈ nation."""
    from pdf_table_extractor_ray.stages.joins import broadcast_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    joined = broadcast_join(cust, nation, key="c_nationkey", build_key="n_nationkey")
    return joined.select_columns(["c_custkey", "c_acctbal", "n_name"])


def _q_orders_by_nation(sf_dir: str):
    """orders ⋈ customer ⋈ nation → per-nation order counts + cents
    totals. Both build sides broadcast; probe side streams."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import broadcast_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    j1 = broadcast_join(orders, cust, key="o_custkey", build_key="c_custkey")
    j2 = broadcast_join(j1, nation, key="c_nationkey", build_key="n_nationkey")

    def partial(b: pa.Table) -> pa.Table:
        cents = np.floor(_nn(b.column("o_totalprice")) * 100).astype(np.int64)
        t = pa.table({"n_name": b.column("n_name"), "cents": cents})
        return (
            pa.TableGroupBy(t, ["n_name"])
            .aggregate([("cents", "sum"), ([], "count_all")])
            .rename_columns(["n_name", "cents", "n"])
        )

    agg = j2.map_batches(partial, batch_format="pyarrow").groupby("n_name").aggregate(
        Sum("cents"), Sum("n")
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("n_name"),
                pc.cast(b.column("sum(n)"), pa.int64()),
                pc.divide(pc.cast(b.column("sum(cents)"), pa.float64()), 100.0),
            ],
            names=["n_name", "n_orders", "total_price"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_sessionize(sf_dir: str):
    from pdf_table_extractor_ray.stages.sessions import sessionize

    return sessionize(_read(sf_dir, "events", ["user_id", "ts"]))


def _interval_orders(sf_dir: str, with_cents: bool):
    """Orders as [o_orderdate, o_orderdate+7d) µs intervals."""
    from pdf_table_extractor_ray.stages.intervals import US_PER_DAY

    cols = ["o_orderkey", "o_orderdate"] + (["o_totalprice"] if with_cents else [])
    orders = _read(sf_dir, "orders", cols)

    def prep(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column("o_orderdate"), pa.int64())
        out = {
            "o_orderkey": b.column("o_orderkey"),
            "_start": s,
            "_end": pc.add(s, 7 * US_PER_DAY),
        }
        if with_cents:
            out["cents"] = pc.cast(
                pc.floor(pc.multiply(b.column("o_totalprice"), 100.0)), pa.int64()
            )
        return pa.table(out)

    return orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)


def _q_ship_window_value(sf_dir: str):
    """Range join, per-point weighted: for every lineitem ship event,
    the total value (integer cents — SQL-exact) of ALL orders placed
    within the 7 days up to the ship date. Bucket-replicated interval
    join with prefix-sum stabbing kernels — pairs never enumerated."""
    from pdf_table_extractor_ray.stages.intervals import US_PER_DAY, count_matches_per_point

    points = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_shipdate"])
    return count_matches_per_point(
        points,
        _interval_orders(sf_dir, with_cents=True),
        point_col="l_shipdate",
        start_col="_start",
        end_col="_end",
        bucket_width=7 * US_PER_DAY,
        point_cols=("l_orderkey", "l_linenumber"),
        weight_col="cents",
        out_col="week_order_value_cents",
    )


def _q_order_week_shipments(sf_dir: str):
    """Range join, per-interval count: shipments (any order's) landing
    inside each order's first week — LEFT semantics, 0 for quiet
    weeks. Per-bucket partials → one small keyed groupby-sum."""
    from pdf_table_extractor_ray.stages.intervals import US_PER_DAY, count_points_per_interval

    points = _read(sf_dir, "lineitem", ["l_shipdate"])
    return count_points_per_interval(
        points,
        _interval_orders(sf_dir, with_cents=False),
        point_col="l_shipdate",
        start_col="_start",
        end_col="_end",
        bucket_width=7 * US_PER_DAY,
        interval_keys=("o_orderkey",),
        out_col="n_shipments",
    )


def _q_ship_week_pairs(sf_dir: str):
    """Enumerated range join (one month of ship events × order week
    windows): every (lineitem, order) pair with the ship date inside
    [o_orderdate, o_orderdate+7d)."""
    from datetime import date

    from pdf_table_extractor_ray.stages.intervals import US_PER_DAY, interval_join

    lo = (date(1995, 1, 1) - date(1970, 1, 1)).days * US_PER_DAY
    hi = (date(1995, 2, 1) - date(1970, 1, 1)).days * US_PER_DAY

    def in_jan95(b: pa.Table) -> pa.Table:
        t = pc.cast(b.column("l_shipdate"), pa.int64())
        return b.filter(pc.and_(pc.greater_equal(t, lo), pc.less(t, hi)))

    points = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_shipdate"]).map_batches(
        in_jan95, batch_format="pyarrow", zero_copy_batch=True
    )
    out = interval_join(
        points,
        _interval_orders(sf_dir, with_cents=False),
        point_col="l_shipdate",
        start_col="_start",
        end_col="_end",
        bucket_width=7 * US_PER_DAY,
        point_cols=("l_orderkey", "l_linenumber"),
        interval_cols=("o_orderkey",),
    )
    return out.select_columns(["l_orderkey", "l_linenumber", "o_orderkey"])


def _q_jaccard_pairs(sf_dir: str):
    """EXACT n-gram Jaccard similarity pairs (distributed inverted
    index) over the deterministic 25% content-hash sample — the
    exact-resemblance complement to minhash_pairs, with a full SQL
    oracle. Threshold is corpus-tuned: this synthetic corpus has no
    clones, so 0.02 exposes the real tail of the resemblance
    distribution (top pair ≈ 0.037 at sf0.01)."""
    from pdf_table_extractor_ray.stages.dedup import ngram_jaccard_pairs, sample_by_content_hash

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    sample = sample_by_content_hash(docs)
    return ngram_jaccard_pairs(sample, width=3, threshold=0.02)


def _q_containment_pairs(sf_dir: str):
    """EXACT n-gram CONTAINMENT pairs (|∩| / min(|A|,|B|)) over the
    same sample — the asymmetric near-superset detector Jaccard
    misses (a quote embedded in a longer page scores 1.0). Same
    inverted-index plan, different edge score."""
    from pdf_table_extractor_ray.stages.dedup import ngram_jaccard_pairs, sample_by_content_hash

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    sample = sample_by_content_hash(docs)
    return ngram_jaccard_pairs(
        sample, width=3, threshold=0.05, metric="containment"
    )


_BM25_TERMS = ("hash", "vector", "window")


def _q_bm25_top10(sf_dir: str):
    """BM25 keyword search (Okapi/Lucene variant): two streaming
    passes — per-block (n_docs, total_len, df) partials reduced by one
    Dataset.sum, then fully-vectorized per-batch scoring — and a
    k-bounded top-k. Ids/ranks only (float scores are ulp-sensitive
    across engines; ordering is the product)."""
    from pdf_table_extractor_ray.stages.search import bm25_topk

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return bm25_topk(docs, _BM25_TERMS, k=10)


def _q_user_value_ffill(sf_dir: str):
    """Per-user forward fill (last_value IGNORE NULLS running window):
    error events' values are nulled, then each row takes its user's
    most recent surviving value. One user-bucket shuffle, one
    composite-key maximum.accumulate per bucket — no per-user Python."""
    from pdf_table_extractor_ray.stages.sessions import grouped_ffill

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts", "value"])

    def nullify(b: pa.Table) -> pa.Table:
        v = pc.if_else(
            pc.equal(b.column("event_type"), "error"),
            pa.scalar(None, pa.float64()),
            pc.cast(b.column("value"), pa.float64()),
        )
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "value": v,
            }
        )

    return grouped_ffill(
        ev.map_batches(nullify, batch_format="pyarrow", zero_copy_batch=True),
        "value",
    )


def _q_weighted_source_sample(sf_dir: str):
    """Per-source weighted sampling without replacement (Efraimidis-
    Spirakis keys from a seeded hash): 8 docs per source, inclusion ∝
    n_chars. SQL-hash-verified: the draw key replays bit-exactly in
    DuckDB (splitmix64 HUGEINT emulation + the same IEEE-order
    ``-ln(u)/w``); selection-rule parity additionally in pytest."""
    from pdf_table_extractor_ray.stages.dedup import weighted_group_sample

    docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    return weighted_group_sample(
        docs, "source", "n_chars", k=8, id_col="doc_id", seed=7
    )


def _q_pii_inventory(sf_dir: str):
    """Per-source PII incidence audit (docs scanned / docs with hits /
    total hits for the scrubber's pattern): one RE2 count pass per
    batch, slim groupby-Sum."""
    from pdf_table_extractor_ray.stages.semistructured import pii_inventory

    docs = _read(sf_dir, "documents", ["source", "text"])
    return pii_inventory(docs)


def _q_token_entropies(sf_dir: str):
    """Per-doc unigram Shannon entropy in milli-nats (the one-number
    repetitiveness signal): map-only, vectorized, empty docs −1
    in-band. SQL-hash-verified: the ⌊1000·H⌋ milli-nat floor leaves
    ~1e9× slack over ln/summation-order ulps, so the DuckDB replay of
    ln(dl) − Σ tf·ln(tf)/dl matches exactly (verified at all three sf
    scales); brute parity additionally in pytest."""
    from pdf_table_extractor_ray.stages.textstats import token_entropies

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return token_entropies(docs)


def _q_user_mode_event(sf_dir: str):
    """Grouped MODE: each user's most frequent event type (count desc,
    type asc tiebreak). Per-batch (user, type) pre-count combiner, one
    slim groupby-Sum, hot-key-safe grouped top-1 — events never
    shuffle."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.topk import grouped_top_k

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def precount(b: pa.Table) -> pa.Table:
        t = (
            b.drop_null()
            .group_by(["user_id", "event_type"])
            .aggregate([("event_type", "count")])
        )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "n_part": pc.cast(t.column("event_type_count"), pa.int64()),
            }
        )

    counts = (
        ev.map_batches(precount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "event_type"])
        .aggregate(Sum("n_part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "event_type": b.column("event_type"),
                "n": pc.cast(b.column("sum(n_part)"), pa.int64()),
            }
        )

    return grouped_top_k(
        counts.map_batches(finish, batch_format="pyarrow"),
        "user_id",
        [("n", "descending"), ("event_type", "ascending")],
        1,
    )


def _q_latest_event_per_user(sf_dir: str):
    """LAST_VALUE per key: each user's most recent event (ts desc,
    event_id desc tiebreak) via the hot-key-safe grouped top-k — every
    block pre-reduces to one candidate per user before the shuffle."""
    from pdf_table_extractor_ray.stages.topk import grouped_top_k

    ev = _read(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])

    def ts_i64(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "ts_us": pc.cast(b.column("ts"), pa.int64()),
            }
        )

    top = grouped_top_k(
        ev.map_batches(ts_i64, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        [("ts_us", "descending"), ("event_id", "descending")],
        k=1,
    )

    def slim(b: pa.Table) -> pa.Table:
        return b.select(["user_id", "event_id", "event_type"])

    return top.map_batches(slim, batch_format="pyarrow")


def _q_top_anchor_texts(sf_dir: str):
    """Most common (target href, anchor text) pairs across the crawl —
    the anchor-text corpus search engines weight; pre-counted partial
    top-k over the outlink explode."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.pipelines.extract import read_pages
    from pdf_table_extractor_ray.stages.links import extract_outlinks
    from pdf_table_extractor_ray.stages.topk import global_top_k

    links = extract_outlinks(
        read_pages(_fixture_pages(sf_dir), columns=("url", "html"))
    )

    def precount(b: pa.Table) -> pa.Table:
        t = (
            b.select(["href", "anchor"])
            .group_by(["href", "anchor"])
            .aggregate([("anchor", "count")])
        )
        return pa.table(
            {
                "href": t.column("href"),
                "anchor": t.column("anchor"),
                "n_part": pc.cast(t.column("anchor_count"), pa.int64()),
            }
        )

    agg = (
        links.map_batches(precount, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["href", "anchor"])
        .aggregate(Sum("n_part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "href": b.column("href"),
                "anchor": b.column("anchor"),
                "n": pc.cast(b.column("sum(n_part)"), pa.int64()),
            }
        )

    return global_top_k(
        agg.map_batches(finish, batch_format="pyarrow"),
        [("n", "descending"), ("href", "ascending"), ("anchor", "ascending")],
        15,
    )


def _q_top_transitions(sf_dir: str):
    """Top event-type transitions (Markov edge counts): per-user
    (ts, event_id)-ordered adjacency via one user-bucket shuffle +
    vectorized same-user mask; ≤ vocab² rows reduce; partial top-k."""
    from pdf_table_extractor_ray.stages.sessions import top_transitions

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    return top_transitions(ev, k=10)


def _q_top_transitions3(sf_dir: str):
    """Top event-type TRIGRAMS (3-step sequence mining): same bucket
    plan as top_transitions with a both-adjacent same-user mask and
    V³ code packing; ≤ observed-vocab³ rows reduce; partial top-k."""
    from pdf_table_extractor_ray.stages.sessions import top_transitions3

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    return top_transitions3(ev, k=10)


def _q_retention_cohorts(sf_dir: str):
    """Weekly cohort retention: cohort = each user's first active
    week; per (cohort, offset) the count of cohort users active that
    many weeks later. One user-bucket shuffle of distinct (user, week)
    pairs; raw events never move."""
    from pdf_table_extractor_ray.stages.sessions import retention_cohorts

    ev = _read(sf_dir, "events", ["user_id", "ts"])
    return retention_cohorts(ev)


def _q_docs_with_terms(sf_dir: str):
    """Boolean AND retrieval (the filter half of the search stack):
    docs containing every query term, with per-term tf columns —
    map-only vectorized tf matrix, zero shuffle."""
    from pdf_table_extractor_ray.stages.search import docs_with_all_terms

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs_with_all_terms(docs, _BM25_TERMS)


def _q_join_overlap_estimate(sf_dir: str):
    """Pre-join cardinality probe: HLL distinct keys per side + merged
    union + inclusion-exclusion intersection for orders.o_custkey vs
    customer.c_custkey — one 4 KB register row per block, no shuffle.
    Rows-only (sketch); accuracy vs exact in pytest."""
    from pdf_table_extractor_ray.stages.sketches import join_overlap_estimate

    orders = _read(sf_dir, "orders", ["o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey"])
    return join_overlap_estimate(orders, "o_custkey", cust, "c_custkey")


def _q_orderkey_skew_stats(sf_dir: str):
    """Shuffle-key skew diagnostic for lineitem.l_orderkey (the
    numbers that pick plain vs salted vs broadcast join and size
    bucket counts): pre-counted (key, n) groupby, slim aggregates,
    exact median key mass via radix selection."""
    from pdf_table_extractor_ray.stages.stats import key_skew_stats

    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    return key_skew_stats(li, "l_orderkey")


def _q_value_outliers_mad(sf_dir: str):
    """Robust per-type outlier stats (median / MAD / |x−med| > 3·MAD
    count): bounded-key map_groups (5 event types by contract),
    DuckDB-interpolation-compatible medians so the float columns
    hash-match bit-for-bit."""
    from pdf_table_extractor_ray.stages.stats import grouped_mad_outliers

    ev = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_mad_outliers(ev, "event_type", "value", z=3.0)


def _q_order_price_range_parts(sf_dir: str):
    """Balanced range partitioning of order prices: quartile
    boundaries are EXACT order statistics from the radix-bisection
    selector (one slim-column materialization, ≤4096 driver rows per
    pass), buckets differ only by boundary-duplicate mass — the
    partitioner a skew-proof range shuffle keys on. Output is the
    (bucket, n) balance certificate."""
    from pdf_table_extractor_ray.stages.sketches import range_partition_counts

    orders = _read(sf_dir, "orders", ["o_totalprice"])
    return range_partition_counts(orders, "o_totalprice", n_parts=4)


def _q_uniform_source_cap(sf_dir: str):
    """Uniformly-random cap of 10 docs per source (seeded splitmix64
    replaces the random draw: rerun-stable, layout-invariant,
    hot-key-safe per-block pre-reduce). SQL-hash-verified via the
    bit-exact splitmix64 HUGEINT emulation (the hash IS the random
    oracle, so the draw is SQL after all); uniformity + determinism
    additionally in pytest."""
    from pdf_table_extractor_ray.stages.dedup import uniform_group_cap

    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    return uniform_group_cap(docs, "source", k=10, id_col="doc_id", seed=42)


def _q_event_funnel(sf_dir: str):
    """Sequential funnel view→click→purchase with earliest-completion
    chaining (strictly-after semantics): type filter at the map, one
    user-bucket shuffle, len(steps) masked minimum.at passes per
    bucket, tiny (step, n) reduce."""
    from pdf_table_extractor_ray.stages.sessions import funnel_counts

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    return funnel_counts(ev, ["view", "click", "purchase"])


def _q_dedup_keep_longest(sf_dir: str):
    """Priority-keep exact dedup: among byte-identical texts keep the
    LONGEST-metadata copy (n_chars desc, id asc) instead of the lowest
    id — the 'keep the best replica' policy real pipelines want.
    grouped_top_k pre-reduces each block to one candidate per text
    BEFORE the shuffle, so hot duplicate clusters never concentrate."""
    from pdf_table_extractor_ray.stages.topk import grouped_top_k

    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    top = grouped_top_k(
        docs,
        "text",
        [("n_chars", "descending"), ("doc_id", "ascending")],
        k=1,
    )

    def slim(b: pa.Table) -> pa.Table:
        return b.select(["doc_id", "n_chars"])

    return top.map_batches(slim, batch_format="pyarrow")


def _q_compression_ratios(sf_dir: str):
    """zlib compression-ratio quality signal per document (templated
    spam compresses far below prose): map-only pass, integer milli-
    ratio, empty/null docs flagged -1 in-band. Rows-only (zlib isn't
    SQL); determinism + known-text oracles in pytest."""
    from pdf_table_extractor_ray.stages.textstats import compression_ratios

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return compression_ratios(docs)


def _q_priority_quantity_salted(sf_dir: str):
    """Fact⋈fact join under the SKEW plan: lineitem joins orders on a
    salted key ((l_orderkey, salt), orders replicated salt×) so a hot
    order key spreads over 8 aggregator partitions; result is provably
    identical to the unsalted join, which is what the oracle checks.
    Integer-cents pre-reduce after the join keeps the groupby slim."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import salted_hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    j = salted_hash_join(li, orders, on="l_orderkey", right_on="o_orderkey", salt=8)

    def pre(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity")
        mask = pc.is_valid(q)
        b = b.filter(mask)
        cents = pc.cast(
            pc.floor(pc.multiply(b.column("l_quantity"), pa.scalar(100.0))),
            pa.int64(),
        )
        t = pa.table(
            {"o_orderpriority": b.column("o_orderpriority"), "c": cents}
        ).group_by("o_orderpriority").aggregate([("c", "sum")])
        return pa.table(
            {
                "o_orderpriority": t.column("o_orderpriority"),
                "part": pc.cast(t.column("c_sum"), pa.int64()),
            }
        )

    agg = (
        j.map_batches(pre, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority")
        .aggregate(Sum("part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": b.column("o_orderpriority"),
                "qty_cents": pc.cast(b.column("sum(part)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_label_centroids(sf_dir: str):
    """Per-label embedding centroid mass (class-centroid primitive):
    integer-micro component sums + member counts per (label, dim) —
    block-order deterministic, SQL-exact. One np.add.at scatter per
    batch; only slim (label, dim, int, int) partials shuffle."""
    from pdf_table_extractor_ray.stages.similarity import grouped_centroids

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])
    return grouped_centroids(ds)


def _q_value_median_exact(sf_dir: str):
    """EXACT median of event values at unbounded distinct cardinality:
    radix-bisection selection (6 histogram passes over a materialized
    slim uint64 column, ≤4096 driver rows per pass) — no sort, no
    bounded-distinct contract. The lower median ((n+1)//2) so odd/even
    corpora both pick a real element."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.sketches import kth_smallest

    ev = _read(sf_dir, "events", ["value"])

    def nvalid(b: pa.Table) -> pa.Table:
        return pa.table(
            {"n": pa.array([b.column("value").length() - b.column("value").null_count], pa.int64())}
        )

    n = int(
        ev.map_batches(nvalid, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("n"))["sum(n)"]
    )
    v = kth_smallest(ev, "value", k=(n + 1) // 2)
    return pa.table({"kth": pa.array([v], pa.float64())})


def _q_events_union_by_name(sf_dir: str):
    """UNION ALL BY NAME over schema-drifted projections (the
    multi-vintage-shard case): two event projections with different
    column sets concatenate with typed-null fill and first-seen column
    order. Metadata-only schema negotiation; per-input zero-copy
    align map; no shuffle."""
    from pdf_table_extractor_ray.stages.setops import union_by_name

    a = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    b = _read(sf_dir, "events", ["event_id", "event_type"])
    return union_by_name([a, b])


def _q_value_histogram(sf_dir: str):
    """Exact fixed-width histogram of event values (5-unit bins over
    integer cents): per-block np.unique partials, one slim (bin, n)
    groupby-Sum. Null-safe via Arrow validity before the int cast."""
    from pdf_table_extractor_ray.stages.sketches import fixed_width_histogram

    ev = _read(sf_dir, "events", ["value"])
    return fixed_width_histogram(ev, "value", scale=100, width=500)


def _q_pmi_collocations(sf_dir: str):
    """Top-50 bigram collocations by integer-exact micro-PMI
    (floor(1e6·c_xy·N/(c_x·c_y)), a monotone transform of PMI so the
    ranking is exact with zero float ops). Count tables are per-batch
    value-count partials + groupby-Sum; support floor BEFORE the two
    hash-shuffle unigram lookups (no vocab broadcast); partial top-k
    merge, no global sort."""
    from pdf_table_extractor_ray.stages.lm import pmi_collocations

    docs = _read(sf_dir, "documents", ["text"])
    return pmi_collocations(docs, min_count=20, k=50)


def _q_inverted_index(sf_dir: str):
    """Inverted-index construction: one row per (token, doc-segment)
    with segment df and a doc-ordered ``doc:tf`` postings string.
    Segmenting by ``doc_id // seg_size`` bounds every postings row —
    the stopword-proof document-partitioned layout. One slim
    (token, doc, tf) shuffle; postings built vectorized per
    token-hash bucket (lexsort + Arrow binary_join)."""
    from pdf_table_extractor_ray.stages.search import inverted_index

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return inverted_index(docs, seg_size=128)


def _q_top_tokens(sf_dir: str):
    """Corpus wordcount → exact top-50 heavy hitters: per-batch
    (token, n) value-count partials (the combiner), one token
    groupby-sum, then a partial top-k merge (``global_top_k``) — no
    global sort of the distinct-token table (billions of rows on a web
    corpus; only 50·blocks slim rows cross the merge exchange)."""
    from pdf_table_extractor_ray.stages.lm import train_token_counts
    from pdf_table_extractor_ray.stages.topk import global_top_k

    docs = _read(sf_dir, "documents", ["text"])
    counts = train_token_counts(docs)
    return global_top_k(
        counts, [("n", "descending"), ("token", "ascending")], 50
    )


def _q_frequent_users_sketch(sf_dir: str):
    """Mergeable heavy-hitter sketch (per-block exact top-m + residual
    bound): top-10 users by event count. SQL-exact HERE because every
    block holds ≤ m distinct users (bt=0 ⇒ est is exact, err=0); the
    >m approximate regime is covered by the zipf bound test."""
    from pdf_table_extractor_ray.stages.sketches import heavy_hitters

    ev = _read(sf_dir, "events", ["user_id"])
    return heavy_hitters(ev, "user_id", k=10, m=256)


def _q_frequent_users_by_type(sf_dir: str):
    """Per-key heavy hitters (GROUP BY + top-k frequent in one pass):
    top-5 users per event_type. SQL-exact here because per-block
    distinct users per type ≤ m (bt=0 ⇒ err=0); the approximate
    regime is bound-tested in pytest."""
    from pdf_table_extractor_ray.stages.sketches import heavy_hitters_by

    ev = _read(sf_dir, "events", ["event_type", "user_id"])
    out = heavy_hitters_by(ev, "event_type", "user_id", k=5, m=4096)

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["event_type", "item", "est", "err"])

    return out.map_batches(rename, batch_format="pyarrow")


def _q_order_price_quantiles_approx(sf_dir: str):
    """Histogram-sketch quantiles over order prices: Min/Max pass +
    slim (bin, cnt) partial shuffle; ≤ bins rows to the driver; value
    error ≤ one bin width (bracket test asserts it). Rows-only: the
    lo/hi edges are linspace floats with no SQL twin."""
    from pdf_table_extractor_ray.stages.sketches import approx_quantiles

    orders = _read(sf_dir, "orders", ["o_totalprice"])
    return approx_quantiles(
        orders, "o_totalprice", (0.25, 0.5, 0.75, 0.9, 0.99), bins=4096
    )


def _day_col(ds, src: str):
    return ds.map_batches(
        lambda b: pa.table({"day": b.column(src)}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _q_active_ship_days(sf_dir: str):
    """Distinct set INTERSECT (days with both an order placed and a
    shipment): slim tagged union + one groupby — never a join."""
    from pdf_table_extractor_ray.stages.setops import distinct_intersect

    ship = _day_col(_read(sf_dir, "lineitem", ["l_shipdate"]), "l_shipdate")
    order = _day_col(_read(sf_dir, "orders", ["o_orderdate"]), "o_orderdate")
    return distinct_intersect(ship, order, ["day"])


def _q_quiet_ship_days(sf_dir: str):
    """Distinct set EXCEPT: ship days on which no order was placed."""
    from pdf_table_extractor_ray.stages.setops import distinct_except

    ship = _day_col(_read(sf_dir, "lineitem", ["l_shipdate"]), "l_shipdate")
    order = _day_col(_read(sf_dir, "orders", ["o_orderdate"]), "o_orderdate")
    return distinct_except(ship, order, ["day"])


def _q_revenue_rollup(sf_dir: str):
    """GROUP BY ROLLUP(region, nation): the Q5-flavor join pre-reduces
    to integer cents at the finest level once; region subtotals and the
    grand total re-aggregate that materialized base (no second corpus
    pass). Null level columns mark rolled-up rows, as in SQL."""
    from pdf_table_extractor_ray.stages.joins import broadcast_join
    from pdf_table_extractor_ray.stages.setops import rollup_sum

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])

    j = broadcast_join(li, orders, key="l_orderkey", build_key="o_orderkey")
    j = broadcast_join(j, cust, key="o_custkey", build_key="c_custkey")
    j = broadcast_join(j, nation, key="c_nationkey", build_key="n_nationkey")
    j = broadcast_join(j, region, key="n_regionkey", build_key="r_regionkey")

    def cents(b: pa.Table) -> pa.Table:
        price = _nn(b.column("l_extendedprice"))
        disc = _nn(b.column("l_discount"))
        c = np.floor(price * (1 - disc) * 100).astype(np.int64)
        return pa.table(
            {"r_name": b.column("r_name"), "n_name": b.column("n_name"), "cents": c}
        )

    rolled = rollup_sum(
        j.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ["r_name", "n_name"],
        "cents",
    )
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "r_name": b.column("r_name"),
                "n_name": b.column("n_name"),
                "revenue": pc.divide(pc.cast(b.column("cents"), pa.float64()), 100.0),
            }
        ),
        batch_format="pyarrow",
    )


def _q_stratified_doc_sample(sf_dir: str):
    """Per-stratum deterministic rate sampling (the web-pipeline
    downsample-by-language step): keep rate depends on ``lang`` via
    md5(text) hex-prefix buckets — reproducible across runs, cluster
    sizes and row orders, no window function needed."""
    from pdf_table_extractor_ray.stages.dedup import stratified_sample

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return stratified_sample(
        docs,
        stratum_col="lang",
        rates={"en": ("0", "1"), "pt": ("0", "1", "2", "3", "4", "5", "6", "7")},
        default=("0", "1", "2", "3"),
    ).select_columns(["doc_id", "lang"])


def _q_capped_docs_per_source(sf_dir: str):
    """Per-domain document cap (the web-pipeline "≤ k pages per
    registrable domain" step): keep the 10 docs per source that rank
    first by (md5(text), doc_id) — a deterministic, content-stable
    pick, not a head() of arbitrary block order. Hot-key-safe grouped
    top-k: each batch pre-reduces to ≤ k rows per source before the
    shuffle (stages/topk.py:grouped_top_k), so a 10^9-page domain
    never materializes as one group."""
    from pdf_table_extractor_ray.stages.dedup import add_md5_batch
    from pdf_table_extractor_ray.stages.topk import grouped_top_k

    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    with_md5 = docs.map_batches(
        add_md5_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    capped = grouped_top_k(
        with_md5,
        key_col="source",
        sort_keys=[("content_md5", "ascending"), ("doc_id", "ascending")],
        k=10,
    )
    return capped.select_columns(["source", "doc_id"])


def _q_orders_upsert(sf_dir: str):
    """CDC merge: a deterministic 'update feed' (every 7th order,
    doubled price; every 14th carries a STALE version that must lose)
    upserted into the orders snapshot — per key the highest version
    wins, updates win ties. One bucket shuffle, vectorized winner
    resolution (stages/setops.py:merge_upsert)."""
    from pdf_table_extractor_ray.stages.setops import merge_upsert

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def as_base(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_totalprice": b.column("o_totalprice"),
                "version": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
            }
        )

    def as_updates(b: pa.Table) -> pa.Table:
        k = b.column("o_orderkey").to_numpy()
        sel = k % 7 == 0
        k = k[sel]
        price = b.column("o_totalprice").to_numpy(zero_copy_only=False)[sel] * 2
        version = np.where(k % 14 == 0, 0, 2).astype(np.int64)  # stale vs fresh
        return pa.table(
            {
                "o_orderkey": pa.array(k, pa.int64()),
                "o_totalprice": pa.array(price, pa.float64()),
                "version": pa.array(version, pa.int64()),
            }
        )

    base = orders.map_batches(as_base, batch_format="pyarrow", zero_copy_batch=True)
    upd = orders.map_batches(as_updates, batch_format="pyarrow", zero_copy_batch=True)
    return merge_upsert(base, upd, "o_orderkey", "version")


def _q_tfidf_top3(sf_dir: str):
    """Per-doc top-3 TF-IDF terms (score = tf·ln(N/df), ties → term
    asc). df is a vocab-sized streaming aggregate broadcast once;
    scoring is map-only and float-op-order-matched to the oracle."""
    from pdf_table_extractor_ray.stages.search import tfidf_top_terms

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return tfidf_top_terms(docs, k=3)


def _q_revenue_cube(sf_dir: str):
    """GROUP BY CUBE(l_returnflag, l_linestatus) over integer cents:
    all four grouping sets derived from ONE corpus shuffle to the
    finest (flag, status) level — coarser sets re-aggregate the
    materialized base (stages/setops.py:grouping_sets_sum)."""
    from pdf_table_extractor_ray.stages.setops import cube_sum

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_extendedprice"])

    def cents(b: pa.Table) -> pa.Table:
        c = np.floor(_nn(b.column("l_extendedprice")) * 100).astype(np.int64)
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "cents": c,
            }
        )

    return cube_sum(
        li.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        ["l_returnflag", "l_linestatus"],
        "cents",
    )


def _q_event_gaps(sf_dir: str):
    """Per-user lead/lag: microseconds since the user's previous event
    (NULL for the first). One shuffle by user-id BUCKET (not per-user
    groups): each map_groups call handles a whole bucket of users and
    computes every gap with one lexsort + one vectorized diff — no
    per-user Python."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def bucketize(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column("bucket", pa.array((u % 64).astype(np.int64), pa.int64()))

    def gaps(g: pa.Table) -> pa.Table:
        ts = pc.cast(g.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        su, st, se = uid[order], ts[order], eid[order]
        gap = np.empty(len(st), np.int64)
        gap[1:] = st[1:] - st[:-1]
        first = np.empty(len(st), bool)
        first[0] = True
        first[1:] = su[1:] != su[:-1]
        gap[first] = 0  # masked below; keep the buffer defined
        return pa.Table.from_arrays(
            [
                pa.array(se.astype(np.int64)),
                pa.array(su.astype(np.int64)),
                pa.array(st),
                pa.array(gap, pa.int64(), mask=first),  # first event → NULL
            ],
            names=["event_id", "user_id", "ts_us", "gap_us"],
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(gaps, batch_format="pyarrow")
    )


def _q_chunk_dedup_docs(sf_dir: str):
    """Corpus-wide exact chunk (paragraph-analog) dedup with per-doc
    reassembly — CCNet-style: keep the first (doc_id, chunk_idx)
    occurrence of each distinct 10-token chunk, rebuild each doc from
    its surviving chunks. Two partition-level shuffles, vectorized
    bucket kernels (stages/chunks.py)."""
    from pdf_table_extractor_ray.stages.chunks import chunk_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return chunk_dedup(docs)


def _q_dup_span_stats(sf_dir: str):
    """ExactSubstr-flavored duplicated-span stats: per doc, how many
    token positions are covered by an 8-token shingle occurring >= 2
    times anywhere in the corpus (Lee et al. 2022 approximated at the
    shingle level). Shuffles carry (hash, doc, pos) int64 rows only —
    never text; both wide steps are bucket-vectorized
    (stages/substrings.py). Docs with zero duplication are restored by
    sentinel roster rows riding the doc-bucket shuffle (no join)."""
    from pdf_table_extractor_ray.stages.substrings import dup_span_stats

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    ids = _read(sf_dir, "documents", ["doc_id"])
    return dup_span_stats(docs, n=8, ids=ids)


def _q_dup_span_clean(sf_dir: str):
    """ExactSubstr-style span REMOVAL: rebuild each doc's text with
    tokens covered by non-canonical duplicated-shingle occurrences
    dropped (one copy of each duplicated run survives, at the
    shingle's min (doc_id,pos) occurrence). Text rides the doc-bucket
    shuffle exactly once as the reassembly payload."""
    from pdf_table_extractor_ray.stages.substrings import dup_span_clean

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dup_span_clean(docs, n=8)


def _q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training: the first 10 learned merges
    over the documents corpus (rows-only: iterative algorithm, no SQL
    form; pytest gates exact merge-sequence parity vs a sequential
    reference implementation)."""
    from pdf_table_extractor_ray.stages.bpe import bpe_merge_table

    docs = _read(sf_dir, "documents", ["text"])
    return bpe_merge_table(docs, n_merges=10)


def _q_orders_profile(sf_dir: str):
    """ANALYZE-style one-pass table profile of orders: per column, row
    and null counters, HLL approximate distinct, numeric/lexicographic
    min-max (stages/profile.py — the catalog-statistics pass before
    planning over an unknown table). One row per COLUMN (bounded by
    schema). Rows-only (HLL estimates have no SQL form); exact
    counters/min-max + HLL accuracy + layout invariance tested in
    test_profile."""
    from pdf_table_extractor_ray.stages.profile import table_profile

    # all columns read on purpose: profiling IS the whole-schema scan
    return table_profile(_read(sf_dir, "orders", None))


def _q_bpe_token_counts(sf_dir: str):
    """Tokenizer APPLICATION at corpus scale: learn a 10-merge BPE
    ladder, then encode every document with it through the BpeEncoder
    actor pool (vectorized ladder fold over each batch's DISTINCT
    words — Zipf collapse — then scatter back). The post-training
    tokenize pass of a pretraining pipeline. Rows-only (depends on the
    learned ladder); sequential-encode parity tested in test_bpe."""
    from pdf_table_extractor_ray.stages.bpe import bpe_encode_lengths, learn_bpe

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = learn_bpe(docs, n_merges=10)
    return bpe_encode_lengths(docs, merges)


def _q_gopher_quality(sf_dir: str):
    """Gopher-style per-doc repetition stats (dup-word fraction,
    top-word char fraction, dup-bigram fraction) — map-only,
    bit-exact float fractions vs the SQL oracle."""
    from pdf_table_extractor_ray.stages.chunks import gopher_stats_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(gopher_stats_batch, batch_format="pyarrow", zero_copy_batch=True)


def _q_model_quality_by_source(sf_dir: str):
    """Batched MODEL INFERENCE through the actor pool: a hashed
    bag-of-words linear quality classifier (md5-derived integer token
    weights, so DuckDB reproduces scoring bit-exactly) scores every
    document — weights cached per actor across batches, per-batch
    scoring one np.unique + gather + segment-sum — then one slim
    per-source rollup: docs / scored / passing / exact score mass.
    Map-only inference, NO shuffle of text."""
    from pdf_table_extractor_ray.stages.classifier import (
        quality_report_by_source,
        score_documents,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    return quality_report_by_source(score_documents(docs))


def _q_contamination_screen(sf_dir: str):
    """Benchmark-decontamination screen: per-doc count of 10-token
    chunks that appear in the 'benchmark' subset (docs with
    doc_id % 41 == 0 stand in for a held-out eval suite). The
    benchmark chunk set is bounded by contract and broadcast once
    (ray.put); the probe is one vectorized is_in per batch."""
    import ray

    from pdf_table_extractor_ray.stages.chunks import benchmark_chunk_set, contamination_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def is_bench(batch):  # vectorized predicate, no per-row filter fn
        doc = batch.column("doc_id").to_numpy()
        return batch.filter(pa.array(doc % 41 == 0))

    bench = benchmark_chunk_set(docs.map_batches(is_bench, batch_format="pyarrow", zero_copy_batch=True))
    handle = ray.put(bench)

    def probe(batch):
        return contamination_batch(batch, ray.get(handle))

    return docs.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def _q_contamination_screen_bloom(sf_dir: str):
    """Bloom-filter decontamination screen: same benchmark subset as
    contamination_screen, but the membership structure is a fixed
    128 KiB bitmap instead of the exact chunk set — the shape that
    still broadcasts when the benchmark set has 10^9 n-grams. Zero
    false negatives by construction; rows-only (false positives are
    probabilistic), with superset-vs-exact and FP-rate tests."""
    import ray

    from pdf_table_extractor_ray.stages.bloom import bloom_from_values
    from pdf_table_extractor_ray.stages.chunks import benchmark_chunk_set, contamination_bloom_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def is_bench(batch):
        doc = batch.column("doc_id").to_numpy()
        return batch.filter(pa.array(doc % 41 == 0))

    bench = benchmark_chunk_set(
        docs.map_batches(is_bench, batch_format="pyarrow", zero_copy_batch=True)
    )
    handle = ray.put(bloom_from_values(bench))

    def probe(batch):
        return contamination_bloom_batch(batch, ray.get(handle))

    return docs.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)


def _q_contamination_screen_join(sf_dir: str):
    """Decontamination with NO broadcast — the plan for a benchmark
    set too large to ship to workers at all: chunk both sides, dedup
    benchmark chunks with a slim groupby, hash-shuffle LEFT SEMI join
    on the chunk string, assemble per-doc counts with two more slim
    groupbys. Same rows as contamination_screen (one shared SQL-exact
    oracle), different 100-TB plan — the adaptive pair, like
    drop_by_ids' broadcast↔anti-join switch."""
    from pdf_table_extractor_ray.stages.chunks import contamination_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def is_bench(batch):
        doc = batch.column("doc_id").to_numpy()
        return batch.filter(pa.array(doc % 41 == 0))

    bench_docs = docs.map_batches(is_bench, batch_format="pyarrow", zero_copy_batch=True)
    return contamination_join(docs, bench_docs)


def _q_window_active_users(sf_dir: str):
    """Tumbling 1-hour windows over the event stream: total events +
    EXACT distinct users per window (the windowed COUNT DISTINCT
    primitive). Map-side (window,user) combiner → two slim int64
    groupbys; raw events never shuffle."""
    from pdf_table_extractor_ray.stages.sessions import tumbling_window_stats

    return tumbling_window_stats(_read(sf_dir, "events", ["ts", "user_id"]))


def _q_rolling_active_users(sf_dir: str):
    """Trailing 7-day rolling active users per data day — the sliding-
    window EXACT COUNT DISTINCT (stages/sessions.py
    sliding_window_distinct): distinct (day, user) pairs fan out to the
    7 windows they serve, one (window, user) Min-offset groupby folds
    duplicates and marks real data days, one slim count per window.
    Raw events never shuffle."""
    from pdf_table_extractor_ray.stages.sessions import sliding_window_distinct

    return sliding_window_distinct(_read(sf_dir, "events", ["ts", "user_id"]))


def _q_windowed_late_split(sf_dir: str):
    """Streaming-window semantics end-to-end: watermark/late tagging
    (late_events' arrival model) FEEDING a tumbling 1-hour event-time
    window that counts on-time vs late arrivals per window — the
    on-time-pane / late-side-output split a streaming engine's
    allowed-lateness trigger produces. One bucket shuffle for the
    tagging, slim (window, on_time, late) partials, one window
    groupby."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.sessions import tag_late_events

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def add_arrival(b: pa.Table) -> pa.Table:
        eid = b.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        arr = ((eid % 65536) * 2654435761) % 4294967296
        return b.append_column("arrival", pa.array(arr, pa.int64()))

    tagged = tag_late_events(
        ds.map_batches(add_arrival, batch_format="pyarrow", zero_copy_batch=True),
        arrival_col="arrival",
        emit_ts=True,
    )

    W = 3_600_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts_us").to_numpy(zero_copy_only=False)
        late = b.column("is_late").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "window_start_us": (ts // W) * W,
                "on_time": 1 - late,
                "late": late,
            }
        )
        return (
            pa.TableGroupBy(t, ["window_start_us"])
            .aggregate([("on_time", "sum"), ("late", "sum")])
            .rename_columns(["window_start_us", "on_time", "late"])
        )

    agg = (
        tagged.map_batches(partial, batch_format="pyarrow")
        .groupby("window_start_us")
        .aggregate(Sum("on_time"), Sum("late"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("window_start_us"),
                pc.cast(b.column("sum(on_time)"), pa.int64()),
                pc.cast(b.column("sum(late)"), pa.int64()),
            ],
            names=["window_start_us", "n_on_time", "n_late"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_window_active_users_approx(sf_dir: str):
    """HLL variant of window_active_users — the sketch path when
    per-window user cardinality makes even the (window,user) pair
    table expensive: each batch ships one 4 KB register row per window
    it touches; ONE groupby(window) max-merge. Rows-only (approximate);
    per-window accuracy asserted against the exact twin in tests."""
    from pdf_table_extractor_ray.stages.sketches import hll_count_distinct_by

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def win(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts = pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")), pa.int64())
        w = pc.multiply(pc.divide(ts, 3_600_000_000), 3_600_000_000)
        return pa.Table.from_arrays(
            [pc.cast(w, pa.int64()), batch.column("user_id")],
            names=["window_start_us", "user_id"],
        )

    tagged = ds.map_batches(win, batch_format="pyarrow", zero_copy_batch=True)
    return hll_count_distinct_by(tagged, "window_start_us", "user_id")


def _q_cdc_dup_stats(sf_dir: str):
    """Content-defined chunking dedup summary over raw crawl payloads
    (Rabin/FastCDC-style): shift-resistant boundaries from a rolling
    hash, FNV chunk hashes, slim (hash, len, n) reduction → the bytes
    a payload-level dedup would reclaim. Rows-only; boundary/shift
    properties brute-tested in pytest."""
    from pdf_table_extractor_ray.pipelines.extract import read_pages
    from pdf_table_extractor_ray.stages.cdc import cdc_dup_stats

    pages = _fixture_pages(sf_dir)
    return cdc_dup_stats(read_pages(pages, columns=("url", "html")))


def _q_page_metadata(sf_dir: str):
    """Crawl-index head fields per HTML page — title, meta
    description, canonical url (relative hrefs resolved), robots
    noindex/nofollow directives, og:title, html lang: one compiled-
    regex map pass with charset-sniffed decode, zero shuffle; non-HTML
    payloads contribute zero rows in-band. Rows-only (the fixture
    corpus isn't a SQL view); handcrafted-HTML + attr-order-invariance
    oracles in pytest."""
    from pdf_table_extractor_ray.pipelines.extract import read_pages
    from pdf_table_extractor_ray.stages.links import extract_page_metadata

    pages = _fixture_pages(sf_dir)
    return extract_page_metadata(read_pages(pages, columns=("url", "html")))


def _q_extract_outlinks(sf_dir: str):
    """Outlink/anchor extraction over the crawl corpus: one compiled-
    regex map pass, zero shuffle; non-HTML payloads (PDF magic,
    encrypted) contribute zero rows in-band. Rows-only (the fixture
    corpus isn't a SQL view); handcrafted-HTML oracle in pytest."""
    from pdf_table_extractor_ray.pipelines.extract import read_pages
    from pdf_table_extractor_ray.stages.links import extract_outlinks

    pages = _fixture_pages(sf_dir)
    return extract_outlinks(read_pages(pages, columns=("url", "html")))


def _q_warc_roundtrip(sf_dir: str):
    """WARC source end-to-end with a SQL oracle: documents → WARC/1.0
    shards (128 docs each, warcinfo header + HTTP 200 response
    records, sources/warc.py writer) → Content-Length-framed parse
    back to page rows → (doc_id, warc_ts_us, text), byte-identical.
    Shard grouping happens within each batch, so output is invariant
    to batching; WARC-Date is second-precision, and doc_id-derived
    timestamps are whole seconds, so the ts round-trips exactly."""
    from pdf_table_extractor_ray.sources.warc import (
        _EPOCH_US,
        parse_warc_batches,
        write_warc_bytes,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_warc(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        blobs = []
        for start in range(0, len(ids), 128):
            recs = [
                (
                    f"https://docs.test/{i}",
                    _EPOCH_US + i * 1_000_000,
                    ("" if t is None else t).encode("utf-8"),
                )
                for i, t in zip(ids[start : start + 128], texts[start : start + 128])
            ]
            # every other shard member-gzipped — the .warc.gz layout
            blobs.append(
                write_warc_bytes(
                    recs,
                    shard_id=int(ids[start]),
                    gzip_members=(start // 128) % 2 == 1,
                )
            )
        return pa.table({"warc": pa.array(blobs, pa.binary())})

    shards = ds.map_batches(to_warc, batch_format="pyarrow", zero_copy_batch=True)
    pages = parse_warc_batches(shards)

    def finish(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        doc_id = pa.array([int(u.rsplit("/", 1)[1]) for u in urls], pa.int64())
        text = pa.array(
            [p.decode("utf-8") for p in b.column("html").to_pylist()], pa.string()
        )
        return pa.Table.from_arrays(
            [doc_id, pc.cast(b.column("warc_ts"), pa.int64()), text],
            names=["doc_id", "warc_ts_us", "text"],
        )

    return pages.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_crawl_extract_wet(sf_dir: str):
    """The archive-to-archive composite (pipelines/crawl.py): fixture
    corpus → WARC shards (consumed-field payloads, faithful media
    types, every shard member-gzipped) → parse → media-type demux →
    warm-actor extraction → WET export → parsed extracted-text rows
    (url, n_chars). Entirely shuffle-free. Rows-only (the fixture
    corpus isn't a SQL view); byte-parity of the crawled path vs
    direct extraction AND of the WET payloads vs extracted_text is
    pinned in tests/test_crawl_pipeline.py."""
    from pdf_table_extractor_ray.pipelines.crawl import crawl_extract_wet, pages_to_warc
    from pdf_table_extractor_ray.pipelines.extract import read_pages
    from pdf_table_extractor_ray.sources.warc import parse_wet_batches

    pages = read_pages(_fixture_pages(sf_dir))
    wet = crawl_extract_wet(pages_to_warc(pages, gzip_members=True))

    def finish(b: pa.Table) -> pa.Table:
        n = pa.array([len(t or "") for t in b.column("text").to_pylist()], pa.int64())
        return pa.table({"url": b.column("url"), "n_chars": n})

    return parse_wet_batches(wet).map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def _q_latest_ok_fetch(sf_dir: str):
    """Re-crawl version selection with a SQL oracle — the archive
    dedup every multi-snapshot crawl needs: three fetch versions per
    URL land in WARC shards (day-apart timestamps; versions 1 and 2
    fail with 5xx/4xx on deterministic id classes), the standard
    admission filter keeps status-200 records, and ARGMAX-per-URL
    (stages/topk.py:keep_max_per_key — one fixed-bucket shuffle, one
    lexsort/run-boundary scan per bucket, no per-key Python) picks
    each document's newest good fetch, payload and all."""
    from pdf_table_extractor_ray.sources.warc import _EPOCH_US, parse_warc_batches, write_warc_bytes
    from pdf_table_extractor_ray.stages.topk import keep_max_per_key

    day_us = 86_400_000_000
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_warc(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        recs = []
        for i, t in zip(ids, texts):
            base = _EPOCH_US + i * 1_000_000
            body = "" if t is None else t
            recs.append((f"https://docs.test/{i}", base, f"v0:{body}".encode(), 200))
            recs.append(
                (f"https://docs.test/{i}", base + day_us, f"v1:{body}".encode(),
                 500 if i % 3 == 0 else 200)
            )
            recs.append(
                (f"https://docs.test/{i}", base + 2 * day_us, f"v2:{body}".encode(),
                 404 if i % 2 == 0 else 200)
            )
        blobs = [
            write_warc_bytes(recs[s : s + 128], shard_id=s)
            for s in range(0, len(recs), 128)
        ]
        return pa.table({"warc": pa.array(blobs, pa.binary())})

    pages = parse_warc_batches(
        ds.map_batches(to_warc, batch_format="pyarrow", zero_copy_batch=True)
    )

    def admit(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("http_status"), pa.scalar(200, pa.int32())))
        ids = pa.array(
            [int(u.rsplit("/", 1)[1]) for u in b.column("url").to_pylist()], pa.int64()
        )
        text = pa.array(
            [p.decode("utf-8") for p in b.column("html").to_pylist()], pa.string()
        )
        return pa.table(
            {"doc_id": ids, "ts_us": pc.cast(b.column("warc_ts"), pa.int64()), "text": text}
        )

    best = keep_max_per_key(
        pages.map_batches(admit, batch_format="pyarrow", zero_copy_batch=True),
        ["doc_id"],
        "ts_us",
    )

    def finish(b: pa.Table) -> pa.Table:
        return b.rename_columns(["doc_id", "best_ts_us", "text"])

    return best.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_polite_fetch_schedule(sf_dir: str):
    """Crawl-frontier politeness scheduling with a SQL oracle: every
    URL of a host gets a fetch SLOT — rank in (priority, key) order ×
    the host's crawl delay — so no host is hit faster than its delay
    whatever the cluster parallelism. One host-BUCKET shuffle (16
    groups whatever the host count); inside a bucket one lexsort +
    first-occurrence boundary scan ranks every host at once — the
    sessionize/rolling kernel family, no per-host Python."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    delay_us = 2_000_000
    epoch = 1_735_689_600_000_000

    def bucketize(b: pa.Table) -> pa.Table:
        h = b.column("o_custkey").to_numpy(zero_copy_only=False) % 50
        return b.append_column("h", pa.array(h.astype(np.int64))).append_column(
            "bucket", pa.array((h % 16).astype(np.int64))
        )

    def rank(g: pa.Table) -> pa.Table:
        h = g.column("h").to_numpy(zero_copy_only=False)
        key = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        date = pc.cast(g.column("o_orderdate"), pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((key, date, h))
        sh, sk = h[order], key[order]
        n = len(sh)
        idx = np.arange(n, dtype=np.int64)
        first = np.empty(n, bool)
        if n:
            first[0] = True
            first[1:] = sh[1:] != sh[:-1]
        start = np.maximum.accumulate(np.where(first, idx, 0))
        r = idx - start
        return pa.table(
            {
                "o_orderkey": pa.array(sk),
                "host": pa.array([f"h{int(x)}" for x in sh], pa.string()),
                "fetch_rank": pa.array(r),
                "scheduled_ts_us": pa.array(epoch + r * delay_us),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(rank, batch_format="pyarrow")
    )


def _q_doc_token_windows(sf_dir: str):
    """Sliding context-window explode with a SQL oracle — the
    overlap-stride chunking (W=32 tokens, stride 16) LLM training prep
    applies to long documents: per batch one whitespace split kernel
    (single-space semantics identical to DuckDB string_split,
    empties preserved), then a FULLY vectorized overlap gather —
    window count 1 + max(0, ⌈(len−W)/S⌉) per doc, global token
    indices from two arange-minus-repeat passes, one ``take``, one
    ListArray + binary_join. Overlapping windows cannot share one
    Arrow offsets buffer (offsets are contiguous by construction), so
    the gather duplicates ≤ W/S× token bytes — the same blow-up the
    written training set carries by design. Zero shuffle."""
    W, S = 32, 16
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b.column("text"), pattern=" ")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        lens = pc.fill_null(pc.list_value_length(parts), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        ids = _nn(b.column("doc_id"))
        nwin = np.where(lens > 0, 1 + np.maximum(0, (lens - W + S - 1) // S), 0)
        doc_rep = np.repeat(ids, nwin)
        total_w = int(nwin.sum())
        wstart_of_doc = np.cumsum(nwin) - nwin
        k = np.arange(total_w, dtype=np.int64) - np.repeat(wstart_of_doc, nwin)
        tok_base = np.repeat(np.cumsum(lens) - lens, nwin)  # flat offset of doc
        starts = k * S
        ends = np.minimum(starts + W, np.repeat(lens, nwin))
        sizes = ends - starts
        total_t = int(sizes.sum())
        flat_idx = (
            np.arange(total_t, dtype=np.int64)
            - np.repeat(np.cumsum(sizes) - sizes, sizes)
            + np.repeat(tok_base + starts, sizes)
        )
        flat = pc.list_flatten(parts)
        gathered = flat.take(pa.array(flat_idx))
        offsets = pa.array(np.r_[0, np.cumsum(sizes)].astype(np.int32))
        windows = pa.ListArray.from_arrays(offsets, gathered)
        return pa.table(
            {
                "doc_id": pa.array(doc_rep),
                "win_idx": pa.array(k),
                "window_text": pc.binary_join(windows, " "),
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def _q_mirror_url_groups(sf_dir: str):
    """Mirror detection over the archive index with a SQL oracle: the
    same payload served from different URLs/hosts is found WITHOUT
    touching payloads twice — group the CDX rows by content digest
    (sources/cdx.py carries the crc32 payload digest exactly so dedup
    can run on index rows alone; record length is NOT part of the key
    — it counts headers, so it differs between mirrors whose URLs
    differ in width). Fixture: every 3 consecutive doc ids
    share a payload across distinct hosts → (rep_doc_id = min id,
    n_urls) per mirror group, one slim groupby. Digest grouping is
    deterministic for the fixed corpus (crc32 collisions would show as
    a stable hash mismatch — none at any sf)."""
    from ray.data.aggregate import Count, Min

    from pdf_table_extractor_ray.sources.cdx import build_cdx
    from pdf_table_extractor_ray.sources.warc import _EPOCH_US, write_warc_bytes

    ds = _read(sf_dir, "documents", ["doc_id"])

    def to_warc(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        blobs = []
        for start in range(0, len(ids), 128):
            recs = [
                (
                    f"https://m{i % 7}.test/{i}",
                    _EPOCH_US + i * 1_000_000,
                    f"shared payload of group {i // 3}".encode(),
                )
                for i in ids[start : start + 128]
            ]
            blobs.append(write_warc_bytes(recs, shard_id=int(ids[start])))
        return pa.table({"warc": pa.array(blobs, pa.binary())})

    idx = build_cdx(ds.map_batches(to_warc, batch_format="pyarrow", zero_copy_batch=True))

    def slim(b: pa.Table) -> pa.Table:
        ids = pa.array(
            [int(u.rsplit("/", 1)[1]) for u in b.column("url").to_pylist()], pa.int64()
        )
        return pa.table({"digest": b.column("digest"), "doc_id": ids})

    agg = (
        idx.map_batches(slim, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("digest")
        .aggregate(Min("doc_id"), Count())
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pc.cast(b.column("min(doc_id)"), pa.int64()),
                pc.cast(b.column("count()"), pa.int64()),
            ],
            names=["rep_doc_id", "n_urls"],
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_doc_sentences(sf_dir: str):
    """Sentence EXPLODE with a SQL oracle — the segmentation step that
    turns documents into training records: one RE2
    ``split_pattern_regex`` kernel per batch (DuckDB's
    regexp_split_to_array is the same RE2 with identical edge
    semantics — verified: trailing terminators yield a final empty
    segment, null text yields no rows), then a fully vectorized
    flatten: doc ids repeat by list length, 1-based sentence ordinals
    from one arange minus repeated offsets. Zero shuffle; no Python
    loop."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern_regex(b.column("text"), pattern=r"[.!?\n]+\s*")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = pc.list_flatten(parts)  # null lists contribute nothing
        lens = pc.fill_null(pc.list_value_length(parts), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        ids = np.repeat(_nn(b.column("doc_id")), lens)
        total = int(lens.sum())
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        sidx = np.arange(total, dtype=np.int64) - starts + 1
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "sent_idx": pa.array(sidx),
                "sentence": flat,
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def _q_robots_sitemap_discovery(sf_dir: str):
    """Frontier seeding from robots.txt with a SQL oracle
    (stages/robots.py:parse_robots_sitemaps): one robots.txt per
    customer host carrying rule noise plus ``Sitemap:`` directives
    (two for even keys, one for odd — sitemaps.org group-independent
    placement, one deliberately inside an agent group), exploded to
    (host, sitemap_url) rows. Map-only, zero shuffle — the discovery
    half that feeds the sitemap source."""
    from pdf_table_extractor_ray.stages.robots import parse_robots_sitemaps

    ds = _read(sf_dir, "customer", ["c_custkey"])

    def per_batch(b: pa.Table) -> pa.Table:
        keys = b.column("c_custkey").to_pylist()
        hosts, urls = [], []
        for k in keys:
            host = f"h{k}.test"
            txt = (
                f"# crawl policy for {host}\n"
                f"Sitemap: https://{host}/sitemap-pages.xml\n"
                "User-agent: *\nDisallow: /private/\n"
            )
            if k % 2 == 0:
                # group-independent: valid even inside an agent group
                txt += f"Sitemap: https://{host}/sitemap-news.xml\n"
            for u in parse_robots_sitemaps(txt.encode()):
                hosts.append(host)
                urls.append(u)
        return pa.table(
            {"host": pa.array(hosts, pa.string()), "sitemap_url": pa.array(urls, pa.string())}
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)


def _q_url_pattern_counts(sf_dir: str):
    """URL pattern mining with a SQL oracle — the crawl-trap /
    pagination detector: digit runs in each URL collapse to ``#``
    (one RE2 ``replace_substring_regex`` kernel per batch — the same
    regex engine DuckDB's oracle runs), per-batch pre-aggregation to
    (pattern, n) partials, ONE slim groupby-Sum. Patterns owning
    thousands of URLs are calendars/session-id traps; real content
    spreads thin."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def prep(b: pa.Table) -> pa.Table:
        k = b.column("o_orderkey").to_pylist()
        c = b.column("o_custkey").to_pylist()
        segs = ["order", "item", "archive", "tag"]
        urls = pa.array(
            [
                f"https://shop.test/u{ci}/{segs[ki % 4]}/{ki}?page={ki % 7}"
                for ki, ci in zip(k, c)
            ],
            pa.string(),
        )
        pat = pc.replace_substring_regex(urls, r"[0-9]+", "#")
        t = pa.table({"pattern": pat})
        return (
            t.group_by(["pattern"]).aggregate([("pattern", "count")])
            .rename_columns(["pattern", "n"])
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pattern")
        .aggregate(Sum("n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("pattern"), pc.cast(b.column("sum(n)"), pa.int64())],
            names=["pattern", "n_urls"],
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_cdx_sorted_parts(sf_dir: str):
    """Sorted-index layout for the CDX archive: balanced RANGE
    partitioning by SURT key (sources/cdx.py:
    cdx_partition_certificate) — boundaries are exact order statistics
    of the packed 8-byte key prefix via the shared radix-bisection
    selector, so a reader binary-searches part manifests then ONE
    part. Hosts here span 97 registrable owners so the key space is
    real. Rows-only (the certificate's boundaries are order
    statistics, not SQL-friendly); non-overlap/balance/packing
    contracts pinned in test_cdx."""
    from pdf_table_extractor_ray.sources.cdx import build_cdx, cdx_partition_certificate
    from pdf_table_extractor_ray.sources.warc import _EPOCH_US, write_warc_bytes

    ds = _read(sf_dir, "documents", ["doc_id"])

    def to_warc(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        blobs = []
        for start in range(0, len(ids), 128):
            recs = [
                (f"https://d{i % 97}.test/{i}", _EPOCH_US + i * 1_000_000, b"x")
                for i in ids[start : start + 128]
            ]
            blobs.append(write_warc_bytes(recs, shard_id=int(ids[start])))
        return pa.table({"warc": pa.array(blobs, pa.binary())})

    shards = ds.map_batches(to_warc, batch_format="pyarrow", zero_copy_batch=True)
    return cdx_partition_certificate(build_cdx(shards), n_parts=8)


def _q_docs_per_registrable_domain(sf_dir: str):
    """Registrable-domain (eTLD+1) rollup with a SQL oracle
    (functions/urls.py): hosts synthesized from customer across five
    suffix families — incl. the multi-label ``co.uk``/``com.br`` and
    private-registry ``github.io`` shapes where bare-host or
    last-two-labels grouping is wrong — mapped through the PSL
    longest-match kernel (unique-host memo per batch), pre-aggregated
    map-side to (domain, n) partials, ONE slim groupby-Sum. The
    per-domain cap/politeness key every crawl pipeline shuffles on."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.functions.urls import registrable_domains

    ds = _read(sf_dir, "customer", ["c_custkey"])
    suffixes = ["com", "co.uk", "com.br", "github.io", "org"]

    def prep(b: pa.Table) -> pa.Table:
        k = b.column("c_custkey").to_numpy(zero_copy_only=False)
        hosts = [
            f"www.sub{ki % 7}.owner{ki % 13}.{suffixes[ki % 5]}" for ki in k
        ]
        doms = registrable_domains(hosts)
        t = pa.table({"domain": pa.array(doms, pa.string())})
        return (
            t.group_by(["domain"]).aggregate([("domain", "count")])
            .rename_columns(["domain", "n"])
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("domain")
        .aggregate(Sum("n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("domain"), pc.cast(b.column("sum(n)"), pa.int64())],
            names=["domain", "n_hosts"],
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_cdx_fetch_roundtrip(sf_dir: str):
    """CDX index + point fetch end-to-end with a SQL oracle
    (sources/cdx.py): documents → WARC shards (every other shard
    member-gzipped, exercising both offset layouts) → per-shard CDX
    rows (surt_key, offset, length) → every record re-read by ONE
    ranged slice ``blob[offset : offset+length]`` — never a rescan —
    and parsed alone, returning (doc_id, surt_key, text)
    byte-identical. Index + fetch happen within the holding batch
    (zero shuffle); at archive scale the index is written sorted by
    surt_key and the fetch is a ranged GET against the shard."""
    from pdf_table_extractor_ray.sources.cdx import fetch_warc_record, iter_warc_index, surt
    from pdf_table_extractor_ray.sources.warc import _EPOCH_US, write_warc_bytes

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def roundtrip(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        o_id, o_key, o_text = [], [], []
        for start in range(0, len(ids), 128):
            recs = [
                (f"https://docs.test/{i}", _EPOCH_US + i * 1_000_000,
                 ("" if t is None else t).encode("utf-8"))
                for i, t in zip(ids[start : start + 128], texts[start : start + 128])
            ]
            blob = write_warc_bytes(
                recs, shard_id=int(ids[start]), gzip_members=(start // 128) % 2 == 1
            )
            for url, _ts, off, ln, _dig in iter_warc_index(blob):
                got = fetch_warc_record(blob, off, ln)
                assert got is not None and got[0] == url
                o_id.append(int(url.rsplit("/", 1)[1]))
                o_key.append(surt(url))
                o_text.append(got[2].decode("utf-8"))
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "surt_key": pa.array(o_key, pa.string()),
                "text": pa.array(o_text, pa.string()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow", zero_copy_batch=True)


def _q_wet_roundtrip(sf_dir: str):
    """WET export end-to-end with a SQL oracle — the WARC *conversion*
    format Common Crawl ships extracted text in (sources/warc.py):
    documents → extracted-text page rows → WET shards (128
    conversion records each, ``wet_from_pages``; shard grouping within
    each batch so output is layout-deterministic) → framed parse back
    → (doc_id, warc_ts_us, text), byte-identical. This is the
    engine's extraction EXPORT path: pages in via WARC, text out via
    WET."""
    from pdf_table_extractor_ray.sources.warc import _EPOCH_US, parse_wet_batches, wet_from_pages

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_pages(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        return pa.table(
            {
                "url": pa.array([f"https://docs.test/{i}" for i in ids], pa.string()),
                "warc_ts": pa.array(
                    [_EPOCH_US + i * 1_000_000 for i in ids], pa.timestamp("us")
                ),
                "text": b.column("text"),
            }
        )

    pages = ds.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)
    back = parse_wet_batches(wet_from_pages(pages))

    def finish(b: pa.Table) -> pa.Table:
        ids = pa.array(
            [int(u.rsplit("/", 1)[1]) for u in b.column("url").to_pylist()], pa.int64()
        )
        return pa.Table.from_arrays(
            [ids, pc.cast(b.column("warc_ts"), pa.int64()), b.column("text")],
            names=["doc_id", "warc_ts_us", "text"],
        )

    return back.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_sitemap_roundtrip(sf_dir: str):
    """Sitemap source end-to-end with a SQL oracle: orders → urlset
    shards of 200 entries (locs carry ``?q=a&b`` to exercise XML
    entity escaping; even keys get a changefreq, odd keys omit it —
    optional-field nulls round-trip) plus one sitemapindex blob per
    batch (parsed, then filtered out by kind) → regex parse →
    (o_orderkey, lastmod, changefreq), bit-identical."""
    from pdf_table_extractor_ray.sources.sitemap import (
        parse_sitemap_batches,
        write_sitemap_index,
        write_sitemap_xml,
    )

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def to_sitemaps(b: pa.Table) -> pa.Table:
        keys = b.column("o_orderkey").to_pylist()
        ts = pc.cast(b.column("o_orderdate"), pa.int64()).to_numpy(zero_copy_only=False)
        days = (
            ts.astype("datetime64[us]").astype("datetime64[D]").astype(str)
        )
        blobs = []
        shard_locs = []
        for start in range(0, len(keys), 200):
            entries = [
                (
                    f"https://shop.test/order/{k}?q=a&b",
                    str(d),
                    "daily" if k % 2 == 0 else None,
                    None,
                )
                for k, d in zip(keys[start : start + 200], days[start : start + 200])
            ]
            shard_locs.append((f"https://shop.test/sitemap{keys[start]}.xml", None))
            blobs.append(write_sitemap_xml(entries))
        if shard_locs:
            blobs.append(write_sitemap_index(shard_locs))
        return pa.table({"sitemap": pa.array(blobs, pa.binary())})

    shards = ds.map_batches(to_sitemaps, batch_format="pyarrow", zero_copy_batch=True)
    entries = parse_sitemap_batches(shards)

    def finish(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("kind"), "url"))
        locs = t.column("loc").to_pylist()
        keys = pa.array(
            [int(u.rsplit("/order/", 1)[1].split("?")[0]) for u in locs], pa.int64()
        )
        return pa.Table.from_arrays(
            [keys, t.column("lastmod"), t.column("changefreq")],
            names=["o_orderkey", "lastmod", "changefreq"],
        )

    return entries.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_dom_select_cards(sf_dir: str):
    """DOM-tree CSS-selector extraction with a SQL oracle: customers →
    synthetic HTML card pages (40 cards each, plus decoy subtrees the
    descendant combinator must prune — a ``div.other span.name`` block
    and a loose ``span.name``) → actor-pool ``DomSelect`` (selector
    compiled once per actor, stages/dom.py) pulling
    ``div.cust span.name`` text + its ``data-k`` attribute →
    (c_custkey, c_name), byte-identical to a plain projection. The
    page build happens within each batch, so output is invariant to
    batching; parse + select are per-document compute inside
    ``map_batches`` — zero shuffle."""
    from pdf_table_extractor_ray.stages.dom import select_text

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def to_pages(b: pa.Table) -> pa.Table:
        keys = b.column("c_custkey").to_pylist()
        names = b.column("c_name").to_pylist()
        urls, payloads = [], []
        for start in range(0, len(keys), 40):
            cards = "".join(
                f'<div class="cust big"><span class="name" data-k="{k}">{n}</span>'
                f'<span class="bal">ignored</span></div>'
                for k, n in zip(keys[start : start + 40], names[start : start + 40])
            )
            html = (
                '<html><body><div class="other"><span class="name">DECOY</span></div>'
                + cards
                + '<span class="name">loose</span></body></html>'
            )
            urls.append(f"https://cards.test/{keys[start]}")
            payloads.append(html.encode("utf-8"))
        return pa.table(
            {"url": pa.array(urls, pa.string()), "html": pa.array(payloads, pa.binary())}
        )

    pages = ds.map_batches(to_pages, batch_format="pyarrow", zero_copy_batch=True)
    hits = select_text(pages, "div.cust span.name", attr="data-k")

    def finish(b: pa.Table) -> pa.Table:
        keys = pa.array([int(k) for k in b.column("data-k").to_pylist()], pa.int64())
        return pa.Table.from_arrays([keys, b.column("text")], names=["c_custkey", "c_name"])

    return hits.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_dom_main_content(sf_dir: str):
    """DOM-density main-content extraction with a SQL oracle — the
    north-star Boilerpipe/Readability shape over a real parsed tree
    (stages/dom.py:extract_main_content): documents render into noisy
    pages (link-bearing nav + footer boilerplate, script noise, the
    body HTML-escaped inside a content div) and the squared
    link-density subtree score must pull the body back BYTE-IDENTICAL
    (raw_text preserves whitespace; convert_charrefs undoes the
    escaping). Zero shuffle; per-document compute in an actor pool."""
    import html as html_mod

    from pdf_table_extractor_ray.stages.dom import extract_dom_content

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def render(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        urls, payloads = [], []
        for i, t in zip(ids, texts):
            page = (
                "<html><head><title>doc</title>"
                "<script>var nav_tracking_payload_noise;</script></head>"
                '<body><nav><a href="/">Home</a><a href="/about">About</a>'
                '<a href="/contact">Contact</a></nav>'
                f'<div class="content">{html_mod.escape(t or "")}</div>'
                '<footer><a href="/legal">Legal notice</a>'
                '<a href="/privacy">Privacy policy</a></footer></body></html>'
            )
            urls.append(f"https://docs.test/{i}")
            payloads.append(page.encode("utf-8"))
        return pa.table(
            {"url": pa.array(urls, pa.string()), "html": pa.array(payloads, pa.binary())}
        )

    pages = ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    out = extract_dom_content(pages)

    def finish(b: pa.Table) -> pa.Table:
        ids = pa.array(
            [int(u.rsplit("/", 1)[1]) for u in b.column("url").to_pylist()], pa.int64()
        )
        return pa.Table.from_arrays(
            [ids, b.column("text"), b.column("n_chars")],
            names=["doc_id", "text", "n_chars"],
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_dom_shape_clusters(sf_dir: str):
    """Structural template clustering with a SQL oracle
    (stages/dom.py:shape_fingerprint): customers render through THREE
    page templates (div/p card, table row, article header — chosen by
    custkey mod 3) with per-customer content; the tag-path fingerprint
    must collapse each template's pages into one cluster regardless of
    content, so (min custkey, count) per fingerprint equals the same
    rollup per mod class. Fingerprints are per-document map work; the
    rollup is one slim int64 groupby."""
    from ray.data.aggregate import Count, Min

    from pdf_table_extractor_ray.stages.dom import DomShape

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    templates = [
        '<html><body><div class="card"><p>{n}</p></div></body></html>',
        "<html><body><table><tr><td>{n}</td></tr></table></body></html>",
        "<html><body><article><h1>{n}</h1><span>{n}</span></article></body></html>",
    ]

    def render(b: pa.Table) -> pa.Table:
        keys = b.column("c_custkey").to_pylist()
        names = b.column("c_name").to_pylist()
        return pa.table(
            {
                "url": pa.array([str(k) for k in keys], pa.string()),
                "html": pa.array(
                    [templates[k % 3].format(n=n).encode() for k, n in zip(keys, names)],
                    pa.binary(),
                ),
            }
        )

    pages = ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    fps = pages.map_batches(
        DomShape, batch_format="pyarrow", zero_copy_batch=True, concurrency=4
    )

    def rekey(b: pa.Table) -> pa.Table:
        keys = pa.array([int(u) for u in b.column("url").to_pylist()], pa.int64())
        return pa.table({"c_custkey": keys, "shape_fp": b.column("shape_fp")})

    agg = (
        fps.map_batches(rekey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("shape_fp")
        .aggregate(Min("c_custkey"), Count())
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pc.cast(b.column("min(c_custkey)"), pa.int64()),
                pc.cast(b.column("count()"), pa.int64()),
            ],
            names=["shape_rep", "n_pages"],
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_html_markdown_roundtrip(sf_dir: str):
    """HTML → Markdown conversion with a SQL oracle
    (stages/markdown.py): orders render into noisy structured pages —
    heading with interior whitespace, strong/em with padded edges, a
    list, a blockquote, a link whose label carries a double space, an
    hr, a fenced pre block, plus script noise — and the converter must
    emit the exact CommonMark string the oracle concatenates with
    chr(10)s (whitespace collapse, inline markup, block separation all
    byte-exact). Per-document actor-pool compute; zero shuffle."""
    from pdf_table_extractor_ray.stages.markdown import html_to_markdown

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_orderpriority"])

    def render(b: pa.Table) -> pa.Table:
        keys = b.column("o_orderkey").to_pylist()
        stats = b.column("o_orderstatus").to_pylist()
        prios = b.column("o_orderpriority").to_pylist()
        payloads = [
            (
                "<html><head><script>var nav_noise;</script></head><body>\n"
                f"  <h1>\n    Order {k}\n  </h1>\n"
                f"  <p>Status: <strong> {s} </strong>.</p>\n"
                f"  <ul><li>priority <em>{p}</em></li><li>id {k}</li></ul>\n"
                "  <blockquote><p>verified</p></blockquote>\n"
                f'  <p><a href="https://orders.test/{k}">details  page</a></p>\n'
                "  <hr>\n"
                f"  <pre>raw {k}</pre>\n"
                "</body></html>"
            ).encode("utf-8")
            for k, s, p in zip(keys, stats, prios)
        ]
        return pa.table(
            {
                "url": pa.array([str(k) for k in keys], pa.string()),
                "html": pa.array(payloads, pa.binary()),
            }
        )

    pages = ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    out = html_to_markdown(pages)

    def finish(b: pa.Table) -> pa.Table:
        keys = pa.array([int(u) for u in b.column("url").to_pylist()], pa.int64())
        return pa.Table.from_arrays(
            [keys, b.column("markdown")], names=["o_orderkey", "markdown"]
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# template-sentinel markers: the guillemets cannot collide with the
# ASCII testdata corpus, so mined-template membership is provably the
# injected nav/footer pair (measured max natural per-source line share
# at sf0.1 is 0.004 — far under min_share)
def _template_pages(sf_dir: str):
    """documents → per-source pages with an injected nav/footer pair."""
    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def inject(b: pa.Table) -> pa.Table:
        srcs = b.column("source").to_pylist()
        texts = b.column("text").to_pylist()
        aug = [
            f"«nav {s}»\n{t or ''}\n«footer {s}»" for s, t in zip(srcs, texts)
        ]
        return b.drop_columns(["text"]).append_column("text", pa.array(aug, pa.string()))

    return ds.map_batches(inject, batch_format="pyarrow", zero_copy_batch=True)


def _q_template_lines_by_source(sf_dir: str):
    """Corpus-level template mining with a SQL oracle
    (stages/templates.py): per-source pages carrying an injected
    nav/footer sentinel pair → distinct-line document-frequency
    explode (slim (key, line) partial counts, ONE groupby-Sum) →
    share threshold → exactly the two injected lines per source, with
    n_docs = n_docs_key = the source's page count. Natural corpus
    lines stay far under min_share (measured ≤0.004) — the mined set
    is provably the sentinels."""
    from pdf_table_extractor_ray.stages.templates import mine_template_lines

    mined = mine_template_lines(
        _template_pages(sf_dir), "source", min_share=0.5, min_count=3
    )

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(["source", "line", "n_docs", "n_docs_key"])

    return mined.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def _q_template_strip_roundtrip(sf_dir: str):
    """Mine-then-strip end-to-end with a SQL oracle: the injected
    nav/footer template lines are mined (bounded (source, line) set —
    2 rows per source by construction), broadcast once via
    ``ray.put``, and removed per page by an actor-pool hash-set stage
    (stages/templates.py:TemplateStripper) — recovering each
    document's original text byte-identically with exactly 2 template
    lines removed."""
    import pyarrow as pa_mod

    from pdf_table_extractor_ray.stages.templates import (
        mine_template_lines,
        strip_template_lines,
    )

    pages = _template_pages(sf_dir)
    mined = mine_template_lines(pages, "source", min_share=0.5, min_count=3)
    # template set is ≤ 2 rows per source by the sentinel construction —
    # bounded driver materialization (the broadcast-build contract)
    template = pa_mod.Table.from_pylist(
        mined.take_all(), schema=pa.schema([("key", pa.string()), ("line", pa.string()),
                                            ("n_docs", pa.int64()), ("n_docs_key", pa.int64())])
    ).select(["key", "line"])
    stripped = strip_template_lines(pages, template, "source")
    return stripped.select_columns(["doc_id", "text", "n_template_lines"])


def _q_host_pagerank(sf_dir: str):
    """Host-graph centrality end-to-end — the canonical Common-Crawl
    computation: crawl pages → outlink extraction (compiled-regex map)
    → weighted host-edge reduction (one slim string groupby-Sum) →
    DIRECTED weighted PageRank with dangling-mass redistribution
    (graph.pagerank_directed: groupby-only iteration, integer
    micro-ranks bit-identical across layouts, one driver scalar per
    round). Corpus: the deterministic multi-host synthetic crawl
    (links.synth_link_corpus — the fixture corpus is single-host by
    design); at production scale the pages arrive as parquet shards
    and everything from extract_outlinks on is unchanged. Rows-only:
    iterative centrality has no SQL analog; float-reference parity
    and dangling/weighted semantics are pinned in test_graph."""
    import ray.data

    from pdf_table_extractor_ray.stages.graph import pagerank_directed
    from pdf_table_extractor_ray.stages.links import (
        extract_outlinks,
        host_edges,
        synth_link_corpus,
    )

    n_pages = 4 * _FIXTURE_N.get(_sf_name(sf_dir), 240)
    pages = ray.data.from_arrow(synth_link_corpus(n_pages=n_pages, n_hosts=32))
    edges = host_edges(extract_outlinks(pages.repartition(16)))
    return pagerank_directed(edges, "src", "dst", "w", iters=8)


def _q_redirect_resolution(sf_dir: str):
    """Redirect-chain resolution with a SQL oracle: a deterministic
    redirect graph over orders (u<k> → u<k-1> unless k ≡ 0 mod 8 —
    sparse keys make chain lengths data-dependent) resolved to each
    source's final URL + exact hop count by POINTER DOUBLING
    (stages/redirects.py: log₂-rounds bucket shuffles, list-ranking
    distance accumulation). The oracle is DuckDB's recursive CTE
    walking the same edges one hop at a time — two entirely different
    algorithms, same table."""
    from pdf_table_extractor_ray.stages.redirects import resolve_chains

    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def to_edges(b: pa.Table) -> pa.Table:
        k = _nn(b.column("o_orderkey"))
        k = k[k % 8 != 0]
        return pa.table(
            {
                "src": pa.array([f"u{v}" for v in k], pa.string()),
                "dst": pa.array([f"u{v - 1}" for v in k], pa.string()),
            }
        )

    edges = ds.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    resolved = resolve_chains(edges, max_rounds=8)
    return resolved.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("src"), b.column("final"), b.column("hops")],
            names=["src", "final", "hops"],
        ),
        batch_format="pyarrow",
    )


def _q_crawl_depth_bfs(sf_dir: str):
    """Bounded-depth BFS crawl-depth assignment with a SQL oracle
    (stages/graph.py:bfs_depths): a deterministic two-edge-type DAG
    over orders (k → k−1 always; k → k−8 when k ≡ 0 mod 4 — sparse
    keys make reach data-dependent), seeds at k ≡ 0 mod 64, min-hop
    depth within 8 rounds. Frontier expansion is one bucket shuffle +
    one keyed Min groupby per round with a scalar drain probe; the
    oracle walks the same edges with a recursive CTE — two different
    algorithms, same table."""
    from pdf_table_extractor_ray.stages.graph import bfs_depths

    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def to_edges(b: pa.Table) -> pa.Table:
        k = _nn(b.column("o_orderkey"))
        k4 = k[k % 4 == 0]
        return pa.table(
            {
                "src": pa.array(np.concatenate([k, k4])),
                "dst": pa.array(np.concatenate([k - 1, k4 - 8])),
            }
        )

    def to_seeds(b: pa.Table) -> pa.Table:
        k = _nn(b.column("o_orderkey"))
        return pa.table({"node": pa.array(k[k % 64 == 0])})

    edges = ds.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    seeds = ds.map_batches(to_seeds, batch_format="pyarrow", zero_copy_batch=True)
    return bfs_depths(edges, seeds, max_depth=8)


def _q_crawl_depth_bfs_resumable(sf_dir: str):
    """The CHECKPOINTED face of crawl_depth_bfs — identical rounds,
    identical result (same SQL oracle), but the carried (node, depth)
    state commits to parquet after every round via
    ``state.checkpoint.run_checkpointed`` (atomic per-round markers;
    torn rounds ignored; convergence recorded) so a 40-round graph
    job killed at round 37 resumes at 37 instead of starting over.
    Fresh checkpoint dir per invocation; kill/resume equivalence is
    pinned in test_graph."""
    import shutil
    import tempfile

    from pdf_table_extractor_ray.stages.graph import bfs_depths_checkpointed

    ds = _read(sf_dir, "orders", ["o_orderkey"])

    def to_edges(b: pa.Table) -> pa.Table:
        k = _nn(b.column("o_orderkey"))
        k4 = k[k % 4 == 0]
        return pa.table(
            {
                "src": pa.array(np.concatenate([k, k4])),
                "dst": pa.array(np.concatenate([k - 1, k4 - 8])),
            }
        )

    def to_seeds(b: pa.Table) -> pa.Table:
        k = _nn(b.column("o_orderkey"))
        return pa.table({"node": pa.array(k[k % 64 == 0])})

    edges = ds.map_batches(to_edges, batch_format="pyarrow", zero_copy_batch=True)
    seeds = ds.map_batches(to_seeds, batch_format="pyarrow", zero_copy_batch=True)
    ck = tempfile.mkdtemp(prefix="pdfx_bfs_ck_")
    try:
        out = bfs_depths_checkpointed(edges, seeds, ck, max_depth=8)
        return out.materialize()
    finally:
        shutil.rmtree(ck, ignore_errors=True)


def _q_jsonld_roundtrip(sf_dir: str):
    """JSON-LD structured-data extraction with a SQL oracle: part →
    product pages embedding a schema.org Product block (name/brand/
    sku/size/desc — desc carries quotes + backslashes to exercise
    JSON string escaping), an Organization block, and a non-JSON-LD
    noise script → compiled-regex block scan + JSON parse →
    @type=Product projection, bit-identical (stages/jsonld.py)."""
    from pdf_table_extractor_ray.stages.jsonld import (
        extract_jsonld,
        project_jsonld_fields,
        render_jsonld_page,
    )

    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_brand", "p_size"])

    def render(b: pa.Table) -> pa.Table:
        keys = b.column("p_partkey").to_pylist()
        names = b.column("p_name").to_pylist()
        brands = b.column("p_brand").to_pylist()
        sizes = b.column("p_size").to_pylist()
        urls, payloads = [], []
        for k, n, br, sz in zip(keys, names, brands, sizes):
            ents = [
                {
                    "@type": "Product",
                    "sku": str(k),
                    "name": n,
                    "brand": br,
                    "size": str(sz),
                    "desc": f'q"{k}\\',
                },
                {"@type": "Organization", "name": "shop"},
            ]
            urls.append(f"https://shop.test/p/{k}")
            payloads.append(render_jsonld_page(ents, noise_script="var x=1;"))
        return pa.table(
            {"url": pa.array(urls, pa.string()), "html": pa.array(payloads, pa.binary())}
        )

    pages = ds.map_batches(render, batch_format="pyarrow", zero_copy_batch=True)
    prods = project_jsonld_fields(
        extract_jsonld(pages), ["sku", "name", "brand", "size", "desc"], jtype="Product"
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pc.cast(b.column("sku"), pa.int64()),
                b.column("name"),
                b.column("brand"),
                pc.cast(b.column("size"), pa.int64()),
                b.column("desc"),
            ],
            names=["sku", "name", "brand", "size", "desc"],
        )

    return prods.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_extract_span_eval(sf_dir: str):
    """Extraction-quality evaluation at corpus scale (CleanEval-style
    char-span P/R/F1, stages/span_eval.py): the flagship extractor's
    spans scored against themselves in two modes — ``full`` (the
    self-check: micro F1 must be exactly 1.0 per strategy) and
    ``desc_only`` (a degraded extractor keeping only description
    spans: precision stays 1.0, recall drops to the per-strategy
    description share — the number a candidate boilerplate change
    would move). One extraction pass; the slim (url, strategy, spans)
    projection is materialized once and feeds both modes (at
    production scale you evaluate a SAMPLE — the harness itself only
    ever shuffles slim span rows, one url-bucket exchange per mode).
    Rows-only; the sweep is pinned against a brute-force reference in
    test_span_eval."""
    from pdf_table_extractor_ray.pipelines.extract import (
        build_extracted_dataset,
        read_pages,
    )
    from pdf_table_extractor_ray.stages.span_eval import (
        explode_spans,
        prf_rollup,
        span_overlap_by_url,
    )

    pages = _fixture_pages(sf_dir)
    ext = (
        build_extracted_dataset(read_pages(pages, include_paths=True))
        .select_columns(["url", "strategy", "spans"])
        .materialize()
    )

    gold = explode_spans(ext, 1, carry_col="strategy")

    def one_mode(mode: str, kind_filter):
        pred = explode_spans(ext, 0, carry_col="strategy", kind_filter=kind_filter)
        per_url = span_overlap_by_url(pred, gold, carry_col="strategy")
        roll = prf_rollup(per_url, key_col="strategy")
        return roll.map_batches(
            lambda b, _m=mode: b.append_column(
                "mode", pa.array([_m] * b.num_rows, pa.string())
            ),
            batch_format="pyarrow",
        )

    return one_mode("full", None).union(one_mode("desc_only", "description"))


def _q_robots_frontier(sf_dir: str):
    """Crawl-frontier admission end-to-end: pages → outlinks →
    candidate URLs → robots.txt gate (stages/robots.py: RFC 9309
    longest-match with wildcards/anchors/agent groups; the host→rules
    table is a bounded broadcast — one row per HOST — compiled once
    per actor in ``__init__``) → per-host allowed/blocked counts.
    Rows-only; rule semantics pinned by RFC-shape unit tests."""
    import ray.data
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.links import extract_outlinks, synth_link_corpus
    from pdf_table_extractor_ray.stages.robots import filter_by_robots, synth_robots_corpus

    n_pages = 4 * _FIXTURE_N.get(_sf_name(sf_dir), 240)
    pages = ray.data.from_arrow(synth_link_corpus(n_pages=n_pages, n_hosts=32))
    links = extract_outlinks(pages.repartition(16))

    def to_frontier(b: pa.Table) -> pa.Table:
        hrefs = b.column("href").to_pylist()
        thosts = b.column("target_host").to_pylist()
        urls = [
            h if "://" in h else f"https://{t}{h if h.startswith('/') else '/' + h}"
            for h, t in zip(hrefs, thosts)
        ]
        return pa.table({"url": pa.array(urls, pa.string()),
                         "host": pa.array(thosts, pa.string())})

    frontier = links.map_batches(to_frontier, batch_format="pyarrow", zero_copy_batch=True)
    gated = filter_by_robots(frontier, synth_robots_corpus(32))

    def partial(b: pa.Table) -> pa.Table:
        allowed = pc.cast(b.column("allowed"), pa.int64())
        blocked = pc.subtract(pa.scalar(1, pa.int64()), allowed)
        t = pa.Table.from_arrays(
            [b.column("host"), allowed, blocked], names=["host", "a", "d"]
        )
        g = pa.TableGroupBy(t, ["host"]).aggregate([("a", "sum"), ("d", "sum")])
        return g.rename_columns(["host", "a", "d"])

    agg = (
        gated.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("host")
        .aggregate(Sum("a"), Sum("d"))
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("host"),
             pc.cast(b.column("sum(a)"), pa.int64()),
             pc.cast(b.column("sum(d)"), pa.int64())],
            names=["host", "n_allowed", "n_blocked"],
        ),
        batch_format="pyarrow",
    )


def _q_host_hits(sf_dir: str):
    """Hubs & authorities (Kleinberg HITS) over the same host link
    graph as host_pagerank — the complementary web centrality (link
    DIRECTORIES score as hubs, link TARGETS as authorities; PageRank
    conflates the two). graph.hits: integer sums, one driver scalar
    per half-round, hub/auth as separate slim tables merged once at
    the end. Rows-only; float-reference parity in test_graph."""
    import ray.data

    from pdf_table_extractor_ray.stages.graph import hits
    from pdf_table_extractor_ray.stages.links import (
        extract_outlinks,
        host_edges,
        synth_link_corpus,
    )

    n_pages = 4 * _FIXTURE_N.get(_sf_name(sf_dir), 240)
    pages = ray.data.from_arrow(synth_link_corpus(n_pages=n_pages, n_hosts=32))
    edges = host_edges(extract_outlinks(pages.repartition(16)))
    return hits(edges, "src", "dst", "w", iters=6)


def _q_top_link_targets(sf_dir: str):
    """Most-linked (target_host, href) pairs across the crawl: link
    explode → slim pre-counted groupby-Sum → partial top-k merge."""
    from pdf_table_extractor_ray.pipelines.extract import read_pages
    from pdf_table_extractor_ray.stages.links import (
        extract_outlinks,
        link_target_counts,
    )

    pages = _fixture_pages(sf_dir)
    return link_target_counts(
        extract_outlinks(read_pages(pages, columns=("url", "html"))), k=20
    )


def _q_extract_flagship(sf_dir: str):
    from pdf_table_extractor_ray.pipelines.extract import build_extracted_dataset, read_pages

    pages = _fixture_pages(sf_dir)
    out = build_extracted_dataset(read_pages(pages, include_paths=True))
    return out.select_columns(["url", "strategy", "n_records", "n_chars", "status"])


def _q_extract_records(sf_dir: str):
    from pdf_table_extractor_ray.pipelines.extract import (
        build_extracted_dataset,
        explode_records,
        read_pages,
    )

    pages = _fixture_pages(sf_dir)
    return explode_records(build_extracted_dataset(read_pages(pages, include_paths=True)))


def _q_extract_routed(sf_dir: str):
    """Heterogeneous-pool routed extraction (heavy statement families →
    warm actor pool, light markup families → task pool); same outputs
    as the flagship path (asserted byte-identical in tests)."""
    from ray.data.aggregate import Count, Sum

    from pdf_table_extractor_ray.pipelines.routed import build_extracted_dataset_routed

    pages = _fixture_pages(sf_dir)
    agg = (
        build_extracted_dataset_routed(pages)
        .groupby("strategy")
        .aggregate(Count(), Sum("n_records"))
    )
    return agg.map_batches(
        lambda t: pa.Table.from_arrays(
            [
                t.column("strategy"),
                pc.cast(t.column("count()"), pa.int64()),
                pc.cast(t.column("sum(n_records)"), pa.int64()),
            ],
            names=["strategy", "n_docs", "n_records"],
        ),
        batch_format="pyarrow",
    )


def _q_extract_by_strategy(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    from pdf_table_extractor_ray.pipelines.extract import build_extracted_dataset, read_pages

    pages = _fixture_pages(sf_dir)
    agg = (
        build_extracted_dataset(read_pages(pages, include_paths=True))
        .groupby("strategy")
        .aggregate(Count(), Sum("n_records"))
    )
    return agg.map_batches(
        lambda t: pa.Table.from_arrays(
            [
                t.column("strategy"),
                pc.cast(t.column("count()"), pa.int64()),
                pc.cast(t.column("sum(n_records)"), pa.int64()),
            ],
            names=["strategy", "n_docs", "n_records"],
        ),
        batch_format="pyarrow",
    )


def _q_clicks_after_signup(sf_dir: str):
    """Keyless time-band join: per signup event, how many clicks (any
    user) land in the following 5 minutes. Reuses the bucketed
    interval-join engine (stages/intervals.py): signups become
    [ts, ts+5min) intervals, clicks are points, and
    ``count_points_per_interval`` counts per bucket with a sorted
    searchsorted — the qualifying PAIRS are never materialized, only
    per-bucket partial counts shuffle, and zero-click signups emit 0
    (LEFT semantics) without a second join."""
    from pdf_table_extractor_ray.stages.intervals import count_points_per_interval

    window_us = 5 * 60 * 1_000_000
    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

    def signup_side(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("event_type"), "signup"))
        s = pc.cast(f.column("ts"), pa.int64())
        return pa.table(
            {
                "event_id": f.column("event_id"),
                "s": s,
                "e": pc.add(s, pa.scalar(window_us, pa.int64())),
            }
        )

    def click_side(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("event_type"), "click"))
        return pa.table({"click_ts": pc.cast(f.column("ts"), pa.int64())})

    signups = ev.map_batches(signup_side, batch_format="pyarrow", zero_copy_batch=True)
    clicks = ev.map_batches(click_side, batch_format="pyarrow", zero_copy_batch=True)
    return count_points_per_interval(
        clicks,
        signups,
        point_col="click_ts",
        start_col="s",
        end_col="e",
        bucket_width=window_us,
        interval_keys=("event_id",),
        out_col="n_clicks",
    )


def _q_value_p90_by_type(sf_dir: str):
    """EXACT per-type p90 of value — per-key radix bisection
    (kth_smallest_by): no per-key sort, ≤6 passes over a materialized
    slim (key, u64) column regardless of key count; DuckDB
    quantile_disc rank convention (1-based ⌈q·n⌉) in exact integer
    arithmetic."""
    from pdf_table_extractor_ray.stages.sketches import kth_smallest_by

    ds = _read(sf_dir, "events", ["event_type", "value"])
    t = kth_smallest_by(ds, "event_type", "value", 9, 10)
    return pa.table({"event_type": t.column("key"), "p90": t.column("kth")})


def _add_prefix_md5(b: pa.Table, n_chars: int = 64) -> pa.Table:
    """(source, text) → (hh, source): md5 of the first ``n_chars``
    codepoints — the shared-template key (distinct pages from
    different hosts that open with the same boilerplate collide)."""
    from pdf_table_extractor_ray.stages.dedup import add_md5_batch

    pfx = pc.utf8_slice_codeunits(b.column("text"), 0, n_chars)
    t = pa.table({"source": b.column("source"), "pfx": pfx})
    t = add_md5_batch(t, "pfx")
    return pa.table({"hh": t.column("content_md5"), "source": t.column("source")})


def _q_shared_prefix_sources(sf_dir: str):
    """Cross-source template detection: per source, how many docs open
    with a 64-char prefix that also appears in ANOTHER source (shared
    boilerplate/header across hosts). Plan: slim (hh, source) rows →
    (hh, source, n) partial groupby → per-hh source-count groupby →
    semi join s1 against the ns≥2 hh set → per-source Sum. Only
    hash-sized rows ever shuffle; text stays in the scan batches."""
    from ray.data.aggregate import Count, Sum

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    ds = _read(sf_dir, "documents", ["source", "text"])
    hashed = ds.map_batches(_add_prefix_md5, batch_format="pyarrow", zero_copy_batch=True)
    s1 = (
        hashed.groupby(["hh", "source"])
        .aggregate(Count())
        .map_batches(
            lambda b: pa.table(
                {
                    "hh": b.column("hh"),
                    "source": b.column("source"),
                    "n": pc.cast(b.column("count()"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    shared = (
        s1.groupby("hh")
        .aggregate(Count())
        .map_batches(
            lambda b: pa.table(
                {"hh": b.filter(pc.greater_equal(b.column("count()"), 2)).column("hh")}
            ),
            batch_format="pyarrow",
        )
    )
    j = hash_shuffle_join(s1, shared, on="hh", how="left_semi")
    agg = j.groupby("source").aggregate(Sum("n"))
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("source"), pc.cast(b.column("sum(n)"), pa.int64())],
            names=["source", "n_cross"],
        ),
        batch_format="pyarrow",
    )


def _q_orders_zorder_parts(sf_dir: str):
    """Z-order (Morton) layout certificate over orders on
    (o_custkey, o_orderdate): per equal key-range partition, row count
    and how many distinct cells of EACH dimension it touches — the
    Delta/Iceberg OPTIMIZE ZORDER BY shape; low spans in both
    dimensions mean filters on either column prune partitions.
    Rows-only (the curve is a layout policy, not SQL); bit-exact
    reference parity + locality invariants in tests/test_zorder.py."""
    from pdf_table_extractor_ray.stages.zorder import zorder_partition_stats

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    return zorder_partition_stats(orders, "o_custkey", "o_orderdate", nbits=8, n_parts=16)


def _q_dataset_split_counts(sf_dir: str):
    """Deterministic train/val/test assignment — the split every
    training corpus needs: md5(text) first TWO hex chars give 256
    content-hash buckets; <0xfa → train (250/256 ≈ 97.7%), <0xfd →
    val (3/256), rest → test. Stable across runs, cluster sizes and
    row order, and duplicate content always lands in ONE split (no
    train/test leakage through clones — the property random splits
    lose). Map-only + one tiny (source, split) groupby."""
    from ray.data.aggregate import Count

    from pdf_table_extractor_ray.stages.dedup import add_md5_batch

    ds = _read(sf_dir, "documents", ["source", "text"])

    def assign(b: pa.Table) -> pa.Table:
        h = add_md5_batch(b, "text").column("content_md5")
        b2 = pc.utf8_slice_codeunits(h, 0, 2)
        if isinstance(b2, pa.ChunkedArray):
            b2 = b2.combine_chunks()
        # fixed-width lowercase hex ⇒ lexicographic == numeric bucket order
        is_train = pc.less(b2, pa.scalar("fa"))
        is_val = pc.and_(pc.invert(is_train), pc.less(b2, pa.scalar("fd")))
        split = pc.if_else(
            is_train, pa.scalar("train"), pc.if_else(is_val, pa.scalar("val"), pa.scalar("test"))
        )
        return pa.table({"source": b.column("source"), "split": split})

    agg = (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "split"])
        .aggregate(Count())
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("source"), b.column("split"), pc.cast(b.column("count()"), pa.int64())],
            names=["source", "split", "n"],
        ),
        batch_format="pyarrow",
    )


def _q_revenue_share_by_nation(sf_dir: str):
    """Percent-of-total: each nation's revenue share in MICRO units via
    integer floor division — no float accumulation, so the shares
    hash-match the window-function oracle exactly. Probe side (orders)
    streams against a broadcast customer→nation map; the per-nation
    rollup is bounded (|nations|) so the share normalization runs on
    the driver in arbitrary-precision Python ints (cents × 10^6
    overflows int64 — numpy would wrap silently)."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import broadcast_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": b.column("o_custkey"),
                "cents": pa.array(
                    np.floor(_nn(b.column("o_totalprice")) * 100.0).astype(np.int64)
                ),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nations = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    joined = broadcast_join(
        orders.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        cust,
        key="o_custkey",
        build_key="c_custkey",
    )
    named = broadcast_join(
        joined, nations, key="c_nationkey", build_key="n_nationkey"
    )
    rows = (
        named.groupby("n_name").aggregate(Sum("cents")).take_all()
    )  # bounded: one row per nation
    names = sorted(r["n_name"] for r in rows)
    rev = {r["n_name"]: int(r["sum(cents)"]) for r in rows}
    total = sum(rev.values())
    return pa.table(
        {
            "n_name": pa.array(names),
            "rev_cents": pa.array([rev[n] for n in names], pa.int64()),
            "share_micro": pa.array(
                [(rev[n] * 1_000_000) // total for n in names], pa.int64()
            ),
        }
    )


def _q_revenue_mom(sf_dir: str):
    """Month-over-month revenue deltas: per-month integer-cents rollup
    (the shuffle is one slim (month, cents) partial per block), then
    the LAG diff over the BOUNDED month axis on the driver — the
    aggregated-time-series window shape. First month's delta is NULL
    (SQL lag semantics)."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("o_orderdate"), pa.int64()).to_numpy(zero_copy_only=False)
        month_us = (
            ts.astype("datetime64[us]").astype("datetime64[M]").astype("datetime64[us]")
        ).astype(np.int64)
        cents = np.floor(_nn(b.column("o_totalprice")) * 100.0).astype(np.int64)
        months, inv = np.unique(month_us, return_inverse=True)
        sums = np.zeros(len(months), np.int64)
        np.add.at(sums, inv, cents)
        return pa.table(
            {"month_us": pa.array(months), "cents": pa.array(sums)}
        )

    rows = (
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("month_us")
        .aggregate(Sum("cents"))
        .take_all()
    )  # bounded: one row per calendar month
    rows.sort(key=lambda r: int(r["month_us"]))
    months = [int(r["month_us"]) for r in rows]
    rev = [int(r["sum(cents)"]) for r in rows]
    delta = [None] + [rev[i] - rev[i - 1] for i in range(1, len(rev))]
    return pa.table(
        {
            "month_us": pa.array(months, pa.int64()),
            "rev_cents": pa.array(rev, pa.int64()),
            "delta_cents": pa.array(delta, pa.int64()),
        }
    )


def _q_value_winsorized_sums(sf_dir: str):
    """Per-type WINSORIZED integer-cents sum: values clipped at the
    key's exact [p10, p90] (quantile_disc semantics) before summing —
    the robust-rollup recipe. BOTH bounds come from ONE
    kth_smallest_by_multi call (shared slim-column materialization,
    shared ≤6 bisection passes), then a map-only clip + integer
    partial sum; no re-shuffle of the data to apply the bounds (they
    broadcast via ray.put)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.sketches import kth_smallest_by_multi

    ds = _read(sf_dir, "events", ["event_type", "value"])
    qt = kth_smallest_by_multi(ds, "event_type", "value", [(1, 10), (9, 10)])
    bounds: dict = {}
    for k, qn, v in zip(
        qt.column("key").to_pylist(),
        qt.column("q_num").to_pylist(),
        qt.column("kth").to_pylist(),
    ):
        lo, hi = bounds.get(k, (None, None))
        bounds[k] = (v, hi) if qn == 1 else (lo, v)
    b_ref = _ray.put(bounds)

    def partial(b: pa.Table) -> pa.Table:
        bd = _ray.get(b_ref)
        m = pc.and_(pc.is_valid(b.column("event_type")), pc.is_valid(b.column("value")))
        f = b.filter(m)
        keys = f.column("event_type")
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        enc = keys.dictionary_encode()
        dvals = enc.dictionary.to_pylist()
        lo_a = np.array([bd[d][0] for d in dvals], np.float64)
        hi_a = np.array([bd[d][1] for d in dvals], np.float64)
        code = enc.indices.to_numpy(zero_copy_only=False)
        v = _nn(f.column("value"))
        clipped = np.clip(v, lo_a[code], hi_a[code])
        cents = np.floor(clipped * 100.0).astype(np.int64)
        sums = np.zeros(len(dvals), np.int64)
        np.add.at(sums, code, cents)
        n = np.bincount(code, minlength=len(dvals)).astype(np.int64)
        return pa.table(
            {
                "event_type": enc.dictionary,
                "wsum_cents": pa.array(sums),
                "n": pa.array(n),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("wsum_cents"), Sum("n"))
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("event_type"),
                pc.cast(b.column("sum(wsum_cents)"), pa.int64()),
                pc.cast(b.column("sum(n)"), pa.int64()),
            ],
            names=["event_type", "wsum_cents", "n"],
        ),
        batch_format="pyarrow",
    )


def _q_customer_activity_cogroup(sf_dir: str):
    """COGROUP two fact tables on one key WITHOUT a join: per id, the
    order count (orders.o_custkey) and event count (events.user_id)
    with FULL OUTER semantics — ids on either side appear, absent
    sides read 0. Plan: each side pre-counts per key inside its own
    map_batches (combiner), the tagged slim partials union, and ONE
    groupby sums both indicator columns — the sentinel-rows discipline
    (no join, no null-fill pass)."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_custkey"])
    events = _read(sf_dir, "events", ["user_id"])

    def count_side(col: str, out: str):
        def f(b: pa.Table) -> pa.Table:
            v = b.column(col)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            ids, cnt = np.unique(
                v.drop_null().to_numpy(zero_copy_only=False), return_counts=True
            )
            zero = np.zeros(len(ids), np.int64)
            return pa.table(
                {
                    "id": pa.array(ids.astype(np.int64)),
                    "n_orders": pa.array(cnt.astype(np.int64) if out == "n_orders" else zero),
                    "n_events": pa.array(cnt.astype(np.int64) if out == "n_events" else zero),
                }
            )

        return f

    tagged = orders.map_batches(
        count_side("o_custkey", "n_orders"), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        events.map_batches(
            count_side("user_id", "n_events"), batch_format="pyarrow", zero_copy_batch=True
        )
    )
    agg = tagged.groupby("id").aggregate(Sum("n_orders"), Sum("n_events"))
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("id"),
                pc.cast(b.column("sum(n_orders)"), pa.int64()),
                pc.cast(b.column("sum(n_events)"), pa.int64()),
            ],
            names=["id", "n_orders", "n_events"],
        ),
        batch_format="pyarrow",
    )


def _q_dup_triangles(sf_dir: str):
    """Triangle count of the MinHash near-dup candidate graph — the
    cluster-cohesion certificate (cliques vs chains; see
    graph.triangle_count). Rows-only by nature (graph edges come from
    the LSH stage, not SQL); exact brute-force parity + clique/star
    sanity in tests/test_graph.py."""
    from pdf_table_extractor_ray.stages.dedup import minhash_lsh_pairs
    from pdf_table_extractor_ray.stages.graph import triangle_count

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return triangle_count(minhash_lsh_pairs(docs, emit="pairs"))


def _q_orders_quality_audit(sf_dir: str):
    """Data-quality constraint audit over the orders table — the
    validation stage every ingest pipeline runs before publishing a
    snapshot: row count, null-key count, PRIMARY-KEY duplicate mass
    (rows − distinct keys), FOREIGN-KEY orphans (custkeys absent from
    customer, exact left-anti shuffle join), and the orderdate range
    (µs). All components are streaming partials or slim key-only
    shuffles; output is ONE row of certificates."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def partial(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey")
        od = pc.cast(b.column("o_orderdate"), pa.int64())
        return pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "n_null_custkey": pa.array([ck.null_count], pa.int64()),
                "dmin": pa.array([pc.min(od).as_py()], pa.int64()),
                "dmax": pa.array([pc.max(od).as_py()], pa.int64()),
            }
        )

    base = (
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(Sum("n"), Sum("n_null_custkey"), Min("dmin"), Max("dmax"))
    )

    def keys_only(b: pa.Table) -> pa.Table:
        return b.select(["o_orderkey"])

    n_distinct = (
        orders.map_batches(keys_only, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderkey")
        .aggregate(Count())
        .count()
    )

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orphans = hash_shuffle_join(
        orders.map_batches(
            lambda b: b.select(["o_custkey"]).drop_null(),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        cust,
        on="o_custkey",
        right_on="c_custkey",
        how="left_anti",
    ).count()

    return pa.table(
        {
            "n_rows": pa.array([int(base["sum(n)"])], pa.int64()),
            "n_null_custkey": pa.array([int(base["sum(n_null_custkey)"])], pa.int64()),
            "n_dup_orderkeys": pa.array([int(base["sum(n)"]) - int(n_distinct)], pa.int64()),
            "n_orphan_orders": pa.array([int(orphans)], pa.int64()),
            "min_orderdate_us": pa.array([int(base["min(dmin)"])], pa.int64()),
            "max_orderdate_us": pa.array([int(base["max(dmax)"])], pa.int64()),
        }
    )


def _q_bigticket_customer_orders(sf_dir: str):
    """Selective fact⋈dim join via the Bloom-prefiltered shuffle join:
    only ~10% of customers qualify (acctbal > 9000), so a Bloom of
    their keys filters ~90% of the orders probe side BEFORE the
    all-to-all (joins.bloom_filtered_join — result-identical to the
    plain hash join by construction, which is the oracle)."""
    from pdf_table_extractor_ray.stages.joins import bloom_filtered_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(
        sf_dir,
        "customer",
        ["c_custkey", "c_acctbal"],
        filter=pc.field("c_acctbal") > 9000.0,
    )

    def prep_orders(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
                "price_cents": pa.array(
                    np.floor(_nn(b.column("o_totalprice")) * 100.0).astype(np.int64)
                ),
            }
        )

    def prep_cust(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "bal_cents": pa.array(
                    np.floor(_nn(b.column("c_acctbal")) * 100.0).astype(np.int64)
                ),
            }
        )

    return bloom_filtered_join(
        orders.map_batches(prep_orders, batch_format="pyarrow", zero_copy_batch=True),
        cust.map_batches(prep_cust, batch_format="pyarrow", zero_copy_batch=True),
        on="o_custkey",
        right_on="c_custkey",
        how="inner",
    )


def _q_user_value_timeweighted(sf_dir: str):
    """Per-user TIME-WEIGHTED value integral: each valued event's cents
    weighted by the microseconds until the user's next valued event
    (the last event carries no weight) — the temporal aggregate behind
    time-in-state / exposure metrics. Integer-exact (cents × µs sums,
    ≤2.6e17 per user, no float accumulation) so the result is
    deterministic across block orders and hash-matches the window-
    function oracle. One user-BUCKET shuffle; per bucket one lexsort +
    vectorized diff + np.add.at scatter — no per-user Python."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def bucketize(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_valid(b.column("value")))
        uid = f.column("user_id").to_numpy(zero_copy_only=False)
        cents = np.floor(_nn(f.column("value")) * 100.0).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array((uid % 64).astype(np.int64)),
                "user_id": pa.array(uid.astype(np.int64)),
                "ts_us": pc.cast(f.column("ts"), pa.int64()),
                "event_id": pc.cast(f.column("event_id"), pa.int64()),
                "cents": pa.array(cents),
            }
        )

    def tw(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        su, st, sc = uid[order], ts[order], cents[order]
        same = su[1:] == su[:-1]  # consecutive pair within one user
        w_user = su[:-1][same]
        contrib = sc[:-1][same] * (st[1:] - st[:-1])[same]
        users, inv = np.unique(w_user, return_inverse=True)
        tw_sum = np.zeros(len(users), np.int64)
        np.add.at(tw_sum, inv, contrib)
        n_gaps = np.bincount(inv, minlength=len(users)).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(users.astype(np.int64)),
                "tw_cents_us": pa.array(tw_sum),
                "n_gaps": pa.array(n_gaps),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(tw, batch_format="pyarrow")
    )


def _q_pack_sequences(sf_dir: str):
    """Pretraining sequence packing: documents → fixed-capacity
    (256-token) training bins, shard-parallel greedy (stages/
    packing.py). Rows-only by nature (packing is an ordered, stateful
    assignment — not SQL-expressible); reference-semantics parity and
    invariants (fill ≤ capacity, token conservation, layout
    invariance) covered in tests/test_packing.py."""
    from pdf_table_extractor_ray.stages.packing import pack_sequences

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return pack_sequences(ds, capacity=256, n_shards=16)


def _q_epoch_pack(sf_dir: str):
    """Epoch-ordered sequence packing: the deterministic seeded
    shuffle's permutation drives the packing order, so consecutive
    training sequences hold unrelated docs and a new seed re-packs a
    fresh epoch statelessly. Shards = the shuffle key's top bits —
    contiguous epoch-position ranges, balanced by avalanche. Rows-only
    (ordered stateful assignment); determinism/conservation/order
    parity in tests/test_packing.py."""
    from pdf_table_extractor_ray.stages.packing import epoch_pack

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return epoch_pack(ds, capacity=256, seed=1, n_shards=16)


def _q_prefix_except(sf_dir: str):
    """Set EXCEPT as a distributed anti join: distinct 64-char-prefix
    hashes appearing in source src0 but in NO other source (src0's
    unique openings). Left side distinct-collapsed first so the anti
    join ships one row per distinct hash."""
    from ray.data.aggregate import Count

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    ds = _read(sf_dir, "documents", ["source", "text"])
    hashed = ds.map_batches(_add_prefix_md5, batch_format="pyarrow", zero_copy_batch=True)

    def left_side(b: pa.Table) -> pa.Table:
        return pa.table({"hh": b.filter(pc.equal(b.column("source"), "src0")).column("hh")})

    def right_side(b: pa.Table) -> pa.Table:
        return pa.table(
            {"hh": b.filter(pc.not_equal(b.column("source"), "src0")).column("hh")}
        )

    left = (
        hashed.map_batches(left_side, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hh")
        .aggregate(Count())
        .map_batches(lambda b: b.select(["hh"]), batch_format="pyarrow")
    )
    right = hashed.map_batches(right_side, batch_format="pyarrow", zero_copy_batch=True)
    return hash_shuffle_join(left, right, on="hh", how="left_anti")


_DAY_US = 86_400 * 1_000_000


def _q_urgent_daily_dense(sf_dir: str):
    """Calendar densification (time-series gap fill): daily revenue of
    1-URGENT orders with EVERY day of the observed span present —
    orderless days surface as explicit 0 rows (672 of 2,405 days at
    sf0.01; a plain GROUP BY silently loses them, breaking any
    downstream rolling/lag computation). Plan: predicate-pushdown read
    → per-batch cents combiner → day groupby-Sum (one row per
    populated day) → distributed grid generate + hash LEFT join fill
    (stages/calendar.py). Only day-sized rows ever shuffle."""
    import pyarrow.dataset as pads

    from ray.data.aggregate import Max, Min, Sum

    from pdf_table_extractor_ray.stages.calendar import dense_time_fill

    ds = _read(
        sf_dir,
        "orders",
        ["o_orderdate", "o_totalprice"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    )

    def combiner(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("o_orderdate"), pa.int64()).to_numpy(zero_copy_only=False)
        day = (ts // _DAY_US) * _DAY_US
        cents = np.floor(
            b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        ud, inv = np.unique(day, return_inverse=True)
        part = np.zeros(len(ud), np.int64)
        np.add.at(part, inv, cents)
        return pa.table(
            {"day_us": pa.array(ud, pa.int64()), "part": pa.array(part, pa.int64())}
        )

    agg = (
        ds.map_batches(combiner, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day_us")
        .aggregate(Sum("part"))
        .map_batches(
            lambda b: pa.table(
                {
                    "day_us": b.column("day_us"),
                    "rev_cents": pc.cast(b.column("sum(part)"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    ).materialize()  # bounded: one row per populated day; read twice below
    bounds = agg.aggregate(Min("day_us"), Max("day_us"))  # two scalars
    return dense_time_fill(
        agg,
        "day_us",
        "rev_cents",
        step_us=_DAY_US,
        lo_us=int(bounds["min(day_us)"]),
        hi_us=int(bounds["max(day_us)"]),
    )


def _q_user_event_runs(sf_dir: str):
    """Gaps-and-islands run collapse: per user, consecutive
    equal-event_type events (in ts, event_id order) collapse into
    runs; emits (user_id, n_runs, max_run). The SQL islands trick
    (difference of two row_numbers) re-expressed as one bucket shuffle
    + lexsort + boundary masks (stages/sessions.py run_length_stats —
    group count fixed at 64 buckets whatever the user count)."""
    from pdf_table_extractor_ray.stages.sessions import run_length_stats

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    return run_length_stats(ds)


def _q_order_skyline(sf_dir: str):
    """2-D Pareto skyline of orders — earliest-date / highest-price
    dominance frontier (minimize o_orderdate, maximize o_totalprice;
    exact integer cents): the orders no other order beats on both
    axes. Distributive local-frontier-then-merge plan
    (stages/skyline.py): each block reduces to ~O(log B) frontier rows
    before any movement; one single-block merge finishes."""
    from pdf_table_extractor_ray.stages.skyline import pareto_frontier

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def to_ints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day_us": pc.cast(b.column("o_orderdate"), pa.int64()),
                "price_cents": pa.array(
                    np.floor(
                        b.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    pts = ds.map_batches(to_ints, batch_format="pyarrow", zero_copy_batch=True)
    return pareto_frontier(pts, "day_us", "price_cents")


def _q_embedding_dim_stats(sf_dir: str):
    """Per-dimension feature-scaler statistics over the embedding
    column: n, Σ micro, Σ micro² per 1-based dim, integer-exact
    (stages/similarity.py dim_moments) — the mean/variance mass a
    standardization step needs before clustering/ANN. Only d slim
    partial rows leave each batch; vectors never shuffle."""
    from pdf_table_extractor_ray.stages.similarity import dim_moments

    return dim_moments(_read(sf_dir, "embeddings", ["embedding"]))


def _q_part_primary_suppliers(sf_dir: str):
    """Deterministic ownership assignment (the partition-owner
    primitive: every part gets exactly ONE owner — its lowest-key
    supplier among all who ever shipped it), then parts-owned per
    supplier. Plan: groupby(part).Min(supp) — Ray pre-combines the Min
    per block, so only (part, partial-min) rows shuffle, never the
    600k fact rows — → per-supplier Count over the part-sized
    result."""
    from ray.data.aggregate import Count, Min

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    owners = ds.groupby("l_partkey").aggregate(Min("l_suppkey"))

    def owner_col(b: pa.Table) -> pa.Table:
        return pa.table(
            {"l_suppkey": pc.cast(b.column("min(l_suppkey)"), pa.int64())}
        )

    return (
        owners.map_batches(owner_col, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Count())
        .map_batches(
            lambda b: pa.table(
                {
                    "l_suppkey": b.column("l_suppkey"),
                    "n_owned": pc.cast(b.column("count()"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def _q_distinct_users_by_type_exact(sf_dir: str):
    """EXACT grouped COUNT(DISTINCT): distinct users per event type via
    two chained groupbys — (type, user) distinct-collapse (Ray
    pre-combines per block, so repeated users within a block collapse
    before the shuffle) → per-type Count. The exact counterpart of the
    HLL-sketch `distinct_users_by_type`; costs a pair-sized shuffle
    where the sketch ships 2 KB per type, which is the trade a 100-TB
    pipeline chooses per query."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def drop_nulls(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("event_type")), pc.is_valid(b.column("user_id")))
        return b.filter(m)

    pairs = (
        ds.map_batches(drop_nulls, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "user_id"])
        .aggregate(Count())
    )
    return (
        pairs.map_batches(lambda b: b.select(["event_type"]), batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count())
        .map_batches(
            lambda b: pa.table(
                {
                    "event_type": b.column("event_type"),
                    "n_users": pc.cast(b.column("count()"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def _q_full_priority_customers(sf_dir: str):
    """Relational division (the FOR ALL quantifier): customers who
    placed orders in EVERY distinct order priority. Plan: distinct
    (cust, prio) via groupby → per-cust distinct-priority Count →
    filter count == |priority domain| (the divisor cardinality, a
    one-row aggregate). Only pair-sized rows shuffle."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    pairs = (
        ds.groupby(["o_custkey", "o_orderpriority"])
        .aggregate(Count())
        .map_batches(
            lambda b: b.select(["o_custkey", "o_orderpriority"]), batch_format="pyarrow"
        )
    ).materialize()  # read twice: divisor cardinality + per-cust counts
    n_prios = int(
        pairs.map_batches(
            lambda b: b.select(["o_orderpriority"]), batch_format="pyarrow"
        )
        .groupby("o_orderpriority")
        .aggregate(Count())
        .count()
    )
    per_cust = pairs.groupby("o_custkey").aggregate(Count())

    def full(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("count()"), n_prios))
        return pa.table({"o_custkey": f.column("o_custkey")})

    return per_cust.map_batches(full, batch_format="pyarrow")


def _q_churned_users_dod(sf_dir: str):
    """Day-over-day churn (temporal anti-join): per epoch-day, how
    many users were active that day but have NO events the following
    day. Plan: distinct (user, day) pairs → shift day forward by
    one on a copy → hash LEFT ANTI join (active@d ⟂ active@d+1) →
    per-day Count. The last observed day is excluded (its following
    day is unobservable, every user would count as churned). Packed
    (user, day) int64 join key: day ordinal < 2^20 (epoch days reach
    that in year ~4840), user_id < 2^43 by contract."""
    from ray.data.aggregate import Count, Max

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def to_day(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("user_id")), pc.is_valid(b.column("ts")))
        f = b.filter(m)
        ts = pc.cast(f.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        dy = ts // _DAY_US  # days since epoch
        return pa.table(
            {"user_id": f.column("user_id"), "day": pa.array(dy, pa.int64())}
        )

    pairs = (
        ds.map_batches(to_day, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "day"])
        .aggregate(Count())
        .map_batches(lambda b: b.select(["user_id", "day"]), batch_format="pyarrow")
    ).materialize()  # slim (user, day) distinct pairs; read three ways below
    last_day = int(pairs.aggregate(Max("day"))["max(day)"])

    def key_this(b: pa.Table) -> pa.Table:
        f = b.filter(pc.less(b.column("day"), last_day))
        u = f.column("user_id").to_numpy(zero_copy_only=False)
        d = f.column("day").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "ud": pa.array(u * (1 << 20) + (d + 1), pa.int64()),
                "day": pa.array(d, pa.int64()),
            }
        )

    def key_next(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        d = b.column("day").to_numpy(zero_copy_only=False)
        return pa.table({"ud": pa.array(u * (1 << 20) + d, pa.int64())})

    left = pairs.map_batches(key_this, batch_format="pyarrow", zero_copy_batch=True)
    right = pairs.map_batches(key_next, batch_format="pyarrow", zero_copy_batch=True)
    churned = hash_shuffle_join(left, right, on="ud", how="left_anti")
    return (
        churned.groupby("day")
        .aggregate(Count())
        .map_batches(
            lambda b: pa.table(
                {
                    "day": b.column("day"),
                    "n_churned": pc.cast(b.column("count()"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def _q_new_users_daily(sf_dir: str):
    """User-acquisition curve: per epoch-day, the number of users whose
    FIRST-ever event lands on that day, plus the running cumulative
    user count. Plan: per-batch (user → min day) partial → groupby
    user Min (first-seen day) → per-day Count → single-block running
    sum (bounded: one row per day). Only (user, day) partials
    shuffle."""
    from ray.data.aggregate import Count, Min

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("user_id")), pc.is_valid(b.column("ts")))
        f = b.filter(m)
        u = f.column("user_id").to_numpy(zero_copy_only=False)
        d = pc.cast(f.column("ts"), pa.int64()).to_numpy(zero_copy_only=False) // _DAY_US
        uu, inv = np.unique(u, return_inverse=True)
        md = np.full(len(uu), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(md, inv, d)
        return pa.table(
            {"user_id": pa.array(uu, pa.int64()), "day": pa.array(md, pa.int64())}
        )

    first_day = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .aggregate(Min("day"))
        .map_batches(
            lambda b: pa.table({"day": pc.cast(b.column("min(day)"), pa.int64())}),
            batch_format="pyarrow",
        )
    )
    per_day = first_day.groupby("day").aggregate(Count())

    def running(b: pa.Table) -> pa.Table:
        d = b.column("day").to_numpy(zero_copy_only=False)
        n = pc.cast(b.column("count()"), pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(d, kind="stable")
        ds_, ns_ = d[order], n[order]
        return pa.table(
            {
                "day": pa.array(ds_, pa.int64()),
                "n_new": pa.array(ns_, pa.int64()),
                "cum_users": pa.array(np.cumsum(ns_), pa.int64()),
            }
        )

    # bounded: one row per active day — single-block cumulative pass
    return per_day.repartition(1).map_batches(
        running, batch_format="pyarrow", batch_size=None
    )


def _daily_order_cents(sf_dir: str):
    """Shared day-axis rollup: total order value (integer cents) per
    epoch-µs day — per-batch np.add.at combiner, one day-keyed
    groupby-Sum. The output is bounded by the calendar span (~2,400
    rows at any scale), so downstream consumers may fan out or
    materialize it under the bounded-cardinality contract."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def combiner(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("o_orderdate"), pa.int64()).to_numpy(zero_copy_only=False)
        day = (ts // _DAY_US) * _DAY_US
        cents = np.floor(_nn(b.column("o_totalprice")) * 100).astype(np.int64)
        ud, inv = np.unique(day, return_inverse=True)
        part = np.zeros(len(ud), np.int64)
        np.add.at(part, inv, cents)
        return pa.table(
            {"day_us": pa.array(ud, pa.int64()), "part": pa.array(part, pa.int64())}
        )

    return (
        ds.map_batches(combiner, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day_us")
        .aggregate(Sum("part"))
        .map_batches(
            lambda b: pa.table(
                {
                    "day_us": b.column("day_us"),
                    "cents": pc.cast(b.column("sum(part)"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def _q_trailing_7d_revenue(sf_dir: str):
    """Trailing 7-day revenue per populated day — the RANGE-window sum
    (day-6 .. day) every dashboard needs, WITHOUT the window sort: the
    bounded daily rollup fans each day's total out to the ≤7 anchor
    days it serves (a 0-cents sentinel marks the day itself as real),
    one more day-keyed groupby folds the window, and anchors past the
    data's edge — fan-out targets that are not populated days — are
    dropped by the sentinel (real == 0), matching the join oracle's
    d1-anchored semantics. Row traffic after the first rollup is ≤7×
    the day count, independent of the order count."""
    from ray.data.aggregate import Sum

    daily = _daily_order_cents(sf_dir)

    def fan_out(b: pa.Table) -> pa.Table:
        day = b.column("day_us").to_numpy(zero_copy_only=False)
        cents = b.column("cents").to_numpy(zero_copy_only=False)
        n = len(day)
        offs = np.arange(7, dtype=np.int64) * _DAY_US
        anchor = (day[:, None] + offs[None, :]).ravel()
        val = np.repeat(cents, 7)
        real = np.zeros(n * 7, np.int64)
        real[::7] = 1  # offset 0 == the day itself: marks it populated
        return pa.table(
            {
                "day_us": pa.array(anchor, pa.int64()),
                "cents": pa.array(val, pa.int64()),
                "real": pa.array(real, pa.int64()),
            }
        )

    folded = (
        daily.map_batches(fan_out, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day_us")
        .aggregate(Sum("cents"), Sum("real"))
    )

    def finish(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "day_us": b.column("day_us"),
                "trail7_cents": pc.cast(b.column("sum(cents)"), pa.int64()),
                "real": pc.cast(b.column("sum(real)"), pa.int64()),
            }
        )
        return t.filter(pc.greater(t.column("real"), 0)).select(
            ["day_us", "trail7_cents"]
        )

    return folded.map_batches(finish, batch_format="pyarrow")


def _q_revenue_autocorr(sf_dir: str):
    """Lag-1 Pearson autocorrelation of the daily revenue series —
    the is-today-predicted-by-yesterday signal over calendar-adjacent
    populated days. The pair axis is the bounded daily rollup
    (bounded-cardinality contract), so the lag match + co-moments run
    on the driver in arbitrary-precision Python ints (daily cents² ×
    days overflows int64 — exactly why this is NOT a Sum-of-int64
    shuffle); one float64 rounding per term mirrors the oracle's
    CAST-AS-DOUBLE/sqrt ops bit-for-bit."""
    import math

    rows = _daily_order_cents(sf_dir).take_all()
    day = np.array([r["day_us"] for r in rows], np.int64)
    cents = np.array([r["cents"] for r in rows], np.int64)
    order = np.argsort(day)
    day, cents = day[order], cents[order]
    # pairs (x=day d, y=day d+1) where both calendar days are populated
    nxt = np.searchsorted(day, day + _DAY_US)
    ok = (nxt < len(day)) & (day[np.minimum(nxt, len(day) - 1)] == day + _DAY_US)
    x = cents[ok]
    y = cents[np.minimum(nxt, len(day) - 1)[ok]]
    n = int(len(x))
    if n == 0:
        corr = float("nan")
    else:
        xi = [int(v) for v in x]
        yi = [int(v) for v in y]
        sx, sy = sum(xi), sum(yi)
        sxy = sum(a * b for a, b in zip(xi, yi))
        sxx = sum(a * a for a in xi)
        syy = sum(b * b for b in yi)
        num = n * sxy - sx * sy
        da, db = n * sxx - sx * sx, n * syy - sy * sy
        corr = (
            float(num) / math.sqrt(float(da) * float(db))
            if da > 0 and db > 0
            else float("nan")
        )
    return pa.table(
        {
            "n_pairs": pa.array([n], pa.int64()),
            "lag1_corr": pa.array([corr], pa.float64()),
        }
    )


def _q_weekday_revenue(sf_dir: str):
    """Day-of-week seasonality profile: total order value and populated
    day count per weekday (0 = Thursday epoch anchor shifted so
    0 = Monday via the +4 offset). Folds the shared bounded daily
    rollup — 7 output rows; the only full-data pass is the daily cents
    combiner."""
    from ray.data.aggregate import Count, Sum

    daily = _daily_order_cents(sf_dir)

    def weekday(b: pa.Table) -> pa.Table:
        day = b.column("day_us").to_numpy(zero_copy_only=False) // _DAY_US
        return pa.table(
            {
                "weekday": pa.array((day + 4) % 7, pa.int64()),
                "cents": b.column("cents"),
            }
        )

    agg = (
        daily.map_batches(weekday, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("weekday")
        .aggregate(Sum("cents"), Count())
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "weekday": b.column("weekday"),
                "rev_cents": pc.cast(b.column("sum(cents)"), pa.int64()),
                "n_days": pc.cast(b.column("count()"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _q_dup_cluster_sizes(sf_dir: str):
    """Cluster-size histogram of the connected-components output —
    the dedup REPORT every corpus-prep run ends with (how much mass
    sits in pairs vs giant near-dup families). Two slim groupbys on
    top of the CC fixed point: per-root member count, then per-size
    cluster count; verifies component SIZES end-to-end against the
    window oracle, complementing dup_clusters' membership check."""
    from ray.data.aggregate import Count

    cc = _q_dup_clusters(sf_dir)  # (node, root), multi-member clusters only
    sizes = cc.groupby("root").aggregate(Count())

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"cluster_size": pc.cast(b.column("count()"), pa.int64())})

    hist = (
        sizes.map_batches(rename, batch_format="pyarrow")
        .groupby("cluster_size")
        .aggregate(Count())
    )
    return hist.map_batches(
        lambda b: pa.table(
            {
                "cluster_size": b.column("cluster_size"),
                "n_clusters": pc.cast(b.column("count()"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _daily_rollup_spec():
    """Shared RollupSpec: per epoch-µs day, order revenue (integer
    cents) and order count — additive measures only, the retraction
    contract of pipelines/incremental.py."""
    from pdf_table_extractor_ray.pipelines.incremental import RollupSpec

    def combine(b: pa.Table) -> pa.Table:
        ts = pc.cast(b.column("o_orderdate"), pa.int64()).to_numpy(zero_copy_only=False)
        day = (ts // _DAY_US) * _DAY_US
        cents = np.floor(_nn(b.column("o_totalprice")) * 100).astype(np.int64)
        ud, inv = np.unique(day, return_inverse=True)
        rev = np.zeros(len(ud), np.int64)
        np.add.at(rev, inv, cents)
        n = np.bincount(inv, minlength=len(ud)).astype(np.int64)
        return pa.table(
            {
                "day_us": pa.array(ud, pa.int64()),
                "rev_cents": pa.array(rev, pa.int64()),
                "n_orders": pa.array(n, pa.int64()),
            }
        )

    return RollupSpec(keys=("day_us",), measures=("rev_cents", "n_orders"), combine=combine)


def _q_incremental_daily_rollup(sf_dir: str):
    """Incremental materialized-rollup maintenance end-to-end: the
    orders table arrives as 4 hash shards folded one update at a time
    into a generation-atomic store (pipelines/incremental.py) — each
    update reads ONLY its new shard, retractions ready for changed
    shards, snapshot merge unions rollup-sized inputs only. The final
    snapshot must equal the one-shot SQL rollup (hash-verified), the
    incremental-view-maintenance invariant."""
    import tempfile

    import pyarrow.parquet as pq

    from pdf_table_extractor_ray.pipelines.incremental import update_rollup

    spec = _daily_rollup_spec()

    # mint 4 deterministic ingestion shards of orders (cached per sf)
    shard_dir = os.path.join(
        "/tmp/pdfx_incremental", f"{_sf_name(sf_dir)}_orders4"
    )
    marker = os.path.join(shard_dir, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(shard_dir, exist_ok=True)
        t = pq.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate", "o_totalprice"]
        )
        key = pc.cast(t.column("o_orderkey"), pa.int64()).to_numpy(zero_copy_only=False)
        for pid in range(4):
            pq.write_table(
                t.filter(pa.array(key % 4 == pid)),
                os.path.join(shard_dir, f"shard-{pid}.parquet"),
            )
        with open(marker, "w") as f:
            f.write("ok")

    store = tempfile.mkdtemp(prefix="rollup_store_", dir="/tmp")
    snap = None
    shards = {}
    for pid in range(4):  # one arriving shard per update
        shards[str(pid)] = os.path.join(shard_dir, f"shard-{pid}.parquet")
        snap = update_rollup(store, spec, dict(shards))
    return snap


def _q_zone_pruned_revenue(sf_dir: str):
    """Zone-map data skipping end-to-end: orders re-laid-out as 16
    date-CLUSTERED parquet files (minted once per sf), a one-year (1997) band
    scan prunes non-intersecting files from footer metadata alone
    (stages/zonemap.py), and the monthly revenue rollup over the
    survivors must hash-match the SQL band filter over the original
    table — pruning is I/O-only, never semantics. The query asserts
    its PruneCertificate actually skipped files (the clustered layout
    guarantees it); the unclustered/conservative paths are pytest-
    covered."""
    import datetime

    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.zonemap import pruned_read

    shard_dir = os.path.join("/tmp/pdfx_zonemap", f"{_sf_name(sf_dir)}_orders16")
    marker = os.path.join(shard_dir, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(shard_dir, exist_ok=True)
        t = pq.read_table(
            f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
        ).sort_by("o_orderdate")
        n = t.num_rows
        for i in range(16):
            pq.write_table(
                t.slice(i * n // 16, (i + 1) * n // 16 - i * n // 16),
                os.path.join(shard_dir, f"part-{i:02d}.parquet"),
            )
        with open(marker, "w") as f:
            f.write("ok")
    paths = [
        os.path.join(shard_dir, p)
        for p in os.listdir(shard_dir)
        if p.endswith(".parquet")
    ]

    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1998, 1, 1) - datetime.timedelta(microseconds=1)
    ds, cert = pruned_read(
        paths, "o_orderdate", lo, hi, columns=["o_orderdate", "o_totalprice"]
    )
    if cert.files_read >= cert.files_total:
        raise AssertionError(
            f"clustered layout failed to prune: {cert}"
        )

    def monthly(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate")
        ym = pc.add(
            pc.multiply(pc.cast(pc.year(d), pa.int64()), 100),
            pc.cast(pc.month(d), pa.int64()),
        ).to_numpy(zero_copy_only=False)
        cents = np.floor(_nn(b.column("o_totalprice")) * 100).astype(np.int64)
        uk, inv = np.unique(ym, return_inverse=True)
        s = np.zeros(len(uk), np.int64)
        np.add.at(s, inv, cents)
        return pa.table(
            {"ym": pa.array(uk, pa.int64()), "part": pa.array(s, pa.int64())}
        )

    agg = (
        ds.map_batches(monthly, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ym")
        .aggregate(Sum("part"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "ym": b.column("ym"),
                "rev_cents": pc.cast(b.column("sum(part)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _q_bucketed_priority_revenue(sf_dir: str):
    """SMB bucketed co-located join end-to-end: orders and lineitem are
    re-laid-out ONCE per sf as hash-bucketed parquet (32 buckets on the
    orderkey, stages/bucketed.py), then the orders x lineitem join runs
    with ZERO shuffle — one task per bucket reads its bucket from both
    layouts and joins locally with Arrow's native hash join. Revenue
    cents per order priority over the join must hash-match the plain
    SQL join — bucketing is layout-only, never semantics. The one-time
    layout write is the amortized exchange; every later join on the
    orderkey is map-only (the Hive/Iceberg bucket-transform story)."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.bucketed import bucketed_join, write_bucketed

    base = os.path.join("/tmp/pdfx_bucketed", _sf_name(sf_dir))
    odir, ldir = os.path.join(base, "orders32"), os.path.join(base, "lineitem32")
    marker = os.path.join(base, "_COMPLETE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
        write_bucketed(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]),
            "o_orderkey",
            32,
            odir,
        )
        write_bucketed(
            _read(
                sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
            ),
            "l_orderkey",
            32,
            ldir,
        )
        with open(marker, "w") as f:
            f.write("ok")

    joined = bucketed_join(
        odir,
        ldir,
        "o_orderkey",
        "l_orderkey",
        left_cols=["o_orderpriority"],
        right_cols=["l_extendedprice", "l_discount"],
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "o_orderpriority": pa.array([], pa.string()),
                    "rev_c": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ext = _nn(b.column("l_extendedprice"))
        disc = _nn(b.column("l_discount"))
        cents = np.floor(ext * (1 - disc) * 100).astype(np.int64)
        t = pa.table({"o_orderpriority": b.column("o_orderpriority"), "rev_c": cents})
        return (
            pa.TableGroupBy(t, ["o_orderpriority"])
            .aggregate([("rev_c", "sum"), ([], "count_all")])
            .rename_columns(["o_orderpriority", "rev_c", "n"])
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderpriority")
        .aggregate(Sum("rev_c"), Sum("n"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "o_orderpriority": b.column("o_orderpriority"),
                "rev_cents": pc.cast(b.column("sum(rev_c)"), pa.int64()),
                "n_items": pc.cast(b.column("sum(n)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _q_term_contexts(sf_dir: str):
    """KWIC concordance for the term 'data': occurrence count + first
    ±30-char context window per matching doc — one RE2 extraction on
    both oracle sides (stages/search.py term_contexts)."""
    from pdf_table_extractor_ray.stages.search import term_contexts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return term_contexts(ds, "data")


def _q_value_weighted_median(sf_dir: str):
    """EXACT quantity-weighted median of l_extendedprice (the
    importance-weighted percentile primitive: each row counts with its
    integer weight). Radix-bisection selection over a slim (u64, w)
    materialization — no sort, ≤6 passes, ≤4096 driver rows per pass
    (stages/sketches.py weighted_median)."""
    from pdf_table_extractor_ray.stages.sketches import weighted_median

    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])
    m = weighted_median(ds, "l_extendedprice", "l_quantity")
    return pa.table({"wmedian": pa.array([m], pa.float64())})


def _q_price_wmedian_by_flag(sf_dir: str):
    """Per-key WEIGHTED exact median: quantity-weighted median
    extendedprice per l_returnflag — the per-domain importance-weighted
    percentile primitive. Same shared radix bisection as
    value_p90_by_type with weight histograms: ≤6 passes regardless of
    key count, only (key, bin, w) slim partials shuffle."""
    from pdf_table_extractor_ray.stages.sketches import weighted_kth_smallest_by

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"])
    t = weighted_kth_smallest_by(
        ds, "l_returnflag", "l_extendedprice", "l_quantity", 1, 2
    )
    return pa.table({"l_returnflag": t.column("key"), "wmedian": t.column("kth")})


def _q_top_supplier_window(sf_dir: str):
    """TPC-H Q15 flavor: the top-revenue supplier(s) for 1996 Q1 —
    argmax WITH TIES against the query's own aggregate. Plan:
    predicate-pushdown read of the ship window → per-batch cents
    combiner → per-supplier Sum (supplier-sized result) → one Max
    scalar → equality filter. No join: the max is a broadcast-free
    driver scalar; ties survive (SQL = WHERE rev = (SELECT max(...)))."""
    from datetime import datetime

    import pyarrow.dataset as pads

    from ray.data.aggregate import Max, Sum

    lo = datetime(1996, 1, 1)
    hi = datetime(1996, 4, 1)
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    def combiner(b: pa.Table) -> pa.Table:
        s = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        price = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        us, inv = np.unique(s, return_inverse=True)
        part = np.zeros(len(us), np.int64)
        np.add.at(part, inv, cents)
        return pa.table(
            {"l_suppkey": pa.array(us, pa.int64()), "part": pa.array(part, pa.int64())}
        )

    rev = (
        ds.map_batches(combiner, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_suppkey")
        .aggregate(Sum("part"))
        .map_batches(
            lambda b: pa.table(
                {
                    "l_suppkey": b.column("l_suppkey"),
                    "rev_cents": pc.cast(b.column("sum(part)"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    ).materialize()  # bounded: one row per supplier; read twice below
    top = int(rev.aggregate(Max("rev_cents"))["max(rev_cents)"])
    return rev.map_batches(
        lambda b: b.filter(pc.equal(b.column("rev_cents"), top)),
        batch_format="pyarrow",
    )


def _q_small_qty_part_revenue(sf_dir: str):
    """TPC-H Q17 flavor: total revenue of lineitems whose quantity is
    below 20% of their part's average quantity — a fact table joined
    against ITS OWN per-key aggregate with a threshold predicate.
    Exact integer test: qty < sq/(5·n) ⟺ 5·qty·n < sq (quantities are
    integral by data contract). Plan: slim fact projection → per-part
    (Σqty, n) aggregate (part-sized, too big to broadcast) →
    hash-shuffle join fact ⋈ agg on partkey → vectorized predicate →
    one global cents Sum."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])

    def slim(b: pa.Table) -> pa.Table:
        q = np.floor(b.column("l_quantity").to_numpy(zero_copy_only=False)).astype(
            np.int64
        )
        cents = np.floor(
            b.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "qty": pa.array(q, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    fact = ds.map_batches(slim, batch_format="pyarrow", zero_copy_batch=True)

    def agg_partial(b: pa.Table) -> pa.Table:
        p = b.column("l_partkey").to_numpy(zero_copy_only=False)
        q = b.column("qty").to_numpy(zero_copy_only=False)
        up, inv = np.unique(p, return_inverse=True)
        sq = np.zeros(len(up), np.int64)
        np.add.at(sq, inv, q)
        n = np.bincount(inv, minlength=len(up)).astype(np.int64)
        return pa.table(
            {
                "l_partkey": pa.array(up, pa.int64()),
                "sq_p": pa.array(sq, pa.int64()),
                "n_p": pa.array(n, pa.int64()),
            }
        )

    agg = (
        fact.map_batches(agg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_partkey")
        .aggregate(Sum("sq_p"), Sum("n_p"))
        .map_batches(
            lambda b: pa.table(
                {
                    "l_partkey": b.column("l_partkey"),
                    "sq": pc.cast(b.column("sum(sq_p)"), pa.int64()),
                    "n": pc.cast(b.column("sum(n_p)"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    j = hash_shuffle_join(fact, agg, on="l_partkey", how="inner")

    def qualifying(b: pa.Table) -> pa.Table:
        q = b.column("qty").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False)
        sq = b.column("sq").to_numpy(zero_copy_only=False)
        c = b.column("cents").to_numpy(zero_copy_only=False)
        keep = 5 * q * n < sq
        return pa.table({"part": pa.array([int(c[keep].sum())], pa.int64())})

    total = j.map_batches(
        qualifying, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("part"))
    return pa.table(
        {"total_cents": pa.array([int(total["sum(part)"] or 0)], pa.int64())}
    )


def _q_local_supplier_revenue(sf_dir: str):
    """TPC-H Q5 flavor: revenue from line items whose SUPPLIER sits in
    the CUSTOMER's own nation, by nation.

    Join plan (100-TB shapes): supplier/nation are dimensions →
    broadcast; orders ⋈ customer and lineitem ⋈ orders are fact ⋈ fact
    → hash-shuffle joins co-partitioned on their keys (customer is NOT
    broadcast — at web scale it is fact-sized, VERDICT r3 #4 lesson).
    Only slim int key columns ride the shuffles; the nation-equality
    filter and the integer-cents pre-reduce run map-side."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import broadcast_join, hash_shuffle_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders_nk = hash_shuffle_join(orders, cust, on="o_custkey", right_on="c_custkey")

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    li_nk = broadcast_join(li, supp, key="l_suppkey", build_key="s_suppkey")

    joined = hash_shuffle_join(li_nk, orders_nk, on="l_orderkey", right_on="o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("s_nationkey"), b.column("c_nationkey")))
        price = _nn(b.column("l_extendedprice"))
        disc = _nn(b.column("l_discount"))
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        t = pa.table({"s_nationkey": b.column("s_nationkey"), "cents": cents})
        return (
            pa.TableGroupBy(t, ["s_nationkey"])
            .aggregate([("cents", "sum"), ([], "count_all")])
            .rename_columns(["s_nationkey", "cents", "n"])
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("s_nationkey")
        .aggregate(Sum("cents"), Sum("n"))
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    named = broadcast_join(agg, nation, key="s_nationkey", build_key="n_nationkey")
    return named.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("n_name"),
                pc.cast(b.column("sum(n)"), pa.int64()),
                pc.divide(pc.cast(b.column("sum(cents)"), pa.float64()), 100.0),
            ],
            names=["nation", "n_items", "revenue"],
        ),
        batch_format="pyarrow",
    )


def _q_trade_volume_pairs(sf_dir: str):
    """TPC-H Q7 flavor: shipped revenue between DISTINCT
    (supplier nation → customer nation) pairs, by ship year — the
    directed trade-volume matrix.

    Same fact ⋈ fact plan as local_supplier_revenue for the
    lineitem ⋈ orders exchange; the orders ⋈ customer attach runs the
    ADAPTIVE count-then-choose join — customer scales with SF (mid
    table, neither plan safe to hardcode), so one distributed count
    picks broadcast below the threshold and hash-shuffle above it
    (measured r4: the hardcoded second hash-shuffle here paid a whole
    aggregator-pool startup — ~14 s vs ~8 s for the one-exchange Q9 —
    for a build side that fits in a worker heap at bench scale). The
    pre-reduce groups each batch down to ≤ |nations|² × |years| rows
    before the final shuffle, so the wide exchange moves tiny
    partials. Nation names attach AFTER aggregation on the bounded
    pair axis (25-row dim pulled once — registered bounded
    contract)."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import adaptive_join, broadcast_join, hash_shuffle_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders_nk = adaptive_join(orders, cust, on="o_custkey", right_on="c_custkey")

    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    li_nk = broadcast_join(li, supp, key="l_suppkey", build_key="s_suppkey")
    joined = hash_shuffle_join(li_nk, orders_nk, on="l_orderkey", right_on="o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b.column("s_nationkey"), b.column("c_nationkey")))
        price = _nn(b.column("l_extendedprice"))
        disc = _nn(b.column("l_discount"))
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        t = pa.table(
            {
                "s_nationkey": b.column("s_nationkey"),
                "c_nationkey": b.column("c_nationkey"),
                "ship_year": pc.cast(pc.year(b.column("l_shipdate")), pa.int64()),
                "cents": cents,
            }
        )
        return (
            pa.TableGroupBy(t, ["s_nationkey", "c_nationkey", "ship_year"])
            .aggregate([("cents", "sum"), ([], "count_all")])
            .rename_columns(["s_nationkey", "c_nationkey", "ship_year", "cents", "n"])
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["s_nationkey", "c_nationkey", "ship_year"])
        .aggregate(Sum("cents"), Sum("n"))
    )
    # bounded: 25-row nation dim, pulled once; probed twice (both pair ends)
    nt = pa.Table.from_pylist(
        _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    )
    nk = nt.column("n_nationkey").combine_chunks()
    nn_names = nt.column("n_name").combine_chunks()

    def finish(b: pa.Table) -> pa.Table:
        si = pc.index_in(pc.cast(b.column("s_nationkey"), nk.type), value_set=nk)
        ci = pc.index_in(pc.cast(b.column("c_nationkey"), nk.type), value_set=nk)
        if isinstance(si, pa.ChunkedArray):
            si, ci = si.combine_chunks(), ci.combine_chunks()
        return pa.Table.from_arrays(
            [
                nn_names.take(si),
                nn_names.take(ci),
                b.column("ship_year"),
                pc.cast(b.column("sum(n)"), pa.int64()),
                pc.divide(pc.cast(b.column("sum(cents)"), pa.float64()), 100.0),
            ],
            names=["supp_nation", "cust_nation", "ship_year", "n_items", "revenue"],
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_nation_year_flows(sf_dir: str):
    """Outbound (supplier-side) vs inbound (customer-side) revenue per
    (nation, ship/order year) — two independent fact rollups matched
    by a COMPOSITE-KEY hash join (joins.py ``on=[nationkey, year]``:
    the key tuple hashes in one exchange, no synthetic concatenated
    key). Both inputs to the join are already aggregate-sized (≤
    |nations|·|years| rows), so the exchange is nearly free; the heavy
    lifting is the usual per-batch cents partials."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import broadcast_join, hash_shuffle_join

    # outbound: revenue shipped BY each nation's suppliers, by ship year
    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    li_s = broadcast_join(
        li.select_columns(["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]),
        supp,
        key="l_suppkey",
        build_key="s_suppkey",
    )

    def out_partial(b: pa.Table) -> pa.Table:
        price = _nn(b.column("l_extendedprice"))
        disc = _nn(b.column("l_discount"))
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        t = pa.table(
            {
                "nationkey": b.column("s_nationkey"),
                "year": pc.cast(pc.year(b.column("l_shipdate")), pa.int64()),
                "cents": cents,
            }
        )
        return (
            pa.TableGroupBy(t, ["nationkey", "year"])
            .aggregate([("cents", "sum")])
            .rename_columns(["nationkey", "year", "cents"])
        )

    outbound = (
        li_s.map_batches(out_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["nationkey", "year"])
        .aggregate(Sum("cents"))
    )

    def finish_out(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("nationkey"),
                b.column("year"),
                pc.cast(b.column("sum(cents)"), pa.int64()),
            ],
            names=["nationkey", "year", "out_cents"],
        )

    # inbound: revenue bought BY each nation's customers, by order year
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders_nk = hash_shuffle_join(orders, cust, on="o_custkey", right_on="c_custkey")
    li2 = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    li_c = hash_shuffle_join(
        li2,
        orders_nk.select_columns(["o_orderkey", "o_orderdate", "c_nationkey"]),
        on="l_orderkey",
        right_on="o_orderkey",
    )

    def in_partial(b: pa.Table) -> pa.Table:
        price = _nn(b.column("l_extendedprice"))
        disc = _nn(b.column("l_discount"))
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        t = pa.table(
            {
                "nationkey": b.column("c_nationkey"),
                "year": pc.cast(pc.year(b.column("o_orderdate")), pa.int64()),
                "cents": cents,
            }
        )
        return (
            pa.TableGroupBy(t, ["nationkey", "year"])
            .aggregate([("cents", "sum")])
            .rename_columns(["nationkey", "year", "cents"])
        )

    inbound = (
        li_c.map_batches(in_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["nationkey", "year"])
        .aggregate(Sum("cents"))
    )

    def finish_in(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("nationkey"),
                b.column("year"),
                pc.cast(b.column("sum(cents)"), pa.int64()),
            ],
            names=["nationkey", "year", "in_cents"],
        )

    flows = hash_shuffle_join(
        outbound.map_batches(finish_out, batch_format="pyarrow"),
        inbound.map_batches(finish_in, batch_format="pyarrow"),
        on=["nationkey", "year"],
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pc.cast(b.column("nationkey"), pa.int64()),
                b.column("year"),
                b.column("out_cents"),
                b.column("in_cents"),
            ],
            names=["nationkey", "year", "out_cents", "in_cents"],
        )

    return flows.map_batches(finish, batch_format="pyarrow")


def _q_nation_market_share(sf_dir: str):
    """TPC-H Q8 flavor: NATION_0 suppliers' share of ALL revenue sold
    to region-0 customers, per order year.

    Integer-cents sums (total + nation-0 conditional) ride every
    shuffle; the share division happens once per year on the bounded
    year axis, as exact float64 of exact int64 sums — bit-identical to
    the SQL oracle's CAST(… AS DOUBLE) division."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import broadcast_join, hash_shuffle_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders_nk = hash_shuffle_join(orders, cust, on="o_custkey", right_on="c_custkey")
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    orders_rg = broadcast_join(
        orders_nk, nation, key="c_nationkey", build_key="n_nationkey"
    )

    def region0(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(pc.cast(b.column("n_regionkey"), pa.int64()), 0))
        return pa.Table.from_arrays(
            [
                b.column("o_orderkey"),
                pc.cast(pc.year(b.column("o_orderdate")), pa.int64()),
            ],
            names=["o_orderkey", "o_year"],
        )

    orders_f = orders_rg.map_batches(region0, batch_format="pyarrow", zero_copy_batch=True)

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    li_nk = broadcast_join(li, supp, key="l_suppkey", build_key="s_suppkey")
    joined = hash_shuffle_join(li_nk, orders_f, on="l_orderkey", right_on="o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        price = _nn(b.column("l_extendedprice"))
        disc = _nn(b.column("l_discount"))
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        is0 = pc.equal(
            pc.cast(b.column("s_nationkey"), pa.int64()), 0
        ).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "o_year": b.column("o_year"),
                "cents": cents,
                "cents0": np.where(is0, cents, 0),
            }
        )
        return (
            pa.TableGroupBy(t, ["o_year"])
            .aggregate([("cents", "sum"), ("cents0", "sum")])
            .rename_columns(["o_year", "cents", "cents0"])
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_year")
        .aggregate(Sum("cents"), Sum("cents0"))
    )

    def finish(b: pa.Table) -> pa.Table:
        total = pc.cast(b.column("sum(cents)"), pa.int64())
        n0 = pc.cast(b.column("sum(cents0)"), pa.int64())
        share = pc.divide(pc.cast(n0, pa.float64()), pc.cast(total, pa.float64()))
        return pa.Table.from_arrays(
            [b.column("o_year"), total, n0, share],
            names=["o_year", "total_cents", "nation0_cents", "share"],
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_returned_item_customers(sf_dir: str):
    """TPC-H Q10 flavor: top 20 customers by revenue of RETURNED items.

    lineitem is filtered + pre-reduced to (orderkey, cents) partials
    map-side BEFORE any shuffle; the per-customer rollup then joins
    customer hash-shuffled (fact-sized side, never broadcast) and the
    top 20 comes from the partial-top-k merge — no global sort."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import broadcast_join, hash_shuffle_join
    from pdf_table_extractor_ray.stages.topk import global_top_k

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]
    )

    def returned_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        price = _nn(b.column("l_extendedprice"))
        disc = _nn(b.column("l_discount"))
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        t = pa.table({"l_orderkey": b.column("l_orderkey"), "cents": cents})
        return (
            pa.TableGroupBy(t, ["l_orderkey"])
            .aggregate([("cents", "sum")])
            .rename_columns(["l_orderkey", "cents"])
        )

    per_order = li.map_batches(
        returned_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    joined = hash_shuffle_join(per_order, orders, on="l_orderkey", right_on="o_orderkey")
    per_cust = joined.groupby("o_custkey").aggregate(Sum("cents"))
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    with_cust = hash_shuffle_join(per_cust, cust, on="o_custkey", right_on="c_custkey")
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"])
    named = broadcast_join(with_cust, nation, key="c_nationkey", build_key="n_nationkey")

    def slim(b: pa.Table) -> pa.Table:
        # the shuffle join coalesces the right key into the left "on"
        # column — o_custkey IS the customer key after the join
        return pa.Table.from_arrays(
            [
                b.column("o_custkey"),
                b.column("c_name"),
                b.column("n_name"),
                b.column("c_acctbal"),
                pc.cast(b.column("sum(cents)"), pa.int64()),
            ],
            names=["c_custkey", "c_name", "nation", "c_acctbal", "cents"],
        )

    top = global_top_k(
        named.map_batches(slim, batch_format="pyarrow", zero_copy_batch=True),
        [("cents", "descending"), ("c_custkey", "ascending")],
        20,
    )
    return top.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("c_custkey"),
                b.column("c_name"),
                b.column("nation"),
                b.column("c_acctbal"),
                pc.divide(pc.cast(b.column("cents"), pa.float64()), 100.0),
            ],
            names=["c_custkey", "c_name", "nation", "c_acctbal", "revenue"],
        ),
        batch_format="pyarrow",
    )


def _q_big_volume_orders(sf_dir: str):
    """TPC-H Q18 flavor: orders whose TOTAL line-item quantity exceeds
    250 units, with their customer — the fact-vs-own-aggregate HAVING
    shape at order grain.

    Quantity rides as exact centi-units (int64); per-batch pre-reduce
    shrinks lineitem to (orderkey, centi_qty) partials before the
    groupby shuffle; the >threshold filter prunes to a tiny survivor
    set BEFORE the two join shuffles."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_partial(b: pa.Table) -> pa.Table:
        cq = np.floor(_nn(b.column("l_quantity")) * 100).astype(np.int64)
        t = pa.table({"l_orderkey": b.column("l_orderkey"), "cq": cq})
        return (
            pa.TableGroupBy(t, ["l_orderkey"])
            .aggregate([("cq", "sum")])
            .rename_columns(["l_orderkey", "cq"])
        )

    per_order = (
        li.map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("cq"))
    )

    def big(b: pa.Table) -> pa.Table:
        cq = pc.cast(b.column("sum(cq)"), pa.int64())
        t = pa.Table.from_arrays(
            [b.column("l_orderkey"), cq], names=["l_orderkey", "cq"]
        )
        return t.filter(pc.greater(cq, 25000))

    survivors = per_order.map_batches(big, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    with_orders = hash_shuffle_join(
        survivors, orders, on="l_orderkey", right_on="o_orderkey"
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    with_cust = hash_shuffle_join(with_orders, cust, on="o_custkey", right_on="c_custkey")
    # the join coalesces c_custkey into o_custkey; rename on output
    return with_cust.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("o_custkey"),
                b.column("c_name"),
                b.column("l_orderkey"),
                b.column("o_orderdate"),
                b.column("o_totalprice"),
                pc.divide(pc.cast(b.column("cq"), pa.float64()), 100.0),
            ],
            names=[
                "c_custkey",
                "c_name",
                "o_orderkey",
                "o_orderdate",
                "o_totalprice",
                "total_qty",
            ],
        ),
        batch_format="pyarrow",
    )


def _q_promo_revenue(sf_dir: str):
    """TPC-H Q14 flavor: PROMO parts' share of revenue per ship month.

    part is fact-sized at web scale, so lineitem ⋈ part is an honest
    hash-shuffle join on the part key (not a broadcast); the join
    output pre-reduces to ≤ |months| rows per batch, and the share
    division runs on the bounded month axis (exact int64 sums →
    float64, matching the oracle's CAST AS DOUBLE division)."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def promo_flag(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("p_partkey"),
                pc.cast(pc.equal(b.column("p_type"), "PROMO"), pa.int64()),
            ],
            names=["p_partkey", "is_promo"],
        )

    flags = part.map_batches(promo_flag, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_shuffle_join(li, flags, on="l_partkey", right_on="p_partkey")

    def partial(b: pa.Table) -> pa.Table:
        price = _nn(b.column("l_extendedprice"))
        disc = _nn(b.column("l_discount"))
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        ts = pc.cast(b.column("l_shipdate"), pa.int64()).to_numpy(zero_copy_only=False)
        month_us = (
            ts.astype("datetime64[us]").astype("datetime64[M]").astype("datetime64[us]")
        ).astype(np.int64)
        promo = _nn(b.column("is_promo"))
        t = pa.table(
            {
                "month_us": month_us,
                "cents": cents,
                "promo_cents": np.where(promo == 1, cents, 0),
            }
        )
        return (
            pa.TableGroupBy(t, ["month_us"])
            .aggregate([("cents", "sum"), ("promo_cents", "sum")])
            .rename_columns(["month_us", "cents", "promo_cents"])
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("month_us")
        .aggregate(Sum("cents"), Sum("promo_cents"))
    )

    def finish(b: pa.Table) -> pa.Table:
        total = pc.cast(b.column("sum(cents)"), pa.int64())
        promo = pc.cast(b.column("sum(promo_cents)"), pa.int64())
        share = pc.divide(pc.cast(promo, pa.float64()), pc.cast(total, pa.float64()))
        return pa.Table.from_arrays(
            [b.column("month_us"), promo, total, share],
            names=["month_us", "promo_cents", "total_cents", "promo_share"],
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_dormant_rich_customers(sf_dir: str):
    """TPC-H Q22 flavor: customers whose balance exceeds the average
    POSITIVE balance but who placed NO order since 2000-01-01, counted
    per market segment.

    The avg threshold is applied as an EXACT integer cross-multiply
    (cents·N > S, both int64 — no float avg anywhere), computed from
    one slim pre-pass; dormancy is a left_anti hash-shuffle join
    against the filtered orders key stream (the distributed NOT IN)."""
    from ray.data.aggregate import Count, Sum

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"])

    def pos_cents(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("c_acctbal"), 0.0))
        cents = np.floor(_nn(b.column("c_acctbal")) * 100).astype(np.int64)
        return pa.table({"cents": cents})

    stats = cust.map_batches(
        pos_cents, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("cents"), Count())
    s_total = int(stats["sum(cents)"])
    n_pos = int(stats["count()"])

    def rich(b: pa.Table) -> pa.Table:
        cents = np.floor(_nn(b.column("c_acctbal")) * 100).astype(np.int64)
        keep = cents * n_pos > s_total  # exact: cents/1 > S/N ⇔ cents·N > S
        t = pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "c_mktsegment": b.column("c_mktsegment"),
                "cents": cents,
            }
        )
        return t.filter(pa.array(keep))

    rich_ds = cust.map_batches(rich, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def recent(b: pa.Table) -> pa.Table:
        cutoff = pa.scalar(np.datetime64("2000-01-01", "us"))
        return b.filter(pc.greater_equal(b.column("o_orderdate"), cutoff)).select(
            ["o_custkey"]
        )

    recent_keys = orders.map_batches(recent, batch_format="pyarrow", zero_copy_batch=True)
    dormant = hash_shuffle_join(
        rich_ds, recent_keys, on="c_custkey", right_on="o_custkey", how="left_anti"
    )

    def partial(b: pa.Table) -> pa.Table:
        t = b.select(["c_mktsegment", "cents"])
        return (
            pa.TableGroupBy(t, ["c_mktsegment"])
            .aggregate([("cents", "sum"), ([], "count_all")])
            .rename_columns(["c_mktsegment", "cents", "n"])
        )

    from ray.data.aggregate import Sum as _Sum

    agg = (
        dormant.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_mktsegment")
        .aggregate(_Sum("cents"), _Sum("n"))
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("c_mktsegment"),
                pc.cast(b.column("sum(n)"), pa.int64()),
                pc.cast(b.column("sum(cents)"), pa.int64()),
            ],
            names=["c_mktsegment", "n_custs", "bal_cents"],
        ),
        batch_format="pyarrow",
    )


def _q_hybrid_search_rrf(sf_dir: str):
    """Reciprocal-rank fusion (RRF, k=60) of two retrieval rankings:
    BM25 over fixed query terms and a length prior (n_chars desc) —
    the standard hybrid-search merge step of a retrieval pipeline.

    Both rankings come from partial-top-k merges (no global sort);
    fusion runs on the driver over the bounded ≤2k candidate union.
    Scores are 1/(60+rank) sums — identical two-operand float adds on
    both sides, so the query is hash-exact against the SQL window
    oracle, not just rank-exact."""
    from pdf_table_extractor_ray.stages.search import bm25_topk
    from pdf_table_extractor_ray.stages.topk import global_top_k

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    bm = bm25_topk(docs, ["hash", "vector", "window"], k=50)
    ra = dict(
        zip(bm.column("doc_id").to_pylist(), bm.column("rank").to_pylist())
    )
    size = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    # bounded: k=50 rows from the partial-top-k merge
    ln_rows = global_top_k(
        size, [("n_chars", "descending"), ("doc_id", "ascending")], 50
    ).take_all()
    ln_rows.sort(key=lambda r: (-int(r["n_chars"]), int(r["doc_id"])))
    rb = {int(r["doc_id"]): i + 1 for i, r in enumerate(ln_rows)}

    cands = sorted(set(ra) | set(rb))
    scores = [
        (1.0 / (60 + ra[d]) if d in ra else 0.0)
        + (1.0 / (60 + rb[d]) if d in rb else 0.0)
        for d in cands
    ]
    order = sorted(range(len(cands)), key=lambda i: (-scores[i], cands[i]))[:10]
    return pa.table(
        {
            "doc_id": pa.array([cands[i] for i in order], pa.int64()),
            "rrf": pa.array([scores[i] for i in order], pa.float64()),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        }
    )


def _q_value_trend_by_type(sf_dir: str):
    """Per-type OLS trend of event value over time (slope + intercept)
    — grouped linear regression via INTEGER moments: minutes since a
    fixed origin × integer cents, five int64 sums per group riding the
    shuffle, the closed-form solution evaluated once per group on the
    driver in arbitrary-precision Python ints (the n·Sxy−Sx·Sy cross
    terms overflow int64; DuckDB's HUGEINT accumulators are matched
    exactly, then both sides round once to float64)."""
    from ray.data.aggregate import Sum

    origin = int(np.datetime64("2020-01-01", "us").astype(np.int64))
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(b.column("ts")), pc.is_valid(b.column("value"))),
            pc.is_valid(b.column("event_type")),
        )
        f = b.filter(m)
        ts = pc.cast(f.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        mins = (ts - origin) // 60_000_000
        cents = np.floor(_nn(f.column("value")) * 100).astype(np.int64)
        t = pa.table(
            {
                "event_type": f.column("event_type"),
                "n": np.ones(len(mins), np.int64),
                "sd": mins,
                "sv": cents,
                "sdd": mins * mins,
                "sdv": mins * cents,
            }
        )
        return (
            pa.TableGroupBy(t, ["event_type"])
            .aggregate(
                [("n", "sum"), ("sd", "sum"), ("sv", "sum"), ("sdd", "sum"), ("sdv", "sum")]
            )
            .rename_columns(["event_type", "n", "sd", "sv", "sdd", "sdv"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(Sum("n"), Sum("sd"), Sum("sv"), Sum("sdd"), Sum("sdv"))
    )
    rows = agg.take_all()  # bounded: one row per event_type
    rows.sort(key=lambda r: r["event_type"])
    out_t, out_n, out_s, out_i = [], [], [], []
    for r in rows:
        n, sd, sv = int(r["sum(n)"]), int(r["sum(sd)"]), int(r["sum(sv)"])
        sdd, sdv = int(r["sum(sdd)"]), int(r["sum(sdv)"])
        den = n * sdd - sd * sd  # exact Python ints — no int64 overflow
        out_t.append(r["event_type"])
        out_n.append(n)
        out_s.append(float(n * sdv - sd * sv) / float(den))
        out_i.append(float(sv * sdd - sd * sdv) / float(den))
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "n": pa.array(out_n, pa.int64()),
            "slope_cents_per_min": pa.array(out_s, pa.float64()),
            "intercept_cents": pa.array(out_i, pa.float64()),
        }
    )


def _q_user_counts_cms(sf_dir: str):
    """Count-min-sketch point estimates of per-user event counts for a
    fixed probe set (users 0–19) — the fixed-memory frequency oracle a
    streaming pipeline keeps when exact per-key counts don't fit.

    The sketch is a distributed (cell, count) table (≤ depth·width
    bounded keys — the merge shuffle is tiny at any input scale);
    only the probe keys' ≤ depth·20 cells are pulled. Rows-only
    (CM estimates legitimately overestimate); the ≥-true and error-
    bound guarantees are pytest-asserted in test_cms."""
    from pdf_table_extractor_ray.stages.sketches import cms_build, cms_point_estimates

    ds = _read(sf_dir, "events", ["user_id"])
    cms = cms_build(ds, "user_id", width=4096, depth=4)
    keys = pa.array(np.arange(20, dtype=np.int64))
    out = cms_point_estimates(cms, keys, width=4096, depth=4)
    return out.rename_columns(["user_id", "est_n_events"])


def _q_audio_spectral(sf_dir: str):
    """Audio analysis end-to-end: deterministic synthetic PCM-WAV
    clips → Hann-windowed rfft spectral features (rms, centroid,
    bandwidth, rolloff, dominant frequency) through the actor-pool
    stage, floored to integer milli-units for a layout-stable result.
    Rows-only (binary audio has no SQL analog); feature math is
    pytest-verified against a direct in-process oracle in
    test_corpus_ops."""
    import ray.data

    from pdf_table_extractor_ray.stages.multimodal import (
        audio_spectral_features,
        synth_media_corpus,
    )

    corpus = synth_media_corpus()
    audio = corpus.filter(pc.equal(corpus.column("kind"), "audio"))
    ds = ray.data.from_arrow(audio).repartition(4)
    feats = audio_spectral_features(ds, concurrency=(1, 4))

    def to_milli(b: pa.Table) -> pa.Table:
        out = {"media_id": b.column("media_id"), "n_samples": b.column("n_samples")}
        for c in ("rms", "centroid_hz", "bandwidth_hz", "rolloff95_hz", "dominant_hz"):
            out[c + "_milli"] = pc.cast(
                pc.floor(pc.multiply(b.column(c), 1000.0)), pa.int64()
            )
        return pa.table(out)

    return feats.map_batches(to_milli, batch_format="pyarrow", zero_copy_batch=True)


def _q_session_conversion(sf_dir: str):
    """Within-session funnel: share of 30-min-gap sessions containing a
    'view' that also contain a 'click' strictly after the session's
    first view. One bucket shuffle (sessionize's shape), three int64
    counters per bucket, one exact float division at the end."""
    from pdf_table_extractor_ray.stages.sessions import session_funnel

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    return session_funnel(ev, first_step="view", second_step="click")


def _q_last_view_before_click(sf_dir: str):
    """As-of join WITH TOLERANCE (pandas merge_asof semantics): each
    click event ⋈ the same user's most recent view at-or-before it,
    but only within 10 minutes — the bounded-staleness variant of
    last_order_asof. Views are first reduced to one row per
    (user, ts) (max event_id wins) because as-of ties are undefined."""
    from pdf_table_extractor_ray.stages.asof import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def clicks(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "click"))
        return b.select(["event_id", "user_id", "ts"])

    def views(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "view"))
        return pa.Table.from_arrays(
            [b.column("user_id"), b.column("ts"), b.column("event_id")],
            names=["v_user", "v_ts", "view_id"],
        )

    click_ds = ev.map_batches(clicks, batch_format="pyarrow", zero_copy_batch=True)
    view_ds = ev.map_batches(views, batch_format="pyarrow", zero_copy_batch=True)

    from pdf_table_extractor_ray.stages.topk import keep_max_per_key

    # ARGMAX tie-dedup, bucket-vectorized (view_id unique per (user, ts))
    view_1 = keep_max_per_key(view_ds, ["v_user", "v_ts"], "view_id")
    joined = asof_join(
        click_ds,
        view_1,
        on="user_id",
        right_on="v_user",
        left_ts="ts",
        right_ts="v_ts",
        right_cols=["view_id"],
        tolerance_us=10 * 60 * 1_000_000,
    )

    def finish(b: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [
                b.column("event_id"),
                b.column("user_id"),
                pc.cast(b.column("ts"), pa.int64()),
                b.column("view_id"),
            ],
            names=["event_id", "user_id", "ts_us", "view_id"],
        )
        return t.filter(pc.is_valid(t.column("view_id")))  # SQL oracle is inner

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_lang_source_skew(sf_dir: str):
    """Chi-square independence CONTRIBUTIONS for the (source, lang)
    contingency table — the data-quality probe for 'does language mix
    drift by source?'. Observed counts pre-reduce per batch and ride
    one bounded shuffle (≤ |sources|·|langs| cells); marginals and the
    (obs−exp)²/exp cell terms are computed once on the bounded cell
    axis with the exact int→float ops the SQL oracle uses (per-cell
    contributions, not the summed statistic, so no float-summation
    order to disagree on)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"source": b.column("source"), "lang": b.column("lang")})
        return (
            pa.TableGroupBy(t, ["source", "lang"])
            .aggregate([([], "count_all")])
            .rename_columns(["source", "lang", "n"])
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "lang"])
        .aggregate(Sum("n"))
        .take_all()
    )  # bounded: one row per (source, lang) cell
    rows.sort(key=lambda r: (r["source"], r["lang"]))
    obs = {(r["source"], r["lang"]): int(r["sum(n)"]) for r in rows}
    row_tot: dict = {}
    col_tot: dict = {}
    for (s, lg), v in obs.items():
        row_tot[s] = row_tot.get(s, 0) + v
        col_tot[lg] = col_tot.get(lg, 0) + v
    total = sum(obs.values())
    srcs, langs, ns, exps, contribs = [], [], [], [], []
    for (s, lg), v in sorted(obs.items()):
        exp = float(row_tot[s] * col_tot[lg]) / float(total)
        d = float(v) - exp
        srcs.append(s)
        langs.append(lg)
        ns.append(v)
        exps.append(exp)
        contribs.append(d * d / exp)
    return pa.table(
        {
            "source": pa.array(srcs, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "expected": pa.array(exps, pa.float64()),
            "chi2_contrib": pa.array(contribs, pa.float64()),
        }
    )


def _q_orders_snapshot_diff(sf_dir: str):
    """Snapshot reconciliation: diff two versions of the orders table
    (B is a deterministic mutation of A: keys %97 dropped, prices %13
    bumped, keys %101 re-added under new ids) into added / removed /
    changed / unchanged counts.

    No join: both sides union with a side tag and pre-reduce per batch
    to (key, a_cnt, b_cnt, a_cents, b_cents) partials; one keyed
    shuffle, then a vectorized classification and a 4-key rollup —
    the diff of two 100-TB snapshots moves only slim int columns."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def side_a(b: pa.Table) -> pa.Table:
        cents = np.floor(_nn(b.column("o_totalprice")) * 100).astype(np.int64)
        k = _nn(b.column("o_orderkey"))
        return pa.table(
            {
                "k": k,
                "a_cnt": np.ones(len(k), np.int64),
                "b_cnt": np.zeros(len(k), np.int64),
                "a_cents": cents,
                "b_cents": np.zeros(len(k), np.int64),
            }
        )

    def side_b(b: pa.Table) -> pa.Table:
        k = _nn(b.column("o_orderkey"))
        cents = np.floor(_nn(b.column("o_totalprice")) * 100).astype(np.int64)
        keep = k % 97 != 0
        k, cents = k[keep], cents[keep]
        cents = np.where(k % 13 == 0, cents + 100, cents)  # price bump
        add = k % 101 == 0
        k2 = np.concatenate([k, k[add] + 100_000_000])  # re-added under new ids
        c2 = np.concatenate([cents, cents[add]])
        z = np.zeros(len(k2), np.int64)
        return pa.table(
            {
                "k": k2,
                "a_cnt": z,
                "b_cnt": np.ones(len(k2), np.int64),
                "a_cents": z,
                "b_cents": c2,
            }
        )

    tagged = orders.map_batches(
        side_a, batch_format="pyarrow", zero_copy_batch=True
    ).union(orders.map_batches(side_b, batch_format="pyarrow", zero_copy_batch=True))
    agg = tagged.groupby("k").aggregate(
        Sum("a_cnt"), Sum("b_cnt"), Sum("a_cents"), Sum("b_cents")
    )

    def classify(b: pa.Table) -> pa.Table:
        a = pc.cast(b.column("sum(a_cnt)"), pa.int64()).to_numpy(zero_copy_only=False)
        bb = pc.cast(b.column("sum(b_cnt)"), pa.int64()).to_numpy(zero_copy_only=False)
        ac = pc.cast(b.column("sum(a_cents)"), pa.int64()).to_numpy(zero_copy_only=False)
        bc = pc.cast(b.column("sum(b_cents)"), pa.int64()).to_numpy(zero_copy_only=False)
        cls = np.where(
            a == 0, "added", np.where(bb == 0, "removed", np.where(ac != bc, "changed", "unchanged"))
        )
        t = pa.table({"class": pa.array(cls.astype(object), pa.string()),
                      "n": np.ones(len(cls), np.int64)})
        return (
            pa.TableGroupBy(t, ["class"])
            .aggregate([("n", "sum")])
            .rename_columns(["class", "n"])
        )

    out = (
        agg.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("class")
        .aggregate(Sum("n"))
    )
    return out.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("class"), pc.cast(b.column("sum(n)"), pa.int64())],
            names=["class", "n"],
        ),
        batch_format="pyarrow",
    )


def _q_top_bigrams_by_lang(sf_dir: str):
    """Top-5 whitespace bigrams per language — the per-subcorpus
    collocation profile. Per-batch bigram extraction is the LM
    trainer's vectorized ``_doc_ngrams`` kernel; counts pre-reduce per
    batch, ride one slim (lang, bigram, n) shuffle, and the per-lang
    top-5 uses the hot-key-safe grouped_top_k pre-reduce (a language is
    the textbook hot key: one key can own most of the corpus)."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.lm import _doc_bigrams
    from pdf_table_extractor_ray.stages.topk import grouped_top_k

    ds = _read(sf_dir, "documents", ["text", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        g, di, _n = _doc_bigrams(b, "text")
        langs = b.column("lang")
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        t = pa.table({"lang": langs.take(pa.array(di, pa.int64())), "bigram": g})
        return (
            pa.TableGroupBy(t, ["lang", "bigram"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "bigram", "n"])
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["lang", "bigram"])
        .aggregate(Sum("n"))
    )

    def rename(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("lang"), b.column("bigram"), pc.cast(b.column("sum(n)"), pa.int64())],
            names=["lang", "bigram", "n"],
        )

    slim = counts.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_top_k(
        slim, "lang", [("n", "descending"), ("bigram", "ascending")], 5
    )


def _q_phrase_docs(sf_dir: str):
    """Exact-phrase retrieval: documents whose token stream contains
    the adjacent pair 'hash vector' — token-level adjacency (not
    substring match), the positional step past boolean-AND retrieval
    (docs_with_terms). Map-only: the bigram kernel + one equality per
    batch; only matching doc ids leave the scan."""
    from pdf_table_extractor_ray.stages.lm import _doc_bigrams

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def match(b: pa.Table) -> pa.Table:
        g, di, _n = _doc_bigrams(b, "text")
        hit = pc.equal(g, "hash vector").to_numpy(zero_copy_only=False)
        docs = np.unique(di[hit])
        ids = b.column("doc_id").take(pa.array(docs, pa.int64()))
        return pa.table({"doc_id": ids})

    return ds.map_batches(match, batch_format="pyarrow", zero_copy_batch=True)


def _q_source_overlap_matrix(sf_dir: str):
    """Cross-source near-duplicate overlap: the exact n-gram Jaccard
    pairs (same sample/threshold as jaccard_pairs) rolled up by the
    (source_a, source_b) of their endpoints — the 'which feeds
    contaminate each other' matrix a corpus audit wants.

    The pair list is small by construction (near-dups only), but the
    doc→source attach still runs as TWO hash-shuffle joins against the
    full documents table (never a doc-table broadcast), so the plan
    holds when the corpus is 100 TB and the pair list is merely
    large."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.dedup import (
        ngram_jaccard_pairs,
        sample_by_content_hash,
    )
    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    sample = sample_by_content_hash(docs)
    pairs = ngram_jaccard_pairs(sample, width=3, threshold=0.02)

    src = _read(sf_dir, "documents", ["doc_id", "source"])
    j1 = hash_shuffle_join(pairs, src, on="doc_a", right_on="doc_id")

    def rn1(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("doc_a"), b.column("doc_b"), b.column("source")],
            names=["doc_a", "doc_b", "source_a"],
        )

    j1 = j1.map_batches(rn1, batch_format="pyarrow", zero_copy_batch=True)
    j2 = hash_shuffle_join(j1, src, on="doc_b", right_on="doc_id")

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"source_a": b.column("source_a"), "source_b": b.column("source")})
        return (
            pa.TableGroupBy(t, ["source_a", "source_b"])
            .aggregate([([], "count_all")])
            .rename_columns(["source_a", "source_b", "n_pairs"])
        )

    agg = (
        j2.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n_pairs"))
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [
                b.column("source_a"),
                b.column("source_b"),
                pc.cast(b.column("sum(n_pairs)"), pa.int64()),
            ],
            names=["source_a", "source_b", "n_pairs"],
        ),
        batch_format="pyarrow",
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _q_lineitem_corr_matrix(sf_dir: str):
    """Pairwise Pearson correlation matrix over four lineitem measures
    in ONE pass — integer moments (value scale chosen so Σx² fits
    int64: whole units for price, raw units for quantity, percent
    units for discount/tax; bound n·C² < 2^63 documented), cross
    products in arbitrary-precision Python ints on the driver, one
    float64 rounding per term exactly mirroring the oracle's
    CAST-AS-DOUBLE/sqrt ops."""
    import math

    cols = _CORR_COLS
    ds = _read(sf_dir, "lineitem", list(cols))
    pairs = [(i, j) for i in range(len(cols)) for j in range(i + 1, len(cols))]

    def partial(b: pa.Table) -> pa.Table:
        xs = []
        for i, c in enumerate(cols):
            v = _nn(b.column(c))
            scale = 1.0 if c in ("l_quantity", "l_extendedprice") else 100.0
            xs.append(np.floor(v * scale).astype(np.int64))
        out = {"n": pa.array([b.num_rows], pa.int64())}
        for i, c in enumerate(cols):
            out[f"s{i}"] = pa.array([int(xs[i].sum())], pa.int64())
            out[f"s{i}{i}"] = pa.array([int((xs[i] * xs[i]).sum())], pa.int64())
        for i, j in pairs:
            out[f"s{i}{j}"] = pa.array([int((xs[i] * xs[j]).sum())], pa.int64())
        return pa.table(out)

    names = (
        ["n"]
        + [f"s{i}" for i in range(len(cols))]
        + [f"s{i}{i}" for i in range(len(cols))]
        + [f"s{i}{j}" for i, j in pairs]
    )
    sums = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).sum(names)
    g = {k: int(sums[f"sum({k})"]) for k in names}
    n = g["n"]
    ca, cb, corr = [], [], []
    for i, j in pairs:
        num = n * g[f"s{i}{j}"] - g[f"s{i}"] * g[f"s{j}"]
        da = n * g[f"s{i}{i}"] - g[f"s{i}"] ** 2
        db = n * g[f"s{j}{j}"] - g[f"s{j}"] ** 2
        ca.append(cols[i])
        cb.append(cols[j])
        corr.append(float(num) / math.sqrt(float(da) * float(db)))
    return pa.table(
        {
            "col_a": pa.array(ca, pa.string()),
            "col_b": pa.array(cb, pa.string()),
            "corr": pa.array(corr, pa.float64()),
        }
    )


def _q_orders_scd2(sf_dir: str):
    """Slowly-changing-dimension TYPE 2 history build: a deterministic
    3-version change feed (all keys at v1, %7 keys re-priced at v2,
    %21 keys again at v3) → one row per (key, version) with its
    validity horizon (next version, NULL = current) — the
    warehouse-history shape orders_upsert (type 1) discards.

    One bucket shuffle (≤3 rows per key by construction); within a
    bucket the LEAD is a vectorized lexsort + shifted same-key
    compare — no per-key Python."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def feed(b: pa.Table) -> pa.Table:
        k = _nn(b.column("o_orderkey"))
        p = _nn(b.column("o_totalprice"))
        ks, cs, vs = [k], [np.floor((p * 1) * 100).astype(np.int64)], [np.full(len(k), 1, np.int64)]
        m2 = k % 7 == 0
        ks.append(k[m2])
        cs.append(np.floor((p[m2] * 2) * 100).astype(np.int64))
        vs.append(np.full(int(m2.sum()), 2, np.int64))
        m3 = k % 21 == 0
        ks.append(k[m3])
        cs.append(np.floor((p[m3] * 3) * 100).astype(np.int64))
        vs.append(np.full(int(m3.sum()), 3, np.int64))
        kk = np.concatenate(ks)
        return pa.table(
            {
                "o_orderkey": kk,
                "cents": np.concatenate(cs),
                "version": np.concatenate(vs),
                "bucket": (kk % 64).astype(np.int64),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "o_orderkey": pa.array([], pa.int64()),
                    "version": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                    "valid_to_version": pa.array([], pa.int64()),
                    "is_current": pa.array([], pa.int64()),
                }
            )
        k = g.column("o_orderkey").to_numpy(zero_copy_only=False)
        v = g.column("version").to_numpy(zero_copy_only=False)
        c = g.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))
        k, v, c = k[order], v[order], c[order]
        nxt = np.empty(len(k), np.int64)
        same = np.zeros(len(k), bool)
        if len(k) > 1:
            same[:-1] = k[1:] == k[:-1]
            nxt[:-1] = v[1:]
        valid_to = pa.array(np.where(same, nxt, 0), pa.int64())
        valid_to = pc.if_else(pa.array(same), valid_to, pa.scalar(None, pa.int64()))
        return pa.table(
            {
                "o_orderkey": k,
                "version": v,
                "cents": c,
                "valid_to_version": valid_to,
                "is_current": (~same).astype(np.int64),
            }
        )

    return (
        ds.map_batches(feed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def _q_kanon_risk(sf_dir: str):
    """K-anonymity audit over the (nation, segment) quasi-identifier:
    the cells with fewer than k=10 members — each one a re-identifiable
    population — with their sizes. Bounded cell axis (|nations|·
    |segments|); per-batch pre-reduce, one tiny shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "c_nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
                "c_mktsegment": b.column("c_mktsegment"),
            }
        )
        return (
            pa.TableGroupBy(t, ["c_nationkey", "c_mktsegment"])
            .aggregate([([], "count_all")])
            .rename_columns(["c_nationkey", "c_mktsegment", "n"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["c_nationkey", "c_mktsegment"])
        .aggregate(Sum("n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        n = pc.cast(b.column("sum(n)"), pa.int64())
        t = pa.Table.from_arrays(
            [b.column("c_nationkey"), b.column("c_mktsegment"), n],
            names=["c_nationkey", "c_mktsegment", "n"],
        )
        return t.filter(pc.less(n, 10))

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_snm_dup_pairs(sf_dir: str):
    """Sorted-Neighborhood near-dup pairs (stages/snm.py — Hernández &
    Stolfo 1995, the KEY-ADJACENCY blocking the hash-blocking family
    can't express): global (prefix-key, id) sort order via exact
    order-statistic range partitioning, window-5 shifted vectorized
    Levenshtein inside each partition, cross-boundary pairs from the
    2·w·P-row head/tail exchange. Byte-exact vs the DuckDB
    row_number self-join window oracle."""
    from pdf_table_extractor_ray.stages.snm import snm_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return snm_pairs(ds, window=5, max_dist=2, n_parts=8)


def _q_attribution_linear(sf_dir: str):
    """LINEAR multi-touch attribution — the ads-analytics rung above
    last-touch (last_view_before_click): each PURCHASE splits one unit
    of credit EQUALLY across the same user's non-purchase touches in
    the preceding 24 hours, rolled up per touch type. INTEGER-EXACT:
    credit is 1,000,000 micro-units per conversion, split by floor
    division with the remainder going to the earliest touches
    (largest-remainder, ts + event_id order) — so block-order float
    folding can't perturb the result and the DuckDB window oracle
    matches bit-for-bit.

    Shape: both tables project slim and bucket by user (mod 64, the
    sessionize contract); per bucket ONE composite-key searchsorted
    finds every order's touch window over the user's sorted events,
    the pair explosion is repeat/arange vectorized (pairs exist only
    inside the bucket task), credits pre-reduce to per-type partials;
    a tiny groupby-Sum finishes. Raw rows never shuffle twice."""
    from ray.data.aggregate import Sum

    n_buckets = 64
    window_us = 24 * 3_600_000_000
    ev = _read(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])

    def tag(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        is_conv = pc.equal(b.column("event_type"), "purchase")
        eid = pc.cast(b.column("event_id"), pa.int64())
        return pa.table(
            {
                "u": b.column("user_id"),
                "ts_us": pc.cast(b.column("ts"), pa.int64()),
                "eid": eid,
                "etype": pc.if_else(is_conv, pa.scalar(None, pa.string()), b.column("event_type")),
                "okey": pc.if_else(is_conv, eid, pa.scalar(-1, pa.int64())),
                "bucket": pa.array((u % n_buckets).astype(np.int64), pa.int64()),
            }
        )

    tagged = ev.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "credit_part": pa.array([], pa.int64()),
            }
        )
        okey = g.column("okey").to_numpy(zero_copy_only=False)
        is_order = okey >= 0
        if is_order.sum() == 0 or (~is_order).sum() == 0:
            return empty
        uid = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        et = g.column("etype")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        # events sorted by (user, ts, event_id) — the remainder order
        e_u, e_ts, e_eid = uid[~is_order], ts[~is_order], eid[~is_order]
        order_e = np.lexsort((e_eid, e_ts, e_u))
        e_u, e_ts = e_u[order_e], e_ts[order_e]
        codes_all = et.dictionary_encode()
        e_code = (
            codes_all.indices.to_numpy(zero_copy_only=False)[~is_order][order_e]
        ).astype(np.int64)
        vocab = codes_all.dictionary
        o_u, o_ts = uid[is_order], ts[is_order]
        # composite key: user·span + ts (established int64-headroom trick)
        t0 = min(e_ts.min(), (o_ts - window_us).min())
        t1 = max(e_ts.max(), o_ts.max())
        span = np.int64(int(t1) - int(t0) + 2)
        if (int(max(e_u.max(), o_u.max())) + 1) * int(span) >= (1 << 62):
            raise ValueError("attribution: user x time-span exceeds int64 headroom")
        e_key = e_u * span + (e_ts - t0)
        lo = np.searchsorted(e_key, o_u * span + (o_ts - window_us - t0), "left")
        hi = np.searchsorted(e_key, o_u * span + (o_ts - t0), "left")
        n = hi - lo
        keep = n > 0
        if not keep.any():
            return empty
        lo, n = lo[keep], n[keep]
        total = int(n.sum())
        starts = np.repeat(lo, n)
        within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(n) - n, n)
        idx = starts + within
        n_pair = np.repeat(n, n)
        base = 1_000_000 // n_pair
        bonus = (within < np.repeat(1_000_000 % n, n)).astype(np.int64)
        credit = np.zeros(len(vocab), np.int64)
        np.add.at(credit, e_code[idx], base + bonus)
        nz = credit > 0
        return pa.table(
            {
                "event_type": vocab.filter(pa.array(nz)),
                "credit_part": pa.array(credit[nz], pa.int64()),
            }
        )

    agg = (
        tagged.groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("credit_part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "credit_micro": pc.cast(b.column("sum(credit_part)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_ldiversity_census(sf_dir: str):
    """L-DIVERSITY audit — the rung above k-anonymity (kanon_risk): a
    quasi-identifier cell can be large yet still leak if everyone in
    it shares the same sensitive value. Per (nation, segment) cell:
    member count, DISTINCT sensitive-value count (balance floored to
    $1000 brackets), and the l≥3 flag. Chained-groupby exact distinct
    (the distinct_users_by_type_exact shape): per-batch distinct
    triples → one triple groupby → one pair groupby; the raw balance
    column never shuffles past the map."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment", "c_acctbal"])

    def partial(b: pa.Table) -> pa.Table:
        bracket = np.floor(
            b.column("c_acctbal").to_numpy(zero_copy_only=False) / 1000.0
        ).astype(np.int64)
        t = pa.table(
            {
                "c_nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
                "c_mktsegment": b.column("c_mktsegment"),
                "bracket": bracket,
            }
        )
        return (
            pa.TableGroupBy(t, ["c_nationkey", "c_mktsegment", "bracket"])
            .aggregate([([], "count_all")])
            .rename_columns(["c_nationkey", "c_mktsegment", "bracket", "n_part"])
        )

    triples = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["c_nationkey", "c_mktsegment", "bracket"])
        .aggregate(Sum("n_part"))
    )

    def to_pairs(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_nationkey": b.column("c_nationkey"),
                "c_mktsegment": b.column("c_mktsegment"),
                "n_cell": pc.cast(b.column("sum(n_part)"), pa.int64()),
            }
        )

    agg = (
        triples.map_batches(to_pairs, batch_format="pyarrow")
        .groupby(["c_nationkey", "c_mktsegment"])
        .aggregate(Count(), Sum("n_cell"))
    )

    def finish(b: pa.Table) -> pa.Table:
        n_sens = pc.cast(b.column("count()"), pa.int64())
        return pa.table(
            {
                "c_nationkey": b.column("c_nationkey"),
                "c_mktsegment": b.column("c_mktsegment"),
                "n": pc.cast(b.column("sum(n_cell)"), pa.int64()),
                "n_sensitive": n_sens,
                "l_ok": pc.cast(pc.greater_equal(n_sens, 3), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_value_imputed(sf_dir: str):
    """Per-group median imputation: a deterministic null mask (every
    17th event) filled with the event type's EXACT median of the
    remaining values (quantile_disc semantics via the shared radix
    bisection) — the standard feature-cleaning step. Medians broadcast
    via ray.put; the fill is one map-side if_else, no re-shuffle."""
    import ray as _ray

    from pdf_table_extractor_ray.stages.sketches import kth_smallest_by_multi

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def masked(b: pa.Table) -> pa.Table:
        eid = _nn(b.column("event_id"))
        keep = pa.array(eid % 17 != 0)
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": b.column("event_type"),
                "v": pc.if_else(keep, b.column("value"), pa.scalar(None, pa.float64())),
            }
        )

    mds = ds.map_batches(masked, batch_format="pyarrow", zero_copy_batch=True)
    qt = kth_smallest_by_multi(mds, "event_type", "v", [(1, 2)])
    med = {
        k: v for k, v in zip(qt.column("key").to_pylist(), qt.column("kth").to_pylist())
    }
    med_ref = _ray.put(med)

    def fill(b: pa.Table) -> pa.Table:
        m = _ray.get(med_ref)
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = et.dictionary_encode()
        fills = np.array([m[d] for d in enc.dictionary.to_pylist()], np.float64)
        per_row = pa.array(fills[enc.indices.to_numpy(zero_copy_only=False)])
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "event_type": et,
                "value_filled": pc.if_else(pc.is_valid(b.column("v")), b.column("v"), per_row),
            }
        )

    return mds.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)


def _q_mix_rebalance_sample(sf_dir: str):
    """Training-mix rebalancing: deterministically downsample every
    language to (about) the smallest language's mass — per-lang
    acceptance thresholds in 1/256 units from one bounded count
    pre-pass, then a map-side content-hash accept test (md5 first
    byte < threshold, the same oracle-reproducible device as
    doc_sample). Output: per-lang kept counts."""
    import hashlib

    import ray as _ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def count_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"lang": b.column("lang")})
        return (
            pa.TableGroupBy(t, ["lang"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "n"])
        )

    rows = (
        ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(Sum("n"))
        .take_all()
    )  # bounded: one row per language
    counts = {r["lang"]: int(r["sum(n)"]) for r in rows}
    m = min(counts.values())
    thresh = {lg: (m * 256) // n for lg, n in counts.items()}
    t_ref = _ray.put(thresh)

    def sample_partial(b: pa.Table) -> pa.Table:
        th = _ray.get(t_ref)
        langs = b.column("lang").to_pylist()
        texts = b.column("text").to_pylist()
        keep_langs = [
            lg
            for lg, tx in zip(langs, texts)
            if hashlib.md5((tx or "").encode()).digest()[0] < th[lg]
        ]
        if not keep_langs:
            return pa.table(
                {"lang": pa.array([], pa.string()), "n_sampled": pa.array([], pa.int64())}
            )
        t = pa.table({"lang": pa.array(keep_langs, pa.string())})
        return (
            pa.TableGroupBy(t, ["lang"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "n_sampled"])
        )

    agg = (
        ds.map_batches(sample_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .aggregate(Sum("n_sampled"))
    )
    return agg.map_batches(
        lambda b: pa.Table.from_arrays(
            [b.column("lang"), pc.cast(b.column("sum(n_sampled)"), pa.int64())],
            names=["lang", "n_sampled"],
        ),
        batch_format="pyarrow",
    )


def _q_benford_digits(sf_dir: str):
    """Benford's-law audit: first-significant-digit distribution of
    order prices (integer cents) — the classic synthetic-data /
    fraud smell test. Digit extraction is exact (decimal string head,
    no log10 float); counts pre-reduce per batch; shares divide exact
    int64 sums once on the bounded 9-digit axis."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        cents = np.floor(_nn(b.column("o_totalprice")) * 100).astype(np.int64)
        cents = cents[cents > 0]
        s = pc.cast(pa.array(cents), pa.string())
        first = pc.utf8_slice_codeunits(s, 0, 1)
        t = pa.table({"digit": first})
        return (
            pa.TableGroupBy(t, ["digit"])
            .aggregate([([], "count_all")])
            .rename_columns(["digit", "n"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("digit")
        .aggregate(Sum("n"))
        .take_all()
    )  # bounded: nine digit rows
    agg.sort(key=lambda r: r["digit"])
    total = sum(int(r["sum(n)"]) for r in agg)
    return pa.table(
        {
            "digit": pa.array([r["digit"] for r in agg], pa.string()),
            "n": pa.array([int(r["sum(n)"]) for r in agg], pa.int64()),
            "share": pa.array(
                [float(int(r["sum(n)"])) / float(total) for r in agg], pa.float64()
            ),
        }
    )


def _q_rate_limited_events(sf_dir: str):
    """Per-key rate limiting: keep at most 3 events per (user, hour) by
    (ts, event_id) order — the throttling/dedup-cap primitive of an
    ingest pipeline. The (user, hour) key packs into one int64 and the
    cap rides the hot-key-safe grouped_top_k pre-reduce (each batch
    clips itself to ≤3 rows per key BEFORE the shuffle)."""
    from pdf_table_extractor_ray.stages.topk import grouped_top_k

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("user_id")), pc.is_valid(b.column("ts")))
        f = b.filter(m)
        ts = pc.cast(f.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts // 3_600_000_000
        uid = _nn(f.column("user_id"))
        return pa.table(
            {
                "uh": uid * 1_000_000 + hour % 1_000_000,  # packed (user, hour)
                "event_id": f.column("event_id"),
                "ts_us": ts,
            }
        )

    packed = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    kept = grouped_top_k(
        packed, "uh", [("ts_us", "ascending"), ("event_id", "ascending")], 3
    )
    return kept.map_batches(
        lambda b: b.select(["event_id", "ts_us"]),
        batch_format="pyarrow",
    )


def _q_brand_type_fd_audit(sf_dir: str):
    """Functional-dependency discovery audit: does p_brand → p_type
    hold? For every brand report the distinct-type count and the
    violation mass (rows outside the brand's most common type) — the
    profiling primitive behind schema-inference and data-contract
    checks. Shape: one distinct-pair groupby (map-side combiner), then
    per-brand reduce on the bounded (brand × type) axis — the exact
    grouped count-distinct pattern; no row ever shuffles twice."""
    from ray.data.aggregate import Count, Max, Sum

    ds = _read(sf_dir, "part", ["p_brand", "p_type"])

    def pairs(b: pa.Table) -> pa.Table:
        t = pa.table({"p_brand": b.column("p_brand"), "p_type": b.column("p_type")})
        return (
            pa.TableGroupBy(t, ["p_brand", "p_type"])
            .aggregate([([], "count_all")])
            .rename_columns(["p_brand", "p_type", "n_part"])
        )

    per_pair = (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["p_brand", "p_type"])
        .aggregate(Sum("n_part"))
    )

    def slim(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": b.column("p_brand"),
                "n": pc.cast(b.column("sum(n_part)"), pa.int64()),
            }
        )

    per_brand = (
        per_pair.map_batches(slim, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Count(), Sum("n"), Max("n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        n_types = pc.cast(b.column("count()"), pa.int64())
        total = pc.cast(b.column("sum(n)"), pa.int64())
        top = pc.cast(b.column("max(n)"), pa.int64())
        return pa.table(
            {
                "p_brand": b.column("p_brand"),
                "n_types": n_types,
                "n_violations": pc.subtract(total, top),
            }
        )

    return per_brand.map_batches(finish, batch_format="pyarrow")


def _q_event_hour_association(sf_dir: str):
    """Contingency-table independence audit (chi-square residuals in
    EXACT integers): for each observed (event_type, hour-of-day) cell,
    the observed count and the chi-square residual NUMERATOR
    ``o*N - rowtot*coltot`` — positive means the type is over-
    represented in that hour vs independence. Keeping the rational
    numerator (never dividing by the expected count) makes the result
    int64-exact and hash-comparable; the float chi-square statistic is
    one vectorized divide away for consumers. Shape: map-side partial
    counts pre-reduce each batch to <= |types| x 24 rows, the groupby
    sees only partials, and the residual pass runs on the BOUNDED cell
    axis (one block — |types| x 24 rows by contract)."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events", ["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("event_type")), pc.is_valid(b.column("ts")))
        b = b.filter(m)
        t = pa.table(
            {
                "event_type": b.column("event_type"),
                "hour": pc.cast(pc.hour(b.column("ts")), pa.int64()),
            }
        )
        return (
            pa.TableGroupBy(t, ["event_type", "hour"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "hour", "o"])
        )

    cells = (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "hour"])
        .aggregate(Sum("o"))
    )

    def residuals(b: pa.Table) -> pa.Table:
        # bounded axis: |event types| x 24 cells in ONE block
        et = b.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        hour = _nn(b.column("hour"))
        o = _nn(b.column("sum(o)")).astype(np.int64)
        codes = et.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        n = int(o.sum())
        row_tot = np.zeros(codes.max() + 1 if len(codes) else 0, np.int64)
        np.add.at(row_tot, codes, o)
        col_tot = np.zeros(24, np.int64)
        np.add.at(col_tot, hour, o)
        resid = o * n - row_tot[codes] * col_tot[hour]
        return pa.table(
            {
                "event_type": et,
                "hour": pa.array(hour, pa.int64()),
                "observed": pa.array(o, pa.int64()),
                "resid_num": pa.array(resid, pa.int64()),
            }
        )

    return cells.repartition(1).map_batches(residuals, batch_format="pyarrow")


def _q_doclen_ks(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov distance between the doc-length
    distributions of two sources, in EXACT integers — the
    distribution-drift test a corpus monitor runs between crawls or
    between a source and the corpus. D = max_x |F_a(x) − F_b(x)| is
    emitted as the integer numerator ``max_x |n_b·cum_a(x) −
    n_a·cum_b(x)|`` over the pooled support (never dividing by
    n_a·n_b), plus the smallest x attaining it — int64-exact and
    hash-comparable; D itself is one divide away for consumers.

    Shape: map-side per-batch value-count partials over the BOUNDED
    distinct-length axis (lengths, not docs — the ``value_histogram``
    contract), ONE groupby(x) Sum folds the partials, and the
    cumulative scan runs on that bounded axis in one block. Raw docs
    never shuffle."""
    from ray.data.aggregate import Sum

    src_a, src_b = "src0", "src1"
    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        src = b.column("source")
        keep = pc.and_(
            pc.is_in(src, value_set=pa.array([src_a, src_b])),
            pc.is_valid(b.column("n_chars")),
        )
        b = b.filter(keep)
        x = _nn(b.column("n_chars")).astype(np.int64)
        is_a = pc.equal(b.column("source"), src_a).to_numpy(zero_copy_only=False)
        ux, inv = np.unique(x, return_inverse=True)
        ca = np.zeros(len(ux), np.int64)
        cb = np.zeros(len(ux), np.int64)
        np.add.at(ca, inv[is_a], 1)
        np.add.at(cb, inv[~is_a], 1)
        return pa.table(
            {
                "x": pa.array(ux, pa.int64()),
                "ca": pa.array(ca, pa.int64()),
                "cb": pa.array(cb, pa.int64()),
            }
        )

    per_x = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("x")
        .aggregate(Sum("ca"), Sum("cb"))
    )

    def finish(b: pa.Table) -> pa.Table:
        # bounded axis: one row per distinct length, in ONE block
        x = _nn(b.column("x")).astype(np.int64)
        ca = _nn(b.column("sum(ca)")).astype(np.int64)
        cb = _nn(b.column("sum(cb)")).astype(np.int64)
        order = np.argsort(x, kind="stable")
        x, ca, cb = x[order], ca[order], cb[order]
        na, nb = int(ca.sum()), int(cb.sum())
        dv = np.abs(nb * np.cumsum(ca) - na * np.cumsum(cb))
        ks = int(dv.max()) if len(dv) else 0
        at = int(x[int(np.argmax(dv))]) if len(dv) else 0
        return pa.table(
            {
                "n_a": pa.array([na], pa.int64()),
                "n_b": pa.array([nb], pa.int64()),
                "ks_num": pa.array([ks], pa.int64()),
                "ks_at": pa.array([at], pa.int64()),
            }
        )

    return per_x.repartition(1).map_batches(finish, batch_format="pyarrow")


def _q_doclen_mwu(sf_dir: str):
    """Mann–Whitney U rank-sum test between the same two sources'
    doc-length distributions — the KS companion that is sensitive to
    location shift rather than max CDF gap. EXACT integers throughout:
    with ties, the pooled midrank of value x is ``less_x +
    (eq_x+1)/2`` (a half-integer), so the statistic is emitted DOUBLED
    — ``u2_a = Σ_x ca_x·(2·less_x + eq_x + 1) − n_a·(n_a+1)`` = 2·U_a,
    int64-exact and hash-comparable (2·U_b = 2·n_a·n_b − u2_a by the
    rank-sum identity). Same shape as ``doclen_ks``: value-count
    partials on the bounded distinct-length axis, one groupby(x) Sum,
    rank arithmetic on that bounded axis in one block."""
    from ray.data.aggregate import Sum

    src_a, src_b = "src0", "src1"
    ds = _read(sf_dir, "documents", ["source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        src = b.column("source")
        keep = pc.and_(
            pc.is_in(src, value_set=pa.array([src_a, src_b])),
            pc.is_valid(b.column("n_chars")),
        )
        b = b.filter(keep)
        x = _nn(b.column("n_chars")).astype(np.int64)
        is_a = pc.equal(b.column("source"), src_a).to_numpy(zero_copy_only=False)
        ux, inv = np.unique(x, return_inverse=True)
        ca = np.zeros(len(ux), np.int64)
        cb = np.zeros(len(ux), np.int64)
        np.add.at(ca, inv[is_a], 1)
        np.add.at(cb, inv[~is_a], 1)
        return pa.table(
            {
                "x": pa.array(ux, pa.int64()),
                "ca": pa.array(ca, pa.int64()),
                "cb": pa.array(cb, pa.int64()),
            }
        )

    per_x = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("x")
        .aggregate(Sum("ca"), Sum("cb"))
    )

    def finish(b: pa.Table) -> pa.Table:
        x = _nn(b.column("x")).astype(np.int64)
        ca = _nn(b.column("sum(ca)")).astype(np.int64)
        cb = _nn(b.column("sum(cb)")).astype(np.int64)
        order = np.argsort(x, kind="stable")
        ca, cb = ca[order], cb[order]
        na, nb = int(ca.sum()), int(cb.sum())
        eq = ca + cb
        less = np.concatenate([[0], np.cumsum(eq)[:-1]])
        u2_a = int((ca * (2 * less + eq + 1)).sum()) - na * (na + 1)
        return pa.table(
            {
                "n_a": pa.array([na], pa.int64()),
                "n_b": pa.array([nb], pa.int64()),
                "u2_a": pa.array([u2_a], pa.int64()),
            }
        )

    return per_x.repartition(1).map_batches(finish, batch_format="pyarrow")


def _q_revenue_cusum(sf_dir: str):
    """CUSUM change-point scan over the daily order-revenue series:
    the day where the cumulative deviation from the series mean peaks
    — the classic level-shift detector. EXACT integers: with k the
    1-based day index, cum_k the running cents total and T the grand
    total over n days, the deviation numerator is ``n·cum_k − k·T``
    (the mean never materializes as a float); emitted are n_days, the
    grand total, max_k |n·cum_k − k·T| and the earliest day attaining
    it. Shape: map-side (day, cents) partials pre-reduce each batch,
    one groupby(day) Sum, then the scan runs on the BOUNDED day axis
    in one block."""
    from ray.data.aggregate import Sum

    _DAY_US = 86_400_000_000
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_valid(b.column("o_orderdate")), pc.is_valid(b.column("o_totalprice"))
        )
        b = b.filter(keep)
        ts = pc.cast(pc.cast(b.column("o_orderdate"), pa.timestamp("us")), pa.int64())
        day = (ts.to_numpy(zero_copy_only=False) // _DAY_US) * _DAY_US
        cents = np.floor(_nn(b.column("o_totalprice")) * 100).astype(np.int64)
        ud, inv = np.unique(day, return_inverse=True)
        tot = np.zeros(len(ud), np.int64)
        np.add.at(tot, inv, cents)
        return pa.table(
            {"day_us": pa.array(ud, pa.int64()), "cents": pa.array(tot, pa.int64())}
        )

    per_day = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day_us")
        .aggregate(Sum("cents"))
    )

    def finish(b: pa.Table) -> pa.Table:
        day = _nn(b.column("day_us")).astype(np.int64)
        cents = _nn(b.column("sum(cents)")).astype(np.int64)
        order = np.argsort(day, kind="stable")
        day, cents = day[order], cents[order]
        n = len(day)
        cum = np.cumsum(cents, dtype=np.int64)
        total = int(cum[-1]) if n else 0
        # headroom contract: n_days · total_cents must fit int64
        # (≈2.4k days × 2.3e10 cents at sf0.1 → 5.5e13; raise, don't wrap)
        if n and total > (1 << 62) // max(n, 1):
            raise ValueError("revenue_cusum: n_days x total_cents exceeds int64")
        k = np.arange(1, n + 1, dtype=np.int64)
        dev = np.abs(np.int64(n) * cum - k * np.int64(total))
        peak = int(dev.max()) if n else 0
        at = int(day[int(np.argmax(dev))]) if n else 0
        return pa.table(
            {
                "n_days": pa.array([n], pa.int64()),
                "total_cents": pa.array([total], pa.int64()),
                "cusum_num": pa.array([peak], pa.int64()),
                "cusum_at_us": pa.array([at], pa.int64()),
            }
        )

    return per_day.repartition(1).map_batches(finish, batch_format="pyarrow")


def _q_revenue_segments(sf_dir: str):
    """Optimal K=4 piecewise-constant segmentation of the daily
    order-revenue series (exact Bellman DP on SSE cost — the
    multi-change-point generalization of ``revenue_cusum``; what
    ruptures' Dynp computes). Segment SSE uses the prefix-sum identity
    ``Σx² − (Σx)²/len`` so the DP needs only two prefix arrays; the
    DP itself is O(n²K) vectorized numpy on the BOUNDED day axis in
    one block (n ≈ 2.4k days — the axis a day-grain series can't
    exceed), after map-side (day, cents) partials and one groupby(day)
    Sum. Rows-only check (float SSE); the pytest oracle enumerates all
    segmentations of a small series. Output: one row per segment —
    (segment 1-based, start_day_us, end_day_us, n_days, sum_cents)."""
    from ray.data.aggregate import Sum

    _DAY_US = 86_400_000_000
    _K = 4
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_valid(b.column("o_orderdate")), pc.is_valid(b.column("o_totalprice"))
        )
        b = b.filter(keep)
        ts = pc.cast(pc.cast(b.column("o_orderdate"), pa.timestamp("us")), pa.int64())
        day = (ts.to_numpy(zero_copy_only=False) // _DAY_US) * _DAY_US
        cents = np.floor(_nn(b.column("o_totalprice")) * 100).astype(np.int64)
        ud, inv = np.unique(day, return_inverse=True)
        tot = np.zeros(len(ud), np.int64)
        np.add.at(tot, inv, cents)
        return pa.table(
            {"day_us": pa.array(ud, pa.int64()), "cents": pa.array(tot, pa.int64())}
        )

    per_day = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day_us")
        .aggregate(Sum("cents"))
    )

    def finish(b: pa.Table) -> pa.Table:
        day = _nn(b.column("day_us")).astype(np.int64)
        cents = _nn(b.column("sum(cents)")).astype(np.int64)
        order = np.argsort(day, kind="stable")
        day, cents = day[order], cents[order]
        bounds = _dp_segment_bounds(cents.astype(np.float64), _K)
        seg_rows = []
        for s, (lo, hi) in enumerate(bounds, 1):  # hi exclusive
            seg_rows.append(
                (s, int(day[lo]), int(day[hi - 1]), hi - lo, int(cents[lo:hi].sum()))
            )
        return pa.table(
            {
                "segment": pa.array([r[0] for r in seg_rows], pa.int64()),
                "start_day_us": pa.array([r[1] for r in seg_rows], pa.int64()),
                "end_day_us": pa.array([r[2] for r in seg_rows], pa.int64()),
                "n_days": pa.array([r[3] for r in seg_rows], pa.int64()),
                "sum_cents": pa.array([r[4] for r in seg_rows], pa.int64()),
            }
        )

    return per_day.repartition(1).map_batches(finish, batch_format="pyarrow")


def _dp_segment_bounds(x: np.ndarray, k: int):
    """Exact optimal k-segmentation of a 1-D series under SSE cost
    (Bellman dynamic program, vectorized over the split axis).
    Returns k (lo, hi_exclusive) index pairs covering [0, n). Ties
    break toward the EARLIEST split (np.argmin first-min), making the
    result deterministic. n×n float matrix — callers guarantee the
    bounded-axis contract (day/hour grain series)."""
    n = len(x)
    k = min(k, n)
    if n == 0:
        return []
    p = np.concatenate([[0.0], np.cumsum(x)])
    q = np.concatenate([[0.0], np.cumsum(x * x)])
    i_idx = np.arange(n + 1)
    # cost[j, i] = SSE of segment x[j:i] (j < i); upper-triangular use only
    sums = p[None, :] - p[:, None]
    sqs = q[None, :] - q[:, None]
    lens = i_idx[None, :] - i_idx[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        cost = np.where(
            lens > 0,
            sqs - sums * sums / np.maximum(lens, 1),
            np.inf,  # empty/backward segments are inadmissible
        )
    dp = np.full((k + 1, n + 1), np.inf)
    arg = np.zeros((k + 1, n + 1), np.int64)
    dp[0, 0] = 0.0
    for s in range(1, k + 1):
        # dp[s, i] = min_j dp[s-1, j] + cost[j, i]
        cand = dp[s - 1][:, None] + cost  # (n+1, n+1)
        arg[s] = np.argmin(cand, axis=0)
        dp[s] = cand[arg[s], i_idx]
    bounds = []
    i = n
    for s in range(k, 0, -1):
        j = int(arg[s, i])
        bounds.append((j, i))
        i = j
    return bounds[::-1]


def _q_readability(sf_dir: str):
    """Per-document Flesch reading-ease signals in EXACT integers: word
    count (non-space runs), sentence count (the ``sentence_stats``
    terminator-run kernel), syllable proxy (ASCII vowel-group runs) and
    the Flesch score's RATIONAL NUMERATOR ``206835·s·w − 1015·w² −
    84600·y·s`` (the score × 1000·s·w — no division anywhere, so the
    column is int64-exact and hash-comparable; the float score is one
    divide by 1000·s·w away, and the zero-sentence/zero-word edge needs
    no guard because nothing divides). Pure map: three RE2 count
    kernels + one integer polynomial per batch, zero shuffle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("text")))
        t = b.column("text")
        w = pc.cast(pc.count_substring_regex(t, r"\S+"), pa.int64())
        s = pc.cast(pc.count_substring_regex(t, r"[.!?]+(\s|$)"), pa.int64())
        y = pc.cast(pc.count_substring_regex(t, r"[aeiouyAEIOUY]+"), pa.int64())
        wn, sn, yn = _nn(w), _nn(s), _nn(y)
        flesch_num = 206835 * sn * wn - 1015 * wn * wn - 84600 * yn * sn
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_words": w,
                "n_sentences": s,
                "n_syllables": y,
                "flesch_num": pa.array(flesch_num, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def _q_hapax_by_source(sf_dir: str):
    """Vocabulary richness per source: distinct whitespace-token count
    and HAPAX LEGOMENA count (tokens occurring exactly once in that
    source) — the corpus-health signal that separates generative
    boilerplate (tiny vocab, few hapax) from organic text. Shape: a
    batch-level (source, token) combiner collapses each block before
    the ONE (source, token) exchange; the hapax test then pre-reduces
    per block to ≤ |sources| partial rows before a tiny groupby. The
    token axis shuffles exactly once; raw text never does."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.lm import _flat_tokens

    ds = _read(sf_dir, "documents", ["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("source")))
        flat, lens = _flat_tokens(b.column("text"))
        src = b.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        rep = pa.array(np.repeat(np.arange(len(lens), dtype=np.int64), lens))
        src_rep = src.take(rep)
        keep = pc.not_equal(flat, "")  # boundary empties from the split
        t = pa.table({"source": src_rep.filter(keep), "token": flat.filter(keep)})
        return (
            pa.TableGroupBy(t, ["source", "token"])
            .aggregate([([], "count_all")])
            .rename_columns(["source", "token", "n"])
        )

    per_tok = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "token"])
        .aggregate(Sum("n"))
    )

    def partial2(b: pa.Table) -> pa.Table:
        n = _nn(b.column("sum(n)")).astype(np.int64)
        t = pa.table(
            {
                "source": b.column("source"),
                "hapax": pa.array((n == 1).astype(np.int64)),
                "one": pa.array(np.ones(len(n), np.int64)),
            }
        )
        return (
            pa.TableGroupBy(t, ["source"])
            .aggregate([("hapax", "sum"), ("one", "sum")])
            .rename_columns(["source", "hapax", "vocab"])
        )

    agg = (
        per_tok.map_batches(partial2, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("hapax"), Sum("vocab"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b.column("source"),
                "hapax": pc.cast(b.column("sum(hapax)"), pa.int64()),
                "vocab": pc.cast(b.column("sum(vocab)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_compact_small_shards(sf_dir: str):
    """Small-file compaction end-to-end: documents sprayed into 48 tiny
    parquet shards (the shape a fine-grained resumable sink leaves
    behind, minted once per sf), FFD bin-packed to ≈8 input files per
    output and rewritten one-task-per-bin with no shuffle
    (stages/compaction.py). The query asserts the certificate is
    row-preserving (rows == input rows) and actually compacts
    (files_out < files_in), then emits it plus a content checksum over
    the COMPACTED layout — the pytest oracle additionally diffs actual
    row multisets."""
    import pyarrow.parquet as pq

    from pdf_table_extractor_ray.stages.compaction import compact_shards

    shard_dir = os.path.join("/tmp/pdfx_compact", f"{_sf_name(sf_dir)}_docs48")
    marker = os.path.join(shard_dir, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(shard_dir, exist_ok=True)
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
        n = t.num_rows
        for i in range(48):
            pq.write_table(
                t.slice(i * n // 48, (i + 1) * n // 48 - i * n // 48),
                os.path.join(shard_dir, f"wave-{i:03d}.parquet"),
            )
        with open(marker, "w") as f:
            f.write("ok")
    paths = [
        os.path.join(shard_dir, p)
        for p in os.listdir(shard_dir)
        if p.endswith(".parquet")
    ]
    out_dir = os.path.join("/tmp/pdfx_compact", f"{_sf_name(sf_dir)}_docs48_out")
    target = 8 * max(os.path.getsize(p) for p in paths)
    cert = compact_shards(paths, out_dir, target_bytes=target)
    n_rows = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).num_rows
    if cert.rows != n_rows or cert.files_out >= cert.files_in:
        raise AssertionError(f"compaction violated its contract: {cert}")

    # order-invariant content checksum over the compacted layout: the
    # rewrite must preserve every (doc_id, n_chars) pair exactly
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import table_checksum

    def keyed(b: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise(
            pc.cast(b.column("doc_id"), pa.string()),
            pc.cast(b.column("n_chars"), pa.string()),
            ":",
        )
        return pa.table({"text": s})

    compacted = ray.data.read_parquet(out_dir).map_batches(
        keyed, batch_format="pyarrow", zero_copy_batch=True
    )
    check = table_checksum(compacted, "text").take_all()[0]
    return pa.table(
        {
            "files_in": pa.array([cert.files_in], pa.int64()),
            "files_out": pa.array([cert.files_out], pa.int64()),
            "rows": pa.array([cert.rows], pa.int64()),
            "checksum": pa.array([int(check["checksum"])], pa.int64()),
        }
    )


_BLOOM_PROBE_KEYS = (1, 7, 1000, 4999, 123456789)


def _q_bloom_pruned_lookup(sf_dir: str):
    """Bloom-index data skipping end-to-end — the POINT-lookup sibling
    of the zone-map scan: orders re-laid-out as 16 orderkey-sorted
    parquet files (minted once per sf), a 16 KiB-per-file Bloom index
    built once over o_orderkey, and a 5-key IN probe that reads ONLY
    the files whose filter possibly holds a probe key. The result must
    hash-match the SQL IN filter over the original table (pruning is
    I/O-only; false negatives impossible), and the query asserts its
    PruneCertificate actually skipped files — with dense keys split
    across 16 files, ≤5 owners can match (plus vanishing-probability
    false positives at m=2^17, k=5)."""
    import pyarrow.parquet as pq

    from pdf_table_extractor_ray.stages.zonemap import bloom_pruned_read

    shard_dir = os.path.join("/tmp/pdfx_bloomidx", f"{_sf_name(sf_dir)}_orders16")
    marker = os.path.join(shard_dir, "_COMPLETE")
    if not os.path.exists(marker):
        os.makedirs(shard_dir, exist_ok=True)
        t = pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        ).sort_by("o_orderkey")
        n = t.num_rows
        for i in range(16):
            pq.write_table(
                t.slice(i * n // 16, (i + 1) * n // 16 - i * n // 16),
                os.path.join(shard_dir, f"part-{i:02d}.parquet"),
            )
        with open(marker, "w") as f:
            f.write("ok")
    paths = [
        os.path.join(shard_dir, p)
        for p in os.listdir(shard_dir)
        if p.endswith(".parquet")
    ]

    ds, cert = bloom_pruned_read(
        paths,
        "o_orderkey",
        list(_BLOOM_PROBE_KEYS),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    if cert.files_read >= cert.files_total:
        raise AssertionError(f"bloom index failed to prune: {cert}")

    def finish(b: pa.Table) -> pa.Table:
        cents = np.floor(_nn(b.column("o_totalprice")) * 100).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    return ds.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _q_mutual_nn_pairs(sf_dir: str):
    """Reciprocal nearest-neighbor pairs between the even- and odd-id
    halves of the embedding corpus — the high-precision cross-corpus
    alignment rule (b is a's NN and a is b's NN). Two IVF-bucketed
    nn_join passes + one slim id-keyed hash join; vectors shuffle only
    into cells, never in the reciprocity exchange. Rows-only check;
    the pytest oracle runs exhaustive mode (n_clusters=1) against a
    numpy brute-force mutual-NN set."""
    from pdf_table_extractor_ray.stages.similarity import mutual_nn_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def even(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(pc.bit_wise_and(b.column("vec_id"), pa.scalar(1, pa.int64())), 0)
        )

    def odd(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.equal(pc.bit_wise_and(b.column("vec_id"), pa.scalar(1, pa.int64())), 1)
        )

    left = ds.map_batches(even, batch_format="pyarrow", zero_copy_batch=True)
    right = ds.map_batches(odd, batch_format="pyarrow", zero_copy_batch=True)
    return mutual_nn_pairs(left, right, n_clusters=16, nprobe=4)


def _q_embedding_pca(sf_dir: str):
    """Top-3 principal components of the embedding cloud by
    distributed block power iteration — O(d·k) driver state and
    shuffle volume per pass, ``iters``+2 passes total regardless of
    component count. Rows-only check (float eigenvectors cannot
    hash-match SQL); the pytest oracle gates against numpy ``eigh``
    on cosine and eigenvalue tolerance."""
    from pdf_table_extractor_ray.stages.similarity import pca_top_components

    ds = _read(sf_dir, "embeddings", ["embedding"])
    return pca_top_components(ds, "embedding", n_components=3, iters=30)


def _q_doc_length_deciles(sf_dir: str):
    """Global NTILE(10) curriculum binning over (n_chars, doc_id) —
    every doc labeled with its length decile, deterministic because the
    ORDER BY key is unique — WITHOUT the global sort a window plan
    implies. Two-part rank: the cross-group base comes from the bounded
    distinct-length value-count table (the ``global_percent_rank``
    contract — lengths, not docs, bound the driver state) and the
    within-tie-group rank from ONE groupby(n_chars) whose group count
    is that same bounded axis; ntile's uneven-bucket split is exact
    integer arithmetic on row_number (first n mod 10 buckets get one
    extra row, SQL semantics)."""
    from pdf_table_extractor_ray.stages.sketches import sorted_value_counts

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def clean(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(b.column("doc_id")), pc.is_valid(b.column("n_chars")))
        return b.filter(keep)

    slim = ds.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)
    vals, cnts = sorted_value_counts(slim, "n_chars")  # bounded distinct lengths
    below = np.concatenate([[0], np.cumsum(cnts)[:-1]]).astype(np.int64)
    n = int(cnts.sum())
    size, rem = n // 10, n % 10

    def per_len(g: pa.Table) -> pa.Table:
        did = _nn(g.column("doc_id")).astype(np.int64)
        nc = _nn(g.column("n_chars")).astype(np.int64)
        order = np.argsort(did, kind="stable")
        did, nc = did[order], nc[order]
        wr = np.arange(1, len(did) + 1, dtype=np.int64)
        base = below[np.searchsorted(vals, nc, "left")]
        r = base + wr  # global row_number over (n_chars, doc_id)
        cut = rem * (size + 1)
        dec = np.where(
            r <= cut,
            (r - 1) // max(size + 1, 1) + 1,
            rem + (r - 1 - cut) // max(size, 1) + 1,
        ).astype(np.int64)
        return pa.table({"doc_id": pa.array(did), "decile": pa.array(dec)})

    return slim.groupby("n_chars").map_groups(per_len, batch_format="pyarrow")


def _q_daily_revenue_gini(sf_dir: str):
    """Gini concentration coefficient of the daily order-revenue series
    in EXACT integers: with x_(k) the ascending day totals (cents) and
    T their sum, the numerator is ``2·Σ k·x_(k) − (n+1)·T`` (Gini =
    numerator / (n·T), one divide away). Ties make the k·x sum
    order-invariant, so no tiebreak ambiguity. Shape: map-side (day,
    cents) partials, one groupby(day) Sum, the sorted scan on the
    BOUNDED day axis in one block."""
    from ray.data.aggregate import Sum

    _DAY_US = 86_400_000_000
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.is_valid(b.column("o_orderdate")), pc.is_valid(b.column("o_totalprice"))
        )
        b = b.filter(keep)
        ts = pc.cast(pc.cast(b.column("o_orderdate"), pa.timestamp("us")), pa.int64())
        day = (ts.to_numpy(zero_copy_only=False) // _DAY_US) * _DAY_US
        cents = np.floor(_nn(b.column("o_totalprice")) * 100).astype(np.int64)
        ud, inv = np.unique(day, return_inverse=True)
        tot = np.zeros(len(ud), np.int64)
        np.add.at(tot, inv, cents)
        return pa.table(
            {"day_us": pa.array(ud, pa.int64()), "cents": pa.array(tot, pa.int64())}
        )

    per_day = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day_us")
        .aggregate(Sum("cents"))
    )

    def finish(b: pa.Table) -> pa.Table:
        cents = np.sort(_nn(b.column("sum(cents)")).astype(np.int64))
        n = len(cents)
        total = int(cents.sum())
        # headroom contract: n·total must fit int64 (see revenue_cusum)
        if n and total > (1 << 62) // max(n, 1):
            raise ValueError("daily_revenue_gini: n_days x total_cents exceeds int64")
        k = np.arange(1, n + 1, dtype=np.int64)
        g = 2 * int((k * cents).sum()) - (n + 1) * total
        return pa.table(
            {
                "n_days": pa.array([n], pa.int64()),
                "total_cents": pa.array([total], pa.int64()),
                "gini_num": pa.array([g], pa.int64()),
            }
        )

    return per_day.repartition(1).map_batches(finish, batch_format="pyarrow")


def _q_token_budget_head(sf_dir: str):
    """Token-budget HEAD selection — the data-mixing primitive: take
    documents in (n_chars DESC, doc_id ASC) priority order while the
    running whitespace-token total stays within B = ⌊W/2⌋ (half the
    corpus), and report per-source how many docs and tokens made the
    cut. The SQL shape is a running-sum window over a GLOBAL sort; here
    there is NO sort: priority and tiebreak pack into one integer key
    (``(2²⁰−n_chars)·2³² + doc_id`` — unique per doc, < 2⁵³ so the
    float64 round-trip in the bisection is exact) and
    ``weighted_prefix_threshold`` radix-bisects to the exact greedy
    boundary in ≤6 histogram passes; one map-side-combined groupby then
    rolls up the selected rows. Contract (checked): n_chars < 2²⁰,
    0 ≤ doc_id < 2³² — re-tune the pack widths for corpora beyond it."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.sketches import weighted_prefix_threshold

    ds = _read(sf_dir, "documents", ["doc_id", "source", "n_chars", "text"])

    def prep(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.is_valid(b.column("text")), pc.is_valid(b.column("n_chars"))),
            pc.is_valid(b.column("doc_id")),
        )
        b = b.filter(keep)
        nc = _nn(b.column("n_chars")).astype(np.int64)
        did = _nn(b.column("doc_id")).astype(np.int64)
        if len(nc) and (int(nc.max()) >= (1 << 20) or int(did.max()) >= (1 << 32) or int(did.min()) < 0):
            raise ValueError(
                "token_budget_head: pack contract violated (n_chars < 2^20, 0 <= doc_id < 2^32)"
            )
        toks = pc.cast(pc.count_substring_regex(b.column("text"), r"\S+"), pa.int64())
        pack = ((1 << 20) - nc) * (1 << 32) + did
        return pa.table(
            {
                "pack": pa.array(pack, pa.int64()),
                "toks": toks,
                "source": b.column("source"),
            }
        )

    slim = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True).materialize()
    # budget = half the corpus's token mass (exact integer floor)
    total = slim.aggregate(Sum("toks"))["sum(toks)"]
    budget = (0 if total is None else int(total)) // 2
    threshold, _w = weighted_prefix_threshold(slim, "pack", "toks", budget)

    def selected_partial(b: pa.Table) -> pa.Table:
        if threshold is not None:
            b = b.filter(pc.less(b.column("pack"), pa.scalar(int(threshold), pa.int64())))
        t = pa.table(
            {
                "source": b.column("source"),
                "n": np.ones(b.num_rows, np.int64),
                "toks": b.column("toks"),
            }
        )
        return (
            pa.TableGroupBy(t, ["source"])
            .aggregate([("n", "sum"), ("toks", "sum")])
            .rename_columns(["source", "n", "toks"])
        )

    agg = (
        slim.map_batches(selected_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("n"), Sum("toks"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b.column("source"),
                "n_selected": pc.cast(b.column("sum(n)"), pa.int64()),
                "tokens_selected": pc.cast(b.column("sum(toks)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_hourly_value_spikes(sf_dir: str):
    """Hourly anomaly windows: hours whose total event value exceeds
    median + 3·MAD of the hourly series — the ops-dashboard spike
    detector. Raw events pre-reduce map-side to (hour, cents) partials;
    the robust stats run on the BOUNDED hour axis (one row per hour —
    the `grouped_mad_outliers` bounded-key contract, key = constant).
    Exact integer cents; the threshold compare uses the same float64
    ops as the SQL oracle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "value"])
    _HOUR_US = 3_600_000_000

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("ts")), pc.is_valid(b.column("value")))
        f = b.filter(m)
        ts = pc.cast(f.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.floor(_nn(f.column("value")) * 100).astype(np.int64)
        hour = (ts // _HOUR_US) * _HOUR_US
        t = pa.table({"hour_us": hour, "cents": cents})
        return (
            pa.TableGroupBy(t, ["hour_us"])
            .aggregate([("cents", "sum")])
            .rename_columns(["hour_us", "cents"])
        )

    hourly = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hour_us")
        .aggregate(Sum("cents"))
    )
    rows = hourly.take_all()  # bounded: one row per hour in the data
    hours = np.array([r["hour_us"] for r in rows], np.int64)
    cents = np.array([r["sum(cents)"] for r in rows], np.int64)
    x = np.sort(cents.astype(np.float64))
    n = len(x)
    if n == 0:
        return pa.table(
            {
                "hour_us": pa.array([], pa.int64()),
                "total_cents": pa.array([], pa.int64()),
                "is_spike": pa.array([], pa.int64()),
            }
        )
    # DuckDB-interpolation-compatible median (linear between mids)
    med = float(np.median(x))
    mad = float(np.median(np.sort(np.abs(cents.astype(np.float64) - med))))
    spike = (np.abs(cents.astype(np.float64) - med) > 3.0 * mad) & (
        cents.astype(np.float64) > med
    )
    order = np.argsort(hours)
    return pa.table(
        {
            "hour_us": pa.array(hours[order]),
            "total_cents": pa.array(cents[order]),
            "is_spike": pa.array(spike[order].astype(np.int64)),
        }
    )


def _q_langs_by_source(sf_dir: str):
    """Per-source language manifest: the DISTINCT langs of each source,
    ascending, joined with ',' — ordered string aggregation
    (``string_agg(DISTINCT … ORDER BY …)``), an order-sensitive grouped
    aggregate Ray Data's fold/combine API can't express. Map-side
    distinct-pair combiner, bounded pair groupby, then ONE key-hash
    bucket shuffle where ListArray offsets + pc.binary_join emit every
    key's join with zero per-key Python (stages/collect.py)."""
    from pdf_table_extractor_ray.stages.collect import collect_sorted_distinct

    ds = _read(sf_dir, "documents", ["source", "lang"])
    return collect_sorted_distinct(ds, "source", "lang", sep=",", out_col="langs")


def _q_langs_ranked_by_source(sf_dir: str):
    """Per-source language ranking: langs joined in (doc-count DESC,
    lang ASC) order — rank-ordered string aggregation (``string_agg(v
    ORDER BY w DESC, v)``). The pair-count reduction happens first
    (map-side combiner + bounded groupby), then ``collect_ranked``
    adds one key-hash bucket shuffle; no per-key Python."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.collect import collect_ranked

    ds = _read(sf_dir, "documents", ["source", "lang"])

    def pairs(b: pa.Table) -> pa.Table:
        t = pa.table({"source": b.column("source"), "lang": b.column("lang")})
        t = t.filter(
            pc.and_(pc.is_valid(t.column("source")), pc.is_valid(t.column("lang")))
        )
        return (
            pa.TableGroupBy(t, ["source", "lang"])
            .aggregate([([], "count_all")])
            .rename_columns(["source", "lang", "n"])
        )

    counted = (
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "lang"])
        .aggregate(Sum("n"))
    )

    def slim(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": b.column("source"),
                "lang": b.column("lang"),
                "n": pc.cast(b.column("sum(n)"), pa.int64()),
            }
        )

    return collect_ranked(
        counted.map_batches(slim, batch_format="pyarrow"),
        "source",
        "lang",
        "n",
        out_col="langs_ranked",
    )


def _q_url_dup_groups(sf_dir: str):
    """URL canonicalization dedup over the crawl corpus: every 4th
    fixture url gets two deterministic tracking/port/fragment variants
    planted (the operator must collapse them; untouched urls must NOT
    group). Rows-only (fixture corpus isn't a SQL view); canonical-form
    oracle in tests/test_links.py."""
    import ray.data

    from pdf_table_extractor_ray.pipelines.extract import read_pages
    from pdf_table_extractor_ray.stages.links import url_dup_groups

    pages = read_pages(_fixture_pages(sf_dir), columns=("url",))

    def plant(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        out = list(urls)
        for u in urls:
            if u is None:
                continue
            # deterministic by content, not position (layout-invariant)
            if (len(u) + sum(u.encode().__iter__())) % 4 == 0:
                out.append(u + "?utm_source=feed&utm_medium=rss")
                out.append(u + "#section-2")
        return pa.table({"url": pa.array(out, pa.string())})

    planted = pages.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
    return url_dup_groups(planted)


def _q_event_type_cooccurrence(sf_dir: str):
    """Pairwise co-occurrence support — for every unordered pair of
    event types, how many users performed BOTH (the market-basket
    "frequent-itemset" support counts at k=2). The SQL shape is a
    distinct-projection self-join; here no self-join runs: one shuffle
    by user-id bucket, per bucket the distinct (user, type-code) pairs
    expand to type-pair counts vectorized (vocab² bounded by the event
    type domain), and a tiny (t1, t2) groupby sums bucket partials.
    Type strings ride the shuffle once; pair expansion uses per-bucket
    GLOBAL codes from a sorted vocab so partials agree across buckets."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def bucketize(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b.column("user_id")), pc.is_valid(b.column("event_type")))
        f = b.filter(m)
        u = f.column("user_id").to_numpy(zero_copy_only=False)
        # per-batch distinct combiner: (user, type) pairs collapse early
        t = pa.table(
            {
                "u": f.column("user_id"),
                "t": f.column("event_type"),
                "bucket": pa.array((u % 64).astype(np.int64), pa.int64()),
            }
        )
        return t.group_by(["u", "t", "bucket"]).aggregate([])

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "t1": pa.array([], pa.string()),
                "t2": pa.array([], pa.string()),
                "n_part": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        uid = g.column("u").to_numpy(zero_copy_only=False)
        tcol = g.column("t")
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        enc = tcol.dictionary_encode()
        # sorted vocab → codes comparable within this bucket
        vocab = enc.dictionary.to_pylist()
        order_map = np.argsort(np.argsort(vocab))
        codes = order_map[enc.indices.to_numpy(zero_copy_only=False)]
        V = len(vocab)
        svocab = sorted(vocab)
        # distinct (user, code) again (pairs may recur across batches)
        key = uid.astype(np.int64) * V + codes
        key = np.unique(key)
        su, sc = key // V, key % V
        # expand each user's sorted type set to ordered pairs (c1 < c2)
        first = np.empty(len(su), bool)
        if len(su):
            first[0] = True
            first[1:] = su[1:] != su[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(su)))
        pairs = []
        for L in np.unique(lens):
            if L < 2:
                continue
            rows = starts[lens == L]
            block = sc[rows[:, None] + np.arange(L)]  # (n_users_L, L)
            i, j = np.triu_indices(int(L), k=1)
            pairs.append((block[:, i] * V + block[:, j]).ravel())
        if not pairs:
            return empty
        allp = np.concatenate(pairs)
        up, cnt = np.unique(allp, return_counts=True)
        v1 = pa.array([svocab[int(c)] for c in up // V], pa.string())
        v2 = pa.array([svocab[int(c)] for c in up % V], pa.string())
        return pa.table({"t1": v1, "t2": v2, "n_part": pa.array(cnt.astype(np.int64))})

    agg = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["t1", "t2"])
        .aggregate(Sum("n_part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "t1": b.column("t1"),
                "t2": b.column("t2"),
                "n_users": pc.cast(b.column("sum(n_part)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_sentence_stats(sf_dir: str):
    """Per-document sentence segmentation counts: terminator-run
    sentence boundaries (``[.!?]+`` followed by whitespace or EOS) —
    the doc-shape feature a quality filter reads next to token counts.
    Pure map: one Arrow RE2 count kernel per batch, zero shuffle; the
    DuckDB oracle runs the same RE2 pattern so counts match exactly."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b.column("text"), r"[.!?]+(\s|$)")
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_sentences": pc.cast(n, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)


def _q_daily_activity_outer(sf_dir: str):
    """Order days vs event days, FULL OUTER joined on the day — the
    coverage/reconciliation query shape (which days have orders but no
    events, and vice versa). Exercises the one join mode nothing else
    in the suite uses: both sides pre-aggregate to ≤ |days| rows
    (map-side partials), so the full-outer exchange moves bounded
    day-keyed rows, never facts."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    _DAY_US = 86_400_000_000

    def day_counts(ds, ts_col, day_name, n_name):
        def partial(b: pa.Table) -> pa.Table:
            ts = pc.cast(b.column(ts_col), pa.int64()).to_numpy(zero_copy_only=False)
            day = (ts // _DAY_US) * _DAY_US
            ud, cnt = np.unique(day, return_counts=True)
            return pa.table({day_name: ud, "n_part": cnt.astype(np.int64)})

        agg = (
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(day_name)
            .aggregate(Sum("n_part"))
        )

        def finish(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    day_name: b.column(day_name),
                    n_name: pc.cast(b.column("sum(n_part)"), pa.int64()),
                }
            )

        return agg.map_batches(finish, batch_format="pyarrow")

    o = day_counts(_read(sf_dir, "orders", ["o_orderdate"]), "o_orderdate", "o_day", "n_orders")
    e = day_counts(_read(sf_dir, "events", ["ts"]), "ts", "e_day", "n_events")
    joined = hash_shuffle_join(o, e, on="o_day", right_on="e_day", how="full")

    def finish(b: pa.Table) -> pa.Table:
        # Ray's full-outer join coalesces left/right keys into the LEFT
        # key column (o_day), so the day needs no explicit coalesce.
        return pa.table(
            {
                "day_us": pc.cast(b.column("o_day"), pa.int64()),
                "n_orders": pc.fill_null(pc.cast(b.column("n_orders"), pa.int64()), 0),
                "n_events": pc.fill_null(pc.cast(b.column("n_events"), pa.int64()), 0),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def _q_event_gap_histogram(sf_dir: str):
    """Power-of-two histogram of per-user inter-event gaps — the
    latency/recency distribution every event pipeline reports. Bucket
    is EXACT integer bit-length of the gap in µs (no float log2 —
    boundary values land deterministically), so the SQL oracle
    (length(bin(gap))) matches bit-for-bit.

    Shape: the ``event_gaps`` bucket pattern — one shuffle of the slim
    (user, ts, id) projection by user-id bucket; per bucket one lexsort
    + one vectorized diff + one np.unique histogram partial; the final
    groupby-Sum sees ≤ 64 rows per bucket."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def bucketize(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": b.column("user_id"),
                "ts_us": pc.cast(b.column("ts"), pa.int64()),
                "eid": b.column("event_id"),
                "bucket": pa.array((u % 64).astype(np.int64), pa.int64()),
            }
        )

    _POW2 = (2 ** np.arange(63, dtype=np.int64)).astype(np.int64)

    def per_bucket(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n < 2:
            return pa.table(
                {"gap_bucket": pa.array([], pa.int64()), "n_part": pa.array([], pa.int64())}
            )
        uid = g.column("u").to_numpy(zero_copy_only=False)
        ts = g.column("ts_us").to_numpy(zero_copy_only=False)
        eid = g.column("eid").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        su, st = uid[order], ts[order]
        same = su[1:] == su[:-1]
        gaps = (st[1:] - st[:-1])[same]
        if gaps.size == 0:
            return pa.table(
                {"gap_bucket": pa.array([], pa.int64()), "n_part": pa.array([], pa.int64())}
            )
        # bit_length(gap): 0 for gap==0, floor(log2)+1 otherwise — exact
        bl = np.searchsorted(_POW2, gaps, side="right").astype(np.int64)
        ub, cnt = np.unique(bl, return_counts=True)
        return pa.table({"gap_bucket": ub, "n_part": cnt.astype(np.int64)})

    agg = (
        ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("gap_bucket")
        .aggregate(Sum("n_part"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "gap_bucket": b.column("gap_bucket"),
                "n_gaps": pc.cast(b.column("sum(n_part)"), pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_token_concentration_curve(sf_dir: str):
    """Corpus concentration: sources ranked by total whitespace-token
    count, with each source's cumulative share of all tokens — the
    "how much of the corpus do the top-k domains own" curve that
    decides dedup/cap policy. Per-source token sums reduce map-side
    (≤ |sources| rows per batch); the cumulative ordering runs on the
    bounded source axis (source cardinality is a table contract, same
    as doc_stats_by_source), exact int64 sums, one float division."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.textstats import token_count_batch

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        counts = token_count_batch(b.select(["doc_id", "text"]))
        t = pa.table(
            {
                "source": b.column("source"),
                "tok": counts.column("n_tokens"),
            }
        )
        return (
            pa.TableGroupBy(t, ["source"])
            .aggregate([("tok", "sum")])
            .rename_columns(["source", "tok"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(Sum("tok"))
    )
    rows = agg.take_all()  # bounded: one row per source
    rows.sort(key=lambda r: (-r["sum(tok)"], r["source"]))
    toks = np.array([r["sum(tok)"] for r in rows], np.int64)
    total = int(toks.sum())
    cum = np.cumsum(toks)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(rows) + 1, dtype=np.int64)),
            "source": pa.array([r["source"] for r in rows], pa.string()),
            "n_tokens": pa.array(toks),
            "cum_share": pa.array(cum / total if total else cum * 0.0, pa.float64()),
        }
    )


def _q_mmr_diverse_docs(sf_dir: str):
    """Diverse top-16 embedding rows by Maximal Marginal Relevance
    against a deterministic query vector (the corpus's smallest-id
    embedding — same anchor convention as knn_top5). Distributed
    candidate generation (partial top-pool + merge, vectors ride the
    exchange); bounded greedy on the driver. No SQL oracle (greedy
    argmax chain is not SQL-expressible); brute-force parity is pinned
    by tests/test_corpus_ops.py::test_mmr_matches_reference."""
    from pdf_table_extractor_ray.stages.similarity import mmr_select

    ds, q, _qids = _query_vectors(sf_dir, n=1)
    out = mmr_select(ds, q[0], k=16, lam=0.7, pool=256)
    return out.select(["rank", "vec_id"])


def _q_discount_band_revenue(sf_dir: str):
    """TPC-H Q6 flavor: revenue that WOULD be gained by dropping the
    discount in a band — sum(l_extendedprice * l_discount) over rows
    with discount in [0.05, 0.07] and quantity < 24, per ship year.

    The cheapest TPC-H shape and the scale-canary for scan efficiency:
    4-column projection at the read, map-side band filter + per-year
    integer-cents partial sums (≤ |years| rows leave each batch), one
    tiny groupby. Zero joins, zero wide shuffles."""
    from ray.data.aggregate import Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(b: pa.Table) -> pa.Table:
        disc = _nn(b.column("l_discount"))
        qty = _nn(b.column("l_quantity"))
        mask = (disc >= 0.05) & (disc <= 0.07) & (qty < 24)
        if not mask.any():
            return pa.table(
                {
                    "ship_year": pa.array([], pa.int64()),
                    "rev_c": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ext = _nn(b.column("l_extendedprice"))[mask]
        d = disc[mask]
        ts = pc.cast(b.column("l_shipdate"), pa.int64()).to_numpy(zero_copy_only=False)[
            mask
        ]
        year = ts.astype("datetime64[us]").astype("datetime64[Y]").astype(
            np.int64
        ) + 1970
        cents = np.floor(ext * d * 100).astype(np.int64)
        t = pa.table({"ship_year": year, "rev_c": cents})
        return (
            pa.TableGroupBy(t, ["ship_year"])
            .aggregate([("rev_c", "sum"), ([], "count_all")])
            .rename_columns(["ship_year", "rev_c", "n"])
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ship_year")
        .aggregate(Sum("rev_c"), Sum("n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("ship_year"),
                pc.cast(b.column("sum(rev_c)"), pa.int64()),
                pc.cast(b.column("sum(n)"), pa.int64()),
            ],
            names=["ship_year", "rev_cents", "n_items"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_part_class_revenue(sf_dir: str):
    """TPC-H Q19 flavor: revenue from three disjunctive (brand, size
    band, quantity band) part classes — the OR-of-conjunctions join
    predicate that defeats naive predicate pushdown.

    Shape: the part side collapses to (p_partkey, class_code) for
    matching parts ONLY (map-side CASE — non-matching parts never
    reach the exchange), then ONE hash-shuffle inner join against the
    slim lineitem projection (part is fact-sized at web scale — same
    honest-join contract as promo_revenue); the per-class quantity
    band applies vectorized post-join, and per-batch partial sums make
    the final groupby see ≤ 3 rows per batch."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    # (class, brand, size_lo..size_hi, qty_lo..qty_hi) — exclusive by brand
    _CLASSES = [
        ("small", "Brand#12", 1, 5, 1, 11),
        ("medium", "Brand#23", 1, 10, 10, 20),
        ("big", "Brand#15", 1, 15, 20, 30),
    ]
    _names = pa.array([c[0] for c in _CLASSES], pa.string())

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]
    )

    def classify(b: pa.Table) -> pa.Table:
        brand = b.column("p_brand")
        size = _nn(b.column("p_size"))
        code = np.full(b.num_rows, -1, np.int64)
        for i, (_, br, lo, hi, _, _) in enumerate(_CLASSES):
            m = pc.equal(brand, br).to_numpy(zero_copy_only=False) & (
                (size >= lo) & (size <= hi)
            )
            code[m] = i
        keep = code >= 0
        return pa.table(
            {
                "p_partkey": pa.array(
                    _nn(b.column("p_partkey"))[keep].astype(np.int64)
                ),
                "cls_code": pa.array(code[keep]),
            }
        )

    flags = part.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_shuffle_join(li, flags, on="l_partkey", right_on="p_partkey")

    _qlo = np.array([c[4] for c in _CLASSES], np.float64)
    _qhi = np.array([c[5] for c in _CLASSES], np.float64)

    def partial(b: pa.Table) -> pa.Table:
        code = _nn(b.column("cls_code"))
        qty = _nn(b.column("l_quantity"))
        m = (qty >= _qlo[code]) & (qty <= _qhi[code])
        if not m.any():
            return pa.table(
                {
                    "cls_code": pa.array([], pa.int64()),
                    "rev_c": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ext = _nn(b.column("l_extendedprice"))[m]
        disc = _nn(b.column("l_discount"))[m]
        cents = np.floor(ext * (1 - disc) * 100).astype(np.int64)
        t = pa.table({"cls_code": code[m], "rev_c": cents})
        return (
            pa.TableGroupBy(t, ["cls_code"])
            .aggregate([("rev_c", "sum"), ([], "count_all")])
            .rename_columns(["cls_code", "rev_c", "n"])
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cls_code")
        .aggregate(Sum("rev_c"), Sum("n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pc.take(_names, pc.cast(b.column("cls_code"), pa.int64())),
                pc.cast(b.column("sum(rev_c)"), pa.int64()),
                pc.cast(b.column("sum(n)"), pa.int64()),
            ],
            names=["part_class", "rev_cents", "n_items"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_LATE_US = 60 * 86_400_000_000  # 60 days in µs — the "late ship" horizon


def _q_shipping_priority(sf_dir: str):
    """TPC-H Q3 flavor: top-10 unshipped BUILDING-segment orders by
    open revenue as of 1998-01-01 — the classic 3-table shipping-
    priority query.

    Shape: customer collapses map-side to the BUILDING key set and
    semi-joins orders (customer is fact-sized at web scale — hash
    shuffle, never broadcast); the surviving slim (o_orderkey,
    o_orderdate, o_orderpriority) rows hash-join the date-filtered
    lineitem projection; per-batch partials pre-reduce to one row per
    orderkey before the final groupby, and the top-10 comes from the
    partial-top-k merge (stages/topk.py), not a global sort."""
    from ray.data.aggregate import Max, Sum

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join
    from pdf_table_extractor_ray.stages.topk import global_top_k

    cutoff = np.datetime64("1998-01-01", "us").astype(np.int64)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

    def building_keys(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("c_mktsegment"), "BUILDING")
        return b.filter(m).select(["c_custkey"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    def open_orders(b: pa.Table) -> pa.Table:
        od = pc.cast(b.column("o_orderdate"), pa.int64())
        return b.filter(pc.less(od, cutoff))

    kept = hash_shuffle_join(
        orders.map_batches(open_orders, batch_format="pyarrow", zero_copy_batch=True),
        cust.map_batches(building_keys, batch_format="pyarrow", zero_copy_batch=True),
        on="o_custkey",
        right_on="c_custkey",
        how="left_semi",
    )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def shipped_after(b: pa.Table) -> pa.Table:
        sd = pc.cast(b.column("l_shipdate"), pa.int64())
        return b.filter(pc.greater(sd, cutoff)).drop_columns(["l_shipdate"])

    joined = hash_shuffle_join(
        li.map_batches(shipped_after, batch_format="pyarrow", zero_copy_batch=True),
        kept.select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"]),
        on="l_orderkey",
        right_on="o_orderkey",
    )

    def partial(b: pa.Table) -> pa.Table:
        price = _nn(b.column("l_extendedprice"))
        disc = _nn(b.column("l_discount"))
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        t = pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "cents": cents,
                "od_us": pc.cast(b.column("o_orderdate"), pa.int64()),
                "o_orderpriority": b.column("o_orderpriority"),
            }
        )
        return (
            pa.TableGroupBy(t, ["l_orderkey"])
            .aggregate([("cents", "sum"), ("od_us", "max"), ("o_orderpriority", "max")])
            .rename_columns(["l_orderkey", "cents", "od_us", "o_orderpriority"])
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_orderkey")
        .aggregate(Sum("cents"), Max("od_us"), Max("o_orderpriority"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("l_orderkey"),
                pc.divide(pc.cast(b.column("sum(cents)"), pa.float64()), 100.0),
                b.column("max(od_us)"),
                b.column("max(o_orderpriority)"),
            ],
            names=["l_orderkey", "revenue", "o_orderdate_us", "o_orderpriority"],
        )

    scored = agg.map_batches(finish, batch_format="pyarrow")
    return global_top_k(
        scored, [("revenue", "descending"), ("l_orderkey", "ascending")], 10
    )


def _q_late_ship_priority_counts(sf_dir: str):
    """TPC-H Q4 flavor: per order priority, how many DISTINCT orders
    had at least one line shipped > 60 days after the order date — the
    EXISTS-subquery order-priority-checking query.

    The EXISTS collapses via the chained-distinct pattern
    (distinct_users_by_type_exact): join + filter → per-batch distinct
    (priority, orderkey) collapse → groupby the composite key (one
    exchange of already-distinct slim pairs) → per-priority count.
    No order-sized broadcast, no second pass over lineitem."""
    from ray.data.aggregate import Count

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    joined = hash_shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def late_pairs(b: pa.Table) -> pa.Table:
        sd = pc.cast(b.column("l_shipdate"), pa.int64()).to_numpy(zero_copy_only=False)
        od = pc.cast(b.column("o_orderdate"), pa.int64()).to_numpy(zero_copy_only=False)
        m = sd > od + _LATE_US
        t = pa.table(
            {
                "o_orderpriority": pc.array_filter(b.column("o_orderpriority"), pa.array(m)),
                "l_orderkey": pa.array(b.column("l_orderkey").to_numpy(zero_copy_only=False)[m]),
            }
        )
        # block-level distinct: ≤ one row per (priority, orderkey) leaves the task
        return (
            pa.TableGroupBy(t, ["o_orderpriority", "l_orderkey"])
            .aggregate([])
        )

    distinct_pairs = (
        joined.map_batches(late_pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["o_orderpriority", "l_orderkey"])
        .aggregate(Count())
    )

    def per_priority_partial(b: pa.Table) -> pa.Table:
        t = b.select(["o_orderpriority"])
        return (
            pa.TableGroupBy(t, ["o_orderpriority"])
            .aggregate([([], "count_all")])
            .rename_columns(["o_orderpriority", "n"])
        )

    from ray.data.aggregate import Sum

    agg = (
        distinct_pairs.map_batches(per_priority_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("o_orderpriority"), pc.cast(b.column("sum(n)"), pa.int64())],
            names=["o_orderpriority", "n_late_orders"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_returnflag_priority_mix(sf_dir: str):
    """TPC-H Q12 flavor: per return flag, line counts split by whether
    the parent order is critical (1-URGENT / 2-HIGH) or not — the
    two-tier conditional-count shape of the shipmode query.

    Orders collapse map-side to (o_orderkey, is_critical ∈ {0,1})
    before the fact⋈fact hash join; per-batch partials reduce each
    batch to ≤ |returnflags| rows of (high, low) sums."""
    from ray.data.aggregate import Sum

    from pdf_table_extractor_ray.stages.joins import hash_shuffle_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def tag(b: pa.Table) -> pa.Table:
        crit = pc.is_in(
            b.column("o_orderpriority"),
            value_set=pa.array(["1-URGENT", "2-HIGH"], pa.string()),
        )
        return pa.Table.from_arrays(
            [b.column("o_orderkey"), pc.cast(crit, pa.int64())],
            names=["o_orderkey", "is_crit"],
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
    joined = hash_shuffle_join(
        li,
        orders.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True),
        on="l_orderkey",
        right_on="o_orderkey",
    )

    def partial(b: pa.Table) -> pa.Table:
        crit = b.column("is_crit").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "high": crit,
                "low": 1 - crit,
            }
        )
        return (
            pa.TableGroupBy(t, ["l_returnflag"])
            .aggregate([("high", "sum"), ("low", "sum")])
            .rename_columns(["l_returnflag", "high", "low"])
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("l_returnflag")
        .aggregate(Sum("high"), Sum("low"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("l_returnflag"),
                pc.cast(b.column("sum(high)"), pa.int64()),
                pc.cast(b.column("sum(low)"), pa.int64()),
            ],
            names=["l_returnflag", "critical_lines", "other_lines"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_supplier_variety(sf_dir: str):
    """TPC-H Q16 flavor: distinct suppliers that shipped each
    (p_brand, p_size) class, excluding blacklisted (negative-balance)
    suppliers — the NOT-IN + grouped COUNT(DISTINCT) supplier query.

    The NOT IN is the ADAPTIVE anti join (stages/joins.py): one
    distributed count of the blacklist picks the broadcast key-set
    probe when it is tiny (here: a handful of rows — zero shuffle of
    lineitem) and degrades to the hash-shuffle anti join when the
    blacklist is fact-sized. Distinct (partkey, suppkey) pairs
    collapse block-side before their one exchange; part attaches by
    hash join (fact-sized at web scale); the final grouped
    COUNT(DISTINCT supplier) is the chained-groupby pattern."""
    from ray.data.aggregate import Count, Sum

    from pdf_table_extractor_ray.stages.joins import adaptive_join, hash_shuffle_join

    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])

    def blacklist(b: pa.Table) -> pa.Table:
        return b.filter(pc.less(b.column("s_acctbal"), 0.0)).select(["s_suppkey"])

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def distinct_ps(b: pa.Table) -> pa.Table:
        return pa.TableGroupBy(b, ["l_partkey", "l_suppkey"]).aggregate([])

    clean = adaptive_join(
        li.map_batches(distinct_ps, batch_format="pyarrow", zero_copy_batch=True),
        supp.map_batches(blacklist, batch_format="pyarrow", zero_copy_batch=True).materialize(),
        on="l_suppkey",
        right_on="s_suppkey",
        how="left_anti",
    )
    pairs = clean.groupby(["l_partkey", "l_suppkey"]).aggregate(Count())

    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    tagged = hash_shuffle_join(
        pairs.drop_columns(["count()"]),
        part,
        on="l_partkey",
        right_on="p_partkey",
    )

    def distinct_bss(b: pa.Table) -> pa.Table:
        t = b.select(["p_brand", "p_size", "l_suppkey"])
        return pa.TableGroupBy(t, ["p_brand", "p_size", "l_suppkey"]).aggregate([])

    distinct_triples = (
        tagged.map_batches(distinct_bss, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["p_brand", "p_size", "l_suppkey"])
        .aggregate(Count())
    )

    def per_class_partial(b: pa.Table) -> pa.Table:
        t = b.select(["p_brand", "p_size"])
        return (
            pa.TableGroupBy(t, ["p_brand", "p_size"])
            .aggregate([([], "count_all")])
            .rename_columns(["p_brand", "p_size", "n"])
        )

    agg = (
        distinct_triples.map_batches(per_class_partial, batch_format="pyarrow")
        .groupby(["p_brand", "p_size"])
        .aggregate(Sum("n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                b.column("p_brand"),
                pc.cast(b.column("p_size"), pa.int64()),
                pc.cast(b.column("sum(n)"), pa.int64()),
            ],
            names=["p_brand", "p_size", "supplier_cnt"],
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _q_sole_late_suppliers(sf_dir: str):
    """TPC-H Q21 flavor: suppliers who were the ONLY late shipper in a
    multi-supplier order (late = shipped > 60 days after order date),
    counted per supplier, top 10 — the EXISTS + NOT-EXISTS
    waiting-orders query.

    Two keyed reductions replace the correlated subqueries: (1) per
    (orderkey, suppkey): any-late flag via Max; (2) per orderkey:
    supplier count, late-supplier count, and the candidate supplier id
    as Max(suppkey if late else -1) — when exactly one supplier is
    late, that Max IS the culprit. Both reductions ride per-batch
    partials; the supplier name attaches from the bounded supplier dim
    AFTER the per-supplier rollup (top-k rows only)."""
    from ray.data.aggregate import Max, Sum

    from pdf_table_extractor_ray.stages.joins import broadcast_join, hash_shuffle_join
    from pdf_table_extractor_ray.stages.topk import global_top_k

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    joined = hash_shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey")

    def partial_os(b: pa.Table) -> pa.Table:
        sd = pc.cast(b.column("l_shipdate"), pa.int64()).to_numpy(zero_copy_only=False)
        od = pc.cast(b.column("o_orderdate"), pa.int64()).to_numpy(zero_copy_only=False)
        late = (sd > od + _LATE_US).astype(np.int64)
        t = pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "late": late,
            }
        )
        return (
            pa.TableGroupBy(t, ["l_orderkey", "l_suppkey"])
            .aggregate([("late", "max")])
            .rename_columns(["l_orderkey", "l_suppkey", "late"])
        )

    os_late = (
        joined.map_batches(partial_os, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_orderkey", "l_suppkey"])
        .aggregate(Max("late"))
    )

    def partial_order(b: pa.Table) -> pa.Table:
        late = pc.cast(b.column("max(late)"), pa.int64()).to_numpy(zero_copy_only=False)
        sk = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "n_supp": np.ones(len(sk), np.int64),
                "n_late": late,
                "late_sk": np.where(late == 1, sk, -1),
            }
        )
        return (
            pa.TableGroupBy(t, ["l_orderkey"])
            .aggregate([("n_supp", "sum"), ("n_late", "sum"), ("late_sk", "max")])
            .rename_columns(["l_orderkey", "n_supp", "n_late", "late_sk"])
        )

    per_order = (
        os_late.map_batches(partial_order, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("n_supp"), Sum("n_late"), Max("late_sk"))
    )

    def partial_supp(b: pa.Table) -> pa.Table:
        ns = pc.cast(b.column("sum(n_supp)"), pa.int64())
        nl = pc.cast(b.column("sum(n_late)"), pa.int64())
        m = pc.and_(pc.greater_equal(ns, 2), pc.equal(nl, 1))
        t = pa.table({"s_suppkey": pc.array_filter(b.column("max(late_sk)"), m)})
        return (
            pa.TableGroupBy(t, ["s_suppkey"])
            .aggregate([([], "count_all")])
            .rename_columns(["s_suppkey", "n"])
        )

    per_supp = (
        per_order.map_batches(partial_supp, batch_format="pyarrow")
        .groupby("s_suppkey")
        .aggregate(Sum("n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [b.column("s_suppkey"), pc.cast(b.column("sum(n)"), pa.int64())],
            names=["s_suppkey", "waiting_orders"],
        )

    top = global_top_k(
        per_supp.map_batches(finish, batch_format="pyarrow"),
        [("waiting_orders", "descending"), ("s_suppkey", "ascending")],
        10,
    )
    names = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    return broadcast_join(top, names, key="s_suppkey", build_key="s_suppkey").select_columns(
        ["s_suppkey", "s_name", "waiting_orders"]
    )


def _q_nb_lang_top_tokens(sf_dir: str):
    """Naive-Bayes TRAINING pass (distributed sufficient statistics):
    per-language top-10 tokens by (count desc, token asc) out of the
    (label, token, n) model counts. The token stream reduces inside
    each batch (np.unique combiner); only per-batch vocabularies
    shuffle; the per-label top-k is the hot-key-safe grouped partial
    merge — no global sort (stages/classifier.py:nb_train_counts)."""
    from pdf_table_extractor_ray.stages.classifier import nb_train_counts
    from pdf_table_extractor_ray.stages.topk import grouped_top_k

    docs = _read(sf_dir, "documents", ["lang", "text"])
    counts = nb_train_counts(docs, label_col="lang", text_col="text")
    return grouped_top_k(
        counts, "label", [("n", "descending"), ("token", "ascending")], 10
    )


def _q_nb_confusion(sf_dir: str):
    """Naive-Bayes train-on-all/score-on-all confusion matrix
    (true_label, pred_label, n): distributed count training, bounded
    top-V vocab broadcast, map-only argmax scoring with the true label
    riding the batch (row alignment, no join), final |labels|² groupby.
    Float log-probs → no SQL oracle; pytest parity vs a local numpy
    reference (tests/test_classifier_training.py)."""
    from pdf_table_extractor_ray.stages.classifier import nb_confusion

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    return nb_confusion(docs, label_col="lang", text_col="text")


def _q_stump_split_nchars(sf_dir: str):
    """Histogram decision-stump training (the GBDT `hist` inner loop):
    per source, the n_chars threshold (bin width 64) minimizing exact
    integer misclassification for predicting lang = 'en'. One
    (key, bin) histogram shuffle — the raw feature column never moves;
    the per-key scan touches ≤ occupied-bin rows
    (stages/trees.py:stump_splits)."""
    from pdf_table_extractor_ray.stages.trees import stump_splits

    docs = _read(sf_dir, "documents", ["source", "n_chars", "lang"])

    def pos(b: pa.Table):
        return pc.equal(b.column("lang"), "en")

    return stump_splits(docs, "source", "n_chars", pos, bin_width=64)


def _q_logreg_en_confusion(sf_dir: str):
    """Distributed LOGISTIC-REGRESSION training (8 full-batch GD
    passes over hashed bag-of-words features; model state on the
    driver, one O(d) partial-gradient row per batch reduced by
    Dataset.sum — no shuffle) followed by a map-only scoring pass:
    per-source confusion counters for predicting lang = 'en'.
    Float gradient sums → no SQL oracle; pytest parity vs a local
    numpy reference (tests/test_classifier_training.py)."""
    from pdf_table_extractor_ray.stages.classifier import logreg_confusion_by

    docs = _read(sf_dir, "documents", ["source", "lang", "text"])

    def pos(b: pa.Table):
        return pc.equal(b.column("lang"), "en")

    return logreg_confusion_by(docs, pos, key_col="source")


def _q_nb_cv_accuracy(sf_dir: str):
    """K-fold cross-validated Naive-Bayes accuracy from ONE training
    pass: (fold, label, token) counts once, then each held-out model
    is total − fold counts (the subtraction trick — k models for the
    price of one aggregation); one scoring pass routes every doc
    through its own held-out model. Output (fold, n_docs, n_correct),
    integer-exact (stages/classifier.py:nb_cross_validate)."""
    from pdf_table_extractor_ray.stages.classifier import nb_cross_validate

    docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    return nb_cross_validate(docs, k_folds=5)


def _q_nb_distinctive_tokens(sf_dir: str):
    """Feature selection over the NB training statistics: per-language
    top-10 DISTINCTIVE tokens by the integer-exact cross-rate score
    n_lt·T_other − n_other_t·T_l (positive iff the token is
    over-represented in the label; equivalent ordering to the rate
    ratio, zero float ops). One (label, token) training aggregate, one
    token-keyed hash join for corpus totals — the vocabulary never
    broadcasts (stages/classifier.py:distinctive_tokens_by_label)."""
    from pdf_table_extractor_ray.stages.classifier import distinctive_tokens_by_label

    docs = _read(sf_dir, "documents", ["lang", "text"])
    return distinctive_tokens_by_label(docs, k=10)


def _q_unimax_mix_allocation(sf_dir: str):
    """UniMax training-mix budget allocation (Chung et al. 2023): one
    map-side token-mass rollup over the bounded source axis, then the
    driver-side integer-exact waterfill closed form — smallest sources
    get their full epochs·n cap, the rest split the remainder equally
    (budget = half the corpus token mass, epoch cap 4). All Python-int
    arithmetic (stages/mixing.py:unimax_allocation)."""
    from pdf_table_extractor_ray.stages.mixing import (
        token_mass_by,
        unimax_allocation,
    )

    docs = _read(sf_dir, "documents", ["source", "text"])
    masses = pa.concat_tables(
        [b for b in token_mass_by(docs).iter_batches(batch_format="pyarrow")]
    )
    budget = int(pc.sum(masses.column("n")).as_py()) // 2
    return unimax_allocation(masses, budget=budget, epochs=4)


def _q_temperature_mix_allocation(sf_dir: str):
    """Temperature-sampled (α=0.5) training-mix allocation — the
    multilingual upsampling rule (mT5/XLM-R style): weights
    w_i = isqrt(n_i) over the same map-side token-mass rollup, then
    integer-exact LARGEST-REMAINDER apportionment of a budget of half
    the corpus mass (stages/mixing.py:temperature_allocation). Σ alloc
    == budget exactly; bit-checkable in SQL because isqrt ==
    floor(sqrt) for every n < 2^52 and the apportionment is pure
    integer division + a remainder rank."""
    from pdf_table_extractor_ray.stages.mixing import temperature_allocation, token_mass_by

    docs = _read(sf_dir, "documents", ["source", "text"])
    masses = pa.concat_tables(
        [b for b in token_mass_by(docs).iter_batches(batch_format="pyarrow")]
    )
    budget = int(pc.sum(masses.column("n")).as_py()) // 2
    return temperature_allocation(masses, budget=budget)


def _q_kmeans_pp_clusters(sf_dir: str):
    """k-means with SCALABLE k-means|| seeding (Bahmani et al. 2012):
    candidate centers drawn from the FULL corpus over 3
    sample-by-distance rounds (2 streaming passes each, seeded
    splitmix64 draws — deterministic and layout-invariant), weighted
    Lloyd over the bounded candidate set on the driver, then the
    standard broadcast-centroid assign pass. Replaces the driver-
    sample seeding whose limit() can miss whole modes at 100 TB
    (stages/similarity.py:kmeans_parallel_init)."""
    from pdf_table_extractor_ray.stages.similarity import (
        kmeans_assign,
        kmeans_cluster_sizes,
        kmeans_parallel_init,
    )

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = kmeans_parallel_init(emb, k=8)
    return kmeans_cluster_sizes(kmeans_assign(emb, centroids=cents))


def _q_ccnet_ppl_buckets(sf_dir: str):
    """CCNet head/middle/tail split (Wenzek et al. 2020): per language,
    exact perplexity terciles over the corpus's own unigram LM, then a
    map-only tag pass; output (lang, bucket, n_docs) over the bounded
    lang × 3 axis. Slim (ppl, lang) columns materialize once; raw text
    never shuffles. Rows-only (ln is SQL-divergent at the ulp —
    measured); numpy brute parity + tercile-balance tests in
    tests/test_corpus_ops.py."""
    from pdf_table_extractor_ray.stages.lm import ccnet_ppl_buckets

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return ccnet_ppl_buckets(docs)


def _q_quality_borda(sf_dir: str):
    """Multi-signal quality fusion by Borda rank aggregation: score =
    Σ RANK() over each of (n_chars, ws-token count, sentence count) —
    the scale-free blend of incomparable quality signals. No window
    sort: one bounded (signal, value) groupby + broadcast rank
    lookups. SQL-verified bit-exactly (integer ranks; same RE2
    kernels both sides)."""
    from pdf_table_extractor_ray.stages.stats import borda_rank_fusion
    from pdf_table_extractor_ray.stages.textstats import token_count_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def signals(b: pa.Table) -> pa.Table:
        toks = token_count_batch(b, text_col="text")
        sents = pc.cast(
            pc.count_substring_regex(b.column("text"), r"[.!?]+(\s|$)"), pa.int64()
        )
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_chars": pc.cast(b.column("n_chars"), pa.int64()),
                "n_tokens": toks.column("n_tokens"),
                "n_sentences": sents,
            }
        )

    sig = ds.map_batches(signals, batch_format="pyarrow", zero_copy_batch=True)
    return borda_rank_fusion(sig, ["n_chars", "n_tokens", "n_sentences"])


def _q_curriculum_doc_order(sf_dir: str):
    """Curriculum ordering (Bengio et al. 2009): position = (stratum
    asc, seeded permutation within the stratum) — here stratum = lang.
    Same two-pass counting-sort shape as the deterministic shuffle
    with |strata|×bucket offsets; every stratum is a contiguous pos
    range. SQL-verified bit-exactly (ROW_NUMBER over (lang, splitmix64
    key))."""
    from pdf_table_extractor_ray.stages.shuffle import curriculum_shuffle

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])
    out = curriculum_shuffle(docs, "lang", id_col="doc_id", seed=42, n_buckets=32)

    def slim(b: pa.Table) -> pa.Table:
        return b.select(["doc_id", "pos"])

    return out.map_batches(slim, batch_format="pyarrow")


def _q_dsir_sample(sf_dir: str):
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): select
    100 docs that look most like the English target set, by hashed
    unigram+bigram importance weights (target vs pool bag-of-words,
    add-1 smoothed) and a deterministic Gumbel top-k draw ∝ exp(logw).
    Models bounded by n_buckets (2^14 here), raw text never shuffles,
    selection is the partial-top-k merge. Rows-only (hashed features +
    Gumbel draw aren't SQL); numpy brute parity + planted-style-shift
    recovery in tests/test_dsir.py."""
    import pyarrow.compute as _pc

    from pdf_table_extractor_ray.stages.dsir import dsir_select

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return dsir_select(
        docs,
        target_filter=lambda b: _pc.equal(b.column("lang"), "en"),
        k=100,
        n_buckets=1 << 14,
        seed=42,
    )


def _q_shuffled_doc_order(sf_dir: str):
    """Deterministic seeded global shuffle: every doc's position in a
    reproducible, layout-invariant permutation (key = splitmix64(id ^
    seed), a bijection — collision-free, no tiebreak). Balanced range
    partitioning falls out of the key's top bits (avalanche uniformity
    — NO boundary-sampling pass), positions from counting-sort offsets;
    the payload crosses ONE bucket exchange. SQL-verified bit-exactly
    via the HUGEINT splitmix64 emulation (shuffle.splitmix64_sql)."""
    from pdf_table_extractor_ray.stages.shuffle import deterministic_shuffle

    docs = _read(sf_dir, "documents", ["doc_id"])
    return deterministic_shuffle(docs, id_col="doc_id", seed=42, n_buckets=64)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "doc_stats_by_source": _q_doc_stats_by_source,
        "doc_filter_project": _q_doc_filter_project,
        "exact_dedup_docs": _q_exact_dedup_docs,
        "normalized_dedup_docs": _q_normalized_dedup_docs,
        "props_value_by_type": _q_props_value_by_type,
        "pii_scrub": _q_pii_scrub,
        "kmeans_clusters": _q_kmeans_clusters,
        "semantic_dedup": _q_semantic_dedup,
        "nn_join": _q_nn_join,
        "long_docs_p95": _q_long_docs_p95,
        "weighted_doc_sample": _q_weighted_doc_sample,
        "pagerank_dups": _q_pagerank_dups,
        "value_comoments_by_type": _q_value_comoments_by_type,
        "doc_length_pct_rank": _q_doc_length_pct_rank,
        "late_events": _q_late_events,
        "media_features": _q_media_features,
        "video_frame_features": _q_video_frame_features,
        "image_thumbnails": _q_image_thumbnails,
        "image_dhash_dups": _q_image_dhash_dups,
        "blocklist_admission": _q_blocklist_admission,
        "mojibake_repair": _q_mojibake_repair,
        "audio_dup_pairs": _q_audio_dup_pairs,
        "media_dedup_keep": _q_media_dedup_keep,
        "encrypted_pdf_roundtrip": _q_encrypted_pdf_roundtrip,
        "video_dup_pairs": _q_video_dup_pairs,
        "jsonl_roundtrip": _q_jsonl_roundtrip,
        "incremental_crawl_dedup": _q_incremental_crawl_dedup,
        "crawl_markdown_export": _q_crawl_markdown_export,
        "corpus_prep_v6": _q_corpus_prep_v6,
        "corpus_data_card": _q_corpus_data_card,
        "unigram_pieces": _q_unigram_pieces,
        "order_price_quantiles_kll": _q_order_price_quantiles_kll,
        "value_quantiles_by_type_kll": _q_value_quantiles_by_type_kll,
        "label_budget_neyman": _q_label_budget_neyman,
        "unigram_doc_tokens": _q_unigram_doc_tokens,
        "edit_distance_pairs": _q_edit_distance_pairs,
        "doc_table_checksum": _q_doc_table_checksum,
        "urgent_bigticket": _q_urgent_bigticket,
        "order_price_scaled": _q_order_price_scaled,
        "token_counts": _q_token_counts,
        "token_counts_bpe": _q_token_counts_bpe,
        "lineitem_pricing": _q_lineitem_pricing,
        "orders_top10": _q_orders_top10,
        "events_by_type": _q_events_by_type,
        "money_roundtrip": _q_money_roundtrip,
        "date_roundtrip": _q_date_roundtrip,
        "html_table_roundtrip": _q_html_table_roundtrip,
        "warc_roundtrip": _q_warc_roundtrip,
        "wet_roundtrip": _q_wet_roundtrip,
        "cdx_fetch_roundtrip": _q_cdx_fetch_roundtrip,
        "docs_per_registrable_domain": _q_docs_per_registrable_domain,
        "url_pattern_counts": _q_url_pattern_counts,
        "robots_sitemap_discovery": _q_robots_sitemap_discovery,
        "doc_sentences": _q_doc_sentences,
        "mirror_url_groups": _q_mirror_url_groups,
        "doc_token_windows": _q_doc_token_windows,
        "crawl_depth_bfs": _q_crawl_depth_bfs,
        "crawl_depth_bfs_resumable": _q_crawl_depth_bfs_resumable,
        "cdx_sorted_parts": _q_cdx_sorted_parts,
        "polite_fetch_schedule": _q_polite_fetch_schedule,
        "latest_ok_fetch": _q_latest_ok_fetch,
        "crawl_extract_wet": _q_crawl_extract_wet,
        "sitemap_roundtrip": _q_sitemap_roundtrip,
        "dom_select_cards": _q_dom_select_cards,
        "dom_main_content": _q_dom_main_content,
        "html_markdown_roundtrip": _q_html_markdown_roundtrip,
        "dom_shape_clusters": _q_dom_shape_clusters,
        "template_lines_by_source": _q_template_lines_by_source,
        "template_strip_roundtrip": _q_template_strip_roundtrip,
        "union_sources": _q_union_sources,
        "distinct_users": _q_distinct_users,
        "langid": _q_langid,
        "quality": _q_quality,
        "fingerprints": _q_fingerprints,
        "fingerprints_sketch": _q_fingerprints_sketch,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "knn_top5": _q_knn_top5,
        "knn_lsh": _q_knn_lsh,
        "knn_ivf": _q_knn_ivf,
        "knn_pq": _q_knn_pq,
        "near_dedup_docs": _q_near_dedup_docs,
        "dup_clusters": _q_dup_clusters,
        "corpus_prep": _q_corpus_prep,
        "corpus_prep_v2": _q_corpus_prep_v2,
        "corpus_prep_v3": _q_corpus_prep_v3,
        "revenue_by_price_quartile": _q_revenue_by_price_quartile,
        "top_revenue_orders": _q_top_revenue_orders,
        "profit_by_nation_year": _q_profit_by_nation_year,
        "local_supplier_revenue": _q_local_supplier_revenue,
        "trade_volume_pairs": _q_trade_volume_pairs,
        "nation_market_share": _q_nation_market_share,
        "returned_item_customers": _q_returned_item_customers,
        "big_volume_orders": _q_big_volume_orders,
        "promo_revenue": _q_promo_revenue,
        "discount_band_revenue": _q_discount_band_revenue,
        "mmr_diverse_docs": _q_mmr_diverse_docs,
        "daily_activity_outer": _q_daily_activity_outer,
        "event_type_cooccurrence": _q_event_type_cooccurrence,
        "url_dup_groups": _q_url_dup_groups,
        "brand_type_fd_audit": _q_brand_type_fd_audit,
        "hourly_value_spikes": _q_hourly_value_spikes,
        "event_hour_association": _q_event_hour_association,
        "doclen_ks": _q_doclen_ks,
        "doclen_mwu": _q_doclen_mwu,
        "revenue_cusum": _q_revenue_cusum,
        "doc_length_deciles": _q_doc_length_deciles,
        "shuffled_doc_order": _q_shuffled_doc_order,
        "dsir_sample": _q_dsir_sample,
        "ccnet_ppl_buckets": _q_ccnet_ppl_buckets,
        "curriculum_doc_order": _q_curriculum_doc_order,
        "quality_borda": _q_quality_borda,
        "daily_revenue_gini": _q_daily_revenue_gini,
        "embedding_pca": _q_embedding_pca,
        "revenue_segments": _q_revenue_segments,
        "mutual_nn_pairs": _q_mutual_nn_pairs,
        "bloom_pruned_lookup": _q_bloom_pruned_lookup,
        "compact_small_shards": _q_compact_small_shards,
        "hapax_by_source": _q_hapax_by_source,
        "readability": _q_readability,
        "token_budget_head": _q_token_budget_head,
        "langs_by_source": _q_langs_by_source,
        "langs_ranked_by_source": _q_langs_ranked_by_source,
        "sentence_stats": _q_sentence_stats,
        "event_gap_histogram": _q_event_gap_histogram,
        "token_concentration_curve": _q_token_concentration_curve,
        "part_class_revenue": _q_part_class_revenue,
        "shipping_priority": _q_shipping_priority,
        "rolling_active_users": _q_rolling_active_users,
        "lpa_communities": _q_lpa_communities,
        "bpe_token_counts": _q_bpe_token_counts,
        "orders_profile": _q_orders_profile,
        "dup_kcore_nodes": _q_dup_kcore_nodes,
        "late_ship_priority_counts": _q_late_ship_priority_counts,
        "returnflag_priority_mix": _q_returnflag_priority_mix,
        "supplier_variety": _q_supplier_variety,
        "sole_late_suppliers": _q_sole_late_suppliers,
        "nation_year_flows": _q_nation_year_flows,
        "windowed_late_split": _q_windowed_late_split,
        "dormant_rich_customers": _q_dormant_rich_customers,
        "hybrid_search_rrf": _q_hybrid_search_rrf,
        "value_trend_by_type": _q_value_trend_by_type,
        "user_counts_cms": _q_user_counts_cms,
        "audio_spectral": _q_audio_spectral,
        "session_conversion": _q_session_conversion,
        "last_view_before_click": _q_last_view_before_click,
        "lang_source_skew": _q_lang_source_skew,
        "orders_snapshot_diff": _q_orders_snapshot_diff,
        "top_bigrams_by_lang": _q_top_bigrams_by_lang,
        "phrase_docs": _q_phrase_docs,
        "source_overlap_matrix": _q_source_overlap_matrix,
        "lineitem_corr_matrix": _q_lineitem_corr_matrix,
        "orders_scd2": _q_orders_scd2,
        "kanon_risk": _q_kanon_risk,
        "ldiversity_census": _q_ldiversity_census,
        "attribution_linear": _q_attribution_linear,
        "snm_dup_pairs": _q_snm_dup_pairs,
        "value_imputed": _q_value_imputed,
        "mix_rebalance_sample": _q_mix_rebalance_sample,
        "benford_digits": _q_benford_digits,
        "rate_limited_events": _q_rate_limited_events,
        "urgent_customers": _q_urgent_customers,
        "quiet_customers": _q_quiet_customers,
        "cust_order_dist": _q_cust_order_dist,
        "nation_top_names": _q_nation_top_names,
        "last_order_asof": _q_last_order_asof,
        "first_event_after_order": _q_first_event_after_order,
        "top_orders_per_cust": _q_top_orders_per_cust,
        "lm_familiarity": _q_lm_familiarity,
        "lm_bigram_familiarity": _q_lm_bigram_familiarity,
        "lm_trigram_familiarity": _q_lm_trigram_familiarity,
        "lm_perplexity": _q_lm_perplexity,
        "doc_sample": _q_doc_sample,
        "events_pivot": _q_events_pivot,
        "events_unpivot": _q_events_unpivot,
        "events_hopping": _q_events_hopping,
        "user_value_timewin": _q_user_value_timewin,
        "customer_balance_rank": _q_customer_balance_rank,
        "order_price_quantiles_by_approx": _q_order_price_quantiles_by_approx,
        "distinct_users_approx": _q_distinct_users_approx,
        "distinct_users_by_type": _q_distinct_users_by_type,
        "order_price_quantiles": _q_order_price_quantiles,
        "order_price_quantiles_cont": _q_order_price_quantiles_cont,
        "user_value_rolling": _q_user_value_rolling,
        "user_value_cumsum": _q_user_value_cumsum,
        "revenue_by_region": _q_revenue_by_region,
        "embedding_dups": _q_embedding_dups,
        "events_hourly": _q_events_hourly,
        "customer_nation": _q_customer_nation,
        "orders_by_nation": _q_orders_by_nation,
        "sessionize": _q_sessionize,
        "ship_window_value": _q_ship_window_value,
        "order_week_shipments": _q_order_week_shipments,
        "ship_week_pairs": _q_ship_week_pairs,
        "jaccard_pairs": _q_jaccard_pairs,
        "containment_pairs": _q_containment_pairs,
        "bm25_top10": _q_bm25_top10,
        "user_value_ffill": _q_user_value_ffill,
        "weighted_source_sample": _q_weighted_source_sample,
        "pii_inventory": _q_pii_inventory,
        "token_entropies": _q_token_entropies,
        "user_mode_event": _q_user_mode_event,
        "clicks_after_signup": _q_clicks_after_signup,
        "value_p90_by_type": _q_value_p90_by_type,
        "shared_prefix_sources": _q_shared_prefix_sources,
        "prefix_except": _q_prefix_except,
        "urgent_daily_dense": _q_urgent_daily_dense,
        "user_event_runs": _q_user_event_runs,
        "order_skyline": _q_order_skyline,
        "embedding_dim_stats": _q_embedding_dim_stats,
        "part_primary_suppliers": _q_part_primary_suppliers,
        "distinct_users_by_type_exact": _q_distinct_users_by_type_exact,
        "full_priority_customers": _q_full_priority_customers,
        "churned_users_dod": _q_churned_users_dod,
        "new_users_daily": _q_new_users_daily,
        "trailing_7d_revenue": _q_trailing_7d_revenue,
        "revenue_autocorr": _q_revenue_autocorr,
        "weekday_revenue": _q_weekday_revenue,
        "dup_cluster_sizes": _q_dup_cluster_sizes,
        "term_contexts": _q_term_contexts,
        "incremental_daily_rollup": _q_incremental_daily_rollup,
        "zone_pruned_revenue": _q_zone_pruned_revenue,
        "bucketed_priority_revenue": _q_bucketed_priority_revenue,
        "value_weighted_median": _q_value_weighted_median,
        "price_wmedian_by_flag": _q_price_wmedian_by_flag,
        "top_supplier_window": _q_top_supplier_window,
        "small_qty_part_revenue": _q_small_qty_part_revenue,
        "pack_sequences": _q_pack_sequences,
        "epoch_pack": _q_epoch_pack,
        "user_value_timeweighted": _q_user_value_timeweighted,
        "bigticket_customer_orders": _q_bigticket_customer_orders,
        "orders_quality_audit": _q_orders_quality_audit,
        "dup_triangles": _q_dup_triangles,
        "customer_activity_cogroup": _q_customer_activity_cogroup,
        "value_winsorized_sums": _q_value_winsorized_sums,
        "revenue_share_by_nation": _q_revenue_share_by_nation,
        "revenue_mom": _q_revenue_mom,
        "dataset_split_counts": _q_dataset_split_counts,
        "orders_zorder_parts": _q_orders_zorder_parts,
        "latest_event_per_user": _q_latest_event_per_user,
        "top_anchor_texts": _q_top_anchor_texts,
        "top_transitions": _q_top_transitions,
        "top_transitions3": _q_top_transitions3,
        "retention_cohorts": _q_retention_cohorts,
        "docs_with_terms": _q_docs_with_terms,
        "join_overlap_estimate": _q_join_overlap_estimate,
        "orderkey_skew_stats": _q_orderkey_skew_stats,
        "value_outliers_mad": _q_value_outliers_mad,
        "order_price_range_parts": _q_order_price_range_parts,
        "uniform_source_cap": _q_uniform_source_cap,
        "event_funnel": _q_event_funnel,
        "dedup_keep_longest": _q_dedup_keep_longest,
        "compression_ratios": _q_compression_ratios,
        "priority_quantity_salted": _q_priority_quantity_salted,
        "label_centroids": _q_label_centroids,
        "value_median_exact": _q_value_median_exact,
        "events_union_by_name": _q_events_union_by_name,
        "value_histogram": _q_value_histogram,
        "pmi_collocations": _q_pmi_collocations,
        "inverted_index": _q_inverted_index,
        "top_tokens": _q_top_tokens,
        "frequent_users_sketch": _q_frequent_users_sketch,
        "frequent_users_by_type": _q_frequent_users_by_type,
        "order_price_quantiles_approx": _q_order_price_quantiles_approx,
        "active_ship_days": _q_active_ship_days,
        "quiet_ship_days": _q_quiet_ship_days,
        "revenue_rollup": _q_revenue_rollup,
        "stratified_doc_sample": _q_stratified_doc_sample,
        "capped_docs_per_source": _q_capped_docs_per_source,
        "orders_upsert": _q_orders_upsert,
        "tfidf_top3": _q_tfidf_top3,
        "revenue_cube": _q_revenue_cube,
        "event_gaps": _q_event_gaps,
        "chunk_dedup_docs": _q_chunk_dedup_docs,
        "dup_span_stats": _q_dup_span_stats,
        "dup_span_clean": _q_dup_span_clean,
        "bpe_merges": _q_bpe_merges,
        "gopher_quality": _q_gopher_quality,
        "model_quality_by_source": _q_model_quality_by_source,
        "contamination_screen": _q_contamination_screen,
        "contamination_screen_join": _q_contamination_screen_join,
        "window_active_users": _q_window_active_users,
        "window_active_users_approx": _q_window_active_users_approx,
        "contamination_screen_bloom": _q_contamination_screen_bloom,
        "cdc_dup_stats": _q_cdc_dup_stats,
        "extract_outlinks": _q_extract_outlinks,
        "host_pagerank": _q_host_pagerank,
        "host_hits": _q_host_hits,
        "robots_frontier": _q_robots_frontier,
        "extract_span_eval": _q_extract_span_eval,
        "jsonld_roundtrip": _q_jsonld_roundtrip,
        "redirect_resolution": _q_redirect_resolution,
        "page_metadata": _q_page_metadata,
        "top_link_targets": _q_top_link_targets,
        "extract_flagship": _q_extract_flagship,
        "extract_records": _q_extract_records,
        "extract_by_strategy": _q_extract_by_strategy,
        "extract_routed": _q_extract_routed,
        "nb_lang_top_tokens": _q_nb_lang_top_tokens,
        "nb_confusion": _q_nb_confusion,
        "stump_split_nchars": _q_stump_split_nchars,
        "logreg_en_confusion": _q_logreg_en_confusion,
        "nb_cv_accuracy": _q_nb_cv_accuracy,
        "nb_distinctive_tokens": _q_nb_distinctive_tokens,
        "unimax_mix_allocation": _q_unimax_mix_allocation,
        "temperature_mix_allocation": _q_temperature_mix_allocation,
        "kmeans_pp_clusters": _q_kmeans_pp_clusters,
        "knn_sq8": _q_knn_sq8,
        "corpus_prep_v4": _q_corpus_prep_v4,
        "corpus_prep_v5": _q_corpus_prep_v5,
        "daily_revenue_interp": _q_daily_revenue_interp,
    }


def _shuffled_doc_order_sql() -> str:
    """Oracle for the deterministic shuffle: rank by the SAME
    splitmix64 key, emulated bit-exactly in HUGEINT (the key is a
    bijection of doc_id, so the ORDER BY is a total order with no
    tiebreak needed)."""
    from pdf_table_extractor_ray.stages.shuffle import splitmix64_sql

    key = splitmix64_sql("doc_id", seed=42)
    return (
        f"WITH k AS (SELECT doc_id, {key} AS h FROM documents) "
        "SELECT doc_id, CAST(row_number() OVER (ORDER BY h) - 1 AS BIGINT) AS pos "
        "FROM k"
    )


def _curriculum_doc_order_sql() -> str:
    """Oracle for the curriculum shuffle: rank by (stratum, the SAME
    bit-exact splitmix64 key); DuckDB's default binary varchar
    collation matches Python's codepoint sort for the ASCII lang
    strata."""
    from pdf_table_extractor_ray.stages.shuffle import splitmix64_sql

    key = splitmix64_sql("doc_id", seed=42)
    return (
        f"WITH k AS (SELECT doc_id, lang, {key} AS h FROM documents "
        "WHERE lang IS NOT NULL) "
        "SELECT doc_id, CAST(row_number() OVER (ORDER BY lang, h) - 1 AS BIGINT) "
        "AS pos FROM k"
    )


def _weighted_doc_sample_sql() -> str:
    """Oracle for the Efraimidis–Spirakis draw: the hash uniform is
    two chained splitmix64 finalizers (``_splash64(id)`` ==
    splitmix64(id, seed=0); the xor-seed + second splash ==
    splitmix64(h, seed)), both emulated bit-exactly in HUGEINT; the
    key ``ln(u)/w`` uses the same IEEE double ops in the same order as
    the numpy kernel (cast → +1.0 → /2^64 → ln → /w)."""
    from pdf_table_extractor_ray.stages.shuffle import splitmix64_sql

    inner = splitmix64_sql("doc_id", seed=0)
    outer = splitmix64_sql("h1", seed=0x5EED)
    return (
        f"WITH a AS (SELECT doc_id, n_chars, {inner} AS h1 FROM documents), "
        f"b AS (SELECT doc_id, n_chars, {outer} AS u64 FROM a) "
        "SELECT doc_id FROM b "
        "ORDER BY ln((CAST(u64 AS DOUBLE) + 1.0) / 18446744073709551616.0) "
        "/ GREATEST(CAST(n_chars AS DOUBLE), 1e-12) DESC "
        "LIMIT 100"
    )


def _uniform_source_cap_sql() -> str:
    """Oracle for the uniformly-random per-source cap: the draw key is
    ``_splash64(id ^ seed) >> 1`` == ``splitmix64_sql(id, seed) // 2``
    (bit-exact HUGEINT emulation), ranked per source with the id
    tiebreak the engine uses."""
    from pdf_table_extractor_ray.stages.shuffle import splitmix64_sql

    key = splitmix64_sql("doc_id", seed=42)
    return (
        f"WITH h AS (SELECT doc_id, source, ({key}) // 2 AS hh FROM documents), "
        "r AS (SELECT doc_id, source, row_number() OVER "
        "(PARTITION BY source ORDER BY hh, doc_id) AS rn FROM h) "
        "SELECT doc_id, source FROM r WHERE rn <= 10"
    )


def _weighted_source_sample_sql() -> str:
    """Oracle for the per-source Efraimidis–Spirakis sample: key =
    ``-ln((splitmix64(id, seed) + 1) / 2^64) / w`` replayed with the
    same IEEE double ops in the same order; smallest 8 per source."""
    from pdf_table_extractor_ray.stages.shuffle import splitmix64_sql

    key = splitmix64_sql("doc_id", seed=7)
    return (
        "WITH h AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, "
        f"-ln((CAST({key} AS DOUBLE) + 1.0) / 18446744073709551616.0) "
        "/ CAST(n_chars AS DOUBLE) AS es FROM documents "
        "WHERE n_chars IS NOT NULL AND n_chars > 0), "
        "r AS (SELECT doc_id, source, n_chars, row_number() OVER "
        "(PARTITION BY source ORDER BY es, doc_id) AS rn FROM h) "
        "SELECT doc_id, source, n_chars FROM r WHERE rn <= 8"
    )


def _user_counts_cms_sql() -> str:
    """Oracle for the count-min point estimates: the sketch is fully
    deterministic integer math — base hash ``splitmix64(id, 0)``
    (HUGEINT emulation), per-depth affine remix ``h·M_d + A_d`` with
    wrapping 64-bit multiply (the same split-at-32-bits trick the
    shuffle oracle uses), cell ``(h_d >> 17) % width``, counter = how
    many events land in the cell, estimate = min over depth rows —
    collisions and all."""
    from pdf_table_extractor_ray.stages.shuffle import splitmix64_sql
    from pdf_table_extractor_ray.stages.sketches import _CMS_ADD, _CMS_MULT

    m64 = "18446744073709551616::HUGEINT"

    def mulmod(z: str, c: int) -> str:
        return (
            f"(((({z}) % 4294967296) * {c}::HUGEINT + "
            f"(((({z}) // 4294967296) * {c}::HUGEINT) % 4294967296) * 4294967296) % {m64})"
        )

    def cell(hcol: str, d: int) -> str:
        hd = f"(({mulmod(hcol, int(_CMS_MULT[d]))} + {int(_CMS_ADD[d])}::HUGEINT) % {m64})"
        return f"((({hd}) // 131072) % 4096)"

    h_ev = splitmix64_sql("user_id", seed=0)
    h_k = splitmix64_sql("g.k", seed=0)
    counts = " UNION ALL ".join(
        f"SELECT {d} AS d, {cell('h', d)} AS cell, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM ev GROUP BY 2"
        for d in range(4)
    )
    probe_cells = " UNION ALL ".join(
        f"SELECT user_id, {d} AS d, {cell('h', d)} AS cell FROM probe"
        for d in range(4)
    )
    return (
        f"WITH ev AS (SELECT {h_ev} AS h FROM events WHERE user_id IS NOT NULL), "
        f"cellcnt AS ({counts}), "
        f"probe AS (SELECT CAST(g.k AS BIGINT) AS user_id, {h_k} AS h "
        "FROM generate_series(0, 19) AS g(k)), "
        f"pc AS ({probe_cells}) "
        "SELECT pc.user_id, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est_n_events "
        "FROM pc LEFT JOIN cellcnt c ON c.d = pc.d AND c.cell = pc.cell "
        "GROUP BY pc.user_id"
    )


def _image_thumbnails_sql() -> str:
    """Oracle for the resize pipeline: recompute every 12×12 thumbnail
    cell as the exact integer block average of the planted closed-form
    pixels ((m·31 + r·7 + c·3 + ch·11) % 256; block = sy×sx with
    sy, sx ∈ {1,2} — power-of-two means, so the engine's float mean +
    uint8 truncation IS integer division). resized_len for the PPM
    codec is the 13-byte 'P6\\n12 12\\n255\\n' header + 432 pixel
    bytes = 445."""
    return (
        "WITH m AS (SELECT CAST(vec_id AS BIGINT) AS media_id FROM embeddings), "
        "dims AS (SELECT media_id, 12*(1 + (media_id//2)%2) AS h, "
        "12*(1 + (media_id//4)%2) AS w FROM m WHERE media_id % 2 = 0), "
        "cells AS (SELECT d.media_id, d.h//12 AS sy, d.w//12 AS sx, "
        "i.i AS i, j.j AS j, ch.ch AS ch FROM dims d, "
        "generate_series(0,11) AS i(i), generate_series(0,11) AS j(j), "
        "generate_series(0,2) AS ch(ch)), "
        "pix AS (SELECT c.media_id, c.i, c.j, c.ch, c.sy*c.sx AS cnt, "
        "SUM((c.media_id*31 + (c.i*c.sy + dy.dy)*7 + (c.j*c.sx + dx.dx)*3 "
        "+ c.ch*11) % 256) AS s "
        "FROM cells c, generate_series(0,1) AS dy(dy), generate_series(0,1) AS dx(dx) "
        "WHERE dy.dy < c.sy AND dx.dx < c.sx "
        "GROUP BY c.media_id, c.i, c.j, c.ch, c.sy, c.sx), "
        "sums AS (SELECT media_id, CAST(SUM(s // cnt) AS BIGINT) AS thumb_sum "
        "FROM pix GROUP BY media_id) "
        "SELECT m.media_id, "
        "CASE WHEN m.media_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind, "
        "CAST(CASE WHEN m.media_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT) AS ok, "
        "CAST(CASE WHEN m.media_id % 2 = 0 THEN 445 ELSE 0 END AS BIGINT) AS resized_len, "
        "COALESCE(s.thumb_sum, 0) AS thumb_sum "
        "FROM m LEFT JOIN sums s ON m.media_id = s.media_id"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "doc_stats_by_source": (
            "SELECT source, count(*) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars, "  # HUGEINT → int64
            "avg(n_chars) AS avg_chars FROM documents GROUP BY source"
        ),
        "doc_filter_project": (
            "SELECT doc_id, lang, n_chars FROM documents WHERE lang = 'en' AND n_chars > 500"
        ),
        "exact_dedup_docs": ("SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)"),
        "normalized_dedup_docs": (
            "SELECT min(doc_id) AS doc_id FROM documents "
            "GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
        ),
        "long_docs_p95": (
            "SELECT doc_id, n_chars FROM documents WHERE n_chars > "
            "(SELECT quantile_disc(n_chars, 0.95) FROM documents)"
        ),
        "order_price_scaled": (
            "SELECT o_orderkey, o_orderpriority, o_totalprice, "
            "CASE WHEN max(o_totalprice) OVER w = min(o_totalprice) OVER w THEN 0.0 "
            "ELSE (o_totalprice - min(o_totalprice) OVER w) / "
            "(max(o_totalprice) OVER w - min(o_totalprice) OVER w) END AS scaled "
            "FROM orders WINDOW w AS (PARTITION BY o_orderpriority)"
        ),
        "urgent_bigticket": (
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
            "WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000"
        ),
        "doc_table_checksum": (
            "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(sum(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)) "
            "% 1099511627776 AS BIGINT) AS checksum FROM documents"
        ),
        "edit_distance_pairs": (
            "WITH s AS (SELECT doc_id, text FROM documents "
            "WHERE substr(md5(text), 1, 1) = '0'), "
            "p AS (SELECT doc_id AS doc_a, "
            "lead(doc_id) OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) AS doc_b, "
            "text AS ta, "
            "lead(text) OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) AS tb FROM s) "
            "SELECT doc_a, doc_b, CAST(levenshtein(ta, tb) AS BIGINT) AS edit_dist "
            "FROM p WHERE doc_b IS NOT NULL"
        ),
        "late_events": (
            "WITH t AS (SELECT event_id, user_id, ts, "
            "((event_id % 65536) * 2654435761) % 4294967296 AS arrival FROM events) "
            "SELECT event_id, user_id, "
            "CAST(COALESCE(ts < max(ts) OVER (PARTITION BY user_id ORDER BY arrival, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
            "- INTERVAL 30 MINUTE, FALSE) AS BIGINT) AS is_late FROM t"
        ),
        "doc_length_pct_rank": (
            "SELECT doc_id, n_chars, "
            "percent_rank() OVER (ORDER BY n_chars) AS pct_rank FROM documents"
        ),
        "windowed_late_split": (
            "WITH t AS (SELECT event_id, user_id, ts, "
            "((event_id % 65536) * 2654435761) % 4294967296 AS arrival FROM events), "
            "tagged AS (SELECT ts, "
            "CAST(COALESCE(ts < max(ts) OVER (PARTITION BY user_id ORDER BY arrival, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
            "- INTERVAL 30 MINUTE, FALSE) AS BIGINT) AS is_late FROM t) "
            "SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_start_us, "
            "CAST(sum(1 - is_late) AS BIGINT) AS n_on_time, "
            "CAST(sum(is_late) AS BIGINT) AS n_late "
            "FROM tagged GROUP BY 1"
        ),
        "value_comoments_by_type": (
            "WITH t AS (SELECT event_type, "
            "CAST(floor(value * 100) AS BIGINT) AS x, "
            "CAST(NULLIF(regexp_extract(props, '\"k\": (\\d+)', 1), '') AS BIGINT) AS y "
            "FROM events) "
            "SELECT event_type, count(*) AS n, count(y) AS n_xy, "
            "CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y, "
            "CAST(sum(x * y) AS BIGINT) AS sum_xy, "
            "CAST(sum(x * x) AS BIGINT) AS sum_x2, "
            "CAST(sum(y * y) AS BIGINT) AS sum_y2 "
            "FROM t GROUP BY event_type"
        ),
        "props_value_by_type": (
            "SELECT event_type, count(*) AS n, "
            "CAST(sum(CAST(NULLIF(regexp_extract(props, '\"k\": (\\d+)', 1), '') AS BIGINT)) "
            "AS BIGINT) AS total_k FROM events GROUP BY event_type"
        ),
        "pii_scrub": (
            "SELECT doc_id, "
            "len(regexp_extract_all(text, '\\b(?:customer|user)\\b')) AS n_redactions, "
            "md5(regexp_replace(text, '\\b(?:customer|user)\\b', '<PII>', 'g')) AS scrub_md5 "
            "FROM documents"
        ),
        "token_counts": (
            "SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tokens FROM documents"
        ),
        "token_counts_bpe": (
            "SELECT doc_id, len(regexp_extract_all(text, "
            "' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+')) AS n_bpe_tokens FROM documents"
        ),
        "lineitem_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            "sum(CAST(floor(l_quantity*100) AS BIGINT))/100.0 AS sum_qty, "
            "sum(CAST(floor(l_extendedprice*100) AS BIGINT))/100.0 AS sum_base_price, "
            "sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT))/100.0 AS sum_disc_price, "
            "count(*) AS count_order "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "orders_top10": (
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "events_by_type": (
            "SELECT event_type, count(*) AS n_events, "
            "sum(CAST(floor(value*100) AS BIGINT))/100.0 AS total_value, "
            "min(epoch_us(ts)) AS first_ts_us, max(epoch_us(ts)) AS last_ts_us "
            "FROM events GROUP BY event_type"
        ),
        "money_roundtrip": (
            "SELECT l_orderkey, l_linenumber, "
            "CAST(floor(l_extendedprice*100) AS BIGINT)/100.0 AS amount FROM lineitem"
        ),
        "date_roundtrip": (
            "SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_day "
            "FROM lineitem"
        ),
        "redirect_resolution": (
            "WITH RECURSIVE e AS ("
            "SELECT 'u' || CAST(o_orderkey AS VARCHAR) AS src, "
            "'u' || CAST(o_orderkey - 1 AS VARCHAR) AS dst "
            "FROM orders WHERE o_orderkey % 8 <> 0), "
            "walk(src, cur, hops) AS ("
            "SELECT src, dst, CAST(1 AS BIGINT) FROM e "
            "UNION ALL SELECT w.src, e2.dst, w.hops + 1 "
            "FROM walk w JOIN e e2 ON w.cur = e2.src) "
            "SELECT src, cur AS final, hops FROM walk w "
            "WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.src = w.cur)"
        ),
        "jsonld_roundtrip": (
            "SELECT p_partkey AS sku, p_name AS name, p_brand AS brand, "
            "CAST(p_size AS BIGINT) AS size, "
            "'q\"' || CAST(p_partkey AS VARCHAR) || '\\' AS desc FROM part"
        ),
        "sitemap_roundtrip": (
            "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS lastmod, "
            "CASE WHEN o_orderkey % 2 = 0 THEN 'daily' END AS changefreq FROM orders"
        ),
        "warc_roundtrip": (
            "SELECT doc_id, 1735689600000000 + doc_id*1000000 AS warc_ts_us, "
            "text FROM documents"
        ),
        "wet_roundtrip": (
            "SELECT doc_id, 1735689600000000 + doc_id*1000000 AS warc_ts_us, "
            "text FROM documents"
        ),
        "cdx_fetch_roundtrip": (
            "SELECT doc_id, 'test,docs)/' || CAST(doc_id AS VARCHAR) AS surt_key, "
            "text FROM documents"
        ),
        "latest_ok_fetch": (
            "SELECT doc_id, 1735689600000000 + doc_id*1000000 + "
            "(CASE WHEN doc_id % 2 <> 0 THEN 2 WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END) "
            "* 86400000000 AS best_ts_us, "
            "'v' || CAST(CASE WHEN doc_id % 2 <> 0 THEN 2 WHEN doc_id % 3 <> 0 THEN 1 "
            "ELSE 0 END AS VARCHAR) || ':' || text AS text FROM documents"
        ),
        "polite_fetch_schedule": (
            "SELECT o_orderkey, 'h' || CAST(o_custkey % 50 AS VARCHAR) AS host, "
            "CAST(row_number() OVER w - 1 AS BIGINT) AS fetch_rank, "
            "1735689600000000 + (row_number() OVER w - 1) * 2000000 AS scheduled_ts_us "
            "FROM orders WINDOW w AS "
            "(PARTITION BY o_custkey % 50 ORDER BY o_orderdate, o_orderkey)"
        ),
        "crawl_depth_bfs": (
            "WITH RECURSIVE e AS ("
            "SELECT o_orderkey AS src, o_orderkey - 1 AS dst FROM orders "
            "UNION ALL SELECT o_orderkey, o_orderkey - 8 FROM orders "
            "WHERE o_orderkey % 4 = 0), "
            "s AS (SELECT o_orderkey AS node FROM orders WHERE o_orderkey % 64 = 0), "
            "walk(node, d) AS (SELECT node, CAST(0 AS BIGINT) FROM s "
            "UNION ALL SELECT e.dst, w.d + 1 FROM walk w "
            "JOIN e ON e.src = w.node WHERE w.d < 8) "
            "SELECT node, min(d) AS depth FROM walk GROUP BY node"
        ),
        "crawl_depth_bfs_resumable": (
            "WITH RECURSIVE e AS ("
            "SELECT o_orderkey AS src, o_orderkey - 1 AS dst FROM orders "
            "UNION ALL SELECT o_orderkey, o_orderkey - 8 FROM orders "
            "WHERE o_orderkey % 4 = 0), "
            "s AS (SELECT o_orderkey AS node FROM orders WHERE o_orderkey % 64 = 0), "
            "walk(node, d) AS (SELECT node, CAST(0 AS BIGINT) FROM s "
            "UNION ALL SELECT e.dst, w.d + 1 FROM walk w "
            "JOIN e ON e.src = w.node WHERE w.d < 8) "
            "SELECT node, min(d) AS depth FROM walk GROUP BY node"
        ),
        "doc_token_windows": (
            "WITH t AS (SELECT doc_id, string_split(text, ' ') AS w "
            "FROM documents WHERE text IS NOT NULL), "
            "n AS (SELECT doc_id, w, len(w) AS l, "
            "1 + greatest(0, (len(w) - 32 + 15) // 16) AS nw FROM t), "
            "e AS (SELECT doc_id, w, l, unnest(generate_series(1, nw)) AS k FROM n) "
            "SELECT doc_id, CAST(k - 1 AS BIGINT) AS win_idx, "
            "array_to_string(list_slice(w, (k-1)*16 + 1, "
            "least((k-1)*16 + 32, l)), ' ') AS window_text FROM e"
        ),
        "mirror_url_groups": (
            "SELECT min(doc_id) AS rep_doc_id, count(*) AS n_urls "
            "FROM documents GROUP BY doc_id // 3"
        ),
        "doc_sentences": (
            "WITH a AS (SELECT doc_id, "
            "regexp_split_to_array(text, '[.!?\\n]+\\s*') AS arr FROM documents), "
            "p AS (SELECT doc_id, unnest(list_transform(arr, "
            "(x, i) -> struct_pack(i := i, x := x))) AS s FROM a) "
            "SELECT doc_id, CAST(s.i AS BIGINT) AS sent_idx, s.x AS sentence FROM p"
        ),
        "robots_sitemap_discovery": (
            "SELECT 'h' || CAST(c_custkey AS VARCHAR) || '.test' AS host, "
            "'https://h' || CAST(c_custkey AS VARCHAR) || '.test/sitemap-pages.xml' "
            "AS sitemap_url FROM customer "
            "UNION ALL SELECT 'h' || CAST(c_custkey AS VARCHAR) || '.test', "
            "'https://h' || CAST(c_custkey AS VARCHAR) || '.test/sitemap-news.xml' "
            "FROM customer WHERE c_custkey % 2 = 0"
        ),
        "url_pattern_counts": (
            "SELECT regexp_replace('https://shop.test/u' || CAST(o_custkey AS VARCHAR) "
            "|| '/' || (CASE o_orderkey % 4 WHEN 0 THEN 'order' WHEN 1 THEN 'item' "
            "WHEN 2 THEN 'archive' ELSE 'tag' END) || '/' || "
            "CAST(o_orderkey AS VARCHAR) || '?page=' || "
            "CAST(o_orderkey % 7 AS VARCHAR), '[0-9]+', '#', 'g') AS pattern, "
            "count(*) AS n_urls FROM orders GROUP BY pattern"
        ),
        "docs_per_registrable_domain": (
            "SELECT 'owner' || CAST(c_custkey % 13 AS VARCHAR) || '.' || "
            "CASE c_custkey % 5 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk' "
            "WHEN 2 THEN 'com.br' WHEN 3 THEN 'github.io' ELSE 'org' END AS domain, "
            "count(*) AS n_hosts FROM customer GROUP BY domain"
        ),
        "dom_select_cards": "SELECT c_custkey, c_name FROM customer",
        "dom_main_content": (
            "SELECT doc_id, COALESCE(text, '') AS text, "
            "length(COALESCE(text, '')) AS n_chars FROM documents"
        ),
        "dom_shape_clusters": (
            "SELECT min(c_custkey) AS shape_rep, count(*) AS n_pages "
            "FROM customer GROUP BY c_custkey % 3"
        ),
        "image_dhash_dups": (
            "SELECT vec_id AS doc_a, vec_id + 10000000 AS doc_b, "
            "CAST(0 AS BIGINT) AS hamming FROM embeddings WHERE vec_id % 5 = 0"
        ),
        "audio_dup_pairs": (
            "SELECT vec_id AS doc_a, vec_id + 10000000 AS doc_b, "
            "CAST(0 AS BIGINT) AS hamming FROM embeddings WHERE vec_id % 4 = 0"
        ),
        "media_dedup_keep": ("SELECT vec_id AS media_id FROM embeddings"),
        "video_dup_pairs": (
            "SELECT vec_id AS doc_a, vec_id + 10000000 AS doc_b, "
            "CAST(0 AS BIGINT) AS hamming FROM embeddings WHERE vec_id % 6 = 0"
        ),
        "jsonl_roundtrip": (
            "SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders"
        ),
        "label_budget_neyman": (
            "WITH s AS (SELECT o_orderpriority AS key, "
            "CAST(count(*) AS HUGEINT) AS n, "
            "sum(CAST(floor(o_totalprice * 100) AS HUGEINT)) AS sx, "
            "sum(CAST(floor(o_totalprice * 100) AS HUGEINT) * "
            "CAST(floor(o_totalprice * 100) AS HUGEINT)) AS sxx "
            "FROM orders GROUP BY 1), "
            "v AS (SELECT key, n, n * sxx - sx * sx AS vn FROM s), "
            "w AS (SELECT key, n, vn, "
            "CAST(floor(sqrt(CAST(vn AS DOUBLE))) AS HUGEINT) AS c FROM v), "
            "wi AS (SELECT key, n, CASE "
            "WHEN (c+2)*(c+2) <= vn THEN c+2 "
            "WHEN (c+1)*(c+1) <= vn THEN c+1 "
            "WHEN c*c <= vn THEN c "
            "WHEN c >= 1 AND (c-1)*(c-1) <= vn THEN c-1 "
            "ELSE greatest(c-2, 0) END AS wgt FROM w), "
            "tot AS (SELECT sum(wgt) AS wsum FROM wi), "
            "base AS (SELECT key, n, (10000 * wgt) // wsum AS b, "
            "(10000 * wgt) % wsum AS rem FROM wi, tot), "
            "lo AS (SELECT 10000 - sum(b) AS leftover FROM base), "
            "rk AS (SELECT key, n, b, "
            "ROW_NUMBER() OVER (ORDER BY rem DESC, key ASC) AS rnk FROM base) "
            "SELECT key, CAST(n AS BIGINT) AS n, "
            "CAST(b + CASE WHEN rnk <= (SELECT leftover FROM lo) "
            "THEN 1 ELSE 0 END AS BIGINT) AS alloc FROM rk"
        ),
        "corpus_data_card": (
            "SELECT 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value "
            "FROM documents "
            "UNION ALL SELECT 'n_langs', CAST(count(DISTINCT lang) AS DOUBLE) "
            "FROM documents "
            "UNION ALL SELECT 'n_sources', CAST(count(DISTINCT source) AS DOUBLE) "
            "FROM documents "
            "UNION ALL SELECT 'total_chars', CAST(sum(n_chars) AS DOUBLE) "
            "FROM documents "
            "UNION ALL SELECT 'p50_chars', "
            "CAST(quantile_disc(n_chars, 0.5) AS DOUBLE) FROM documents "
            "UNION ALL SELECT 'p95_chars', "
            "CAST(quantile_disc(n_chars, 0.95) AS DOUBLE) FROM documents "
            "UNION ALL SELECT 'n_distinct_texts', "
            "CAST(count(DISTINCT md5(text)) AS DOUBLE) FROM documents"
        ),
        "incremental_crawl_dedup": (
            "SELECT min(doc_id) AS doc_id FROM documents "
            "WHERE md5(text) NOT IN "
            "(SELECT md5(text) FROM documents WHERE doc_id % 2 = 0) "
            "GROUP BY md5(text)"
        ),
        "mojibake_repair": (
            "SELECT doc_id, COALESCE(text, '') || ' café naïve — ação' AS text, "
            "CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS was_broken "
            "FROM documents"
        ),
        "blocklist_admission": (
            "SELECT doc_id, "
            "len(regexp_extract_all(lower(COALESCE(text, '')), "
            "'\\b(?:fast scan|slow)\\b')) AS latency_hits, "
            "len(regexp_extract_all(lower(COALESCE(text, '')), "
            "'\\b(?:spark)\\b')) AS vendor_hits, "
            "CASE WHEN len(regexp_extract_all(lower(COALESCE(text, '')), "
            "'\\b(?:fast scan|slow)\\b')) <= 3 AND "
            "len(regexp_extract_all(lower(COALESCE(text, '')), "
            "'\\b(?:spark)\\b')) <= 3 THEN 1 ELSE 0 END AS admitted "
            "FROM documents"
        ),
        "crawl_markdown_export": (
            "SELECT o_orderkey, "
            "'# Order ' || o_orderkey || chr(10) || chr(10) || "
            "'Status: **' || o_orderstatus || '**.' || chr(10) || chr(10) || "
            "'- priority *' || o_orderpriority || '*' || chr(10) || "
            "'- id ' || o_orderkey || chr(10) || chr(10) || "
            "'> verified' || chr(10) || chr(10) || "
            "'[details page](https://orders.test/' || o_orderkey || ')' "
            "|| chr(10) || chr(10) || '---' || chr(10) || chr(10) || "
            "'```' || chr(10) || 'raw ' || o_orderkey || chr(10) || '```' "
            "AS markdown FROM orders"
        ),
        "html_markdown_roundtrip": (
            "SELECT o_orderkey, "
            "'# Order ' || o_orderkey || chr(10) || chr(10) || "
            "'Status: **' || o_orderstatus || '**.' || chr(10) || chr(10) || "
            "'- priority *' || o_orderpriority || '*' || chr(10) || "
            "'- id ' || o_orderkey || chr(10) || chr(10) || "
            "'> verified' || chr(10) || chr(10) || "
            "'[details page](https://orders.test/' || o_orderkey || ')' "
            "|| chr(10) || chr(10) || '---' || chr(10) || chr(10) || "
            "'```' || chr(10) || 'raw ' || o_orderkey || chr(10) || '```' "
            "AS markdown FROM orders"
        ),
        "template_lines_by_source": (
            "SELECT source, '«nav ' || source || '»' AS line, "
            "count(*) AS n_docs, count(*) AS n_docs_key FROM documents GROUP BY source "
            "UNION ALL SELECT source, '«footer ' || source || '»' AS line, "
            "count(*) AS n_docs, count(*) AS n_docs_key FROM documents GROUP BY source"
        ),
        "template_strip_roundtrip": (
            "SELECT doc_id, COALESCE(text, '') AS text, "
            "CAST(2 AS BIGINT) AS n_template_lines FROM documents"
        ),
        "html_table_roundtrip": (
            "SELECT p_partkey AS partkey, p_name AS name, p_brand AS brand, "
            "p_type AS type, CAST(p_size AS BIGINT) AS size, "
            "'a&b<' || CAST(p_partkey AS VARCHAR) || '>' AS note FROM part"
        ),
        "union_sources": (
            "SELECT lang, count(*) AS n_docs FROM ("
            "SELECT * FROM documents WHERE source = 'src1' "
            "UNION ALL SELECT * FROM documents WHERE source = 'src2') GROUP BY lang"
        ),
        "distinct_users": "SELECT DISTINCT user_id FROM events",
        # langid/quality: the engine's kernels are pyarrow RE2 regex
        # counts — DuckDB regexp_extract_all is the same RE2, and the
        # float feature math is written in the identical IEEE op order
        "langid": (
            "SELECT doc_id, CASE "
            "WHEN len(regexp_extract_all(text, '(?i)\\b(?:the|and|of|to|in|is|that|for|with|was)\\b')) "
            "   > len(regexp_extract_all(text, '(?i)\\b(?:de|que|não|uma|para|com|os|do|da|em)\\b')) THEN 'en' "
            "WHEN len(regexp_extract_all(text, '(?i)\\b(?:de|que|não|uma|para|com|os|do|da|em)\\b')) "
            "   > len(regexp_extract_all(text, '(?i)\\b(?:the|and|of|to|in|is|that|for|with|was)\\b')) THEN 'pt' "
            "ELSE 'unknown' END AS pred_lang FROM documents"
        ),
        "quality": (
            "WITH feats AS (SELECT doc_id, "
            "  CAST(length(text) AS DOUBLE) AS nc, "
            "  CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS nt, "
            "  CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) AS np, "
            "  CAST(len(regexp_extract_all(text, '(?i)\\b(?:the|and|of|to|in|is|that|for|with|was)\\b')) "
            "   + len(regexp_extract_all(text, '(?i)\\b(?:de|que|não|uma|para|com|os|do|da|em)\\b')) AS DOUBLE) AS ns, "
            "  CAST(len(regexp_extract_all(text, '\\S')) AS DOUBLE) AS nns "
            "  FROM documents), "
            "ratios AS (SELECT doc_id, nc, nt, "
            "  np / greatest(nc, 1.0) AS punct_ratio, "
            "  ns / greatest(nt, 1.0) AS stopword_ratio, "
            "  nns / greatest(nt, 1.0) AS mean_token_len FROM feats) "
            "SELECT doc_id, CAST(nc AS BIGINT) AS n_chars, CAST(nt AS BIGINT) AS n_tokens, "
            "  punct_ratio, stopword_ratio, mean_token_len, "
            "  least(greatest(nt / 100.0, 0), 1) * 0.4 "
            "  + least(greatest(1.0 - abs(mean_token_len - 5.0) / 5.0, 0), 1) * 0.3 "
            "  + least(greatest(stopword_ratio * 5.0, 0), 1) * 0.2 "
            "  + least(greatest(1.0 - punct_ratio * 10.0, 0), 1) * 0.1 AS quality_score "
            "FROM ratios"
        ),
        "fingerprints": ("SELECT doc_id, md5(text) AS content_md5 FROM documents"),
        "events_hourly": (
            "SELECT user_id, epoch_us(ts) // 3600000000 AS hour_bucket, "
            "count(*) AS n_events FROM events GROUP BY user_id, hour_bucket"
        ),
        "dup_clusters": (
            "SELECT o_orderkey AS node, "
            "CAST(min(o_orderkey) OVER (PARTITION BY o_custkey) AS BIGINT) AS root "
            "FROM orders "
            "QUALIFY count(*) OVER (PARTITION BY o_custkey) > 1"
        ),
        "customer_nation": (
            "SELECT c_custkey, c_acctbal, n_name FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey"
        ),
        "top_revenue_orders": (
            "SELECT l_orderkey, "
            "sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT))/100.0 AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_orderdate < TIMESTAMP '1998-01-01' "
            "GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10"
        ),
        "local_supplier_revenue": (
            "SELECT n_name AS nation, count(*) AS n_items, "
            "sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT))/100.0 AS revenue "
            "FROM lineitem "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE s_nationkey = c_nationkey "
            "GROUP BY n_name"
        ),
        "trade_volume_pairs": (
            "SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, "
            "CAST(year(l_shipdate) AS BIGINT) AS ship_year, count(*) AS n_items, "
            "sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT))/100.0 AS revenue "
            "FROM lineitem "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ns ON s_nationkey = ns.n_nationkey "
            "JOIN nation nc ON c_nationkey = nc.n_nationkey "
            "WHERE s_nationkey <> c_nationkey "
            "GROUP BY 1, 2, 3"
        ),
        "nation_market_share": (
            "SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, "
            "CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) "
            "  AS total_cents, "
            "CAST(sum(CASE WHEN s_nationkey = 0 "
            "  THEN CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT) "
            "  ELSE 0 END) AS BIGINT) AS nation0_cents, "
            "CAST(sum(CASE WHEN s_nationkey = 0 "
            "  THEN CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT) "
            "  ELSE 0 END) AS DOUBLE) "
            " / CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS DOUBLE) "
            "  AS share "
            "FROM lineitem "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation cn ON c_nationkey = cn.n_nationkey "
            "WHERE cn.n_regionkey = 0 "
            "GROUP BY 1"
        ),
        "returned_item_customers": (
            "SELECT c_custkey, c_name, n_name AS nation, c_acctbal, "
            "sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT))/100.0 AS revenue "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "WHERE l_returnflag = 'R' "
            "GROUP BY 1, 2, 3, 4 "
            "ORDER BY revenue DESC, c_custkey LIMIT 20"
        ),
        "big_volume_orders": (
            "SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, "
            "sum(CAST(floor(l_quantity*100) AS BIGINT))/100.0 AS total_qty "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "GROUP BY 1, 2, 3, 4, 5 "
            "HAVING sum(CAST(floor(l_quantity*100) AS BIGINT)) > 25000"
        ),
        "promo_revenue": (
            "SELECT epoch_us(date_trunc('month', l_shipdate)) AS month_us, "
            "CAST(sum(CASE WHEN p_type = 'PROMO' "
            "  THEN CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT) "
            "  ELSE 0 END) AS BIGINT) AS promo_cents, "
            "CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) "
            "  AS total_cents, "
            "CAST(sum(CASE WHEN p_type = 'PROMO' "
            "  THEN CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT) "
            "  ELSE 0 END) AS DOUBLE) "
            " / CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS DOUBLE) "
            "  AS promo_share "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "GROUP BY 1"
        ),
        "brand_type_fd_audit": (
            "WITH pt AS (SELECT p_brand, p_type, count(*) AS n FROM part "
            "GROUP BY 1, 2) "
            "SELECT p_brand, count(*) AS n_types, "
            "CAST(sum(n) AS BIGINT) - CAST(max(n) AS BIGINT) AS n_violations "
            "FROM pt GROUP BY 1"
        ),
        "event_hour_association": (
            "WITH c AS (SELECT event_type, "
            "CAST(extract(hour FROM ts) AS BIGINT) AS hour, "
            "CAST(count(*) AS BIGINT) AS o FROM events "
            "WHERE event_type IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2) "
            "SELECT event_type, hour, o AS observed, "
            "CAST(o * (SELECT sum(o) FROM c) "
            " - sum(o) OVER (PARTITION BY event_type) "
            " * sum(o) OVER (PARTITION BY hour) AS BIGINT) AS resid_num "
            "FROM c"
        ),
        "doclen_ks": (
            "WITH ab AS (SELECT n_chars AS x, "
            "CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) AS ca, "
            "CAST(count(*) FILTER (WHERE source = 'src1') AS BIGINT) AS cb "
            "FROM documents WHERE source IN ('src0', 'src1') "
            "AND n_chars IS NOT NULL GROUP BY 1), "
            "c AS (SELECT x, sum(ca) OVER (ORDER BY x) AS cuma, "
            "sum(cb) OVER (ORDER BY x) AS cumb FROM ab), "
            "t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, "
            "CAST(sum(cb) AS BIGINT) AS nb FROM ab), "
            "d AS (SELECT x, abs(nb * cuma - na * cumb) AS dv FROM c, t), "
            "m AS (SELECT max(dv) AS mx FROM d) "
            "SELECT na AS n_a, nb AS n_b, CAST(mx AS BIGINT) AS ks_num, "
            "CAST((SELECT min(x) FROM d, m WHERE dv = mx) AS BIGINT) AS ks_at "
            "FROM t, m"
        ),
        "doclen_mwu": (
            "WITH ab AS (SELECT n_chars AS x, "
            "CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) AS ca, "
            "CAST(count(*) FILTER (WHERE source = 'src1') AS BIGINT) AS cb "
            "FROM documents WHERE source IN ('src0', 'src1') "
            "AND n_chars IS NOT NULL GROUP BY 1), "
            "c AS (SELECT x, ca, cb, ca + cb AS eq, "
            "CAST(coalesce(sum(ca + cb) OVER (ORDER BY x "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
            "AS less FROM ab), "
            "t AS (SELECT CAST(sum(ca) AS BIGINT) AS na, "
            "CAST(sum(cb) AS BIGINT) AS nb FROM ab) "
            "SELECT na AS n_a, nb AS n_b, "
            "CAST(sum(ca * (2 * less + eq + 1)) - na * (na + 1) AS BIGINT) AS u2_a "
            "FROM c, t GROUP BY na, nb"
        ),
        "revenue_cusum": (
            "WITH d AS (SELECT epoch_us(date_trunc('day', o_orderdate)) AS day_us, "
            "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents "
            "FROM orders WHERE o_orderdate IS NOT NULL "
            "AND o_totalprice IS NOT NULL GROUP BY 1), "
            "c AS (SELECT day_us, "
            "CAST(sum(cents) OVER (ORDER BY day_us) AS BIGINT) AS cum, "
            "CAST(row_number() OVER (ORDER BY day_us) AS BIGINT) AS k FROM d), "
            "t AS (SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(cents) AS BIGINT) AS total FROM d), "
            "v AS (SELECT day_us, abs(n * cum - k * total) AS dev FROM c, t), "
            "m AS (SELECT max(dev) AS mx FROM v) "
            "SELECT t.n AS n_days, t.total AS total_cents, "
            "CAST(m.mx AS BIGINT) AS cusum_num, "
            "CAST((SELECT min(day_us) FROM v, m WHERE dev = mx) AS BIGINT) "
            "AS cusum_at_us FROM t, m"
        ),
        "readability": (
            "SELECT doc_id, "
            "len(regexp_extract_all(text, '\\S+')) AS n_words, "
            "len(regexp_extract_all(text, '[.!?]+(\\s|$)')) AS n_sentences, "
            "len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS n_syllables, "
            "CAST(206835 * n_sentences * n_words - 1015 * n_words * n_words "
            "- 84600 * n_syllables * n_sentences AS BIGINT) AS flesch_num "
            "FROM documents WHERE text IS NOT NULL"
        ),
        "hapax_by_source": (
            "WITH tok AS (SELECT source, "
            "unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents "
            "WHERE source IS NOT NULL), "
            "c AS (SELECT source, t, count(*) AS n FROM tok GROUP BY 1, 2) "
            "SELECT source, CAST(count(*) FILTER (WHERE n = 1) AS BIGINT) AS hapax, "
            "CAST(count(*) AS BIGINT) AS vocab FROM c GROUP BY source"
        ),
        "bloom_pruned_lookup": (
            "SELECT o_orderkey, o_custkey, "
            "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents "
            "FROM orders WHERE o_orderkey IN (1, 7, 1000, 4999, 123456789)"
        ),
        "doc_length_deciles": (
            "SELECT doc_id, CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) "
            "AS BIGINT) AS decile FROM documents "
            "WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL"
        ),
        "shuffled_doc_order": _shuffled_doc_order_sql(),
        "curriculum_doc_order": _curriculum_doc_order_sql(),
        "weighted_doc_sample": _weighted_doc_sample_sql(),
        "image_thumbnails": _image_thumbnails_sql(),
        "uniform_source_cap": _uniform_source_cap_sql(),
        "weighted_source_sample": _weighted_source_sample_sql(),
        "user_counts_cms": _user_counts_cms_sql(),
        "token_entropies": (
            # same RE2 \S+ tokenization; H = ln(dl) − Σ tf·ln(tf)/dl in
            # float64 both sides; the ⌊1000·H⌋ milli-nat floor gives
            # ~1e9× slack over summation-order ulps (verified at all
            # three sf scales — fixed corpora pin it)
            "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t "
            "FROM documents), "
            "tf AS (SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS tf FROM tok GROUP BY 1, 2), "
            "agg AS (SELECT doc_id, SUM(tf * ln(tf)) AS mass, SUM(tf) AS dl "
            "FROM tf GROUP BY 1) "
            "SELECT d.doc_id, CAST(COALESCE(a.dl, 0) AS BIGINT) AS n_tokens, "
            "CAST(CASE WHEN a.dl IS NULL THEN -1 ELSE "
            "FLOOR(GREATEST(ln(a.dl) - a.mass / a.dl, 0.0) * 1000) END AS BIGINT) "
            "AS entropy_milli "
            "FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id"
        ),
        "encrypted_pdf_roundtrip": (
            "WITH k AS (SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders "
            "WHERE o_orderkey % 101 = 0), "
            "j AS (SELECT k.k, gs.j FROM k, generate_series(0, 3) AS gs(j) "
            "WHERE gs.j < 1 + k.k % 4), "
            "s AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_records, "
            "CAST(SUM(100 + (k*7 + j*13) % 9000) AS BIGINT) AS total_cents "
            "FROM j GROUP BY k) "
            "SELECT k AS o_orderkey, 'encrypted' AS strategy, 'ok' AS status, "
            "n_records, total_cents, "
            "CASE WHEN k % 2 = 1 THEN 'aesv2' ELSE 'rc4' END AS method FROM s"
        ),
        "quality_borda": (
            "WITH s AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS nc, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS nt, "
            "CAST(len(regexp_extract_all(text, '[.!?]+(\\s|$)')) AS BIGINT) AS ns "
            "FROM documents) "
            "SELECT doc_id, CAST(RANK() OVER (ORDER BY nc) "
            "+ RANK() OVER (ORDER BY nt) "
            "+ RANK() OVER (ORDER BY ns) AS BIGINT) AS borda FROM s"
        ),
        "daily_revenue_gini": (
            "WITH d AS (SELECT epoch_us(date_trunc('day', o_orderdate)) AS day_us, "
            "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents "
            "FROM orders WHERE o_orderdate IS NOT NULL "
            "AND o_totalprice IS NOT NULL GROUP BY 1), "
            "r AS (SELECT cents, "
            "CAST(row_number() OVER (ORDER BY cents, day_us) AS BIGINT) AS k FROM d), "
            "t AS (SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(cents) AS BIGINT) AS total FROM d) "
            "SELECT n AS n_days, total AS total_cents, "
            "CAST(2 * sum(k * cents) - (n + 1) * total AS BIGINT) AS gini_num "
            "FROM r, t GROUP BY n, total"
        ),
        "token_budget_head": (
            "WITH t AS (SELECT doc_id, source, n_chars, "
            "len(regexp_extract_all(text, '\\S+')) AS toks FROM documents "
            "WHERE text IS NOT NULL AND n_chars IS NOT NULL "
            "AND doc_id IS NOT NULL), "
            "w AS (SELECT sum(toks) // 2 AS b FROM t), "
            "o AS (SELECT source, toks, "
            "sum(toks) OVER (ORDER BY n_chars DESC, doc_id) AS cum FROM t) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_selected, "
            "CAST(sum(toks) AS BIGINT) AS tokens_selected "
            "FROM o, w WHERE cum <= b GROUP BY source"
        ),
        "hourly_value_spikes": (
            "WITH h AS (SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, "
            "CAST(sum(CAST(floor(value*100) AS BIGINT)) AS BIGINT) AS total_cents "
            "FROM events WHERE ts IS NOT NULL AND value IS NOT NULL GROUP BY 1), "
            "s AS (SELECT median(CAST(total_cents AS DOUBLE)) AS med, "
            "median(abs(CAST(total_cents AS DOUBLE) - "
            " (SELECT median(CAST(total_cents AS DOUBLE)) FROM h))) AS mad FROM h) "
            "SELECT hour_us, total_cents, "
            "CAST(abs(CAST(total_cents AS DOUBLE) - med) > 3.0 * mad "
            " AND CAST(total_cents AS DOUBLE) > med AS BIGINT) AS is_spike "
            "FROM h, s"
        ),
        "langs_by_source": (
            "SELECT source, string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs, "
            "count(DISTINCT lang) AS n_values FROM documents "
            "WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1"
        ),
        "langs_ranked_by_source": (
            "WITH p AS (SELECT source, lang, count(*) AS n FROM documents "
            "WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2) "
            "SELECT source, string_agg(lang, ',' ORDER BY n DESC, lang) "
            "AS langs_ranked, count(*) AS n_values FROM p GROUP BY 1"
        ),
        "event_type_cooccurrence": (
            "WITH d AS (SELECT DISTINCT user_id, event_type FROM events "
            "WHERE user_id IS NOT NULL AND event_type IS NOT NULL) "
            "SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_users "
            "FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type "
            "GROUP BY 1, 2"
        ),
        "sentence_stats": (
            "SELECT doc_id, len(regexp_extract_all(text, '[.!?]+(\\s|$)')) "
            "AS n_sentences FROM documents"
        ),
        "daily_activity_outer": (
            "WITH o AS (SELECT epoch_us(date_trunc('day', o_orderdate)) AS day_us, "
            "count(*) AS n_orders FROM orders GROUP BY 1), "
            "e AS (SELECT epoch_us(date_trunc('day', ts)) AS day_us, "
            "count(*) AS n_events FROM events GROUP BY 1) "
            "SELECT COALESCE(o.day_us, e.day_us) AS day_us, "
            "COALESCE(n_orders, 0) AS n_orders, COALESCE(n_events, 0) AS n_events "
            "FROM o FULL JOIN e ON o.day_us = e.day_us"
        ),
        "event_gap_histogram": (
            "WITH g AS (SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER ("
            "PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap FROM events) "
            "SELECT CASE WHEN gap = 0 THEN 0 ELSE length(bin(gap)) END AS gap_bucket, "
            "count(*) AS n_gaps FROM g WHERE gap IS NOT NULL GROUP BY 1"
        ),
        "token_concentration_curve": (
            "WITH s AS (SELECT source, "
            "CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS n_tokens "
            "FROM documents GROUP BY 1) "
            "SELECT row_number() OVER (ORDER BY n_tokens DESC, source) AS rank, "
            "source, n_tokens, "
            "CAST(sum(n_tokens) OVER (ORDER BY n_tokens DESC, source "
            "ROWS UNBOUNDED PRECEDING) AS DOUBLE) "
            " / (SELECT CAST(sum(n_tokens) AS DOUBLE) FROM s) AS cum_share "
            "FROM s"
        ),
        "discount_band_revenue": (
            "SELECT year(l_shipdate) AS ship_year, "
            "CAST(sum(CAST(floor(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT) "
            "  AS rev_cents, "
            "count(*) AS n_items FROM lineitem "
            "WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24 "
            "GROUP BY 1"
        ),
        "part_class_revenue": (
            "WITH pcls AS (SELECT p_partkey, CASE "
            "WHEN p_brand='Brand#12' AND p_size BETWEEN 1 AND 5 THEN 'small' "
            "WHEN p_brand='Brand#23' AND p_size BETWEEN 1 AND 10 THEN 'medium' "
            "WHEN p_brand='Brand#15' AND p_size BETWEEN 1 AND 15 THEN 'big' END AS cls "
            "FROM part) "
            "SELECT cls AS part_class, "
            "CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) "
            "  AS rev_cents, "
            "count(*) AS n_items "
            "FROM lineitem JOIN pcls ON l_partkey = p_partkey "
            "WHERE (cls='small' AND l_quantity BETWEEN 1 AND 11) "
            "OR (cls='medium' AND l_quantity BETWEEN 10 AND 20) "
            "OR (cls='big' AND l_quantity BETWEEN 20 AND 30) "
            "GROUP BY 1"
        ),
        "rolling_active_users": (
            "SELECT CAST(epoch_us(d.day) AS BIGINT) AS window_day_us, "
            "count(DISTINCT e.user_id) AS n_users "
            "FROM (SELECT DISTINCT date_trunc('day', ts) AS day FROM events) d "
            "JOIN events e ON e.ts >= d.day - INTERVAL 6 DAY "
            "AND e.ts < d.day + INTERVAL 1 DAY "
            "GROUP BY 1"
        ),
        "shipping_priority": (
            "SELECT l_orderkey, "
            "sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT))/100.0 AS revenue, "
            "CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate_us, o_orderpriority "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1998-01-01' "
            "AND l_shipdate > TIMESTAMP '1998-01-01' "
            "GROUP BY 1, 3, 4 "
            "ORDER BY revenue DESC, l_orderkey LIMIT 10"
        ),
        "late_ship_priority_counts": (
            "SELECT o_orderpriority, count(*) AS n_late_orders FROM ("
            "SELECT o_orderpriority, l_orderkey "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY "
            "GROUP BY 1, 2) GROUP BY 1"
        ),
        "returnflag_priority_mix": (
            "SELECT l_returnflag, "
            "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) "
            "  AS BIGINT) AS critical_lines, "
            "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) "
            "  AS BIGINT) AS other_lines "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY 1"
        ),
        "supplier_variety": (
            "SELECT p_brand, CAST(p_size AS BIGINT) AS p_size, count(*) AS supplier_cnt "
            "FROM (SELECT p_brand, p_size, l_suppkey "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE l_suppkey NOT IN "
            "  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
            "GROUP BY 1, 2, 3) GROUP BY 1, 2"
        ),
        "nation_year_flows": (
            "WITH outb AS (SELECT s_nationkey AS nationkey, "
            "CAST(year(l_shipdate) AS BIGINT) AS year, "
            "CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) "
            "  AS out_cents "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1, 2), "
            "inb AS (SELECT c_nationkey AS nationkey, "
            "CAST(year(o_orderdate) AS BIGINT) AS year, "
            "CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) "
            "  AS in_cents "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2) "
            "SELECT CAST(outb.nationkey AS BIGINT) AS nationkey, outb.year, "
            "out_cents, in_cents "
            "FROM outb JOIN inb ON outb.nationkey = inb.nationkey "
            "AND outb.year = inb.year"
        ),
        "sole_late_suppliers": (
            "WITH os AS (SELECT l_orderkey AS ok, l_suppkey AS sk, "
            "max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS late "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2), "
            "per_order AS (SELECT ok, count(*) AS n_supp, sum(late) AS n_late, "
            "max(CASE WHEN late = 1 THEN sk END) AS late_sk FROM os GROUP BY 1) "
            "SELECT s_suppkey, s_name, count(*) AS waiting_orders "
            "FROM per_order JOIN supplier ON late_sk = s_suppkey "
            "WHERE n_supp >= 2 AND n_late = 1 "
            "GROUP BY 1, 2 ORDER BY waiting_orders DESC, s_suppkey LIMIT 10"
        ),
        "dormant_rich_customers": (
            "WITH pos AS (SELECT CAST(sum(CAST(floor(c_acctbal*100) AS BIGINT)) AS BIGINT) AS s, "
            "  count(*) AS n FROM customer WHERE c_acctbal > 0) "
            "SELECT c_mktsegment, count(*) AS n_custs, "
            "CAST(sum(CAST(floor(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents "
            "FROM customer, pos "
            "WHERE CAST(floor(c_acctbal*100) AS BIGINT) * pos.n > pos.s "
            "AND c_custkey NOT IN (SELECT o_custkey FROM orders "
            "  WHERE o_orderdate >= TIMESTAMP '2000-01-01') "
            "GROUP BY c_mktsegment"
        ),
        "profit_by_nation_year": (
            "SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year, "
            "count(*) AS n_items, "
            "sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT) "
            "  - CAST(floor(p_retailprice*l_quantity*10) AS BIGINT))/100.0 AS profit "
            "FROM lineitem "
            "JOIN part ON l_partkey = p_partkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "WHERE p_type = 'PROMO' "
            "GROUP BY n_name, o_year"
        ),
        "urgent_customers": (
            "SELECT c_custkey, c_name, c_acctbal FROM customer "
            "WHERE c_custkey IN (SELECT o_custkey FROM orders "
            "WHERE o_orderpriority = '1-URGENT')"
        ),
        "nation_top_names": (
            "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "string_agg(c_name, ';' ORDER BY c_acctbal DESC, c_custkey) AS top_names "
            "FROM (SELECT c_nationkey, c_name, c_acctbal, c_custkey, "
            "row_number() OVER (PARTITION BY c_nationkey "
            "ORDER BY c_acctbal DESC, c_custkey) AS rn FROM customer) "
            "WHERE rn <= 3 GROUP BY c_nationkey"
        ),
        "cust_order_dist": (
            "WITH per_cust AS (SELECT o_custkey, count(*) AS n "
            "FROM orders GROUP BY o_custkey) "
            "SELECT c_count, count(*) AS custdist FROM ("
            "SELECT coalesce(n, 0) AS c_count FROM customer "
            "LEFT JOIN per_cust ON c_custkey = o_custkey"
            ") GROUP BY c_count"
        ),
        "last_order_asof": (
            "WITH o AS (SELECT o_custkey, o_orderdate, "
            "  max(o_orderkey) AS o_orderkey, "
            "  max_by(o_totalprice, o_orderkey) AS o_totalprice "
            "  FROM orders GROUP BY o_custkey, o_orderdate) "
            "SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us, "
            "  o.o_orderkey, o.o_totalprice "
            "FROM events e ASOF JOIN o "
            "ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"
        ),
        "first_event_after_order": (
            "WITH e AS (SELECT user_id, ts, max(event_id) AS event_id "
            "  FROM events GROUP BY user_id, ts) "
            "SELECT o.o_orderkey, o.o_custkey, e.event_id "
            "FROM orders o ASOF JOIN e "
            "ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts"
        ),
        "top_orders_per_cust": (
            "SELECT o_custkey, o_orderkey, o_totalprice FROM orders "
            "QUALIFY row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey) <= 3"
        ),
        "doc_sample": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents "
            "WHERE substr(md5(text), 1, 1) IN ('0', '1', '2', '3')"
        ),
        "events_pivot": (
            "SELECT user_id, "
            "count(*) FILTER (WHERE event_type = 'click') AS n_click, "
            "count(*) FILTER (WHERE event_type = 'error') AS n_error, "
            "count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase, "
            "count(*) FILTER (WHERE event_type = 'signup') AS n_signup, "
            "count(*) FILTER (WHERE event_type = 'view') AS n_view "
            "FROM events GROUP BY user_id"
        ),
        "customer_balance_rank": (
            "SELECT c_custkey, c_nationkey, "
            "percent_rank() OVER w AS prank, "
            "CAST(ntile(4) OVER w AS BIGINT) AS quartile "
            "FROM customer "
            "WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)"
        ),
        "user_value_timewin": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "CAST(sum(CAST(floor(value*100) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY epoch_us(ts) "
            "RANGE BETWEEN 1800000000 PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS win30_cents FROM events"
        ),
        "events_hopping": (
            "WITH exploded AS (SELECT "
            "  (epoch_us(ts) // 1800000000 - j) * 1800000000 AS w_start_us "
            "  FROM events CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) AS h(j)) "
            "SELECT w_start_us, CAST(count(*) AS BIGINT) AS n_events "
            "FROM exploded GROUP BY w_start_us"
        ),
        # UNPIVOT INCLUDE NULLS semantics: every (user, type) cell, zeros kept
        "events_unpivot": (
            "WITH types(event_type) AS (VALUES ('click'), ('error'), "
            "  ('purchase'), ('signup'), ('view')), "
            "users AS (SELECT DISTINCT user_id FROM events), "
            "counts AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n "
            "  FROM events GROUP BY user_id, event_type) "
            "SELECT u.user_id, t.event_type, CAST(coalesce(c.n, 0) AS BIGINT) AS n "
            "FROM users u CROSS JOIN types t "
            "LEFT JOIN counts c ON c.user_id = u.user_id AND c.event_type = t.event_type"
        ),
        "order_price_quantiles": (
            "SELECT o_orderpriority, "
            "quantile_disc(o_totalprice, 0.25) AS p25, "
            "quantile_disc(o_totalprice, 0.5) AS p50, "
            "quantile_disc(o_totalprice, 0.75) AS p75 "
            "FROM orders GROUP BY o_orderpriority"
        ),
        "order_price_quantiles_cont": (
            "SELECT o_orderpriority, "
            "quantile_cont(o_totalprice, 0.25) AS p25, "
            "quantile_cont(o_totalprice, 0.5) AS p50, "
            "quantile_cont(o_totalprice, 0.75) AS p75 "
            "FROM orders GROUP BY o_orderpriority"
        ),
        "user_value_rolling": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "CAST(sum(CAST(floor(value*100) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll3_cents "
            "FROM events"
        ),
        "user_value_cumsum": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "CAST(sum(CAST(floor(value*100) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents "
            "FROM events"
        ),
        "lm_bigram_familiarity": (
            "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents), "
            "bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS g "
            "  FROM toks, UNNEST(range(1, len(w))) AS t(i) WHERE len(w) >= 2), "
            "counts AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY g), "
            "vocab AS (SELECT g, c FROM counts ORDER BY c DESC, g LIMIT 1000) "
            "SELECT doc_id, count(*) AS n_bigrams, "
            "  CAST(sum(CASE WHEN v.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov, "
            "  CAST(sum(coalesce(v.c, 0)) AS BIGINT) AS bigram_mass "
            "FROM bg LEFT JOIN vocab v USING (g) GROUP BY doc_id"
        ),
        "lm_trigram_familiarity": (
            "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents), "
            "tg AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g "
            "  FROM toks, UNNEST(range(1, len(w) - 1)) AS t(i) WHERE len(w) >= 3), "
            "counts AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM tg GROUP BY g), "
            "vocab AS (SELECT g, c FROM counts ORDER BY c DESC, g LIMIT 1000) "
            "SELECT doc_id, count(*) AS n_trigrams, "
            "  CAST(sum(CASE WHEN v.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov, "
            "  CAST(sum(coalesce(v.c, 0)) AS BIGINT) AS trigram_mass "
            "FROM tg LEFT JOIN vocab v USING (g) GROUP BY doc_id"
        ),
        "lm_familiarity": (
            "WITH tok AS (SELECT doc_id, "
            "  unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents), "
            "counts AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY t), "
            "vocab AS (SELECT t, c FROM counts ORDER BY c DESC, t LIMIT 1000) "
            "SELECT doc_id, count(*) AS n_tokens, "
            "  CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov, "
            "  CAST(sum(coalesce(v.c, 0)) AS BIGINT) AS vocab_mass "
            "FROM tok LEFT JOIN vocab v USING (t) GROUP BY doc_id"
        ),
        "quiet_customers": (
            "SELECT c_custkey, c_name, c_acctbal FROM customer "
            "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders "
            "WHERE o_orderpriority = '1-URGENT')"
        ),
        "revenue_by_region": (
            "SELECT r_name, count(*) AS n_items, "
            "sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT))/100.0 AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        ),
        "orders_by_nation": (
            "SELECT n_name, count(*) AS n_orders, "
            "sum(CAST(floor(o_totalprice*100) AS BIGINT))/100.0 AS total_price "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
        ),
        "sessionize": (
            "WITH ordered AS ("
            "  SELECT user_id, epoch_us(ts) AS ts_us, "
            "    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 "
            "         OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_s "
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)), "
            "tagged AS ("
            "  SELECT user_id, ts_us, "
            "    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us "
            "      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id "
            "  FROM ordered) "
            "SELECT user_id, session_id, count(*) AS n_events, "
            "  min(ts_us) AS start_ts_us, max(ts_us) AS end_ts_us "
            "FROM tagged GROUP BY user_id, session_id"
        ),
        # correlated form (not LEFT JOIN + GROUP BY): lineitem's
        # (l_orderkey, l_linenumber) is NOT unique in this corpus, and
        # the engine emits one row per input row
        "ship_window_value": (
            "SELECT l.l_orderkey, l.l_linenumber, "
            "(SELECT CAST(coalesce(sum(CAST(floor(o.o_totalprice*100) AS BIGINT)), 0) AS BIGINT) "
            "   FROM orders o WHERE l.l_shipdate >= o.o_orderdate "
            "    AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY) AS week_order_value_cents "
            "FROM lineitem l"
        ),
        "order_week_shipments": (
            "SELECT o.o_orderkey, count(l.l_shipdate) AS n_shipments "
            "FROM orders o LEFT JOIN lineitem l "
            "  ON l.l_shipdate >= o.o_orderdate "
            " AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY "
            "GROUP BY o.o_orderkey"
        ),
        "ship_week_pairs": (
            "SELECT l.l_orderkey, l.l_linenumber, o.o_orderkey "
            "FROM lineitem l JOIN orders o "
            "  ON l.l_shipdate >= o.o_orderdate "
            " AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY "
            "WHERE l.l_shipdate >= DATE '1995-01-01' AND l.l_shipdate < DATE '1995-02-01'"
        ),
        "jaccard_pairs": (
            "WITH sample AS (SELECT doc_id, text FROM documents "
            "  WHERE substr(md5(text), 1, 1) IN ('0','1','2','3')), "
            "toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM sample), "
            "sh AS ("
            "  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g "
            "  FROM toks, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3 "
            "  UNION "
            "  SELECT doc_id, array_to_string(w, ' ') AS g FROM toks "
            "  WHERE len(w) BETWEEN 1 AND 2), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
            "inter AS ("
            "  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c "
            "  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id "
            "  GROUP BY a.doc_id, b.doc_id) "
            "SELECT i.doc_a, i.doc_b, CAST(i.c AS BIGINT) AS n_common, "
            "  CAST(i.c AS DOUBLE)/(sa.n + sb.n - i.c) AS jaccard "
            "FROM inter i "
            "JOIN sizes sa ON sa.doc_id = i.doc_a "
            "JOIN sizes sb ON sb.doc_id = i.doc_b "
            "WHERE CAST(i.c AS DOUBLE)/(sa.n + sb.n - i.c) >= 0.02"
        ),
        "containment_pairs": (
            "WITH sample AS (SELECT doc_id, text FROM documents "
            "  WHERE substr(md5(text), 1, 1) IN ('0','1','2','3')), "
            "toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM sample), "
            "sh AS ("
            "  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g "
            "  FROM toks, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3 "
            "  UNION "
            "  SELECT doc_id, array_to_string(w, ' ') AS g FROM toks "
            "  WHERE len(w) BETWEEN 1 AND 2), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
            "inter AS ("
            "  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c "
            "  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id "
            "  GROUP BY a.doc_id, b.doc_id) "
            "SELECT i.doc_a, i.doc_b, CAST(i.c AS BIGINT) AS n_common, "
            "  CAST(i.c AS DOUBLE)/least(sa.n, sb.n) AS containment "
            "FROM inter i "
            "JOIN sizes sa ON sa.doc_id = i.doc_a "
            "JOIN sizes sb ON sb.doc_id = i.doc_b "
            "WHERE CAST(i.c AS DOUBLE)/least(sa.n, sb.n) >= 0.05"
        ),
        # same float op order as stages/search.py: idf·tf·(k1+1)/(tf+norm)
        # summed in fixed term order; ids/ranks only cross the hash gate
        "bm25_top10": (
            "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents), "
            "tf AS (SELECT doc_id, len(w) AS dl, "
            "  len(list_filter(w, x -> x = 'hash')) AS tf0, "
            "  len(list_filter(w, x -> x = 'vector')) AS tf1, "
            "  len(list_filter(w, x -> x = 'window')) AS tf2 FROM toks), "
            "stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl, "
            "  sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0, "
            "  sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1, "
            "  sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2 FROM tf), "
            "scored AS (SELECT t.doc_id, "
            "  ln((s.n - s.df0 + 0.5)/(s.df0 + 0.5) + 1.0)*(t.tf0*(1.2+1.0))/(t.tf0 + 1.2*(1.0 - 0.75 + 0.75*(t.dl/s.avgdl))) "
            "+ ln((s.n - s.df1 + 0.5)/(s.df1 + 0.5) + 1.0)*(t.tf1*(1.2+1.0))/(t.tf1 + 1.2*(1.0 - 0.75 + 0.75*(t.dl/s.avgdl))) "
            "+ ln((s.n - s.df2 + 0.5)/(s.df2 + 0.5) + 1.0)*(t.tf2*(1.2+1.0))/(t.tf2 + 1.2*(1.0 - 0.75 + 0.75*(t.dl/s.avgdl))) "
            "  AS score FROM tf t, stats s) "
            "SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank "
            "FROM scored ORDER BY score DESC, doc_id LIMIT 10"
        ),
        "hybrid_search_rrf": (
            "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents), "
            "tf AS (SELECT doc_id, len(w) AS dl, "
            "  len(list_filter(w, x -> x = 'hash')) AS tf0, "
            "  len(list_filter(w, x -> x = 'vector')) AS tf1, "
            "  len(list_filter(w, x -> x = 'window')) AS tf2 FROM toks), "
            "stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE)/count(*) AS avgdl, "
            "  sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0, "
            "  sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1, "
            "  sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2 FROM tf), "
            "scored AS (SELECT t.doc_id, "
            "  ln((s.n - s.df0 + 0.5)/(s.df0 + 0.5) + 1.0)*(t.tf0*(1.2+1.0))/(t.tf0 + 1.2*(1.0 - 0.75 + 0.75*(t.dl/s.avgdl))) "
            "+ ln((s.n - s.df1 + 0.5)/(s.df1 + 0.5) + 1.0)*(t.tf1*(1.2+1.0))/(t.tf1 + 1.2*(1.0 - 0.75 + 0.75*(t.dl/s.avgdl))) "
            "+ ln((s.n - s.df2 + 0.5)/(s.df2 + 0.5) + 1.0)*(t.tf2*(1.2+1.0))/(t.tf2 + 1.2*(1.0 - 0.75 + 0.75*(t.dl/s.avgdl))) "
            "  AS score FROM tf t, stats s), "
            "bm AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS ra "
            "  FROM scored ORDER BY score DESC, doc_id LIMIT 50), "
            "lnr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rb "
            "  FROM documents ORDER BY n_chars DESC, doc_id LIMIT 50) "
            "SELECT coalesce(bm.doc_id, lnr.doc_id) AS doc_id, "
            "coalesce(1.0/(60+ra), 0.0) + coalesce(1.0/(60+rb), 0.0) AS rrf, "
            "CAST(row_number() OVER (ORDER BY coalesce(1.0/(60+ra), 0.0) + coalesce(1.0/(60+rb), 0.0) DESC, "
            "  coalesce(bm.doc_id, lnr.doc_id)) AS BIGINT) AS rank "
            "FROM bm FULL OUTER JOIN lnr ON bm.doc_id = lnr.doc_id "
            "ORDER BY rrf DESC, doc_id LIMIT 10"
        ),
        "value_trend_by_type": (
            "WITH e AS (SELECT event_type, "
            "  date_diff('minute', TIMESTAMP '2020-01-01', ts) AS d, "
            "  CAST(floor(value*100) AS BIGINT) AS v FROM events "
            "  WHERE ts IS NOT NULL AND value IS NOT NULL AND event_type IS NOT NULL), "
            "m AS (SELECT event_type, count(*) AS n, sum(d) AS sd, sum(v) AS sv, "
            "  sum(d*d) AS sdd, sum(d*v) AS sdv FROM e GROUP BY 1) "
            "SELECT event_type, CAST(n AS BIGINT) AS n, "
            "CAST(CAST(n*sdv - sd*sv AS VARCHAR) AS DOUBLE)/CAST(CAST(n*sdd - sd*sd AS VARCHAR) AS DOUBLE) AS slope_cents_per_min, "
            "CAST(CAST(sv*sdd - sd*sdv AS VARCHAR) AS DOUBLE)/CAST(CAST(n*sdd - sd*sd AS VARCHAR) AS DOUBLE) AS intercept_cents "
            "FROM m"
        ),
        "session_conversion": (
            "WITH ordered AS ("
            "  SELECT user_id, epoch_us(ts) AS ts_us, event_type, "
            "    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 "
            "         OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_s "
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))), "
            "tagged AS ("
            "  SELECT user_id, ts_us, event_type, "
            "    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us "
            "      ROWS UNBOUNDED PRECEDING) AS session_id FROM ordered), "
            "sess AS ("
            "  SELECT user_id, session_id, "
            "    min(CASE WHEN event_type = 'view' THEN ts_us END) AS v, "
            "    max(CASE WHEN event_type = 'click' THEN ts_us END) AS c "
            "  FROM tagged GROUP BY 1, 2) "
            "SELECT CAST(count(*) AS BIGINT) AS n_sessions, "
            "CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_first_sessions, "
            "CAST(sum(CASE WHEN c > v THEN 1 ELSE 0 END) AS BIGINT) AS n_converted, "
            "CAST(sum(CASE WHEN c > v THEN 1 ELSE 0 END) AS DOUBLE) "
            " / CAST(sum(CASE WHEN v IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS conversion "
            "FROM sess"
        ),
        "last_view_before_click": (
            "WITH v AS (SELECT user_id AS v_user, ts AS v_ts, max(event_id) AS view_id "
            "  FROM events WHERE event_type = 'view' GROUP BY 1, 2), "
            "c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') "
            "SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us, v.view_id "
            "FROM c ASOF JOIN v ON c.user_id = v.v_user AND c.ts >= v.v_ts "
            "WHERE epoch_us(c.ts) - epoch_us(v.v_ts) <= 600000000"
        ),
        "lang_source_skew": (
            "WITH c AS (SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2), "
            "rt AS (SELECT source, sum(n) AS r FROM c GROUP BY 1), "
            "ct AS (SELECT lang, sum(n) AS cc FROM c GROUP BY 1), "
            "tot AS (SELECT sum(n) AS t FROM c) "
            "SELECT c.source, c.lang, CAST(c.n AS BIGINT) AS n, "
            "CAST(CAST(r*cc AS VARCHAR) AS DOUBLE)/CAST(t AS DOUBLE) AS expected, "
            "(CAST(c.n AS DOUBLE) - CAST(CAST(r*cc AS VARCHAR) AS DOUBLE)/CAST(t AS DOUBLE)) "
            " * (CAST(c.n AS DOUBLE) - CAST(CAST(r*cc AS VARCHAR) AS DOUBLE)/CAST(t AS DOUBLE)) "
            " / (CAST(CAST(r*cc AS VARCHAR) AS DOUBLE)/CAST(t AS DOUBLE)) AS chi2_contrib "
            "FROM c JOIN rt USING (source) JOIN ct USING (lang), tot"
        ),
        "mix_rebalance_sample": (
            "WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1), "
            "mn AS (SELECT min(n) AS m FROM c), "
            "r AS (SELECT lang, (m * 256) // n AS thresh FROM c, mn) "
            "SELECT d.lang, count(*) AS n_sampled "
            "FROM documents d JOIN r ON d.lang = r.lang "
            "WHERE r.thresh >= 256 "
            "  OR substr(md5(coalesce(d.text, '')), 1, 2) < printf('%02x', r.thresh) "
            "GROUP BY d.lang"
        ),
        "benford_digits": (
            "WITH v AS (SELECT CAST(floor(o_totalprice*100) AS BIGINT) AS cents FROM orders), "
            "d AS (SELECT substr(CAST(cents AS VARCHAR), 1, 1) AS digit, count(*) AS n "
            "  FROM v WHERE cents > 0 GROUP BY 1), "
            "t AS (SELECT sum(n) AS tot FROM d) "
            "SELECT digit, CAST(n AS BIGINT) AS n, "
            "CAST(n AS DOUBLE)/CAST(tot AS DOUBLE) AS share FROM d, t"
        ),
        "rate_limited_events": (
            "WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "  epoch_us(ts) // 3600000000 AS hour FROM events "
            "  WHERE user_id IS NOT NULL AND ts IS NOT NULL) "
            "SELECT event_id, ts_us FROM e "
            "QUALIFY row_number() OVER (PARTITION BY user_id, hour "
            "  ORDER BY ts_us, event_id) <= 3"
        ),
        "orders_scd2": (
            "WITH h AS ("
            "  SELECT o_orderkey, CAST(floor((o_totalprice*1)*100) AS BIGINT) AS cents, "
            "    CAST(1 AS BIGINT) AS version FROM orders "
            "  UNION ALL SELECT o_orderkey, CAST(floor((o_totalprice*2)*100) AS BIGINT), 2 "
            "    FROM orders WHERE o_orderkey % 7 = 0 "
            "  UNION ALL SELECT o_orderkey, CAST(floor((o_totalprice*3)*100) AS BIGINT), 3 "
            "    FROM orders WHERE o_orderkey % 21 = 0) "
            "SELECT o_orderkey, version, cents, "
            "lead(version) OVER w AS valid_to_version, "
            "CAST(CASE WHEN lead(version) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) "
            "  AS is_current "
            "FROM h WINDOW w AS (PARTITION BY o_orderkey ORDER BY version)"
        ),
        "kanon_risk": (
            "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment, "
            "count(*) AS n FROM customer "
            "GROUP BY 1, 2 HAVING count(*) < 10"
        ),
        "snm_dup_pairs": (
            "WITH o AS (SELECT doc_id, "
            "lower(substr(COALESCE(text, ''), 1, 32)) AS k FROM documents), "
            "r AS (SELECT doc_id, k, "
            "row_number() OVER (ORDER BY k, doc_id) AS rn FROM o) "
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(levenshtein(a.k, b.k) AS BIGINT) AS dist "
            "FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 5 "
            "WHERE levenshtein(a.k, b.k) <= 2"
        ),
        "attribution_linear": (
            "WITH conv AS (SELECT user_id, event_id AS cid, ts AS cts "
            "FROM events WHERE event_type = 'purchase'), "
            "touch AS (SELECT user_id, event_id, event_type, ts FROM events "
            "WHERE event_type <> 'purchase'), "
            "pre AS (SELECT c.cid, t.event_type, "
            "count(*) OVER (PARTITION BY c.cid) AS n_touch, "
            "row_number() OVER (PARTITION BY c.cid "
            "ORDER BY t.ts, t.event_id) AS rk "
            "FROM conv c JOIN touch t ON t.user_id = c.user_id "
            "AND t.ts >= c.cts - INTERVAL 24 HOUR AND t.ts < c.cts) "
            "SELECT event_type, "
            "CAST(sum(1000000 // n_touch + CASE WHEN rk <= 1000000 % n_touch "
            "THEN 1 ELSE 0 END) AS BIGINT) AS credit_micro "
            "FROM pre GROUP BY event_type"
        ),
        "ldiversity_census": (
            "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment, "
            "count(*) AS n, "
            "count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS n_sensitive, "
            "CASE WHEN count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) >= 3 "
            "THEN 1 ELSE 0 END AS l_ok "
            "FROM customer GROUP BY 1, 2"
        ),
        "value_imputed": (
            "WITH masked AS (SELECT event_id, event_type, "
            "  CASE WHEN event_id % 17 = 0 THEN NULL ELSE value END AS v FROM events), "
            "med AS (SELECT event_type, quantile_disc(v, 0.5) AS m "
            "  FROM masked WHERE v IS NOT NULL GROUP BY 1) "
            "SELECT event_id, masked.event_type, coalesce(v, m) AS value_filled "
            "FROM masked JOIN med USING (event_type)"
        ),
        "source_overlap_matrix": (
            "WITH sample AS (SELECT doc_id, text FROM documents "
            "  WHERE substr(md5(text), 1, 1) IN ('0','1','2','3')), "
            "toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM sample), "
            "sh AS ("
            "  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS g "
            "  FROM toks, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3 "
            "  UNION "
            "  SELECT doc_id, array_to_string(w, ' ') AS g FROM toks "
            "  WHERE len(w) BETWEEN 1 AND 2), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
            "inter AS ("
            "  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c "
            "  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id "
            "  GROUP BY a.doc_id, b.doc_id), "
            "p AS (SELECT i.doc_a, i.doc_b FROM inter i "
            "  JOIN sizes sa ON sa.doc_id = i.doc_a "
            "  JOIN sizes sb ON sb.doc_id = i.doc_b "
            "  WHERE CAST(i.c AS DOUBLE)/(sa.n + sb.n - i.c) >= 0.02) "
            "SELECT da.source AS source_a, db.source AS source_b, "
            "CAST(count(*) AS BIGINT) AS n_pairs "
            "FROM p JOIN documents da ON p.doc_a = da.doc_id "
            "JOIN documents db ON p.doc_b = db.doc_id "
            "GROUP BY 1, 2"
        ),
        "lineitem_corr_matrix": (
            "WITH v AS (SELECT CAST(floor(l_quantity) AS BIGINT) AS x0, "
            "  CAST(floor(l_extendedprice) AS BIGINT) AS x1, "
            "  CAST(floor(l_discount*100) AS BIGINT) AS x2, "
            "  CAST(floor(l_tax*100) AS BIGINT) AS x3 FROM lineitem), "
            "m AS (SELECT count(*) AS n, "
            "  sum(x0) AS s0, sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3, "
            "  sum(x0*x0) AS s00, sum(x1*x1) AS s11, sum(x2*x2) AS s22, sum(x3*x3) AS s33, "
            "  sum(x0*x1) AS s01, sum(x0*x2) AS s02, sum(x0*x3) AS s03, "
            "  sum(x1*x2) AS s12, sum(x1*x3) AS s13, sum(x2*x3) AS s23 FROM v) "
            "SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, "
            "  CAST(CAST(n*s01 - s0*s1 AS VARCHAR) AS DOUBLE)/sqrt(CAST(CAST(n*s00 - s0*s0 AS VARCHAR) AS DOUBLE)*CAST(CAST(n*s11 - s1*s1 AS VARCHAR) AS DOUBLE)) AS corr FROM m "
            "UNION ALL SELECT 'l_quantity', 'l_discount', "
            "  CAST(CAST(n*s02 - s0*s2 AS VARCHAR) AS DOUBLE)/sqrt(CAST(CAST(n*s00 - s0*s0 AS VARCHAR) AS DOUBLE)*CAST(CAST(n*s22 - s2*s2 AS VARCHAR) AS DOUBLE)) FROM m "
            "UNION ALL SELECT 'l_quantity', 'l_tax', "
            "  CAST(CAST(n*s03 - s0*s3 AS VARCHAR) AS DOUBLE)/sqrt(CAST(CAST(n*s00 - s0*s0 AS VARCHAR) AS DOUBLE)*CAST(CAST(n*s33 - s3*s3 AS VARCHAR) AS DOUBLE)) FROM m "
            "UNION ALL SELECT 'l_extendedprice', 'l_discount', "
            "  CAST(CAST(n*s12 - s1*s2 AS VARCHAR) AS DOUBLE)/sqrt(CAST(CAST(n*s11 - s1*s1 AS VARCHAR) AS DOUBLE)*CAST(CAST(n*s22 - s2*s2 AS VARCHAR) AS DOUBLE)) FROM m "
            "UNION ALL SELECT 'l_extendedprice', 'l_tax', "
            "  CAST(CAST(n*s13 - s1*s3 AS VARCHAR) AS DOUBLE)/sqrt(CAST(CAST(n*s11 - s1*s1 AS VARCHAR) AS DOUBLE)*CAST(CAST(n*s33 - s3*s3 AS VARCHAR) AS DOUBLE)) FROM m "
            "UNION ALL SELECT 'l_discount', 'l_tax', "
            "  CAST(CAST(n*s23 - s2*s3 AS VARCHAR) AS DOUBLE)/sqrt(CAST(CAST(n*s22 - s2*s2 AS VARCHAR) AS DOUBLE)*CAST(CAST(n*s33 - s3*s3 AS VARCHAR) AS DOUBLE)) FROM m"
        ),
        "top_bigrams_by_lang": (
            "WITH toks AS (SELECT lang, regexp_extract_all(text, '\\S+') AS w FROM documents), "
            "bg AS (SELECT lang, unnest(list_zip(w[:-2], w[2:])) AS p FROM toks), "
            "c AS (SELECT lang, p[1] || ' ' || p[2] AS bigram, count(*) AS n "
            "  FROM bg GROUP BY 1, 2), "
            "r AS (SELECT lang, bigram, CAST(n AS BIGINT) AS n, "
            "  row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rk FROM c) "
            "SELECT lang, bigram, n FROM r WHERE rk <= 5"
        ),
        "phrase_docs": (
            "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents) "
            "SELECT doc_id FROM toks "
            "WHERE len(list_filter(list_zip(w[:-2], w[2:]), "
            "  p -> p[1] = 'hash' AND p[2] = 'vector')) > 0"
        ),
        "orders_snapshot_diff": (
            "WITH a AS (SELECT o_orderkey AS k, "
            "  CAST(floor(o_totalprice*100) AS BIGINT) AS cents FROM orders), "
            "b0 AS (SELECT k, CASE WHEN k % 13 = 0 THEN cents + 100 ELSE cents END AS cents "
            "  FROM a WHERE k % 97 <> 0), "
            "b AS (SELECT k, cents FROM b0 UNION ALL "
            "  SELECT k + 100000000, cents FROM b0 WHERE k % 101 = 0), "
            "j AS (SELECT CASE WHEN a.k IS NULL THEN 'added' "
            "  WHEN b.k IS NULL THEN 'removed' "
            "  WHEN a.cents <> b.cents THEN 'changed' "
            "  ELSE 'unchanged' END AS class "
            "  FROM a FULL OUTER JOIN b ON a.k = b.k) "
            "SELECT class, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY class"
        ),
        "user_value_ffill": (
            "SELECT event_id, user_id, "
            "last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END "
            "  IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled "
            "FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL"
        ),
        "pii_inventory": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(CASE WHEN len(regexp_extract_all(coalesce(text, ''), "
            "'\\b(?:customer|user)\\b')) > 0 THEN 1 ELSE 0 END) AS BIGINT) "
            "  AS n_docs_with_hits, "
            "CAST(sum(len(regexp_extract_all(coalesce(text, ''), "
            "'\\b(?:customer|user)\\b'))) AS BIGINT) AS n_hits "
            "FROM documents GROUP BY source"
        ),
        "user_mode_event": (
            "SELECT user_id, event_type, n FROM ("
            "SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY count(*) DESC, event_type) AS rn "
            "FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL "
            "GROUP BY user_id, event_type) WHERE rn = 1"
        ),
        "clicks_after_signup": (
            "SELECT a.event_id, CAST(count(b.event_id) AS BIGINT) AS n_clicks "
            "FROM events a LEFT JOIN events b ON b.event_type = 'click' "
            "AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 5 MINUTE "
            "WHERE a.event_type = 'signup' GROUP BY a.event_id"
        ),
        "value_p90_by_type": (
            "SELECT event_type, quantile_disc(value, 0.9) AS p90 FROM events "
            "WHERE value IS NOT NULL AND event_type IS NOT NULL GROUP BY event_type"
        ),
        "shared_prefix_sources": (
            "WITH h AS (SELECT source, md5(substr(text, 1, 64)) AS hh FROM documents), "
            "s1 AS (SELECT hh, source, count(*) AS n FROM h GROUP BY hh, source), "
            "s2 AS (SELECT hh FROM s1 GROUP BY hh HAVING count(*) >= 2) "
            "SELECT source, CAST(sum(n) AS BIGINT) AS n_cross "
            "FROM s1 JOIN s2 USING (hh) GROUP BY source"
        ),
        "prefix_except": (
            "SELECT DISTINCT md5(substr(text, 1, 64)) AS hh FROM documents "
            "WHERE source = 'src0' "
            "EXCEPT SELECT md5(substr(text, 1, 64)) FROM documents "
            "WHERE source <> 'src0'"
        ),
        "urgent_daily_dense": (
            "WITH u AS (SELECT date_trunc('day', o_orderdate) AS d, "
            "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev "
            "FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1), "
            "b AS (SELECT min(d) AS lo, max(d) AS hi FROM u), "
            "g AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM b) "
            "SELECT epoch_us(g.d) AS day_us, coalesce(u.rev, 0) AS rev_cents "
            "FROM g LEFT JOIN u ON g.d = u.d"
        ),
        "user_event_runs": (
            "WITH e AS (SELECT user_id, ts, event_id, event_type FROM events "
            "WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL), "
            "r AS (SELECT user_id, event_type, "
            "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "- row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) "
            "AS isl FROM e), "
            "runs AS (SELECT user_id, event_type, isl, count(*) AS len "
            "FROM r GROUP BY 1, 2, 3) "
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_runs, "
            "CAST(max(len) AS BIGINT) AS max_run FROM runs GROUP BY user_id"
        ),
        "order_skyline": (
            "WITH d AS (SELECT DISTINCT epoch_us(o_orderdate) AS day_us, "
            "CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents FROM orders "
            "WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL), "
            "s AS (SELECT day_us, price_cents, max(price_cents) OVER ("
            "ORDER BY day_us ASC, price_cents DESC "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM d) "
            "SELECT day_us, price_cents FROM s WHERE pm IS NULL OR price_cents > pm"
        ),
        "embedding_dim_stats": (
            "SELECT CAST(i AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(m) AS BIGINT) AS sum_micro, "
            "CAST(sum(m * m) AS BIGINT) AS sumsq_micro2 FROM ("
            "SELECT i, CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS m "
            "FROM embeddings, range(1, 65) t(i) WHERE embedding IS NOT NULL) "
            "GROUP BY i"
        ),
        "part_primary_suppliers": (
            "WITH x AS (SELECT l_partkey, min(l_suppkey) AS sk FROM lineitem "
            "GROUP BY 1) "
            "SELECT sk AS l_suppkey, CAST(count(*) AS BIGINT) AS n_owned "
            "FROM x GROUP BY sk"
        ),
        "distinct_users_by_type_exact": (
            "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL "
            "GROUP BY event_type"
        ),
        "full_priority_customers": (
            "SELECT o_custkey FROM ("
            "SELECT o_custkey, count(DISTINCT o_orderpriority) AS c "
            "FROM orders GROUP BY 1) "
            "WHERE c = (SELECT count(DISTINCT o_orderpriority) FROM orders)"
        ),
        "churned_users_dod": (
            "WITH p AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS day FROM events "
            "WHERE user_id IS NOT NULL AND ts IS NOT NULL), "
            "l AS (SELECT max(day) AS ld FROM p) "
            "SELECT a.day, CAST(count(*) AS BIGINT) AS n_churned "
            "FROM p a, l WHERE a.day < l.ld AND NOT EXISTS ("
            "SELECT 1 FROM p b WHERE b.user_id = a.user_id "
            "AND b.day = a.day + 1) GROUP BY a.day"
        ),
        "new_users_daily": (
            "WITH f AS (SELECT user_id, min(epoch_us(ts) // 86400000000) AS day "
            "FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1), "
            "d AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new FROM f GROUP BY 1) "
            "SELECT day, n_new, CAST(sum(n_new) OVER (ORDER BY day) AS BIGINT) "
            "AS cum_users FROM d"
        ),
        "trailing_7d_revenue": (
            "WITH daily AS (SELECT (epoch_us(o_orderdate) // 86400000000) "
            "* 86400000000 AS day_us, "
            "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents "
            "FROM orders WHERE o_orderdate IS NOT NULL "
            "AND o_totalprice IS NOT NULL GROUP BY 1) "
            "SELECT d1.day_us AS day_us, CAST(sum(d2.cents) AS BIGINT) "
            "AS trail7_cents FROM daily d1 JOIN daily d2 "
            "ON d2.day_us BETWEEN d1.day_us - 6 * 86400000000 AND d1.day_us "
            "GROUP BY 1"
        ),
        "revenue_autocorr": (
            "WITH daily AS (SELECT (epoch_us(o_orderdate) // 86400000000) "
            "* 86400000000 AS day_us, "
            "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents "
            "FROM orders WHERE o_orderdate IS NOT NULL "
            "AND o_totalprice IS NOT NULL GROUP BY 1), "
            "p AS (SELECT CAST(a.cents AS HUGEINT) AS x, "
            "CAST(b.cents AS HUGEINT) AS y FROM daily a JOIN daily b "
            "ON b.day_us = a.day_us + 86400000000) "
            "SELECT CAST(count(*) AS BIGINT) AS n_pairs, "
            "CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE) / "
            "sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE) * "
            "CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS DOUBLE)) "
            "AS lag1_corr FROM p"
        ),
        "weekday_revenue": (
            "WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day, "
            "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents "
            "FROM orders WHERE o_orderdate IS NOT NULL "
            "AND o_totalprice IS NOT NULL GROUP BY 1) "
            "SELECT CAST((day + 4) % 7 AS BIGINT) AS weekday, "
            "CAST(sum(cents) AS BIGINT) AS rev_cents, "
            "CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1"
        ),
        "dup_cluster_sizes": (
            "WITH c AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS sz "
            "FROM orders GROUP BY 1 HAVING count(*) > 1) "
            "SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters "
            "FROM c GROUP BY 1"
        ),
        "bucketed_priority_revenue": (
            "SELECT o_orderpriority, "
            "CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT)) "
            "  AS BIGINT) AS rev_cents, "
            "CAST(count(*) AS BIGINT) AS n_items "
            "FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1"
        ),
        "zone_pruned_revenue": (
            "SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) "
            "AS ym, CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS rev_cents FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
            "AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY 1"
        ),
        "incremental_daily_rollup": (
            "SELECT (epoch_us(o_orderdate) // 86400000000) * 86400000000 AS day_us, "
            "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS rev_cents, CAST(count(*) AS BIGINT) AS n_orders "
            "FROM orders WHERE o_orderdate IS NOT NULL "
            "AND o_totalprice IS NOT NULL GROUP BY 1"
        ),
        "term_contexts": (
            "SELECT doc_id, "
            "CAST((length(text) - length(replace(text, 'data', ''))) / 4 "
            "AS BIGINT) AS n_occ, "
            "regexp_extract(text, '.{0,30}data.{0,30}') AS context "
            "FROM documents WHERE text IS NOT NULL "
            "AND contains(text, 'data')"
        ),
        "value_weighted_median": (
            "WITH t AS (SELECT l_extendedprice AS v, "
            "CAST(floor(l_quantity) AS BIGINT) AS w FROM lineitem "
            "WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL "
            "AND floor(l_quantity) >= 1), "
            "s AS (SELECT v, sum(w) OVER (ORDER BY v "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t), "
            "tot AS (SELECT sum(w) AS tw FROM t) "
            "SELECT min(v) AS wmedian FROM s, tot WHERE cum >= (tw + 1) // 2"
        ),
        "price_wmedian_by_flag": (
            "WITH t AS (SELECT l_returnflag AS k, l_extendedprice AS v, "
            "CAST(floor(l_quantity) AS BIGINT) AS w FROM lineitem "
            "WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL "
            "AND l_quantity IS NOT NULL AND floor(l_quantity) >= 1), "
            "s AS (SELECT k, v, sum(w) OVER (PARTITION BY k ORDER BY v "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t), "
            "tot AS (SELECT k, sum(w) AS tw FROM t GROUP BY k) "
            "SELECT s.k AS l_returnflag, min(s.v) AS wmedian FROM s "
            "JOIN tot ON s.k = tot.k WHERE s.cum >= (tot.tw + 1) // 2 "
            "GROUP BY s.k"
        ),
        "top_supplier_window": (
            "WITH r AS (SELECT l_suppkey, "
            "CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) "
            "AS BIGINT)) AS BIGINT) AS rev_cents FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
            "SELECT l_suppkey, rev_cents FROM r "
            "WHERE rev_cents = (SELECT max(rev_cents) FROM r)"
        ),
        "small_qty_part_revenue": (
            "WITH a AS (SELECT l_partkey, "
            "sum(CAST(floor(l_quantity) AS BIGINT)) AS sq, count(*) AS n "
            "FROM lineitem GROUP BY 1) "
            "SELECT CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS total_cents FROM lineitem l JOIN a USING (l_partkey) "
            "WHERE 5 * CAST(floor(l.l_quantity) AS BIGINT) * a.n < a.sq"
        ),
        "dataset_split_counts": (
            "SELECT source, CASE WHEN substr(md5(text), 1, 2) < 'fa' THEN 'train' "
            "WHEN substr(md5(text), 1, 2) < 'fd' THEN 'val' ELSE 'test' END AS split, "
            "CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1, 2"
        ),
        "revenue_share_by_nation": (
            "WITH r AS (SELECT n_name, "
            "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name) "
            "SELECT n_name, rev_cents, "
            "CAST((rev_cents * 1000000) // (SELECT sum(rev_cents) FROM r) "
            "AS BIGINT) AS share_micro FROM r"
        ),
        "revenue_mom": (
            "WITH m AS (SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us, "
            "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents "
            "FROM orders GROUP BY 1) "
            "SELECT month_us, rev_cents, "
            "rev_cents - lag(rev_cents) OVER (ORDER BY month_us) AS delta_cents FROM m"
        ),
        "customer_activity_cogroup": (
            "SELECT coalesce(o.id, e.id) AS id, "
            "CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders, "
            "CAST(coalesce(n_events, 0) AS BIGINT) AS n_events FROM "
            "(SELECT o_custkey AS id, count(*) AS n_orders FROM orders "
            "WHERE o_custkey IS NOT NULL GROUP BY 1) o "
            "FULL JOIN (SELECT user_id AS id, count(*) AS n_events FROM events "
            "WHERE user_id IS NOT NULL GROUP BY 1) e USING (id)"
        ),
        "value_winsorized_sums": (
            "WITH b AS (SELECT event_type, quantile_disc(value, 0.1) AS lo, "
            "quantile_disc(value, 0.9) AS hi FROM events "
            "WHERE value IS NOT NULL AND event_type IS NOT NULL GROUP BY event_type) "
            "SELECT e.event_type, "
            "CAST(sum(CAST(floor(least(greatest(e.value, b.lo), b.hi) * 100) "
            "AS BIGINT)) AS BIGINT) AS wsum_cents, "
            "CAST(count(*) AS BIGINT) AS n "
            "FROM events e JOIN b USING (event_type) "
            "WHERE e.value IS NOT NULL GROUP BY e.event_type"
        ),
        "orders_quality_audit": (
            "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(count(*) - count(o_custkey) AS BIGINT) AS n_null_custkey, "
            "CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_dup_orderkeys, "
            "CAST((SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL "
            "AND NOT EXISTS (SELECT 1 FROM customer c "
            "WHERE c.c_custkey = o.o_custkey)) AS BIGINT) AS n_orphan_orders, "
            "epoch_us(min(o_orderdate)) AS min_orderdate_us, "
            "epoch_us(max(o_orderdate)) AS max_orderdate_us FROM orders"
        ),
        "bigticket_customer_orders": (
            "SELECT o_orderkey, o_custkey, "
            "CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents, "
            "CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "WHERE c_acctbal > 9000"
        ),
        "user_value_timeweighted": (
            "WITH v AS (SELECT user_id, ts, "
            "CAST(floor(value * 100) AS BIGINT) AS cents, "
            "lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt "
            "FROM events WHERE value IS NOT NULL) "
            "SELECT user_id, CAST(sum(cents * (epoch_us(nxt) - epoch_us(ts))) "
            "AS BIGINT) AS tw_cents_us, CAST(count(*) AS BIGINT) AS n_gaps "
            "FROM v WHERE nxt IS NOT NULL GROUP BY user_id"
        ),
        "latest_event_per_user": (
            "SELECT user_id, event_id, event_type FROM ("
            "SELECT user_id, event_id, event_type, row_number() OVER ("
            "PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
            "FROM events) WHERE rn = 1"
        ),
        "top_transitions": (
            "WITH seq AS (SELECT event_type AS prev_type, "
            "  lead(event_type) OVER (PARTITION BY user_id "
            "    ORDER BY ts, event_id) AS next_type "
            "  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL "
            "    AND event_type IS NOT NULL) "
            "SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n "
            "FROM seq WHERE next_type IS NOT NULL "
            "GROUP BY prev_type, next_type "
            "ORDER BY n DESC, prev_type, next_type LIMIT 10"
        ),
        "top_transitions3": (
            "WITH seq AS (SELECT event_type AS t1, "
            "  lead(event_type) OVER (PARTITION BY user_id "
            "    ORDER BY ts, event_id) AS t2, "
            "  lead(event_type, 2) OVER (PARTITION BY user_id "
            "    ORDER BY ts, event_id) AS t3 "
            "  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL "
            "    AND event_type IS NOT NULL) "
            "SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n "
            "FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL "
            "GROUP BY t1, t2, t3 ORDER BY n DESC, t1, t2, t3 LIMIT 10"
        ),
        "retention_cohorts": (
            "WITH uw AS (SELECT DISTINCT user_id, "
            "  CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS wk "
            "  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL), "
            "fw AS (SELECT user_id, min(wk) AS cohort FROM uw GROUP BY user_id) "
            "SELECT f.cohort AS cohort_week, "
            "CAST(u.wk - f.cohort AS BIGINT) AS week_offset, "
            "CAST(count(*) AS BIGINT) AS n_users "
            "FROM uw u JOIN fw f USING (user_id) GROUP BY 1, 2"
        ),
        "docs_with_terms": (
            "WITH tok AS (SELECT doc_id, "
            "  unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents) "
            "SELECT doc_id, "
            "CAST(sum(CASE WHEN t = 'hash' THEN 1 ELSE 0 END) AS BIGINT) "
            "  AS tf_hash, "
            "CAST(sum(CASE WHEN t = 'vector' THEN 1 ELSE 0 END) AS BIGINT) "
            "  AS tf_vector, "
            "CAST(sum(CASE WHEN t = 'window' THEN 1 ELSE 0 END) AS BIGINT) "
            "  AS tf_window "
            "FROM tok GROUP BY doc_id "
            "HAVING tf_hash > 0 AND tf_vector > 0 AND tf_window > 0"
        ),
        "orderkey_skew_stats": (
            "WITH c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem "
            "  WHERE l_orderkey IS NOT NULL GROUP BY l_orderkey), "
            "t AS (SELECT CAST(sum(n) AS BIGINT) AS n_rows, "
            "  CAST(count(*) AS BIGINT) AS n_keys, "
            "  CAST(max(n) AS BIGINT) AS max_key_n FROM c), "
            "m AS (SELECT n AS med FROM c ORDER BY n LIMIT 1 OFFSET "
            "  ((SELECT (n_keys + 1) // 2 FROM t) - 1)) "
            "SELECT n_rows, n_keys, max_key_n, "
            "(SELECT CAST(med AS BIGINT) FROM m) AS median_key_n, "
            "CAST((1000000 * max_key_n) // n_rows AS BIGINT) "
            "  AS top1_share_micro FROM t"
        ),
        "value_outliers_mad": (
            "WITH s AS (SELECT event_type, median(value) AS med, "
            "  mad(value) AS m FROM events WHERE value IS NOT NULL "
            "  GROUP BY event_type) "
            "SELECT e.event_type, CAST(count(*) AS BIGINT) AS n, "
            "s.med AS median, s.m AS mad, "
            "CAST(sum(CASE WHEN abs(e.value - s.med) > 3.0 * s.m "
            "  THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers "
            "FROM events e JOIN s USING (event_type) "
            "WHERE e.value IS NOT NULL "
            "GROUP BY e.event_type, s.med, s.m"
        ),
        "revenue_by_price_quartile": (
            "WITH v AS (SELECT o_totalprice AS x FROM orders "
            "  WHERE o_totalprice IS NOT NULL), "
            "cnt AS (SELECT count(*) AS n FROM v), "
            "b1 AS (SELECT x FROM v ORDER BY x LIMIT 1 OFFSET "
            "  ((SELECT greatest(1, (n * 1) // 4) FROM cnt) - 1)), "
            "b2 AS (SELECT x FROM v ORDER BY x LIMIT 1 OFFSET "
            "  ((SELECT greatest(1, (n * 2) // 4) FROM cnt) - 1)), "
            "b3 AS (SELECT x FROM v ORDER BY x LIMIT 1 OFFSET "
            "  ((SELECT greatest(1, (n * 3) // 4) FROM cnt) - 1)) "
            "SELECT CAST(("
            "  CASE WHEN x >= (SELECT x FROM b1) THEN 1 ELSE 0 END + "
            "  CASE WHEN x >= (SELECT x FROM b2) THEN 1 ELSE 0 END + "
            "  CASE WHEN x >= (SELECT x FROM b3) THEN 1 ELSE 0 END"
            ") AS BIGINT) AS bucket, "
            "CAST(sum(CAST(floor(x * 100) AS BIGINT)) AS BIGINT) "
            "  AS revenue_cents, "
            "CAST(count(*) AS BIGINT) AS n "
            "FROM v GROUP BY 1"
        ),
        "order_price_range_parts": (
            "WITH v AS (SELECT o_totalprice AS x FROM orders "
            "  WHERE o_totalprice IS NOT NULL), "
            "cnt AS (SELECT count(*) AS n FROM v), "
            "b1 AS (SELECT x FROM v ORDER BY x LIMIT 1 OFFSET "
            "  ((SELECT greatest(1, (n * 1) // 4) FROM cnt) - 1)), "
            "b2 AS (SELECT x FROM v ORDER BY x LIMIT 1 OFFSET "
            "  ((SELECT greatest(1, (n * 2) // 4) FROM cnt) - 1)), "
            "b3 AS (SELECT x FROM v ORDER BY x LIMIT 1 OFFSET "
            "  ((SELECT greatest(1, (n * 3) // 4) FROM cnt) - 1)) "
            "SELECT CAST(("
            "  CASE WHEN x >= (SELECT x FROM b1) THEN 1 ELSE 0 END + "
            "  CASE WHEN x >= (SELECT x FROM b2) THEN 1 ELSE 0 END + "
            "  CASE WHEN x >= (SELECT x FROM b3) THEN 1 ELSE 0 END"
            ") AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n "
            "FROM v GROUP BY 1"
        ),
        "event_funnel": (
            "WITH s1 AS (SELECT user_id, min(ts) AS t FROM events "
            "  WHERE event_type = 'view' GROUP BY user_id), "
            "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "  JOIN s1 USING (user_id) "
            "  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY e.user_id), "
            "s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            "  JOIN s2 USING (user_id) "
            "  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY e.user_id) "
            "SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_type, "
            "  CAST(count(*) AS BIGINT) AS n_users FROM s1 "
            "UNION ALL SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM s2 "
            "UNION ALL SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM s3"
        ),
        "dedup_keep_longest": (
            "SELECT doc_id, n_chars FROM ("
            "SELECT doc_id, n_chars, row_number() OVER ("
            "PARTITION BY text ORDER BY n_chars DESC, doc_id) AS rn "
            "FROM documents) WHERE rn = 1"
        ),
        "priority_quantity_salted": (
            # the plain (unsalted) join IS the oracle: salting must not
            # change the result
            "SELECT o_orderpriority, "
            "CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) "
            "  AS qty_cents "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_quantity IS NOT NULL GROUP BY o_orderpriority"
        ),
        "label_centroids": (
            "WITH d AS (SELECT i FROM range(1, 65) t(i)) "
            "SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim, "
            "CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) "
            "  AS BIGINT)) AS BIGINT) AS sum_micro, "
            "CAST(count(*) AS BIGINT) AS n "
            "FROM embeddings, d WHERE label IS NOT NULL GROUP BY label, i"
        ),
        "value_median_exact": (
            "SELECT value AS kth FROM events WHERE value IS NOT NULL "
            "ORDER BY value LIMIT 1 OFFSET "
            "((SELECT (count(value) + 1) // 2 - 1 FROM events))"
        ),
        "events_union_by_name": (
            "SELECT event_id, user_id, value, event_type FROM ("
            "SELECT event_id, user_id, value FROM events "
            "UNION ALL BY NAME "
            "SELECT event_id, event_type FROM events)"
        ),
        "value_histogram": (
            "SELECT CAST(floor(floor(value * 100) / 500) AS BIGINT) AS bin, "
            "CAST(count(*) AS BIGINT) AS n FROM events "
            "WHERE value IS NOT NULL GROUP BY 1"
        ),
        "pmi_collocations": (
            "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS w "
            "  FROM documents), "
            "bg AS (SELECT w[i] AS w1, w[i+1] AS w2 "
            "  FROM toks, UNNEST(range(1, len(w))) AS t(i) WHERE len(w) >= 2), "
            "bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_xy "
            "  FROM bg GROUP BY w1, w2), "
            "tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS total FROM bc), "
            "uc AS (SELECT t AS w, CAST(count(*) AS BIGINT) AS n FROM ("
            "  SELECT unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents) "
            "  GROUP BY t) "
            "SELECT w1, w2, n_xy, ux.n AS n_x, uy.n AS n_y, "
            "CAST((1000000::HUGEINT * n_xy * total) // (ux.n * uy.n) AS BIGINT) "
            "  AS pmi_micro "
            "FROM bc, tot "
            "JOIN uc ux ON ux.w = bc.w1 JOIN uc uy ON uy.w = bc.w2 "
            "WHERE n_xy >= 20 "
            "ORDER BY pmi_micro DESC, w1, w2 LIMIT 50"
        ),
        "inverted_index": (
            "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t "
            "  FROM documents), "
            "tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf "
            "  FROM tok GROUP BY doc_id, t) "
            "SELECT t AS token, CAST(doc_id // 128 AS BIGINT) AS seg, "
            "CAST(count(*) AS BIGINT) AS df, "
            "string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR), "
            "',' ORDER BY doc_id) AS postings "
            "FROM tf GROUP BY t, doc_id // 128"
        ),
        "top_tokens": (
            "SELECT t AS token, CAST(count(*) AS BIGINT) AS n FROM ("
            "  SELECT unnest(regexp_extract_all(text, '\\S+')) AS t FROM documents) "
            "GROUP BY t ORDER BY n DESC, t LIMIT 50"
        ),
        "active_ship_days": (
            "SELECT DISTINCT l_shipdate AS day FROM lineitem "
            "INTERSECT SELECT DISTINCT o_orderdate AS day FROM orders"
        ),
        "quiet_ship_days": (
            "SELECT DISTINCT l_shipdate AS day FROM lineitem "
            "EXCEPT SELECT DISTINCT o_orderdate AS day FROM orders"
        ),
        "revenue_rollup": (
            "WITH j AS (SELECT r.r_name, n.n_name, "
            "  CAST(floor(l.l_extendedprice*(1-l.l_discount)*100) AS BIGINT) AS cents "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey) "
            "SELECT r_name, n_name, CAST(sum(cents) AS BIGINT)/100.0 AS revenue "
            "FROM j GROUP BY ROLLUP(r_name, n_name)"
        ),
        "stratified_doc_sample": (
            "SELECT doc_id, lang FROM documents WHERE "
            "(lang = 'en' AND substr(md5(text), 1, 1) IN ('0','1')) OR "
            "(lang = 'pt' AND substr(md5(text), 1, 1) IN ('0','1','2','3','4','5','6','7')) OR "
            "(lang NOT IN ('en','pt') AND substr(md5(text), 1, 1) IN ('0','1','2','3'))"
        ),
        "capped_docs_per_source": (
            "SELECT source, doc_id FROM ("
            "  SELECT source, doc_id, row_number() OVER ("
            "    PARTITION BY source ORDER BY md5(COALESCE(text, '')), doc_id) AS rn"
            "  FROM documents) t WHERE rn <= 10"
        ),
        "orders_upsert": (
            "WITH base AS (SELECT o_orderkey, o_totalprice, "
            "  CAST(1 AS BIGINT) AS version, 0 AS is_upd FROM orders), "
            "upd AS (SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, "
            "  CAST(CASE WHEN o_orderkey % 14 = 0 THEN 0 ELSE 2 END AS BIGINT) AS version, "
            "  1 AS is_upd FROM orders WHERE o_orderkey % 7 = 0), "
            "all_rows AS (SELECT * FROM base UNION ALL SELECT * FROM upd) "
            "SELECT o_orderkey, o_totalprice, version FROM all_rows "
            "QUALIFY row_number() OVER (PARTITION BY o_orderkey "
            "  ORDER BY version DESC, is_upd DESC) = 1"
        ),
        "tfidf_top3": (
            "WITH tok AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS t "
            "  FROM documents), "
            "tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf "
            "  FROM tok GROUP BY doc_id, t), "
            "df AS (SELECT t, CAST(count(*) AS BIGINT) AS df "
            "  FROM (SELECT DISTINCT doc_id, t FROM tok) GROUP BY t), "
            "n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents), "
            "scored AS (SELECT tf.doc_id, tf.t, "
            "  CAST(tf.tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE)/CAST(df.df AS DOUBLE)) AS s "
            "  FROM tf JOIN df USING (t) CROSS JOIN n) "
            "SELECT doc_id, t AS term, CAST(row_number() OVER ("
            "  PARTITION BY doc_id ORDER BY s DESC, t) AS BIGINT) AS rank "
            "FROM scored QUALIFY rank <= 3"
        ),
        "revenue_cube": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cents "
            "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"
        ),
        "event_gaps": (
            "SELECT event_id, user_id, epoch_us(ts) AS ts_us, "
            "epoch_us(ts) - lag(epoch_us(ts)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS gap_us "
            "FROM events"
        ),
        # shared chunking CTE: non-overlapping 10-token chunks, tail
        # (<10 tokens) dropped — mirrors stages/chunks.py chunk_batch
        "chunk_dedup_docs": (
            "WITH tok AS (SELECT doc_id, "
            "  unnest(regexp_extract_all(text, '\\S+')) AS w, "
            "  unnest(range(len(regexp_extract_all(text, '\\S+')))) AS i FROM documents), "
            "chunks AS (SELECT doc_id, i // 10 AS chunk_idx, "
            "  string_agg(w, ' ' ORDER BY i) AS chunk "
            "  FROM tok GROUP BY doc_id, i // 10 HAVING count(*) = 10), "
            "kept AS (SELECT doc_id, chunk_idx, chunk, "
            "  row_number() OVER (PARTITION BY chunk ORDER BY doc_id, chunk_idx) AS rn "
            "  FROM chunks) "
            "SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_dedup, "
            "  CAST(count(*) AS BIGINT) AS n_kept "
            "FROM kept WHERE rn = 1 GROUP BY doc_id"
        ),
        # tokenization contract: string_split(text, ' ') == Python
        # text.split(' ') == Arrow split_pattern — empty tokens kept
        "dup_span_stats": (
            "WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "starts AS (SELECT doc_id, toks, "
            "  unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS pos FROM d), "
            "grams AS (SELECT doc_id, pos, "
            "  array_to_string(toks[pos:pos+7], ' ') AS gram FROM starts), "
            "dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2), "
            "marked AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)), "
            "cov AS (SELECT doc_id, pos, "
            "  lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt FROM marked), "
            "percov AS (SELECT doc_id, sum(CASE WHEN nxt IS NULL THEN 8 "
            "  ELSE least(8, nxt - pos) END) AS dup_tokens FROM cov GROUP BY doc_id) "
            "SELECT d.doc_id, CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens "
            "FROM d LEFT JOIN percov p USING (doc_id)"
        ),
        "dup_span_clean": (
            "WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
            "starts AS (SELECT doc_id, toks, "
            "  unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS pos FROM d), "
            "grams AS (SELECT doc_id, pos, "
            "  array_to_string(toks[pos:pos+7], ' ') AS gram FROM starts), "
            "dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2), "
            "occ AS (SELECT g.doc_id, g.pos, row_number() OVER ("
            "  PARTITION BY g.gram ORDER BY g.doc_id, g.pos) AS rn "
            "  FROM grams g JOIN dup USING (gram)), "
            "marked AS (SELECT doc_id, pos FROM occ WHERE rn > 1), "
            "tokpos AS (SELECT doc_id, toks, "
            "  unnest(generate_series(1, len(toks))) AS tp FROM d), "
            "rem AS (SELECT DISTINCT t.doc_id, t.tp FROM tokpos t JOIN marked m "
            "  ON t.doc_id = m.doc_id AND t.tp BETWEEN m.pos AND m.pos + 7), "
            "keptagg AS (SELECT t.doc_id, "
            "  string_agg(t.toks[t.tp], ' ' ORDER BY t.tp) AS text_clean, "
            "  count(*) AS n_kept FROM tokpos t "
            "  LEFT JOIN rem r ON t.doc_id = r.doc_id AND t.tp = r.tp "
            "  WHERE r.tp IS NULL GROUP BY t.doc_id) "
            "SELECT d.doc_id, coalesce(k.text_clean, '') AS text_clean, "
            "CAST(len(d.toks) - coalesce(k.n_kept, 0) AS BIGINT) AS n_removed "
            "FROM d LEFT JOIN keptagg k USING (doc_id)"
        ),
        "gopher_quality": (
            "WITH tok AS (SELECT doc_id, "
            "  unnest(regexp_extract_all(text, '\\S+')) AS w, "
            "  unnest(range(len(regexp_extract_all(text, '\\S+')))) AS i FROM documents), "
            "wc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w), "
            "tops AS (SELECT doc_id, c AS top_c, len(w) AS top_len, "
            "  row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, w) AS rn FROM wc), "
            "stats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, "
            "  CAST(count(*) AS BIGINT) AS n_distinct_words, "
            "  CAST(sum(c * len(w)) AS BIGINT) AS total_chars FROM wc GROUP BY doc_id), "
            "big AS (SELECT doc_id, w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS bg "
            "  FROM tok QUALIFY bg IS NOT NULL), "
            "bstats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bi, "
            "  CAST(count(DISTINCT bg) AS BIGINT) AS nd_bi FROM big GROUP BY doc_id) "
            "SELECT s.doc_id, s.n_words, s.n_distinct_words, "
            "  CAST(s.n_words - s.n_distinct_words AS DOUBLE)/CAST(s.n_words AS DOUBLE) AS dup_word_frac, "
            "  CAST(t.top_c * t.top_len AS DOUBLE)/CAST(s.total_chars AS DOUBLE) AS top_word_char_frac, "
            "  CASE WHEN coalesce(b.n_bi, 0) = 0 THEN 0.0 "
            "       ELSE CAST(b.n_bi - b.nd_bi AS DOUBLE)/CAST(b.n_bi AS DOUBLE) END AS dup_bigram_frac "
            "FROM stats s JOIN tops t ON s.doc_id = t.doc_id AND t.rn = 1 "
            "LEFT JOIN bstats b ON s.doc_id = b.doc_id"
        ),
        "model_quality_by_source": (
            "WITH tok AS (SELECT doc_id, source, "
            "  unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+')) AS t "
            "  FROM documents), "
            "dw AS (SELECT doc_id, source, count(*) AS n_tok, "
            "  sum(CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) % 1001 - 500) AS w "
            "  FROM tok GROUP BY 1, 2) "
            "SELECT a.source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(CASE WHEN d.n_tok > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_scored, "
            "CAST(sum(CASE WHEN d.w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass, "
            "CAST(coalesce(sum(d.w), 0) AS BIGINT) AS sum_w, "
            "CAST(coalesce(sum(d.n_tok), 0) AS BIGINT) AS sum_tokens "
            "FROM documents a LEFT JOIN dw d USING (doc_id) GROUP BY 1"
        ),
        "contamination_screen": (
            "WITH tok AS (SELECT doc_id, "
            "  unnest(regexp_extract_all(text, '\\S+')) AS w, "
            "  unnest(range(len(regexp_extract_all(text, '\\S+')))) AS i FROM documents), "
            "chunks AS (SELECT doc_id, i // 10 AS chunk_idx, "
            "  string_agg(w, ' ' ORDER BY i) AS chunk "
            "  FROM tok GROUP BY doc_id, i // 10 HAVING count(*) = 10), "
            "bench AS (SELECT DISTINCT chunk FROM chunks WHERE doc_id % 41 = 0) "
            "SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks, "
            "  CAST(sum(CASE WHEN b.chunk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated "
            "FROM chunks c LEFT JOIN bench b USING (chunk) GROUP BY c.doc_id"
        ),
        # same oracle as contamination_screen: the join plan must
        # produce identical rows to the broadcast plan
        "contamination_screen_join": (
            "WITH tok AS (SELECT doc_id, "
            "  unnest(regexp_extract_all(text, '\\S+')) AS w, "
            "  unnest(range(len(regexp_extract_all(text, '\\S+')))) AS i FROM documents), "
            "chunks AS (SELECT doc_id, i // 10 AS chunk_idx, "
            "  string_agg(w, ' ' ORDER BY i) AS chunk "
            "  FROM tok GROUP BY doc_id, i // 10 HAVING count(*) = 10), "
            "bench AS (SELECT DISTINCT chunk FROM chunks WHERE doc_id % 41 = 0) "
            "SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks, "
            "  CAST(sum(CASE WHEN b.chunk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated "
            "FROM chunks c LEFT JOIN bench b USING (chunk) GROUP BY c.doc_id"
        ),
        "window_active_users": (
            "SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY 1"
        ),
        # sketch is exact on this corpus (per-block distinct ≤ m ⇒ bt=0)
        "frequent_users_sketch": (
            "SELECT CAST(user_id AS VARCHAR) AS item, "
            "CAST(count(*) AS BIGINT) AS est, CAST(0 AS BIGINT) AS err "
            "FROM events GROUP BY user_id "
            "ORDER BY est DESC, item LIMIT 10"
        ),
        "frequent_users_by_type": (
            "SELECT event_type, item, est, err FROM ("
            "SELECT event_type, CAST(user_id AS VARCHAR) AS item, "
            "CAST(count(*) AS BIGINT) AS est, CAST(0 AS BIGINT) AS err, "
            "row_number() OVER (PARTITION BY event_type "
            "ORDER BY count(*) DESC, CAST(user_id AS VARCHAR)) AS rn "
            "FROM events GROUP BY event_type, user_id) WHERE rn <= 5"
        ),
        "knn_top5": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings "
            "  WHERE vec_id IN (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 3)), "
            "scored AS (SELECT q.query_id, e.vec_id, "
            "  list_cosine_similarity(q.qv, e.embedding) AS score "
            "  FROM q CROSS JOIN embeddings e), "
            "ranked AS (SELECT query_id, vec_id, "
            "  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank "
            "  FROM scored) "
            "SELECT query_id, rank, vec_id FROM ranked WHERE rank <= 5"
        ),
        "nb_lang_top_tokens": (
            "WITH tok AS (SELECT lang AS label, "
            "  unnest(regexp_extract_all(text, '\\S+')) AS token "
            "  FROM documents WHERE lang IS NOT NULL), "
            "c AS (SELECT label, token, CAST(count(*) AS BIGINT) AS n "
            "  FROM tok GROUP BY label, token) "
            "SELECT label, token, n FROM c "
            "QUALIFY row_number() OVER (PARTITION BY label "
            "  ORDER BY n DESC, token) <= 10"
        ),
        "stump_split_nchars": (
            "WITH b AS (SELECT source, CAST(n_chars // 64 AS BIGINT) AS bin, "
            "  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos "
            "  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL), "
            "c AS (SELECT source, bin, CAST(sum(pos) AS BIGINT) AS p, "
            "  CAST(count(*) - sum(pos) AS BIGINT) AS q FROM b GROUP BY source, bin), "
            "t AS (SELECT source, CAST(sum(p) AS BIGINT) AS tp, "
            "  CAST(sum(q) AS BIGINT) AS tq FROM c GROUP BY source), "
            "cum AS (SELECT source, bin, "
            "  CAST(sum(p) OVER (PARTITION BY source ORDER BY bin) AS BIGINT) AS lp, "
            "  CAST(sum(q) OVER (PARTITION BY source ORDER BY bin) AS BIGINT) AS lq, "
            "  row_number() OVER (PARTITION BY source ORDER BY bin DESC) AS rn FROM c), "
            "cand AS (SELECT cum.source, (cum.bin + 1) * 64 AS threshold, "
            "  cum.lp, cum.lq, t.tp - cum.lp AS rp, t.tq - cum.lq AS rq "
            "  FROM cum JOIN t USING (source) WHERE cum.rn > 1), "
            "scored AS (SELECT source, threshold, lp, lq, rp, rq, "
            "  least(lp, lq) + least(rp, rq) AS err FROM cand) "
            "SELECT source AS key, CAST(threshold AS BIGINT) AS threshold, "
            "  lp AS n_left_pos, lq AS n_left_neg, rp AS n_right_pos, "
            "  rq AS n_right_neg, CAST(err AS BIGINT) AS err "
            "FROM scored QUALIFY row_number() OVER (PARTITION BY source "
            "  ORDER BY err, threshold) = 1"
        ),
        "nb_distinctive_tokens": (
            "WITH tok AS (SELECT lang AS label, "
            "  unnest(regexp_extract_all(text, '\\S+')) AS token "
            "  FROM documents WHERE lang IS NOT NULL), "
            "c AS (SELECT label, token, CAST(count(*) AS BIGINT) AS n "
            "  FROM tok GROUP BY label, token), "
            "tt AS (SELECT token, CAST(sum(n) AS BIGINT) AS nt FROM c GROUP BY token), "
            "lt AS (SELECT label, CAST(sum(n) AS BIGINT) AS tl FROM c GROUP BY label), "
            "tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c), "
            "s AS (SELECT c.label, c.token, c.n, "
            "  CAST(c.n * (tot.t - lt.tl) - (tt.nt - c.n) * lt.tl AS BIGINT) AS score "
            "  FROM c JOIN tt USING (token) JOIN lt USING (label) CROSS JOIN tot "
            "  WHERE c.n >= 2) "
            "SELECT label, token, n, score FROM s "
            "QUALIFY row_number() OVER (PARTITION BY label "
            "  ORDER BY score DESC, token) <= 10"
        ),
        "daily_revenue_interp": (
            "WITH daily AS (SELECT (epoch_us(o_orderdate) // 86400000000) AS di, "
            "  CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents "
            "  FROM orders WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL "
            "  GROUP BY 1), "
            "bounds AS (SELECT min(di) AS lo, max(di) AS hi FROM daily), "
            "grid AS (SELECT unnest(generate_series(lo, hi)) AS di FROM bounds), "
            "j AS (SELECT g.di AS di, d.cents FROM grid g LEFT JOIN daily d USING (di)), "
            "f AS (SELECT di, cents, "
            "  max(CASE WHEN cents IS NOT NULL THEN di END) OVER "
            "    (ORDER BY di ROWS UNBOUNDED PRECEDING) AS d0, "
            "  min(CASE WHEN cents IS NOT NULL THEN di END) OVER "
            "    (ORDER BY di ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS d1 "
            "  FROM j) "
            "SELECT f.di * 86400000000 AS day_us, "
            "  CAST(CASE WHEN f.cents IS NOT NULL THEN f.cents "
            "    ELSE p.cents + ((n.cents - p.cents) * (f.di - f.d0)) // (f.d1 - f.d0) "
            "    END AS BIGINT) AS cents, "
            "  CAST(CASE WHEN f.cents IS NULL THEN 1 ELSE 0 END AS BIGINT) "
            "    AS interpolated "
            "FROM f LEFT JOIN daily p ON p.di = f.d0 LEFT JOIN daily n ON n.di = f.d1"
        ),
        "temperature_mix_allocation": (
            "WITH n AS (SELECT source AS key, "
            "  CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS nt "
            "  FROM documents GROUP BY source), "
            "tot AS (SELECT CAST(sum(nt) AS BIGINT) // 2 AS b FROM n), "
            "w AS (SELECT key, nt, CAST(FLOOR(SQRT(nt)) AS BIGINT) AS wt FROM n), "
            "s AS (SELECT *, CAST(sum(wt) OVER () AS BIGINT) AS tw FROM w), "
            "c AS (SELECT s.key, s.nt, (tot.b * s.wt) // s.tw AS base, "
            "  (tot.b * s.wt) % s.tw AS rem, tot.b AS b FROM s CROSS JOIN tot), "
            "l AS (SELECT *, b - CAST(sum(base) OVER () AS BIGINT) AS leftover, "
            "  CAST(row_number() OVER (ORDER BY rem DESC, key) AS BIGINT) AS rk FROM c) "
            "SELECT key, nt AS n_tokens, CAST(base + CASE WHEN rk <= leftover "
            "THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens FROM l"
        ),
        "unimax_mix_allocation": (
            "WITH n AS (SELECT source AS key, "
            "  CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS nt "
            "  FROM documents GROUP BY source), "
            "tot AS (SELECT CAST(sum(nt) AS BIGINT) AS t FROM n), "
            "ord AS (SELECT key, nt, 4*nt AS cap, "
            "  CAST(row_number() OVER (ORDER BY nt, key) AS BIGINT) AS rn, "
            "  CAST(count(*) OVER () AS BIGINT) AS k FROM n), "
            "pre AS (SELECT *, CAST(sum(cap) OVER (ORDER BY rn) AS BIGINT) AS pfx "
            "  FROM ord), "
            "fit AS (SELECT pre.*, tot.t // 2 AS b, "
            "  CASE WHEN cap*(k-rn+1) + (pfx-cap) <= tot.t // 2 THEN 1 ELSE 0 END "
            "  AS fits FROM pre CROSS JOIN tot), "
            "mm AS (SELECT COALESCE(CAST(max(rn) AS BIGINT), 0) AS m, "
            "  COALESCE(CAST(max(pfx) AS BIGINT), 0) AS pm FROM fit WHERE fits = 1) "
            "SELECT key, nt AS n_tokens, "
            "  CAST(CASE WHEN rn <= mm.m THEN cap "
            "    ELSE (b - mm.pm) // (k - mm.m) END AS BIGINT) AS alloc_tokens "
            "FROM fit CROSS JOIN mm"
        ),
        # langid / quality / fingerprints / minhash_pairs / simhash_pairs /
        # knn_lsh / embedding_dups / nb_confusion / extract_* are not
        # SQL-expressible → rows-only checks by design.
    }
