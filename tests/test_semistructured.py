"""Semi-structured extraction, scrubbing, normalized dedup, k-means
clustering — the round-3 additions."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pdf_table_extractor_ray.stages.semistructured import (
    json_int_field_batch,
    normalize_text_batch,
    scrub_batch,
)


def test_json_int_field_extracts_and_nulls():
    batch = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "props": ['{"k": 87}', '{"k": 0}', "{}", None, '{"j": 5}'],
        }
    )
    out = json_int_field_batch(batch, col="props", field="k", out="k")
    assert out.column_names == ["event_id", "k"]
    assert out.column("k").to_pylist() == [87, 0, None, None, None]


def test_scrub_batch_global_word_boundaries():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "the customer saw a user and customer",
                "customers are not matched (substring)",
                "no hit",
            ],
        }
    )
    out = scrub_batch(batch)
    assert out.column("scrubbed").to_pylist() == [
        "the <PII> saw a <PII> and <PII>",
        "customers are not matched (substring)",
        "no hit",
    ]
    assert out.column("n_redactions").to_pylist() == [3, 0, 0]


def test_normalize_text_batch_canonical_form():
    batch = pa.table({"text": ["  Hello   WORLD ", "a\tb\nc", "hello world"]})
    out = normalize_text_batch(batch)
    norm = out.column("norm_text").to_pylist()
    assert norm == ["hello world", "a b c", "hello world"]


def test_normalized_dedup_merges_case_and_whitespace(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.dedup import exact_dedup_ids, normalized_dedup_ids

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["Hello   World", "hello world", "HELLO WORLD ", "something else"],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    norm_keepers = sorted(r["doc_id"] for r in normalized_dedup_ids(ds).take_all())
    assert norm_keepers == [1, 4]
    # plain exact dedup keeps all four (texts differ byte-wise)
    exact_keepers = sorted(r["doc_id"] for r in exact_dedup_ids(ds).take_all())
    assert exact_keepers == [1, 2, 3, 4]


def test_kmeans_assign_matches_bruteforce_and_is_layout_invariant(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.similarity import (
        _normalize,
        kmeans_assign,
        kmeans_cluster_sizes,
    )

    rng = np.random.default_rng(7)
    n, dim, k = 400, 16, 8
    vecs = rng.normal(size=(n, dim))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in vecs.astype(np.float32)]),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = {r["vec_id"]: r for r in kmeans_assign(ds, n_clusters=k).take_all()}
    assert len(out) == n

    # independent brute-force: retrain centroids the same deterministic
    # way and verify every assignment is the argmax-cosine centroid
    from pdf_table_extractor_ray.stages.similarity import train_ivf_centroids

    cents = train_ivf_centroids(ds, n_clusters=k)
    sims = _normalize(np.array([v.tolist() for v in vecs.astype(np.float32)], np.float64)) @ cents.T
    expect = np.argmax(sims, axis=1)
    for i in range(n):
        assert out[i]["cluster"] == expect[i]
        assert abs(out[i]["cosine"] - sims[i, expect[i]]) < 1e-12

    # summary is deterministic across block layouts and sizes sum to n
    s1 = sorted(
        kmeans_cluster_sizes(kmeans_assign(ds, n_clusters=k)).take_all(),
        key=lambda r: r["cluster"],
    )
    s2 = sorted(
        kmeans_cluster_sizes(kmeans_assign(ds.repartition(2), n_clusters=k)).take_all(),
        key=lambda r: r["cluster"],
    )
    assert s1 == s2
    assert sum(r["n_members"] for r in s1) == n


def test_exact_quantile_disc_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import (
        exact_quantile_disc,
        filter_above_quantile,
    )

    rng = np.random.default_rng(23)
    vals = rng.integers(0, 300, 5000).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(np.arange(5000, dtype=np.int64)), "n_chars": vals})
    ds = ray.data.from_arrow(tbl).repartition(7)
    con = duckdb.connect()
    con.register("t", tbl)
    for q in (0.5, 0.95, 0.99, 1.0):
        want = con.execute(f"SELECT quantile_disc(n_chars, {q}) FROM t").fetchone()[0]
        assert exact_quantile_disc(ds, "n_chars", q) == float(want), q
    kept = filter_above_quantile(ds, "n_chars", 0.95).take_all()
    thr = con.execute("SELECT quantile_disc(n_chars, 0.95) FROM t").fetchone()[0]
    assert sorted(r["doc_id"] for r in kept) == sorted(
        int(i) for i in np.nonzero(vals > thr)[0]
    )


def test_weighted_sample_bruteforce_parity_and_bias(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.dedup import weighted_sample_topk
    from pdf_table_extractor_ray.stages.sketches import _hash64_column
    from pdf_table_extractor_ray.stages.textstats import _splash64

    n, k = 4000, 200
    rng = np.random.default_rng(3)
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 1000, n).astype(np.int64)
    tbl = pa.table({"doc_id": ids, "n_chars": w})
    ds = ray.data.from_arrow(tbl).repartition(6)

    got = [r["doc_id"] for r in weighted_sample_topk(ds, k=k).take_all()]
    assert len(got) == k and len(set(got)) == k

    # brute force the same E-S keys
    h = _hash64_column(pa.array(ids)) ^ np.uint64(0x5EED)
    u = (_splash64(h).astype(np.float64) + 1.0) / 2.0**64
    key = np.log(u) / np.maximum(w.astype(np.float64), 1e-12)
    expect = set(ids[np.argsort(-key, kind="stable")[:k]].tolist())
    assert set(got) == expect

    # layout invariance
    got2 = [r["doc_id"] for r in weighted_sample_topk(ds.repartition(2), k=k).take_all()]
    assert set(got2) == expect

    # weight bias: sampled rows should skew heavy
    assert w[np.isin(ids, got)].mean() > 1.3 * w.mean()


def test_grouped_comoments_bruteforce_and_nulls(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.stats import corr_from_comoments, grouped_comoments

    rng = np.random.default_rng(11)
    n = 3000
    keys = rng.choice(["a", "b"], n)
    x = rng.integers(-500, 500, n).astype(np.int64)
    # y correlated with x for key 'a', independent for 'b'; 5% nulls
    y_raw = np.where(keys == "a", x * 2 + rng.integers(-50, 50, n), rng.integers(-500, 500, n))
    null_mask = rng.random(n) < 0.05
    y = pa.array(np.where(null_mask, 0, y_raw), pa.int64(), mask=null_mask)
    tbl = pa.table({"k": keys, "x": pa.array(x), "y": y})
    ds = ray.data.from_arrow(tbl).repartition(5)
    out = {r["k"]: r for r in grouped_comoments(ds, "k", "x", "y").take_all()}

    for key in ("a", "b"):
        m = keys == key
        mv = m & ~null_mask
        assert out[key]["n"] == int(m.sum())
        assert out[key]["n_xy"] == int(mv.sum())
        assert out[key]["sum_x"] == int(x[m].sum())
        assert out[key]["sum_y"] == int(y_raw[mv].sum())
        assert out[key]["sum_xy"] == int((x[mv] * y_raw[mv]).sum())
        assert out[key]["sum_x2"] == int((x[m] * x[m]).sum())
        assert out[key]["sum_y2"] == int((y_raw[mv] * y_raw[mv]).sum())

    # layout invariance (integer-exact)
    out2 = {r["k"]: r for r in grouped_comoments(ds.repartition(2), "k", "x", "y").take_all()}
    assert out == out2

    # derived corr: strong for 'a' (null-free x-sums ≈ pair sums at 5% nulls)
    assert corr_from_comoments(out["a"]) > 0.9
    assert abs(corr_from_comoments(out["b"])) < 0.2


def test_global_percent_rank_matches_duckdb_with_ties(ray_session):
    import duckdb
    import ray.data

    from pdf_table_extractor_ray.stages.stats import global_percent_rank

    rng = np.random.default_rng(31)
    vals = rng.integers(0, 50, 2000).astype(np.int64)  # heavy ties
    tbl = pa.table({"doc_id": pa.array(np.arange(2000, dtype=np.int64)), "n_chars": vals})
    ds = ray.data.from_arrow(tbl).repartition(6)
    got = {r["doc_id"]: r["pct_rank"] for r in global_percent_rank(ds, "n_chars").take_all()}
    con = duckdb.connect()
    con.register("t", tbl)
    want = dict(
        con.execute(
            "SELECT doc_id, percent_rank() OVER (ORDER BY n_chars) FROM t"
        ).fetchall()
    )
    assert got == want  # bit-identical, ties included

    # single-row edge: percent_rank = 0
    one = ray.data.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()), "n_chars": pa.array([7], pa.int64())}))
    assert global_percent_rank(one, "n_chars").take_all()[0]["pct_rank"] == 0.0


def test_tag_late_events_bruteforce(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.sessions import tag_late_events

    rng = np.random.default_rng(41)
    n = 2000
    uid = rng.integers(0, 37, n).astype(np.int64)
    ts = rng.integers(0, 10**9, n).astype(np.int64)  # event times, µs
    arrival = rng.permutation(n).astype(np.int64)  # shuffled arrival
    eid = np.arange(n, dtype=np.int64)
    L = 10**8
    tbl = pa.table(
        {
            "event_id": eid,
            "user_id": uid,
            "ts": pa.array(ts, pa.timestamp("us")),
            "arrival": arrival,
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    got = {
        r["event_id"]: r["is_late"]
        for r in tag_late_events(ds, lateness_us=L, arrival_col="arrival").take_all()
    }
    assert len(got) == n

    # brute force: per user, walk arrival order, running max watermark
    expect = {}
    for u in np.unique(uid):
        idx = np.where(uid == u)[0]
        idx = idx[np.argsort(arrival[idx], kind="stable")]
        wm = None
        for i in idx:
            expect[int(eid[i])] = int(wm is not None and ts[i] < wm - L)
            wm = ts[i] if wm is None else max(wm, int(ts[i]))
    assert got == expect
    assert sum(expect.values()) > 0  # scenario actually exercises lateness

    got2 = {
        r["event_id"]: r["is_late"]
        for r in tag_late_events(ds.repartition(2), lateness_us=L, arrival_col="arrival").take_all()
    }
    assert got2 == expect


def test_media_features_query_deterministic(ray_session):
    import __ray_entry__ as em

    out1 = sorted(
        em.queries()["media_features"]("/root/testdata/sf0.001").take_all(),
        key=lambda r: r["kind"],
    )
    assert [r["kind"] for r in out1] == ["audio", "image"]
    assert sum(r["n"] for r in out1) == 96
    out2 = sorted(
        em.queries()["media_features"]("/root/testdata/sf0.001").take_all(),
        key=lambda r: r["kind"],
    )
    assert out1 == out2
    assert all(r["sum_feat_milli"] > 0 for r in out1)


def test_batched_levenshtein_matches_duckdb():
    import duckdb

    from pdf_table_extractor_ray.stages.textstats import batched_levenshtein

    rng = np.random.default_rng(13)
    words = ["hash", "join", "sort", "scan", "merge", "table", "ação"]
    A = [" ".join(rng.choice(words, rng.integers(1, 40))) for _ in range(60)]
    B = [" ".join(rng.choice(words, rng.integers(0, 40))) for _ in range(60)]
    B[3] = ""
    A[7] = ""
    got = batched_levenshtein(A, B)
    con = duckdb.connect()
    want = [con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0] for a, b in zip(A, B)]
    assert [int(g) for g in got] == want


def test_table_checksum_layout_invariant_and_content_sensitive(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.sketches import table_checksum

    texts = [f"doc {i} body" for i in range(500)]
    tbl = pa.table({"text": texts})
    ds = ray.data.from_arrow(tbl)
    c1 = table_checksum(ds.repartition(7), "text").take_all()[0]
    # shuffled row order + different layout → identical checksum
    rng = np.random.default_rng(2)
    perm = rng.permutation(500)
    tbl2 = pa.table({"text": [texts[i] for i in perm]})
    c2 = table_checksum(ray.data.from_arrow(tbl2).repartition(3), "text").take_all()[0]
    assert c1 == c2 and c1["n_rows"] == 500
    # single-character change flips the checksum
    tbl3 = pa.table({"text": texts[:-1] + [texts[-1] + "!"]})
    c3 = table_checksum(ray.data.from_arrow(tbl3), "text").take_all()[0]
    assert c3["checksum"] != c1["checksum"]


def test_review_fix_regressions(ray_session):
    """Round-3 code-review fixes: oracle-parity and empty-input edges."""
    import duckdb
    import math
    import ray.data

    from pdf_table_extractor_ray.stages.semistructured import normalize_text_batch
    from pdf_table_extractor_ray.stages.sketches import (
        approx_quantiles_by,
        exact_quantile_disc,
        filter_above_quantile,
        table_checksum,
    )
    from pdf_table_extractor_ray.stages.stats import global_percent_rank, grouped_comoments

    con = duckdb.connect()

    # 1. normalize keeps non-RE2 whitespace (\x0b) exactly like DuckDB
    nasty = ["\x0bHello  World\x0b ", " x  ", "  plain  "]
    got = normalize_text_batch(pa.table({"text": nasty})).column("norm_text").to_pylist()
    want = [
        con.execute("SELECT trim(regexp_replace(lower(?), '\\s+', ' ', 'g'))", [t]).fetchone()[0]
        for t in nasty
    ]
    assert got == want

    # 2. comoments stay integer-exact for |y| > 2^53 with nulls present
    big = 2**53 + 1
    tbl = pa.table(
        {
            "k": ["a", "a"],
            "x": pa.array([1, 1], pa.int64()),
            "y": pa.array([big, None], pa.int64()),
        }
    )
    row = grouped_comoments(ray.data.from_arrow(tbl), "k", "x", "y").take_all()[0]
    assert row["sum_y"] == big and row["n_xy"] == 1

    # 3. checksum skips NULL text like SQL sum (but counts the row)
    tbl = pa.table({"text": pa.array(["a", None, "b"], pa.string())})
    c = table_checksum(ray.data.from_arrow(tbl), "text").take_all()[0]
    w = con.execute(
        "SELECT CAST(count(*) AS BIGINT), "
        "CAST(sum(CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)) % 1099511627776 AS BIGINT) "
        "FROM (SELECT unnest(?) AS t)",
        [["a", None, "b"]],
    ).fetchone()
    assert (c["n_rows"], c["checksum"]) == (w[0], w[1])

    # 4. empty-input guards return empties, not crashes
    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "n_chars": pa.array([], pa.int64())})
    )
    assert math.isnan(exact_quantile_disc(empty, "n_chars", 0.95))
    assert filter_above_quantile(empty, "n_chars", 0.95).take_all() == []
    assert approx_quantiles_by(empty, "doc_id", "n_chars", [0.5]).take_all() == []
    assert global_percent_rank(empty, "n_chars").take_all() == []


def test_bigram_lm_edges(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.lm import (
        bigram_familiarity_scores,
        top_vocab,
        train_bigram_counts,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": ["a b a b", "b a", "single", None, "  a   b  "],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    counts = {r["token"]: r["n"] for r in train_bigram_counts(ds).take_all()}
    # pairs never cross documents; whitespace runs don't create empties
    assert counts == {"a b": 3, "b a": 2}
    vocab = top_vocab(train_bigram_counts(ds), v=1)  # only "a b" in vocab
    out = {r["doc_id"]: r for r in bigram_familiarity_scores(ds, vocab).take_all()}
    assert set(out) == {1, 2, 5}  # <2 tokens → no row
    assert out[1]["n_bigrams"] == 3 and out[1]["n_oov"] == 1 and out[1]["bigram_mass"] == 6
    assert out[2]["n_bigrams"] == 1 and out[2]["n_oov"] == 1 and out[2]["bigram_mass"] == 0
    assert out[5]["n_bigrams"] == 1 and out[5]["n_oov"] == 0 and out[5]["bigram_mass"] == 3


def test_grouped_minmax_normalize_degenerate_group(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.stats import grouped_minmax_normalize

    tbl = pa.table(
        {
            "k": ["a", "a", "a", "b", "b"],
            "v": pa.array([10.0, 20.0, 30.0, 7.0, 7.0], pa.float64()),
        }
    )
    out = {
        (r["k"], r["v"]): r["scaled"]
        for r in grouped_minmax_normalize(ray.data.from_arrow(tbl).repartition(2), "k", "v").take_all()
    }
    assert out[("a", 10.0)] == 0.0 and out[("a", 30.0)] == 1.0 and out[("a", 20.0)] == 0.5
    assert out[("b", 7.0)] == 0.0  # min == max group scales to 0


def test_trigram_lm_edges(ray_session):
    import ray.data

    from pdf_table_extractor_ray.stages.lm import (
        top_vocab,
        train_trigram_counts,
        trigram_familiarity_scores,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": ["a b c a b c", "c a b", "two only", None, "  a  b   c  "],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    counts = {r["token"]: r["n"] for r in train_trigram_counts(ds).take_all()}
    # windows never cross documents; whitespace runs don't create empties
    assert counts == {"a b c": 3, "b c a": 1, "c a b": 2}
    vocab = top_vocab(train_trigram_counts(ds), v=1)  # only "a b c"
    out = {r["doc_id"]: r for r in trigram_familiarity_scores(ds, vocab).take_all()}
    assert set(out) == {1, 2, 5}  # <3 tokens -> no row
    assert out[1]["n_trigrams"] == 4 and out[1]["n_oov"] == 2 and out[1]["trigram_mass"] == 6
    assert out[2]["n_trigrams"] == 1 and out[2]["n_oov"] == 1 and out[2]["trigram_mass"] == 0
    assert out[5]["n_trigrams"] == 1 and out[5]["n_oov"] == 0 and out[5]["trigram_mass"] == 3
