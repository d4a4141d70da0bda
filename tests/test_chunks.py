"""Chunk-level corpus ops: chunker, corpus chunk-dedup, Gopher
repetition stats, benchmark-contamination screen (stages/chunks.py)."""

import numpy as np
import pyarrow as pa
import pytest

from pdf_table_extractor_ray.stages.chunks import (
    CHUNK_W,
    benchmark_chunk_set,
    chunk_batch,
    chunk_dedup,
    contamination_batch,
    gopher_stats_batch,
)


def _brute_chunks(text: str, width: int = CHUNK_W):
    words = text.split()
    return [
        " ".join(words[k * width : (k + 1) * width]) for k in range(len(words) // width)
    ]


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi".split()


def _mk_text(rng, n_words):
    return " ".join(rng.choice(WORDS) for _ in range(n_words))


class TestChunker:
    def test_matches_brute_force(self):
        rng = np.random.default_rng(11)
        texts = [_mk_text(rng, n) for n in (0, 3, 10, 17, 25, 40)]
        batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
        got = chunk_batch(batch).to_pydict()
        want = []
        for d, t in enumerate(texts):
            for k, ch in enumerate(_brute_chunks(t)):
                want.append((d, k, ch))
        assert list(zip(got["doc_id"], got["chunk_idx"], got["chunk"])) == want

    def test_whitespace_and_null_robust(self):
        batch = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    ["  a b\tc d e f g h i j  ", None, "one two"], pa.string()
                ),
            }
        )
        got = chunk_batch(batch)
        assert got.num_rows == 1
        assert got.column("chunk")[0].as_py() == "a b c d e f g h i j"

    def test_custom_width(self):
        batch = pa.table({"doc_id": pa.array([7], pa.int64()), "text": ["a b c d e"]})
        got = chunk_batch(batch, width=2)
        assert got.column("chunk").to_pylist() == ["a b", "c d"]


class TestChunkDedup:
    def test_corpus_dedup_matches_brute_force(self, ray_session):
        import ray.data

        rng = np.random.default_rng(5)
        texts = [_mk_text(rng, int(n)) for n in rng.integers(8, 60, 40)]
        # plant cross-doc duplicate chunks: doc i repeats doc 0's first chunk
        base = _brute_chunks(texts[0])[0]
        for i in (3, 9, 21):
            texts[i] = base + " " + texts[i]
        batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
        ds = ray.data.from_arrow(batch).repartition(5)
        got = {r["doc_id"]: (r["text_dedup"], r["n_kept"]) for r in chunk_dedup(ds, num_buckets=7).take_all()}

        seen, want = set(), {}
        for d, t in enumerate(texts):
            kept = []
            for ch in _brute_chunks(t):
                if ch not in seen:
                    seen.add(ch)
                    kept.append(ch)
            if kept:
                want[d] = (" ".join(kept), len(kept))
        assert got == want

    def test_within_doc_duplicates_collapse(self, ray_session):
        import ray.data

        ch = " ".join(f"w{i}" for i in range(CHUNK_W))
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([4], pa.int64()), "text": [ch + " " + ch]})
        )
        out = chunk_dedup(ds).take_all()
        assert out == [{"doc_id": 4, "text_dedup": ch, "n_kept": 1}]


class TestGopherStats:
    def test_brute_force_parity(self):
        rng = np.random.default_rng(17)
        texts = [_mk_text(rng, int(n)) for n in rng.integers(1, 80, 50)]
        texts += ["solo", "rep rep rep rep", "tie tie ab ab"]  # tie → smaller word wins
        batch = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
        got = gopher_stats_batch(batch).to_pydict()
        for row in range(len(got["doc_id"])):
            d = got["doc_id"][row]
            words = texts[d].split()
            n = len(words)
            distinct = sorted(set(words))
            counts = {w: words.count(w) for w in distinct}
            # tie-break: max count, then lexicographically smallest
            best = max(counts.values())
            top_w = min(w for w in distinct if counts[w] == best)
            bigrams = [(a, b) for a, b in zip(words, words[1:])]
            assert got["n_words"][row] == n
            assert got["n_distinct_words"][row] == len(distinct)
            assert got["dup_word_frac"][row] == pytest.approx((n - len(distinct)) / n, abs=0)
            total_chars = sum(len(w) for w in words)
            assert got["top_word_char_frac"][row] == pytest.approx(
                counts[top_w] * len(top_w) / total_chars, abs=0
            )
            nb = len(bigrams)
            want_bi = 0.0 if nb == 0 else (nb - len(set(bigrams))) / nb
            assert got["dup_bigram_frac"][row] == pytest.approx(want_bi, abs=0)

    def test_empty_docs_absent(self):
        batch = pa.table(
            {"doc_id": pa.array([0, 1], pa.int64()), "text": pa.array(["", "a b"], pa.string())}
        )
        got = gopher_stats_batch(batch)
        assert got.column("doc_id").to_pylist() == [1]


class TestContamination:
    def test_planted_overlap(self, ray_session):
        import ray.data

        bench_chunk = " ".join(f"b{i}" for i in range(CHUNK_W))
        clean = " ".join(f"c{i}" for i in range(CHUNK_W))
        texts = [bench_chunk, bench_chunk + " " + clean, clean, "tiny"]
        bench = benchmark_chunk_set(
            ray.data.from_arrow(
                pa.table({"doc_id": pa.array([0], pa.int64()), "text": [bench_chunk]})
            )
        )
        got = {
            r["doc_id"]: (r["n_chunks"], r["n_contaminated"])
            for b in [contamination_batch(pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": texts}), bench)]
            for r in b.to_pylist()
        }
        assert got == {0: (1, 1), 1: (2, 1), 2: (1, 0)}


class TestCorpusPrepV2:
    def test_composite_matches_brute_force(self, ray_session):
        import ray.data

        from pdf_table_extractor_ray.pipelines.corpus_prep import (
            corpus_v2_totals,
            prepare_corpus_v2,
        )

        W = CHUNK_W
        bench_chunk = " ".join(f"e{i}" for i in range(W))
        fresh = lambda tag: " ".join(f"{tag}{i}" for i in range(W))  # noqa: E731
        texts = {
            0: bench_chunk + " " + fresh("z"),      # benchmark doc (id%41==0): dropped
            1: fresh("a") + " " + fresh("b"),        # clean survivor, 2 chunks
            2: "rep " * 30,                          # dup_word_frac 29/30 > 0.95? = 0.966 → dropped
            3: bench_chunk + " " + bench_chunk,      # 100% contaminated → dropped
            4: fresh("a") + " " + fresh("c"),        # chunk 'a' deduped vs doc 1
            5: "tiny doc",                           # no chunks → absent after dedup
        }
        tbl = pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": [texts[k] for k in sorted(texts)],
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(3)
        out = prepare_corpus_v2(ds).take_all()
        got = {r["doc_id"]: (r["text_dedup"], r["n_kept"]) for r in out}
        assert got == {
            1: (fresh("a") + " " + fresh("b"), 2),
            4: (fresh("c"), 1),
        }
        totals = corpus_v2_totals(prepare_corpus_v2(ds)).take_all()
        assert totals == [{"n_docs": 2, "total_chunks_kept": 3}]


class TestContaminationJoin:
    """The no-broadcast decontamination plan must equal the broadcast
    screen row-for-row (shared oracle contract)."""

    def test_join_matches_broadcast_plan(self, ray_session):
        import random

        import ray
        import ray.data

        from pdf_table_extractor_ray.stages.chunks import (
            benchmark_chunk_set,
            contamination_batch,
            contamination_join,
        )

        rng = random.Random(13)
        words = [f"w{i}" for i in range(40)]
        texts = [" ".join(rng.choice(words) for _ in range(rng.randrange(0, 35))) for _ in range(120)]
        tbl = pa.table({"doc_id": pa.array(range(120), pa.int64()), "text": texts})
        ds = ray.data.from_arrow(tbl).repartition(5)

        def is_bench(b):
            return b.filter(pa.array(b.column("doc_id").to_numpy() % 7 == 0))

        bench_docs = ds.map_batches(is_bench, batch_format="pyarrow", zero_copy_batch=True)
        got = {
            r["doc_id"]: (r["n_chunks"], r["n_contaminated"])
            for r in contamination_join(ds, bench_docs).take_all()
        }
        bench = benchmark_chunk_set(bench_docs)
        handle = ray.put(bench)
        want = {
            r["doc_id"]: (r["n_chunks"], r["n_contaminated"])
            for r in ds.map_batches(
                lambda b: contamination_batch(b, ray.get(handle)),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).take_all()
        }
        assert got == want
        assert any(v[1] > 0 for v in got.values())  # something was contaminated
        assert all(v[0] >= v[1] for v in got.values())

    def test_empty_bench_side(self, ray_session):
        import ray.data

        from pdf_table_extractor_ray.stages.chunks import contamination_join

        tbl = pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()),
             "text": [" ".join(f"a{i}" for i in range(12)), "short"]}
        )
        ds = ray.data.from_arrow(tbl)
        empty = ds.filter(lambda r: False)
        out = {r["doc_id"]: r for r in contamination_join(ds, empty).take_all()}
        assert set(out) == {1}  # doc 2 has no 10-token chunk
        assert out[1]["n_chunks"] == 1 and out[1]["n_contaminated"] == 0


class TestTumblingWindowStats:
    def test_matches_brute_force(self, ray_session):
        import random

        import ray.data

        from pdf_table_extractor_ray.stages.sessions import tumbling_window_stats

        rng = random.Random(3)
        W = 3_600_000_000
        ts = [rng.randrange(0, 6 * W) for _ in range(500)]
        uid = [rng.randrange(0, 25) for _ in range(500)]
        tbl = pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(uid, pa.int64()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(7)
        got = {
            r["window_start_us"]: (r["n_events"], r["n_users"])
            for r in tumbling_window_stats(ds).take_all()
        }
        want = {}
        for t, u in zip(ts, uid):
            w = (t // W) * W
            ev, us = want.get(w, (0, set()))
            us = us | {u}
            want[w] = (ev + 1, us)
        assert got == {w: (ev, len(us)) for w, (ev, us) in want.items()}


class TestSlidingWindowDistinct:
    def test_matches_brute_force_any_layout(self, ray_session):
        """Trailing-7-slide distinct == per-day brute force, identical
        across block layouts (the Min-offset fold must be layout-
        invariant), and no phantom windows past the last data day."""
        import random

        import ray.data

        from pdf_table_extractor_ray.stages.sessions import sliding_window_distinct

        rng = random.Random(11)
        D = 86_400_000_000
        ts = [rng.randrange(0, 10 * D) for _ in range(400)]
        uid = [rng.randrange(0, 20) for _ in range(400)]
        # punch a hole: no events on day 4 → day 4 must have NO row
        ts = [t for t in ts if t // D != 4]
        uid = uid[: len(ts)]
        tbl = pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(uid, pa.int64()),
            }
        )
        days = sorted({t // D for t in ts})
        want = {}
        for d in days:
            want[d * D] = len(
                {u for t, u in zip(ts, uid) if d - 6 <= t // D <= d}
            )
        for parts in (1, 7):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            got = {
                r["window_day_us"]: r["n_users"]
                for r in sliding_window_distinct(ds).take_all()
            }
            assert got == want


def test_window_hll_tracks_exact(ray_session):
    """The HLL windowed-distinct must track the exact twin within HLL
    error (~2% at p=12; assert 10% slack) on every window."""
    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    exact = {
        r["window_start_us"]: r["n_users"]
        for r in entrymod.queries()["window_active_users"](sf).take_all()
    }
    approx = {
        r["window_start_us"]: r["approx_distinct"]
        for r in entrymod.queries()["window_active_users_approx"](sf).take_all()
    }
    assert set(approx) == set(exact)
    for w, n in exact.items():
        assert abs(approx[w] - n) <= max(2, 0.1 * n), (w, n, approx[w])
