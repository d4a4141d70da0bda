"""End-to-end parity: the Ray pipeline's output must be byte-identical
per url to the committed golden fixtures (north rule correctness gate),
and the partitioned sink must resume idempotently."""

import os

import pyarrow.parquet as pq
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
PAGES = os.path.join(GOLDEN_DIR, "golden_pages.parquet")
GOLDEN = os.path.join(GOLDEN_DIR, "golden_extracted.parquet")


@pytest.fixture(scope="module")
def sharded_pages(ray_session, tmp_path_factory):
    """The golden corpus re-sharded into several input files, so the
    shard-aligned partitioning/resume paths are exercised."""
    import ray.data

    path = str(tmp_path_factory.mktemp("pages_sharded"))
    ray.data.read_parquet(PAGES).repartition(8).write_parquet(path)
    return path


@pytest.fixture(scope="module")
def extracted(sharded_pages, tmp_path_factory):
    from pdf_table_extractor_ray.pipelines.extract import run_extraction

    out = str(tmp_path_factory.mktemp("extract_out"))
    totals = run_extraction(sharded_pages, out, resume=False)
    return out, totals


def test_byte_identical_extracted_text(extracted):
    out, _ = extracted
    import ray.data

    got = (
        ray.data.read_parquet(out)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = pq.read_table(GOLDEN).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(got) == len(want)
    assert list(got["url"]) == list(want["url"])
    # THE parity assertion: bytes of extracted text per url
    mism = got["extracted_text"].values != want["extracted_text"].values
    assert not mism.any(), f"{mism.sum()} documents differ, e.g. {got['url'][mism].iloc[0]}"
    assert (got["status"].values == want["status"].values).all()
    assert (got["strategy"].values == want["strategy"].values).all()
    assert (got["n_records"].values == want["n_records"].values).all()


def test_spans_and_records_match(extracted):
    out, _ = extracted
    import ray.data

    got = ray.data.read_parquet(out).to_pandas().sort_values("url").reset_index(drop=True)
    want = pq.read_table(GOLDEN).to_pandas().sort_values("url").reset_index(drop=True)
    for i in range(len(got)):
        assert list(got["spans"][i]) == list(want["spans"][i]), got["url"][i]
        g, w = got["records"][i], want["records"][i]
        assert len(g) == len(w)
        for a, b in zip(g, w):
            assert a == b, got["url"][i]


def test_lineage_written(extracted):
    out, totals = extracted
    from pdf_table_extractor_ray.pipelines.extract import finished_partitions

    fins = finished_partitions(out)
    assert len(fins) == totals["partitions"]
    assert totals["docs"] == 240
    assert totals["errors"] > 0  # malformed family rides in-band


def test_resume_skips_finished(extracted, sharded_pages):
    out, _ = extracted
    from pdf_table_extractor_ray.pipelines.extract import run_extraction

    res = run_extraction(sharded_pages, out, resume=True)
    # every shard already has a lineage record → nothing to redo
    assert res.get("skipped") is True


def test_resume_redoes_missing_partition(sharded_pages, tmp_path):
    import shutil

    from pdf_table_extractor_ray.pipelines.extract import (
        finished_partitions,
        lineage_path,
        run_extraction,
    )

    out = str(tmp_path / "out")
    run_extraction(sharded_pages, out, resume=False)
    fins = sorted(finished_partitions(out))
    n_parts = len(fins)
    assert n_parts >= 2
    # simulate a crash: one shard lost its lineage record + data
    victim = fins[0]
    os.remove(lineage_path(out, victim))
    shutil.rmtree(os.path.join(out, f"part_id={victim}"))
    assert victim not in finished_partitions(out)

    totals = run_extraction(sharded_pages, out, resume=True)
    assert victim not in totals["resumed_skipping"]
    assert len(totals["resumed_skipping"]) == n_parts - 1
    # full corpus back, byte-identical to golden
    import ray.data

    got = ray.data.read_parquet(out).to_pandas().sort_values("url").reset_index(drop=True)
    want = pq.read_table(GOLDEN).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["extracted_text"].values == want["extracted_text"].values).all()


def test_explode_records(extracted):
    out, totals = extracted
    import ray.data

    from pdf_table_extractor_ray.pipelines.extract import explode_records

    flat = explode_records(ray.data.read_parquet(out))
    assert flat.count() == totals["records"]
    schema = flat.schema()
    assert schema.names == ["url", "record_idx", "date", "description", "amount", "doc"]


def test_csv_sink(extracted, tmp_path):
    import csv
    import glob

    import ray.data

    from pdf_table_extractor_ray.pipelines.extract import explode_records
    from pdf_table_extractor_ray.pipelines.sinks import write_records_csv

    out, totals = extracted
    flat = explode_records(ray.data.read_parquet(out))
    csv_dir = str(tmp_path / "csv")
    write_records_csv(flat, csv_dir)
    files = glob.glob(csv_dir + "/*.csv")
    assert files
    n = 0
    for f in files:
        with open(f, encoding="utf-8-sig") as fh:
            rows = list(csv.reader(fh, delimiter=";"))
        assert rows[0][:3] == ["url", "record_idx", "date"]
        n += len(rows) - 1
    assert n == totals["records"]


def test_routed_pipeline_matches_flagship(ray_session):
    """Heterogeneous-pool routing (heavy actor pool / light task pool)
    must produce byte-identical rows per url to the single-pool
    flagship path."""
    import ray.data

    from pdf_table_extractor_ray.fixtures import docs_to_table
    from pdf_table_extractor_ray.pipelines.extract import build_extracted_dataset
    from pdf_table_extractor_ray.pipelines.routed import build_extracted_dataset_routed
    import pyarrow.parquet as pq
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(docs_to_table(list(range(96))), os.path.join(d, "pages.parquet"))

        flagship = {
            r["url"]: (r["strategy"], r["extracted_text"], r["status"])
            for r in build_extracted_dataset(
                __import__("ray").data.read_parquet(d, include_paths=True),
                concurrency=(2, 2),
            ).take_all()
        }
        routed = {
            r["url"]: (r["strategy"], r["extracted_text"], r["status"])
            for r in build_extracted_dataset_routed(d, concurrency=(2, 2)).take_all()
        }
        assert routed == flagship
        assert len(routed) == 96


def test_xlsx_sink(extracted, tmp_path):
    """K2/K3: records → one workbook per partition; reread via the
    stdlib oracle and check counts + cell values survive."""
    import ray.data

    from pdf_table_extractor_ray.pipelines.extract import explode_records
    from pdf_table_extractor_ray.pipelines.sinks import read_xlsx_file, write_records_xlsx

    out, totals = extracted
    flat = explode_records(ray.data.read_parquet(out))
    xlsx_dir = str(tmp_path / "xlsx")
    manifest = write_records_xlsx(flat, xlsx_dir)
    assert manifest
    n = 0
    for path, rows_declared in manifest:
        header, rows = read_xlsx_file(path)
        assert header[:3] == ["url", "record_idx", "date"]
        assert len(rows) == rows_declared
        n += len(rows)
    assert n == totals["records"]


def test_xlsx_file_roundtrip(tmp_path):
    from pdf_table_extractor_ray.pipelines.sinks import read_xlsx_file, write_xlsx_file

    p = str(tmp_path / "t.xlsx")
    write_xlsx_file(
        p,
        ["a", "b", "c"],
        [["x<&>", 1.5, None], ["çãé", -2, "ok"]],
        sheet_name="records",
    )
    header, rows = read_xlsx_file(p)
    assert header == ["a", "b", "c"]
    assert rows[0] == ["x<&>", 1.5, None]
    assert rows[1][0] == "çãé" and rows[1][1] == -2.0 and rows[1][2] == "ok"


def test_zero_row_shard_finishes(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from pdf_table_extractor_ray.fixtures import PAGES_SCHEMA, docs_to_table
    from pdf_table_extractor_ray.pipelines.extract import run_extraction

    src = tmp_path / "src"
    src.mkdir()
    pq_.write_table(docs_to_table(list(range(16))), str(src / "a.parquet"))
    # a shard with zero rows must still be marked finished
    pq_.write_table(docs_to_table([]).cast(PAGES_SCHEMA), str(src / "empty.parquet"))
    out = str(tmp_path / "out")
    t1 = run_extraction(str(src), out, resume=False)
    assert t1["partitions"] == 2 and t1["docs"] == 16
    t2 = run_extraction(str(src), out, resume=True)
    assert t2.get("skipped") is True


def test_skewed_shard_layout(ray_session, tmp_path):
    """Adversarial skew: every large document packed into ONE shard —
    the job must still stream to completion with in-band faults only."""
    import pyarrow.parquet as pq_

    from pdf_table_extractor_ray.fixtures import generate_doc, docs_to_table
    from pdf_table_extractor_ray.pipelines.extract import run_extraction

    big_ids, small_ids = [], []
    i = 0
    while len(big_ids) < 4 and i < 3000:
        d = generate_doc(i)
        (big_ids if d["size_cls"] == "large" else small_ids).append(i)
        i += 1
    src = tmp_path / "src"
    src.mkdir()
    pq_.write_table(docs_to_table(big_ids[:4]), str(src / "all_big.parquet"))
    pq_.write_table(docs_to_table(small_ids[:40]), str(src / "small.parquet"))
    out = str(tmp_path / "out")
    totals = run_extraction(str(src), out, resume=False)
    assert totals["docs"] == 44
    assert totals["partitions"] == 2


def test_detect_only_stage(ray_session):
    import pyarrow as pa

    from pdf_table_extractor_ray.fixtures import docs_to_table
    from pdf_table_extractor_ray.stages.warm_parser import DetectOnly

    t = docs_to_table(list(range(32)))
    out = DetectOnly()(t.select(["url", "html", "text", "family"]))
    strategies = out.column("strategy").to_pylist()
    families = out.column("family").to_pylist()
    for fam, key in zip(families, strategies):
        if fam != "malformed":
            assert key == fam


def test_distributed_generation_matches_local(ray_session, tmp_path):
    """The Ray fixture build (range -> map_batches -> write) must yield
    exactly the rows of the pure local generator, any parallelism."""
    import pyarrow.parquet as pq_

    from pdf_table_extractor_ray.fixtures import docs_to_table, write_pages_parquet

    out = str(tmp_path / "gen")
    write_pages_parquet(out, 96, parallelism=7)
    import ray.data

    got = ray.data.read_parquet(out).to_pandas().sort_values("url").reset_index(drop=True)
    want = docs_to_table(list(range(96))).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(got) == 96
    assert (got["url"].values == want["url"].values).all()
    assert (got["text"].values == want["text"].values).all()
    assert all(bytes(a) == bytes(b) for a, b in zip(got["html"], want["html"]))


def test_incremental_reextracts_changed_shard(sharded_pages, tmp_path):
    """Delta detection: after one input shard is rewritten, a resumed
    run re-extracts exactly that shard (and nothing else), and the
    incremental output is identical to a from-scratch run over the new
    input; a deleted input shard's output is dropped."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq2
    import ray.data

    from pdf_table_extractor_ray.pipelines.extract import (
        run_extraction,
        shard_part_id,
    )

    src = str(tmp_path / "pages")
    shutil.copytree(sharded_pages, src)
    out = str(tmp_path / "out")
    run_extraction(src, out, resume=False)

    # rewrite one shard with a modified document text
    victim_file = sorted(
        f for f in os.listdir(src) if f.endswith(".parquet")
    )[0]
    victim_pid = shard_part_id(victim_file)
    t = pq2.read_table(os.path.join(src, victim_file))
    texts = t.column("text").to_pylist()
    texts[0] = (texts[0] or "") + "\nDELTA MARKER LINE"
    t = t.set_column(t.schema.get_field_index("text"), "text", pa.array(texts))
    pq2.write_table(t, os.path.join(src, victim_file))

    res = run_extraction(src, out, resume=True)
    assert res["re_extracted"] == [victim_pid]
    assert res["dropped_stale"] == []
    assert victim_pid not in res["resumed_skipping"]
    assert len(res["resumed_skipping"]) >= 1

    # incremental output == from-scratch output over the NEW input
    fresh = str(tmp_path / "fresh")
    run_extraction(src, fresh, resume=False)
    got = (
        ray.data.read_parquet(out).to_pandas().sort_values("url").reset_index(drop=True)
    )
    want = (
        ray.data.read_parquet(fresh)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["extracted_text"].values == want["extracted_text"].values).all()

    # unchanged re-run: everything skipped, no churn
    res2 = run_extraction(src, out, resume=True)
    assert res2.get("skipped") is True and res2["re_extracted"] == []

    # delete an input shard → its output partition is dropped
    gone_file = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))[1]
    gone_pid = shard_part_id(gone_file)
    os.remove(os.path.join(src, gone_file))
    res3 = run_extraction(src, out, resume=True)
    assert gone_pid in res3["dropped_stale"]
    assert not os.path.isdir(os.path.join(out, f"part_id={gone_pid}"))
    n_now = ray.data.read_parquet(out).count()
    n_expect = len(want) - pq2.read_table(os.path.join(sharded_pages, gone_file)).num_rows
    assert n_now == n_expect
