"""Benchmark harness (driver-run per round; also the local feedback loop).

Default: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS,
default 32) and prints ONE JSON line.

--scaling: runs the flagship extraction twice in fresh subprocesses
(num_cpus=8 and num_cpus=32) on the same input and reports both
throughputs + scaling efficiency (the sandbox proxy for the N→4N
cluster criterion, BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_OUT = "/tmp/pdfx_bench_out"


def _quiet_empty_bundle_warnings():
    """Ray's hash aggregate emits empty-SCHEMA bundles for empty hash
    partitions, and the streaming executor logs a scary 'RefBundle with
    a different schema … new schema: .' warning for each (benign —
    verified: the divergent schema is always the empty one). Drop ONLY
    that case; a real schema divergence still warns."""
    import logging

    class _DropEmptyBundleSchemaWarning(logging.Filter):
        def filter(self, record):
            msg = record.getMessage()
            return not (
                "RefBundle with a different schema" in msg and "new schema: ." in msg
            )

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_DropEmptyBundleSchemaWarning())


def _init_ray(num_cpus: int):
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    _quiet_empty_bundle_warnings()
    return ray


def _fixture_path(sf_dir: str) -> str:
    import __ray_entry__ as entrymod

    return entrymod._fixture_pages(sf_dir)


def _bench_extract(sf_dir: str, num_cpus: int, warmup: bool = True) -> dict:
    """Flagship extraction job: read → keys → actor-pool extract →
    partitioned parquet sink + lineage. Returns timing + docs/s."""
    from pdf_table_extractor_ray.pipelines.extract import run_extraction

    pages = os.environ.get("PDFX_BENCH_INPUT") or _fixture_path(sf_dir)
    if warmup:  # untimed warm pass per BASELINE.md: same pool shape as
        # the timed run, so worker processes + imports are resident
        from pdf_table_extractor_ray.pipelines.extract import build_extracted_dataset, read_pages

        small = read_pages(pages, include_paths=True).limit(256)
        build_extracted_dataset(small, batch_size=32).count()

    # best-of-N timed repeats: the sandbox VM's deliverable throughput
    # drifts ±30% across minutes (external load); min wall time is the
    # standard noise-robust estimator and both scaling levels use it
    repeats = int(os.environ.get("PDFX_BENCH_REPEATS", "2"))
    best = None
    totals = None
    for _ in range(max(1, repeats)):
        shutil.rmtree(BENCH_OUT, ignore_errors=True)
        t0 = time.time()
        # engine defaults: fixed (n,n) pool at fractional CPU/actor —
        # proportional across the two scaling levels by construction
        totals = run_extraction(
            pages,
            BENCH_OUT,
            resume=False,
            batch_size=32,
            wave_size=1_000_000,  # single wave: wave checkpoints are a
            # resumability knob, not a throughput feature; benching the
            # per-wave barrier would measure checkpoint cadence
        )
        elapsed = time.time() - t0
        best = elapsed if best is None else min(best, elapsed)
    return {
        "seconds": best,
        "docs": totals["docs"],
        "records": totals["records"],
        "docs_per_sec": totals["docs"] / best,
    }


def _bench_queries(sf_dir: str) -> dict:
    """Secondary pipelines: wide aggregation, dedup, knn."""
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in (
        "lineitem_pricing",
        "exact_dedup_docs",
        "minhash_pairs",
        "knn_top5",
        "token_counts",
        "profit_by_nation_year",  # fact-fact hash-shuffle join
        "ship_window_value",  # bucketed interval join, weighted stab sums
        "chunk_dedup_docs",  # corpus chunk dedup + text reassembly
        "tfidf_top3",  # df broadcast + map-only float scoring
        "late_events",  # watermark tagging: bucket shuffle + composite cummax
        "value_comoments_by_type",  # one-pass grouped co-moments (corr/cov base)
        "dup_span_stats",  # ExactSubstr-style duplicated-span marking
        "trade_volume_pairs",  # r4: 4-table multi-fact join wave (2 shuffles)
        "session_conversion",  # r4: sessionize + within-session funnel
        "dsir_sample",  # r4: DSIR hashed-ngram models + Gumbel top-k select
        "media_dedup_keep",  # r4: image decode+dHash actors, Hamming bands, CC drop
        "encrypted_pdf_roundtrip",  # r5: PDF write+RC4/AES encrypt+decrypt+parse+extract
    ):
        t0 = time.time()
        res = qs[name](sf_dir)
        # consume the stream without materializing to the driver
        n = res.count() if hasattr(res, "count") else len(res)
        out[name] = round(time.time() - t0, 3)
        out[f"{name}_rows"] = n
    return out


def run_suite(num_cpus: int, scaling_child: bool = False) -> dict:
    _init_ray(num_cpus)
    sf = SF_DIR
    t_start = time.time()
    extract = _bench_extract(sf, num_cpus)
    queries = {"extract": round(extract["seconds"], 3)}
    if not scaling_child:
        queries.update(_bench_queries(sf))
    total = time.time() - t_start
    result = {
        "metric": "extracted_docs_per_sec",
        "value": round(extract["docs_per_sec"], 2),
        "unit": "docs/sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "extract_docs": extract["docs"],
        "extract_records": extract["records"],
        "suite_seconds": round(total, 2),
    }
    import ray

    ray.shutdown()
    return result


SCALING_N = 61440  # 16× the sf0.1 corpus: compute must dominate the
# fixed ramp/tail (~2-3 s) or the 32-CPU run is floor-bound and the
# efficiency number measures startup, not the engine


def _scaling_corpus() -> str:
    from pdf_table_extractor_ray.fixtures import FIXTURE_VERSION, write_pages_parquet

    path = f"/tmp/pdfx_fixtures/v{FIXTURE_VERSION}_n{SCALING_N}"
    marker = os.path.join(path, "_COMPLETE")
    if not os.path.exists(marker):
        write_pages_parquet(path, SCALING_N, parallelism=1024)
        with open(marker, "w") as f:
            f.write("ok")
    return path


SCALING_CPUS = (
    int(os.environ.get("PDFX_SCALING_N_CPUS", "4")),
    int(os.environ.get("PDFX_SCALING_4N_CPUS", "16")),
)


def _burn(_):
    x = 0
    deadline = time.time() + 2.0
    c = 0
    while time.time() < deadline:
        for i in range(10000):
            x += i * i
        c += 1
    return c


def _hardware_speedup(n_lo: int, n_hi: int) -> float:
    """Raw CPU scaling of THIS machine between the two process counts
    (pure-python busy loops). The sandbox VM does not deliver ideal
    per-core throughput as concurrency grows (frequency/mem-bw), so
    pipeline efficiency is reported raw AND hardware-normalized."""
    import multiprocessing as mp

    speedups = []
    for _ in range(2):
        rates = {}
        for procs in (n_lo, n_hi):
            with mp.Pool(procs) as p:
                rates[procs] = sum(p.map(_burn, range(procs)))
        speedups.append(rates[n_hi] / rates[n_lo])
    # min of repeats: a load spike during the low-count pass inflates
    # the ratio; the conservative estimate never flatters the
    # normalized efficiency
    return min(speedups)


def run_scaling() -> dict:
    """Same job, same input, fresh processes at N and 4N CPUs."""
    _init_ray(NUM_CPUS)
    pages = _scaling_corpus()  # mint once so both children reuse it
    import ray

    ray.shutdown()

    n_lo, n_hi = SCALING_CPUS
    results = {}
    for cpus in (n_lo, n_hi):
        # taskset: physically confine the whole Ray process tree (raylet,
        # plasma, workers, driver) to exactly `cpus` cores — without it
        # the "N-CPU" run's auxiliaries borrow the other cores of the
        # 32-core host nondeterministically, which both flatters and
        # destabilizes the small run. This is the honest single-box
        # stand-in for an N-core NODE.
        proc = subprocess.run(
            [
                "taskset",
                "-c",
                f"0-{cpus - 1}",
                sys.executable,
                os.path.abspath(__file__),
                "--child",
                str(cpus),
            ],
            capture_output=True,
            text=True,
            env={**os.environ, "RAY_GRAFT_CPUS": str(cpus), "PDFX_BENCH_INPUT": pages},
            timeout=3600,
        )
        last = proc.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(last)
    r_lo, r_hi = results[n_lo], results[n_hi]
    speedup = r_hi["value"] / r_lo["value"]
    efficiency = speedup / (n_hi / n_lo)
    hw_speedup = _hardware_speedup(n_lo, n_hi)
    return {
        "metric": f"scaling_efficiency_{n_lo}_to_{n_hi}",
        "value": round(efficiency, 4),
        "unit": "ratio",
        "queries": {
            f"extract_{n_lo}cpu": r_lo["queries"]["extract"],
            f"extract_{n_hi}cpu": r_hi["queries"]["extract"],
        },
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        f"docs_per_sec_{n_lo}": r_lo["value"],
        f"docs_per_sec_{n_hi}": r_hi["value"],
        "speedup": round(speedup, 3),
        "hardware_speedup_same_ratio": round(hw_speedup, 3),
        "efficiency_vs_hardware": round(speedup / hw_speedup, 4),
        "input": pages,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--child", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.child is not None:
        print(json.dumps(run_suite(args.child, scaling_child=True)))
        return
    if args.scaling:
        print(json.dumps(run_scaling()))
        return
    print(json.dumps(run_suite(NUM_CPUS)))


if __name__ == "__main__":
    main()
