"""Job entry point for ``ray job submit`` (north rule's launch mode).

    ray job submit -- python -m pdf_table_extractor_ray.job \
        --input /data/pages --output /data/extracted \
        [--batch-size 32] [--wave-size 256] [--no-resume]

Owns a Ray session only when run standalone (guarded init); resumable
by default — rerunning after a failure skips finished shards.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description="Run the extraction pipeline over a pages corpus")
    ap.add_argument("--input", required=True, help="parquet file or directory of shards")
    ap.add_argument("--output", required=True, help="output directory (partitioned parquet)")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--wave-size", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None, help="only for standalone local runs")
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from pdf_table_extractor_ray.pipelines.extract import run_extraction

    kw = {}
    if args.batch_size:
        kw["batch_size"] = args.batch_size
    if args.wave_size:
        kw["wave_size"] = args.wave_size
    totals = run_extraction(args.input, args.output, resume=not args.no_resume, **kw)
    print(json.dumps(totals))
    if owns_session:
        ray.shutdown()


if __name__ == "__main__":
    main()
