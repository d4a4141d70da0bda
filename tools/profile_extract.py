"""Profile the flagship extract pipeline (VERDICT r2 item 8).

Two views:
1. Ray per-stage split (`ds.stats()`): read / shard-keys / extract
   wall+CPU, exported as compact JSON.
2. Single-process per-family CPU split over a deterministic fixture
   sample — which strategy dominates extraction compute.

Usage: python tools/profile_extract.py [sf_dir] [n_sample]
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def per_family_split(n_sample: int = 1024):
    from collections import defaultdict

    from pdf_table_extractor_ray.fixtures import generate_doc
    from pdf_table_extractor_ray.stages.registry import extract_document

    docs = [generate_doc(i) for i in range(n_sample)]
    cpu = defaultdict(float)
    n = defaultdict(int)
    chars = defaultdict(int)
    for d in docs:
        t0 = time.perf_counter()
        key, res = extract_document(d)
        cpu[d["family"]] += time.perf_counter() - t0
        n[d["family"]] += 1
        chars[d["family"]] += len(res.extracted_text)
    total = sum(cpu.values())
    rows = sorted(cpu.items(), key=lambda kv: -kv[1])
    print(f"\n== single-process per-family CPU over {n_sample} docs "
          f"(total {total:.2f}s) ==")
    for fam, sec in rows:
        print(f"  {fam:20s} {sec:7.3f}s  {100 * sec / total:5.1f}%  "
              f"n={n[fam]:4d}  {1e3 * sec / n[fam]:7.2f} ms/doc")
    return {fam: round(sec, 3) for fam, sec in rows}


_STAGE_RE = re.compile(r"Operator (\d+) (\S+?):.*?\n(.*?)(?=\nOperator |\nDataset |\Z)", re.S)


def ray_stage_split(sf_dir: str):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    from pdf_table_extractor_ray.pipelines.extract import (
        build_extracted_dataset,
        read_pages,
    )

    pages_dir = os.path.join("/tmp/pdfx_fixtures", _fixture_key(sf_dir))
    t0 = time.perf_counter()
    ds = build_extracted_dataset(read_pages(pages_dir, include_paths=True))
    mat = ds.materialize()  # stats live on the executed plan
    wall = time.perf_counter() - t0
    n = mat.count()
    print(f"\n== ray stage stats (sf={sf_dir}, {n} docs, {wall:.2f}s wall) ==")
    print(mat.stats())
    return {"docs": n, "wall_sec": round(wall, 2)}


def _fixture_key(sf_dir: str) -> str:
    # reuse __ray_entry__'s fixture minting (cached under /tmp)
    import __ray_entry__ as e

    return os.path.basename(e._fixture_pages(sf_dir))


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    fam = per_family_split(n_sample)
    info = ray_stage_split(sf_dir)
    print(json.dumps({"per_family_cpu_sec": fam, **info}))
