"""Scale-discipline audit — the anti-pattern scan a 100 TB engine must
keep passing, enforced in CI (tests/test_audit_scale.py runs it).

Checks, over all package source + __ray_entry__.py:

1. no per-row ``Dataset.map(`` (always ``map_batches``/``map_groups``;
   thread/process-pool ``ex.map`` inside a UDF is allowed),
2. no ``batch_format="pandas"`` (Arrow batches are zero-copy from the
   object store; pandas forces a conversion per batch),
3. no ``.iter_rows()`` (driver-side row loops don't distribute),
4. no ``.to_pandas()`` in engine code (full materialization; tests and
   tools may use it on small results),
5. every ``take_all()`` call site is REGISTERED below — each one is a
   driver materialization point and must be bounded by contract
   (broadcast build sides, drop sets, vocab, sketch partials,
   distinct-value counts). Adding one means consciously editing this
   allowlist with a justification.

Exit 0 when clean; prints one line per violation otherwise.
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# file (repo-relative) -> (max take_all sites, why they are bounded)
TAKE_ALL_ALLOWLIST = {
    "pdf_table_extractor_ray/stages/dedup.py": (3, "drop sets / adaptive id filter, bounded by dup count"),
    "pdf_table_extractor_ray/stages/search.py": (2, "BM25 df/term stats, bounded by query-term count"),
    "pdf_table_extractor_ray/stages/bloom.py": (1, "one m/8-byte partial bitmap per block"),
    "pdf_table_extractor_ray/stages/joins.py": (1, "broadcast build side, bounded by contract"),
    "pdf_table_extractor_ray/stages/lm.py": (1, "top-V vocab, bounded by V"),
    "pdf_table_extractor_ray/stages/similarity.py": (1, "k-means training sample, bounded by sample_size"),
    "pdf_table_extractor_ray/stages/sketches.py": (3, "HLL registers / value-counts of bounded-cardinality columns"),
    "pdf_table_extractor_ray/pipelines/extract.py": (1, "finished-partition lineage ids for resume"),
    "pdf_table_extractor_ray/pipelines/sinks.py": (1, "workbook partition keys, bounded by partition count"),
    "__ray_entry__.py": (3, "query-vector fetch / small query-side lookups"),
}

_ROW_MAP = re.compile(r"\.map\(")
_ALLOWED_MAP = re.compile(r"\b(ex|executor|pool)\.map\(")


def _sources():
    yield os.path.join(ROOT, "__ray_entry__.py")
    pkg = os.path.join(ROOT, "pdf_table_extractor_ray")
    for dirpath, _dirs, files in os.walk(pkg):
        for f in sorted(files):
            if f.endswith(".py"):
                yield os.path.join(dirpath, f)


def audit() -> list:
    violations = []
    take_all_counts = {}
    for path in _sources():
        rel = os.path.relpath(path, ROOT)
        with open(path, encoding="utf-8") as fh:
            for lineno, line in enumerate(fh, 1):
                code = line.split("#", 1)[0]
                if _ROW_MAP.search(code) and not _ALLOWED_MAP.search(code):
                    if "map_batches" not in code and "map_groups" not in code:
                        violations.append(f"{rel}:{lineno}: per-row .map( — use map_batches")
                if 'batch_format="pandas"' in code or "batch_format='pandas'" in code:
                    violations.append(f"{rel}:{lineno}: pandas batch format in engine code")
                if ".iter_rows()" in code:
                    violations.append(f"{rel}:{lineno}: driver-side iter_rows()")
                if ".to_pandas()" in code:
                    violations.append(f"{rel}:{lineno}: to_pandas() in engine code")
                if "take_all()" in code:
                    take_all_counts[rel] = take_all_counts.get(rel, 0) + 1
    for rel, count in sorted(take_all_counts.items()):
        cap = TAKE_ALL_ALLOWLIST.get(rel, (0, ""))[0]
        if count > cap:
            violations.append(
                f"{rel}: {count} take_all() sites (allowlist: {cap}) — register the new "
                "driver materialization point in tools/audit_scale.py with its bound"
            )
    return violations


def main() -> int:
    v = audit()
    for line in v:
        print(line)
    print("AUDIT:", "clean" if not v else f"{len(v)} violation(s)")
    return 1 if v else 0


if __name__ == "__main__":
    sys.exit(main())
