"""Mint the golden extraction fixtures (SURVEY §5 step 2).

Single-process, no Ray: generates the deterministic fixture corpus and
runs the straight-line oracle, writing tests/golden/golden_extracted.parquet.
Run once; the output is committed and the Ray pipeline is asserted
byte-identical against it.
"""

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdf_table_extractor_ray.fixtures import generate_doc, docs_to_table  # noqa: E402
from pdf_table_extractor_ray.oracle import oracle_extract_table  # noqa: E402

N_GOLDEN = 240
NUM_PARTITIONS = 16


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    docs = [generate_doc(i) for i in range(N_GOLDEN)]
    table = oracle_extract_table(docs, num_partitions=NUM_PARTITIONS)
    pq.write_table(table, os.path.join(out_dir, "golden_extracted.parquet"))
    pages = docs_to_table(list(range(N_GOLDEN)))
    pq.write_table(pages, os.path.join(out_dir, "golden_pages.parquet"))
    print(f"minted {table.num_rows} golden rows")


if __name__ == "__main__":
    main()
