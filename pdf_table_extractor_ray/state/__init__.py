"""Job state: per-partition lineage records, resume bookkeeping
(SURVEY §4.2 'Resume' row; north rule's per-partition lineage +
metrics)."""

from pdf_table_extractor_ray.pipelines.extract import (  # noqa: F401
    clear_unfinished_partitions,
    finished_partitions,
    lineage_path,
    write_lineage,
)
