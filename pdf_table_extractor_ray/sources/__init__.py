"""Source connectors (SURVEY §2.1).

The payload parsers themselves (S1-S7) are extraction strategies in
``stages/``; this package holds the corpus-level scans: column-pruned
parquet readers for each logical table.
"""

from pdf_table_extractor_ray.pipelines.extract import list_shards, read_pages  # noqa: F401


def read_table(sf_dir: str, name: str, columns=None):
    """Pruned scan of one driver-provided table (documents, lineitem,
    events, embeddings, ...)."""
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)
