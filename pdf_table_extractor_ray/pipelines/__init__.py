"""Pipelines: flagship extraction, partition keys, lineage/resume."""
