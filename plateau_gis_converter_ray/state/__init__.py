"""Run state: per-partition lineage manifest for resumable pipelines."""
