"""Composed Dataset pipelines + checkpoint/lineage/metrics."""
