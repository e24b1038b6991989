"""Corpus sources: synthetic page generator + parquet readers."""
