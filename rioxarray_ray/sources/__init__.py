"""Corpus synthesis + IO (parquet now; lance is a drop-in swap when available)."""
