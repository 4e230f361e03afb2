"""Parquet read helpers.

``read_parquet_clean`` strips schema-level metadata from every block at the
read boundary.  Rationale: pandas-written parquet carries a ``b"pandas"``
schema-metadata entry, and in this pyarrow version a Schema whose metadata
dict is non-empty is UNHASHABLE (``hash(schema)`` raises
``TypeError: unhashable type: 'dict'``; field-level metadata hashes fine).
Ray Data hashes block schemas to dedupe them before unification
(`transform_pyarrow.unify_schemas`), so every reduce/read task over such
blocks logs "Failed to hash the schemas (for deduplication)" and falls back
to the expensive unify path.  Dropping the metadata at the read is a
zero-copy, metadata-only rewrite and the MapBatches fuses into the Read
operator, so the fix is free and every downstream stage inherits a clean,
hashable schema.
"""

from __future__ import annotations

import pyarrow as pa


def strip_schema_metadata(batch: pa.Table) -> pa.Table:
    """Drop schema-level metadata (zero-copy; buffers are shared)."""
    if batch.schema.metadata:
        return batch.replace_schema_metadata(None)
    return batch


def read_parquet_clean(path, **read_kwargs):
    """``ray.data.read_parquet`` + schema-metadata strip fused into the read."""
    import ray.data as rd

    return rd.read_parquet(path, **read_kwargs).map_batches(
        strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True
    )
