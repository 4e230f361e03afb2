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


def _stripped_file_schema(path, columns):
    """The file's schema minus metadata (and projected to ``columns``),
    or None when the path isn't a plain parquet file we can probe."""
    import os

    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        names = sorted(
            n for n in os.listdir(path) if n.endswith(".parquet")
        )
        if not names:
            return None
        probe = os.path.join(path, names[0])
    try:
        schema = pq.read_schema(probe).remove_metadata()
    except Exception:
        return None
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return schema


def read_parquet_clean(path, **read_kwargs):
    """``ray.data.read_parquet`` with the metadata strip applied at BOTH
    layers: an explicit stripped ``schema=`` so the Read operator's own
    blocks hash cleanly (the operator derives block schemas from the file
    schema BEFORE any fused map runs — a split read of a pandas-written
    file logs the warning from inside ReadParquet otherwise), plus the
    per-block strip for anything the schema argument doesn't reach."""
    import ray.data as rd

    if "schema" not in read_kwargs and isinstance(path, str):
        schema = _stripped_file_schema(path, read_kwargs.get("columns"))
        if schema is not None:
            read_kwargs["schema"] = schema
    return rd.read_parquet(path, **read_kwargs).map_batches(
        strip_schema_metadata, batch_format="pyarrow", zero_copy_batch=True
    )


def coerce_empty_blocks(ds, num_blocks: int = 4):
    """Flush the zero-column empty blocks a hash aggregate emits.

    Ray's hash-shuffle aggregator emits one block per internal partition
    and the EMPTY ones have NO columns (``rows=0 cols=[]``).  Any
    downstream ``Dataset.join`` with num_partitions > 1 then fails with
    ``ArrowInvalid: No match or multiple matches for key field ...`` —
    and a map_batches repair CANNOT work because Ray skips the UDF on
    empty blocks entirely.  ``repartition`` is the reliable fix: it
    coalesces blocks, dropping the schemaless empties.  Use on any small
    aggregate output that feeds a join.  (The aggregate outputs this is
    used on are small by construction — combiner partials — so the extra
    exchange is noise.)
    """
    return ds.repartition(num_blocks)
