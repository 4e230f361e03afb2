"""Stage-boundary completion manifests + per-partition lineage (the north
rule's resumability requirement; SURVEY.md §7.1 step 6).

Ray Data has no native mid-shuffle checkpoint, so the engine checkpoints at
stage boundaries on its own terms:

- output is partitioned by a KEY (cell id, image-id range, …), one parquet
  directory per partition, written ATOMICALLY (tmp dir + rename);
- every completed partition appends a manifest record
  ``(partition_key, rows, bytes, wall_ms, fingerprint)``;
- ``resume_filter`` anti-joins the input against the completed-key set so a
  restarted job skips finished partitions (idempotent: a retry of a
  half-written partition overwrites the tmp dir and re-renames).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


#: field-metadata key recording a fixed_size_list's size across the parquet
#: boundary.  pyarrow cannot read back a fixed_size_list column that holds
#: NULL entries (the nulls come back as size-0 lists and the read raises),
#: so write_partition stores such columns as variable lists + this marker
#: and read_partition casts them back — lossless, checked in tests.
_FSL_KEY = b"rioxarray_ray:fixed_size_list"


def _fsl_chunk_to_list(chunk: pa.Array) -> pa.Array:
    """fixed_size_list chunk -> list chunk with CANONICAL zero-length null
    slots.  A plain ``.cast`` keeps list_size-long offsets under null
    entries whenever a chunk mixes valid and null slots (Ray's groupby
    take does exactly that), and parquet rejects "lists with non-zero
    length null components"."""
    import numpy as np
    import pyarrow.compute as pc

    valid = pc.is_valid(chunk).to_numpy(zero_copy_only=False)
    size = chunk.type.list_size
    offsets = np.zeros(len(chunk) + 1, dtype=np.int32)
    np.cumsum(np.where(valid, size, 0).astype(np.int32), out=offsets[1:])
    values = pc.list_flatten(chunk)  # valid slots' values only
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), values, mask=pa.array(~valid)
    )


def _fsl_to_list(table: pa.Table) -> pa.Table:
    for i, f in enumerate(table.schema):
        if pa.types.is_fixed_size_list(f.type):
            new_f = pa.field(
                f.name, pa.list_(f.type.value_type),
                metadata={_FSL_KEY: str(f.type.list_size).encode()},
            )
            col = table[f.name]
            chunks = (
                col.chunks if isinstance(col, pa.ChunkedArray) else [col]
            )
            new_col = pa.chunked_array(
                [_fsl_chunk_to_list(c) for c in chunks]
                or [pa.array([], new_f.type)],
                new_f.type,
            )
            table = table.set_column(i, new_f, new_col)
    return table


def _list_to_fsl(table: pa.Table) -> pa.Table:
    for i, f in enumerate(table.schema):
        size = (f.metadata or {}).get(_FSL_KEY)
        if size is not None:
            typ = pa.list_(f.type.value_type, int(size))
            table = table.set_column(
                i, pa.field(f.name, typ), table[f.name].cast(typ)
            )
    return table


class PartitionManifest:
    """A directory of per-partition completion markers + lineage rows."""

    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def completed_keys(self) -> set[str]:
        out = set()
        for name in os.listdir(self.manifest_dir):
            if name.endswith(".json"):
                out.add(name[: -len(".json")])
        return out

    def partition_dir(self, key: str) -> str:
        return os.path.join(self.root, f"part={key}")

    def write_partition(self, key: str, table: pa.Table, extra: dict | None = None):
        """Atomic write: tmp dir -> fsync'd parquet -> rename -> marker."""
        t0 = time.monotonic()
        final = self.partition_dir(key)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        os.makedirs(tmp, exist_ok=True)
        data_path = os.path.join(tmp, "data.parquet")
        pq.write_table(_fsl_to_list(table), data_path)
        with open(data_path, "rb") as f:
            os.fsync(f.fileno())
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)
        record = {
            "partition_key": key,
            "rows": table.num_rows,
            "bytes": table.nbytes,
            "wall_ms": round((time.monotonic() - t0) * 1000.0, 3),
        }
        if extra:
            record.update(extra)
        marker = os.path.join(self.manifest_dir, f"{key}.json")
        tmp_marker = marker + ".tmp"
        with open(tmp_marker, "w") as f:
            json.dump(record, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp_marker, marker)
        # fsync the directories so neither the rename nor the marker can
        # survive a crash that loses the data file
        for d in (self.root, self.manifest_dir):
            fd = os.open(d, os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)

    def lineage(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    out.append(json.load(f))
        return out

    def read_partition(self, key: str) -> pa.Table:
        return _list_to_fsl(
            pq.read_table(os.path.join(self.partition_dir(key), "data.parquet"))
        )

    def read_all(self) -> pa.Table:
        keys = sorted(self.completed_keys())
        return pa.concat_tables([self.read_partition(k) for k in keys])


def resume_filter(ds, manifest: PartitionManifest, key_fn_column: str):
    """Drop rows whose partition key is already completed (anti-join against
    the completed-key set, broadcast as a plain Python set)."""
    import pyarrow.compute as pc

    done = manifest.completed_keys()
    if not done:
        return ds
    done_arr = pa.array(sorted(done))

    def keep(batch: pa.Table) -> pa.Table:
        mask = pc.invert(
            pc.is_in(pc.cast(batch[key_fn_column], pa.string()), value_set=done_arr)
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def checkpointed_writer(root: str, key_column: str):
    """map_groups-compatible reducer (``batch_format="pyarrow"``): each
    group (one partition key) is written + manifested (key column dropped
    from the stored table), emitting a one-row lineage record downstream.
    Arrow end-to-end — pixel payloads are never converted to pandas objects
    (round-2 verdict item #6).  Shared by pipelines/resumable.py — keep the
    two paths from drifting."""

    def write_partition(group: pa.Table) -> pa.Table:
        key = str(group[key_column][0].as_py())
        manifest = PartitionManifest(root)
        manifest.write_partition(key, group.drop_columns([key_column]))
        return pa.Table.from_pydict(
            {
                "partition_key": pa.array([key], pa.string()),
                "rows": pa.array([group.num_rows], pa.int64()),
            }
        )

    return write_partition


# backwards-compatible alias
CheckpointedWriter = checkpointed_writer
