"""Decode stage: corpus rows (input_hint schema) -> raster rows.

The Ray-Data recast of ``open_rasterio`` (/root/reference/rioxarray/_io.py:
1000-1328): there are no shared file handles, so the reference's entire
locking/caching apparatus disappears — each task decodes its own rows from
the Arrow batch (SURVEY.md §3.1).  Runs as a stateless
``map_batches(decode_batch, batch_format="pyarrow", zero_copy_batch=True)``.

Geo-referencing (crs/transform/nodata/band_count) is derived
deterministically from the image index per the corpus spec
(sources/corpus.py), standing in for the file metadata a GDAL reader would
parse.  Integrity checks per BASELINE.json input_hint: ``phash`` must match
sha256 of the decoded pixel buffer; ``caption`` passes through byte-equal.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import codecs
from ..sources import corpus
from .schema import RASTER_SCHEMA, pixels_to_bytes


class PhashMismatch(RuntimeError):
    pass


def decode_batch(batch: pa.Table, verify_phash: bool = True) -> pa.Table:
    """bytes+fmt -> pixels + derived geo columns; one output row per image."""
    out = {name: [] for name in RASTER_SCHEMA.names}
    ids = batch["image_id"].to_pylist()
    payloads = batch["bytes"].to_pylist()
    fmts = batch["fmt"].to_pylist()
    caps = batch["caption"].to_pylist()
    phashes = batch["phash"].to_pylist()
    for image_id, payload, fmt, caption, phash in zip(
        ids, payloads, fmts, caps, phashes
    ):
        idx = int(image_id[3:])
        meta = corpus.geo_meta_for(idx)
        decoded = codecs.decode(payload, fmt)
        if verify_phash and corpus.phash_of(decoded) != phash:
            raise PhashMismatch(f"phash mismatch for {image_id}")
        out["image_id"].append(image_id)
        out["band_count"].append(decoded.shape[0])
        out["h"].append(decoded.shape[1])
        out["w"].append(decoded.shape[2])
        out["dtype"].append(decoded.dtype.name)
        out["nodata"].append(float(meta["nodata"]))
        out["crs"].append(meta["crs"])
        out["transform"].append([float(v) for v in meta["transform"]])
        out["pixels"].append(pixels_to_bytes(decoded))
        out["caption"].append(caption)
        out["phash"].append(phash)
    return pa.Table.from_pydict(out, schema=RASTER_SCHEMA)


def decode_stage(ds, **map_kwargs):
    """Attach the decode stage to a Dataset of corpus rows."""
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return ds.map_batches(decode_batch, **kwargs)
