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
    """bytes+fmt -> pixels + derived geo columns; one output row per image.

    Columnar hot path: payloads are read as zero-copy Arrow buffer views
    and decoded pixels land in ONE contiguous output buffer (BinaryBuilder)
    — no per-row python bytes objects.
    """
    from .schema import BinaryBuilder, binary_views

    ids = batch["image_id"].to_pylist()
    fmts = batch["fmt"].to_pylist()
    phashes = batch["phash"].to_numpy(zero_copy_only=False)
    bands, hs, ws, dtypes, nodatas, crss, transforms = [], [], [], [], [], [], []
    # exact output payload size from the metadata columns: presizing skips
    # the amortized-doubling reallocs on multi-GB decode batches
    wv = batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
    hv = batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    itemsize = np.array(
        [1 if f == "rawu8" else 2 for f in fmts], dtype=np.int64
    )
    idxv = np.array([int(s[3:]) for s in ids], dtype=np.int64)
    bandv = np.where(idxv % 5 == 0, 3, 1)  # corpus band rule (corpus.py:19)
    builder = BinaryBuilder(reserve=int((wv * hv * itemsize * bandv).sum()))
    for i, payload in enumerate(binary_views(batch, "bytes")):
        idx = int(ids[i][3:])
        meta = corpus.geo_meta_for(idx)
        decoded = codecs.decode(payload, fmts[i])
        if verify_phash and corpus.phash_of(decoded) != int(phashes[i]):
            raise PhashMismatch(f"phash mismatch for {ids[i]}")
        bands.append(decoded.shape[0])
        hs.append(decoded.shape[1])
        ws.append(decoded.shape[2])
        dtypes.append(decoded.dtype.name)
        nodatas.append(float(meta["nodata"]))
        crss.append(meta["crs"])
        transforms.append([float(v) for v in meta["transform"]])
        builder.append(decoded)
    return pa.Table.from_arrays(
        [
            batch["image_id"].combine_chunks()
            if isinstance(batch["image_id"], pa.ChunkedArray)
            else batch["image_id"],
            pa.array(bands, pa.int32()),
            pa.array(hs, pa.int32()),
            pa.array(ws, pa.int32()),
            pa.array(dtypes, pa.string()),
            pa.array(nodatas, pa.float64()),
            pa.array(crss, pa.string()),
            pa.array(transforms, RASTER_SCHEMA.field("transform").type),
            builder.finish(),
            batch["caption"].combine_chunks()
            if isinstance(batch["caption"], pa.ChunkedArray)
            else batch["caption"],
            batch["phash"].combine_chunks()
            if isinstance(batch["phash"], pa.ChunkedArray)
            else batch["phash"],
        ],
        schema=RASTER_SCHEMA,
    )


def decode_stage(ds, **map_kwargs):
    """Attach the decode stage to a Dataset of corpus rows."""
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return ds.map_batches(decode_batch, **kwargs)


def mask_and_scale_batch(
    batch: pa.Table,
    scale: float = 1.0,
    offset: float = 0.0,
    masked: bool = True,
    unsigned: bool = False,
) -> pa.Table:
    """The masked / mask_and_scale open options
    (/root/reference/rioxarray/_io.py:175-184,326-343,440-451):

    - ``unsigned``: reinterpret signed payloads as their unsigned dtype
      (the _Unsigned convention);
    - ``masked``: promote to float64 and replace nodata with NaN
      (maybe_promote semantics);
    - scale/offset: ``out = decoded * scale + offset`` per band.

    Columnar: pixels arrive as zero-copy views and leave through one
    contiguous BinaryBuilder buffer; output dtype float64 when masked or
    scaled, else the (possibly reinterpreted) source dtype.
    """
    from .schema import BinaryBuilder, pixel_views, rebuild_table

    nodatas = batch["nodata"].to_numpy(zero_copy_only=False)
    out_dt, out_nod = [], []
    builder = BinaryBuilder()
    for i, px in enumerate(pixel_views(batch)):
        nod = float(nodatas[i])
        if unsigned and px.dtype.kind == "i":
            px = px.view(px.dtype.str.replace("i", "u"))
            if nod == nod:
                nod = float(
                    np.array(nod).astype(px.dtype.str.replace("u", "i")).view(
                        px.dtype
                    )
                )
        if masked or scale != 1.0 or offset != 0.0:
            out = px.astype(np.float64)
            if masked and nod == nod:
                out[px == np.asarray(nod, dtype=px.dtype)] = np.nan
                nod = float("nan")
            out = out * scale + offset
            if not masked and nod == nod:
                # unmasked scaling transforms nodata pixels too — keep the
                # sentinel consistent so valid_mask still identifies them
                nod = float(nod) * scale + offset
            out_dt.append("float64")
            out_nod.append(nod if nod == nod else float("nan"))
            builder.append(out)
        else:
            out_dt.append(px.dtype.name)
            out_nod.append(nod)
            builder.append(px)
    return rebuild_table(
        batch,
        {
            "dtype": pa.array(out_dt, pa.string()),
            "nodata": pa.array(out_nod, pa.float64()),
        },
        builder,
    )


def mask_and_scale_stage(ds, scale=1.0, offset=0.0, masked=True,
                         unsigned=False, **map_kwargs):
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return ds.map_batches(
        lambda b: mask_and_scale_batch(
            b, scale=scale, offset=offset, masked=masked, unsigned=unsigned
        ),
        **kwargs,
    )
