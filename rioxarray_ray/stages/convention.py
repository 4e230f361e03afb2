"""Pluggable metadata conventions (SURVEY.md §2.10).

The reference dispatches CRS/transform encoding through a convention
protocol (CF or Zarr — /root/reference/rioxarray/_convention/_base.py:13-58,
registry _core.py:19-23, auto-detect fallback chain _core.py:46-176).  The
engine's analogue: dataset-level geo metadata is encoded into Arrow schema
metadata by a registered codec when writing parquet, and auto-detected on
read by trying each codec in order.

- ``CFConvention``  — CF-style keys: ``spatial_ref`` (WKT) + ``GeoTransform``
  (GDAL-order space-separated string, cf.py:59-85/139-200 semantics).
- ``ZarrConvention`` — Zarr-geo style keys: ``proj:wkt`` + ``proj:transform``
  (JSON list, zarr.py:228-370 semantics).
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq

from ..kernels import affine as aff
from ..kernels import crs as crs_mod


class CFConvention:
    name = "cf"

    @staticmethod
    def encode(crs, transform) -> dict[bytes, bytes]:
        c = crs_mod.from_user_input(crs)
        out = {b"spatial_ref": c.to_wkt().encode()}
        if transform is not None:
            gdal = aff.to_gdal(tuple(float(v) for v in transform))
            out[b"GeoTransform"] = " ".join(repr(float(v)) for v in gdal).encode()
        return out

    @staticmethod
    def decode(meta: dict[bytes, bytes]):
        if b"spatial_ref" not in meta:
            return None
        c = crs_mod.from_user_input(meta[b"spatial_ref"].decode())
        transform = None
        if b"GeoTransform" in meta:
            try:
                gdal = [float(v) for v in meta[b"GeoTransform"].decode().split()]
                transform = aff.from_gdal(*gdal)
            except (ValueError, TypeError):
                # salvage the valid CRS when only the transform is corrupt
                transform = None
        return c, transform


class ZarrConvention:
    name = "zarr"

    @staticmethod
    def encode(crs, transform) -> dict[bytes, bytes]:
        c = crs_mod.from_user_input(crs)
        payload = {"proj:wkt": c.to_wkt()}
        epsg = c.to_epsg()
        if epsg is not None:
            payload["proj:epsg"] = epsg
        if transform is not None:
            payload["proj:transform"] = [float(v) for v in transform]
        return {b"zarr_geo": json.dumps(payload).encode()}

    @staticmethod
    def decode(meta: dict[bytes, bytes]):
        if b"zarr_geo" not in meta:
            return None
        payload = json.loads(meta[b"zarr_geo"].decode())
        if "proj:epsg" in payload:
            c = crs_mod.from_epsg(int(payload["proj:epsg"]))
        else:
            c = crs_mod.from_user_input(payload["proj:wkt"])
        transform = payload.get("proj:transform")
        return c, (tuple(transform) if transform is not None else None)


# registry + auto-detect chain (first match wins, _core.py:46-102 pattern)
CONVENTIONS: dict[str, type] = {
    "cf": CFConvention,
    "zarr": ZarrConvention,
}


def encode_schema(schema: pa.Schema, crs, transform,
                  convention: str = "cf") -> pa.Schema:
    try:
        codec = CONVENTIONS[convention]
    except KeyError:
        raise ValueError(
            f"unknown convention {convention!r}; registered: "
            f"{sorted(CONVENTIONS)}"
        ) from None
    meta = dict(schema.metadata or {})
    # strip every registered convention's keys first — stale geo metadata
    # from a previous encode must not survive a re-encode (it would
    # resurrect an old transform/CRS on read)
    stale = {b"spatial_ref", b"GeoTransform", b"zarr_geo",
             b"rioxarray_ray:convention"}
    meta = {k: v for k, v in meta.items() if k not in stale}
    meta.update(codec.encode(crs, transform))
    meta[b"rioxarray_ray:convention"] = codec.name.encode()
    return schema.with_metadata(meta)


def decode_schema(schema: pa.Schema):
    """Auto-detect: try each registered convention; None when absent."""
    meta = schema.metadata or {}
    preferred = meta.get(b"rioxarray_ray:convention")
    order = list(CONVENTIONS.values())
    if preferred:
        order.sort(key=lambda c: c.name.encode() != preferred)
    for codec in order:
        try:
            got = codec.decode(meta)
        except (ValueError, KeyError, TypeError, crs_mod.CRSError,
                json.JSONDecodeError):
            # unparseable/foreign metadata for THIS codec -> fall through,
            # mirroring the reference's auto-detect fallback chain
            # (_convention/_core.py:46-176); genuine codec bugs (other
            # exception types) still surface
            continue
        if got is not None:
            return got
    return None


def write_parquet_with_meta(table: pa.Table, path: str, crs, transform,
                            convention: str = "cf"):
    """Write a table with dataset-level geo metadata (grid-mapping
    analogue: the scalar-coordinate trick of cf.py:180-196 becomes schema
    metadata)."""
    schema = encode_schema(table.schema, crs, transform, convention)
    pq.write_table(table.replace_schema_metadata(schema.metadata), path)


def read_parquet_with_meta(path: str):
    """Returns (table, (crs, transform) | None)."""
    table = pq.read_table(path)
    return table, decode_schema(table.schema)
