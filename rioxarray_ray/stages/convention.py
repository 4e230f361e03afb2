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


def coordinate_system_attrs(crs) -> dict[str, dict[str, str]]:
    """Per-axis CF coordinate attrs — write_coordinate_system semantics
    (/root/reference/rioxarray/rioxarray.py:446-501): projected CRSes get
    projection_x/y_coordinate + linear units, geographic get
    longitude/latitude + degrees_east/north.  Every CRS kind this engine
    supports is metre-based, so the projected units branch is always
    "metre" (the reference's unit_factor==1 case)."""
    c = crs_mod.from_user_input(crs)
    x: dict[str, str] = {"axis": "X"}
    y: dict[str, str] = {"axis": "Y"}
    if c.is_projected:
        x.update(
            long_name="x coordinate of projection",
            standard_name="projection_x_coordinate",
            units="metre",
        )
        y.update(
            long_name="y coordinate of projection",
            standard_name="projection_y_coordinate",
            units="metre",
        )
    else:
        x.update(
            long_name="longitude", standard_name="longitude",
            units="degrees_east",
        )
        y.update(
            long_name="latitude", standard_name="latitude",
            units="degrees_north",
        )
    return {"x": x, "y": y}


#: flat ``<dim>#<attr>`` metadata keys the CF codec emits for the per-axis
#: coordinate attrs (same flat-key style as the GDAL ``NC_GLOBAL#`` tags
#: sources/tags.py already parses; values stay flat bytes so block schemas
#: remain hashable — see sources/io.py).
_COORD_ATTR_NAMES = ("axis", "long_name", "standard_name", "units")
_COORD_KEYS = tuple(
    f"{dim}#{name}".encode()
    for dim in ("x", "y")
    for name in _COORD_ATTR_NAMES
)


class CFConvention:
    name = "cf"

    @staticmethod
    def encode(crs, transform) -> dict[bytes, bytes]:
        from ..options import EXPORT_GRID_MAPPING, get_option

        c = crs_mod.from_user_input(crs)
        out = {b"spatial_ref": c.to_wkt().encode()}
        if get_option(EXPORT_GRID_MAPPING):
            # full CF grid-mapping attrs (reference: pyproj CRS.to_cf();
            # here: closed-form per supported kind) + crs_wkt duplicate
            out[b"crs_wkt"] = c.to_wkt().encode()
            out[b"grid_mapping"] = json.dumps(_cf_grid_mapping(c)).encode()
        if transform is not None:
            gdal = aff.to_gdal(tuple(float(v) for v in transform))
            out[b"GeoTransform"] = " ".join(repr(float(v)) for v in gdal).encode()
        # per-axis coordinate attrs (rioxarray.py:446-501), flat keys
        for dim, attrs in coordinate_system_attrs(c).items():
            for name, value in attrs.items():
                out[f"{dim}#{name}".encode()] = value.encode()
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


def _cf_grid_mapping(c) -> dict:
    """CF grid-mapping attribute dict per supported CRS kind (the
    EXPORT_GRID_MAPPING=True payload; public CF conventions appendix F)."""
    if c.kind == "geographic":
        return {"grid_mapping_name": "latitude_longitude"}
    if c.kind == "mercator":
        return {
            "grid_mapping_name": "mercator",
            "longitude_of_projection_origin": 0.0,
            "standard_parallel": 0.0,
        }
    if c.kind == "utm":
        return {
            "grid_mapping_name": "transverse_mercator",
            "longitude_of_central_meridian": c._lon0,
            "latitude_of_projection_origin": 0.0,
            "scale_factor_at_central_meridian": 0.9996,
            "false_easting": 500000.0,
            "false_northing": 10000000.0 if c.south else 0.0,
        }
    if c.kind == "sinusoidal":
        return {
            "grid_mapping_name": "sinusoidal",
            "longitude_of_projection_origin": 0.0,
        }
    if c.kind in ("lcc", "aea"):
        lat1, lat2, lat0, lon0, x0, y0 = c.params
        name = (
            "lambert_conformal_conic" if c.kind == "lcc"
            else "albers_conical_equal_area"
        )
        return {
            "grid_mapping_name": name,
            "standard_parallel": [lat1, lat2],
            "latitude_of_projection_origin": lat0,
            "longitude_of_central_meridian": lon0,
            "false_easting": x0,
            "false_northing": y0,
        }
    if c.kind == "ps":
        lat_ts, lon0, x0, y0 = c.params
        return {
            "grid_mapping_name": "polar_stereographic",
            "straight_vertical_longitude_from_pole": lon0,
            "latitude_of_projection_origin": -90.0 if c.south else 90.0,
            "standard_parallel": lat_ts,
            "false_easting": x0,
            "false_northing": y0,
        }
    return {}


# registry + auto-detect chain (first match wins, _core.py:46-102 pattern)
CONVENTIONS: dict[str, type] = {
    "cf": CFConvention,
    "zarr": ZarrConvention,
}


def encode_schema(schema: pa.Schema, crs, transform,
                  convention: str | None = None) -> pa.Schema:
    if convention is None:
        from ..options import CONVENTION, get_option

        convention = get_option(CONVENTION) or "cf"
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
    stale = {b"spatial_ref", b"GeoTransform", b"zarr_geo", b"crs_wkt",
             b"grid_mapping", b"rioxarray_ray:convention", *_COORD_KEYS}
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


def decode_coordinate_system(schema: pa.Schema) -> dict[str, dict[str, str]] | None:
    """Read back the per-axis coordinate attrs the CF codec emitted
    (write_coordinate_system round-trip); None when absent."""
    meta = schema.metadata or {}
    out: dict[str, dict[str, str]] = {}
    for key, value in meta.items():
        if key in _COORD_KEYS:
            dim, name = key.decode().split("#", 1)
            out.setdefault(dim, {})[name] = value.decode()
    return out or None


def write_parquet_with_meta(table: pa.Table, path: str, crs, transform,
                            convention: str | None = None):
    """Write a table with dataset-level geo metadata (grid-mapping
    analogue: the scalar-coordinate trick of cf.py:180-196 becomes schema
    metadata)."""
    schema = encode_schema(table.schema, crs, transform, convention)
    pq.write_table(table.replace_schema_metadata(schema.metadata), path)


def read_parquet_with_meta(path: str):
    """Returns (table, (crs, transform) | None)."""
    table = pq.read_table(path)
    return table, decode_schema(table.schema)
