"""Deterministic synthetic image+caption corpus (FIXTURES.md F1/F2).

The engine's logical input is a Lance/Parquet table with EXACTLY the
BASELINE.json ``input_hint`` schema::

    image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64

Everything is a pure closed-form function of the integer index ``idx``
(derived from ``documents.doc_id`` of a testdata sf dir so corpus size scales
with sf), so a DuckDB oracle can mirror every METADATA column with plain SQL
arithmetic.  The frozen generation spec (do not change without regenerating
goldens):

- ``image_id = f"img{idx:08d}"``
- ``w = WH_CYCLE[idx % 4]``, ``h = WH_CYCLE[(idx+1) % 4]``; WH_CYCLE =
  (64, 128, 200, 256) (200 mirrors MODIS_ARRAY's 200x200 grid)
- ``fmt = FMT_CYCLE[idx % 4]``; FMT_CYCLE = (raw16, rawu8, pngz, lq8)
- ``band_count = 3 if idx % 5 == 0 else 1``
- ``nodata = 255 for rawu8 else -28672`` (MODIS _FillValue)
- geo-referencing (derived, NOT stored in the corpus): on a G=64-column
  world grid with RES=0.005 deg, ``lon_left = -60 + (idx % 64) * w * RES``,
  ``lat_top = 40 - ((idx // 64) % 64) * h * RES``, north-up transform
  ``(RES, 0, lon_left, 0, -RES, lat_top)`` in EPSG:4326 — EXCEPT every 7th
  image (``idx % 7 == 6``) which is projected (cycling UTM / WebMercator /
  sinusoidal by ``(idx // 7) % 3``) with the same top-left forward-projected
  and a metre resolution of ``RES * 111320``.  UTM zones are derived from
  the image's own longitude so the TM series stays near its central meridian.
- ``caption = f"caption-{idx}-" + sha256(image_id)[:8]`` (hex) — must
  survive every stage byte-identical;  SQL mirror:
  ``'caption-' || doc_id || '-' || substr(sha256(...), 1, 8)``.
- ``phash`` = low 63 bits of sha256 of the DECODED pixel bytes (the
  canonical little-endian buffer after an encode->decode round trip, so it
  is checkable after any lossy codec).
- pixels: band-limited pattern
  ``A*sin(2*pi*f1*(r+phi)/h) * cos(2*pi*f2*(c+phi)/w) + gradient`` with
  A, f1, f2, phi from sha256(image_id); ~5% nodata disc at a hashed center.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

from ..kernels import affine as aff
from ..kernels import codecs
from ..kernels import crs as crs_mod

WH_CYCLE = (64, 128, 200, 256)
FMT_CYCLE = ("raw16", "rawu8", "pngz", "lq8")
GRID = 64
RES = 0.005
LON0 = -60.0
LAT0 = 40.0
METER_RES = RES * 111320.0
CELL_RES = 10  # default cell-index resolution for tile assignment

CORPUS_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def image_id(idx: int) -> str:
    return f"img{idx:08d}"


def _meta_scalar(idx: int) -> dict:
    w = WH_CYCLE[idx % 4]
    h = WH_CYCLE[(idx + 1) % 4]
    fmt = FMT_CYCLE[idx % 4]
    lon_left = LON0 + (idx % GRID) * w * RES
    lat_top = LAT0 - ((idx // GRID) % GRID) * h * RES
    projected = idx % 7 == 6
    if not projected:
        crs = crs_mod.GEOGRAPHIC
        transform = (RES, 0.0, lon_left, 0.0, -RES, lat_top)
    else:
        kind = (idx // 7) % 3
        if kind == 0:
            lon_c = lon_left + w * RES / 2.0
            lat_c = lat_top - h * RES / 2.0
            zone = int(math.floor((lon_c + 180.0) / 6.0)) + 1
            crs = crs_mod.utm(zone, south=lat_c < 0)
        elif kind == 1:
            crs = crs_mod.WEB_MERCATOR
        else:
            crs = crs_mod.SINUSOIDAL
        x0, y0 = crs.forward(lon_left, lat_top)
        transform = (METER_RES, 0.0, float(x0), 0.0, -METER_RES, float(y0))
    return {
        "image_id": image_id(idx),
        "idx": idx,
        "w": w,
        "h": h,
        "fmt": fmt,
        "band_count": 3 if idx % 5 == 0 else 1,
        "nodata": 255.0 if fmt == "rawu8" else -28672.0,
        "crs": crs.to_string(),
        "transform": transform,
    }


def image_meta(idx) -> dict:
    """Vectorized metadata columns for an array of indices (no pixels)."""
    idx = np.asarray(idx, dtype=np.int64)
    wc = np.array(WH_CYCLE, dtype=np.int32)
    fc = np.array(FMT_CYCLE)
    w = wc[idx % 4]
    h = wc[(idx + 1) % 4]
    out = {
        "image_id": np.array([image_id(int(i)) for i in idx]),
        "idx": idx,
        "w": w,
        "h": h,
        "fmt": fc[idx % 4],
        "band_count": np.where(idx % 5 == 0, 3, 1).astype(np.int32),
        "nodata": np.where(idx % 4 == 1, 255.0, -28672.0),
        "lon_left": LON0 + (idx % GRID) * w * RES,
        "lat_top": LAT0 - ((idx // GRID) % GRID) * h * RES,
        "projected": idx % 7 == 6,
    }
    return out


def caption_for(idx: int) -> str:
    digest = hashlib.sha256(image_id(idx).encode()).hexdigest()
    return f"caption-{idx}-{digest[:8]}"


def pixels_for(idx: int) -> np.ndarray:
    """The deterministic pre-encode pixel array (bands, h, w)."""
    m = _meta_scalar(idx)
    h, w, bands = m["h"], m["w"], m["band_count"]
    rh = hashlib.sha256(m["image_id"].encode()).digest()
    A = 1000.0 + rh[0] * 8.0
    f1 = 1 + rh[1] % 8
    f2 = 1 + rh[2] % 8
    phi = rh[3] / 255.0
    r = np.arange(h, dtype=np.float64)[:, None]
    c = np.arange(w, dtype=np.float64)[None, :]
    grad = 500.0 * (r / h) + 300.0 * (c / w)
    out = np.empty((bands, h, w), dtype=np.float64)
    for b in range(bands):
        ph = phi + 0.37 * b
        out[b] = (
            A
            * np.sin(2 * np.pi * f1 * (r + ph) / h)
            * np.cos(2 * np.pi * f2 * (c + ph) / w)
            + grad
        )
    # ~5% nodata disc at a hashed center (exercises every nodata path)
    cr, cc = rh[4] % h, rh[5] % w
    radius2 = 0.05 * h * w / math.pi
    blob = (r - cr) ** 2 + (c - cc) ** 2 < radius2
    if m["fmt"] == "rawu8":
        lo, hi = out.min(), out.max()
        q = np.rint((out - lo) / max(hi - lo, 1e-9) * 254.0).astype(np.uint8)
        q[:, blob] = 255
        return q
    q = np.rint(out).astype(np.int16)
    q[:, blob] = -28672
    return q


def make_row(idx: int) -> dict:
    """One full corpus row (input_hint schema)."""
    m = _meta_scalar(idx)
    pre = pixels_for(idx)
    payload = codecs.encode(pre, m["fmt"], nodata=m["nodata"])
    decoded = codecs.decode(payload, m["fmt"])
    phash = int.from_bytes(
        hashlib.sha256(_canonical_bytes(decoded)).digest()[:8], "big"
    ) & ((1 << 63) - 1)
    return {
        "image_id": m["image_id"],
        "bytes": payload,
        "w": m["w"],
        "h": m["h"],
        "fmt": m["fmt"],
        "caption": caption_for(idx),
        "phash": phash,
    }


def _canonical_bytes(decoded: np.ndarray) -> bytes:
    dt = "<i2" if decoded.dtype == np.int16 else np.uint8
    return np.ascontiguousarray(decoded.astype(dt)).tobytes()


def phash_of(decoded: np.ndarray) -> int:
    return int.from_bytes(
        hashlib.sha256(_canonical_bytes(decoded)).digest()[:8], "big"
    ) & ((1 << 63) - 1)


def corpus_table(indices) -> pa.Table:
    rows = [make_row(int(i)) for i in np.asarray(indices, dtype=np.int64)]
    return pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)


def raster_for(idx: int):
    """The reference Raster for an index (single-process oracle path)."""
    from ..kernels.raster import Raster

    m = _meta_scalar(idx)
    decoded = codecs.decode(
        codecs.encode(pixels_for(idx), m["fmt"], nodata=m["nodata"]), m["fmt"]
    )
    return Raster(
        decoded,
        m["transform"],
        crs_mod.from_user_input(m["crs"]),
        nodata=m["nodata"],
    )


def geo_meta_for(idx: int) -> dict:
    """crs string + transform for an index (what decode derives per row)."""
    return _meta_scalar(idx)


# ---------------------------------------------------------------- F2 geoms
KIND_CYCLE = ("rect", "convex", "concave", "point", "rect")
_KNUTH = 2654435761  # Knuth multiplicative hash — plain modular arithmetic
# so the DuckDB oracle mirrors rect/point placement exactly:
#   h1 = (k * 2654435761) % 4294967296


def _geom_hash(k: int) -> int:
    return (k * _KNUTH) % (1 << 32)


def geometry_row(k: int) -> dict:
    """Deterministic vector geometry k (FIXTURES.md F2).

    Rects/points are placed on INTEGER multiples of RES from (LON0, LAT0)
    via closed-form modular arithmetic (SQL-mirrorable; rects end up
    pixel-edge-aligned so clip(rect) == window slice).  Convex/concave
    star polygons use sha-derived radii (pytest-oracle only, not SQL).
    Skew: 80% of geometries (k % 10 < 8) land in a small hot region —
    forces the salting path (FIXTURES.md F2).
    """
    h1 = _geom_hash(k)
    kind = KIND_CYCLE[k % 5]
    if k % 10 < 8:  # hot region: first ~3.2 degrees
        gx = (h1 % 40) * 16
        gy = ((h1 // 40) % 40) * 16
    else:
        gx = ((h1 // 1600) % 256) * 64
        gy = ((h1 // 409600) % 256) * 64
    if kind == "point":
        px = LON0 + (gx + (h1 // 13) % 16) * RES + RES / 2
        py = LAT0 - (gy + (h1 // 17) % 16) * RES - RES / 2
        geom = {"type": "Point", "coordinates": [px, py]}
    elif kind == "rect":
        wpx = 8 + (h1 // 7) % 56
        hpx = 8 + (h1 // 11) % 56
        left = LON0 + gx * RES
        top = LAT0 - gy * RES
        geom = {
            "type": "Polygon",
            "coordinates": [
                [
                    [left, top - hpx * RES],
                    [left + wpx * RES, top - hpx * RES],
                    [left + wpx * RES, top],
                    [left, top],
                    [left, top - hpx * RES],
                ]
            ],
        }
    else:
        rh = hashlib.sha256(f"poly{k:06d}".encode()).digest()
        cx = LON0 + gx * RES
        cy = LAT0 - gy * RES
        npts = 6 if kind == "convex" else 10
        ang = np.linspace(0, 2 * np.pi, npts + 1)[:-1]
        if kind == "convex":
            rad = (0.05 + rh[2] / 255.0 * 0.2) * np.ones(npts)
        else:  # concave star
            rad = np.where(
                np.arange(npts) % 2 == 0,
                0.05 + rh[2] / 255.0 * 0.25,
                0.02 + rh[3] / 255.0 * 0.05,
            )
        ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], 1)
        ring = np.vstack([ring, ring[:1]])
        geom = {"type": "Polygon", "coordinates": [ring.tolist()]}
    return {"geom_id": f"poly{k:06d}", "kind": kind, "geometry": geom}


def geometry_table(n: int) -> list[dict]:
    return [geometry_row(k) for k in range(n)]
