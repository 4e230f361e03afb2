"""Vector geometry kernels: GeoJSON-like polygons, point-in-polygon
rasterization, and a bbox candidate index.

Replaces ``rasterio.features.geometry_mask`` (used by clip at
/root/reference/rioxarray/_spatial_utils.py:468-503) and the shapely STRtree
the north rule's PIP join needs.  Geometries are GeoJSON-like dicts
(``{"type": "Polygon"|"MultiPolygon"|"Point", "coordinates": [...]}``),
stored in Arrow as JSON strings.

Rasterization semantics: a pixel is INSIDE when its center passes an even-odd
ray-casting test (GDAL rasterize default).  ``all_touched=True`` also marks
pixels crossed by ring boundaries, traced by dense sampling (0.25 px steps —
exact for the axis-aligned and test geometries; documented approximation for
arbitrary slivers).
"""

from __future__ import annotations

import json

import numpy as np

from . import affine as aff


# ---- GeoJSON helpers -----------------------------------------------------

def parse_geometry(geom):
    if isinstance(geom, (bytes, str)):
        return json.loads(geom)
    return geom


def geometry_rings(geom) -> list[np.ndarray]:
    """All rings (exterior + holes) of a (Multi)Polygon as (N,2) arrays.
    Even-odd rasterization makes holes work without orientation bookkeeping."""
    geom = parse_geometry(geom)
    gtype = geom["type"]
    if gtype == "Polygon":
        polys = [geom["coordinates"]]
    elif gtype == "MultiPolygon":
        polys = geom["coordinates"]
    else:
        raise ValueError(f"not a polygon geometry: {gtype}")
    out = []
    for poly in polys:
        for r in poly:
            ring = np.asarray(r, dtype=np.float64)
            # auto-close unclosed rings (GDAL/shapely do the same): the
            # ray-cast edge walk needs the implicit closing edge explicit
            if len(ring) and not np.array_equal(ring[0], ring[-1]):
                ring = np.vstack([ring, ring[:1]])
            out.append(ring)
    return out


def geometry_points(geom) -> np.ndarray:
    geom = parse_geometry(geom)
    if geom["type"] == "Point":
        return np.asarray([geom["coordinates"]], dtype=np.float64)
    if geom["type"] == "MultiPoint":
        return np.asarray(geom["coordinates"], dtype=np.float64)
    raise ValueError(f"not a point geometry: {geom['type']}")


def geometry_bounds(geom) -> tuple[float, float, float, float]:
    geom = parse_geometry(geom)
    if geom["type"] in ("Point", "MultiPoint"):
        pts = geometry_points(geom)
    else:
        pts = np.concatenate(geometry_rings(geom))
    return (
        float(pts[:, 0].min()),
        float(pts[:, 1].min()),
        float(pts[:, 0].max()),
        float(pts[:, 1].max()),
    )


def rect_geometry(left, bottom, right, top) -> dict:
    return {
        "type": "Polygon",
        "coordinates": [
            [
                [left, bottom],
                [right, bottom],
                [right, top],
                [left, top],
                [left, bottom],
            ]
        ],
    }


# ---- point-in-polygon ----------------------------------------------------

def points_in_rings(px: np.ndarray, py: np.ndarray, rings) -> np.ndarray:
    """Even-odd ray-casting PIP for arbitrary point arrays (vectorized over
    points, loop over edges — edge counts are small)."""
    inside = np.zeros(px.shape, dtype=bool)
    for ring in rings:
        x = ring[:, 0]
        y = ring[:, 1]
        x1, y1 = x[:-1], y[:-1]
        x2, y2 = x[1:], y[1:]
        for ex1, ey1, ex2, ey2 in zip(x1, y1, x2, y2):
            if ey1 == ey2:
                continue
            crosses = (ey1 > py) != (ey2 > py)
            with np.errstate(invalid="ignore", divide="ignore"):
                xint = (ex2 - ex1) * (py - ey1) / (ey2 - ey1) + ex1
            inside ^= crosses & (px < xint)
    return inside


def points_in_geometry(px, py, geom) -> np.ndarray:
    return points_in_rings(
        np.asarray(px, dtype=np.float64),
        np.asarray(py, dtype=np.float64),
        geometry_rings(geom),
    )


# ---- rasterization -------------------------------------------------------

def rasterize(
    geometries,
    out_shape: tuple[int, int],
    transform,
    all_touched: bool = False,
) -> np.ndarray:
    """Boolean inside-mask (True where pixels fall inside any geometry)."""
    h, w = out_shape
    mask = np.zeros((h, w), dtype=bool)
    inv = aff.invert(transform)
    for geom in geometries:
        rings = geometry_rings(geom)
        if not rings:
            continue
        # geometry bbox -> pixel sub-window to bound the work
        allpts = np.concatenate(rings)
        cols, rows = aff.apply(inv, allpts[:, 0], allpts[:, 1])
        c0 = max(int(np.floor(cols.min())) - 1, 0)
        c1 = min(int(np.ceil(cols.max())) + 1, w)
        r0 = max(int(np.floor(rows.min())) - 1, 0)
        r1 = min(int(np.ceil(rows.max())) + 1, h)
        if c0 >= c1 or r0 >= r1:
            continue
        sub_cols = np.arange(c0, c1, dtype=np.float64) + 0.5
        sub_rows = np.arange(r0, r1, dtype=np.float64) + 0.5
        cg, rg = np.meshgrid(sub_cols, sub_rows)
        px, py = aff.apply(transform, cg, rg)
        mask[r0:r1, c0:c1] |= points_in_rings(px, py, rings)
        if all_touched:
            for ring in rings:
                rc, rr = aff.apply(inv, ring[:, 0], ring[:, 1])
                pts = np.stack([rc, rr], axis=1)
                for i in range(len(pts) - 1):
                    seg = pts[i + 1] - pts[i]
                    n = max(int(np.ceil(np.abs(seg).max() / 0.25)), 1)
                    t = np.linspace(0.0, 1.0, n + 1)
                    sc = pts[i, 0] + seg[0] * t
                    sr = pts[i, 1] + seg[1] * t
                    ci = np.floor(sc).astype(np.int64)
                    ri = np.floor(sr).astype(np.int64)
                    ok = (ci >= 0) & (ci < w) & (ri >= 0) & (ri < h)
                    mask[ri[ok], ci[ok]] = True
    return mask


def geometry_mask(
    geometries,
    out_shape: tuple[int, int],
    transform,
    all_touched: bool = False,
    invert: bool = False,
) -> np.ndarray:
    """rasterio.features.geometry_mask contract: True OUTSIDE geometries by
    default; invert=True -> True inside (clip passes invert=not invert,
    /root/reference/rioxarray/_spatial_utils.py:479-484)."""
    inside = rasterize(geometries, out_shape, transform, all_touched=all_touched)
    return inside if invert else ~inside


def mask_data_window(keep_mask: np.ndarray):
    """(row_off, col_off, height, width) of the bounding window of True cells
    (rasterio.windows.get_data_window analogue used by clip drop=True)."""
    rows = np.any(keep_mask, axis=1)
    cols = np.any(keep_mask, axis=0)
    if not rows.any():
        return None
    r0 = int(np.argmax(rows))
    r1 = int(len(rows) - np.argmax(rows[::-1]))
    c0 = int(np.argmax(cols))
    c1 = int(len(cols) - np.argmax(cols[::-1]))
    return r0, c0, r1 - r0, c1 - c0


# ---- bbox candidate index (STRtree stand-in) ------------------------------

class BBoxIndex:
    """Flat vectorized bbox index over a geometry list.

    The shapely-STRtree stand-in for candidate pruning in the PIP join actor
    (SURVEY.md §2.6): ``query(bounds)`` returns indices of geometries whose
    bbox intersects.  O(n) vectorized per query — plenty for the broadcast
    small side; swap for a packed R-tree if geometry counts grow.
    """

    def __init__(self, geometries):
        self.geometries = list(geometries)
        if self.geometries:
            b = np.array([geometry_bounds(g) for g in self.geometries])
            self.minx, self.miny, self.maxx, self.maxy = b.T
        else:
            self.minx = self.miny = self.maxx = self.maxy = np.empty(0)

    def query(self, left, bottom, right, top) -> np.ndarray:
        if not self.geometries:
            return np.empty(0, dtype=np.int64)
        hit = (
            (self.minx <= right)
            & (self.maxx >= left)
            & (self.miny <= top)
            & (self.maxy >= bottom)
        )
        return np.nonzero(hit)[0]


def rasterize_values(
    geom_value_pairs,
    out_shape: tuple[int, int],
    transform,
    fill: int = 0,
    all_touched: bool = False,
    merge: str = "replace",
) -> np.ndarray:
    """Value-burn rasterize (rasterio.features.rasterize contract, the
    vector->raster inverse of geometry_mask): paint ``(geom, value)``
    pairs in INPUT ORDER onto an int32 canvas initialised to ``fill``.

    ``merge="replace"`` = rasterio MergeAlg.replace (later shapes
    overwrite earlier ones where they overlap); ``merge="add"`` =
    MergeAlg.add (values accumulate).  Reference behavior anchor:
    rioxarray users burn cutlines/zones via rasterio.features.rasterize
    and wrap the result with the accessor
    (/root/reference/docs/examples/convert_to_raster.ipynb workflow);
    the mask path of the same kernel is geometry_mask
    (/root/reference/rioxarray/raster_array.py clip -> _spatial_utils).
    """
    if merge not in ("replace", "add"):
        raise ValueError(f"merge must be 'replace' or 'add', got {merge!r}")
    out = np.full(out_shape, np.int32(fill), dtype=np.int32)
    for geom, val in geom_value_pairs:
        mask = rasterize(
            [geom], out_shape, transform, all_touched=all_touched
        )
        if merge == "replace":
            out[mask] = np.int32(val)
        else:
            out[mask] += np.int32(val)
    return out
