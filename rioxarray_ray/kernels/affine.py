"""Affine geotransform math.

Reimplements (from public formulas) the subset of the ``affine`` package plus
rioxarray's transform helpers the engine needs:

- affine as a plain 6-tuple ``(a, b, c, d, e, f)`` with
  ``x = a*col + b*row + c`` and ``y = d*col + e*row + f``
  (rasterio ordering; GDAL order is ``(c, a, b, f, d, e)``),
- compose / invert / translation / scale,
- coords <-> affine round-trip with the half-pixel center offset
  (semantics of /root/reference/rioxarray/_spatial_utils.py:92-126),
- bounds / resolution / rotation detection
  (/root/reference/rioxarray/rioxarray.py:733-852, _spatial_utils.py:48-89).

Everything is numpy-vectorized; an "Affine" here is any length-6 sequence of
floats.
"""

from __future__ import annotations

import math

import numpy as np

Affine = tuple[float, float, float, float, float, float]

IDENTITY: Affine = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0)


def from_gdal(c: float, a: float, b: float, f: float, d: float, e: float) -> Affine:
    """GDAL GetGeoTransform order -> rasterio order."""
    return (a, b, c, d, e, f)


def to_gdal(t: Affine) -> tuple[float, float, float, float, float, float]:
    a, b, c, d, e, f = t
    return (c, a, b, f, d, e)


def translation(tx: float, ty: float) -> Affine:
    return (1.0, 0.0, float(tx), 0.0, 1.0, float(ty))


def scale(sx: float, sy: float) -> Affine:
    return (float(sx), 0.0, 0.0, 0.0, float(sy), 0.0)


def compose(t1: Affine, t2: Affine) -> Affine:
    """Return t1 @ t2 (apply t2 first, then t1) — matches Affine.__mul__."""
    a1, b1, c1, d1, e1, f1 = t1
    a2, b2, c2, d2, e2, f2 = t2
    return (
        a1 * a2 + b1 * d2,
        a1 * b2 + b1 * e2,
        a1 * c2 + b1 * f2 + c1,
        d1 * a2 + e1 * d2,
        d1 * b2 + e1 * e2,
        d1 * c2 + e1 * f2 + f1,
    )


def invert(t: Affine) -> Affine:
    a, b, c, d, e, f = t
    det = a * e - b * d
    if det == 0.0:
        raise ValueError("affine transform is not invertible")
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    return (ia, ib, -(ia * c + ib * f), id_, ie, -(id_ * c + ie * f))


def apply(t: Affine, cols, rows):
    """Map (col, row) -> (x, y). Accepts scalars or numpy arrays."""
    a, b, c, d, e, f = t
    cols = np.asarray(cols, dtype=np.float64)
    rows = np.asarray(rows, dtype=np.float64)
    return a * cols + b * rows + c, d * cols + e * rows + f


def apply_inverse(t: Affine, xs, ys):
    """Map (x, y) -> fractional (col, row)."""
    ia = invert(t)
    return apply(ia, xs, ys)


def has_rotation(t: Affine) -> bool:
    """True when b or d are non-zero (semantics of _spatial_utils.py:48-61)."""
    return t[1] != 0.0 or t[3] != 0.0


def resolution(t: Affine) -> tuple[float, float]:
    """(xres, yres) magnitudes; rotation-aware like _spatial_utils.py:64-89."""
    a, b, _, d, e, _ = t
    if b == 0.0 and d == 0.0:
        return abs(a), abs(e)
    return math.hypot(a, d), math.hypot(b, e)


def signed_resolution(t: Affine) -> tuple[float, float]:
    """(a, e) for rectilinear transforms (yres typically negative: north-up)."""
    return t[0], t[4]


def bounds(t: Affine, width: int, height: int) -> tuple[float, float, float, float]:
    """Pixel-EDGE bounds (left, bottom, right, top) of a (height, width) grid.

    Sign-aware ordering as in rioxarray._order_bounds
    (/root/reference/rioxarray/rioxarray.py:812-852): works for any corner
    origin and for rotated transforms (envelope of the 4 corners).
    """
    cols = np.array([0.0, width, 0.0, width])
    rows = np.array([0.0, 0.0, height, height])
    xs, ys = apply(t, cols, rows)
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


def affine_to_coords(t: Affine, width: int, height: int):
    """1-D x/y pixel-CENTER coordinate arrays for a rectilinear transform.

    Mirrors _spatial_utils.affine_to_coords (the ``transform *
    translation(0.5, 0.5)`` pixel-center offset at _spatial_utils.py:117).
    Raises for rotated transforms (caller should use 2-D coords then).
    """
    if has_rotation(t):
        raise ValueError("affine_to_coords requires a rectilinear transform")
    a, _, c, _, e, f = t
    x = c + a * (np.arange(width, dtype=np.float64) + 0.5)
    y = f + e * (np.arange(height, dtype=np.float64) + 0.5)
    return x, y


def coords_to_affine(x: np.ndarray, y: np.ndarray) -> Affine:
    """Recompute a rectilinear affine from 1-D pixel-center coords.

    Semantics of rioxarray's transform(recalc=True)
    (/root/reference/rioxarray/rioxarray.py:413-444):
    translation(left_edge, top_edge) * scale(resx, resy).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if x.size > 1:
        resx = (x[-1] - x[0]) / (x.size - 1)
    else:
        resx = 1.0
    if y.size > 1:
        resy = (y[-1] - y[0]) / (y.size - 1)
    else:
        resy = -1.0
    left = float(x[0]) - resx / 2.0
    top = float(y[0]) - resy / 2.0
    return compose(translation(left, top), scale(resx, resy))


def window_transform(t: Affine, col_off: float, row_off: float) -> Affine:
    """Transform of a window at (col_off, row_off) — rasterio.windows.transform
    semantics used by isel_window (/root/reference/rioxarray/rioxarray.py:854-904)."""
    return compose(t, translation(col_off, row_off))


def window_from_bounds(
    t: Affine,
    left: float,
    bottom: float,
    right: float,
    top: float,
) -> tuple[float, float, float, float]:
    """Fractional (col_off, row_off, width, height) covering the given bounds.

    rasterio.windows.from_bounds semantics (used by clip_box,
    /root/reference/rioxarray/raster_array.py:705-717): transform the two
    opposite corners through the inverse affine and order them.  Rotated
    transforms raise, mirroring rasterio's WindowError contract (two
    corners cannot describe a rotated window).
    """
    if has_rotation(t):
        raise ValueError(
            "window_from_bounds requires a rectilinear (non-rotated) transform"
        )
    cols, rows = apply_inverse(t, np.array([left, right]), np.array([top, bottom]))
    c0, c1 = float(min(cols)), float(max(cols))
    r0, r1 = float(min(rows)), float(max(rows))
    return c0, r0, c1 - c0, r1 - r0
