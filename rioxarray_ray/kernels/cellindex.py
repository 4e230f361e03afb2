"""Hierarchical spatial cell index (H3/S2 stand-in; the ``h3`` package is not
available in this environment — SURVEY.md §7.1.1).

A quadkey-style lon/lat grid: at resolution ``r`` the world is split into
``2**r`` columns over lon in [-180, 180) and ``2**r`` rows over lat in
[-90, 90] (row 0 at the NORTH pole, matching image row order).  Cell ids pack
(res, row, col) into one int64:

    cell_id = (res << 52) | (row << 26) | col        (res <= 25)

This packing is deliberately simple arithmetic so a DuckDB oracle can
reproduce it exactly:  ``res * 2**52 + row * 2**26 + col`` with
``col = floor((lon+180)/360 * 2**res)``, ``row = floor((90-lat)/180 * 2**res)``.

API mirrors the h3 operations the engine needs: point->cell, cell bounds,
parent/children, k-ring neighborhoods, and bbox covering (used for clip_box
cell-range pushdown, SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np

MAX_RES = 25
_ROW_SHIFT = 26
_RES_SHIFT = 52
_MASK = (1 << 26) - 1


def cell(lon, lat, res: int):
    """Vectorized (lon, lat) -> packed cell id (int64)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    n = np.int64(1) << res
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    col = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    row = np.floor((90.0 - lat) / 180.0 * n).astype(np.int64)
    col = np.clip(col, 0, n - 1)
    row = np.clip(row, 0, n - 1)
    return (np.int64(res) << _RES_SHIFT) | (row << _ROW_SHIFT) | col


def unpack(cell_id):
    """cell id -> (res, row, col), vectorized."""
    c = np.asarray(cell_id, dtype=np.int64)
    return (c >> _RES_SHIFT).astype(np.int64), (c >> _ROW_SHIFT) & _MASK, c & _MASK


def pack(res, row, col):
    res = np.asarray(res, dtype=np.int64)
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    return (res << _RES_SHIFT) | (row << _ROW_SHIFT) | col


def cell_bounds(cell_id):
    """(lon_min, lat_min, lon_max, lat_max) of a cell, vectorized."""
    res, row, col = unpack(cell_id)
    n = (np.int64(1) << res).astype(np.float64)
    lon0 = col / n * 360.0 - 180.0
    lon1 = (col + 1) / n * 360.0 - 180.0
    lat1 = 90.0 - row / n * 180.0
    lat0 = 90.0 - (row + 1) / n * 180.0
    return lon0, lat0, lon1, lat1


def parent(cell_id, parent_res: int):
    res, row, col = unpack(cell_id)
    shift = res - parent_res
    if np.any(shift < 0):
        raise ValueError("parent_res must be <= cell res")
    return pack(parent_res, row >> shift, col >> shift)


def children(cell_id: int) -> list[int]:
    res, row, col = unpack(int(cell_id))
    res, row, col = int(res), int(row), int(col)
    if res >= MAX_RES:
        raise ValueError(f"children beyond MAX_RES={MAX_RES} would overflow")
    return [
        int(pack(res + 1, 2 * row + dr, 2 * col + dc))
        for dr in (0, 1)
        for dc in (0, 1)
    ]


def ring(cell_id: int, k: int) -> list[int]:
    """All cells within Chebyshev distance k (the h3 ``grid_disk`` analogue;
    used by kNN ring expansion, SURVEY.md §2.6). Lon wraps; lat clamps."""
    res, row, col = unpack(int(cell_id))
    res, row, col = int(res), int(row), int(col)
    n = 1 << res
    out = []
    seen = set()
    for dr in range(-k, k + 1):
        r = row + dr
        if r < 0 or r >= n:
            continue
        for dc in range(-k, k + 1):
            cid = int(pack(res, r, (col + dc) % n))
            if cid not in seen:  # lon wrap can revisit cells when 2k+1 > n
                seen.add(cid)
                out.append(cid)
    return out


def shell(cell_id: int, k: int) -> list[int]:
    """Cells at EXACTLY Chebyshev distance k (the perimeter of ring(k)) —
    O(k) construction, used by kNN ring expansion."""
    if k == 0:
        return [int(cell_id)]
    res, row, col = unpack(int(cell_id))
    res, row, col = int(res), int(row), int(col)
    n = 1 << res
    out = []
    seen = set()

    def add(r, c):
        if 0 <= r < n:
            cid = int(pack(res, r, c % n))
            if cid not in seen:  # dedupe lon wrap (2k+1 > n)
                seen.add(cid)
                out.append(cid)

    for dc in range(-k, k + 1):
        add(row - k, col + dc)
        add(row + k, col + dc)
    for dr in range(-k + 1, k):
        add(row + dr, col - k)
        add(row + dr, col + k)
    return out


def cells_for_bbox(
    lon_min: float, lat_min: float, lon_max: float, lat_max: float, res: int
) -> np.ndarray:
    """All cells intersecting a bbox (clip_box pushdown). No antimeridian wrap
    (the reference raises on antimeridian boxes too,
    /root/reference/rioxarray/raster_array.py:694-704)."""
    n = 1 << res
    eps = 1e-12
    c0 = int(np.clip(np.floor((lon_min + 180.0) / 360.0 * n), 0, n - 1))
    c1 = int(np.clip(np.floor((lon_max - eps + 180.0) / 360.0 * n), 0, n - 1))
    r0 = int(np.clip(np.floor((90.0 - lat_max) / 180.0 * n), 0, n - 1))
    r1 = int(np.clip(np.floor((90.0 - lat_min - eps) / 180.0 * n), 0, n - 1))
    # degenerate (point/edge) bboxes on a cell boundary: the eps shift can
    # land the "max" cell west/north of the "min" cell — clamp so the
    # containing cell is always returned
    c1 = max(c1, c0)
    r1 = max(r1, r0)
    rows, cols = np.meshgrid(
        np.arange(r0, r1 + 1, dtype=np.int64),
        np.arange(c0, c1 + 1, dtype=np.int64),
        indexing="ij",
    )
    return pack(np.int64(res), rows.ravel(), cols.ravel())


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each int64 into even bit positions
    (Morton encode helper, the standard magic-number dilation)."""
    x = np.asarray(x, dtype=np.int64) & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def morton(cell_id) -> np.ndarray:
    """Z-order (Morton) key of a cell: bit-interleave (row, col) so that
    sorting by the key clusters spatially adjacent cells — the
    space-filling-curve layout order used to cluster output files for
    locality (Delta/Iceberg Z-ORDER analogue; res <= 16 fits int64).
    Row bits land in the ODD positions, col bits in the EVEN ones."""
    res, row, col = unpack(cell_id)
    if np.any(res > 16):
        raise ValueError("morton supports res <= 16 (32-bit key)")
    return (_part1by1(row) << 1) | _part1by1(col)
