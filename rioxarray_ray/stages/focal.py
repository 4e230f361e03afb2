"""Focal (moving-window) statistics over halo'd tiles.

The reference recipe is xarray's ``DataArray.rolling(x=k, y=k)
.mean()`` / ``.sum()`` over a rioxarray-opened raster (rioxarray defers
rolling to xarray; the georeferencing survives because rolling preserves
dims — see /root/reference/rioxarray/raster_array.py accessor docs).

Ray-Data recast: tiles cut WITH a halo (stages/tile.py ``halo >= radius``)
make the op embarrassingly parallel — each tile computes its CORE region
exactly from local data, so there is NO shuffle at all; at 100 TB this is
a single streaming map_batches pass whose output equals its input volume.
Windows clamp at image edges (fewer neighbors), matching
``rolling(..., min_periods=1)`` semantics; nodata pixels contribute
neither value nor count, and the mean at an INVALID center is NaN.

Partitioning assumption (documented per the custom-operator rule): every
tile must carry a halo >= radius on each interior side; tiles whose
top/left margin is too thin (and not at the image edge) raise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FOCAL_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("band", pa.int32()),
        ("win_row_off", pa.int32()),
        ("win_col_off", pa.int32()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("focal_sum", pa.list_(pa.float64())),
        ("focal_cnt", pa.list_(pa.int32())),
        ("mean", pa.list_(pa.float64())),
    ]
)


def focal_sum_count(values: np.ndarray, vm: np.ndarray, radius: int):
    """(bands, h, w) windowed sum + count of VALID pixels, Chebyshev
    ``radius`` window, zero beyond the array (callers guarantee the array
    extends ``radius`` past the region they read, or ends at an image
    edge).  (2*radius+1)^2 shifted adds — vectorized, no per-pixel loop."""
    b, h, w = values.shape
    v = np.where(vm, values.astype(np.float64), 0.0)
    cnt = vm.astype(np.int64)
    pad = radius
    vp = np.pad(v, ((0, 0), (pad, pad), (pad, pad)))
    cp = np.pad(cnt, ((0, 0), (pad, pad), (pad, pad)))
    s = np.zeros((b, h, w), dtype=np.float64)
    c = np.zeros((b, h, w), dtype=np.int64)
    for dr in range(-radius, radius + 1):
        for dc in range(-radius, radius + 1):
            s += vp[:, pad + dr : pad + dr + h, pad + dc : pad + dc + w]
            c += cp[:, pad + dr : pad + dr + h, pad + dc : pad + dc + w]
    return s, c


def focal_mean_stage(tiles_ds, radius: int = 1, **map_kwargs):
    """Per-pixel focal mean over every tile's core region.

    Returns one row per (tile, band): core-sized ``focal_sum`` (float64,
    exact for integer rasters), ``focal_cnt`` and ``mean`` (NaN at invalid
    centers) payloads, plus the core's absolute window offsets.
    """
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    def run(batch: pa.Table) -> pa.Table:
        out = {name: [] for name in FOCAL_SCHEMA.names}
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            cr, cc = row["core_roff"], row["core_coff"]
            ch, cw = row["core_h"], row["core_w"]
            for off, name in ((cr, "row"), (cc, "col")):
                if off < radius and row[f"win_{name}_off"] != off:
                    raise ValueError(
                        f"focal radius {radius} needs tiles cut with "
                        f"halo >= {radius} (stages/tile.py tile_stage "
                        f"halo=...); got a {off}-px {name} margin"
                    )
            nod = row["nodata"]
            if nod != nod:
                nod = (
                    None
                    if np.dtype(row["dtype"]).kind in "iu"
                    else float("nan")
                )
            vm = valid_mask(pixels, nod)
            s, c = focal_sum_count(pixels, vm, radius)
            s = s[:, cr : cr + ch, cc : cc + cw]
            c = c[:, cr : cr + ch, cc : cc + cw]
            core_vm = vm[:, cr : cr + ch, cc : cc + cw]
            with np.errstate(invalid="ignore", divide="ignore"):
                m = np.where(core_vm, s / np.maximum(c, 1), np.nan)
            for b in range(pixels.shape[0]):
                out["image_id"].append(row["image_id"])
                out["tile_row"].append(row["tile_row"])
                out["tile_col"].append(row["tile_col"])
                out["band"].append(b)
                out["win_row_off"].append(row["win_row_off"])
                out["win_col_off"].append(row["win_col_off"])
                out["h"].append(ch)
                out["w"].append(cw)
                out["focal_sum"].append(s[b].ravel())
                out["focal_cnt"].append(c[b].ravel().astype(np.int32))
                out["mean"].append(m[b].ravel())
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in FOCAL_SCHEMA],
            schema=FOCAL_SCHEMA,
        )

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return tiles_ds.map_batches(run, **kwargs)


TERRAIN_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("band", pa.int32()),
        ("win_row_off", pa.int32()),
        ("win_col_off", pa.int32()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("gx_num", pa.list_(pa.float64())),
        ("gy_num", pa.list_(pa.float64())),
        ("slope_deg", pa.list_(pa.float64())),
        ("aspect_deg", pa.list_(pa.float64())),
        ("hillshade", pa.list_(pa.float64())),
    ]
)

#: Horn 1981 3x3 gradient kernels (the GDALDEM / xrspatial convention):
#: gx_num = (z_ne + 2 z_e + z_se) - (z_nw + 2 z_w + z_sw), y points DOWN
#: the row axis (north up in the raster), so gy_num is the same stencil
#: transposed.  dz/dx = gx_num / (8 * xres).
_HORN_X = {(-1, 1): 1.0, (0, 1): 2.0, (1, 1): 1.0,
           (-1, -1): -1.0, (0, -1): -2.0, (1, -1): -1.0}
_HORN_Y = {(1, -1): 1.0, (1, 0): 2.0, (1, 1): 1.0,
           (-1, -1): -1.0, (-1, 0): -2.0, (-1, 1): -1.0}


def horn_gradients(values: np.ndarray, vm: np.ndarray):
    """(gx_num, gy_num, interior) per pixel: Horn stencil numerators, and
    the mask of pixels whose FULL 3x3 window is in-array AND valid (the
    only pixels the stencil is defined on — edge/nodata-adjacent pixels
    are masked, matching the oracle's count-9 rule)."""
    b, h, w = values.shape
    z = np.where(vm, values.astype(np.float64), 0.0)
    zp = np.pad(z, ((0, 0), (1, 1), (1, 1)))
    vp = np.pad(vm.astype(np.int64), ((0, 0), (1, 1), (1, 1)))
    gx = np.zeros((b, h, w), dtype=np.float64)
    gy = np.zeros_like(gx)
    cnt = np.zeros((b, h, w), dtype=np.int64)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            sh_z = zp[:, 1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
            cnt += vp[:, 1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
            wx = _HORN_X.get((dr, dc))
            if wx:
                gx += wx * sh_z
            wy = _HORN_Y.get((dr, dc))
            if wy:
                gy += wy * sh_z
    return gx, gy, cnt == 9


def terrain_stage(tiles_ds, z_factor: float = 1.0, azimuth: float = 315.0,
                  altitude: float = 45.0, **map_kwargs):
    """Slope / aspect / hillshade from halo'd tiles — the GDALDEM /
    xrspatial terrain recipe over a rioxarray-opened DEM, Horn's method.

    Same zero-shuffle shape as :func:`focal_mean_stage` (each tile's core
    is exact from its halo; halo >= 1 validated).  Cell size comes from
    each tile's own transform.  Emits per (tile, band): the INTEGER Horn
    numerators ``gx_num``/``gy_num`` (exact for integer rasters — the
    oracle-gateable part) plus derived ``slope_deg`` / ``aspect_deg``
    (gdaldem convention: 0=N, clockwise, -9999 on flat) / ``hillshade``
    (0..255); all NaN outside the interior-and-valid mask.
    """
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    def run(batch: pa.Table) -> pa.Table:
        out = {name: [] for name in TERRAIN_SCHEMA.names}
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            cr, cc = row["core_roff"], row["core_coff"]
            ch, cw = row["core_h"], row["core_w"]
            for off, name in ((cr, "row"), (cc, "col")):
                if off < 1 and row[f"win_{name}_off"] != off:
                    raise ValueError(
                        "terrain_stage needs tiles cut with halo >= 1"
                    )
            nod = row["nodata"]
            if nod != nod:
                nod = (
                    None
                    if np.dtype(row["dtype"]).kind in "iu"
                    else float("nan")
                )
            vm = valid_mask(pixels, nod)
            gx, gy, interior = horn_gradients(pixels, vm)
            t = tuple(row["transform"])
            xres, yres = abs(t[0]), abs(t[4])
            sl = (cr, cr + ch, cc, cc + cw)
            for b in range(pixels.shape[0]):
                gxb = gx[b, sl[0] : sl[1], sl[2] : sl[3]]
                gyb = gy[b, sl[0] : sl[1], sl[2] : sl[3]]
                ok = interior[b, sl[0] : sl[1], sl[2] : sl[3]]
                dzdx = z_factor * gxb / (8.0 * xres)
                dzdy = z_factor * gyb / (8.0 * yres)
                slope = np.degrees(np.arctan(np.hypot(dzdx, dzdy)))
                # gdaldem aspect: bearing the slope FACES (downslope),
                # 0 = north, clockwise; flat -> -9999.  Downslope vector
                # in geographic components: east = -dzdx, north = +dzdy
                # (+row = south), bearing = atan2(east, north).
                asp = np.degrees(np.arctan2(-dzdx, dzdy))
                asp = np.where(asp < 0.0, asp + 360.0, asp)
                flat = (gxb == 0.0) & (gyb == 0.0)
                asp = np.where(flat, -9999.0, asp)
                zen = np.radians(90.0 - altitude)
                azr = np.radians(azimuth)
                sr = np.radians(slope)
                # aspect measured from north clockwise; hillshade formula
                # wants the trig aspect — use components directly
                with np.errstate(invalid="ignore", divide="ignore"):
                    denom = np.hypot(dzdx, dzdy)
                    hs = 255.0 * (
                        np.cos(zen) * np.cos(sr)
                        + np.sin(zen)
                        * np.sin(sr)
                        * np.where(
                            denom > 0,
                            (
                                np.sin(azr) * np.divide(
                                    -dzdx, denom,
                                    out=np.zeros_like(dzdx), where=denom > 0)
                                + np.cos(azr) * np.divide(
                                    dzdy, denom,
                                    out=np.zeros_like(dzdy), where=denom > 0)
                            ),
                            0.0,
                        )
                    )
                hs = np.clip(hs, 0.0, 255.0)
                nanf = lambda a: np.where(ok, a, np.nan)
                out["image_id"].append(row["image_id"])
                out["tile_row"].append(row["tile_row"])
                out["tile_col"].append(row["tile_col"])
                out["band"].append(b)
                out["win_row_off"].append(row["win_row_off"])
                out["win_col_off"].append(row["win_col_off"])
                out["h"].append(ch)
                out["w"].append(cw)
                out["gx_num"].append(nanf(gxb).ravel())
                out["gy_num"].append(nanf(gyb).ravel())
                out["slope_deg"].append(nanf(slope).ravel())
                out["aspect_deg"].append(nanf(asp).ravel())
                out["hillshade"].append(nanf(hs).ravel())
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in TERRAIN_SCHEMA],
            schema=TERRAIN_SCHEMA,
        )

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return tiles_ds.map_batches(run, **kwargs)


MODE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("band", pa.int32()),
        ("win_row_off", pa.int32()),
        ("win_col_off", pa.int32()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("mode", pa.list_(pa.int64())),
        ("n_modal", pa.list_(pa.int32())),
        ("valid", pa.list_(pa.bool_())),
    ]
)

_MODE_PAD = np.int64(1) << 62  # sorts after every real value


def focal_mode(values: np.ndarray, vm: np.ndarray, radius: int):
    """Windowed MAJORITY of valid pixels (Chebyshev ``radius``), ties to
    the SMALLEST value — the focal-statistics MAJORITY / categorical
    smoothing kernel.  Fully vectorized: the (2r+1)^2 shifted layers are
    sorted along the stack axis (invalid -> +inf sentinel), run lengths
    fold in one pass over the <= (2r+1)^2 layers, and the lexicographic
    (count desc, value asc) winner is tracked with elementwise compares.

    Returns (mode int64, n_modal int64) — undefined (0 count) where the
    window holds no valid pixel."""
    b, h, w = values.shape
    k = 2 * radius + 1
    stack = np.full((k * k, b, h, w), _MODE_PAD, np.int64)
    i = 0
    for dr in range(-radius, radius + 1):
        for dc in range(-radius, radius + 1):
            rs = slice(max(dr, 0), h + min(dr, 0))
            rd = slice(max(-dr, 0), h + min(-dr, 0))
            cs = slice(max(dc, 0), w + min(dc, 0))
            cd = slice(max(-dc, 0), w + min(-dc, 0))
            layer = stack[i]
            layer[:, rd, cd] = np.where(
                vm[:, rs, cs], values[:, rs, cs].astype(np.int64),
                _MODE_PAD,
            )
            i += 1
    stack.sort(axis=0)
    best_val = np.full((b, h, w), _MODE_PAD, np.int64)
    best_len = np.zeros((b, h, w), np.int64)
    run = np.zeros((b, h, w), np.int64)
    prev = np.full((b, h, w), _MODE_PAD, np.int64)
    for layer in stack:
        real = layer < _MODE_PAD
        run = np.where(real & (layer == prev), run + 1,
                       np.where(real, 1, 0))
        prev = layer
        better = (run > best_len) | ((run == best_len) & (layer < best_val))
        better &= real
        best_val = np.where(better, layer, best_val)
        best_len = np.where(better, run, best_len)
    return best_val, best_len


def focal_mode_stage(tiles_ds, radius: int = 1, **map_kwargs):
    """Per-pixel focal majority over every tile's core region (same
    zero-shuffle halo contract as focal_mean_stage).  One row per
    (tile, band) with core-sized ``mode``/``n_modal``/``valid`` payloads;
    ``valid`` marks centers that are themselves valid AND whose window
    holds at least one valid pixel (always true when the center is)."""
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    def run(batch: pa.Table) -> pa.Table:
        out = {name: [] for name in MODE_SCHEMA.names}
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            cr, cc = row["core_roff"], row["core_coff"]
            ch, cw = row["core_h"], row["core_w"]
            for off, name in ((cr, "row"), (cc, "col")):
                if off < radius and row[f"win_{name}_off"] != off:
                    raise ValueError(
                        f"focal radius {radius} needs tiles cut with "
                        f"halo >= {radius} (stages/tile.py tile_stage "
                        f"halo=...); got a {off}-px {name} margin"
                    )
            nod = row["nodata"]
            if nod != nod:
                nod = (
                    None
                    if np.dtype(row["dtype"]).kind in "iu"
                    else float("nan")
                )
            vm = valid_mask(pixels, nod)
            mode, n_modal = focal_mode(pixels, vm, radius)
            sl = np.s_[:, cr : cr + ch, cc : cc + cw]
            mode, n_modal, core_vm = mode[sl], n_modal[sl], vm[sl]
            mode = np.where(core_vm, mode, 0)
            for b in range(pixels.shape[0]):
                out["image_id"].append(row["image_id"])
                out["tile_row"].append(row["tile_row"])
                out["tile_col"].append(row["tile_col"])
                out["band"].append(b)
                out["win_row_off"].append(row["win_row_off"])
                out["win_col_off"].append(row["win_col_off"])
                out["h"].append(ch)
                out["w"].append(cw)
                out["mode"].append(mode[b].ravel())
                out["n_modal"].append(
                    n_modal[b].ravel().astype(np.int32)
                )
                out["valid"].append(core_vm[b].ravel())
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in MODE_SCHEMA],
            schema=MODE_SCHEMA,
        )

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return tiles_ds.map_batches(run, **kwargs)


TERRAIN_IDX_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("band", pa.int32()),
        ("win_row_off", pa.int32()),
        ("win_col_off", pa.int32()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("tri_sum", pa.list_(pa.int64())),
        ("tpi8", pa.list_(pa.int64())),
        ("roughness", pa.list_(pa.int64())),
        ("defined", pa.list_(pa.bool_())),
    ]
)


def terrain_indices(values: np.ndarray, vm: np.ndarray):
    """gdaldem TRI / TPI / roughness, as INTEGER-EXACT numerators over
    the full-3x3-valid interior (the gdaldem no-compute_edges contract,
    same ``defined`` mask as the Horn stencil):

    - ``tri_sum``  = sum over the 8 neighbors of |z_n - z_c|
      (TRI, Riley 1999 = tri_sum / 8);
    - ``tpi8``     = 8*z_c - sum of the 8 neighbors
      (TPI, Weiss 2001 = tpi8 / 8 — positive on ridges, negative in
      valleys);
    - ``roughness`` = max - min over the full 3x3 window (already the
      gdaldem value, no division).

    Returns (tri_sum, tpi8, roughness, defined) int64/bool arrays."""
    b, h, w = values.shape
    z = values.astype(np.int64, copy=False)
    zp = np.pad(np.where(vm, z, 0), ((0, 0), (1, 1), (1, 1)))
    vp = np.pad(vm, ((0, 0), (1, 1), (1, 1)))
    tri = np.zeros((b, h, w), np.int64)
    nsum = np.zeros((b, h, w), np.int64)
    mx = np.where(vm, z, np.int64(-(1 << 62)))
    mn = np.where(vm, z, np.int64(1 << 62))
    cnt = vm.astype(np.int64).copy()
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            nz = zp[:, 1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
            nv = vp[:, 1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
            cnt += nv
            tri += np.where(nv, np.abs(nz - z), 0)
            nsum += np.where(nv, nz, 0)
            mx = np.maximum(mx, np.where(nv, nz, np.int64(-(1 << 62))))
            mn = np.minimum(mn, np.where(nv, nz, np.int64(1 << 62)))
    defined = (cnt == 9) & vm
    zero = np.zeros((b, h, w), np.int64)
    return (
        np.where(defined, tri, zero),
        np.where(defined, 8 * z - nsum, zero),
        np.where(defined, mx - mn, zero),
        defined,
    )


def terrain_indices_stage(tiles_ds, **map_kwargs):
    """gdaldem TRI / TPI / roughness over every tile's core region (the
    remaining gdaldem modes next to terrain_stage's slope/aspect/
    hillshade) — same zero-shuffle halo>=1 contract; integer-exact
    payloads per (tile, band) (TERRAIN_IDX_SCHEMA)."""
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    def run(batch: pa.Table) -> pa.Table:
        out = {name: [] for name in TERRAIN_IDX_SCHEMA.names}
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            cr, cc = row["core_roff"], row["core_coff"]
            ch, cw = row["core_h"], row["core_w"]
            for off, name in ((cr, "row"), (cc, "col")):
                if off < 1 and row[f"win_{name}_off"] != off:
                    raise ValueError(
                        "terrain_indices_stage needs tiles cut with "
                        "halo >= 1 (stages/tile.py tile_stage halo=...); "
                        f"got a {off}-px {name} margin"
                    )
            nod = row["nodata"]
            if nod != nod:
                nod = (
                    None
                    if np.dtype(row["dtype"]).kind in "iu"
                    else float("nan")
                )
            vm = valid_mask(pixels, nod)
            tri, tpi, rough, defined = terrain_indices(pixels, vm)
            sl = np.s_[:, cr : cr + ch, cc : cc + cw]
            tri, tpi, rough, defined = (
                tri[sl], tpi[sl], rough[sl], defined[sl]
            )
            for b in range(pixels.shape[0]):
                out["image_id"].append(row["image_id"])
                out["tile_row"].append(row["tile_row"])
                out["tile_col"].append(row["tile_col"])
                out["band"].append(b)
                out["win_row_off"].append(row["win_row_off"])
                out["win_col_off"].append(row["win_col_off"])
                out["h"].append(ch)
                out["w"].append(cw)
                out["tri_sum"].append(tri[b].ravel())
                out["tpi8"].append(tpi[b].ravel())
                out["roughness"].append(rough[b].ravel())
                out["defined"].append(defined[b].ravel())
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in TERRAIN_IDX_SCHEMA],
            schema=TERRAIN_IDX_SCHEMA,
        )

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return tiles_ds.map_batches(run, **kwargs)


FLOWDIR_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("band", pa.int32()),
        ("win_row_off", pa.int32()),
        ("win_col_off", pa.int32()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("flowdir", pa.list_(pa.int64())),
        ("defined", pa.list_(pa.bool_())),
    ]
)

#: D8 direction codes (ESRI convention): E=1, SE=2, S=4, SW=8, W=16,
#: NW=32, N=64, NE=128; 0 = flat or pit (no positive drop).
_D8 = (
    (0, 1, 1, False),    # E
    (1, 1, 2, True),     # SE
    (1, 0, 4, False),    # S
    (1, -1, 8, True),    # SW
    (0, -1, 16, False),  # W
    (-1, -1, 32, True),  # NW
    (-1, 0, 64, False),  # N
    (-1, 1, 128, True),  # NE
)


def flow_direction(values: np.ndarray, vm: np.ndarray):
    """D8 steepest-descent flow direction (ESRI codes; the hydrology
    front end of the gdaldem/richdem family), INTEGER-EXACT:

    slope to a straight neighbor = drop/1, to a diagonal = drop/sqrt(2);
    among neighbors with POSITIVE drop the comparison
    ``drop_s / 1 > drop_d / sqrt(2)`` is decided by the integer key
    ``2*drop^2`` (straight) vs ``drop^2`` (diagonal) — no irrational
    arithmetic, so the oracle replays it in SQL.  Ties break to the
    SMALLEST direction code; no positive drop -> 0 (flat/pit).  Defined
    only where the full 3x3 window is valid (the terrain-stage interior
    contract).

    Returns (flowdir int64, defined bool)."""
    b, h, w = values.shape
    z = values.astype(np.int64, copy=False)
    zp = np.pad(np.where(vm, z, 0), ((0, 0), (1, 1), (1, 1)))
    vp = np.pad(vm, ((0, 0), (1, 1), (1, 1)))
    best_key = np.zeros((b, h, w), np.int64)
    best_dir = np.zeros((b, h, w), np.int64)
    cnt = vm.astype(np.int64).copy()
    for dr, dc, code, diag in _D8:
        nz = zp[:, 1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
        nv = vp[:, 1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w]
        cnt += nv
        drop = np.where(nv, z - nz, 0)
        key = np.where(drop > 0,
                       drop * drop * (1 if diag else 2), 0)
        better = key > best_key  # codes iterate ascending: ties keep min
        best_key = np.where(better, key, best_key)
        best_dir = np.where(better, code, best_dir)
    defined = (cnt == 9) & vm
    return np.where(defined, best_dir, 0), defined


def flow_direction_stage(tiles_ds, **map_kwargs):
    """D8 flow direction over every tile's core region — same
    zero-shuffle halo>=1 contract as the terrain stages."""
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    def run(batch: pa.Table) -> pa.Table:
        out = {name: [] for name in FLOWDIR_SCHEMA.names}
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            cr, cc = row["core_roff"], row["core_coff"]
            ch, cw = row["core_h"], row["core_w"]
            for off, name in ((cr, "row"), (cc, "col")):
                if off < 1 and row[f"win_{name}_off"] != off:
                    raise ValueError(
                        "flow_direction_stage needs tiles cut with "
                        "halo >= 1 (stages/tile.py tile_stage halo=...); "
                        f"got a {off}-px {name} margin"
                    )
            nod = row["nodata"]
            if nod != nod:
                nod = (
                    None
                    if np.dtype(row["dtype"]).kind in "iu"
                    else float("nan")
                )
            vm = valid_mask(pixels, nod)
            fd, defined = flow_direction(pixels, vm)
            sl = np.s_[:, cr : cr + ch, cc : cc + cw]
            fd, defined = fd[sl], defined[sl]
            for b in range(pixels.shape[0]):
                out["image_id"].append(row["image_id"])
                out["tile_row"].append(row["tile_row"])
                out["tile_col"].append(row["tile_col"])
                out["band"].append(b)
                out["win_row_off"].append(row["win_row_off"])
                out["win_col_off"].append(row["win_col_off"])
                out["h"].append(ch)
                out["w"].append(cw)
                out["flowdir"].append(fd[b].ravel())
                out["defined"].append(defined[b].ravel())
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in FLOWDIR_SCHEMA],
            schema=FLOWDIR_SCHEMA,
        )

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return tiles_ds.map_batches(run, **kwargs)


FLOWACC_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("band", pa.int32()),
        ("win_row_off", pa.int32()),
        ("win_col_off", pa.int32()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("flowacc", pa.list_(pa.int64())),
        ("defined", pa.list_(pa.bool_())),
    ]
)

_D8_BY_CODE = {code: (dr, dc) for dr, dc, code, _ in _D8}


def flow_accumulation(fd: np.ndarray, defined: np.ndarray) -> np.ndarray:
    """Upstream cell count per cell (the cell itself included — ESRI
    flow accumulation + 1) over a D8 direction grid: acc(c) = 1 + sum of
    acc over cells draining into c.  Cells with undefined direction
    still RECEIVE inflow but contribute nothing downstream (their code
    is 0 = pit) — matching the per-cell defined mask.

    Vectorized fixpoint: one shifted add per direction per round; rounds
    = longest flow path (bounded by the image diagonal; the D8 graph is
    acyclic because flow strictly descends)."""
    h, w = fd.shape
    acc = np.ones((h, w), np.int64)
    while True:
        inflow = np.zeros((h, w), np.int64)
        for code, (dr, dc) in _D8_BY_CODE.items():
            # cells with code drain TOWARD (dr, dc): their acc arrives at
            # the neighbor in that direction
            src = fd == code
            rs = slice(max(-dr, 0), h + min(-dr, 0))
            cs = slice(max(-dc, 0), w + min(-dc, 0))
            rd = slice(max(dr, 0), h + min(dr, 0))
            cd = slice(max(dc, 0), w + min(dc, 0))
            inflow[rd, cd] += np.where(src[rs, cs], acc[rs, cs], 0)
        new = 1 + inflow
        if np.array_equal(new, acc):
            return np.where(defined, acc, 0)
        acc = new


def flow_accumulation_stage(tiles_ds, **map_kwargs):
    """D8 flow accumulation — image-global (water crosses tiles), so ONE
    ``groupby(image_id)`` co-shuffle assembles each image (the
    region_label_stage shape), directions come from the shared
    :func:`flow_direction` kernel, and the upstream-count fixpoint runs
    vectorized in the task.  Output rows are per (image, band, 64-window)
    with ``flowacc`` payloads (0 where direction undefined)."""
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    def acc_group(group: pa.Table) -> pa.Table:
        meta = group.drop_columns(["pixels"]).to_pylist()
        views = list(pixel_views(group))
        if not meta:
            return FLOWACC_SCHEMA.empty_table()
        H = max(r["win_row_off"] + r["h"] for r in meta)
        W = max(r["win_col_off"] + r["w"] for r in meta)
        bands = views[0].shape[0]
        iid = meta[0]["image_id"]
        out: dict[str, list] = {n: [] for n in FLOWACC_SCHEMA.names}
        full = np.zeros((bands, H, W), np.int64)
        fvm = np.zeros((bands, H, W), bool)
        for row, px in zip(meta, views):
            nod = row["nodata"]
            if nod != nod:
                nod = (None if np.dtype(row["dtype"]).kind in "iu"
                       else float("nan"))
            vm = valid_mask(px, nod)
            ro, co = row["win_row_off"], row["win_col_off"]
            full[:, ro:ro + row["h"], co:co + row["w"]] = \
                px.astype(np.int64)
            fvm[:, ro:ro + row["h"], co:co + row["w"]] = vm
        fd, defined = flow_direction(full, fvm)
        for b in range(bands):
            acc = flow_accumulation(fd[b], defined[b])
            for ro in range(0, H, 64):
                for co in range(0, W, 64):
                    blk = acc[ro:ro + 64, co:co + 64]
                    dblk = defined[b, ro:ro + 64, co:co + 64]
                    if not dblk.any():
                        continue
                    out["image_id"].append(iid)
                    out["band"].append(b)
                    out["win_row_off"].append(ro)
                    out["win_col_off"].append(co)
                    out["h"].append(blk.shape[0])
                    out["w"].append(blk.shape[1])
                    out["flowacc"].append(blk.ravel())
                    out["defined"].append(dblk.ravel())
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in FLOWACC_SCHEMA],
            schema=FLOWACC_SCHEMA,
        )

    return tiles_ds.groupby("image_id").map_groups(
        acc_group, batch_format="pyarrow", **map_kwargs
    )


WATERSHED_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("band", pa.int32()),
        ("win_row_off", pa.int32()),
        ("win_col_off", pa.int32()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("basin", pa.list_(pa.int64())),
        ("defined", pa.list_(pa.bool_())),
    ]
)


def watershed_labels(fd: np.ndarray, defined: np.ndarray) -> np.ndarray:
    """Basin label per cell = the flat index (r*w + c) of the TERMINAL
    its D8 flow path drains to (a pit, flat, or edge cell with code 0) —
    watershed delineation over the flow-direction grid.  Pointer
    jumping: next[next] doubling converges in O(log longest-path)
    rounds, fully vectorized.  Undefined cells label -1."""
    h, w = fd.shape
    idx = np.arange(h * w, dtype=np.int64)
    nxt = idx.copy()
    rr, cc = np.divmod(idx, w)
    for dr, dc, code, _ in _D8:
        m = fd.ravel() == code
        nxt[m] = (rr[m] + dr) * w + (cc[m] + dc)
    while True:
        nn = nxt[nxt]
        if np.array_equal(nn, nxt):
            break
        nxt = nn
    return np.where(defined.ravel(), nxt, -1).reshape(h, w)


def watershed_stage(tiles_ds, **map_kwargs):
    """Watershed delineation — basin labels over the D8 flow graph
    (image-global: basins cross tiles), the third member of the
    hydrology trio next to flow_direction/flow_accumulation.  Same ONE
    groupby(image_id) shape; labels are terminal flat indices, so the
    labeling is schedule-independent (no arbitrary relabeling)."""
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    def ws_group(group: pa.Table) -> pa.Table:
        meta = group.drop_columns(["pixels"]).to_pylist()
        views = list(pixel_views(group))
        if not meta:
            return WATERSHED_SCHEMA.empty_table()
        H = max(r["win_row_off"] + r["h"] for r in meta)
        W = max(r["win_col_off"] + r["w"] for r in meta)
        bands = views[0].shape[0]
        iid = meta[0]["image_id"]
        out: dict[str, list] = {n: [] for n in WATERSHED_SCHEMA.names}
        full = np.zeros((bands, H, W), np.int64)
        fvm = np.zeros((bands, H, W), bool)
        for row, px in zip(meta, views):
            nod = row["nodata"]
            if nod != nod:
                nod = (None if np.dtype(row["dtype"]).kind in "iu"
                       else float("nan"))
            vm = valid_mask(px, nod)
            ro, co = row["win_row_off"], row["win_col_off"]
            full[:, ro:ro + row["h"], co:co + row["w"]] = \
                px.astype(np.int64)
            fvm[:, ro:ro + row["h"], co:co + row["w"]] = vm
        fd, defined = flow_direction(full, fvm)
        for b in range(bands):
            basin = watershed_labels(fd[b], defined[b])
            for ro in range(0, H, 64):
                for co in range(0, W, 64):
                    blk = basin[ro:ro + 64, co:co + 64]
                    dblk = defined[b, ro:ro + 64, co:co + 64]
                    if not dblk.any():
                        continue
                    out["image_id"].append(iid)
                    out["band"].append(b)
                    out["win_row_off"].append(ro)
                    out["win_col_off"].append(co)
                    out["h"].append(blk.shape[0])
                    out["w"].append(blk.shape[1])
                    out["basin"].append(blk.ravel())
                    out["defined"].append(dblk.ravel())
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in WATERSHED_SCHEMA],
            schema=WATERSHED_SCHEMA,
        )

    return tiles_ds.groupby("image_id").map_groups(
        ws_group, batch_format="pyarrow", **map_kwargs
    )
