"""Geolocation-array warp (GDAL GEOLOCATION-domain analogue, SURVEY §2.4).

The reference forwards geolocation-array kwargs straight through to GDAL's
geoloc transformer (/root/reference/rioxarray/raster_array.py:367-375 ->
rasterio.warp.reproject(**kwargs)); GDAL builds a backmap from the 2-D
LON/LAT arrays and inverts it iteratively.  This module is the from-scratch
numpy recast:

- forward (src pixel -> lon/lat): bilinear interpolation of the geoloc
  arrays, honoring the GDAL PIXEL/LINE_OFFSET + PIXEL/LINE_STEP metadata
  (subsampled geolocation grids);
- inverse (lon/lat -> fractional src pixel): a vectorized Newton solve on
  the bilinear surface, seeded by a least-squares polynomial fit of the
  geoloc nodes (the role GDAL's coarse backmap plays);
- ``warp_from_geoloc``: inverse-mapping warp onto a regular north-up grid
  in geoloc (lon/lat) space, sharing the resample kernels with the affine
  and GCP paths (kernels/warp.py, kernels/gcps.py).

Swath geolocation arrays are smooth by construction (sensor geometry), so
Newton from a polynomial seed converges in a handful of iterations; points
outside the swath fail the convergence/in-bounds test and land on nodata.
"""

from __future__ import annotations

import numpy as np

from .gcps import _monomials


class GeolocTransformer:
    """Pixel <-> lon/lat mapping defined by 2-D geolocation arrays.

    ``lon``/``lat`` are (h_g, w_g) arrays giving the geographic position of
    geoloc node (i, j); node (i, j) refers to the CENTER of the pixel at
    ``(pixel_offset + j * pixel_step, line_offset + i * line_step)`` —
    GDAL GEOLOCATION metadata semantics with the default PIXEL_CENTER
    georeferencing convention (full-resolution arrays are the offset=0,
    step=1 case).  Public pixel coordinates are continuous edge-based
    (``(0, 0)`` = top-left corner), matching transforms and GCPs.
    """

    def __init__(
        self,
        lon: np.ndarray,
        lat: np.ndarray,
        pixel_offset: float = 0.0,
        line_offset: float = 0.0,
        pixel_step: float = 1.0,
        line_step: float = 1.0,
        init_order: int = 2,
    ):
        self.lon = np.asarray(lon, dtype=np.float64)
        self.lat = np.asarray(lat, dtype=np.float64)
        if self.lon.shape != self.lat.shape or self.lon.ndim != 2:
            raise ValueError("lon/lat must be 2-D arrays of the same shape")
        if self.lon.shape[0] < 2 or self.lon.shape[1] < 2:
            raise ValueError("geolocation arrays need at least 2x2 nodes")
        self.pixel_offset = float(pixel_offset)
        self.line_offset = float(line_offset)
        self.pixel_step = float(pixel_step)
        self.line_step = float(line_step)
        h_g, w_g = self.lon.shape
        # inverse seed: least-squares polynomial (lon,lat) -> geoloc index,
        # fit over a bounded subsample of the nodes (monomial machinery
        # shared with the GCP transformer)
        step = max(1, int(np.sqrt(h_g * w_g / 1024.0)))
        jj, ii = np.meshgrid(
            np.arange(0, w_g, step, dtype=np.float64),
            np.arange(0, h_g, step, dtype=np.float64),
        )
        flon = self.lon[:: step, :: step].ravel()
        flat = self.lat[:: step, :: step].ravel()
        order = min(init_order, 2)
        A = _monomials(flon, flat, order)
        self._seed_order = order
        self._seed_gc, *_ = np.linalg.lstsq(A, jj.ravel(), rcond=None)
        self._seed_gr, *_ = np.linalg.lstsq(A, ii.ravel(), rcond=None)

    # ---- index-space bilinear surface ----------------------------------
    def _interp(self, gc: np.ndarray, gr: np.ndarray):
        """Bilinear lon/lat + analytic gradients at geoloc index (gc, gr).

        Indices are clamped to the grid so edge cells extrapolate linearly
        (matching a bilinear surface extended beyond its support).
        """
        h_g, w_g = self.lon.shape
        j0 = np.clip(np.floor(gc).astype(np.int64), 0, w_g - 2)
        i0 = np.clip(np.floor(gr).astype(np.int64), 0, h_g - 2)
        fx = gc - j0
        fy = gr - i0
        q00 = (self.lon[i0, j0], self.lat[i0, j0])
        q01 = (self.lon[i0, j0 + 1], self.lat[i0, j0 + 1])
        q10 = (self.lon[i0 + 1, j0], self.lat[i0 + 1, j0])
        q11 = (self.lon[i0 + 1, j0 + 1], self.lat[i0 + 1, j0 + 1])
        out, dgc, dgr = [], [], []
        for k in range(2):
            a, b, c, d = q00[k], q01[k], q10[k], q11[k]
            out.append(
                a * (1 - fx) * (1 - fy)
                + b * fx * (1 - fy)
                + c * (1 - fx) * fy
                + d * fx * fy
            )
            dgc.append((b - a) * (1 - fy) + (d - c) * fy)
            dgr.append((c - a) * (1 - fx) + (d - b) * fx)
        return out[0], out[1], dgc, dgr

    def _pix_to_idx(self, col, row):
        # -0.5: node j sits at the CENTER of its pixel (GDAL PIXEL_CENTER)
        gc = (
            np.asarray(col, dtype=np.float64) - 0.5 - self.pixel_offset
        ) / self.pixel_step
        gr = (
            np.asarray(row, dtype=np.float64) - 0.5 - self.line_offset
        ) / self.line_step
        return gc, gr

    def _idx_to_pix(self, gc, gr):
        return (
            self.pixel_offset + gc * self.pixel_step + 0.5,
            self.line_offset + gr * self.line_step + 0.5,
        )

    # ---- public mapping -------------------------------------------------
    def forward(self, col, row):
        """Src pixel-center coords -> (lon, lat)."""
        gc, gr = self._pix_to_idx(col, row)
        lon, lat, _, _ = self._interp(gc, gr)
        return lon, lat

    def inverse(self, lon, lat, tol: float = 1e-10, max_iter: int = 25):
        """(lon, lat) -> fractional src pixel-center coords.

        Vectorized Newton on the bilinear surface; non-converged points
        (outside the swath) return NaN so resample kernels nodata them.
        """
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        shape = lon.shape
        lon_f, lat_f = lon.ravel(), lat.ravel()
        A = _monomials(lon_f, lat_f, self._seed_order)
        gc = A @ self._seed_gc
        gr = A @ self._seed_gr
        h_g, w_g = self.lon.shape
        # allow one cell of linear extrapolation beyond the grid (pixel
        # centers at the image edge sit half a step outside the node hull)
        lo_c, hi_c = -1.0, float(w_g)
        lo_r, hi_r = -1.0, float(h_g)
        gc = np.clip(gc, lo_c, hi_c)
        gr = np.clip(gr, lo_r, hi_r)
        active = np.ones(lon_f.shape, dtype=bool)
        for _ in range(max_iter):
            if not active.any():
                break
            flon, flat, dgc, dgr = self._interp(gc[active], gr[active])
            rx = flon - lon_f[active]
            ry = flat - lat_f[active]
            a, c = dgc[0], dgc[1]  # d lon/d gc, d lat/d gc
            b, d = dgr[0], dgr[1]  # d lon/d gr, d lat/d gr
            det = a * d - b * c
            det = np.where(np.abs(det) < 1e-300, np.nan, det)
            step_c = (d * rx - b * ry) / det
            step_r = (-c * rx + a * ry) / det
            gc_a = np.clip(gc[active] - step_c, lo_c, hi_c)
            gr_a = np.clip(gr[active] - step_r, lo_r, hi_r)
            moved = np.maximum(
                np.abs(gc_a - gc[active]), np.abs(gr_a - gr[active])
            )
            gc[active] = gc_a
            gr[active] = gr_a
            still = moved > tol
            idx = np.flatnonzero(active)
            active[idx[~still]] = False
        # verify: residual in geographic units must vanish, else NaN out
        flon, flat, _, _ = self._interp(gc, gr)
        err = np.maximum(np.abs(flon - lon_f), np.abs(flat - lat_f))
        span = max(
            float(self.lon.max() - self.lon.min()),
            float(self.lat.max() - self.lat.min()),
            1e-12,
        )
        bad = ~(err <= 1e-6 * span)
        col, row = self._idx_to_pix(gc, gr)
        col[bad] = np.nan
        row[bad] = np.nan
        return col.reshape(shape), row.reshape(shape)


def warp_from_geoloc(
    pixels: np.ndarray,
    lon: np.ndarray,
    lat: np.ndarray,
    resampling: str = "nearest",
    src_nodata=None,
    dst_nodata=None,
    resolution=None,
    dst_shape: tuple[int, int] | None = None,
    transformer_kwargs: dict | None = None,
):
    """Warp a geolocation-array-referenced image onto a regular north-up
    lon/lat grid.  Returns (out_array, dst_transform, dst_nodata) —
    ``warp_from_gcps`` semantics with the geoloc transformer plugged in.
    """
    from . import affine as aff
    from .nodata import default_nodata, valid_mask
    from .warp import _resample_band, finalize_band, resolve_resampling

    squeeze = pixels.ndim == 2
    if squeeze:
        pixels = pixels[None]
    method = resolve_resampling(resampling)
    tr = GeolocTransformer(lon, lat, **(transformer_kwargs or {}))
    _, h, w = pixels.shape
    left, right = float(tr.lon.min()), float(tr.lon.max())
    bottom, top = float(tr.lat.min()), float(tr.lat.max())
    if dst_shape is not None:
        dh, dw = int(dst_shape[0]), int(dst_shape[1])
        resx = (right - left) / dw
        resy = (top - bottom) / dh
    else:
        if resolution is None:
            area = (right - left) * (top - bottom)
            res = float(np.sqrt(max(area, 0.0) / max(w * h, 1)))
            resx = resy = res if res > 0 else 1.0
        elif np.isscalar(resolution):
            resx = resy = float(resolution)
        else:
            resx, resy = float(resolution[0]), float(resolution[1])
        dw = max(int(round((right - left) / resx)), 1)
        dh = max(int(round((top - bottom) / resy)), 1)
    dst_transform = aff.compose(
        aff.translation(left, top), aff.scale(resx, -resy)
    )
    cols = np.arange(dw, dtype=np.float64) + 0.5
    rows = np.arange(dh, dtype=np.float64) + 0.5
    cg, rg = np.meshgrid(cols, rows)
    dx, dy = aff.apply(dst_transform, cg, rg)
    fcol, frow = tr.inverse(dx, dy)
    # non-converged (outside-swath) points: a finite far-out-of-range
    # sentinel keeps the int32 gather path warning-free and invalid
    fcol = np.where(np.isnan(fcol), -1e9, fcol)
    frow = np.where(np.isnan(frow), -1e9, frow)
    out_dtype = pixels.dtype
    if dst_nodata is None:
        dst_nodata = (
            src_nodata if src_nodata is not None else default_nodata(out_dtype)
        )
    out = np.empty((pixels.shape[0], dh, dw), dtype=out_dtype)
    fill = float(dst_nodata) if dst_nodata == dst_nodata else np.nan
    for b in range(pixels.shape[0]):
        vm = valid_mask(pixels[b], src_nodata)
        vals, ok = _resample_band(pixels[b], vm, fcol, frow, method)
        out[b] = finalize_band(vals, ok, out_dtype, fill)
    return (out[0] if squeeze else out), dst_transform, dst_nodata
