"""Nodata infill kernels (interpolate_na).

The reference fills nodata with ``scipy.interpolate.griddata`` over the valid
pixel scatter, per band (/root/reference/rioxarray/raster_array.py:863-966).
scipy is unavailable here; the MVP implements ``nearest`` exactly via an
exact euclidean distance transform (two-pass Felzenszwalb-Huttenlocher EDT
with argmin tracking — public algorithm, implemented from the paper's
formulas), matching griddata(method="nearest") semantics: every nodata pixel
takes the value of the euclidean-nearest valid pixel.  ``linear``/``cubic``
need scattered Delaunay interpolation and are flag-gated
(NotImplementedError), per SURVEY.md §7.4.
"""

from __future__ import annotations

import numpy as np

from .nodata import valid_mask

_INF = 1e18


def _edt_1d(f: np.ndarray):
    """1-D squared-distance transform with argmin index, batched over rows.

    f: (rows, n) of squared distances (inf where no site).  Returns (d, idx)
    where d[r, i] = min_j f[r, j] + (i - j)^2 and idx the argmin j.
    Felzenszwalb & Huttenlocher 2004 lower-envelope algorithm, looped per row
    (n <= tile width; fine for tile-sized arrays).
    """
    rows, n = f.shape
    d = np.empty_like(f)
    idx = np.empty((rows, n), dtype=np.int64)
    for r in range(rows):
        v = np.zeros(n, dtype=np.int64)  # parabola sites
        z = np.empty(n + 1)  # envelope boundaries
        k = 0
        v[0] = 0
        z[0], z[1] = -_INF, _INF
        fr = f[r]
        for q in range(1, n):
            if fr[q] >= _INF and fr[v[k]] >= _INF:
                continue
            s = ((fr[q] + q * q) - (fr[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
            while s <= z[k]:
                k -= 1
                s = ((fr[q] + q * q) - (fr[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
            k += 1
            v[k] = q
            z[k] = s
            z[k + 1] = _INF
        k = 0
        for q in range(n):
            while z[k + 1] < q:
                k += 1
            j = v[k]
            d[r, q] = (q - j) ** 2 + fr[j]
            idx[r, q] = j
    return d, idx


def nearest_fill(band: np.ndarray, nodata) -> np.ndarray:
    """Fill nodata pixels with the value of the euclidean-nearest valid pixel.

    All-nodata input is returned unchanged (reference behavior at
    test_integration_rioxarray.py:1577)."""
    vm = valid_mask(band, nodata)
    if vm.all():
        return band.copy()
    if not vm.any():
        return band.copy()
    h, w = band.shape
    f = np.where(vm, 0.0, _INF)
    # pass 1: along columns -> nearest valid row per column
    d1, row_idx = _edt_1d(f.T)  # (w, h): per column
    d1 = d1.T
    row_idx = row_idx.T  # row_idx[r, c] = best source row in column c
    # pass 2: along rows over column-wise distances
    d2, col_idx = _edt_1d(d1)  # (h, w): col_idx[r, c] = best source column
    rr = np.arange(h)[:, None]
    src_col = col_idx
    src_row = row_idx[rr, src_col]
    out = band.copy()
    out[~vm] = band[src_row[~vm], src_col[~vm]]
    return out


def _dilate(mask: np.ndarray, r: int) -> np.ndarray:
    """r-step chebyshev binary dilation via shifts (no scipy)."""
    out = mask.copy()
    for _ in range(r):
        grown = out.copy()
        grown[1:, :] |= out[:-1, :]
        grown[:-1, :] |= out[1:, :]
        grown[:, 1:] |= out[:, :-1]
        grown[:, :-1] |= out[:, 1:]
        out = grown
    return out


def _scatter_fill(band: np.ndarray, nodata, interp_fn, band_radius: int) -> np.ndarray:
    """Shared hole-band scattered-interpolation fill.

    Cost control: only valid pixels within ``band_radius`` (chebyshev) of a
    hole are triangulated — interpolation inside a hole is governed by
    nearby points; far-field points only matter for degenerate hulls
    (falls back to them being absent: out-of-hull pixels stay nodata, the
    griddata contract).  Holes that remain (outside the local hull) are
    left at nodata.
    """
    vm = valid_mask(band, nodata)
    if vm.all() or not vm.any():
        return band.copy()
    holes = ~vm
    support = _dilate(holes, band_radius) & vm
    ys, xs = np.nonzero(support)
    if len(ys) < 3:
        return band.copy()
    qy, qx = np.nonzero(holes)
    pts = np.stack([xs, ys], axis=1).astype(np.float64)
    vals = band[ys, xs].astype(np.float64)
    q = np.stack([qx, qy], axis=1).astype(np.float64)
    filled = interp_fn(pts, vals, q)
    out = band.astype(np.float64, copy=True)
    ok = ~np.isnan(filled)
    out[qy[ok], qx[ok]] = filled[ok]
    if band.dtype.kind in "iu":
        result = band.copy()
        result[qy[ok], qx[ok]] = np.rint(filled[ok]).astype(band.dtype)
        return result
    return out.astype(band.dtype)


def linear_fill(band: np.ndarray, nodata, band_radius: int = 4) -> np.ndarray:
    """Fill nodata by barycentric-linear scattered interpolation
    (griddata(method='linear') semantics via the from-scratch Delaunay in
    kernels/delaunay.py)."""
    from .delaunay import interpolate_linear

    return _scatter_fill(band, nodata, interpolate_linear, band_radius)


def cubic_fill(band: np.ndarray, nodata, band_radius: int = 5) -> np.ndarray:
    """Fill nodata by cubic Hermite-blend scattered interpolation
    (griddata(method='cubic') role; see kernels/delaunay.py
    interpolate_cubic for the exact semantics and scipy-parity caveat).
    The wider band gives the gradient estimator one extra neighbor ring."""
    from .delaunay import interpolate_cubic

    return _scatter_fill(band, nodata, interpolate_cubic, band_radius)


def interpolate_na(pixels: np.ndarray, nodata, method: str = "nearest") -> np.ndarray:
    """Per-band infill ((bands, h, w) or (h, w)); the band loop mirrors
    /root/reference/rioxarray/raster_array.py:942-951.

    Methods: 'nearest' (exact euclidean EDT), 'linear' (from-scratch
    Delaunay + barycentric, exact for locally-planar data), and 'cubic'
    (Hermite blend with LSQ gradient estimates — value+gradient
    interpolating, plane-exact).
    """
    squeeze = pixels.ndim == 2
    arr = pixels[None] if squeeze else pixels
    if method == "nearest":
        out = np.stack([nearest_fill(b, nodata) for b in arr])
    elif method == "linear":
        out = np.stack([linear_fill(b, nodata) for b in arr])
    elif method == "cubic":
        out = np.stack([cubic_fill(b, nodata) for b in arr])
    else:
        raise NotImplementedError(
            f"interpolate_na method {method!r} is not implemented; "
            "'nearest', 'linear' and 'cubic' are available"
        )
    return out[0] if squeeze else out
