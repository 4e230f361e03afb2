"""Affine warp / resample kernels (the from-scratch replacement for
``rasterio.warp.reproject`` + ``calculate_default_transform`` used at
/root/reference/rioxarray/raster_array.py:287-298 and
/root/reference/rioxarray/_spatial_utils.py:380-420).

Strategy: inverse mapping.  For every destination pixel CENTER, project
dst -> lon/lat -> src CRS, convert to fractional src pixel coordinates via
the inverse src affine, then gather with the chosen resampling kernel:

- ``nearest``  : the src pixel containing the point (floor), exact on
  aligned grids;
- ``bilinear`` : 4-tap weighted gather in pixel-center space, nodata taps
  excluded with weight renormalization (all-invalid -> nodata);
- ``cubic``    : 16-tap Keys kernel (a = -0.5), same nodata policy.

Bit-level parity with GDAL is explicitly NOT a goal (the reference itself
forks its goldens by GDAL version — test_integration_rioxarray.py:64-66);
correctness criteria are exactness for nearest on aligned grids and
allclose/PSNR elsewhere (SURVEY.md §5, BASELINE.md).
"""

from __future__ import annotations

import numpy as np

from . import affine as aff
from . import crs as crs_mod
from .nodata import default_nodata, valid_mask

# point-interpolation kernels: sample at the dst pixel CENTER's preimage
POINT_METHODS = ("nearest", "bilinear", "cubic", "lanczos")
# area/statistic kernels: aggregate every valid src pixel whose center falls
# in the preimage of the dst pixel's FOOTPRINT (GDAL's warp-time average/
# mode/... family, rasterio.enums.Resampling via raster_array.py:287-298)
AREA_METHODS = ("average", "sum", "rms", "min", "max", "med", "q1", "q3", "mode")
RESAMPLING_NAMES = POINT_METHODS + AREA_METHODS
# extra src pixels a dst pixel may need beyond the containing one (halo width
# for tiled warps; SURVEY.md §7.4).  For AREA methods the true support is the
# dst pixel footprint (~ the downsampling ratio) — tiled halo warps must size
# the halo to >= that ratio themselves; 1 covers the same-res case.
KERNEL_MARGIN = {"nearest": 0, "bilinear": 1, "cubic": 2, "lanczos": 3}
KERNEL_MARGIN.update({m: 1 for m in AREA_METHODS})

# rasterio.enums.Resampling integer codes (public GDAL mapping) accepted for
# API parity with the reference's enum passthrough
_ENUM_CODES = {
    0: "nearest", 1: "bilinear", 2: "cubic", 4: "lanczos", 5: "average",
    6: "mode", 8: "max", 9: "min", 10: "med", 11: "q1", 12: "q3",
    13: "sum", 14: "rms",
}


def resolve_resampling(name) -> str:
    """Parse a resampling name or rasterio enum code
    (semantics of _spatial_utils.py:307-323)."""
    if isinstance(name, int) and not isinstance(name, bool):
        if name in _ENUM_CODES:
            return _ENUM_CODES[name]
        raise ValueError(f"unsupported resampling enum code {name}")
    if isinstance(name, str):
        low = name.lower()
        if low in RESAMPLING_NAMES:
            return low
    raise ValueError(
        f"resampling must be one of {RESAMPLING_NAMES}, got {name!r}"
    )


def calculate_default_transform(
    src_crs,
    dst_crs,
    width: int,
    height: int,
    left: float,
    bottom: float,
    right: float,
    top: float,
    resolution=None,
    dst_width: int | None = None,
    dst_height: int | None = None,
):
    """Plan the destination grid: (dst_transform, dst_width, dst_height).

    Mirrors the contract of rioxarray._make_dst_affine
    (/root/reference/rioxarray/_spatial_utils.py:380-420): ``resolution`` and
    (dst_width, dst_height) are mutually exclusive refinements; with neither,
    the output resolution is chosen so the dst grid has approximately the
    same number of pixels as the src (GDALSuggestedWarpOutput-style: square
    pixels, size = sqrt(extent_area / src_pixel_count)).
    """
    src_crs = crs_mod.from_user_input(src_crs)
    dst_crs = crs_mod.from_user_input(dst_crs)
    if resolution is not None and (dst_width or dst_height):
        raise ValueError("resolution and shape cannot both be provided")
    if bool(dst_width) != bool(dst_height):
        # shape is a pair: silently auto-resolving the missing side would
        # produce an unexpected grid (reference passes (height, width) whole)
        raise ValueError("dst_width and dst_height must be provided together")
    dl, db, dr, dt = crs_mod.transform_bounds(
        src_crs, dst_crs, left, bottom, right, top
    )
    if dst_width and dst_height:
        resx = (dr - dl) / dst_width
        resy = (dt - db) / dst_height
        w, h = int(dst_width), int(dst_height)
    else:
        if resolution is None:
            area = (dr - dl) * (dt - db)
            pix = float(max(width * height, 1))
            res = float(np.sqrt(max(area, 0.0) / pix))
            resx = resy = res if res > 0 else 1.0
        elif np.isscalar(resolution):
            resx = resy = float(resolution)
        else:
            resx, resy = (float(resolution[0]), float(resolution[1]))
        w = max(int(round((dr - dl) / resx)), 1)
        h = max(int(round((dt - db) / resy)), 1)
    transform = aff.compose(aff.translation(dl, dt), aff.scale(resx, -resy))
    return transform, w, h


def _src_fractional_coords(
    dst_transform, dst_shape, dst_crs, src_crs, src_transform
):
    """Fractional src pixel coords of every dst pixel center: (fcol, frow)."""
    h, w = dst_shape
    cols = np.arange(w, dtype=np.float64) + 0.5
    rows = np.arange(h, dtype=np.float64) + 0.5
    cgrid, rgrid = np.meshgrid(cols, rows)
    dx, dy = aff.apply(dst_transform, cgrid, rgrid)
    sx, sy = crs_mod.transform_points(dst_crs, src_crs, dx.ravel(), dy.ravel())
    fcol, frow = aff.apply_inverse(src_transform, sx, sy)
    return fcol.reshape(h, w), frow.reshape(h, w)


def approx_src_fractional_coords(
    dst_transform, dst_shape, dst_crs, src_crs, src_transform,
    tolerance: float = 0.125,
):
    """GDAL-style approximate scanline transformer (dst centers -> src px).

    Replicates GDALApproxTransformer's recursive subdivision, the DEFAULT
    transformer the reference's reproject runs through (rasterio wraps
    GDALCreateApproxTransformer with tolerance 0.125 around the warp
    transform; reference call chain /root/reference/rioxarray/raster_array.py
    reproject -> rasterio.warp.reproject): per destination scanline, the
    endpoints and midpoint are transformed exactly; when the midpoint's
    linear-interpolation error (|dcol| + |drow|, source-pixel units) is
    within ``tolerance`` the whole run is linearly interpolated, else the
    two halves recurse.  Matches GDAL-produced goldens to >=99.8%
    pixel-exact under nearest resampling (the residue is sub-1e-3-px
    boundary picks); the engine's default path stays the EXACT per-pixel
    transform (`_src_fractional_coords`), which is more accurate — this
    variant exists for bit-parity testing against GDAL outputs and as the
    cheap path when the projection pair is expensive.
    """
    h, w = dst_shape
    cols = np.arange(w, dtype=np.float64) + 0.5
    fcol = np.empty((h, w), dtype=np.float64)
    frow = np.empty((h, w), dtype=np.float64)

    def d2s(xd, yd):
        sx, sy = crs_mod.transform_points(dst_crs, src_crs, xd, yd)
        return aff.apply_inverse(
            src_transform, np.asarray(sx), np.asarray(sy))

    for i in range(h):
        xm, ym = aff.apply(dst_transform, cols, np.full(w, i + 0.5))
        cr = fcol[i]
        rr = frow[i]

        def rec(lo, hi, clo, rlo, chi, rhi):
            npts = hi - lo + 1
            mid = lo + (npts - 1) // 2
            if mid == lo or mid == hi:
                c, r = d2s(xm[lo:hi + 1], ym[lo:hi + 1])
                cr[lo:hi + 1] = c
                rr[lo:hi + 1] = r
                return
            cm, rm = d2s(xm[mid:mid + 1], ym[mid:mid + 1])
            cm, rm = cm[0], rm[0]
            span = xm[hi] - xm[lo]
            dc = (chi - clo) / span
            dr = (rhi - rlo) / span
            err = abs(clo + dc * (xm[mid] - xm[lo]) - cm) \
                + abs(rlo + dr * (xm[mid] - xm[lo]) - rm)
            if err <= tolerance:
                dd = xm[lo:hi + 1] - xm[lo]
                cr[lo:hi + 1] = clo + dc * dd
                rr[lo:hi + 1] = rlo + dr * dd
            else:
                rec(lo, mid, clo, rlo, cm, rm)
                rec(mid, hi, cm, rm, chi, rhi)

        c0, r0 = d2s(xm[:1], ym[:1])
        cn, rn = d2s(xm[-1:], ym[-1:])
        rec(0, w - 1, c0[0], r0[0], cn[0], rn[0])
    return fcol, frow


def _src_fractional_edges(
    dst_transform, dst_shape, dst_crs, src_crs, src_transform
):
    """Fractional src pixel coords of every dst pixel EDGE (corner grid,
    (h+1, w+1)) — the area-kernel analogue of _src_fractional_coords."""
    h, w = dst_shape
    cols = np.arange(w + 1, dtype=np.float64)
    rows = np.arange(h + 1, dtype=np.float64)
    cgrid, rgrid = np.meshgrid(cols, rows)
    dx, dy = aff.apply(dst_transform, cgrid, rgrid)
    sx, sy = crs_mod.transform_points(dst_crs, src_crs, dx.ravel(), dy.ravel())
    fcol, frow = aff.apply_inverse(src_transform, sx, sy)
    return fcol.reshape(h + 1, w + 1), frow.reshape(h + 1, w + 1)


def _gather(band, rows, cols, valid):
    """Safe fancy-gather: out-of-range indices produce garbage marked invalid."""
    h, w = band.shape
    r = np.clip(rows, 0, h - 1)
    c = np.clip(cols, 0, w - 1)
    inb = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    return band[r, c], valid[r, c] & inb


def _floor_idx(f):
    """floor to int32 (raster dims stay far below 2**31; halves the index
    traffic of the gather stage)."""
    return np.floor(f).astype(np.int32)


def finalize_band(vals, ok, out_dtype, fill):
    """Round/clip for integer outputs and fill rejected pixels — the shared
    tail of every per-band warp (affine, GCP, RPC, geoloc, tiled paths).

    Fast lane: nearest-resampled values arrive in their NATIVE dtype
    (see _resample_band); when that already matches an integer output and
    the fill is representable, the round/clip pass is skipped and the
    whole fill stays in the narrow lane (no float64 temporaries).
    """
    if (
        out_dtype.kind in "iu"
        and vals.dtype == out_dtype
        and fill == fill
        and np.iinfo(out_dtype).min <= fill <= np.iinfo(out_dtype).max
    ):
        return np.where(ok, vals, out_dtype.type(fill))
    if out_dtype.kind in "iu":
        info = np.iinfo(out_dtype)
        vals = np.clip(np.rint(vals), info.min, info.max)
        # the fill must land in-range too: astype on an out-of-range fill
        # (dst_nodata=-1 on uint8) would WRAP to 255, and NaN→int is
        # undefined — clip, matching the pre-fast-lane behavior
        fill = info.min if fill != fill else min(
            max(float(np.rint(fill)), float(info.min)), float(info.max)
        )
    return np.where(ok, vals, fill).astype(out_dtype)


def _resample_band(band, vmask, fcol, frow, method):
    """Resample one (h, w) band at fractional coords. Returns (values, ok).

    ``fcol``/``frow`` may be broadcastable shapes (e.g. (1, w) and (h, 1)
    from the separable fast path) — every op below broadcasts.
    """
    shape = np.broadcast_shapes(fcol.shape, frow.shape)
    if method == "nearest":
        c = _floor_idx(fcol)
        r = _floor_idx(frow)
        vals, ok = _gather(band, r, c, vmask)
        # NATIVE dtype out: nearest copies source values verbatim, so the
        # float64 widening (4x the memory traffic on int16 rasters) is
        # pure waste — finalize_band handles typed fills downstream
        return vals, ok
    # pixel-center sample position
    x = fcol - 0.5
    y = frow - 0.5
    if method == "bilinear":
        x0 = _floor_idx(x)
        y0 = _floor_idx(y)
        fx = x - x0
        fy = y - y0
        acc = np.zeros(shape, dtype=np.float64)
        wacc = np.zeros(shape, dtype=np.float64)
        for dy_ in (0, 1):
            wy = np.where(dy_ == 0, 1.0 - fy, fy)
            for dx_ in (0, 1):
                wx = np.where(dx_ == 0, 1.0 - fx, fx)
                v, ok = _gather(band, y0 + dy_, x0 + dx_, vmask)
                wgt = wx * wy * ok
                acc += np.where(ok, v, 0.0) * wgt
                wacc += wgt
        ok = wacc > 1e-9
        with np.errstate(invalid="ignore", divide="ignore"):
            out = acc / wacc
        return out, ok
    if method == "cubic":
        x0 = _floor_idx(x)
        y0 = _floor_idx(y)
        fx = x - x0
        fy = y - y0
        wx = [_keys(fx + 1.0), _keys(fx), _keys(1.0 - fx), _keys(2.0 - fx)]
        wy = [_keys(fy + 1.0), _keys(fy), _keys(1.0 - fy), _keys(2.0 - fy)]
        acc = np.zeros(shape, dtype=np.float64)
        wacc = np.zeros(shape, dtype=np.float64)
        for j in range(4):
            for i in range(4):
                v, ok = _gather(band, y0 + j - 1, x0 + i - 1, vmask)
                wgt = wx[i] * wy[j] * ok
                acc += np.where(ok, v, 0.0) * wgt
                wacc += wgt
        # GDAL-style: reject when too much kernel mass fell on invalid taps
        ok = wacc > 0.5
        with np.errstate(invalid="ignore", divide="ignore"):
            out = acc / wacc
        return out, ok
    if method == "lanczos":
        x0 = _floor_idx(x)
        y0 = _floor_idx(y)
        fx = x - x0
        fy = y - y0
        # 6x6 taps at integer offsets -2..3 around the containing pixel
        offs = range(-2, 4)
        wx = [_lanczos(fx - i) for i in offs]
        wy = [_lanczos(fy - j) for j in offs]
        acc = np.zeros(shape, dtype=np.float64)
        wacc = np.zeros(shape, dtype=np.float64)
        for j, oj in enumerate(offs):
            for i, oi in enumerate(offs):
                v, ok = _gather(band, y0 + oj, x0 + oi, vmask)
                wgt = wx[i] * wy[j] * ok
                acc += np.where(ok, v, 0.0) * wgt
                wacc += wgt
        ok = wacc > 0.5
        with np.errstate(invalid="ignore", divide="ignore"):
            out = acc / wacc
        return out, ok
    raise ValueError(f"unknown resampling {method}")


def _keys(t):
    """Keys cubic convolution kernel, a = -0.5 (public Keys 1981 formula)."""
    at = np.abs(t)
    a = -0.5
    return np.where(
        at <= 1.0,
        (a + 2.0) * at**3 - (a + 3.0) * at**2 + 1.0,
        np.where(at < 2.0, a * at**3 - 5.0 * a * at**2 + 8.0 * a * at - 4.0 * a, 0.0),
    )


def _lanczos(t, a: float = 3.0):
    """Lanczos-windowed sinc, a = 3 (the GDAL lanczos radius)."""
    at = np.abs(t)
    with np.errstate(invalid="ignore", divide="ignore"):
        out = np.sinc(t) * np.sinc(t / a)
    return np.where(at < a, out, 0.0)


def _sat(m: np.ndarray) -> np.ndarray:
    """Summed-area table with a zero top/left border: S[r, c] = sum of
    m[:r, :c]; box sums become 4 gathers."""
    s = np.zeros((m.shape[0] + 1, m.shape[1] + 1), dtype=np.float64)
    np.cumsum(np.cumsum(m, axis=0), axis=1, out=s[1:, 1:])
    return s


def _box_ranges(lo, hi, size):
    """Half-open integer pixel ranges [i0, i1) of src pixels whose CENTER
    falls inside the fractional interval [lo, hi); degenerate (sub-pixel)
    boxes collapse to the pixel containing the interval midpoint."""
    i0 = np.ceil(lo - 0.5).astype(np.int64)
    i1 = np.ceil(hi - 0.5).astype(np.int64)
    empty = i1 <= i0
    mid = np.floor((lo + hi) * 0.5).astype(np.int64)
    i0 = np.where(empty, mid, i0)
    i1 = np.where(empty, mid + 1, i1)
    oob = (i1 <= 0) | (i0 >= size)
    return np.clip(i0, 0, size), np.clip(i1, 0, size), oob


def _resample_band_area(band, vmask, cedges, redges, method):
    """Area/statistic resample of one (h, w) band. Returns (values, ok).

    ``cedges``/``redges`` are the fractional src coords of the dst pixel
    EDGES: 1-D arrays (w_dst+1,) / (h_dst+1,) on the separable path, or 2-D
    (h_dst+1, w_dst+1) corner grids on the dense path.  A src pixel
    contributes iff its center falls in the (axis-aligned hull of the) dst
    pixel's preimage; average/sum/rms run at O(1) per dst pixel via
    summed-area tables, the order statistics (min/max/med/q1/q3/mode) scan
    their boxes — their cost is the intrinsic cost of the statistic and is
    paid on the dst (small, when downsampling) side.
    """
    h, w = band.shape
    if cedges.ndim == 1:
        clo = np.minimum(cedges[:-1], cedges[1:])
        chi = np.maximum(cedges[:-1], cedges[1:])
        rlo = np.minimum(redges[:-1], redges[1:])
        rhi = np.maximum(redges[:-1], redges[1:])
        c0, c1, coob = _box_ranges(clo, chi, w)  # (w_dst,)
        r0, r1, roob = _box_ranges(rlo, rhi, h)  # (h_dst,)
        oob = roob[:, None] | coob[None, :]
        R0, R1 = r0[:, None], r1[:, None]
        C0, C1 = c0[None, :], c1[None, :]
    else:
        clo = np.minimum.reduce(
            [cedges[:-1, :-1], cedges[:-1, 1:], cedges[1:, :-1], cedges[1:, 1:]]
        )
        chi = np.maximum.reduce(
            [cedges[:-1, :-1], cedges[:-1, 1:], cedges[1:, :-1], cedges[1:, 1:]]
        )
        rlo = np.minimum.reduce(
            [redges[:-1, :-1], redges[:-1, 1:], redges[1:, :-1], redges[1:, 1:]]
        )
        rhi = np.maximum.reduce(
            [redges[:-1, :-1], redges[:-1, 1:], redges[1:, :-1], redges[1:, 1:]]
        )
        # dense path: ranges already carry oob's full (h_dst, w_dst) shape
        C0, C1, coob = _box_ranges(clo, chi, w)
        R0, R1, roob = _box_ranges(rlo, rhi, h)
        oob = roob | coob

    if method in ("average", "sum", "rms"):
        v = np.where(vmask, band.astype(np.float64), 0.0)
        satc = _sat(vmask.astype(np.float64))
        satv = _sat(v)

        def box(s):
            return s[R1, C1] - s[R0, C1] - s[R1, C0] + s[R0, C0]

        n = box(satc)
        ok = (n > 0) & ~oob
        with np.errstate(invalid="ignore", divide="ignore"):
            if method == "sum":
                vals = box(satv)
            elif method == "average":
                vals = box(satv) / n
            else:  # rms
                vals = np.sqrt(box(_sat(v * v)) / n)
        return np.where(ok, vals, 0.0), ok

    # order statistics: scan each dst pixel's box (vectorized inner ops)
    shape = oob.shape
    vals = np.zeros(shape, dtype=np.float64)
    ok = np.zeros(shape, dtype=bool)
    R0f, R1f = R0.ravel(), R1.ravel()
    if R0.shape != shape:  # separable: broadcast row/col ranges
        R0f = np.broadcast_to(R0, shape).ravel()
        R1f = np.broadcast_to(R1, shape).ravel()
    C0f = np.broadcast_to(C0, shape).ravel()
    C1f = np.broadcast_to(C1, shape).ravel()
    vflat = vals.ravel()
    oflat = ok.ravel()
    ooflat = oob.ravel()
    for i in range(vflat.size):
        if ooflat[i]:
            continue
        sub = band[R0f[i]: R1f[i], C0f[i]: C1f[i]]
        subm = vmask[R0f[i]: R1f[i], C0f[i]: C1f[i]]
        sel = sub[subm]
        if sel.size == 0:
            continue
        oflat[i] = True
        if method == "min":
            vflat[i] = sel.min()
        elif method == "max":
            vflat[i] = sel.max()
        elif method == "med":
            vflat[i] = np.median(sel)
        elif method == "q1":
            vflat[i] = np.quantile(sel.astype(np.float64), 0.25)
        elif method == "q3":
            vflat[i] = np.quantile(sel.astype(np.float64), 0.75)
        elif method == "mode":
            u, cnt = np.unique(sel, return_counts=True)
            vflat[i] = u[np.argmax(cnt)]  # ties -> lowest value
        else:
            raise ValueError(f"unknown area resampling {method}")
    return vals, ok


def reproject_array(
    src: np.ndarray,
    src_transform,
    src_crs,
    dst_transform,
    dst_shape: tuple[int, int],
    dst_crs,
    resampling: str = "nearest",
    src_nodata=None,
    dst_nodata=None,
    dst_dtype=None,
    approx_tolerance: float | None = None,
):
    """Warp a (bands, h, w) or (h, w) array onto a destination grid.

    Returns (dst_array, dst_nodata).  Semantics follow
    /root/reference/rioxarray/raster_array.py:198-309: dst nodata defaults to
    src nodata, else the dtype default table; output dtype defaults to the
    src dtype.
    """
    squeeze = src.ndim == 2
    if squeeze:
        src = src[None]
    method = resolve_resampling(resampling)
    src_crs = crs_mod.from_user_input(src_crs)
    dst_crs = crs_mod.from_user_input(dst_crs)
    out_dtype = np.dtype(dst_dtype) if dst_dtype is not None else src.dtype
    if dst_nodata is None:
        dst_nodata = src_nodata if src_nodata is not None else default_nodata(out_dtype)
    area = method in AREA_METHODS
    if area:
        cedges, redges = _src_fractional_edges(
            dst_transform, dst_shape, dst_crs, src_crs, src_transform
        )
    elif approx_tolerance is not None:
        fcol, frow = approx_src_fractional_coords(
            dst_transform, dst_shape, dst_crs, src_crs, src_transform,
            tolerance=approx_tolerance,
        )
    else:
        fcol, frow = _src_fractional_coords(
            dst_transform, dst_shape, dst_crs, src_crs, src_transform
        )
    bands = src.shape[0]
    out = np.empty((bands,) + tuple(dst_shape), dtype=out_dtype)
    for b in range(bands):
        vm = valid_mask(src[b], src_nodata)
        if area:
            vals, ok = _resample_band_area(src[b], vm, cedges, redges, method)
        else:
            vals, ok = _resample_band(src[b], vm, fcol, frow, method)
        fill = float(dst_nodata) if dst_nodata == dst_nodata else np.nan
        out[b] = finalize_band(vals, ok, out_dtype, fill)
    return (out[0] if squeeze else out), dst_nodata
