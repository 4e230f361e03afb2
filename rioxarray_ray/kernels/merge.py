"""Mosaic / merge combine kernels.

Reimplements the pixel-combine semantics of ``rasterio.merge.merge`` as used
by rioxarray.merge.merge_arrays (/root/reference/rioxarray/merge.py:89-223):
a fixed destination grid, each source contributing its warped/sliced pixels,
overlapping pixels combined by ``method`` with nodata transparency and
deterministic source order (input order decides ``first``/``last`` winners —
merge.py:164-167).
"""

from __future__ import annotations

import numpy as np

from . import affine as aff
from .nodata import valid_mask

METHODS = ("first", "last", "min", "max", "sum", "count")


def union_grid(bounds_list, res: tuple[float, float]):
    """Destination grid covering the union of input bounds at ``res``
    (rasterio.merge extent logic: snap dims with ceil on the union extent).

    Returns (transform, width, height). Matches the literal oracle in
    /root/repo/FIXTURES.md F4 (union bounds for the 200x200 MODIS grid).
    """
    bl = np.asarray(bounds_list, dtype=np.float64)
    left, bottom = bl[:, 0].min(), bl[:, 1].min()
    right, top = bl[:, 2].max(), bl[:, 3].max()
    resx, resy = float(res[0]), float(res[1])
    # ceil, as rasterio.merge sizes the union grid — the reference's own
    # res-override oracle implies it (shape (155,155) from extent/300 =
    # 154.44; FIXTURES.md F4).  The 1e-9 slack keeps exactly-divisible
    # extents (the common aligned case) from rounding up one pixel.
    width = int(np.ceil((right - left) / resx - 1e-9))
    height = int(np.ceil((top - bottom) / resy - 1e-9))
    transform = aff.compose(aff.translation(left, top), aff.scale(resx, -resy))
    return transform, width, height


def combine(
    dst: np.ndarray,
    dst_valid: np.ndarray,
    src: np.ndarray,
    src_valid: np.ndarray,
    method,
):
    """Fold one source tile into the accumulator, in source order.

    ``dst``/``src`` are (bands, h, w) float64 views on the same grid window;
    ``*_valid`` are boolean masks.  Mutates dst/dst_valid in place.
    For ``sum``/``count`` dst holds the running sum/count (invalid = 0).

    ``method`` may also be a CALLABLE ``fn(dst, dst_valid, src, src_valid)``
    mutating dst/dst_valid in place — the merge(method=callable) parameter
    (/root/reference/rioxarray/merge.py:96; rasterio copyto-style custom
    combiner, with validity masks instead of masked arrays).
    """
    if callable(method):
        method(dst, dst_valid, src, src_valid)
        return
    if method == "first":
        take = src_valid & ~dst_valid
        dst[take] = src[take]
        dst_valid |= src_valid
    elif method == "last":
        dst[src_valid] = src[src_valid]
        dst_valid |= src_valid
    elif method == "min":
        both = src_valid & dst_valid
        dst[both] = np.minimum(dst[both], src[both])
        new = src_valid & ~dst_valid
        dst[new] = src[new]
        dst_valid |= src_valid
    elif method == "max":
        both = src_valid & dst_valid
        dst[both] = np.maximum(dst[both], src[both])
        new = src_valid & ~dst_valid
        dst[new] = src[new]
        dst_valid |= src_valid
    elif method == "sum":
        dst[src_valid] += src[src_valid]
        dst_valid |= src_valid
    elif method == "count":
        dst[src_valid] += 1.0
        dst_valid |= src_valid
    else:
        raise ValueError(f"unknown merge method {method!r}; use one of {METHODS}")


def merge_tiles(
    sources,
    dst_transform,
    dst_shape: tuple[int, int],
    nodata: float,
    method: str = "first",
    dtype=None,
):
    """Merge already-aligned sources onto one destination grid.

    ``sources`` is an iterable of (pixels(bands,h,w), transform) on the SAME
    resolution/orientation as dst (callers reproject mismatched inputs first,
    mirroring merge.py:153-159).  Offsets are derived from the transforms and
    must be integral to within 1e-6 px.  Returns the merged (bands, H, W).
    """
    sources = list(sources)
    if not sources:
        raise ValueError("merge requires at least one source")
    bands = sources[0][0].shape[0]
    H, W = dst_shape
    acc = np.zeros((bands, H, W), dtype=np.float64)
    accv = np.zeros((bands, H, W), dtype=bool)
    inv = aff.invert(dst_transform)
    for pixels, transform in sources:
        # source origin in dst pixel space
        col0, row0 = aff.apply(inv, transform[2], transform[5])
        c0, r0 = float(col0), float(row0)
        ic0, ir0 = int(round(c0)), int(round(r0))
        if abs(c0 - ic0) > 1e-6 or abs(r0 - ir0) > 1e-6:
            raise ValueError("merge source is not aligned to the dst grid")
        h, w = pixels.shape[-2:]
        dr0, dc0 = max(ir0, 0), max(ic0, 0)
        dr1, dc1 = min(ir0 + h, H), min(ic0 + w, W)
        if dr0 >= dr1 or dc0 >= dc1:
            continue
        sr0, sc0 = dr0 - ir0, dc0 - ic0
        sub = pixels[:, sr0 : sr0 + (dr1 - dr0), sc0 : sc0 + (dc1 - dc0)].astype(
            np.float64
        )
        subv = valid_mask(sub, float(nodata) if nodata is not None else None)
        combine(
            acc[:, dr0:dr1, dc0:dc1], accv[:, dr0:dr1, dc0:dc1], sub, subv, method
        )
    out_dtype = np.dtype(dtype) if dtype is not None else sources[0][0].dtype
    no_nodata = nodata is None or nodata != nodata
    if out_dtype.kind in "iu":
        # integer mosaic without nodata fills 0 (rasterio.merge behavior);
        # NaN would cast to platform-dependent garbage
        fill = 0.0 if no_nodata else float(nodata)
        out = np.where(accv, acc, fill)
        info = np.iinfo(out_dtype)
        out = np.clip(np.rint(out), info.min, info.max)
    else:
        fill = np.nan if no_nodata else float(nodata)
        out = np.where(accv, acc, fill)
    return out.astype(out_dtype)
