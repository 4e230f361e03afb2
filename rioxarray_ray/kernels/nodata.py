"""Nodata resolution rules.

Reimplements the dtype-default nodata table and coercion/overflow checks of
the reference (/root/reference/rioxarray/_spatial_utils.py:28-45
``_NODATA_DTYPE_MAP`` and /root/reference/rioxarray/raster_writer.py:121-146
``_ensure_nodata_dtype``).
"""

from __future__ import annotations

import numpy as np

# dtype kind/itemsize -> default nodata (mirrors _NODATA_DTYPE_MAP)
_DEFAULTS = {
    np.dtype(np.uint8): 255,
    np.dtype(np.int8): -128,
    np.dtype(np.uint16): 65535,
    np.dtype(np.int16): -32768,
    np.dtype(np.uint32): 4294967295,
    np.dtype(np.int32): -2147483648,
    np.dtype(np.float32): np.nan,
    np.dtype(np.float64): np.nan,
    np.dtype(np.uint64): 18446744073709551615,
    np.dtype(np.int64): -9223372036854775808,
    # complex payloads (complex_int16 decodes to complex64, _io.py:493-501)
    np.dtype(np.complex64): np.nan,
    np.dtype(np.complex128): np.nan,
}


def default_nodata(dtype) -> float:
    """Default fill value for a dtype (used when reproject has no src nodata,
    /root/reference/rioxarray/raster_array.py:409-416)."""
    dt = np.dtype(dtype)
    try:
        return _DEFAULTS[dt]
    except KeyError:
        raise ValueError(f"no default nodata for dtype {dt}") from None


def ensure_nodata_dtype(nodata, dtype):
    """Coerce nodata to dtype; raise on overflow (raster_writer.py:121-146)."""
    if nodata is None:
        return None
    dt = np.dtype(dtype)
    if dt.kind in "fc":  # float and complex accept any float (incl. NaN)
        return float(nodata)
    if nodata != nodata:  # NaN into an integer dtype
        raise ValueError(f"nodata value NaN cannot be represented in {dt}")
    cast = np.array(nodata).astype(dt)
    if float(cast) != float(nodata):
        raise ValueError(
            f"nodata value {nodata} cannot be represented in dtype {dt}"
        )
    return cast.item()


def valid_mask(pixels: np.ndarray, nodata) -> np.ndarray:
    """Boolean mask of valid (non-nodata) pixels; NaN-aware."""
    if nodata is None:
        return np.ones(pixels.shape, dtype=bool)
    if nodata != nodata:
        return ~np.isnan(pixels)
    return pixels != np.asarray(nodata, dtype=pixels.dtype)
