"""Property-based round-trip invariants (hypothesis) for the from-scratch
codec and projection kernels.

The reference repo has NO property-based testing (SURVEY.md §5: "No
property-based/randomized testing") — it leans on golden files produced by
the C libraries it wraps.  This engine reimplements those kernels from the
public specs, so the equivalent confidence comes from algebraic laws the
specs guarantee on EVERY input, not just goldens:

    decode(encode(x)) == x          (lossless codecs: PNG, BMP, GIF, WAV,
                                     AVI, GeoTIFF — all layout variants)
    inverse(forward(p)) ~= p        (every projection kernel, in-domain)
    decode_cf(encode_cf(t)) == t    (CF datetime, every supported unit)

Pure-kernel tests: no Ray session needed.  Example counts are bounded so
the whole file stays a few seconds; hypothesis shrinks any failure to a
minimal reproducer.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

from rioxarray_ray.kernels import avi as avi_mod
from rioxarray_ray.kernels import bmp as bmp_mod
from rioxarray_ray.kernels import cf as cf_mod
from rioxarray_ray.kernels import crs as crs_mod
from rioxarray_ray.kernels import gif as gif_mod
from rioxarray_ray.kernels import png as png_mod
from rioxarray_ray.kernels import tiff as tiff_mod
from rioxarray_ray.kernels import wav as wav_mod

_FAST = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# ---------------------------------------------------------------- PNG


@_FAST
@given(
    data=st.data(),
    bands=st.sampled_from([1, 2, 3, 4]),
    h=st.integers(1, 11),
    w=st.integers(1, 11),
    dtype=st.sampled_from([np.uint8, np.uint16]),
    filter_type=st.sampled_from([0, 1, 2, 3, 4, "mixed"]),
)
def test_png_roundtrip(data, bands, h, w, dtype, filter_type):
    arr = data.draw(
        hnp.arrays(dtype, (bands, h, w), elements=st.integers(0, np.iinfo(dtype).max))
    )
    back = png_mod.decode_png(png_mod.encode_png(arr, filter_type=filter_type))
    assert back.dtype == arr.dtype
    np.testing.assert_array_equal(back, arr)


# ---------------------------------------------------------------- BMP


@_FAST
@given(data=st.data(), h=st.integers(1, 13), w=st.integers(1, 13))
def test_bmp_roundtrip(data, h, w):
    arr = data.draw(hnp.arrays(np.uint8, (3, h, w), elements=st.integers(0, 255)))
    np.testing.assert_array_equal(bmp_mod.decode_bmp(bmp_mod.encode_bmp(arr)), arr)


# ---------------------------------------------------------------- GIF


@_FAST
@given(
    data=st.data(),
    h=st.integers(1, 10),
    w=st.integers(1, 10),
    n_colors=st.integers(1, 6),
)
def test_gif_roundtrip(data, h, w, n_colors):
    # bounded palette: encoder requires <= 256 distinct RGB triples
    palette = data.draw(
        hnp.arrays(np.uint8, (n_colors, 3), elements=st.integers(0, 255))
    )
    idx = data.draw(hnp.arrays(np.int64, (h, w), elements=st.integers(0, n_colors - 1)))
    arr = palette[idx].transpose(2, 0, 1).copy()  # (3, h, w)
    np.testing.assert_array_equal(gif_mod.decode_gif(gif_mod.encode_gif(arr)), arr)


# ---------------------------------------------------------------- WAV


@_FAST
@given(
    data=st.data(),
    channels=st.integers(1, 3),
    n=st.integers(1, 48),
    kind=st.sampled_from(["u8", "i16", "i32", "f32", "f64", "pcm24"]),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_roundtrip(data, channels, n, kind, rate):
    if kind == "u8":
        arr = data.draw(hnp.arrays(np.uint8, (channels, n), elements=st.integers(0, 255)))
        bits = None
    elif kind == "i16":
        arr = data.draw(
            hnp.arrays(np.int16, (channels, n), elements=st.integers(-(2**15), 2**15 - 1))
        )
        bits = None
    elif kind == "i32":
        arr = data.draw(
            hnp.arrays(np.int32, (channels, n), elements=st.integers(-(2**31), 2**31 - 1))
        )
        bits = None
    elif kind == "pcm24":
        arr = data.draw(
            hnp.arrays(np.int32, (channels, n), elements=st.integers(-(2**23), 2**23 - 1))
        )
        bits = 24
    else:
        dt = np.float32 if kind == "f32" else np.float64
        arr = data.draw(
            hnp.arrays(
                dt,
                (channels, n),
                elements=st.floats(-1.0, 1.0, width=32 if kind == "f32" else 64),
            )
        )
        bits = None
    back = wav_mod.decode_wav(wav_mod.encode_wav(arr, rate, bits=bits))
    if isinstance(back, tuple):
        back, got_rate = back
        assert got_rate == rate
    assert back.shape == arr.shape
    np.testing.assert_array_equal(back.astype(arr.dtype), arr)


# ---------------------------------------------------------------- AVI


@_FAST
@given(
    data=st.data(),
    n=st.integers(1, 4),
    h=st.integers(1, 9),
    w=st.integers(1, 9),
)
def test_avi_roundtrip(data, n, h, w):
    frames = data.draw(
        hnp.arrays(np.uint8, (n, 3, h, w), elements=st.integers(0, 255))
    )
    out = avi_mod.decode_avi(avi_mod.encode_avi(frames, fps=10.0))
    back = out[0] if isinstance(out, tuple) else out
    np.testing.assert_array_equal(back, frames)


# ---------------------------------------------------------------- GeoTIFF


@_FAST
@given(
    data=st.data(),
    bands=st.integers(1, 3),
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    dtype=st.sampled_from([np.uint8, np.uint16, np.int16, np.int32, np.float32]),
    compression=st.sampled_from(["none", "deflate"]),
    tiled=st.booleans(),
)
def test_geotiff_roundtrip(data, bands, h, w, dtype, compression, tiled):
    if np.dtype(dtype).kind == "f":
        elements = st.floats(-1e6, 1e6, width=32)
    else:
        info = np.iinfo(dtype)
        elements = st.integers(int(info.min), int(info.max))
    arr = data.draw(hnp.arrays(dtype, (bands, h, w), elements=elements))
    transform = (30.0, 0.0, 400000.0, 0.0, -30.0, 5000000.0)
    payload = tiff_mod.encode_geotiff(
        arr,
        transform=transform,
        crs="EPSG:32615",
        compression=compression,
        tile=(8, 8) if tiled else None,
    )
    out = tiff_mod.decode_geotiff(payload)
    pixels = out[0] if isinstance(out, tuple) else out["pixels"]
    assert pixels.dtype == arr.dtype
    np.testing.assert_array_equal(pixels, arr)


# ---------------------------------------------------------------- projections

# (CRS maker, lon domain, lat domain, round-trip tolerance in degrees).
# Domains stay well inside each projection's region of validity; the
# tolerance is degrees of lon/lat after forward->inverse (1e-9 deg ~ 0.1 mm).
_PROJ_CASES = [
    ("utm15", lambda: crs_mod.utm(15), (-96.0, -90.0), (-80.0, 80.0), 1e-9),
    ("web_mercator", lambda: crs_mod.WEB_MERCATOR, (-179.0, 179.0), (-85.0, 85.0), 1e-9),
    ("world_merc_3395", lambda: crs_mod.from_epsg(3395), (-179.0, 179.0), (-80.0, 80.0), 1e-9),
    ("sinusoidal", lambda: crs_mod.SINUSOIDAL, (-170.0, 170.0), (-85.0, 85.0), 1e-9),
    ("lcc_lambert93", lambda: crs_mod.lcc(44.0, 49.0, 46.5, 3.0, 700000.0, 6600000.0),
     (-5.0, 10.0), (41.0, 51.0), 1e-9),
    ("aea_conus", lambda: crs_mod.aea(29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
     (-120.0, -75.0), (25.0, 50.0), 1e-9),
    ("ps_north_3413", lambda: crs_mod.from_epsg(3413), (-179.0, 179.0), (62.0, 89.5), 1e-9),
    # conics with lon_0 near the dateline: forward must wrap lam into
    # [-pi, pi) (theta = n*lam, n != 1) and inverse must wrap lon back —
    # hypothesis found both defects; these cases pin the fixes
    ("lcc_dateline", lambda: crs_mod.lcc(44.0, 49.0, 46.5, 170.0, 0.0, 0.0),
     (-179.0, 179.0), (41.0, 51.0), 1e-9),
    ("aea_dateline", lambda: crs_mod.aea(29.5, 45.5, 23.0, 170.0, 0.0, 0.0),
     (-179.0, 179.0), (25.0, 50.0), 1e-9),
]


@pytest.mark.parametrize("name,maker,lon_dom,lat_dom,tol",
                         _PROJ_CASES, ids=[c[0] for c in _PROJ_CASES])
@_FAST
@given(data=st.data())
def test_projection_forward_inverse_roundtrip(name, maker, lon_dom, lat_dom, tol, data):
    crs = maker()
    n = data.draw(st.integers(1, 8))
    lons = np.array(
        [data.draw(st.floats(*lon_dom, allow_nan=False)) for _ in range(n)]
    )
    lats = np.array(
        [data.draw(st.floats(*lat_dom, allow_nan=False)) for _ in range(n)]
    )
    x, y = crs.forward(lons, lats)
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))
    lon2, lat2 = crs.inverse(x, y)
    np.testing.assert_allclose(lon2, lons, atol=tol)
    np.testing.assert_allclose(lat2, lats, atol=tol)


@_FAST
@given(data=st.data())
def test_transform_points_is_inverse_consistent(data):
    """transform_points(src, dst) then (dst, src) returns the start point."""
    src = crs_mod.GEOGRAPHIC
    dst = crs_mod.utm(33)
    n = data.draw(st.integers(1, 8))
    # stay in-zone (lon_0 +- 3 deg): the Snyder TM series is exact to
    # <1e-9 deg there; at +-6 deg truncation error reaches ~1e-6 deg
    lons = np.array([data.draw(st.floats(12.0, 18.0)) for _ in range(n)])
    lats = np.array([data.draw(st.floats(-75.0, 75.0)) for _ in range(n)])
    x, y = crs_mod.transform_points(src, dst, lons, lats)
    lon2, lat2 = crs_mod.transform_points(dst, src, x, y)
    np.testing.assert_allclose(lon2, lons, atol=1e-9)
    np.testing.assert_allclose(lat2, lats, atol=1e-9)


# ---------------------------------------------------------------- CF datetime


@_FAST
@given(
    data=st.data(),
    unit=st.sampled_from(
        ["seconds", "minutes", "hours", "days", "milliseconds", "microseconds"]
    ),
    epoch=st.sampled_from(
        ["1970-01-01", "2000-01-01 00:00:00", "1900-01-01 12:30:00"]
    ),
)
def test_cf_datetime_roundtrip(data, unit, epoch):
    units = f"{unit} since {epoch}"
    # stay far inside datetime64[ns] range regardless of unit/epoch
    # (+-10^6 days would overflow ns — the decoder raises there by design)
    max_off = 30000 if unit == "days" else 10**6
    offs = data.draw(
        hnp.arrays(np.int64, (data.draw(st.integers(1, 8)),),
                   elements=st.integers(-max_off, max_off))
    )
    decoded = cf_mod.decode_cf_datetime(offs, units)
    back = cf_mod.encode_cf_datetime(decoded, units)
    enc = back[0] if isinstance(back, tuple) else back
    np.testing.assert_array_equal(np.asarray(enc, dtype=np.int64), offs)
