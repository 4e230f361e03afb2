"""Literal-constant scenarios ported from the reference test suite
(FIXTURES.md F4 — the only oracles portable into this sandbox without
reading the reference's HDF5 binaries)."""

from __future__ import annotations

import numpy as np

from rioxarray_ray.kernels import affine as aff
from rioxarray_ray.kernels import crs
from rioxarray_ray.kernels import merge as merge_mod
from rioxarray_ray.kernels.raster import Raster

# the 200x200 MODIS grid of test_integration_merge.py:30-51
MODIS_RES = 231.6563582639536
MODIS_LEFT = -7274009.6494863
MODIS_TOP = 5050108.6101528
MODIS_BOUNDS = (-7274009.6494863, 5003777.3385, -7227678.3778335, 5050108.6101528)


def _modis_raster(rng):
    px = rng.integers(0, 5000, size=(1, 200, 200)).astype(np.int16)
    px[0, 30:40, 30:40] = -28672  # _FillValue=-28672 (merge test :107-109)
    t = aff.compose(
        aff.translation(MODIS_LEFT, MODIS_TOP), aff.scale(MODIS_RES, -MODIS_RES)
    )
    return Raster(px, t, crs.SINUSOIDAL, nodata=-28672)


def test_merge_union_bounds_literal(rng):
    """Union transform/bounds arithmetic matches the reference's literal
    oracle (test_integration_merge.py:30-51): merging the 4 quadrant
    slices of the 200x200 MODIS grid reproduces its exact bounds/res."""
    r = _modis_raster(rng)
    quadrants = [
        r.isel_window(0, 0, 100, 100),
        r.isel_window(0, 100, 100, 100),
        r.isel_window(100, 0, 100, 100),
        r.isel_window(100, 100, 100, 100),
    ]
    transform, width, height = merge_mod.union_grid(
        [q.bounds() for q in quadrants], (MODIS_RES, MODIS_RES)
    )
    assert (width, height) == (200, 200)
    left, bottom, right, top = aff.bounds(transform, width, height)
    np.testing.assert_almost_equal(
        [left, bottom, right, top], list(MODIS_BOUNDS), decimal=5
    )
    np.testing.assert_almost_equal(aff.resolution(transform)[0], MODIS_RES)
    merged = merge_mod.merge_tiles(
        [(q.pixels, q.transform) for q in quadrants],
        transform,
        (height, width),
        -28672,
        "first",
        dtype=np.int16,
    )
    assert np.array_equal(merged, r.pixels)  # sum-preservation oracle


def test_merge_res_override_literal(rng):
    """res=300 override yields shape (155, 155)
    (test_integration_merge.py:124-143)."""
    r = _modis_raster(rng)
    transform, width, height = merge_mod.union_grid([r.bounds()], (300.0, 300.0))
    assert (width, height) == (155, 155)


def test_reproject_target_utm15_proj_string():
    """The reference reprojects MODIS to
    '+datum=WGS84 +no_defs +proj=utm +units=m +zone=15'
    (test_integration_rioxarray.py:67) — parse + estimate agreement."""
    target = crs.from_user_input("+datum=WGS84 +no_defs +proj=utm +units=m +zone=15")
    assert target == crs.utm(15)
    # the MODIS grid's lon/lat center falls in zone 15
    lon, lat = crs.SINUSOIDAL.inverse(
        (MODIS_BOUNDS[0] + MODIS_BOUNDS[2]) / 2, (MODIS_BOUNDS[1] + MODIS_BOUNDS[3]) / 2
    )
    assert crs.estimate_utm_crs(lon, lat, lon, lat) == crs.utm(15)


def test_modis_to_utm15_reproject_round_trip(rng):
    """S1: sinusoidal -> UTM zone 15 warp is invertible to PSNR-level
    fidelity on smooth data (bit-parity with GDAL goldens is explicitly
    out of scope — they fork by GDAL version)."""
    yy, xx = np.mgrid[0:200, 0:200]
    smooth = (1500 * np.sin(xx / 23.0) * np.cos(yy / 31.0) + 8 * xx + 5 * yy)[None]
    t = aff.compose(
        aff.translation(MODIS_LEFT, MODIS_TOP), aff.scale(MODIS_RES, -MODIS_RES)
    )
    src = Raster(smooth, t, crs.SINUSOIDAL, nodata=None)
    utm = src.reproject(crs.utm(15), resampling="bilinear")
    assert utm.crs == crs.utm(15)
    back = utm.reproject(
        crs.SINUSOIDAL, transform=t, shape=src.shape, resampling="bilinear"
    )
    inner = back.pixels[0][5:-5, 5:-5]
    ref = smooth[0][5:-5, 5:-5]
    ok = ~np.isnan(inner)
    rel = np.abs(inner[ok] - ref[ok]).max() / (ref.max() - ref.min())
    assert rel < 0.01


def test_default_nodata_matches_reference_table():
    """_NODATA_DTYPE_MAP literals (_spatial_utils.py:28-45)."""
    from rioxarray_ray.kernels.nodata import default_nodata

    assert default_nodata(np.uint8) == 255
    assert default_nodata(np.uint16) == 65535
    assert default_nodata(np.int16) == -32768
    assert default_nodata(np.uint32) == 4294967295
    assert default_nodata(np.int32) == -2147483648
    assert default_nodata(np.uint64) == 18446744073709551615
    assert default_nodata(np.int64) == -9223372036854775808
    assert default_nodata(np.int8) == -128
    assert np.isnan(default_nodata(np.float32))
