"""Ranged (COG-style) windowed reads: header + only intersecting tile
ranges, never the rest of the file — the reference's /vsicurl/ remote
path (test_integration__io.py http cases) against a RangeReader protocol.
"""

import numpy as np
import pytest

from rioxarray_ray.kernels import tiff as tiff_mod
from rioxarray_ray.sources import corpus


def _mosaic_file(tmp_path, ray_session, ids=(4, 8, 12), levels=()):
    import ray.data as rd

    from rioxarray_ray.stages import decode, geotiff_sink

    ds = decode.decode_stage(rd.from_arrow(corpus.corpus_table(list(ids))))
    path = str(tmp_path / "cog.tif")
    _, grid = geotiff_sink.write_mosaic_geotiff(
        ds, path, overview_levels=levels
    )
    return path, grid


def test_window_equals_full_decode_slice(tmp_path, ray_session):
    path, grid = _mosaic_file(tmp_path, ray_session)
    _t, width, height, _c, nodata, _d = grid
    data = open(path, "rb").read()
    full, full_t, full_crs = tiff_mod.decode_geotiff(data)
    reader = tiff_mod.LocalRangeReader(path)
    col, row, ww, wh = 37, 11, 300, 90
    px, t, crs, nod = tiff_mod.decode_geotiff_window(reader, col, row, ww, wh)
    assert np.array_equal(px, full[:, row : row + wh, col : col + ww])
    assert crs == full_crs and nod == nodata
    # transform shifted by the window offset (isel_window rule)
    assert t[2] == pytest.approx(full_t[2] + full_t[0] * col)
    assert t[5] == pytest.approx(full_t[5] + full_t[4] * row)
    reader.close()


def test_ranged_read_fetches_only_needed_bytes(tmp_path, ray_session):
    """The point of the COG contract: a small window touches a small
    fraction of the file."""
    path, grid = _mosaic_file(tmp_path, ray_session, ids=(4, 8, 12, 16, 24))
    size = tiff_mod.LocalRangeReader(path).size()
    reader = tiff_mod.LocalRangeReader(path)
    tiff_mod.decode_geotiff_window(reader, 0, 0, 64, 64)
    # one 64x64 window = header ranges + exactly one 256x256 tile range
    assert reader.bytes_read < size / 4
    assert reader.ranges_read <= 8
    reader.close()


def test_window_over_sparse_tile_fills_nodata(tmp_path, ray_session):
    path, grid = _mosaic_file(tmp_path, ray_session, ids=(4, 56))
    _t, width, height, _c, nodata, _d = grid
    reader = tiff_mod.LocalRangeReader(path)
    # the middle of the 14-tile-wide grid is uncovered (test_geotiff_sink)
    px, _t2, _c2, nod = tiff_mod.decode_geotiff_window(
        reader, width // 2, 0, 64, 64
    )
    assert (px == np.asarray(nodata, px.dtype)).all()
    reader.close()


def test_window_bounds_validation(tmp_path, ray_session):
    path, grid = _mosaic_file(tmp_path, ray_session)
    reader = tiff_mod.LocalRangeReader(path)
    with pytest.raises(ValueError, match="outside"):
        tiff_mod.decode_geotiff_window(reader, 0, 0, grid[1] + 1, 10)
    reader.close()


def test_overview_window_via_ifd_index(tmp_path, ray_session):
    path, grid = _mosaic_file(tmp_path, ray_session, levels=(2,))
    data = open(path, "rb").read()
    ov_full, _, _ = tiff_mod.decode_geotiff(data, ifd_index=1)
    reader = tiff_mod.LocalRangeReader(path)
    px, _t, _c, _n = tiff_mod.decode_geotiff_window(
        reader, 5, 3, 40, 20, ifd_index=1
    )
    assert np.array_equal(px, ov_full[:, 3:23, 5:45])
    reader.close()


def test_api_read_cog_window_returns_raster(tmp_path, ray_session):
    from rioxarray_ray import api

    path, grid = _mosaic_file(tmp_path, ray_session)
    r = api.read_cog_window(path, 10, 10, 100, 50)
    assert r.pixels.shape == (1, 50, 100)
    assert r.crs is not None and r.crs.to_string() == grid[3]
    assert float(r.nodata) == grid[4]
