"""Single-file mosaic GeoTIFF sink: distributed compositing + compression,
one streamed writer, sparse tiles, GDAL_NODATA, multi-IFD overviews.

Reference surface: raster_writer.py:224-341 ``to_raster`` windowed writes
(one georeferenced output file), recast as stages/geotiff_sink.py.
"""

import numpy as np
import pyarrow as pa
import pytest

from rioxarray_ray.kernels import tiff as tiff_mod
from rioxarray_ray.sources import corpus


def _uniform_ids(n=12):
    # raw16 single-band geographic images (the merge precondition set,
    # same rule as __ray_entry__.q_geo_merge)
    return [i for i in range(0, 200, 4) if i % 7 != 6 and i % 5 != 0][:n]


def _raster_ds(ids):
    import ray.data as rd

    from rioxarray_ray.stages import decode

    return decode.decode_stage(rd.from_arrow(corpus.corpus_table(ids)))


def _reassemble(mosaic_rows, grid):
    from rioxarray_ray.stages.schema import pixels_from_row

    transform, width, height, crs_str, nodata, dtype = grid
    out = np.full((1, height, width), -28672, dtype=np.dtype(dtype))
    for r in mosaic_rows:
        _, tr, tc = r["image_id"].split("/")
        r0, c0 = int(tr) * 256, int(tc) * 256
        out[:, r0 : r0 + r["h"], c0 : c0 + r["w"]] = pixels_from_row(r)
    return out


def test_mosaic_single_file_roundtrip(tmp_path, ray_session):
    """write_mosaic_geotiff -> decode_geotiff is bit-exact vs the
    merge_stage mosaic, with transform/crs/nodata round-tripping."""
    from rioxarray_ray.stages import geotiff_sink, merge

    ids = _uniform_ids(8)
    path = str(tmp_path / "mosaic.tif")
    out_path, grid = geotiff_sink.write_mosaic_geotiff(
        _raster_ds(ids), path, method="first"
    )
    transform, width, height, crs_str, nodata, dtype = grid
    mosaic, _ = merge.merge_stage(_raster_ds(ids), method="first", grid=grid)
    expect = _reassemble(mosaic.take_all(), grid)

    data = open(out_path, "rb").read()
    px, t, crs = tiff_mod.decode_geotiff(data)
    assert px.shape == (1, height, width)
    assert np.allclose(t, transform)
    assert crs == crs_str
    # bit-exact everywhere: covered region from the merge winners,
    # uncovered tiles = the same -28672 nodata fill on both sides
    assert np.array_equal(px, expect)


def test_mosaic_sparse_tiles(tmp_path, ray_session):
    """Two distant sources leave absent tiles: the file stores 0 offsets
    (GDAL sparse convention) and the decoder fills them with nodata."""
    from rioxarray_ray.stages import geotiff_sink

    # same grid row (lat_top=40), ~16.6 deg apart in lon: the union grid
    # spans 14 tile columns with only the two end tiles covered
    ids = [4, 56]
    path = str(tmp_path / "sparse.tif")
    _, grid = geotiff_sink.write_mosaic_geotiff(_raster_ds(ids), path)
    data = open(path, "rb").read()
    bo = "<"
    tags = tiff_mod._read_ifd(data, bo)
    offsets = tags[tiff_mod._TAG_TILE_OFFSETS]
    counts = tags[tiff_mod._TAG_TILE_COUNTS]
    assert any(o == 0 for o in offsets), "expected sparse (absent) tiles"
    assert all((o == 0) == (c == 0) for o, c in zip(offsets, counts))
    # nodata text round-trips and sparse regions decode to it
    nod_raw = bytes(tags[tiff_mod._TAG_GDAL_NODATA]).split(b"\x00")[0]
    assert float(nod_raw) == -28672.0
    px, _, _ = tiff_mod.decode_geotiff(data)
    # find one fully-sparse tile and check its fill
    n_tc = -(-grid[1] // 256)
    sparse_idx = next(i for i, o in enumerate(offsets) if o == 0)
    tr, tc = sparse_idx // n_tc, sparse_idx % n_tc
    block = px[:, tr * 256 : (tr + 1) * 256, tc * 256 : (tc + 1) * 256]
    assert (block == -28672).all()


def test_mosaic_overviews(tmp_path, ray_session):
    """Multi-IFD overviews: level-L IFD dims = ceil(base/L) and every
    level-L cell equals the floor-mean of its LxL block of VALID base
    pixels (GDAL AVERAGE), computed here from the decoded base image."""
    from rioxarray_ray.stages import geotiff_sink
    from rioxarray_ray.stages.stats import overview_blocks

    ids = _uniform_ids(6)
    path = str(tmp_path / "ov.tif")
    _, grid = geotiff_sink.write_mosaic_geotiff(
        _raster_ds(ids), path, overview_levels=(2, 4)
    )
    _, width, height, _, nodata, dtype = grid
    data = open(path, "rb").read()
    base, base_t, _ = tiff_mod.decode_geotiff(data, ifd_index=0)
    for k, lv in ((1, 2), (2, 4)):
        ov, ov_t, _ = tiff_mod.decode_geotiff(data, ifd_index=k)
        assert ov.shape == (1, -(-height // lv), -(-width // lv))
        assert ov_t is None  # geo tags live on the primary IFD only
        # ground truth from the decoded base mosaic, padded to L-multiple
        ph = -(-height // lv) * lv
        pw = -(-width // lv) * lv
        pad = np.full((1, ph, pw), nodata, dtype=base.dtype)
        pad[:, :height, :width] = base
        vm = pad != np.asarray(nodata, dtype=base.dtype)
        truth, ok = overview_blocks(pad, vm, lv)
        expect = np.where(
            ok, truth.astype(base.dtype), np.asarray(nodata, base.dtype)
        )
        assert np.array_equal(ov, expect)
    with pytest.raises(ValueError):
        tiff_mod.decode_geotiff(data, ifd_index=3)


def test_sink_refuses_past_4gib(tmp_path, ray_session, monkeypatch):
    """The classic-TIFF 32-bit offset ceiling raises instead of silently
    wrapping offsets."""
    from rioxarray_ray.stages import geotiff_sink

    monkeypatch.setattr(geotiff_sink, "_OFFSET_LIMIT", 1 << 12)
    with pytest.raises(ValueError, match="4 GiB"):
        geotiff_sink.write_mosaic_geotiff(
            _raster_ds(_uniform_ids(4)), str(tmp_path / "big.tif")
        )


def test_mosaic_unsorted_layout_same_pixels(tmp_path, ray_session):
    """sort_tiles=False writes arrival order — still a valid TIFF with
    identical decoded pixels (offsets point wherever the bytes landed)."""
    from rioxarray_ray.stages import geotiff_sink

    ids = _uniform_ids(6)
    p1 = str(tmp_path / "sorted.tif")
    p2 = str(tmp_path / "unsorted.tif")
    geotiff_sink.write_mosaic_geotiff(_raster_ds(ids), p1, sort_tiles=True)
    geotiff_sink.write_mosaic_geotiff(_raster_ds(ids), p2, sort_tiles=False)
    a, ta, ca = tiff_mod.decode_geotiff(open(p1, "rb").read())
    b, tb, cb = tiff_mod.decode_geotiff(open(p2, "rb").read())
    assert np.array_equal(a, b) and ta == tb and ca == cb
