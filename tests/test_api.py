"""Accessor-API tests (the .rio-analogue surface, SURVEY.md §2.10)."""

from __future__ import annotations

import numpy as np
import pytest

from rioxarray_ray import api
from rioxarray_ray.sources import corpus


@pytest.fixture(scope="module")
def rds(ray_session):
    return api.open_corpus(24)


def test_open_and_count(rds):
    assert rds.count() == 24


def test_write_crs_and_crs_set(rds):
    out = rds.write_crs("EPSG:3857")
    assert out.crs_set() == {"EPSG:3857"}
    assert len(rds.crs_set()) > 1  # corpus mixes 4326 + projected


def test_chain_tile_clip_reproject(rds, ray_session):
    out = (
        rds.tile(64)
        .clip_box(-59.9, 36.0, -57.0, 40.0)
        .reproject("EPSG:3857", resampling="nearest", concurrency=2)
    )
    rows = out.take(5)
    assert rows and all(r["crs"] == "EPSG:3857" for r in rows)


def test_band_as_variable(ray_session):
    rds = api.open_corpus(6)  # includes idx 0 and 5 (3-band)
    rows = rds.band_as_variable().take_all()
    by_id = {}
    for r in rows:
        assert r["band_count"] == 1
        by_id.setdefault(r["image_id"].split("#")[0], []).append(r)
    assert len(by_id["img00000000"]) == 3
    assert len(by_id["img00000001"]) == 1


def test_isel_window_and_pad_box(ray_session):
    rds = api.open_corpus(3)
    sub = rds.isel_window(5, 10, 15, 20)
    rows = sub.take_all()
    assert all(r["h"] == 15 and r["w"] == 20 for r in rows)
    # pad back out to each row's original bounds round-trips the shape
    ref = corpus.raster_for(1)
    row1 = [r for r in rows if r["image_id"] == "img00000001"][0]
    from rioxarray_ray.stages.schema import row_to_raster

    padded = row_to_raster(row1).pad_box(*ref.bounds())
    assert padded.shape == ref.shape


def test_write_nodata_overflow_contract(rds):
    with pytest.raises(Exception, match="cannot be represented"):
        rds.write_nodata(1e12).count()  # int16 overflow surfaces on execute


def test_reproject_match_api(ray_session):
    rds = api.open_corpus(8)
    first = rds.ds.take(1)[0]
    out = rds.reproject_match(first, concurrency=2)
    rows = out.take_all()
    assert all(
        (r["h"], r["w"]) == (first["h"], first["w"])
        and r["transform"] == first["transform"]
        for r in rows
    )


def test_merge_api(ray_session):
    rds = api.open_corpus(4)

    import pyarrow.compute as pc

    one = api.wrap(
        rds.ds.map_batches(
            lambda b: b.filter(pc.equal(b["image_id"], "img00000001")),
            batch_format="pyarrow",
        )
    ).tile(64)
    mosaic, (t, w, h) = one.merge(method="first")
    ref = corpus.raster_for(1)
    assert (w, h) == (ref.width, ref.height)
    assert mosaic.count() >= 1


def test_sort_rows_deterministic(rds):
    a = [r["image_id"] for r in rds.sort_rows().take(10)]
    b = [r["image_id"] for r in rds.sort_rows().take(10)]
    assert a == b == sorted(a)


def test_merge_datasets_per_variable(ray_session):
    import pyarrow.compute as pc

    from rioxarray_ray import api
    from rioxarray_ray.sources import corpus

    rds = api.open_corpus(4)

    def one(iid):
        return api.wrap(
            rds.ds.map_batches(
                lambda b, iid=iid: b.filter(pc.equal(b["image_id"], iid)),
                batch_format="pyarrow",
            )
        ).tile(64)

    out = api.merge_datasets(
        {"red": one("img00000001"), "nir": one("img00000002")}
    )
    assert set(out) == {"red", "nir"}
    for name, iid in [("red", 1), ("nir", 2)]:
        mosaic, (t, w, h) = out[name]
        ref = corpus.raster_for(iid)
        assert (w, h) == (ref.width, ref.height)


def test_skip_missing_spatial_dims_option(ray_session, tmp_path):
    """skip_missing_spatial_dims toggles skip-vs-raise for non-spatial
    variables in the per-variable loops (reference option semantics,
    raster_dataset.py:100-142 + _options.py)."""
    import pytest
    import ray.data as rd

    import rioxarray_ray
    from rioxarray_ray import api
    from rioxarray_ray.kernels.raster import MissingSpatialDimensionError

    spatial = api.open_corpus(2)
    tabular = api.wrap(
        rd.from_items([{"k": i, "v": float(i)} for i in range(4)])
    )

    # default: raise on the non-spatial variable
    with pytest.raises(MissingSpatialDimensionError, match="tab"):
        api.write_parquet_dataset(
            {"img": spatial, "tab": tabular}, str(tmp_path / "w1")
        )
    with pytest.raises(MissingSpatialDimensionError):
        api.merge_datasets({"img": spatial, "tab": tabular})

    # option set: non-spatial variables are skipped / passed through
    with rioxarray_ray.set_options(skip_missing_spatial_dims=True):
        out = api.write_parquet_dataset(
            {"img": spatial, "tab": tabular}, str(tmp_path / "w2")
        )
        back = api.open_parquet_dataset(out)
        assert set(back) == {"img"}

        merged = api.merge_datasets({"img": spatial, "tab": tabular})
        assert merged["tab"][0] is tabular and merged["tab"][1] is None
        _, (t, w, h) = merged["img"]
        assert w > 0 and h > 0


def test_tile_halo_plus_tiled_match(ray_session):
    from rioxarray_ray import api
    from rioxarray_ray.stages.warp import GridSpec

    rds = api.open_corpus(4)
    grid = GridSpec(
        "EPSG:3857", (600.0, 0.0, -6690000.0, 0.0, -600.0, 4790000.0),
        (200, 200),
    )
    out = rds.tile_halo(64, resampling="bilinear").reproject_match_tiled(
        grid, resampling="bilinear", concurrency=2
    )
    rows = out.take(5)
    assert rows and all(r["crs"] == "EPSG:3857" for r in rows)


def test_attrs_encoding_and_multi_variable_writer(ray_session, tmp_path):
    """set_attrs/update_attrs/set_encoding ride through chained ops and
    persist through the multi-variable writer (Dataset to_raster analogue +
    rioxarray.py:369-427 attrs surface)."""
    import rioxarray_ray.api as api

    rds = api.open_corpus(8).set_attrs({"title": "demo"})
    rds = rds.update_attrs({"source": "corpus"}).set_encoding(
        {"dtype": "int16"}
    )
    assert rds.attrs == {"title": "demo", "source": "corpus"}
    # chained ops carry attrs
    tiled = rds.tile(64)
    assert tiled.attrs["title"] == "demo"
    out = str(tmp_path / "multi")
    api.write_parquet_dataset({"a": tiled, "b": rds}, out)
    back = api.open_parquet_dataset(out)
    assert set(back) == {"a", "b"}
    assert back["a"].attrs == {"title": "demo", "source": "corpus"}
    assert back["a"].encoding == {"dtype": "int16"}
    assert back["b"].count() == 8
    assert back["a"].count() == tiled.count()


def test_write_coordinate_system_and_update_encoding(ray_session, tmp_path):
    """RasterDataset.write_coordinate_system derives per-axis CF attrs from
    the (uniform) dataset CRS and they persist through the attrs sidecar;
    update_encoding merges (rioxarray.py:446-501 + 503-607 family)."""
    import pytest

    import rioxarray_ray.api as api

    rds = api.open_corpus(8).write_crs("EPSG:32615")
    out = rds.write_coordinate_system()
    assert out.attrs["x#axis"] == "X"
    assert out.attrs["y#standard_name"] == "projection_y_coordinate"
    assert out.attrs["x#units"] == "metre"
    # geographic branch
    geo = api.open_corpus(4).write_crs("EPSG:4326").write_coordinate_system()
    assert geo.attrs["x#standard_name"] == "longitude"
    assert geo.attrs["y#units"] == "degrees_north"
    # mixed-CRS dataset refuses (corpus mixes 4326 + projected)
    with pytest.raises(ValueError, match="exactly one CRS"):
        api.open_corpus(8).write_coordinate_system()
    # attrs survive the parquet sidecar round-trip
    path = str(tmp_path / "cs")
    out.write_parquet(path)
    back = api.open_parquet(path)
    assert back.attrs["y#standard_name"] == "projection_y_coordinate"
    # update_encoding merges, set_encoding replaces
    enc = out.set_encoding({"dtype": "int16"}).update_encoding({"zlib": True})
    assert enc.encoding == {"dtype": "int16", "zlib": True}
    assert enc.set_encoding({"a": 1}).encoding == {"a": 1}


def test_open_corpus_vrt_params_warp_at_open(ray_session):
    """WarpedVRT-ingestion analogue (_io.py:1096-1122): warp params captured
    at open time; every downstream read sees warped rows, identical to an
    explicit open->reproject chain."""
    import numpy as np
    import pytest

    import rioxarray_ray.api as api

    vrt = api.open_corpus(6, vrt_params={"crs": "EPSG:3857"})
    explicit = api.open_corpus(6).reproject("EPSG:3857")
    a = sorted(vrt.take_all(), key=lambda r: r["image_id"])
    b = sorted(explicit.take_all(), key=lambda r: r["image_id"])
    assert [r["crs"] for r in a] == ["EPSG:3857"] * 6
    for ra, rb in zip(a, b):
        assert ra["transform"] == rb["transform"]
        assert ra["pixels"] == rb["pixels"]

    # explicit destination grid (transform+width+height all required)
    row = api.open_corpus(1).reproject("EPSG:3857").take(1)[0]
    grid_vrt = api.open_corpus(3, vrt_params={
        "crs": "EPSG:3857", "transform": list(row["transform"]),
        "width": row["w"], "height": row["h"], "resampling": "bilinear",
    })
    out = grid_vrt.take_all()
    assert all(r["h"] == row["h"] and r["w"] == row["w"] for r in out)
    assert all(tuple(r["transform"]) == tuple(row["transform"]) for r in out)

    with pytest.raises(ValueError, match="transform AND width AND height"):
        api.open_corpus(2, vrt_params={"crs": "EPSG:3857", "width": 10})
    with pytest.raises(ValueError, match="unsupported vrt_params"):
        api.open_corpus(2, vrt_params={"crs": "EPSG:3857", "tolerance": 0.1})
    with pytest.raises(ValueError, match="destination 'crs'"):
        api.open_corpus(2, vrt_params={"resampling": "nearest"})


def test_open_netcdfs_rows_flow_through_engine(ray_session):
    """netCDF4/HDF5 container bytes -> engine raster rows -> reproject +
    clip_box work unchanged (the open_rasterio-on-netCDF parity path; the
    reference's golden corpus is this format)."""
    import numpy as np
    import pytest
    import ray.data as rd

    from rioxarray_ray.kernels import hdf5

    h, w = 20, 20
    x = -58.0 + (np.arange(w) + 0.5) * 0.01
    y = 39.0 - (np.arange(h) + 0.5) * 0.01
    rows = []
    for i in range(4):
        arr = ((np.arange(2 * h * w, dtype=np.int64) % 97) + i).astype(
            np.int16).reshape(2, h, w)
        payload = hdf5.write_netcdf({
            "x": (x, ("x",), {}),
            "y": (y, ("y",), {}),
            "temp": (arr, ("band", "y", "x"),
                     {"_FillValue": np.int16(-99), "crs": "EPSG:4326"}),
        })
        rows.append({"image_id": f"n{i}", "payload": payload})
    rds = api.open_netcdfs(rd.from_items(rows))
    out = rds.reproject("EPSG:3857").take_all()
    assert len(out) == 4 and all(r["crs"] == "EPSG:3857" for r in out)
    assert all(r["image_id"].endswith("/temp") for r in out)
    clipped = rds.clip_box(-58.0, 38.9, -57.95, 39.0).take_all()
    assert len(clipped) == 4
    assert all(r["h"] == 10 and r["w"] == 5 for r in clipped)

    with pytest.raises(Exception, match="no spatial variable"):
        api.open_netcdfs(rd.from_items(rows), variable="nope").take_all()


def test_open_netcdfs_reads_reference_modis(ray_session):
    """The reference's own golden input opens through the Ray path."""
    import os

    import ray.data as rd

    fp = "/root/reference/test/test_data/input/MODIS_ARRAY.nc"
    if not os.path.exists(fp):
        import pytest

        pytest.skip("reference data not present")
    rows = [{"image_id": "modis", "payload": open(fp, "rb").read()}]
    out = api.open_netcdfs(rd.from_items(rows)).take_all()
    assert len(out) == 1
    r = out[0]
    assert r["image_id"] == "modis/__xarray_dataarray_variable__"
    assert (r["band_count"], r["h"], r["w"]) == (1, 200, 200)
    assert r["dtype"] == "int16" and r["nodata"] == -28672.0
    assert "+proj=sinu" in r["crs"]


def test_open_geotiffs_rows_flow_through_engine(ray_session):
    """Real .tif bytes -> engine raster rows -> reproject + clip_box work
    unchanged (the open_rasterio-on-GeoTIFF parity path)."""
    import numpy as np
    import pytest
    import ray.data as rd

    from rioxarray_ray.kernels import tiff

    arr = (np.arange(2 * 20 * 20, dtype=np.int64) % 97).astype(np.int16)
    arr = arr.reshape(2, 20, 20)
    t = (0.01, 0.0, -58.0, 0.0, -0.01, 39.0)
    rows = [
        {"image_id": f"t{i}",
         "payload": tiff.encode_geotiff(
             arr + i, transform=t, crs="EPSG:4326",
             compression="deflate" if i % 2 else "none")}
        for i in range(4)
    ]
    rds = api.open_geotiffs(rd.from_items(rows))
    out = rds.reproject("EPSG:3857").take_all()
    assert len(out) == 4 and all(r["crs"] == "EPSG:3857" for r in out)
    clipped = rds.clip_box(-58.0, 38.9, -57.95, 39.0).take_all()
    assert len(clipped) == 4
    assert all(r["h"] == 10 and r["w"] == 5 for r in clipped)

    bad = rd.from_items(
        [{"image_id": "x", "payload": tiff.encode_geotiff(arr)}]
    )
    with pytest.raises(Exception, match="georeferencing"):
        api.open_geotiffs(bad).take_all()


def test_to_geotiffs_roundtrip(ray_session, tmp_path):
    """Write real .tif files, read them back via open_geotiffs: pixels,
    transform and CRS survive (the to_raster-on-GeoTIFF parity path)."""
    import json
    import os

    import ray.data as rd

    rds = api.open_corpus(4)
    manifest = rds.to_geotiffs(str(tmp_path), compression="deflate")
    written = json.load(open(manifest))["written"]
    assert len(written) == 4
    files = sorted(f for f in os.listdir(tmp_path) if f.endswith(".tif"))
    assert len(files) == 4

    rows = [{"image_id": f[:-4], "payload": open(tmp_path / f, "rb").read()}
            for f in files]
    back = api.open_geotiffs(rd.from_items(rows), nodata=-9999.0)
    orig = {r["image_id"]: r for r in rds.take_all()}
    for r in back.take_all():
        o = orig[r["image_id"]]
        assert r["pixels"] == o["pixels"]
        assert r["crs"] == o["crs"]
        assert tuple(r["transform"]) == tuple(o["transform"])
        assert (r["band_count"], r["h"], r["w"]) == (
            o["band_count"], o["h"], o["w"])


def test_open_images_mixed_wild_formats(ray_session):
    """The generic open-any-recognized-format front door: PNG/JPEG-free
    mix (png, bmp, gif, geotiff, corpus raw16) decodes through ONE stage;
    GeoTIFF keeps its embedded georeferencing, ungeoreferenced formats
    get the identity transform and crs=None."""
    import ray.data as rd

    import rioxarray_ray.api as api
    from rioxarray_ray.kernels import bmp, codecs, gif, png, tiff

    gray = np.arange(64, dtype=np.uint8).reshape(8, 8)
    rgb = np.repeat(gray[None], 3, axis=0)
    i16 = (np.arange(64, dtype=np.int16) * 7 - 100).reshape(1, 8, 8)
    t = (0.5, 0.0, 10.0, 0.0, -0.25, 20.0)
    payloads = {
        "png": png.encode_png(rgb),
        "bmp": bmp.encode_bmp(rgb),
        "gif": gif.encode_gif(rgb),
        "tif": tiff.encode_geotiff(i16, transform=t, crs="EPSG:32633"),
        "raw": codecs.encode(i16, "raw16"),
    }
    ds = rd.from_items(
        [{"image_id": k, "payload": v} for k, v in payloads.items()]
    )
    rows = {r["image_id"]: r for r in api.open_images(ds).ds.take_all()}
    assert len(rows) == 5
    for k in ("png", "bmp", "gif"):
        r = rows[k]
        assert (r["band_count"], r["h"], r["w"]) == (3, 8, 8)
        assert r["crs"] is None
        assert list(r["transform"]) == [1.0, 0.0, 0.0, 0.0, 1.0, 0.0]
        px = np.frombuffer(r["pixels"], np.uint8).reshape(3, 8, 8)
        np.testing.assert_array_equal(px, rgb)
    for k in ("tif", "raw"):
        px = np.frombuffer(rows[k]["pixels"], np.int16).reshape(1, 8, 8)
        np.testing.assert_array_equal(px, i16)
    assert rows["tif"]["crs"] == "EPSG:32633"
    assert list(rows["tif"]["transform"]) == list(t)
    assert rows["raw"]["crs"] is None

    # unrecognized payloads raise, never silently decode
    bad = rd.from_items([{"image_id": "x", "payload": b"\x99garbage"}])
    with pytest.raises(Exception, match="unrecognized payload format"):
        api.open_images(bad).ds.take_all()


def test_accessor_analysis_wrappers(ray_session):
    """The chainable accessor exposes the round-4 analysis ops and they
    agree with the underlying stages on row counts."""
    from rioxarray_ray import api
    from rioxarray_ray.sources import corpus

    rds = api.open_corpus(8)
    halo_tiles = rds.tile(64, halo=1)
    fm = halo_tiles.focal_mean(radius=1)
    tr = halo_tiles.terrain()
    assert fm.count() == tr.count() > 0

    import pyarrow.compute as pc
    import pyarrow as pa

    def keep4326(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx % 7 != 6))

    flat = api.wrap(
        rds.tile(64).ds.map_batches(
            keep4326, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    comp = flat.composite_median(origin=(-60.0, 40.0), res=5e-3)
    xt = flat.change_crosstab(origin=(-60.0, 40.0), res=5e-3)
    assert comp.count() > 0
    assert xt.count() >= 0  # 8 images may or may not overlap

    points = [g for g in corpus.geometry_table(40) if g["kind"] == "point"]
    samp = flat.sample_points(points)
    assert samp.count() >= 0


def test_accessor_stats_ops(ray_session):
    """The new analysis ops hang off the tiled accessor like the rest."""
    from rioxarray_ray import api

    tiles = api.open_corpus(8).tile(64)
    assert tiles.histogram(bucket=32).count() > 0
    assert tiles.overviews(levels=(2,)).count() > 0
    geo = tiles.ds.filter(lambda r: int(r["image_id"][3:]) % 7 != 6)
    from rioxarray_ray.api import RasterDataset
    assert RasterDataset(geo).temporal_trend(
        origin=(-60.0, 40.0), res=5e-3
    ).count() > 0


def test_accessor_analysis_ops_chain(ray_session):
    """The round's analysis ops are reachable from the accessor and
    compose lazily: tile -> reclassify -> cell_rollup / band_stats /
    equalize / rasterize."""
    from rioxarray_ray import api

    rds = api.open_corpus(6).tile(64)
    rc = rds.reclassify((0, 500), (1, 2, 3))
    assert {r["band"] for r in rc.band_stats().take_all()} >= {0}
    roll = rds.cell_rollup(levels=(6,)).take_all()
    assert roll and all(r["level"] == 6 for r in roll)
    eq = rds.equalize().ds.take(2)
    assert all(r["dtype"] == "int32" for r in eq)
    geom = {
        "type": "Polygon",
        "coordinates": [[[-60, 39], [-59, 39], [-59, 40], [-60, 40],
                         [-60, 39]]],
    }
    burned = rds.rasterize([geom], [5]).ds.take(2)
    assert all(r["band_count"] == 1 for r in burned)


def test_accessor_region_ops(ray_session):
    """region_label and sieve hang off the tiled accessor; sieve
    composes lazily (returns a wrapped RasterDataset)."""
    from rioxarray_ray import api

    rds = api.open_corpus(6).tile(64)
    labs = rds.region_label(threshold=120).take_all()
    assert labs and all(r["area"] >= 1 for r in labs)
    sv = rds.sieve(threshold=120, min_size=64)
    assert sv.histogram(bucket=64).count() > 0


def test_accessor_session_round4_ops(ray_session):
    """Every round-4 accessor hook is reachable and returns rows:
    sieve/proximity/match_histograms/percentile_stretch/pansharpen/idw
    on flat tiles; terrain_indices/focal_mode/flow_direction/
    flow_accumulation/watershed on halo'd tiles."""
    from rioxarray_ray import api

    flat = api.open_corpus(6).tile(64)
    halo = api.open_corpus(4).tile(64, halo=1)

    assert flat.sieve(threshold=120, min_size=16).ds.count() > 0
    assert flat.proximity(threshold=120).count() > 0
    ref = flat.band_value_counts()
    assert flat.match_histograms(ref).ds.count() > 0
    assert flat.percentile_stretch().ds.count() > 0
    three = api.RasterDataset(
        flat.ds.filter(lambda r: int(r["image_id"][3:]) % 5 == 0)
    )
    assert three.pansharpen().ds.count() > 0
    pt = {"type": "Point", "coordinates": [-59.9, 39.9]}
    assert flat.idw([pt], [7], radius_px=6).count() > 0
    assert halo.terrain_indices().count() > 0
    assert halo.focal_mode().count() > 0
    assert halo.flow_direction().count() > 0
    assert halo.flow_accumulation().count() > 0
    assert halo.watershed().count() > 0
