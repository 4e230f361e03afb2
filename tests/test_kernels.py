"""Unit tests for the pure-numpy kernel layer (SURVEY.md §5 strategy (a)/(b):
literal oracles + round-trip / subset-equivalence invariants)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rioxarray_ray.kernels import affine as aff
from rioxarray_ray.kernels import cellindex, codecs, crs
from rioxarray_ray.kernels import geometry as geom
from rioxarray_ray.kernels import merge as merge_mod
from rioxarray_ray.kernels import nodata as nodata_mod
from rioxarray_ray.kernels.raster import (
    MissingCRS,
    NoDataInBounds,
    OneDimensionalRaster,
    Raster,
)


# ---------------------------------------------------------------- affine
def test_affine_round_trips():
    t = aff.compose(aff.translation(-60.0, 40.0), aff.scale(0.005, -0.005))
    x, y = aff.apply(t, 10, 20)
    c, r = aff.apply_inverse(t, x, y)
    assert abs(c - 10) < 1e-9 and abs(r - 20) < 1e-9
    xs, ys = aff.affine_to_coords(t, 4, 3)
    assert np.allclose(t, aff.coords_to_affine(xs, ys))
    assert aff.from_gdal(*aff.to_gdal(t)) == t
    assert np.allclose(aff.compose(t, aff.invert(t)), aff.IDENTITY)


def test_affine_bounds_and_resolution():
    t = aff.compose(aff.translation(-60.0, 40.0), aff.scale(0.005, -0.005))
    left, bottom, right, top = aff.bounds(t, 50, 40)
    assert (left, top) == (-60.0, 40.0)
    assert abs(right - (-60.0 + 50 * 0.005)) < 1e-12
    assert abs(bottom - (40.0 - 40 * 0.005)) < 1e-12
    assert aff.resolution(t) == (0.005, 0.005)
    assert not aff.has_rotation(t)
    assert aff.has_rotation((1.0, 0.2, 0.0, 0.0, -1.0, 0.0))


def test_window_from_bounds_matches_isel():
    t = aff.compose(aff.translation(-60.0, 40.0), aff.scale(0.005, -0.005))
    wb = aff.bounds(aff.window_transform(t, 10, 5), 20, 15)
    c0, r0, w, h = aff.window_from_bounds(t, *wb)
    assert (round(c0), round(r0), round(w), round(h)) == (10, 5, 20, 15)


# ---------------------------------------------------------------- crs
@pytest.mark.parametrize(
    "c,lons,lats",
    [
        (crs.WEB_MERCATOR, [-93.2, 0.0, 140.0], [42.1, -70.0, 5.0]),
        (crs.utm(15), [-95.5, -93.0, -90.2], [30.0, 42.0, 49.5]),
        (crs.utm(33, south=True), [12.2, 15.1, 17.9], [-42.1, -45.3, -38.9]),
        (crs.SINUSOIDAL, [-93.2, 10.0, 140.0], [42.1, -70.0, 5.0]),
    ],
)
def test_crs_forward_inverse_round_trip(c, lons, lats):
    lon = np.asarray(lons)
    lat = np.asarray(lats)
    x, y = c.forward(lon, lat)
    lo, la = c.inverse(x, y)
    assert np.allclose(lo, lon, atol=1e-7)
    assert np.allclose(la, lat, atol=1e-7)


def test_crs_known_values():
    # UTM central meridian at the equator is (500000, 0)
    x, y = crs.utm(15).forward(-93.0, 0.0)
    assert abs(x - 500000.0) < 1e-6 and abs(y) < 1e-6
    # web mercator world edge
    x, _ = crs.WEB_MERCATOR.forward(180.0, 0.0)
    assert abs(x - 20037508.342789244) < 1e-3


def test_crs_parsing():
    assert crs.from_user_input("EPSG:4326") == crs.GEOGRAPHIC
    assert crs.from_user_input(3857) == crs.WEB_MERCATOR
    # the reference's literal UTM proj string (FIXTURES.md F4)
    c = crs.from_user_input("+datum=WGS84 +no_defs +proj=utm +units=m +zone=15")
    assert c == crs.utm(15)
    assert crs.from_user_input("EPSG:32715") == crs.utm(15, south=True)
    assert crs.from_user_input(crs.SINUSOIDAL.to_string()) == crs.SINUSOIDAL
    assert crs.from_user_input(crs.utm(15).to_wkt()) == crs.utm(15)
    with pytest.raises(crs.CRSError):
        crs.from_user_input("EPSG:27700")  # non-UTM tmerc: outside whitelist


def _wkt2_projcrs(method: str, params: list[tuple[str, float]]) -> str:
    body = ",".join(f'PARAMETER["{k}",{v}]' for k, v in params)
    return (
        'PROJCRS["unknown",BASEGEOGCRS["WGS 84",DATUM['
        '"World Geodetic System 1984",ELLIPSOID["WGS 84",6378137,'
        '298.257223563,LENGTHUNIT["metre",1]]],PRIMEM["Greenwich",0]],'
        f'CONVERSION["unknown",METHOD["{method}"],{body}],'
        'CS[Cartesian,2],LENGTHUNIT["metre",1]]'
    )


def _esri_projcs(projection: str, params: list[tuple[str, float]]) -> str:
    body = ",".join(f'PARAMETER["{k}",{v}]' for k, v in params)
    return (
        f'PROJCS["custom",GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",'
        'SPHEROID["WGS_1984",6378137.0,298.257223563]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        f'PROJECTION["{projection}"],{body},UNIT["Meter",1.0]]'
    )


def test_crs_parsing_wkt2():
    """WKT2 (the serialization pyproj emits by default — reference
    leniency rioxarray/crs.py:12-45) parses for every whitelisted
    family via METHOD + EPSG parameter names."""
    c = crs.from_user_input(_wkt2_projcrs("Transverse Mercator", [
        ("Latitude of natural origin", 0),
        ("Longitude of natural origin", -93),
        ("Scale factor at natural origin", 0.9996),
        ("False easting", 500000), ("False northing", 0)]))
    assert c == crs.utm(15)
    c = crs.from_user_input(_wkt2_projcrs("Lambert Conic Conformal (2SP)", [
        ("Latitude of false origin", 46.5),
        ("Longitude of false origin", 3),
        ("Latitude of 1st standard parallel", 49),
        ("Latitude of 2nd standard parallel", 44),
        ("Easting at false origin", 700000),
        ("Northing at false origin", 6600000)]))
    assert c == crs.lcc(49, 44, 46.5, 3, 700000, 6600000)
    c = crs.from_user_input(_wkt2_projcrs("Albers Equal Area", [
        ("Latitude of false origin", 23),
        ("Longitude of false origin", -96),
        ("Latitude of 1st standard parallel", 29.5),
        ("Latitude of 2nd standard parallel", 45.5),
        ("Easting at false origin", 0),
        ("Northing at false origin", 0)]))
    assert c == crs.aea(29.5, 45.5, 23, -96, 0, 0)
    c = crs.from_user_input(_wkt2_projcrs("Polar Stereographic (variant B)", [
        ("Latitude of standard parallel", -71),
        ("Longitude of origin", 0),
        ("False easting", 0), ("False northing", 0)]))
    assert c == crs.polar_stereographic(-71.0)
    # geographic WKT2 without an ID block
    c = crs.from_user_input(
        'GEOGCRS["WGS 84",DATUM["World Geodetic System 1984",'
        'ELLIPSOID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
        'CS[ellipsoidal,2]]')
    assert c == crs.GEOGRAPHIC
    # unknown method must raise, not silently misproject
    with pytest.raises(crs.CRSError, match="operation method"):
        crs.from_user_input(_wkt2_projcrs("Krovak", [("False easting", 0)]))


def test_crs_parsing_esri_wkt():
    """ESRI WKT (D_WGS_1984 datum spelling, alias projection names)."""
    c = crs.from_user_input(_esri_projcs("Transverse_Mercator", [
        ("False_Easting", 500000.0), ("False_Northing", 0.0),
        ("Central_Meridian", -93.0), ("Scale_Factor", 0.9996),
        ("Latitude_Of_Origin", 0.0)]))
    assert c == crs.utm(15)
    c = crs.from_user_input(_esri_projcs("Lambert_Conformal_Conic", [
        ("False_Easting", 700000.0), ("False_Northing", 6600000.0),
        ("Central_Meridian", 3.0), ("Standard_Parallel_1", 49.0),
        ("Standard_Parallel_2", 44.0), ("Latitude_Of_Origin", 46.5)]))
    assert c == crs.lcc(49, 44, 46.5, 3, 700000, 6600000)
    c = crs.from_user_input(_esri_projcs("Albers", [
        ("False_Easting", 0.0), ("False_Northing", 0.0),
        ("Central_Meridian", -96.0), ("Standard_Parallel_1", 29.5),
        ("Standard_Parallel_2", 45.5), ("Latitude_Of_Origin", 23.0)]))
    assert c == crs.aea(29.5, 45.5, 23, -96, 0, 0)
    # a non-WGS84 ESRI datum must reject (would run the WGS84 kernel wrong)
    with pytest.raises(crs.CRSError, match="non-WGS84"):
        crs.from_user_input(_esri_projcs("Transverse_Mercator", [
            ("Central_Meridian", -2.0), ("Scale_Factor", 0.9996012717),
            ("Latitude_Of_Origin", 49.0)]).replace("WGS_1984", "OSGB_1936"))


@given(
    zone=st.integers(1, 60),
    south=st.booleans(),
)
@settings(deadline=None, max_examples=30)
def test_crs_wkt2_esri_utm_roundtrip_property(zone, south):
    """Every UTM zone parses identically from WKT2 and ESRI WKT and
    agrees with the canonical constructor at a sample point."""
    lon0 = (zone - 1) * 6.0 - 180.0 + 3.0
    y0 = 10000000.0 if south else 0.0
    wkt2 = _wkt2_projcrs("Transverse Mercator", [
        ("Latitude of natural origin", 0),
        ("Longitude of natural origin", lon0),
        ("Scale factor at natural origin", 0.9996),
        ("False easting", 500000), ("False northing", y0)])
    esri = _esri_projcs("Transverse_Mercator", [
        ("False_Easting", 500000.0), ("False_Northing", y0),
        ("Central_Meridian", lon0), ("Scale_Factor", 0.9996),
        ("Latitude_Of_Origin", 0.0)])
    want = crs.utm(zone, south=south)
    a = crs.from_user_input(wkt2)
    b = crs.from_user_input(esri)
    assert a == want and b == want
    lat = -40.0 if south else 40.0
    xa, ya = a.forward(lon0 + 1.5, lat)
    xw, yw = want.forward(lon0 + 1.5, lat)
    assert xa == xw and ya == yw


def test_estimate_utm_crs():
    assert crs.estimate_utm_crs(-94, 40, -92, 44) == crs.utm(15)
    assert crs.estimate_utm_crs(14, -44, 16, -40) == crs.utm(33, south=True)


def test_transform_bounds_densification():
    # a straight lat edge bulges in Mercator-like projections; densified
    # envelope must contain the undensified corner envelope
    b0 = crs.transform_bounds(
        crs.GEOGRAPHIC, crs.utm(15), -99.0, 30.0, -87.0, 45.0, densify_pts=0
    )
    b21 = crs.transform_bounds(
        crs.GEOGRAPHIC, crs.utm(15), -99.0, 30.0, -87.0, 45.0, densify_pts=21
    )
    assert b21[0] <= b0[0] and b21[1] <= b0[1]
    assert b21[2] >= b0[2] and b21[3] >= b0[3]


# ---------------------------------------------------------------- codecs
def test_codecs_lossless_round_trip(rng):
    px = rng.integers(-3000, 3000, size=(2, 37, 53)).astype(np.int16)
    px[0, 5:9, 5:9] = -28672
    for fmt in ("raw16", "pngz"):
        assert np.array_equal(codecs.decode(codecs.encode(px, fmt), fmt), px)
    u8 = rng.integers(0, 250, size=(1, 20, 30)).astype(np.uint8)
    assert np.array_equal(codecs.decode(codecs.encode(u8, "rawu8"), "rawu8"), u8)


def test_codec_lq8_psnr_and_nodata(rng):
    px = rng.integers(-3000, 3000, size=(2, 37, 53)).astype(np.int16)
    px[0, 5:9, 5:9] = -28672
    dec = codecs.decode(codecs.encode(px, "lq8", nodata=-28672), "lq8")
    mask = px != -28672
    assert np.array_equal(dec == -28672, ~mask)  # nodata survives exactly
    assert codecs.psnr(px, dec, mask) >= 40.0  # BASELINE.md criterion


def test_codec_fmt_mismatch_raises(rng):
    px = rng.integers(0, 10, size=(1, 4, 4)).astype(np.int16)
    with pytest.raises(ValueError):
        codecs.decode(codecs.encode(px, "raw16"), "pngz")


# ---------------------------------------------------------------- cell index
def test_cellindex_pack_matches_sql_formula():
    cid = int(cellindex.cell(-93.0, 42.0, 10))
    res, row, col = (int(v) for v in cellindex.unpack(cid))
    assert cid == res * 2**52 + row * 2**26 + col  # the DuckDB oracle formula
    lon0, lat0, lon1, lat1 = cellindex.cell_bounds(cid)
    assert lon0 <= -93.0 < lon1 and lat0 <= 42.0 <= lat1


def test_cellindex_hierarchy_and_ring():
    cid = int(cellindex.cell(-93.0, 42.0, 10))
    kids = cellindex.children(cid)
    assert len(kids) == 4
    assert all(int(cellindex.parent(k, 10)) == cid for k in kids)
    assert len(cellindex.ring(cid, 1)) == 9
    assert cid in cellindex.ring(cid, 1)
    covered = cellindex.cells_for_bbox(-93.1, 41.9, -92.9, 42.1, 10)
    assert cid in set(int(c) for c in covered)


# ---------------------------------------------------------------- nodata
def test_nodata_defaults_and_coercion():
    assert nodata_mod.default_nodata(np.int16) == -32768
    assert nodata_mod.default_nodata(np.uint8) == 255
    assert np.isnan(nodata_mod.default_nodata(np.float32))
    assert nodata_mod.ensure_nodata_dtype(255, np.uint8) == 255
    with pytest.raises(ValueError):
        nodata_mod.ensure_nodata_dtype(65535, np.uint8)
    with pytest.raises(ValueError):
        nodata_mod.ensure_nodata_dtype(float("nan"), np.int16)


# ---------------------------------------------------------------- raster ops
def test_identity_reproject_is_exact(demo_raster):
    out = demo_raster.reproject(
        crs.GEOGRAPHIC,
        transform=demo_raster.transform,
        shape=demo_raster.shape,
        resampling="nearest",
    )
    assert np.array_equal(out.pixels, demo_raster.pixels)


def test_reproject_requires_crs(demo_raster):
    r = Raster(demo_raster.pixels, demo_raster.transform, None, -28672)
    with pytest.raises(MissingCRS):
        r.reproject(crs.WEB_MERCATOR)


def test_reproject_resolution_xor_shape(demo_raster):
    with pytest.raises(Exception, match="resolution cannot be used"):
        demo_raster.reproject(crs.WEB_MERCATOR, resolution=100.0, shape=(10, 10))


def test_reproject_default_nodata_from_dtype(demo_raster):
    r = Raster(demo_raster.pixels, demo_raster.transform, crs.GEOGRAPHIC, None)
    out = r.reproject(crs.WEB_MERCATOR)
    assert out.nodata == -32768  # int16 default (S3; _spatial_utils.py:28-45)


def test_reproject_smooth_round_trip():
    yy, xx = np.mgrid[0:40, 0:50]
    smooth = (1000 * np.sin(xx / 8.0) * np.cos(yy / 9.0) + 20 * xx + 10 * yy)[None]
    t = aff.compose(aff.translation(-60.0, 40.0), aff.scale(0.005, -0.005))
    rs = Raster(smooth, t, crs.GEOGRAPHIC, nodata=None)
    u = crs.estimate_utm_crs(*rs.bounds())
    for meth, rel_tol in [("bilinear", 0.005), ("cubic", 0.001)]:
        back = rs.reproject(u, resampling=meth).reproject(
            crs.GEOGRAPHIC, transform=t, shape=rs.shape, resampling=meth
        )
        inner = back.pixels[0][3:-3, 3:-3]
        ref = smooth[0][3:-3, 3:-3]
        valid = ~np.isnan(inner)
        rel = np.abs(inner[valid] - ref[valid]).max() / (ref.max() - ref.min())
        assert rel < rel_tol, (meth, rel)


def test_reproject_match_grid_exact(demo_raster):
    u = crs.estimate_utm_crs(*demo_raster.bounds())
    match = demo_raster.reproject(u, resolution=500.0)
    out = demo_raster.reproject_match(match)
    assert out.shape == match.shape
    assert out.transform == match.transform  # bit-equal grid (issue #298)
    assert out.crs == match.crs


def test_clip_rect_equals_window_slice(demo_raster):
    t = demo_raster.transform
    poly = geom.rect_geometry(*aff.bounds(aff.window_transform(t, 10, 5), 20, 15))
    clipped = demo_raster.clip([poly])
    sliced = demo_raster.isel_window(5, 10, 15, 20)
    assert np.array_equal(clipped.pixels, sliced.pixels)
    assert np.allclose(clipped.transform, sliced.transform)


def test_clip_invert_checksum(demo_raster):
    t = demo_raster.transform
    px = demo_raster.pixels
    poly = geom.rect_geometry(*aff.bounds(aff.window_transform(t, 10, 5), 20, 15))
    cl = demo_raster.clip([poly], drop=False)
    ci = demo_raster.clip([poly], drop=False, invert=True)
    total = px[demo_raster.valid_mask()].astype(np.int64).sum()
    s1 = cl.pixels[cl.valid_mask()].astype(np.int64).sum()
    s2 = ci.pixels[ci.valid_mask()].astype(np.int64).sum()
    assert s1 + s2 == total
    assert cl.shape == demo_raster.shape  # drop=False keeps shape


def test_clip_all_outside_raises(demo_raster):
    poly = geom.rect_geometry(10, 10, 11, 11)
    with pytest.raises(NoDataInBounds):
        demo_raster.clip([poly])


def test_clip_box_pad_box_round_trip(demo_raster):
    t = demo_raster.transform
    wb = aff.bounds(aff.window_transform(t, 10, 5), 20, 15)
    sub = demo_raster.clip_box(*wb)
    padded = sub.pad_box(*demo_raster.bounds())
    assert padded.shape == demo_raster.shape
    assert np.allclose(padded.transform, demo_raster.transform)
    ring = np.ones(demo_raster.shape, bool)
    ring[5:20, 10:30] = False
    assert (padded.pixels[0][ring] == -28672).all()
    assert np.array_equal(
        padded.pixels[0][5:20, 10:30], demo_raster.pixels[0][5:20, 10:30]
    )


def test_clip_box_error_contracts(demo_raster):
    with pytest.raises(OneDimensionalRaster):
        demo_raster.clip_box(-59.9, 39.9, -59.899, 39.901)
    demo_raster.clip_box(
        -59.9, 39.9, -59.899, 39.901, allow_one_dimensional_raster=True
    )
    with pytest.raises(NoDataInBounds):
        demo_raster.clip_box(10, 10, 11, 11)
    with pytest.raises(Exception, match="antimeridian"):
        demo_raster.clip_box(-19.5e6, 3.5e6, 19.5e6, 6.5e6, crs=crs.WEB_MERCATOR)


def test_clip_box_auto_expand(demo_raster):
    out = demo_raster.clip_box(-59.9, 39.9, -59.899, 39.901, auto_expand=True)
    assert out.width > 1 and out.height > 1


def test_merge_quadrants_reassembles(demo_raster):
    r = demo_raster
    q = [
        r.isel_window(0, 0, 20, 25),
        r.isel_window(0, 25, 20, 25),
        r.isel_window(20, 0, 20, 25),
        r.isel_window(20, 25, 20, 25),
    ]
    mt, mw, mh = merge_mod.union_grid([x.bounds() for x in q], r.resolution())
    assert (mw, mh) == (50, 40)
    merged = merge_mod.merge_tiles(
        [(x.pixels, x.transform) for x in q], mt, (mh, mw), -28672, "first",
        dtype=r.pixels.dtype,
    )
    assert np.array_equal(merged, r.pixels)
    assert np.allclose(mt, r.transform)


def test_merge_methods_on_overlap(demo_raster):
    r = demo_raster
    o1 = r.isel_window(0, 0, 40, 30)
    o2 = r.isel_window(0, 20, 40, 30)
    mt, mw, mh = merge_mod.union_grid([o1.bounds(), o2.bounds()], r.resolution())
    srcs = [(o1.pixels, o1.transform), (o2.pixels, o2.transform)]
    cnt = merge_mod.merge_tiles(srcs, mt, (mh, mw), -28672, "count", dtype=np.float64)
    assert cnt[0].max() == 2.0  # overlap column band
    first = merge_mod.merge_tiles(srcs, mt, (mh, mw), -28672, "first", dtype=np.int16)
    last = merge_mod.merge_tiles(srcs, mt, (mh, mw), -28672, "last", dtype=np.int16)
    # overlap: columns 20..29; source order decides the winner
    both_valid = (cnt[0] == 2.0)
    assert np.array_equal(first[0][both_valid], r.pixels[0][both_valid])
    assert np.array_equal(last[0][both_valid], r.pixels[0][both_valid])
    mx = merge_mod.merge_tiles(srcs, mt, (mh, mw), -28672, "max", dtype=np.int16)
    mn = merge_mod.merge_tiles(srcs, mt, (mh, mw), -28672, "min", dtype=np.int16)
    assert (mx[0][both_valid] >= mn[0][both_valid]).all()


def test_interpolate_na_nearest_exact(demo_raster):
    r2 = demo_raster.interpolate_na("nearest")
    px = demo_raster.pixels
    assert (r2.pixels != -28672).all()
    assert np.array_equal(r2.pixels[px != -28672], px[px != -28672])
    vm = px[0] != -28672
    ys, xs = np.nonzero(vm)
    iys, ixs = np.nonzero(~vm)
    for k in range(len(iys)):
        d2 = (ys - iys[k]) ** 2 + (xs - ixs[k]) ** 2
        dmin = d2.min()
        cand = {int(px[0][ys[m], xs[m]]) for m in np.nonzero(d2 == dmin)[0]}
        assert int(r2.pixels[0][iys[k], ixs[k]]) in cand


def test_interpolate_na_all_nodata_passthrough():
    t = aff.compose(aff.translation(0, 0), aff.scale(1, -1))
    px = np.full((1, 5, 5), -28672, dtype=np.int16)
    r = Raster(px, t, crs.GEOGRAPHIC, nodata=-28672)
    out = r.interpolate_na("nearest")
    assert np.array_equal(out.pixels, px)  # reference behavior (:1577)


# ---------------------------------------------------------------- geometry
def test_pip_star_polygon_matches_brute_force(rng):
    # concave star polygon vs per-point brute-force ray casting
    angles = np.linspace(0, 2 * np.pi, 11)[:-1]
    radius = np.where(np.arange(10) % 2 == 0, 1.0, 0.45)
    verts = np.stack([radius * np.cos(angles), radius * np.sin(angles)], 1)
    ring = np.vstack([verts, verts[:1]])
    poly = {"type": "Polygon", "coordinates": [ring.tolist()]}
    pts = rng.uniform(-1.2, 1.2, size=(500, 2))
    got = geom.points_in_geometry(pts[:, 0], pts[:, 1], poly)
    exp = np.array(
        [bool(geom.points_in_rings(np.array([x]), np.array([y]),
                                   [ring])[0]) for x, y in pts]
    )
    assert np.array_equal(got, exp)
    assert 0 < got.sum() < len(pts)


def test_polygon_with_hole():
    outer = [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
    inner = [[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]]
    poly = {"type": "Polygon", "coordinates": [outer, inner]}
    assert geom.points_in_geometry([1.0], [1.0], poly)[0]
    assert not geom.points_in_geometry([5.0], [5.0], poly)[0]
    t = aff.compose(aff.translation(0, 10), aff.scale(1, -1))
    inside = geom.rasterize([poly], (10, 10), t)
    assert inside[0, 0] and not inside[5, 5]
    assert inside.sum() == 100 - 16


def test_geometry_mask_contract():
    poly = geom.rect_geometry(2, 2, 5, 5)
    t = aff.compose(aff.translation(0, 10), aff.scale(1, -1))
    mask = geom.geometry_mask([poly], (10, 10), t)
    # default: True OUTSIDE (rasterio contract)
    assert mask.sum() == 100 - 9
    inv = geom.geometry_mask([poly], (10, 10), t, invert=True)
    assert np.array_equal(mask, ~inv)


def test_all_touched_superset():
    tri = {"type": "Polygon",
           "coordinates": [[[0.2, 0.2], [7.7, 1.1], [3.3, 8.8], [0.2, 0.2]]]}
    t = aff.compose(aff.translation(0, 10), aff.scale(1, -1))
    center = geom.rasterize([tri], (10, 10), t, all_touched=False)
    touched = geom.rasterize([tri], (10, 10), t, all_touched=True)
    assert (touched | center).sum() == touched.sum()  # superset
    assert touched.sum() > center.sum()


def test_bbox_index():
    geoms = [geom.rect_geometry(i, i, i + 1, i + 1) for i in range(10)]
    idx = geom.BBoxIndex(geoms)
    hits = idx.query(2.5, 2.5, 4.5, 4.5)
    assert set(hits.tolist()) == {2, 3, 4}


def test_delaunay_plane_reproduction():
    """Linear scattered interpolation reproduces a PLANE exactly for any
    valid triangulation — the triangulation-independent oracle."""
    from rioxarray_ray.kernels.delaunay import delaunay, interpolate_linear

    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 10, size=(120, 2))
    plane = lambda p: 3.0 * p[:, 0] - 2.0 * p[:, 1] + 7.0
    vals = plane(pts)
    tris = delaunay(pts)
    assert len(tris) > 0
    # every triangle references valid vertex ids
    assert tris.min() >= 0 and tris.max() < len(pts)
    q = rng.uniform(1, 9, size=(200, 2))  # interior queries
    got = interpolate_linear(pts, vals, q)
    inside = ~np.isnan(got)
    assert inside.mean() > 0.95
    np.testing.assert_allclose(got[inside], plane(q[inside]), atol=1e-8)


def test_interpolate_na_linear_plane(demo_raster):
    """interpolate_na('linear'): holes in a planar raster fill exactly."""
    from rioxarray_ray.kernels.interpolate import interpolate_na

    yy, xx = np.mgrid[0:40, 0:50]
    plane = (2.0 * xx - 3.0 * yy + 100.0).astype(np.float64)
    holed = plane.copy()
    holed[10:16, 12:20] = np.nan
    holed[25:28, 35:44] = np.nan
    out = interpolate_na(holed, float("nan"), method="linear")
    assert not np.isnan(out).any()
    np.testing.assert_allclose(out, plane, atol=1e-8)
    # integer dtype path with explicit nodata
    ip = np.rint(plane).astype(np.int16)
    ih = ip.copy()
    ih[10:16, 12:20] = -28672
    iout = interpolate_na(ih, -28672, method="linear")
    assert (iout != -28672).all()
    np.testing.assert_allclose(iout, ip, atol=1)


def test_interpolate_na_cubic_plane_exact_and_quadratic_close():
    """interpolate_na('cubic'): plane holes fill exactly (the Hermite blend
    is plane-precise); quadratic holes fill to small relative error
    (gradient estimates are local LSQ fits, so quadratics are approximate
    — same as scipy's Clough-Tocher with estimated gradients)."""
    from rioxarray_ray.kernels.interpolate import interpolate_na

    yy, xx = np.mgrid[0:40, 0:50]
    plane = (2.0 * xx - 3.0 * yy + 100.0).astype(np.float64)
    holed = plane.copy()
    holed[10:16, 12:20] = np.nan
    holed[25:28, 35:44] = np.nan
    out = interpolate_na(holed, float("nan"), method="cubic")
    assert not np.isnan(out).any()
    np.testing.assert_allclose(out, plane, atol=1e-8)
    quad = (0.05 * xx**2 - 0.04 * yy**2 + 0.03 * xx * yy + xx - yy).astype(
        np.float64
    )
    qh = quad.copy()
    qh[12:17, 14:22] = np.nan
    qout = interpolate_na(qh, float("nan"), method="cubic")
    assert not np.isnan(qout).any()
    span = quad.max() - quad.min()
    rel = np.abs(qout - quad).max() / span
    assert rel < 0.01, rel
    # and strictly better than nearest on the same quadratic hole
    nout = interpolate_na(qh, float("nan"), method="nearest")
    assert np.abs(qout - quad).max() < np.abs(nout - quad).max()


def test_interpolate_na_unknown_method_raises(demo_raster):
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="spline"):
        demo_raster.interpolate_na("spline")


def test_slice_xy_clamps_origin_not_extent(demo_raster):
    """A bbox extending past the top/left edge must SHRINK the window, not
    shift it past the requested extent (review finding r1)."""
    left, bottom, right, top = demo_raster.bounds()
    out = demo_raster.slice_xy(left - 0.05, top - 0.015, left + 0.025, top + 0.05)
    # only the intersecting 3 rows x 5 cols
    assert out.shape == (3, 5)
    assert np.array_equal(out.pixels, demo_raster.pixels[:, :3, :5])
    assert np.allclose(out.transform, demo_raster.transform)


def test_reproject_transform_only_uses_src_shape(demo_raster):
    """transform= without shape= -> dst shape == src shape
    (raster_array.py:397-402 semantics; review finding r4)."""
    t = (0.004, 0.0, -60.01, 0.0, -0.004, 40.01)
    out = demo_raster.reproject(crs.GEOGRAPHIC, transform=t)
    assert out.shape == demo_raster.shape
    assert out.transform == t


def test_merge_int_no_nodata_fills_zero(demo_raster):
    """Integer mosaic without nodata fills 0 (rasterio behavior), never a
    NaN-cast (review finding r3)."""
    px = np.ones((1, 4, 4), dtype=np.int16) * 7
    t = aff.compose(aff.translation(0, 4), aff.scale(1, -1))
    mt, mw, mh = merge_mod.union_grid([(0, -4, 4, 4)], (1.0, 1.0))
    out = merge_mod.merge_tiles([(px, t)], mt, (mh, mw), None, "first",
                                dtype=np.int16)
    assert out.shape == (1, 8, 4)
    assert (out[0][:4] == 7).all()
    assert (out[0][4:] == 0).all()  # uncovered -> 0, not garbage


def test_unclosed_rings_auto_close():
    """GeoJSON rings without the duplicate closing vertex must behave
    identically to closed ones (review finding k1)."""
    open_sq = {"type": "Polygon",
               "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10]]]}
    closed_sq = {"type": "Polygon",
                 "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]}
    px = np.array([-5.0, 5.0])
    py = np.array([5.0, 5.0])
    a = geom.points_in_geometry(px, py, open_sq)
    b = geom.points_in_geometry(px, py, closed_sq)
    assert np.array_equal(a, b) and list(a) == [False, True]


def test_window_from_bounds_rejects_rotation():
    rot = (1.0, 0.3, 0.0, 0.2, -1.0, 0.0)
    with pytest.raises(ValueError, match="rectilinear"):
        aff.window_from_bounds(rot, 0, 0, 10, 10)


def test_crs_ellipsoidal_merc_and_generic_tmerc():
    """Ellipsoidal Mercator (EPSG:3395 family) + generic WGS84 tmerc are
    first-class kinds (round-3 coverage item; the reference accepts them
    via pyproj, /root/reference/rioxarray/crs.py:12-45)."""
    # spherical web-mercator spelling is still its own (different) kernel
    assert crs.from_user_input("+proj=merc +R=6378137") == crs.WEB_MERCATOR
    m = crs.from_user_input("+proj=merc +datum=WGS84")
    assert m == crs.from_epsg(3395) and m.to_epsg() == 3395
    # ~30 km y divergence from spherical web mercator at 45N (the reason
    # the two were never interchangeable)
    _, y_sph = crs.WEB_MERCATOR.forward(0.0, 45.0)
    _, y_ell = m.forward(0.0, 45.0)
    assert 30_000 < float(y_sph - y_ell) < 31_000
    # Snyder 1987 worked example (Mercator, Clarke 1866: a=6378206.4,
    # e^2=0.00676866; phi=35N lam=75W lam0=180W -> 11688673.7, 4139145.6)
    import math

    x, y = crs.merc_ell_forward(
        -75.0, 35.0, lon_0=-180.0, a=6378206.4, e=math.sqrt(0.00676866)
    )
    assert abs(float(x) - 11688673.7) < 0.2
    assert abs(float(y) - 4139145.6) < 0.2
    # dual-formulation identity on WGS84:
    # y = a*asinh(tan(phi)) - a*e*atanh(e*sin(phi))
    lats = np.linspace(-85.0, 85.0, 41)
    _, Y = m.forward(np.zeros_like(lats), lats)
    phi = np.deg2rad(lats)
    Y2 = 6378137.0 * np.arcsinh(np.tan(phi)) - 6378137.0 * crs._E * np.arctanh(
        crs._E * np.sin(phi)
    )
    assert np.abs(Y - Y2).max() < 1e-6
    # inverse round-trip
    lo, la = m.inverse(*m.forward(12.25, -55.5))
    assert abs(float(lo) - 12.25) < 1e-9 and abs(float(la) + 55.5) < 1e-9

    # generic tmerc: exact UTM parameterization keeps the UTM identity
    assert crs.from_user_input(
        "+proj=tmerc +lon_0=-93 +k=0.9996 +x_0=500000 +y_0=0 +lat_0=0"
    ) == crs.utm(15)
    # arbitrary parameters are a real projection now, equal to the UTM
    # kernel when driven with UTM parameters
    g = crs.CRS("tmerc", params=(0.0, -93.0, 0.9996, 500000.0, 0.0))
    for lon0, lat0 in [(-93.5, 42.0), (-90.0, 10.0), (-95.9, 60.0)]:
        xu, yu = crs.utm(15).forward(lon0, lat0)
        xg, yg = g.forward(lon0, lat0)
        assert abs(float(xu - xg)) < 1e-9 and abs(float(yu - yg)) < 1e-9
    # nonzero origin/scale/false offsets round-trip (series truncation is
    # sub-mm: tolerance 1e-7 deg ~ 1 cm)
    t = crs.from_user_input(
        "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 "
        "+x_0=400000 +y_0=-100000 +datum=WGS84"
    )
    assert t == crs.tmerc(49.0, -2.0, 0.9996012717, 400000.0, -100000.0)
    for lon0, lat0 in [(-3.5, 51.5), (0.5, 53.0), (-2.0, 49.0)]:
        lo, la = t.inverse(*t.forward(lon0, lat0))
        assert abs(float(lo) - lon0) < 1e-7 and abs(float(la) - lat0) < 1e-7
    # the projection origin maps to the false origin exactly
    x0, y0 = t.forward(-2.0, 49.0)
    assert abs(float(x0) - 400000.0) < 1e-6 and abs(float(y0) + 100000.0) < 1e-6
    # string/WKT round-trips for both new kinds
    for c in (m, t, crs.world_mercator(10.0, 1000.0, 2000.0)):
        assert crs.from_user_input(c.to_string()) == c
        assert crs.from_user_input(c.to_wkt()) == c
    # non-WGS84 datums stay rejected
    with pytest.raises(crs.CRSError, match="WGS84"):
        crs.from_user_input("+proj=tmerc +lon_0=10 +ellps=airy")
    with pytest.raises(crs.CRSError, match="WGS84"):
        crs.from_user_input("+proj=merc +datum=NAD83")


def test_lq8_nan_nodata(rng):
    fpx = rng.uniform(-100, 100, size=(1, 16, 16))
    fpx[0, 2:5, 2:5] = np.nan
    # lq8 stores int16; cast a float-with-NaN scenario through the
    # NaN-aware validity path (finding k5): encode must not warn/garbage
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        payload = codecs.encode(fpx, "lq8", nodata=float("nan"))
    dec = codecs.decode(payload, "lq8")
    assert (dec[0, 2:5, 2:5] == -32768).all()  # NaN nodata -> int16 sentinel
    m = ~np.isnan(fpx)
    assert codecs.psnr(fpx[m], dec[m].astype(np.float64)) >= 40


def test_cellindex_wrap_dedupe_and_degenerate_bbox():
    cid = int(cellindex.cell(0.0, 0.0, 2))
    s = cellindex.shell(cid, 2)
    assert len(s) == len(set(s))  # no duplicates when ring wraps the globe
    r = cellindex.ring(cid, 3)
    assert len(r) == len(set(r))
    # degenerate bbox on a cell boundary still returns the containing cell
    cells = cellindex.cells_for_bbox(0.0, 0.0, 0.0, 0.0, 4)
    assert len(cells) >= 1
    with pytest.raises(ValueError, match="MAX_RES"):
        cellindex.children(int(cellindex.cell(0, 0, cellindex.MAX_RES)))


# ------------------------------------------------- area/statistic resampling
_AREA_IDENTITY_METHODS = ("average", "sum", "min", "max", "med", "mode", "q1", "q3")


def test_area_resampling_identity_grid(demo_raster):
    """Identity warp: every dst pixel's box is exactly its own src pixel, so
    every statistic reproduces the input (nodata pixels stay nodata)."""
    from rioxarray_ray.kernels import crs

    for meth in _AREA_IDENTITY_METHODS:
        out = demo_raster.reproject(
            crs.GEOGRAPHIC,
            transform=demo_raster.transform,
            shape=demo_raster.shape,
            resampling=meth,
        )
        assert np.array_equal(out.pixels, demo_raster.pixels), meth
    # rms of a single sample is |v| — check on non-negative data
    r = Raster(
        np.abs(demo_raster.pixels), demo_raster.transform,
        demo_raster.crs, demo_raster.nodata,
    )
    out = r.reproject(
        crs.GEOGRAPHIC, transform=r.transform, shape=r.shape, resampling="rms"
    )
    assert np.array_equal(out.pixels, r.pixels)


def test_area_downsample_block_stats():
    """2x downsample on an aligned grid: boxes are exact 2x2 blocks, so each
    kernel must equal the corresponding block statistic."""
    from rioxarray_ray.kernels import crs

    rng_ = np.random.default_rng(7)
    data = rng_.uniform(-50.0, 50.0, size=(1, 8, 10)).astype(np.float64)
    t = aff.compose(aff.translation(-60.0, 40.0), aff.scale(0.005, -0.005))
    t2 = aff.compose(aff.translation(-60.0, 40.0), aff.scale(0.01, -0.01))
    r = Raster(data, t, crs.GEOGRAPHIC, nodata=None)
    blocks = data[0].reshape(4, 2, 5, 2).transpose(0, 2, 1, 3).reshape(4, 5, 4)
    expected = {
        "average": blocks.mean(axis=2),
        "sum": blocks.sum(axis=2),
        "min": blocks.min(axis=2),
        "max": blocks.max(axis=2),
        "med": np.median(blocks, axis=2),
        "q1": np.quantile(blocks, 0.25, axis=2),
        "q3": np.quantile(blocks, 0.75, axis=2),
        "rms": np.sqrt((blocks**2).mean(axis=2)),
    }
    for meth, exp in expected.items():
        out = r.reproject(
            crs.GEOGRAPHIC, transform=t2, shape=(4, 5), resampling=meth
        )
        assert np.allclose(out.pixels[0], exp, rtol=1e-12, atol=1e-12), meth


def test_area_mode_categorical_and_tiebreak():
    from rioxarray_ray.kernels import crs

    data = np.array(
        [[1, 1, 2, 3], [1, 2, 2, 3], [5, 5, 6, 6], [5, 4, 6, 4]],
        dtype=np.int16,
    )[None]
    t = aff.compose(aff.translation(-60.0, 40.0), aff.scale(0.005, -0.005))
    t2 = aff.compose(aff.translation(-60.0, 40.0), aff.scale(0.01, -0.01))
    r = Raster(data, t, crs.GEOGRAPHIC, nodata=None)
    out = r.reproject(crs.GEOGRAPHIC, transform=t2, shape=(2, 2), resampling="mode")
    # blocks: {1,1,1,2}->1, {2,3,2,3} tie->lowest=2, {5,5,5,4}->5, {6,6,6,4}->6
    assert out.pixels[0].tolist() == [[1, 2], [5, 6]]


def test_area_average_ignores_nodata():
    from rioxarray_ray.kernels import crs

    data = np.full((1, 4, 4), 10.0)
    data[0, 0, 0] = -999.0  # nodata in first block
    data[0, 2:4, 0:2] = -999.0  # fully-nodata block
    t = aff.compose(aff.translation(-60.0, 40.0), aff.scale(0.005, -0.005))
    t2 = aff.compose(aff.translation(-60.0, 40.0), aff.scale(0.01, -0.01))
    r = Raster(data, t, crs.GEOGRAPHIC, nodata=-999.0)
    out = r.reproject(crs.GEOGRAPHIC, transform=t2, shape=(2, 2), resampling="average")
    assert out.pixels[0, 0, 0] == 10.0  # mean over the 3 valid pixels
    assert out.pixels[0, 1, 0] == -999.0  # all-nodata box -> dst nodata


def test_lanczos_constant_and_smooth_round_trip():
    from rioxarray_ray.kernels import crs

    const = np.full((1, 30, 30), 7.5)
    t = aff.compose(aff.translation(-60.0, 40.0), aff.scale(0.005, -0.005))
    r = Raster(const, t, crs.GEOGRAPHIC, nodata=None)
    u = crs.estimate_utm_crs(*r.bounds())
    out = r.reproject(u, resampling="lanczos")
    valid = ~np.isnan(out.pixels)
    assert np.allclose(out.pixels[valid], 7.5, atol=1e-9)
    yy, xx = np.mgrid[0:40, 0:50]
    smooth = (1000 * np.sin(xx / 8.0) * np.cos(yy / 9.0) + 20 * xx + 10 * yy)[None]
    rs = Raster(smooth, t, crs.GEOGRAPHIC, nodata=None)
    back = rs.reproject(u, resampling="lanczos").reproject(
        crs.GEOGRAPHIC, transform=t, shape=rs.shape, resampling="lanczos"
    )
    inner = back.pixels[0][4:-4, 4:-4]
    ref = smooth[0][4:-4, 4:-4]
    valid = ~np.isnan(inner)
    rel = np.abs(inner[valid] - ref[valid]).max() / (ref.max() - ref.min())
    assert rel < 0.001, rel


def test_resampling_enum_codes():
    from rioxarray_ray.kernels import warp as warp_mod

    assert warp_mod.resolve_resampling(0) == "nearest"
    assert warp_mod.resolve_resampling(4) == "lanczos"
    assert warp_mod.resolve_resampling(5) == "average"
    assert warp_mod.resolve_resampling(13) == "sum"
    with pytest.raises(ValueError):
        warp_mod.resolve_resampling(7)  # gauss unsupported
    with pytest.raises(ValueError):
        warp_mod.resolve_resampling("gauss")


# ------------------------------------------------- rotated-affine warp
def _rotated_transform(theta_deg: float, resx=0.005, resy=-0.005,
                       x0=-60.0, y0=40.0):
    th = np.radians(theta_deg)
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    lin = rot @ np.diag([resx, resy])
    return (lin[0, 0], lin[0, 1], x0, lin[1, 0], lin[1, 1], y0)


@pytest.mark.parametrize("resampling", ["nearest", "bilinear", "cubic"])
def test_rotated_affine_warp_plane_reproduction(resampling):
    """Rotated src grids (reference 2-D-coords path, _spatial_utils.py:
    129-142): a plane in map coords is affine in pixel coords, so every
    interpolating kernel must reproduce it on the warped axis-aligned
    grid."""
    from rioxarray_ray.kernels import crs

    t = _rotated_transform(20.0)
    cols = np.arange(50) + 0.5
    rows = np.arange(40) + 0.5
    cg, rg = np.meshgrid(cols, rows)
    x, y = aff.apply(t, cg, rg)
    A, B = 3.0, -7.0
    data = (A * x + B * y)[None]
    r = Raster(data, t, crs.GEOGRAPHIC, nodata=None)
    out = r.reproject(crs.GEOGRAPHIC, resampling=resampling)
    oc = np.arange(out.width) + 0.5
    orow = np.arange(out.height) + 0.5
    ocg, org = np.meshgrid(oc, orow)
    ox, oy = aff.apply(out.transform, ocg, org)
    exp = A * ox + B * oy
    got = out.pixels[0]
    valid = ~np.isnan(got)
    # interior only for nearest (it snaps, so compare against the snapped
    # src sample's own plane value)
    if resampling == "nearest":
        fcol, frow = aff.apply_inverse(t, ox, oy)
        c = np.floor(fcol).astype(int)
        rr = np.floor(frow).astype(int)
        inb = (c >= 0) & (c < 50) & (rr >= 0) & (rr < 40)
        exp2 = np.zeros_like(exp)
        exp2[inb] = data[0][rr[inb], c[inb]]
        assert np.allclose(got[valid & inb], exp2[valid & inb], atol=1e-9)
    else:
        # interior only: boundary pixels renormalize a truncated kernel
        # (weighted extrapolation), which is not plane-exact by design
        fcol, frow = aff.apply_inverse(t, ox, oy)
        m = {"bilinear": 1.5, "cubic": 2.5}[resampling]
        interior = (
            (fcol >= m) & (fcol <= 50 - m) & (frow >= m) & (frow <= 40 - m)
        )
        sel = valid & interior
        assert sel.any()
        span = exp.max() - exp.min()
        assert np.abs((got - exp)[sel]).max() / span < 1e-9


def test_rotated_affine_bounds_envelope():
    t = _rotated_transform(30.0)
    left, bottom, right, top = aff.bounds(t, 50, 40)
    cols = np.array([0.0, 50.0, 0.0, 50.0])
    rows = np.array([0.0, 0.0, 40.0, 40.0])
    xs, ys = aff.apply(t, cols, rows)
    assert np.isclose(left, xs.min()) and np.isclose(right, xs.max())
    assert np.isclose(bottom, ys.min()) and np.isclose(top, ys.max())


# ------------------------------------------------- conic CRS (lcc / aea)
def test_lcc_lambert93_known_point_and_roundtrip():
    """EPSG:2154 (Lambert-93): Paris city hall vs the IGN-published
    coordinate (sub-meter); vectorized round-trip at reference precision
    (>= 7 decimals, rioxarray.crs acceptance parity)."""
    l93 = crs.from_epsg(2154)
    x, y = l93.forward(2.3522, 48.8566)
    assert abs(float(x) - 652469.02) < 1.0
    assert abs(float(y) - 6862035.26) < 1.0
    lons = np.linspace(-5, 10, 30)
    lats = np.linspace(41, 52, 30)
    LO, LA = np.meshgrid(lons, lats)
    X, Y = l93.forward(LO, LA)
    lo2, la2 = l93.inverse(X, Y)
    assert np.abs(lo2 - LO).max() < 1e-9
    assert np.abs(la2 - LA).max() < 1e-9


def test_lcc_conformal_scale_on_standard_parallel():
    l93 = crs.from_epsg(2154)
    a, e2 = 6378137.0, 0.0066943799901413165
    for lat1 in (49.0, 44.0):  # both standard parallels: k == 1
        nu = a / np.sqrt(1 - e2 * np.sin(np.radians(lat1)) ** 2)
        dlam = 1e-4
        x1, y1 = l93.forward(3.0, lat1)
        x2, y2 = l93.forward(3.0 + dlam, lat1)
        proj_d = float(np.hypot(x2 - x1, y2 - y1))
        true_d = np.radians(dlam) * nu * np.cos(np.radians(lat1))
        assert abs(proj_d / true_d - 1.0) < 1e-9, lat1


def test_aea_preserves_area():
    alb = crs.from_epsg(5070)
    a, e2 = 6378137.0, 0.0066943799901413165
    for lon0, lat0 in [(-100.3, 37.2), (-80.0, 45.0), (-120.0, 30.0)]:
        dd = 1e-3
        pts = [
            (lon0, lat0), (lon0 + dd, lat0),
            (lon0 + dd, lat0 + dd), (lon0, lat0 + dd),
        ]
        xy = [alb.forward(*p) for p in pts]
        area_proj = 0.5 * abs(
            sum(
                float(xy[i][0]) * float(xy[(i + 1) % 4][1])
                - float(xy[(i + 1) % 4][0]) * float(xy[i][1])
                for i in range(4)
            )
        )
        s = np.sin(np.radians(lat0 + dd / 2))
        M = a * (1 - e2) / (1 - e2 * s * s) ** 1.5
        NU = a / np.sqrt(1 - e2 * s * s)
        area_true = (
            M * NU * np.cos(np.radians(lat0 + dd / 2)) * np.radians(dd) ** 2
        )
        assert abs(area_proj / area_true - 1.0) < 1e-6, (lon0, lat0)


def test_conic_parsing_epsg_proj4_wkt_roundtrip():
    l93 = crs.from_epsg(2154)
    alb = crs.from_epsg(5070)
    # proj4 round trip (generic parameters, no EPSG)
    custom = crs.from_user_input(
        "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=39 +lon_0=-96 "
        "+x_0=0 +y_0=0 +datum=WGS84 +units=m +no_defs"
    )
    assert custom.kind == "lcc" and custom.to_epsg() is None
    again = crs.from_user_input(custom.to_string())
    assert again == custom
    # WKT1 round trip for every supported kind (ADVICE: emitted WKT must be
    # fully formed and re-parseable)
    for c in (crs.GEOGRAPHIC, crs.WEB_MERCATOR, crs.utm(23, south=True),
              crs.SINUSOIDAL, l93, alb, custom):
        parsed = crs.from_user_input(c.to_wkt())
        assert parsed == c, c
    assert crs.from_user_input("EPSG:5070") == alb
    assert l93.to_string() == "EPSG:2154"


def test_conic_warp_round_trip():
    """Reproject geographic -> CONUS Albers -> back reproduces a smooth
    field (the dense warp path; conics are non-separable)."""
    yy, xx = np.mgrid[0:40, 0:50]
    smooth = (500 * np.sin(xx / 7.0) * np.cos(yy / 8.0) + 10 * xx + 5 * yy)[None]
    t = aff.compose(aff.translation(-100.0, 42.0), aff.scale(0.005, -0.005))
    rs = Raster(smooth, t, crs.GEOGRAPHIC, nodata=None)
    back = rs.reproject(crs.from_epsg(5070), resampling="bilinear").reproject(
        crs.GEOGRAPHIC, transform=t, shape=rs.shape, resampling="bilinear"
    )
    inner = back.pixels[0][3:-3, 3:-3]
    ref = smooth[0][3:-3, 3:-3]
    valid = ~np.isnan(inner)
    rel = np.abs(inner[valid] - ref[valid]).max() / (ref.max() - ref.min())
    assert rel < 0.005, rel


# ------------------------------------------------- complex dtype support
def test_complex_int16_round_trip_and_nodata():
    """complex_int16 -> complex64 decode (the reference's _io.py:493-501
    open-time conversion) + nodata defaults for complex dtypes."""
    rng_ = np.random.default_rng(21)
    real = rng_.integers(-3000, 3000, size=(2, 5, 7)).astype(np.int16)
    imag = rng_.integers(-3000, 3000, size=(2, 5, 7)).astype(np.int16)
    c = (real.astype(np.float32) + 1j * imag.astype(np.float32)).astype(
        np.complex64
    )
    buf = codecs.encode_complex_int16(c)
    back = codecs.decode_complex_int16(buf, c.shape)
    assert back.dtype == np.complex64
    assert np.array_equal(back, c)
    assert np.isnan(nodata_mod.default_nodata(np.complex64))
    assert nodata_mod.ensure_nodata_dtype(0.0, np.complex64) == 0.0
    vm = nodata_mod.valid_mask(
        np.array([1 + 1j, np.nan + 0j, 2.0]), float("nan")
    )
    assert vm.tolist() == [True, False, True]


def test_set_options_context_and_grid_mapping():
    import rioxarray_ray
    from rioxarray_ray.options import (
        CONVENTION,
        EXPORT_GRID_MAPPING,
        get_option,
    )
    from rioxarray_ray.stages import convention as conv

    assert get_option(EXPORT_GRID_MAPPING) is True
    schema = conv.encode_schema(
        __import__("pyarrow").schema([("a", __import__("pyarrow").int32())]),
        "EPSG:32615",
        (500.0, 0.0, 0.0, 0.0, -500.0, 0.0),
    )
    assert b"grid_mapping" in schema.metadata
    with rioxarray_ray.set_options(export_grid_mapping=False):
        s2 = conv.encode_schema(schema, "EPSG:32615", None)
        assert b"grid_mapping" not in s2.metadata
        assert b"spatial_ref" in s2.metadata
    assert get_option(EXPORT_GRID_MAPPING) is True
    with rioxarray_ray.set_options(convention="zarr"):
        s3 = conv.encode_schema(schema, "EPSG:32615", None)
        assert b"zarr_geo" in s3.metadata
    with pytest.raises(ValueError):
        rioxarray_ray.set_options(no_such_option=1)
    with pytest.raises(ValueError):
        rioxarray_ray.set_options(export_grid_mapping="yes")


def test_merge_method_callable():
    """merge(method=callable): a custom combiner participates exactly like
    the built-ins (reference merge.py:96 callable passthrough)."""
    t = aff.compose(aff.translation(0.0, 4.0), aff.scale(1.0, -1.0))
    a = np.full((1, 4, 4), 2.0)
    b = np.full((1, 4, 4), 10.0)

    def mean_combine(dst, dst_valid, src, src_valid):
        both = dst_valid & src_valid
        dst[both] = (dst[both] + src[both]) / 2.0
        new = src_valid & ~dst_valid
        dst[new] = src[new]
        dst_valid |= src_valid

    out = merge_mod.merge_tiles(
        [(a, t), (b, t)], t, (4, 4), nodata=float("nan"),
        method=mean_combine,
    )
    assert np.allclose(out, 6.0)


# ------------------------------------------------- CF datetime decode
def test_cf_datetime_decode_known_values():
    from rioxarray_ray.kernels import cf

    got = cf.decode_cf_datetime([0, 1, 2.5], "days since 2000-01-01")
    assert str(got[0]) == "2000-01-01T00:00:00.000000000"
    assert str(got[1]) == "2000-01-02T00:00:00.000000000"
    assert str(got[2]) == "2000-01-03T12:00:00.000000000"
    got = cf.decode_cf_datetime(
        [3600], "seconds since 1970-01-01 00:00:00"
    )
    assert str(got[0]) == "1970-01-01T01:00:00.000000000"
    # timezone-offset epoch
    got = cf.decode_cf_datetime([0], "hours since 2000-01-01 00:00:00+02:00")
    assert str(got[0]) == "1999-12-31T22:00:00.000000000"
    # round trip
    vals = np.array([0.0, 17.25, 365.0])
    units = "days since 1990-05-04"
    back = cf.encode_cf_datetime(cf.decode_cf_datetime(vals, units), units)
    np.testing.assert_allclose(back, vals, atol=1e-9)
    # large integral offsets decode in int64 (the float64 path is off by
    # tens of ns at ~1.7e18 ns: ulp ~256 ns) — int AND integral-float input
    big = 1700000000123457  # microseconds; *1000 is float64-lossy
    for arr in ([big], np.array([big], np.int64), np.array([float(big)])):
        got = cf.decode_cf_datetime(arr, "microseconds since 1970-01-01")
        assert (
            got[0] - np.datetime64(0, "ns")
        ) // np.timedelta64(1, "ns") == big * 1000
    with pytest.raises(NotImplementedError):
        cf.decode_cf_datetime([0], "days since 2000-01-01", calendar="360_day")
    with pytest.raises(ValueError):
        cf.parse_cf_units("fortnights since 2000-01-01")


def test_cf_decode_time_column_stage(ray_session):
    import ray.data as rd

    from rioxarray_ray.kernels import cf

    ds = rd.from_items([{"id": i, "t": float(i) * 0.5} for i in range(6)])
    out = cf.decode_time_column(
        ds, "t", "hours since 2020-06-01", out_col="ts"
    ).take_all()
    by_id = {r["id"]: r["ts"] for r in out}
    assert str(by_id[0]).startswith("2020-06-01 00:00")
    assert str(by_id[5]).startswith("2020-06-01 02:30")


# ------------------------------------------------- polar stereographic
def test_polar_stereographic_poles_scale_and_roundtrip():
    """EPSG:3413 / 3031: the pole maps to the false origin, scale is true
    on the standard parallel, and forward/inverse round-trips at reference
    precision for both aspects."""
    n = crs.from_epsg(3413)
    s = crs.from_epsg(3031)
    a, e2 = 6378137.0, 0.0066943799901413165
    x, y = n.forward(-45.0, 90.0)
    assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6
    x, y = s.forward(0.0, -90.0)
    assert abs(float(x)) < 1e-6 and abs(float(y)) < 1e-6
    for c, lat_ts in ((n, 70.0), (s, -71.0)):
        nu = a / np.sqrt(1 - e2 * np.sin(np.radians(lat_ts)) ** 2)
        dlam = 1e-4
        lon0 = c.params[1]
        x1, y1 = c.forward(lon0 + 10, lat_ts)
        x2, y2 = c.forward(lon0 + 10 + dlam, lat_ts)
        k = float(np.hypot(x2 - x1, y2 - y1)) / (
            np.radians(dlam) * nu * np.cos(np.radians(lat_ts))
        )
        assert abs(k - 1.0) < 1e-9, (c, k)
    lons = np.linspace(-180, 175, 30)
    for c, lats in (
        (n, np.linspace(45, 89.5, 20)),
        (s, np.linspace(-89.5, -45, 20)),
    ):
        LO, LA = np.meshgrid(lons, lats)
        X, Y = c.forward(LO, LA)
        lo2, la2 = c.inverse(X, Y)
        dlon = np.abs((lo2 - LO + 180) % 360 - 180)
        assert dlon.max() < 1e-9 and np.abs(la2 - LA).max() < 1e-9


def test_polar_stereographic_parsing_and_warp():
    n = crs.from_epsg(3413)
    custom = crs.polar_stereographic(60.0, 10.0, 1000.0, 2000.0)
    for c in (n, crs.from_epsg(3031), crs.from_epsg(3976), custom):
        assert crs.from_user_input(c.to_string()) == c
        assert crs.from_user_input(c.to_wkt()) == c
    assert n.to_string() == "EPSG:3413"
    with pytest.raises(crs.CRSError):
        crs.from_user_input("+proj=stere +lat_0=45 +lon_0=0")  # oblique
    # warp round trip over an arctic scene
    yy, xx = np.mgrid[0:30, 0:40]
    smooth = (300 * np.sin(xx / 6.0) * np.cos(yy / 7.0) + 5 * xx + 3 * yy)[None]
    t = aff.compose(aff.translation(-50.0, 78.0), aff.scale(0.01, -0.005))
    rs = Raster(smooth, t, crs.GEOGRAPHIC, nodata=None)
    back = rs.reproject(n, resampling="bilinear").reproject(
        crs.GEOGRAPHIC, transform=t, shape=rs.shape, resampling="bilinear"
    )
    inner = back.pixels[0][3:-3, 3:-3]
    ref = smooth[0][3:-3, 3:-3]
    valid = ~np.isnan(inner)
    rel = np.abs(inner[valid] - ref[valid]).max() / (ref.max() - ref.min())
    assert rel < 0.01, rel


# ------------------------------------------------- round-2 review fixes
def test_projected_wkt_never_resolves_via_inner_geogcs():
    """A PROJCS WKT whose only parseable EPSG code is the inner GEOGCS 4326
    must NOT parse as geographic (meters-as-degrees hazard): unknown
    projections raise, known PROJECTION branches still parse."""
    ups_like = (
        'PROJCS["WGS 84 / UPS North",GEOGCS["WGS 84",DATUM["WGS_1984",'
        'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4326"]],'
        'PROJECTION["Universal_Polar_Stereographic"],'
        'UNIT["metre",1,AUTHORITY["EPSG","9001"]]]'
    )
    with pytest.raises(crs.CRSError):
        crs.from_user_input(ups_like)
    # known projection with inner 4326 but no outer code -> PROJECTION parse
    l93 = crs.from_epsg(2154)
    wkt = l93.to_wkt().replace(',AUTHORITY["EPSG","2154"]', "")
    assert "2154" not in wkt
    assert crs.from_user_input(wkt) == l93
    # geographic WKT still resolves through its own code
    assert crs.from_user_input(crs.GEOGRAPHIC.to_wkt()) == crs.GEOGRAPHIC


def test_cf_units_ms_us_abbreviations():
    from rioxarray_ray.kernels import cf

    got = cf.decode_cf_datetime([1500], "ms since 1970-01-01")
    assert str(got[0]) == "1970-01-01T00:00:01.500000000"
    got = cf.decode_cf_datetime([2500], "us since 1970-01-01")
    assert str(got[0]) == "1970-01-01T00:00:00.002500000"


def test_ps_grid_mapping_attrs():
    from rioxarray_ray.stages.convention import _cf_grid_mapping

    gm = _cf_grid_mapping(crs.from_epsg(3413))
    assert gm["grid_mapping_name"] == "polar_stereographic"
    assert gm["latitude_of_projection_origin"] == 90.0
    assert gm["standard_parallel"] == 70.0
    gm = _cf_grid_mapping(crs.from_epsg(3031))
    assert gm["latitude_of_projection_origin"] == -90.0


def test_crs_datum_guards_on_explicit_axes():
    """Round-4 advisor items: explicit +a/+b (or +R with +datum) and
    authority-less non-WGS84 WKT must not silently run the WGS84 kernels."""
    # Airy axes on tmerc / merc -> loud CRSError, not a silently-wrong kernel
    with pytest.raises(crs.CRSError):
        crs.from_user_input("+proj=tmerc +a=6377563.396 +b=6356256.909")
    with pytest.raises(crs.CRSError):
        crs.from_user_input("+proj=merc +a=6378388 +b=6356912")
    with pytest.raises(crs.CRSError):
        crs.from_user_input("+proj=tmerc +R=6371000")
    # exact WGS84 axes spelled explicitly are the same whitelist member
    assert crs.from_user_input(
        "+proj=merc +a=6378137 +b=6356752.314245179"
    ) == crs.from_epsg(3395)
    assert crs.from_user_input(
        "+proj=tmerc +a=6378137 +b=6356752.314245179 +lon_0=-93 "
        "+k=0.9996 +x_0=500000"
    ) == crs.utm(15)
    # +R is spherical in PROJ even alongside +datum: web mercator, not 3395
    assert crs.from_user_input(
        "+proj=merc +R=6378137 +datum=WGS84"
    ) == crs.WEB_MERCATOR
    # authority-less Mercator_1SP WKT on a non-WGS84 datum -> CRSError
    bessel_merc = (
        'PROJCS["Bessel Merc",GEOGCS["Bessel 1841",DATUM["D_Bessel",'
        'SPHEROID["Bessel_1841",6377397.155,299.1528128]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Mercator_1SP"],PARAMETER["central_meridian",0],'
        'PARAMETER["scale_factor",1],PARAMETER["false_easting",0],'
        'PARAMETER["false_northing",0],UNIT["metre",1]]'
    )
    with pytest.raises(crs.CRSError):
        crs.from_user_input(bessel_merc)
    # the WGS84 spelling still parses to world mercator
    wgs_merc = bessel_merc.replace("Bessel 1841", "WGS 84").replace(
        'DATUM["D_Bessel",SPHEROID["Bessel_1841",6377397.155,299.1528128]]',
        'DATUM["WGS_1984",SPHEROID["WGS 84",6378137,298.257223563]]',
    )
    assert crs.from_user_input(wgs_merc) == crs.from_epsg(3395)


def test_finalize_band_clips_out_of_range_fill():
    """Round-4 advisor item: an out-of-range dst_nodata on an integer
    output must clip (old reproject_array behavior), never wrap via astype
    (-1 on uint8 must NOT become 255)."""
    from rioxarray_ray.kernels import warp as warp_mod

    vals = np.array([[1.4, 2.6]], dtype=np.float64)
    ok = np.array([[True, False]])
    out = warp_mod.finalize_band(vals, ok, np.dtype(np.uint8), -1.0)
    assert out.dtype == np.uint8
    assert out[0, 0] == 1 and out[0, 1] == 0  # clipped, not wrapped to 255
    out_hi = warp_mod.finalize_band(vals, ok, np.dtype(np.int16), 1e9)
    assert out_hi[0, 1] == np.iinfo(np.int16).max
    # NaN fill on an int output is deterministic (dtype min), not UB
    out_nan = warp_mod.finalize_band(vals, ok, np.dtype(np.int16), np.nan)
    assert out_nan[0, 1] == np.iinfo(np.int16).min
    # float outputs keep the fill verbatim
    out_f = warp_mod.finalize_band(vals, ok, np.dtype(np.float32), np.nan)
    assert np.isnan(out_f[0, 1]) and out_f[0, 0] == np.float32(1.4)


def test_decode_cf_datetime_uint64_overflow_falls_to_float():
    """Round-4 advisor item: uint64 above 2**63-1 must not wrap through the
    int64 fast path (2**64-5 -> epoch-minus-5)."""
    from rioxarray_ray.kernels import cf

    big = np.array([2**64 - 5], dtype=np.uint64)
    # 2**64-5 us since epoch is outside datetime64[ns] entirely: the float
    # fallback must raise, never wrap to a pre-epoch instant
    with pytest.raises(ValueError, match="overflow"):
        cf.decode_cf_datetime(big, "microseconds since 2000-01-01")
    # in-range unsigned values still take the exact int path
    small = np.array([5, 10], dtype=np.uint64)
    exact = cf.decode_cf_datetime(small, "seconds since 2000-01-01")
    assert exact[0] == np.datetime64("2000-01-01T00:00:05", "ns")


def test_morton_interleave_and_locality():
    import numpy as np

    from rioxarray_ray.kernels import cellindex as ci

    # closed-form bit interleave (row bits odd, col bits even)
    rows = np.array([0, 1, 0, 5, 1023])
    cols = np.array([0, 0, 1, 3, 1023])
    cells = ci.pack(10, rows, cols)
    z = ci.morton(cells)
    expect = [
        sum(((int(r) >> i) & 1) << (2 * i + 1) for i in range(10))
        + sum(((int(c) >> i) & 1) << (2 * i) for i in range(10))
        for r, c in zip(rows, cols)
    ]
    assert z.tolist() == expect

    # locality: a 2x2 quad shares its z-prefix (consecutive block of 4)
    quad = ci.pack(10, np.array([6, 6, 7, 7]), np.array([4, 5, 4, 5]))
    zq = np.sort(ci.morton(quad))
    assert zq[-1] - zq[0] == 3

    import pytest

    with pytest.raises(ValueError):
        ci.morton(ci.pack(17, np.array([0]), np.array([0])))
