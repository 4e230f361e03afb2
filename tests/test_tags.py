"""Tag/attr/subdataset metadata parsing parity
(reference behavior: /root/reference/rioxarray/_io.py:463-654; the filter
truth table mirrors test_integration__io.py:55-199)."""

from __future__ import annotations

import numpy as np
import pytest

from rioxarray_ray.sources import tags

_MODIS = (
    'HDF4_EOS:EOS_GRID:"./modis/MOD09GQ.A2017290.h11v04.006.NRT.hdf"'
    ":MODIS_Grid_2D:sur_refl_b01_1"
)
_MODIS_SLASHED = (
    'HDF4_EOS:EOS_GRID:"./modis/MOD09GQ.A2017290.h11v04.006.NRT.hdf"'
    "://MODIS_Grid_2D://sur_refl_b01_1"
)
_NC = "netcdf:../../test/test_data/input/PLANET_SCOPE_3D.nc:blue"
_S5P = (
    "netcdf:S5P_NRTI_L2__NO2____20190513T181819_20190513T182319_08191_"
    "01_010301_20190513T185033.nc:/PRODUCT/tm5_constant_a"
)


@pytest.mark.parametrize(
    "subdataset, variable, group, match",
    [
        (_NC, "green", None, False),
        (_NC, "blue", None, True),
        (_NC + "1", "blue", None, False),
        ("netcdf:f.nc:1blue", "blue", None, False),
        (_NC, "blue", "gr", False),
        (_MODIS, ["sur_refl_b01_1"], None, True),
        (_MODIS, None, ["MODIS_Grid_2D"], True),
        (_MODIS, ("sur_refl_b01_1",), ("MODIS_Grid_2D",), True),
        (_MODIS, "blue", "gr", False),
        (_MODIS, "sur_refl_b01_1", "gr", False),
        (_MODIS, None, "gr", False),
        (_MODIS_SLASHED, "sur_refl_b01_1", None, True),
        (_MODIS_SLASHED, None, "MODIS_Grid_2D", True),
        (_MODIS_SLASHED, "sur_refl_b01_1", "MODIS_Grid_2D", True),
        (_MODIS_SLASHED, "blue", "gr", False),
        (_MODIS_SLASHED, "sur_refl_b01_1", "gr", False),
        (_MODIS_SLASHED, None, "gr", False),
        (_S5P, None, "PRODUCT", True),
        (_S5P, "tm5_constant_a", "PRODUCT", True),
        (_S5P, "tm5_constant_a", "/PRODUCT", True),
    ],
)
def test_build_subdataset_filter(subdataset, variable, group, match):
    got = (
        tags.build_subdataset_filter(group, variable).search(subdataset)
        is not None
    )
    assert got == match


def test_parse_tags_numeric_vector_and_ncglobal():
    parsed = tags.parse_tags(
        {
            "NC_GLOBAL#history": "created",
            "scale": "2",
            "offset": "0.5",
            "add_offset": "{1,2,3}",
            "name": "plain",
            "odd": "{}",
        }
    )
    assert parsed["history"] == "created"
    assert parsed["scale"] == 2 and isinstance(parsed["scale"], int)
    assert parsed["offset"] == 0.5
    np.testing.assert_array_equal(parsed["add_offset"], [1.0, 2.0, 3.0])
    assert parsed["name"] == "plain"


def test_parse_envi_vectors():
    parsed = tags.parse_envi(
        {"wavelength": "{450,550,650}", "fwhm": "{10,10,12}",
         "description": "{a test}"}
    )
    np.testing.assert_array_equal(parsed["wavelength"], [450.0, 550.0, 650.0])
    np.testing.assert_array_equal(parsed["fwhm"], [10.0, 10.0, 12.0])
    assert parsed["description"] == "a test"


def test_load_netcdf_1d_coords():
    coords = tags.load_netcdf_1d_coords(
        {
            "NETCDF_DIM_EXTRA": "{time}",
            "NETCDF_DIM_time_DEF": "{2,6}",
            "NETCDF_DIM_time_VALUES": "{0,872712.659688}",
        }
    )
    assert set(coords) == {"time"}
    assert coords["time"].dtype == np.float64
    np.testing.assert_allclose(coords["time"], [0.0, 872712.659688])
    # bracketed variant + missing DEF is skipped
    coords = tags.load_netcdf_1d_coords(
        {"NETCDF_DIM_EXTRA": "[time depth]",
         "NETCDF_DIM_time_DEF": "[2. 6.]",
         "NETCDF_DIM_time_VALUES": "[0. 1.]"}
    )
    assert set(coords) == {"time"}
    assert tags.load_netcdf_1d_coords({}) == {}


def test_rasterio_dtype_map():
    assert tags.rasterio_to_numpy_dtype(["complex_int16"]) == np.complex64
    assert tags.rasterio_to_numpy_dtype(["int16"]) == np.int16


def test_subdataset_stage(ray_session):
    import ray.data as rd

    rows = [
        {"image_id": "a", "subdatasets": [_MODIS, _NC]},
        {"image_id": "b", "subdatasets": [_S5P]},
        {"image_id": "c", "subdatasets": []},
    ]
    ds = rd.from_items(rows)
    # no filter: every non-group-nested subdataset (the S5P name sits in a
    # group, so the group-less pattern rejects it — reference semantics)
    out = tags.subdataset_stage(ds).take_all()
    assert sorted(r["variable"] for r in out) == ["blue", "sur_refl_b01_1"]
    only_modis = tags.subdataset_stage(
        ds, variable="sur_refl_b01_1"
    ).take_all()
    assert [r["image_id"] for r in only_modis] == ["a"]
    assert only_modis[0]["variable"] == "sur_refl_b01_1"
    in_product = tags.subdataset_stage(ds, group="PRODUCT").take_all()
    assert [r["image_id"] for r in in_product] == ["b"]
    assert in_product[0]["variable"] == "tm5_constant_a"
