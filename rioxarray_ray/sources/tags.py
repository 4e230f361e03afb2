"""Tag / attribute / subdataset metadata parsing.

Reimplements the reference's GDAL/ENVI/netCDF tag grammar and subdataset
filtering (/root/reference/rioxarray/_io.py:463-654): numeric coercion,
``{a,b}`` vector parsing, ``NC_GLOBAL#`` prefix stripping, ENVI wavelength
vectors, NETCDF_DIM 1-D extra coords, and the group/variable subdataset
name filter — all pure helpers usable inside decode ``map_batches``.
"""

from __future__ import annotations

import re
from typing import Any, Iterable

import numpy as np


def to_numeric(value: Any):
    """int if possible, else float, else unchanged (_io.py:504-515)."""
    try:
        return int(value)
    except (TypeError, ValueError):
        try:
            return float(value)
        except (TypeError, ValueError):
            return value


def parse_tag(key: str, value: Any) -> tuple[str, Any]:
    """One GDAL tag: strip netCDF's NC_GLOBAL# prefix; parse ``{a,b,...}``
    numeric vectors; coerce scalars to numbers (_io.py:518-530)."""
    key = key.split("NC_GLOBAL#")[-1]
    if isinstance(value, str) and value.startswith("{") and value.endswith("}"):
        try:
            vec = np.fromstring(value.strip("{}"), dtype=float, sep=",")
            value = vec if len(vec) else to_numeric(value)
        except ValueError:
            value = to_numeric(value)
    else:
        value = to_numeric(value)
    return key, value


def parse_tags(tags: dict) -> dict:
    return dict(parse_tag(k, v) for k, v in tags.items())


def parse_envi(meta: dict) -> dict:
    """ENVI header values: wavelength/fwhm become float vectors, the rest
    lose their braces (_io.py:463-490)."""

    def parsevec(value):
        return np.fromstring(value.strip("{}"), dtype=float, sep=",")

    def default(value):
        return value.strip("{}")

    parse = {"wavelength": parsevec, "fwhm": parsevec}
    return {key: parse.get(key, default)(value) for key, value in meta.items()}


# netCDF external type codes -> numpy dtypes (_io.py:541-556)
NETCDF_DTYPE_MAP = {
    0: object, 1: np.byte, 2: np.str_, 3: np.short, 4: np.int_,
    5: float, 6: np.double, 7: np.ubyte, 8: np.ushort, 9: np.uint,
    10: np.int64, 11: np.uint64, 12: object,
}


def parse_netcdf_attr_array(attr, dtype=None) -> np.ndarray:
    """'{2,6}' or '[2. 6.]' or an iterable -> numpy array (_io.py:574-590)."""
    if isinstance(attr, str):
        if attr.startswith("{"):
            value = attr.strip("{}").split(",")
        else:
            value = attr.strip("[]").split()
    elif not isinstance(attr, Iterable):
        value = [attr]
    else:
        value = attr
    return np.array(value, dtype=dtype)


def load_netcdf_1d_coords(tags: dict) -> dict[str, np.ndarray]:
    """NETCDF_DIM_* tags -> {dim_name: values array} (_io.py:592-613):
    NETCDF_DIM_EXTRA lists the extra dims; per dim, _DEF carries (size,
    dtype code) and _VALUES the data."""
    dim_names = tags.get("NETCDF_DIM_EXTRA")
    if not dim_names:
        return {}
    coords = {}
    for dim_name in parse_netcdf_attr_array(dim_names):
        dim_def = tags.get(f"NETCDF_DIM_{dim_name}_DEF")
        if dim_def is None:
            continue
        _dim_size, dim_dtype_code = parse_netcdf_attr_array(dim_def)
        dtype = NETCDF_DTYPE_MAP.get(int(float(dim_dtype_code)), object)
        coords[dim_name] = parse_netcdf_attr_array(
            tags[f"NETCDF_DIM_{dim_name}_VALUES"], dtype=dtype
        )
    return coords


def rasterio_to_numpy_dtype(dtypes) -> np.dtype:
    """rasterio dtype names -> numpy (complex_int16 -> complex64,
    _io.py:493-501)."""
    if dtypes[0] == "complex_int16":
        return np.dtype("complex64")
    return np.dtype(dtypes[0])


def build_subdataset_filter(group_names, variable_names):
    """Regex over subdataset names like
    ``HDF4_EOS:EOS_GRID:"f.hdf":MODIS_Grid_2D:sur_refl_b01_1`` matching the
    requested netCDF groups/variables (_io.py:616-654 semantics)."""
    variable_query = r"\w+"
    if variable_names is not None:
        if not isinstance(variable_names, (tuple, list)):
            variable_names = [variable_names]
        variable_query = (
            rf"(?:{'|'.join(re.escape(v) for v in variable_names)})"
        )
    if group_names is None:
        return re.compile(r".*(?:\:/|\:)(/+)?" + variable_query + r"$")
    if not isinstance(group_names, (tuple, list)):
        group_names = [group_names]
    group_query = rf"(?:{'|'.join(re.escape(g) for g in group_names)})"
    return re.compile(
        r".*(?:\:/|\:)(/+)?" + group_query + r"[:/](/+)?" + variable_query + r"$"
    )


def subdataset_stage(ds, names_col: str = "subdatasets",
                     group=None, variable=None):
    """Fan a list<string> subdataset-names column into one row per MATCHING
    subdataset (the _load_subdatasets analogue, _io.py:804-847): emits the
    parent row's columns plus ``subdataset`` (full name) and ``variable``
    (trailing component)."""
    import pyarrow as pa

    pattern = build_subdataset_filter(group, variable)

    def explode(batch: pa.Table) -> pa.Table:
        names_lists = batch[names_col].to_pylist()
        take, subs, variables = [], [], []
        for i, names in enumerate(names_lists):
            for name in names or ():
                if pattern.search(name):
                    take.append(i)
                    subs.append(name)
                    # trailing path component (group-nested names separate
                    # the variable with '/'): 'a.nc:/PRODUCT/x' -> 'x'
                    variables.append(re.split(r"[:/]", name)[-1])
        base = batch.drop_columns([names_col]).take(
            pa.array(take, pa.int64())
        )
        return base.append_column(
            "subdataset", pa.array(subs, pa.string())
        ).append_column("variable", pa.array(variables, pa.string()))

    return ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
