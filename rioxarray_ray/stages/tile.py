"""Tiling + cell-assignment stage.

Splits raster rows into fixed-size tiles (edge tiles keep their true smaller
size), shifts each tile's transform (isel_window semantics,
/root/reference/rioxarray/rioxarray.py:854-904), and assigns every tile the
hierarchical cell (kernels.cellindex) of its CENTROID in lon/lat — the
groupby key for all wide stages (SURVEY.md §7.3).

Runs as stateless ``map_batches`` emitting more rows than it consumes
(the Ray-idiomatic flat_map over batches).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import affine as aff
from ..kernels import cellindex
from ..kernels import crs as crs_mod
from ..sources.corpus import CELL_RES
from .schema import TILE_SCHEMA, pixels_from_row, pixels_to_bytes


def tile_batch(
    batch: pa.Table, tile_size: int = 64, cell_res: int = CELL_RES
) -> pa.Table:
    """Columnar hot path: pixels are read as zero-copy views and tile
    payloads land in one contiguous output buffer; only small scalar
    columns go through python lists."""
    from .schema import BinaryBuilder, pixel_views

    ids = batch["image_id"].to_pylist()
    crss = batch["crs"].to_pylist()
    dtypes = batch["dtype"].to_pylist()
    caps = batch["caption"].to_pylist()
    nodatas = batch["nodata"].to_numpy(zero_copy_only=False)
    phashes = batch["phash"].to_numpy(zero_copy_only=False)
    transforms = batch["transform"].to_pylist()
    out = {name: [] for name in TILE_SCHEMA.names if name != "pixels"}
    builder = BinaryBuilder()
    for i, pixels in enumerate(pixel_views(batch)):
        transform = tuple(transforms[i])
        c = crs_mod.from_user_input(crss[i]) if crss[i] else None
        projected = c is not None and c.is_projected
        _, h, w = pixels.shape
        n_tr = (h + tile_size - 1) // tile_size
        n_tc = (w + tile_size - 1) // tile_size
        for tr in range(n_tr):
            r0 = tr * tile_size
            th = min(tile_size, h - r0)
            for tc in range(n_tc):
                c0 = tc * tile_size
                tw = min(tile_size, w - c0)
                sub = pixels[:, r0 : r0 + th, c0 : c0 + tw]
                sub_t = aff.window_transform(transform, c0, r0)
                cx, cy = aff.apply(sub_t, tw / 2.0, th / 2.0)
                if projected:
                    lon, lat = c.inverse(cx, cy)
                else:
                    lon, lat = cx, cy
                cell = int(cellindex.cell(float(lon), float(lat), cell_res))
                out["image_id"].append(ids[i])
                out["band_count"].append(sub.shape[0])
                out["h"].append(th)
                out["w"].append(tw)
                out["dtype"].append(dtypes[i])
                out["nodata"].append(float(nodatas[i]))
                out["crs"].append(crss[i])
                out["transform"].append([float(v) for v in sub_t])
                builder.append(sub)
                out["caption"].append(caps[i])
                out["phash"].append(int(phashes[i]))
                out["tile_row"].append(tr)
                out["tile_col"].append(tc)
                out["cell"].append(cell)
                out["win_row_off"].append(r0)
                out["win_col_off"].append(c0)
    arrays = []
    for field in TILE_SCHEMA:
        if field.name == "pixels":
            arrays.append(builder.finish())
        else:
            arrays.append(pa.array(out[field.name], field.type))
    return pa.Table.from_arrays(arrays, schema=TILE_SCHEMA)


def tile_stage(ds, tile_size: int = 64, cell_res: int = CELL_RES, **map_kwargs):
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return ds.map_batches(
        lambda b: tile_batch(b, tile_size=tile_size, cell_res=cell_res), **kwargs
    )
