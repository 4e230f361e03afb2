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
    batch: pa.Table,
    tile_size: int = 64,
    cell_res: int = CELL_RES,
    halo: int = 0,
) -> pa.Table:
    """Columnar hot path: pixels are read as zero-copy views and tile
    payloads land in one contiguous output buffer; only small scalar
    columns go through python lists.

    ``halo > 0`` ships each tile with up to ``halo`` extra source pixels on
    every side (clamped at image edges) so downstream resampling kernels
    have full support at tile boundaries (SURVEY.md §7.4 halo correctness;
    kernels.warp.KERNEL_MARGIN gives the per-kernel need).  The row's
    ``transform``/``h``/``w`` describe the EXPANDED window; the core region
    is recovered from ``win_row_off``/``win_col_off`` (absolute, core) and
    ``tile_row``/``tile_col`` (grid position) with core size =
    ``min(tile_size, image_extent - core_off)``.
    """
    from .schema import BinaryBuilder, pixel_views

    ids = batch["image_id"].to_pylist()
    crss = batch["crs"].to_pylist()
    dtypes = batch["dtype"].to_pylist()
    caps = batch["caption"].to_pylist()
    nodatas = batch["nodata"].to_numpy(zero_copy_only=False)
    phashes = batch["phash"].to_numpy(zero_copy_only=False)
    transforms = batch["transform"].to_pylist()
    out = {name: [] for name in TILE_SCHEMA.names if name != "pixels"}
    # halo=0 tiles partition their image exactly, so the output payload
    # equals the input payload size; halo'd tiles grow past the reserve
    # and BinaryBuilder expands transparently
    pixcol = batch["pixels"]
    in_bytes = (
        sum(c.nbytes for c in pixcol.chunks)
        if isinstance(pixcol, pa.ChunkedArray)
        else pixcol.nbytes
    )
    builder = BinaryBuilder(reserve=in_bytes)
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
                er0 = max(r0 - halo, 0)
                ec0 = max(c0 - halo, 0)
                er1 = min(r0 + th + halo, h)
                ec1 = min(c0 + tw + halo, w)
                sub = pixels[:, er0:er1, ec0:ec1]
                sub_t = aff.window_transform(transform, ec0, er0)
                # cell from the CORE centroid (halo must not move cells)
                core_t = aff.window_transform(transform, c0, r0)
                cx, cy = aff.apply(core_t, tw / 2.0, th / 2.0)
                if projected:
                    lon, lat = c.inverse(cx, cy)
                else:
                    lon, lat = cx, cy
                cell = int(cellindex.cell(float(lon), float(lat), cell_res))
                out["image_id"].append(ids[i])
                out["band_count"].append(sub.shape[0])
                out["h"].append(er1 - er0)
                out["w"].append(ec1 - ec0)
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
                out["core_roff"].append(r0 - er0)
                out["core_coff"].append(c0 - ec0)
                out["core_h"].append(th)
                out["core_w"].append(tw)
    arrays = []
    for field in TILE_SCHEMA:
        if field.name == "pixels":
            arrays.append(builder.finish())
        else:
            arrays.append(pa.array(out[field.name], field.type))
    return pa.Table.from_arrays(arrays, schema=TILE_SCHEMA)


def tile_stage(ds, tile_size: int = 64, cell_res: int = CELL_RES, halo: int = 0,
               **map_kwargs):
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return ds.map_batches(
        lambda b: tile_batch(
            b, tile_size=tile_size, cell_res=cell_res, halo=halo
        ),
        **kwargs,
    )


def cell_rollup_stage(tiles_ds, levels=(8, 6, 4), **map_kwargs):
    """Hierarchical cell roll-up — aggregate tile-level facts up the
    H3-style parent hierarchy (the h3 ``cell_to_parent`` + groupby
    pyramid every spatial-join pipeline runs for coverage maps and
    level-of-detail dashboards; kernels/cellindex.parent is the
    arithmetic).

    Per (level, parent_cell): tile count and covered-pixel count.

    100-TB shape: partials are combined INSIDE map_batches first (one
    (level, cell, n, px) row per distinct parent cell per batch — the
    combiner-before-shuffle pattern), then ONE groupby Sum over rows
    whose cardinality is bounded by distinct parent cells x levels,
    never by tiles.  Level fan-out costs len(levels) rows per distinct
    cell per batch, not a dataset copy.
    """
    from ray.data.aggregate import Sum

    from ..kernels import cellindex

    levels = tuple(int(lv) for lv in levels)

    def partial(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        th = batch["th"].to_numpy(zero_copy_only=False).astype(np.int64) \
            if "th" in batch.column_names else \
            batch["h"].to_numpy(zero_copy_only=False).astype(np.int64)
        tw = batch["tw"].to_numpy(zero_copy_only=False).astype(np.int64) \
            if "tw" in batch.column_names else \
            batch["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        px = th * tw
        out_cell, out_lv, out_n, out_px = [], [], [], []
        for lv in levels:
            par = cellindex.parent(cells, lv)
            order = np.argsort(par, kind="stable")
            ps = par[order]
            uniq, starts = np.unique(ps, return_index=True)
            n_per = np.diff(np.append(starts, ps.size))
            px_sorted = px[order]
            px_per = np.add.reduceat(px_sorted, starts)
            out_cell.append(uniq)
            out_lv.append(np.full(uniq.size, lv, np.int64))
            out_n.append(n_per.astype(np.int64))
            out_px.append(px_per.astype(np.int64))
        return pa.table(
            {
                "level": pa.array(np.concatenate(out_lv), pa.int64()),
                "cell": pa.array(np.concatenate(out_cell), pa.int64()),
                "n_tiles": pa.array(np.concatenate(out_n), pa.int64()),
                "px": pa.array(np.concatenate(out_px), pa.int64()),
            }
        )

    partials = tiles_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, **map_kwargs
    )
    return partials.groupby(["level", "cell"]).aggregate(
        Sum("n_tiles", alias_name="n_tiles"),
        Sum("px", alias_name="px"),
    )
