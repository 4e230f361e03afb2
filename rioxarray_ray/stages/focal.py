"""Focal (moving-window) statistics over halo'd tiles.

The reference recipe is xarray's ``DataArray.rolling(x=k, y=k)
.mean()`` / ``.sum()`` over a rioxarray-opened raster (rioxarray defers
rolling to xarray; the georeferencing survives because rolling preserves
dims — see /root/reference/rioxarray/raster_array.py accessor docs).

Ray-Data recast: tiles cut WITH a halo (stages/tile.py ``halo >= radius``)
make the op embarrassingly parallel — each tile computes its CORE region
exactly from local data, so there is NO shuffle at all; at 100 TB this is
a single streaming map_batches pass whose output equals its input volume.
Windows clamp at image edges (fewer neighbors), matching
``rolling(..., min_periods=1)`` semantics; nodata pixels contribute
neither value nor count, and the mean at an INVALID center is NaN.

Partitioning assumption (documented per the custom-operator rule): every
tile must carry a halo >= radius on each interior side; tiles whose
top/left margin is too thin (and not at the image edge) raise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FOCAL_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("band", pa.int32()),
        ("win_row_off", pa.int32()),
        ("win_col_off", pa.int32()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("focal_sum", pa.list_(pa.float64())),
        ("focal_cnt", pa.list_(pa.int32())),
        ("mean", pa.list_(pa.float64())),
    ]
)


def focal_sum_count(values: np.ndarray, vm: np.ndarray, radius: int):
    """(bands, h, w) windowed sum + count of VALID pixels, Chebyshev
    ``radius`` window, zero beyond the array (callers guarantee the array
    extends ``radius`` past the region they read, or ends at an image
    edge).  (2*radius+1)^2 shifted adds — vectorized, no per-pixel loop."""
    b, h, w = values.shape
    v = np.where(vm, values.astype(np.float64), 0.0)
    cnt = vm.astype(np.int64)
    pad = radius
    vp = np.pad(v, ((0, 0), (pad, pad), (pad, pad)))
    cp = np.pad(cnt, ((0, 0), (pad, pad), (pad, pad)))
    s = np.zeros((b, h, w), dtype=np.float64)
    c = np.zeros((b, h, w), dtype=np.int64)
    for dr in range(-radius, radius + 1):
        for dc in range(-radius, radius + 1):
            s += vp[:, pad + dr : pad + dr + h, pad + dc : pad + dc + w]
            c += cp[:, pad + dr : pad + dr + h, pad + dc : pad + dc + w]
    return s, c


def focal_mean_stage(tiles_ds, radius: int = 1, **map_kwargs):
    """Per-pixel focal mean over every tile's core region.

    Returns one row per (tile, band): core-sized ``focal_sum`` (float64,
    exact for integer rasters), ``focal_cnt`` and ``mean`` (NaN at invalid
    centers) payloads, plus the core's absolute window offsets.
    """
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    def run(batch: pa.Table) -> pa.Table:
        out = {name: [] for name in FOCAL_SCHEMA.names}
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            cr, cc = row["core_roff"], row["core_coff"]
            ch, cw = row["core_h"], row["core_w"]
            for off, name in ((cr, "row"), (cc, "col")):
                if off < radius and row[f"win_{name}_off"] != off:
                    raise ValueError(
                        f"focal radius {radius} needs tiles cut with "
                        f"halo >= {radius} (stages/tile.py tile_stage "
                        f"halo=...); got a {off}-px {name} margin"
                    )
            nod = row["nodata"]
            if nod != nod:
                nod = (
                    None
                    if np.dtype(row["dtype"]).kind in "iu"
                    else float("nan")
                )
            vm = valid_mask(pixels, nod)
            s, c = focal_sum_count(pixels, vm, radius)
            s = s[:, cr : cr + ch, cc : cc + cw]
            c = c[:, cr : cr + ch, cc : cc + cw]
            core_vm = vm[:, cr : cr + ch, cc : cc + cw]
            with np.errstate(invalid="ignore", divide="ignore"):
                m = np.where(core_vm, s / np.maximum(c, 1), np.nan)
            for b in range(pixels.shape[0]):
                out["image_id"].append(row["image_id"])
                out["tile_row"].append(row["tile_row"])
                out["tile_col"].append(row["tile_col"])
                out["band"].append(b)
                out["win_row_off"].append(row["win_row_off"])
                out["win_col_off"].append(row["win_col_off"])
                out["h"].append(ch)
                out["w"].append(cw)
                out["focal_sum"].append(s[b].ravel())
                out["focal_cnt"].append(c[b].ravel().astype(np.int32))
                out["mean"].append(m[b].ravel())
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in FOCAL_SCHEMA],
            schema=FOCAL_SCHEMA,
        )

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return tiles_ds.map_batches(run, **kwargs)
