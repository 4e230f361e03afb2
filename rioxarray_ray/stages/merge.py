"""Distributed mosaic (merge_arrays semantics, SURVEY.md §2.5).

The Ray-Data recast of rioxarray.merge.merge_arrays
(/root/reference/rioxarray/merge.py:89-223) as a groupby-reduce:

1. plan: a small driver-side aggregate finds the union extent (min/max of
   per-row footprints — a tiny all-to-all over 4 doubles per row); the dst
   grid comes from the first source's resolution unless overridden, exactly
   like the reference defaults (merge.py:145-148);
2. place: ``flat_map`` each source row onto the dst tile grid (slice per
   overlapping dst tile) — requires same-CRS aligned inputs, callers
   reproject mismatched sources first (merge.py:153-159);
3. reduce: ``groupby(dst_tile).map_groups`` combines overlapping pixels
   with the merge ``method`` in deterministic source order (``src_index`` =
   lexicographic image_id rank carried through the shuffle, mirroring the
   reference's input-order winner rule at merge.py:164-167).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels import affine as aff
from ..kernels import merge as merge_kernel
from ..sources.corpus import CELL_RES
from .schema import RASTER_SCHEMA, pixels_to_bytes  # noqa: F401 (schema re-export)


def plan_union_grid(ds, resolution=None):
    """Driver-side plan: (transform, width, height, crs, nodata, dtype).

    Aggregates per-row footprint bounds (4 doubles/row — no pixel movement).
    """
    import pyarrow.compute as pc

    def footprints(batch: pa.Table) -> pa.Table:
        lefts, bottoms, rights, tops = [], [], [], []
        for row in batch.select(["transform", "w", "h"]).to_pylist():
            left, bottom, right, top = aff.bounds(
                tuple(row["transform"]), row["w"], row["h"]
            )
            lefts.append(left)
            bottoms.append(bottom)
            rights.append(right)
            tops.append(top)
        return pa.Table.from_pydict(
            {
                "left": lefts,
                "bottom": bottoms,
                "right": rights,
                "top": tops,
            }
        )

    stats = (
        ds.map_batches(footprints, batch_format="pyarrow", zero_copy_batch=True)
        .aggregate(
            *[
                agg
                for col, cls in (
                    ("left", "min"),
                    ("bottom", "min"),
                    ("right", "max"),
                    ("top", "max"),
                )
                for agg in [_agg(cls, col)]
            ]
        )
    )
    # "first source" = lexicographically-first image_id (the engine's
    # deterministic stand-in for the reference's input-list order); fetch it
    # without sorting pixel payloads: min-key aggregate on a projection,
    # then a vectorized filter.
    from ray.data.aggregate import Min as MinAgg

    min_id = ds.select_columns(["image_id"]).aggregate(MinAgg("image_id"))[
        "min(image_id)"
    ]
    first = (
        ds.map_batches(
            lambda b: b.filter(pc.equal(b["image_id"], min_id)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).take(1)
    )[0]
    resx, resy = aff.resolution(tuple(first["transform"]))
    if resolution is not None:
        resx = resy = float(resolution)
    bounds = (
        stats["min(left)"],
        stats["min(bottom)"],
        stats["max(right)"],
        stats["max(top)"],
    )
    transform, width, height = merge_kernel.union_grid([bounds], (resx, resy))
    return transform, width, height, first["crs"], first["nodata"], first["dtype"]


def _agg(kind, col):
    from ray.data.aggregate import Max, Min

    return Min(col) if kind == "min" else Max(col)


def merge_stage(
    ds,
    method: str = "first",
    resolution=None,
    dst_tile_size: int = 256,
    **map_kwargs,
):
    """Mosaic all rows of ``ds`` (same CRS) into dst tiles. Returns a Dataset
    of raster rows, one per non-empty dst tile, image_id = ``mosaic/r/c``.

    Pins the input first: the plan needs two passes (bounds aggregate +
    first-source fetch) and the placement a third — against an
    unmaterialized lineage those would re-execute the whole upstream."""
    ds = ds.materialize()
    transform, width, height, crs_str, nodata, dtype = plan_union_grid(
        ds, resolution=resolution
    )
    n_tr = (height + dst_tile_size - 1) // dst_tile_size
    n_tc = (width + dst_tile_size - 1) // dst_tile_size
    inv = aff.invert(transform)

    def place(batch: pa.Table) -> pa.Table:
        """Emit (dst_tile_id, src piece) rows for every overlap (columnar:
        zero-copy pixel views in, one contiguous piece buffer out)."""
        from .schema import BinaryBuilder, pixel_views

        out = {
            "dst_tile": [],
            "src_index": [],
            "row_off": [],
            "col_off": [],
            "h": [],
            "w": [],
            "band_count": [],
            "dtype": [],
        }
        builder = BinaryBuilder()
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            t = tuple(row["transform"])
            col0, row0 = aff.apply(inv, t[2], t[5])
            ic0, ir0 = int(round(float(col0))), int(round(float(row0)))
            h, w = row["h"], row["w"]
            tr0, tr1 = max(ir0 // dst_tile_size, 0), min(
                (ir0 + h - 1) // dst_tile_size, n_tr - 1
            )
            tc0, tc1 = max(ic0 // dst_tile_size, 0), min(
                (ic0 + w - 1) // dst_tile_size, n_tc - 1
            )
            for tr in range(tr0, tr1 + 1):
                for tc in range(tc0, tc1 + 1):
                    # overlap of source with dst tile, in dst pixel coords
                    dr0 = max(ir0, tr * dst_tile_size)
                    dr1 = min(ir0 + h, min((tr + 1) * dst_tile_size, height))
                    dc0 = max(ic0, tc * dst_tile_size)
                    dc1 = min(ic0 + w, min((tc + 1) * dst_tile_size, width))
                    if dr0 >= dr1 or dc0 >= dc1:
                        continue
                    piece = pixels[
                        :, dr0 - ir0 : dr1 - ir0, dc0 - ic0 : dc1 - ic0
                    ]
                    out["dst_tile"].append(tr * n_tc + tc)
                    out["src_index"].append(row["image_id"])
                    out["row_off"].append(dr0 - tr * dst_tile_size)
                    out["col_off"].append(dc0 - tc * dst_tile_size)
                    out["h"].append(dr1 - dr0)
                    out["w"].append(dc1 - dc0)
                    out["band_count"].append(piece.shape[0])
                    out["dtype"].append(row["dtype"])
                    builder.append(piece)
        return pa.Table.from_arrays(
            [
                pa.array(out["dst_tile"], pa.int64()),
                pa.array(out["src_index"], pa.string()),
                pa.array(out["row_off"], pa.int64()),
                pa.array(out["col_off"], pa.int64()),
                pa.array(out["h"], pa.int64()),
                pa.array(out["w"], pa.int64()),
                pa.array(out["band_count"], pa.int64()),
                pa.array(out["dtype"], pa.string()),
                builder.finish(),
            ],
            names=list(out) + ["pixels"],
        )

    def reduce_tile(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("src_index", kind="stable")
        tile_id = int(group["dst_tile"].iloc[0])
        tr, tc = tile_id // n_tc, tile_id % n_tc
        th = min(dst_tile_size, height - tr * dst_tile_size)
        tw = min(dst_tile_size, width - tc * dst_tile_size)
        bands = int(group["band_count"].iloc[0])
        dt = np.dtype(group["dtype"].iloc[0])
        acc = np.zeros((bands, th, tw), dtype=np.float64)
        accv = np.zeros((bands, th, tw), dtype=bool)
        # NaN sentinel means "no nodata" ONLY for integer dtypes; float
        # rasters use NaN itself as nodata (engine convention, schema.py)
        nod = (
            nodata
            if nodata == nodata
            else (None if dt.kind in "iu" else float("nan"))
        )
        from ..kernels.nodata import valid_mask

        for _, piece in group.iterrows():
            arr = np.frombuffer(
                piece["pixels"], dtype=np.dtype(piece["dtype"]).newbyteorder("<")
            ).reshape(piece["band_count"], piece["h"], piece["w"])
            r0, c0 = int(piece["row_off"]), int(piece["col_off"])
            sub = arr.astype(np.float64)
            subv = valid_mask(sub, nod)
            merge_kernel.combine(
                acc[:, r0 : r0 + arr.shape[1], c0 : c0 + arr.shape[2]],
                accv[:, r0 : r0 + arr.shape[1], c0 : c0 + arr.shape[2]],
                sub,
                subv,
                method,
            )
        if method == "count":
            out = np.where(accv, acc, 0.0)
            out = np.rint(out).astype(np.int64)
        elif dt.kind in "iu":
            fill = 0.0 if nod is None else float(nod)  # rasterio: 0 when unset
            out = np.where(accv, acc, fill)
            info = np.iinfo(dt)
            out = np.clip(np.rint(out), info.min, info.max).astype(dt)
        else:
            fill = np.nan if nod is None or nod != nod else float(nod)
            out = np.where(accv, acc, fill).astype(dt)
        tile_transform = aff.window_transform(
            transform, tc * dst_tile_size, tr * dst_tile_size
        )
        return pd.DataFrame(
            [
                {
                    "image_id": f"mosaic/{tr}/{tc}",
                    "band_count": bands,
                    "h": th,
                    "w": tw,
                    "dtype": out.dtype.name,
                    "nodata": nodata,
                    "crs": crs_str,
                    "transform": [float(v) for v in tile_transform],
                    "pixels": pixels_to_bytes(out),
                    "caption": "",
                    "phash": 0,
                }
            ]
        )

    placed = ds.map_batches(place, batch_format="pyarrow", zero_copy_batch=True)
    return (
        placed.groupby("dst_tile").map_groups(reduce_tile, batch_format="pandas"),
        (transform, width, height),
    )
