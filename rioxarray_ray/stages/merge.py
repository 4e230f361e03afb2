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
import pyarrow as pa

from ..kernels import affine as aff
from ..kernels import merge as merge_kernel
from ..sources.corpus import CELL_RES
from .schema import RASTER_SCHEMA, pixels_to_bytes  # noqa: F401 (schema re-export)


_PLAN_META_COLS = ("image_id", "transform", "crs", "nodata", "dtype")


def plan_union_grid(ds, resolution=None):
    """Driver-side plan: (transform, width, height, crs, nodata, dtype).

    ONE streaming pass over a metadata-only projection — the pixel column
    never leaves the map task and nothing is pinned in the object store
    (round-2 verdict item #1: the old implementation materialized the full
    pixel dataset to compute these 6 numbers).  Per-row footprint bounds
    (4 doubles) fold through min/max aggregates; the grid attributes of the
    lexicographically-first source ride along in an argmin aggregate — the
    reference's "first input wins the defaults" rule
    (/root/reference/rioxarray/merge.py:145-148) without a sort."""
    from ray.data.aggregate import AggregateFn, Max, Min

    def footprints(batch: pa.Table) -> pa.Table:
        tr = np.asarray(
            batch["transform"].to_pylist(), dtype=np.float64
        ).reshape(-1, 6)
        w = batch["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["h"].to_numpy(zero_copy_only=False).astype(np.float64)
        a, b, c, d, e, f = (tr[:, i] for i in range(6))
        # envelope of the 4 corner pixels: the col/row terms are independent,
        # so min/max over corners = c + min(0, a*w) + min(0, b*h) etc.
        # (vectorized form of kernels.affine.bounds — rotation-safe)
        xw, xh = a * w, b * h
        yw, yh = d * w, e * h
        cols = {name: batch[name] for name in _PLAN_META_COLS}
        cols["left"] = pa.array(c + np.minimum(xw, 0) + np.minimum(xh, 0))
        cols["bottom"] = pa.array(f + np.minimum(yw, 0) + np.minimum(yh, 0))
        cols["right"] = pa.array(c + np.maximum(xw, 0) + np.maximum(xh, 0))
        cols["top"] = pa.array(f + np.maximum(yw, 0) + np.maximum(yh, 0))
        return pa.Table.from_pydict(cols)

    def _first_acc(acc, block):
        import pyarrow.compute as pc

        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        if block.num_rows == 0:
            return acc
        i = pc.index(block["image_id"], pc.min(block["image_id"])).as_py()
        row = {name: block[name][i].as_py() for name in _PLAN_META_COLS}
        if acc is None or row["image_id"] < acc["image_id"]:
            return row
        return acc

    def _first_merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return b if b["image_id"] < a["image_id"] else a

    first_agg = AggregateFn(
        init=lambda k: None,
        merge=_first_merge,
        accumulate_block=_first_acc,
        name="first_src",
    )
    stats = ds.map_batches(
        footprints, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(
        Min("left"), Min("bottom"), Max("right"), Max("top"), first_agg
    )
    first = stats["first_src"]
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


def merge_stage(
    ds,
    method: str = "first",
    resolution=None,
    dst_tile_size: int = 256,
    grid=None,
    **map_kwargs,
):
    """Mosaic all rows of ``ds`` (same CRS) into dst tiles. Returns a Dataset
    of raster rows, one per non-empty dst tile, image_id = ``mosaic/r/c``.

    Streams: two passes over the input, NEITHER pinning pixels — the plan
    pass folds metadata-only aggregates (plan_union_grid), and place/reduce
    is the only pass that moves pixel payloads.  An unmaterialized upstream
    re-executes once for the plan (cheap, column-pruned); callers that
    already know the destination grid skip it entirely by passing
    ``grid=(transform, width, height, crs, nodata, dtype)`` — the
    single-pass mosaic."""
    if grid is None:
        grid = plan_union_grid(ds, resolution=resolution)
    transform, width, height, crs_str, nodata, dtype = grid
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

    def reduce_tile(group: pa.Table) -> pa.Table:
        # columnar: piece payloads stay zero-copy Arrow buffer views —
        # no pandas objects, no per-row python bytes in the shuffle reduce
        import pyarrow.compute as pc

        from .schema import binary_views

        group = group.take(pc.sort_indices(group["src_index"]))
        tile_id = int(group["dst_tile"][0].as_py())
        tr, tc = tile_id // n_tc, tile_id % n_tc
        th = min(dst_tile_size, height - tr * dst_tile_size)
        tw = min(dst_tile_size, width - tc * dst_tile_size)
        bands = int(group["band_count"][0].as_py())
        dt = np.dtype(group["dtype"][0].as_py())
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

        row_offs = group["row_off"].to_numpy(zero_copy_only=False)
        col_offs = group["col_off"].to_numpy(zero_copy_only=False)
        p_bands = group["band_count"].to_numpy(zero_copy_only=False)
        p_hs = group["h"].to_numpy(zero_copy_only=False)
        p_ws = group["w"].to_numpy(zero_copy_only=False)
        p_dts = group["dtype"].to_pylist()
        for i, view in enumerate(binary_views(group, "pixels")):
            arr = (
                view.view(np.dtype(p_dts[i]).newbyteorder("<"))
                .reshape(int(p_bands[i]), int(p_hs[i]), int(p_ws[i]))
            )
            r0, c0 = int(row_offs[i]), int(col_offs[i])
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
        return pa.Table.from_pylist(
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
            ],
            schema=RASTER_SCHEMA,
        )

    placed = ds.map_batches(place, batch_format="pyarrow", zero_copy_batch=True)
    return (
        placed.groupby("dst_tile").map_groups(reduce_tile, batch_format="pyarrow"),
        (transform, width, height),
    )


def _grid_split_fn(origin, res: float, comp_px: int):
    """map_batches fn: split tiles on a shared global grid into
    composite-tile-aligned sub-blocks (float64 values, NaN = invalid),
    keyed (ctx, cty, band) and carrying the source image_id.  Shared by
    composite_median and change_crosstab — one split, two reducers."""
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    ox, oy = float(origin[0]), float(origin[1])
    res = float(res)

    def split(batch: pa.Table) -> pa.Table:
        out = []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            t = tuple(row["transform"])
            if abs(t[1]) > 1e-12 or abs(t[3]) > 1e-12:
                raise ValueError("grid split requires axis-aligned tiles")
            if abs(t[0] - res) > 1e-9 or abs(-t[4] - res) > 1e-9:
                raise ValueError(
                    f"tile resolution ({t[0]}, {t[4]}) is off the composite "
                    f"grid res {res}"
                )
            gxf = (t[2] - ox) / res
            gyf = (oy - t[5]) / res
            gx, gy = round(gxf), round(gyf)
            if abs(gxf - gx) > 1e-6 or abs(gyf - gy) > 1e-6:
                raise ValueError(
                    f"tile origin {t[2]},{t[5]} is not on the composite grid"
                )
            nod = row["nodata"]
            if nod != nod:
                nod = (
                    None
                    if np.dtype(row["dtype"]).kind in "iu"
                    else float("nan")
                )
            vm = valid_mask(pixels, nod)
            vals = np.where(vm, pixels.astype(np.float64), np.nan)
            h, w = int(row["h"]), int(row["w"])
            y_cuts = range(gy // comp_px, (gy + h - 1) // comp_px + 1)
            x_cuts = range(gx // comp_px, (gx + w - 1) // comp_px + 1)
            for cty in y_cuts:
                ty0 = max(gy, cty * comp_px)
                ty1 = min(gy + h, (cty + 1) * comp_px)
                for ctx in x_cuts:
                    tx0 = max(gx, ctx * comp_px)
                    tx1 = min(gx + w, (ctx + 1) * comp_px)
                    sub = vals[:, ty0 - gy : ty1 - gy, tx0 - gx : tx1 - gx]
                    for b in range(sub.shape[0]):
                        if np.isnan(sub[b]).all():
                            continue
                        out.append(
                            {
                                "image_id": row["image_id"],
                                "ctx": int(ctx),
                                "cty": int(cty),
                                "band": int(b),
                                "x0": int(tx0 - ctx * comp_px),
                                "y0": int(ty0 - cty * comp_px),
                                "bw": int(tx1 - tx0),
                                "bh": int(ty1 - ty0),
                                "vals": sub[b].ravel(),
                            }
                        )
        return pa.Table.from_pydict(
            {
                "image_id": pa.array(
                    [r["image_id"] for r in out], pa.string()
                ),
                "ctx": pa.array([r["ctx"] for r in out], pa.int64()),
                "cty": pa.array([r["cty"] for r in out], pa.int64()),
                "band": pa.array([r["band"] for r in out], pa.int32()),
                "x0": pa.array([r["x0"] for r in out], pa.int32()),
                "y0": pa.array([r["y0"] for r in out], pa.int32()),
                "bw": pa.array([r["bw"] for r in out], pa.int32()),
                "bh": pa.array([r["bh"] for r in out], pa.int32()),
                "vals": pa.array(
                    [r["vals"] for r in out], pa.list_(pa.float64())
                ),
            }
        )

    return split


def composite_median(
    tiles_ds,
    origin: tuple[float, float],
    res: float,
    comp_px: int = 64,
    **map_kwargs,
):
    """Per-pixel MEDIAN composite across overlapping rasters on a shared
    grid — the reference recipe ``xarray.concat([...], dim="time")
    .median(dim="time")`` over rioxarray-opened scenes (the classic
    cloud-free composite; the reference's own merge stops at
    first/last/min/max/sum/count — /root/reference/rioxarray/merge.py:96,125-127
    passes `method` straight to rasterio's pairwise copyto fold, and median is NOT pairwise-
    foldable, so it needs this gather-per-pixel plan instead).

    Partitioning assumption (documented per SURVEY.md §2 custom-operator
    rule): every input tile sits on ONE global grid — axis-aligned
    ``res``-sized pixels anchored at ``origin=(x0, y0_top)``; offsets are
    validated to be integral and misaligned tiles raise.

    100-TB shape: each input tile is SPLIT (map_batches, stateless tasks)
    into composite-grid-aligned sub-blocks keyed by composite tile, then
    ONE ``groupby(ctx, cty, band)`` gathers co-located sub-blocks and
    takes the per-pixel nanmedian.  Shuffle volume = the input moved
    exactly once; reducer memory = overlap_factor x one composite tile
    (the number of scenes covering a spot, small in practice), NOT the
    dataset; skew is bounded by the same factor.  Pixels ride the shuffle
    as float64-with-NaN lists, so validity needs no side channel.

    Returns one row per (composite tile, band) with any valid pixel:
    ``(ctx, cty, band, w, h, pixels: list<double> row-major, NaN where no
    input had a valid value, n_values: total contributing valid pixels)``.
    """
    split = _grid_split_fn(origin, res, comp_px)

    def reduce(group: pa.Table) -> pa.Table:
        n = group.num_rows
        acc = np.full((n, comp_px, comp_px), np.nan, dtype=np.float64)
        x0 = group["x0"].to_numpy(zero_copy_only=False)
        y0 = group["y0"].to_numpy(zero_copy_only=False)
        bw = group["bw"].to_numpy(zero_copy_only=False)
        bh = group["bh"].to_numpy(zero_copy_only=False)
        flat = group["vals"].combine_chunks()
        for i in range(n):
            block = np.asarray(flat[i].values).reshape(int(bh[i]), int(bw[i]))
            acc[i, y0[i] : y0[i] + bh[i], x0[i] : x0[i] + bw[i]] = block
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN cols
            med = np.nanmedian(acc, axis=0)
        n_values = int(np.sum(~np.isnan(acc)))
        return pa.Table.from_pydict(
            {
                "ctx": pa.array([int(group["ctx"][0].as_py())], pa.int64()),
                "cty": pa.array([int(group["cty"][0].as_py())], pa.int64()),
                "band": pa.array([int(group["band"][0].as_py())], pa.int32()),
                "w": pa.array([comp_px], pa.int32()),
                "h": pa.array([comp_px], pa.int32()),
                "pixels": pa.array([med.ravel()], pa.list_(pa.float64())),
                "n_values": pa.array([n_values], pa.int64()),
            }
        )

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    blocks = tiles_ds.map_batches(split, **kwargs)
    return blocks.groupby(["ctx", "cty", "band"]).map_groups(
        reduce, batch_format="pyarrow"
    )


def change_crosstab(
    tiles_ds,
    origin: tuple[float, float],
    res: float,
    comp_px: int = 64,
    bucket: float = 256.0,
    **map_kwargs,
):
    """Cross-scene change-detection contingency table: for every pair of
    scenes that overlap on the shared grid, count co-located valid pixels
    by (class_a, class_b) where class = floor(value / bucket) — the
    rioxarray change-detection recipe: open two scenes, align with
    ``reproject_match`` (/root/reference/docs/examples/reproject_match.ipynb
    — the documented way to put two rasters on one grid), then crosstab
    the classified pair (numpy histogram2d over the aligned arrays).

    Same split as :func:`composite_median` (one shared-grid shuffle);
    each (composite tile, band) group pastes its scenes onto per-image
    canvases and crosstabs every scene pair where both are valid —
    overlap_factor^2 pair work on ONE 64x64 tile per group, then a tiny
    ``groupby`` folds partial counts.  Nothing image-sized shuffles twice.

    Returns (image_a, image_b, band, class_a, class_b, n) with
    image_a < image_b (lexicographic = corpus id order).
    """
    split = _grid_split_fn(origin, res, comp_px)

    def crosstab(group: pa.Table) -> pa.Table:
        ids = group["image_id"].to_pylist()
        x0 = group["x0"].to_numpy(zero_copy_only=False)
        y0 = group["y0"].to_numpy(zero_copy_only=False)
        bw = group["bw"].to_numpy(zero_copy_only=False)
        bh = group["bh"].to_numpy(zero_copy_only=False)
        flat = group["vals"].combine_chunks()
        canvases: dict[str, np.ndarray] = {}
        for i in range(group.num_rows):
            cv = canvases.get(ids[i])
            if cv is None:
                cv = np.full((comp_px, comp_px), np.nan)
                canvases[ids[i]] = cv
            block = np.asarray(flat[i].values).reshape(int(bh[i]), int(bw[i]))
            cv[y0[i] : y0[i] + bh[i], x0[i] : x0[i] + bw[i]] = block
        band = int(group["band"][0].as_py())
        out = {"image_a": [], "image_b": [], "band": [], "class_a": [],
               "class_b": [], "n": []}
        names = sorted(canvases)
        for ia in range(len(names)):
            for ib in range(ia + 1, len(names)):
                a, b = canvases[names[ia]], canvases[names[ib]]
                both = ~np.isnan(a) & ~np.isnan(b)
                if not both.any():
                    continue
                ca = np.floor(a[both] / bucket).astype(np.int64)
                cb = np.floor(b[both] / bucket).astype(np.int64)
                # pack pair-class codes, count in one pass
                key = (ca - ca.min()) * (cb.max() - cb.min() + 1) + (
                    cb - cb.min()
                )
                uniq, cnt = np.unique(key, return_counts=True)
                span = cb.max() - cb.min() + 1
                for k, c in zip(uniq, cnt):
                    out["image_a"].append(names[ia])
                    out["image_b"].append(names[ib])
                    out["band"].append(band)
                    out["class_a"].append(int(k // span + ca.min()))
                    out["class_b"].append(int(k % span + cb.min()))
                    out["n"].append(int(c))
        return pa.Table.from_pydict(
            {
                "image_a": pa.array(out["image_a"], pa.string()),
                "image_b": pa.array(out["image_b"], pa.string()),
                "band": pa.array(out["band"], pa.int32()),
                "class_a": pa.array(out["class_a"], pa.int64()),
                "class_b": pa.array(out["class_b"], pa.int64()),
                "n": pa.array(out["n"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    blocks = tiles_ds.map_batches(split, **kwargs)
    partial = blocks.groupby(["ctx", "cty", "band"]).map_groups(
        crosstab, batch_format="pyarrow"
    )
    return partial.groupby(
        ["image_a", "image_b", "band", "class_a", "class_b"]
    ).aggregate(Sum("n", alias_name="n"))


def temporal_trend(
    tiles_ds,
    origin: tuple[float, float],
    res: float,
    comp_px: int = 64,
    time_of=None,
    **map_kwargs,
):
    """Per-pixel TEMPORAL TREND (least-squares slope over time) across
    overlapping scenes on a shared grid — the NDVI-trend / land-change
    recipe: ``xarray.concat([...], dim="time").polyfit(dim="time",
    deg=1)`` over rioxarray-opened scenes aligned with
    ``reproject_match`` (the reference's documented multi-scene
    alignment path; polyfit itself is xarray's).

    Integer-exact formulation (what makes the SQL gate possible): with
    integer pixel values y and integer times t, the OLS slope is the
    rational  num / den  where per pixel over its n contributing scenes

        num = n * sum(t*y) - sum(t) * sum(y)
        den = n * sum(t^2) - sum(t)^2

    — both int64-exact, computed vectorized per composite tile.  Pixels
    with n < 2 scenes or den == 0 (all scenes at one time) are invalid.

    Same split/shuffle plan as :func:`composite_median` (input moves
    exactly once; reducer memory = overlap_factor x one tile).
    ``time_of(image_id) -> int`` supplies scene times (default: the
    digits in the corpus image id).

    Returns one row per (ctx, cty, band): ``num``/``den`` int64 payloads,
    ``n_scenes`` int32 payload, and ``slope`` float64 (NaN invalid).
    """
    split = _grid_split_fn(origin, res, comp_px)
    if time_of is None:
        def time_of(image_id: str) -> int:
            return int("".join(ch for ch in image_id if ch.isdigit()))

    def reduce(group: pa.Table) -> pa.Table:
        n_rows = group.num_rows
        acc = np.full((n_rows, comp_px, comp_px), np.nan, dtype=np.float64)
        x0 = group["x0"].to_numpy(zero_copy_only=False)
        y0 = group["y0"].to_numpy(zero_copy_only=False)
        bw = group["bw"].to_numpy(zero_copy_only=False)
        bh = group["bh"].to_numpy(zero_copy_only=False)
        flat = group["vals"].combine_chunks()
        for i in range(n_rows):
            block = np.asarray(flat[i].values).reshape(int(bh[i]), int(bw[i]))
            acc[i, y0[i] : y0[i] + bh[i], x0[i] : x0[i] + bw[i]] = block
        t = np.asarray(
            [time_of(s) for s in group["image_id"].to_pylist()],
            dtype=np.int64,
        )[:, None, None]
        valid = ~np.isnan(acc)
        y = np.where(valid, acc, 0.0).astype(np.int64)
        n = valid.sum(axis=0).astype(np.int64)
        st = (t * valid).sum(axis=0)
        st2 = (t * t * valid).sum(axis=0)
        sy = y.sum(axis=0)
        sty = (t * y).sum(axis=0)
        num = n * sty - st * sy
        den = n * st2 - st * st
        ok = (n >= 2) & (den != 0)
        with np.errstate(invalid="ignore", divide="ignore"):
            slope = np.where(ok, num / np.where(den == 0, 1, den), np.nan)
        num = np.where(ok, num, 0)
        den = np.where(ok, den, 0)
        return pa.Table.from_pydict(
            {
                "ctx": pa.array([int(group["ctx"][0].as_py())], pa.int64()),
                "cty": pa.array([int(group["cty"][0].as_py())], pa.int64()),
                "band": pa.array([int(group["band"][0].as_py())], pa.int32()),
                "w": pa.array([comp_px], pa.int32()),
                "h": pa.array([comp_px], pa.int32()),
                "num": pa.array([num.ravel()], pa.list_(pa.int64())),
                "den": pa.array([den.ravel()], pa.list_(pa.int64())),
                "n_scenes": pa.array(
                    [n.ravel().astype(np.int32)], pa.list_(pa.int32())
                ),
                "slope": pa.array([slope.ravel()], pa.list_(pa.float64())),
            }
        )

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    blocks = tiles_ds.map_batches(split, **kwargs)
    return blocks.groupby(["ctx", "cty", "band"]).map_groups(
        reduce, batch_format="pyarrow"
    )


def composite_to_rasters(comp_ds, origin: tuple[float, float], res: float,
                         crs: str = "EPSG:4326", **map_kwargs):
    """Lift :func:`composite_median` rows into RASTER_SCHEMA rows so the
    composite chains back into the rest of the engine (reproject, clip,
    write_parquet / open_parquet, merge) like any other raster: one
    single-band float64 raster per (composite tile, band), georeferenced
    from the composite grid, nodata = NaN where no scene was valid."""
    from .schema import RASTER_SCHEMA, pixels_to_bytes

    ox, oy = float(origin[0]), float(origin[1])
    res = float(res)

    def lift(batch: pa.Table) -> pa.Table:
        rows = []
        flat = batch["pixels"].combine_chunks()
        ctxs = batch["ctx"].to_numpy(zero_copy_only=False)
        ctys = batch["cty"].to_numpy(zero_copy_only=False)
        bands = batch["band"].to_numpy(zero_copy_only=False)
        ws = batch["w"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        for i in range(batch.num_rows):
            h, w = int(hs[i]), int(ws[i])
            px = np.asarray(flat[i].values, dtype=np.float64).reshape(1, h, w)
            ctx, cty, b = int(ctxs[i]), int(ctys[i]), int(bands[i])
            rows.append(
                {
                    "image_id": f"composite/{ctx}/{cty}/b{b}",
                    "band_count": 1,
                    "h": h,
                    "w": w,
                    "dtype": "float64",
                    "nodata": float("nan"),
                    "crs": crs,
                    "transform": [res, 0.0, ox + ctx * w * res,
                                  0.0, -res, oy - cty * h * res],
                    "pixels": pixels_to_bytes(px),
                    "caption": "",
                    "phash": 0,
                }
            )
        return pa.Table.from_pylist(rows, schema=RASTER_SCHEMA)

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return comp_ds.map_batches(lift, **kwargs)


def composite_argmax(
    tiles_ds,
    origin: tuple[float, float],
    res: float,
    comp_px: int = 64,
    **map_kwargs,
):
    """Best-pixel (argmax) compositing: per global pixel take the MAX
    valid value across overlapping scenes and record WHICH scene won —
    the max-NDVI / quality-band compositing recipe (MODIS-style "best
    observation" mosaics; the reference's merge stops at the pairwise
    max fold, which loses the winner identity).  Ties go to the
    lexicographically smallest image_id (deterministic).

    Same split/shuffle plan as :func:`composite_median` (the input moves
    exactly once; reducer memory = overlap_factor x one composite tile).

    Returns one row per (composite tile, band):
    ``(ctx, cty, band, w, h, pixels: list<double> max values (NaN where
    no valid input), winner: list<int64> index into ``images`` (-1 where
    undefined), images: list<string> the group's sorted scene ids,
    n_values: total contributing valid pixels)``.
    """
    split = _grid_split_fn(origin, res, comp_px)

    def reduce(group: pa.Table) -> pa.Table:
        n = group.num_rows
        ids = group["image_id"].to_pylist()
        order = sorted(range(n), key=lambda i: ids[i])
        images = sorted(set(ids))
        img_idx = {iid: j for j, iid in enumerate(images)}
        acc = np.full((n, comp_px, comp_px), np.nan, dtype=np.float64)
        layer_img = np.empty(n, np.int64)
        x0 = group["x0"].to_numpy(zero_copy_only=False)
        y0 = group["y0"].to_numpy(zero_copy_only=False)
        bw = group["bw"].to_numpy(zero_copy_only=False)
        bh = group["bh"].to_numpy(zero_copy_only=False)
        flat = group["vals"].combine_chunks()
        for k, i in enumerate(order):
            block = np.asarray(flat[i].values).reshape(int(bh[i]),
                                                       int(bw[i]))
            acc[k, y0[i] : y0[i] + bh[i], x0[i] : x0[i] + bw[i]] = block
            layer_img[k] = img_idx[ids[i]]
        valid = ~np.isnan(acc)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            vmax = np.nanmax(acc, axis=0)
        any_valid = valid.any(axis=0)
        # first (smallest-image_id, then paste order) layer achieving the
        # max — layers are id-sorted, so argmax's first match = min id
        is_max = valid & (acc == vmax[None, :, :])
        first = is_max.argmax(axis=0)
        winner = np.where(any_valid, layer_img[first], -1)
        return pa.Table.from_pydict(
            {
                "ctx": pa.array([int(group["ctx"][0].as_py())], pa.int64()),
                "cty": pa.array([int(group["cty"][0].as_py())], pa.int64()),
                "band": pa.array([int(group["band"][0].as_py())],
                                 pa.int32()),
                "w": pa.array([comp_px], pa.int32()),
                "h": pa.array([comp_px], pa.int32()),
                "pixels": pa.array([vmax.ravel()], pa.list_(pa.float64())),
                "winner": pa.array([winner.ravel().astype(np.int64)],
                                   pa.list_(pa.int64())),
                "images": pa.array([images], pa.list_(pa.string())),
                "n_values": pa.array([int(valid.sum())], pa.int64()),
            }
        )

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    blocks = tiles_ds.map_batches(split, **kwargs)
    return blocks.groupby(["ctx", "cty", "band"]).map_groups(
        reduce, batch_format="pyarrow"
    )
