"""Clip stages: clip_box (bbox subsetting with cell pushdown) and clip
(polygon mask — the raster<->vector semi/anti-join, SURVEY.md §2.3/§2.6).

clip_box is stateless: tiles whose footprint misses the box are DROPPED
(a filter), intersecting tiles are sliced (Raster.clip_box semantics).  When
the dataset has a ``cell`` column the box is first pushed down to a cell
range so whole blocks prune cheaply before any pixel work.

clip (geometry) is an actor-pool stage: the geometry set is the broadcast
small side, indexed once per actor (BBoxIndex = STRtree stand-in) in
``__init__``; per tile the actor prunes candidates by bbox then applies the
exact ray-casting mask.  ``invert=True`` is the anti-join
(/root/reference/rioxarray/raster_array.py:810-813).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels import affine as aff
from ..kernels import cellindex
from ..kernels import crs as crs_mod
from ..kernels import geometry as geom_mod
from ..kernels.raster import Raster  # noqa: F401  (re-export for callers)
from ..sources.corpus import CELL_RES
from .schema import (
    BinaryBuilder,
    pixel_views,
    pixels_to_bytes,  # noqa: F401  (re-export for callers)
    raster_from_view,
    rebuild_table,
    row_to_raster,  # noqa: F401  (re-export for callers)
)


def footprint_bounds(row: dict):
    return aff.bounds(tuple(row["transform"]), row["w"], row["h"])


def clip_box_batch(batch: pa.Table, bounds, box_crs=None) -> pa.Table:
    """Slice every intersecting row to the box; drop the rest.

    ``box_crs=None`` means the bounds are in each ROW's native CRS (the
    rioxarray clip_box convention).  The box is reprojected once per
    distinct row CRS, and the cheap bbox rejection runs on metadata before
    any pixel buffer is touched.
    """
    bcrs = crs_mod.from_user_input(box_crs) if box_crs is not None else None
    bb_cache: dict[str, tuple] = {}

    def box_for(crs_str: str):
        bb = bb_cache.get(crs_str)
        if bb is None:
            if bcrs is not None and crs_str:
                rcrs = crs_mod.from_user_input(crs_str)
                bb = (
                    crs_mod.transform_bounds(bcrs, rcrs, *bounds)
                    if bcrs != rcrs
                    else tuple(bounds)
                )
            else:
                bb = tuple(bounds)
            bb_cache[crs_str] = bb
        return bb

    meta = batch.drop_columns(["pixels"]).to_pylist()
    keep_idx, hs, ws, out_t = [], [], [], []
    builder = BinaryBuilder()
    for i, pixels in enumerate(pixel_views(batch)):
        row = meta[i]
        bb = box_for(row["crs"])
        left, bottom, right, top = aff.bounds(
            tuple(row["transform"]), row["w"], row["h"]
        )
        if bb[0] >= right or bb[2] <= left or bb[1] >= top or bb[3] <= bottom:
            continue
        r = raster_from_view(pixels, row)
        # corpus-level semantics: rows wholly outside are FILTERED; rows that
        # intersect are sliced (window math of clip_box) and kept even when
        # all-nodata — the single-raster NoDataInBounds contract lives on
        # Raster.clip_box for accessor parity
        clipped = r.slice_xy(
            max(bb[0], left),
            max(bb[1], bottom),
            min(bb[2], right),
            min(bb[3], top),
        )
        if clipped.width < 1 or clipped.height < 1:
            continue
        keep_idx.append(i)
        hs.append(clipped.height)
        ws.append(clipped.width)
        out_t.append([float(v) for v in clipped.transform])
        builder.append(clipped.pixels)
    return rebuild_table(
        batch,
        {
            "h": pa.array(hs, pa.int32()),
            "w": pa.array(ws, pa.int32()),
            "transform": pa.array(out_t, batch.schema.field("transform").type),
        },
        builder,
        keep_idx=keep_idx,
    )


def clip_box_stage(ds, bounds, box_crs=None, cell_res: int = CELL_RES,
                   pushdown_ring: int = 1, **map_kwargs):
    """Cell pushdown (when a ``cell`` column exists) + per-row slice.

    The pushdown only engages when the box is EXPLICITLY geographic
    (``box_crs`` parses to EPSG:4326) — with ``box_crs=None`` the bounds
    are in each row's native CRS and cannot index the lon/lat cell grid.
    ``pushdown_ring`` must cover the worst-case distance (in cells) from a
    tile's centroid cell to the box: >= ceil(tile_half_extent/cell_size);
    1 suffices for 64-px tiles at RES=0.005 deg and cell_res=10.
    """
    schema_names = ds.schema().names
    pushdown_ok = False
    if box_crs is not None:
        try:
            pushdown_ok = crs_mod.from_user_input(box_crs).is_geographic
        except crs_mod.CRSError:
            pushdown_ok = False
    if "cell" in schema_names and pushdown_ok:
        wanted = set(
            int(c) for c in cellindex.cells_for_bbox(*_reorder(bounds), cell_res)
        )
        # expand so boundary tiles whose centroid fell outside survive
        expanded = set()
        for c in wanted:
            expanded.update(cellindex.ring(c, pushdown_ring))
        lst = pa.array(sorted(expanded), type=pa.int64())
        ds = ds.map_batches(
            lambda b: b.filter(pc.is_in(b["cell"], value_set=lst)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return ds.map_batches(
        lambda b: clip_box_batch(b, bounds, box_crs=box_crs), **kwargs
    )


def pad_box_stage(tiles_ds, bounds, box_crs=None, tile_size: int = 64,
                  cell_res: int = CELL_RES, constant_values=None):
    """Distributed pad (pad_box in TILE space, SURVEY.md §2.3 RD mapping):
    per image, emit synthetic all-nodata tiles on the image's EXTENDED tile
    grid (pixel phase preserved — tile indices may go negative) for every
    grid position needed to cover ``bounds`` that no existing tile covers,
    then union with the original tiles.

    The planning group ships METADATA only (one row per tile, no pixels);
    synthetic payloads are generated inside the group.  ``bounds`` is in
    each row's native CRS unless ``box_crs`` is given (clip_box convention).
    """
    from ..kernels import cellindex as cell_mod
    from .schema import TILE_SCHEMA, pixels_to_bytes

    bcrs = crs_mod.from_user_input(box_crs) if box_crs is not None else None
    meta_cols = [n for n in TILE_SCHEMA.names if n != "pixels"]
    meta = tiles_ds.select_columns(meta_cols)
    T = int(tile_size)

    def plan(group: pa.Table) -> pa.Table:
        first = group.slice(0, 1).to_pylist()[0]
        t0 = tuple(float(v) for v in first["transform"])
        # the row transform describes the (possibly halo-EXPANDED) window,
        # whose absolute origin is win_off - core_off; shifting by the raw
        # win_off alone would skew the recovered image origin by the halo
        # of whichever row happened to come first in the group
        img_t = aff.window_transform(
            t0,
            int(first["core_coff"]) - int(first["win_col_off"]),
            int(first["core_roff"]) - int(first["win_row_off"]),
        )
        crs_str = first["crs"]
        rcrs = crs_mod.from_user_input(crs_str) if crs_str else None
        bb = tuple(bounds)
        if bcrs is not None and rcrs is not None and bcrs != rcrs:
            bb = crs_mod.transform_bounds(bcrs, rcrs, *bb)
        c0f, r0f, wf, hf = aff.window_from_bounds(img_t, *bb)
        r_lo = int(np.floor(np.floor(r0f) / T))
        c_lo = int(np.floor(np.floor(c0f) / T))
        r_hi = int(np.ceil((r0f + hf) / T))  # exclusive tile index bound
        c_hi = int(np.ceil((c0f + wf) / T))
        existing = set(
            zip(group["tile_row"].to_pylist(), group["tile_col"].to_pylist())
        )
        dtype = np.dtype(first["dtype"])
        nod = float(first["nodata"])
        if constant_values is not None:
            fill = constant_values
        elif nod == nod:
            fill = nod
        elif dtype.kind in "iu":
            fill = 0
        else:
            fill = np.nan
        bands = int(first["band_count"])
        payload = pixels_to_bytes(
            np.full((bands, T, T), fill, dtype=dtype)
        )
        rows = []
        for r in range(r_lo, r_hi):
            for c in range(c_lo, c_hi):
                if (r, c) in existing:
                    continue
                tt = aff.window_transform(img_t, c * T, r * T)
                cx, cy = aff.apply(tt, T / 2.0, T / 2.0)
                if rcrs is not None and rcrs.is_projected:
                    lon, lat = (float(v) for v in rcrs.inverse(cx, cy))
                else:
                    lon, lat = float(cx), float(cy)
                rows.append(
                    {
                        "image_id": first["image_id"],
                        "band_count": bands,
                        "h": T,
                        "w": T,
                        "dtype": dtype.name,
                        "nodata": nod,
                        "crs": crs_str,
                        "transform": [float(v) for v in tt],
                        "pixels": payload,
                        "caption": first["caption"],
                        "phash": int(first["phash"]),
                        "tile_row": r,
                        "tile_col": c,
                        "cell": int(cell_mod.cell(lon, lat, cell_res)),
                        "win_row_off": r * T,
                        "win_col_off": c * T,
                        "core_roff": 0,
                        "core_coff": 0,
                        "core_h": T,
                        "core_w": T,
                    }
                )
        if not rows:
            return TILE_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=TILE_SCHEMA)

    synthetic = meta.groupby("image_id").map_groups(
        plan, batch_format="pyarrow"
    )
    return tiles_ds.union(synthetic)


def _reorder(bounds):
    minx, miny, maxx, maxy = bounds
    return min(minx, maxx), min(miny, maxy), max(minx, maxx), max(miny, maxy)


class ClipActor:
    """Polygon-clip worker holding the broadcast geometry index."""

    def __init__(
        self,
        geometries,
        geom_crs=None,
        invert: bool = False,
        drop_empty: bool = True,
        all_touched: bool = False,
    ):
        self.geoms = [geom_mod.parse_geometry(g) for g in geometries]
        self.geom_crs = (
            crs_mod.from_user_input(geom_crs) if geom_crs is not None else None
        )
        self.invert = invert
        self.drop_empty = drop_empty
        self.all_touched = all_touched
        self.index = geom_mod.BBoxIndex(self.geoms)
        self._proj_cache: dict[str, tuple] = {}

    def _geoms_for_crs(self, crs_string: str):
        """Geometries + index projected into a raster CRS (cached per actor)."""
        hit = self._proj_cache.get(crs_string)
        if hit is None:
            rcrs = crs_mod.from_user_input(crs_string)
            if self.geom_crs is None or self.geom_crs == rcrs:
                hit = (self.geoms, self.index)
            else:
                from ..kernels.raster import _reproject_geom

                projected = [
                    _reproject_geom(g, self.geom_crs, rcrs) for g in self.geoms
                ]
                hit = (projected, geom_mod.BBoxIndex(projected))
            self._proj_cache[crs_string] = hit
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        meta = batch.drop_columns(["pixels"]).to_pylist()
        keep_idx: list[int] = []
        builder = BinaryBuilder()
        for i, pixels in enumerate(pixel_views(batch)):
            row = meta[i]
            geoms, index = self._geoms_for_crs(row["crs"])
            r = raster_from_view(pixels, row)
            cand = index.query(*r.bounds())
            if len(cand) == 0:
                if self.invert:
                    # anti-join: a tile touching NO geometry keeps ALL its
                    # pixels — always emit it (drop_empty only drops tiles
                    # whose surviving mask is empty)
                    keep_idx.append(i)
                    builder.append(pixels)
                continue
            keep = geom_mod.geometry_mask(
                [geoms[j] for j in cand],
                out_shape=r.shape,
                transform=r.transform,
                all_touched=self.all_touched,
                invert=not self.invert,
            )
            if not keep.any() and self.drop_empty:
                continue
            fill = r.nodata if r.nodata is not None else 0
            out = np.where(
                keep[None], r.pixels, np.array(fill).astype(r.pixels.dtype)
            )
            keep_idx.append(i)
            builder.append(out.astype(r.pixels.dtype))
        return rebuild_table(batch, {}, builder, keep_idx=keep_idx)


def clip_stage(
    ds,
    geometries,
    geom_crs=None,
    invert: bool = False,
    drop_empty: bool = True,
    all_touched: bool = False,
    concurrency=(1, 4),
    **map_kwargs,
):
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return ds.map_batches(
        ClipActor,
        fn_constructor_kwargs=dict(
            geometries=geometries,
            geom_crs=geom_crs,
            invert=invert,
            drop_empty=drop_empty,
            all_touched=all_touched,
        ),
        concurrency=concurrency,
        **kwargs,
    )


class RasterizeActor:
    """Vector->raster burn worker holding the broadcast (geometry, value)
    table + bbox index (same broadcast shape as ClipActor: parse/index
    once per actor in __init__, paint per batch in __call__)."""

    def __init__(self, geometries, values, geom_crs=None, fill: int = 0,
                 all_touched: bool = False, merge: str = "replace"):
        if len(values) != len(geometries):
            raise ValueError("need one burn value per geometry")
        self.geoms = [geom_mod.parse_geometry(g) for g in geometries]
        self.values = [int(v) for v in values]
        self.geom_crs = (
            crs_mod.from_user_input(geom_crs) if geom_crs is not None else None
        )
        self.fill = int(fill)
        self.all_touched = all_touched
        self.merge = merge
        self.index = geom_mod.BBoxIndex(self.geoms)
        self._proj_cache: dict[str, tuple] = {}

    _geoms_for_crs = ClipActor._geoms_for_crs

    def __call__(self, batch: pa.Table) -> pa.Table:
        meta = batch.drop_columns(["pixels"]).to_pylist()
        n = len(meta)
        builder = BinaryBuilder(
            reserve=4 * sum(r["h"] * r["w"] for r in meta)
        )
        for i, pixels in enumerate(pixel_views(batch)):
            row = meta[i]
            geoms, index = self._geoms_for_crs(row["crs"])
            r = raster_from_view(pixels, row)
            shape = (int(row["h"]), int(row["w"]))
            cand = index.query(*r.bounds())
            # paint order = geometry INPUT order (rasterio contract:
            # later shapes win under merge="replace")
            cand = np.sort(cand)
            burned = geom_mod.rasterize_values(
                [(geoms[j], self.values[j]) for j in cand],
                out_shape=shape,
                transform=r.transform,
                fill=self.fill,
                all_touched=self.all_touched,
                merge=self.merge,
            )
            builder.append(burned)
        return rebuild_table(
            batch,
            {
                "band_count": pa.array([1] * n, pa.int32()),
                "dtype": pa.array(["int32"] * n, pa.string()),
                "nodata": pa.array([float(self.fill)] * n, pa.float64()),
            },
            builder,
        )


def rasterize_stage(ds, geometries, values, geom_crs=None, fill: int = 0,
                    all_touched: bool = False, merge: str = "replace",
                    concurrency=(1, 4), **map_kwargs):
    """Burn a vector (geometry, value) table into every tile's grid —
    the rasterio.features.rasterize recipe recast as a broadcast
    actor-pool map_batches (zero shuffle; the vector side rides the
    actor, tiles stream through).  Output tiles are single-band int32
    with ``nodata=fill``.

    100-TB note: the vector side is assumed broadcastable (same contract
    as clip/PIP-broadcast).  A non-broadcastable vector side composes
    with the salted-cell co-shuffle plan of stages/join.pip_join_shuffle
    instead — partition geometries by cell, burn per (cell, tile) group.
    """
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return ds.map_batches(
        RasterizeActor,
        fn_constructor_kwargs=dict(
            geometries=geometries, values=values, geom_crs=geom_crs,
            fill=fill, all_touched=all_touched, merge=merge,
        ),
        concurrency=concurrency,
        **kwargs,
    )


IDW_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("win_row_off", pa.int32()),
        ("win_col_off", pa.int32()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("idw_num", pa.list_(pa.int64())),
        ("idw_den", pa.list_(pa.int64())),
        ("n_pts", pa.list_(pa.int32())),
    ]
)


class IdwActor:
    """Inverse-distance-weighted gridding of scattered points onto every
    tile's pixel grid — gdal_grid's ``invdist`` algorithm (power=2,
    hard search radius) in a pixel-snapped INTEGER-EXACT variant:

    each point maps to its containing pixel index (floor rule — corpus
    points sit on pixel centers so this is lossless there); for every
    grid pixel within ``radius_px`` (euclidean, in pixels) of a point,

        idw_num += (v * scale) // d2        (d2 = squared pixel distance)
        idw_den += scale // d2
        (d2 == 0: num += v * scale, den += scale — the exact-hit rule)

    Consumers read the estimate as idw_num / idw_den (gdal_grid's
    sum(w·v)/sum(w) with the floored integer weights); ``n_pts`` = 0
    marks pixels outside every search radius (gdal_grid nodata).

    Points are broadcast once per actor (the gdal_grid scatter set is
    small by contract — same broadcast rule as rasterize); tiles stream,
    zero shuffle.  Points OUTSIDE an image still influence its edge
    pixels when within radius — the per-tile search window is expanded
    by ``radius_px``, so tiling never changes the result.
    """

    def __init__(self, points, values, radius_px: int = 12,
                 scale: int = 1000000):
        self.pts = [
            (g["coordinates"][0], g["coordinates"][1])
            if g.get("type") == "Point"
            else (_ for _ in ()).throw(
                ValueError("IdwActor needs Point geometries")
            )
            for g in points
        ]
        self.vals = [int(v) for v in values]
        if len(self.pts) != len(self.vals):
            raise ValueError("points and values must align")
        self.r = int(radius_px)
        self.r2 = self.r * self.r
        self.scale = int(scale)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {n: [] for n in IDW_SCHEMA.names}
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row in meta:
            t = row["transform"]
            xres, yres = t[0], t[4]
            left, top = t[2], t[5]
            h, w = row["h"], row["w"]
            num = np.zeros((h, w), np.int64)
            den = np.zeros((h, w), np.int64)
            npts = np.zeros((h, w), np.int32)
            rr = np.arange(h, dtype=np.int64)[:, None]
            cc = np.arange(w, dtype=np.int64)[None, :]
            for (x, y), v in zip(self.pts, self.vals):
                pc_ = int(np.floor((x - left) / xres))
                pr_ = int(np.floor((y - top) / yres))  # yres < 0
                if not (-self.r <= pr_ < h + self.r
                        and -self.r <= pc_ < w + self.r):
                    continue
                d2 = (rr - pr_) ** 2 + (cc - pc_) ** 2
                m = d2 <= self.r2
                hit = m & (d2 == 0)
                far = m & (d2 > 0)
                num[far] += (v * self.scale) // d2[far]
                den[far] += self.scale // d2[far]
                num[hit] += v * self.scale
                den[hit] += self.scale
                npts[m] += 1
            out["image_id"].append(row["image_id"])
            out["tile_row"].append(row["tile_row"])
            out["tile_col"].append(row["tile_col"])
            out["win_row_off"].append(row["win_row_off"])
            out["win_col_off"].append(row["win_col_off"])
            out["h"].append(h)
            out["w"].append(w)
            out["idw_num"].append(num.ravel())
            out["idw_den"].append(den.ravel())
            out["n_pts"].append(npts.ravel())
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in IDW_SCHEMA],
            schema=IDW_SCHEMA,
        )


def idw_stage(ds, points, values, radius_px: int = 12,
              scale: int = 1000000, concurrency=(1, 4), **map_kwargs):
    """gdal_grid invdist onto every tile's grid (see IdwActor)."""
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return ds.map_batches(
        IdwActor,
        fn_constructor_kwargs=dict(points=points, values=values,
                                   radius_px=radius_px, scale=scale),
        concurrency=concurrency,
        **kwargs,
    )
