"""User-facing engine API: the ``.rio`` accessor analogue (SURVEY.md §2.10).

The reference attaches a ``.rio`` namespace to xarray objects
(/root/reference/rioxarray/raster_array.py:54-56); this engine wraps a
``ray.data.Dataset`` of raster/tile rows in :class:`RasterDataset`, exposing
the same operator surface as chainable methods.  Every method is lazy —
it composes Ray Data stages and returns a new wrapper; nothing executes
until a consuming call (``count`` / ``take`` / ``write_parquet`` / ...).

    import rioxarray_ray as rxr
    rds = rxr.api.open_corpus(n_images=500)           # read + decode
    out = (rds.tile(64)
              .clip_box(-59.7, 36.1, -57.2, 39.5)
              .reproject("EPSG:3857", resampling="bilinear")
              .write_parquet("/tmp/out"))
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .kernels import affine as aff
from .kernels import crs as crs_mod
from .kernels import interpolate as interp_mod
from .sources.corpus import CELL_RES
from .stages import clip as clip_stage_mod
from .stages import decode as decode_stage_mod
from .stages import join as join_mod
from .stages import merge as merge_stage_mod
from .stages import tile as tile_stage_mod
from .stages import warp as warp_stage_mod
from .stages.schema import (
    BinaryBuilder,
    pixel_views,
    pixels_from_row,
    pixels_to_bytes,
    raster_from_view,
    rebuild_table,
    row_to_raster,
)


def open_corpus(n_images: int, vrt_params: dict | None = None,
                **read_kwargs) -> "RasterDataset":
    """Front door (open_rasterio analogue): read + decode the image corpus.

    ``vrt_params`` is the WarpedVRT-ingestion analogue
    (/root/reference/rioxarray/_io.py:1096-1122): warp parameters captured
    at OPEN time, fused into the open path so every downstream consumer
    sees warped rows.  Recognized keys mirror the reference's dict:
    ``crs`` (destination, required), ``resampling``, ``nodata``, and the
    explicit destination grid ``transform`` + ``width`` + ``height``
    (all three or none — a partial grid raises, like rasterio's VRT).
    Unknown keys raise (typos must not silently no-op)."""
    from .pipelines import flagship as fpipe

    ds = fpipe.read_corpus(n_images, **read_kwargs)
    rds = RasterDataset(decode_stage_mod.decode_stage(ds))
    if vrt_params is None:
        return rds
    params = dict(vrt_params)
    dst_crs = params.pop("crs", None)
    if dst_crs is None:
        raise ValueError("vrt_params requires a destination 'crs'")
    resampling = params.pop("resampling", "nearest")
    nodata = params.pop("nodata", None)
    transform = params.pop("transform", None)
    width = params.pop("width", None)
    height = params.pop("height", None)
    if params:
        raise ValueError(f"unsupported vrt_params keys: {sorted(params)}")
    grid_parts = (transform is not None, width is not None, height is not None)
    if any(grid_parts) and not all(grid_parts):
        raise ValueError(
            "vrt_params grid needs transform AND width AND height"
        )
    if all(grid_parts):
        grid = warp_stage_mod.GridSpec(dst_crs, transform, (height, width))
        return rds.reproject_match(grid, resampling=resampling, nodata=nodata)
    return rds.reproject(dst_crs, resampling=resampling, nodata=nodata)


def open_geotiffs(ds, id_col: str = "image_id", payload_col: str = "payload",
                  nodata: float = float("nan")) -> "RasterDataset":
    """open_rasterio on REAL GeoTIFF bytes (the reference's primary input
    format — rioxarray/_io.py:1000-1120 reads it through rasterio/GDAL;
    here kernels/tiff.py decodes from scratch): a Dataset with a binary
    TIFF column becomes engine raster rows (pixels, dims, dtype,
    transform, crs) ready for every downstream stage.  Rows missing the
    georeferencing tags raise — a silent identity transform would corrupt
    every spatial op downstream (the reference's NotGeoreferencedWarning
    is a hard error here)."""
    import numpy as np
    import pyarrow as pa

    from .kernels import tiff as tiff_mod
    from .stages.schema import RASTER_SCHEMA, pixels_to_bytes

    nod = float(nodata)

    def decode_batch(batch: pa.Table) -> pa.Table:
        rows = []
        for rid, payload in zip(
            batch[id_col].to_pylist(), batch[payload_col].to_pylist()
        ):
            px, transform, crs = tiff_mod.decode_geotiff(payload)
            if transform is None or crs is None:
                raise ValueError(
                    f"GeoTIFF {rid!r} has no georeferencing tags"
                )
            rows.append(
                {
                    "image_id": str(rid),
                    "band_count": px.shape[0],
                    "h": px.shape[1],
                    "w": px.shape[2],
                    "dtype": str(px.dtype),
                    "nodata": nod,
                    "crs": crs,
                    "transform": [float(v) for v in transform],
                    "pixels": pixels_to_bytes(px),
                    "caption": None,
                    "phash": None,
                }
            )
        return pa.Table.from_pylist(rows, schema=RASTER_SCHEMA)

    return RasterDataset(
        ds.map_batches(decode_batch, batch_format="pyarrow",
                       zero_copy_batch=True)
    )


def open_netcdfs(ds, id_col: str = "image_id", payload_col: str = "payload",
                 variable: str | None = None, mask_and_scale: bool = False,
                 default_nodata: float = float("nan")) -> "RasterDataset":
    """open_rasterio on netCDF4/HDF5 container bytes — the reference's
    golden-corpus format (its canonical reproject tests open
    ``MODIS_ARRAY.nc``: /root/reference/test/integration/
    test_integration_rioxarray.py:53-69) and its subdataset fan-out
    (rioxarray/_io.py:804-847 yields one DataArray per netCDF variable).
    kernels/hdf5.py decodes the container from scratch (no HDF5 library
    in this environment).  Every spatial variable in the payload becomes
    one engine raster row with ``image_id = "<rid>/<variable>"``;
    ``variable`` narrows to one name; ``mask_and_scale`` applies CF
    scale/offset with NaN fill (xarray ``open_dataset`` semantics,
    default off = ``open_rasterio`` raw-value semantics)."""
    import numpy as np
    import pyarrow as pa

    from .kernels import hdf5 as hdf5_mod
    from .stages.schema import RASTER_SCHEMA, pixels_to_bytes

    def decode_batch(batch: pa.Table) -> pa.Table:
        rows = []
        for rid, payload in zip(
            batch[id_col].to_pylist(), batch[payload_col].to_pylist()
        ):
            rasters = hdf5_mod.netcdf_rasters(
                payload, mask_and_scale=mask_and_scale)
            if variable is not None:
                rasters = [r for r in rasters if r["name"] == variable]
                if not rasters:
                    raise ValueError(
                        f"netCDF {rid!r} has no spatial variable "
                        f"{variable!r}"
                    )
            for r in rasters:
                px = r["pixels"]
                nod = r["nodata"]
                rows.append(
                    {
                        "image_id": f"{rid}/{r['name']}",
                        "band_count": px.shape[0],
                        "h": px.shape[1],
                        "w": px.shape[2],
                        "dtype": str(px.dtype),
                        "nodata": float(nod) if nod is not None
                        else float(default_nodata),
                        "crs": r["crs"],
                        "transform": [float(v) for v in r["transform"]],
                        "pixels": pixels_to_bytes(np.ascontiguousarray(px)),
                        "caption": None,
                        "phash": None,
                    }
                )
        return pa.Table.from_pylist(rows, schema=RASTER_SCHEMA)

    return RasterDataset(
        ds.map_batches(decode_batch, batch_format="pyarrow",
                       zero_copy_batch=True)
    )


def open_images(ds, id_col: str = "image_id", payload_col: str = "payload",
                nodata: float = float("nan"), transform=None,
                crs: str | None = None) -> "RasterDataset":
    """open_rasterio on ANY payload the codec registry recognizes — the
    open-any-GDAL-readable-format front door of the reference
    (/root/reference/rioxarray/_io.py:1000-1328; GDAL ships PNG/JPEG/BMP/
    GIF drivers alongside GeoTIFF).  From-scratch decoders: GeoTIFF
    (kernels/tiff.py), PNG, baseline JPEG, BMP, GIF, plus the 4 corpus
    codecs — routed by magic sniff.

    Georeferencing: GeoTIFF rows use their embedded tags (an explicit
    ``transform``/``crs`` argument overrides); other formats carry none,
    so they get the identity transform and ``crs=None`` unless provided —
    mirroring GDAL's ungeoreferenced-open behavior (the reference's
    NotGeoreferencedWarning case).  Spatial stages raise on crs=None, so
    a missing CRS can never silently corrupt a spatial op; non-spatial
    pipelines (features, dedup, resize) run fine without one.
    """
    import numpy as np
    import pyarrow as pa

    from .kernels import codecs as codecs_mod
    from .kernels import tiff as tiff_mod
    from .stages.schema import RASTER_SCHEMA, pixels_to_bytes

    nod = float(nodata)
    user_t = None if transform is None else [float(v) for v in transform]

    def decode_batch(batch: pa.Table) -> pa.Table:
        rows = []
        for rid, payload in zip(
            batch[id_col].to_pylist(), batch[payload_col].to_pylist()
        ):
            fmt = codecs_mod.sniff(payload)
            if fmt is None:
                raise ValueError(
                    f"image {rid!r}: unrecognized payload format (supported:"
                    " geotiff/png/jpeg/bmp/gif + corpus codecs)"
                )
            if fmt == "tiff":
                px, t, c = tiff_mod.decode_geotiff(payload)
                t = user_t if user_t is not None else (
                    None if t is None else [float(v) for v in t]
                )
                c = crs if crs is not None else c
            else:
                px = codecs_mod.decode(payload)
                t, c = user_t, crs
            if t is None:
                t = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0]  # identity (ungeoref'd)
            rows.append(
                {
                    "image_id": str(rid),
                    "band_count": px.shape[0],
                    "h": px.shape[1],
                    "w": px.shape[2],
                    "dtype": str(px.dtype),
                    "nodata": nod,
                    "crs": c,
                    "transform": t,
                    "pixels": pixels_to_bytes(px),
                    "caption": None,
                    "phash": None,
                }
            )
        return pa.Table.from_pylist(rows, schema=RASTER_SCHEMA)

    return RasterDataset(
        ds.map_batches(decode_batch, batch_format="pyarrow",
                       zero_copy_batch=True)
    )


def wrap(ds) -> "RasterDataset":
    return RasterDataset(ds)


class RasterDataset:
    """Chainable raster-operator surface over a Dataset of raster rows.

    ``attrs`` / ``encoding`` are driver-side metadata dicts (the set_attrs /
    set_encoding surface, /root/reference/rioxarray/rioxarray.py:369-427):
    they ride along through every chained op (the wrapper copies them) and
    are persisted into parquet schema metadata by :meth:`write_parquet`.
    """

    def __init__(self, ds, attrs: dict | None = None,
                 encoding: dict | None = None):
        self.ds = ds
        self.attrs = dict(attrs or {})
        self.encoding = dict(encoding or {})

    def _wrap(self, ds) -> "RasterDataset":
        """New wrapper over a derived Dataset, carrying attrs/encoding."""
        return RasterDataset(ds, attrs=self.attrs, encoding=self.encoding)

    # ---- attrs / encoding (rioxarray.py:369-427) ------------------------
    def set_attrs(self, attrs: dict, inplace: bool = False) -> "RasterDataset":
        """Replace the attrs dict (set_attrs semantics)."""
        if inplace:
            self.attrs = dict(attrs)
            return self
        return RasterDataset(self.ds, attrs=attrs, encoding=self.encoding)

    def update_attrs(self, attrs: dict, inplace: bool = False) -> "RasterDataset":
        new = {**self.attrs, **attrs}
        return self.set_attrs(new, inplace=inplace)

    def set_encoding(self, encoding: dict, inplace: bool = False) -> "RasterDataset":
        if inplace:
            self.encoding = dict(encoding)
            return self
        return RasterDataset(self.ds, attrs=self.attrs, encoding=encoding)

    def update_encoding(self, encoding: dict, inplace: bool = False) -> "RasterDataset":
        """Merge-update variant (rioxarray.py:503-607 family)."""
        return self.set_encoding({**self.encoding, **encoding}, inplace=inplace)

    def write_coordinate_system(self, inplace: bool = False) -> "RasterDataset":
        """CF per-axis coordinate attrs from the dataset CRS
        (write_coordinate_system, rioxarray.py:446-501).  The reference
        attaches axis/long_name/standard_name/units to the x/y coordinate
        variables; here rows carry a transform instead of materialized
        coords, so the attrs land in the wrapper attrs dict (flat
        ``x#axis``-style keys, matching the CF convention codec's schema
        metadata) and persist through :meth:`write_parquet`'s sidecar.
        Requires a single uniform CRS (the Dataset-contract of
        write_crs below)."""
        from .stages.convention import coordinate_system_attrs

        crs_values = self.crs_set()
        if len(crs_values) != 1:
            raise ValueError(
                "write_coordinate_system requires exactly one CRS across "
                f"the dataset; found {sorted(crs_values)!r}"
            )
        per_axis = coordinate_system_attrs(next(iter(crs_values)))
        flat = {
            f"{dim}#{name}": value
            for dim, attrs in per_axis.items()
            for name, value in attrs.items()
        }
        return self.update_attrs(flat, inplace=inplace)

    # ---- plumbing -------------------------------------------------------
    def _map_rows(self, fn, **kwargs) -> "RasterDataset":
        """Per-row Raster -> Raster transform as a stateless map_batches."""

        def batch_fn(batch: pa.Table) -> pa.Table:
            rows = []
            for row in batch.to_pylist():
                out = fn(row)
                if out is not None:
                    rows.append(out)
            if not rows:
                return batch.slice(0, 0)
            return pa.Table.from_pylist(rows, schema=batch.schema)

        opts = dict(batch_format="pyarrow", zero_copy_batch=True)
        opts.update(kwargs)
        return self._wrap(self.ds.map_batches(batch_fn, **opts))

    def _map_raster(self, fn, **kwargs) -> "RasterDataset":
        """Per-row ``Raster -> Raster | None`` transform, columnar: pixels
        in as zero-copy views, out through one contiguous buffer; the
        per-row geo columns are rebuilt from the returned raster."""

        def batch_fn(batch: pa.Table) -> pa.Table:
            meta = batch.drop_columns(["pixels"]).to_pylist()
            keep_idx, bands, hs, ws, dts, nods, crss, ts = (
                [], [], [], [], [], [], [], []
            )
            builder = BinaryBuilder()
            for i, px in enumerate(pixel_views(batch)):
                r = fn(raster_from_view(px, meta[i]))
                if r is None:
                    continue
                keep_idx.append(i)
                bands.append(r.count)
                hs.append(r.height)
                ws.append(r.width)
                dts.append(r.pixels.dtype.name)
                nods.append(
                    float(r.nodata) if r.nodata is not None else float("nan")
                )
                crss.append(r.crs.to_string() if r.crs is not None else "")
                ts.append([float(v) for v in r.transform])
                builder.append(r.pixels)
            return rebuild_table(
                batch,
                {
                    "band_count": pa.array(bands, pa.int32()),
                    "h": pa.array(hs, pa.int32()),
                    "w": pa.array(ws, pa.int32()),
                    "dtype": pa.array(dts, pa.string()),
                    "nodata": pa.array(nods, pa.float64()),
                    "crs": pa.array(crss, pa.string()),
                    "transform": pa.array(
                        ts, batch.schema.field("transform").type
                    ),
                },
                builder,
                keep_idx=keep_idx,
            )

        opts = dict(batch_format="pyarrow", zero_copy_batch=True)
        opts.update(kwargs)
        return self._wrap(self.ds.map_batches(batch_fn, **opts))

    def _set_columns(self, make_updates) -> "RasterDataset":
        """Metadata-only columnar rewrite: ``make_updates(batch) -> {name:
        pa.Array}``; the pixels buffer passes through untouched."""

        def batch_fn(batch: pa.Table) -> pa.Table:
            updates = make_updates(batch)
            for name, arr in updates.items():
                batch = batch.set_column(
                    batch.schema.get_field_index(name), name, arr
                )
            return batch

        return self._wrap(
            self.ds.map_batches(
                batch_fn, batch_format="pyarrow", zero_copy_batch=True
            )
        )

    @staticmethod
    def _update(row: dict, raster) -> dict:
        new = dict(row)
        new.update(
            h=raster.height,
            w=raster.width,
            dtype=raster.pixels.dtype.name,
            nodata=float(raster.nodata)
            if raster.nodata is not None
            else float("nan"),
            crs=raster.crs.to_string() if raster.crs is not None else "",
            transform=[float(v) for v in raster.transform],
            pixels=pixels_to_bytes(raster.pixels),
            band_count=raster.count,
        )
        return new

    # ---- metadata writers (rioxarray.py:124-607) ------------------------
    def write_crs(self, crs) -> "RasterDataset":
        c = crs_mod.from_user_input(crs).to_string()
        return self._set_columns(
            lambda b: {"crs": pa.array([c] * b.num_rows, pa.string())}
        )

    def write_nodata(self, nodata) -> "RasterDataset":
        """Set the nodata METADATA (no pixel rewrite) — write_nodata
        semantics, raster_array.py:196-254."""

        def updates(batch: pa.Table):
            from .kernels.nodata import ensure_nodata_dtype

            vals = [
                float(ensure_nodata_dtype(nodata, dt))
                for dt in batch["dtype"].to_pylist()
            ]
            return {"nodata": pa.array(vals, pa.float64())}

        return self._set_columns(updates)

    def write_transform(self, transform) -> "RasterDataset":
        t = [float(v) for v in transform]
        return self._set_columns(
            lambda b: {
                "transform": pa.array(
                    [t] * b.num_rows, b.schema.field("transform").type
                )
            }
        )

    def crs_set(self) -> set[str]:
        """Distinct CRSs (Dataset CRS-uniformity check,
        raster_dataset.py:41-57 — a metadata-only global agg)."""
        return set(self.ds.select_columns(["crs"]).unique("crs"))

    # ---- structure ------------------------------------------------------
    def tile(self, tile_size: int = 64, cell_res: int = CELL_RES,
             halo: int = 0) -> "RasterDataset":
        return self._wrap(
            tile_stage_mod.tile_stage(
                self.ds, tile_size=tile_size, cell_res=cell_res, halo=halo
            )
        )

    def band_as_variable(self) -> "RasterDataset":
        """One row per band (the band_as_variable loader analogue,
        /root/reference/rioxarray/_io.py:850-900)."""

        def batch_fn(batch: pa.Table) -> pa.Table:
            ids = batch["image_id"].to_pylist()
            keep_idx, out_ids = [], []
            builder = BinaryBuilder()
            for i, px in enumerate(pixel_views(batch)):
                for b in range(px.shape[0]):
                    keep_idx.append(i)
                    out_ids.append(f"{ids[i]}#b{b + 1}")
                    builder.append(px[b : b + 1])
            return rebuild_table(
                batch,
                {
                    "image_id": pa.array(out_ids, pa.string()),
                    "band_count": pa.array(
                        [1] * len(keep_idx), pa.int32()
                    ),
                },
                builder,
                keep_idx=keep_idx,
            )

        return self._wrap(
            self.ds.map_batches(
                batch_fn, batch_format="pyarrow", zero_copy_batch=True
            )
        )

    def isel_window(self, row_off, col_off, height, width) -> "RasterDataset":
        return self._map_raster(
            lambda r: r.isel_window(row_off, col_off, height, width)
        )

    # ---- subsetting -----------------------------------------------------
    def clip_box(self, minx, miny, maxx, maxy, crs=None, **kwargs) -> "RasterDataset":
        return self._wrap(
            clip_stage_mod.clip_box_stage(
                self.ds, (minx, miny, maxx, maxy), box_crs=crs, **kwargs
            )
        )

    def clip(self, geometries, crs=None, invert=False, drop=True,
             all_touched=False, **kwargs) -> "RasterDataset":
        return self._wrap(
            clip_stage_mod.clip_stage(
                self.ds,
                geometries,
                geom_crs=crs,
                invert=invert,
                drop_empty=drop,
                all_touched=all_touched,
                **kwargs,
            )
        )

    def pad_box_tiles(self, minx, miny, maxx, maxy, crs=None,
                      tile_size: int = 64, **kwargs) -> "RasterDataset":
        """Distributed pad over a TILED dataset: synthetic nodata tiles on
        each image's extended grid cover the box (stages/clip.pad_box_stage)."""
        return self._wrap(
            clip_stage_mod.pad_box_stage(
                self.ds, (minx, miny, maxx, maxy), box_crs=crs,
                tile_size=tile_size, **kwargs,
            )
        )

    def pad_box(self, minx, miny, maxx, maxy, constant_values=None) -> "RasterDataset":
        return self._map_raster(
            lambda r: r.pad_box(
                minx, miny, maxx, maxy, constant_values=constant_values
            )
        )

    # ---- warp -----------------------------------------------------------
    def reproject(self, dst_crs, resampling="nearest", resolution=None,
                  nodata=None, **kwargs) -> "RasterDataset":
        return self._wrap(
            warp_stage_mod.reproject_stage(
                self.ds, dst_crs, resampling=resampling,
                resolution=resolution, nodata=nodata, **kwargs,
            )
        )

    def reproject_match(self, match, resampling="nearest", nodata=None,
                        **kwargs) -> "RasterDataset":
        """match: a GridSpec, a raster row dict, or another RasterDataset
        (its lexicographically-first row defines the grid — broadcast
        small side)."""
        if isinstance(match, warp_stage_mod.GridSpec):
            grid = match
        elif isinstance(match, dict):
            grid = warp_stage_mod.GridSpec.from_raster_row(match)
        else:
            first = match.ds.take(1)[0]
            grid = warp_stage_mod.GridSpec.from_raster_row(first)
        return self._wrap(
            warp_stage_mod.reproject_match_stage(
                self.ds, grid, resampling=resampling, nodata=nodata, **kwargs
            )
        )

    def interpolate_na(self, method: str = "nearest") -> "RasterDataset":
        return self._map_raster(lambda r: r.interpolate_na(method))

    # ---- n-ary ----------------------------------------------------------
    def merge(self, method="first", resolution=None, dst_tile_size=256):
        """Mosaic all rows (same CRS). Returns (RasterDataset, grid)."""
        mosaic, grid = merge_stage_mod.merge_stage(
            self.ds, method=method, resolution=resolution,
            dst_tile_size=dst_tile_size,
        )
        return self._wrap(mosaic), grid

    def union(self, other: "RasterDataset") -> "RasterDataset":
        return self._wrap(self.ds.union(other.ds))

    def reproject_match_tiled(self, grid, resampling="nearest", **kwargs):
        """Halo-correct tiled warp onto a shared grid; requires this dataset
        to be tiled with ``tile(halo >= KERNEL_MARGIN[resampling])``."""
        from .stages import warp as warp_stage_mod2

        if not isinstance(grid, warp_stage_mod.GridSpec):
            grid = warp_stage_mod.GridSpec.from_raster_row(grid)
        return self._wrap(
            warp_stage_mod.reproject_match_tiled(
                self.ds, grid, resampling=resampling, **kwargs
            )
        )

    def tile_halo(self, tile_size: int = 64, resampling: str = "cubic",
                  cell_res: int = CELL_RES) -> "RasterDataset":
        """Tile with the halo the given resampling kernel needs."""
        from .kernels.warp import KERNEL_MARGIN

        return self._wrap(
            tile_stage_mod.tile_stage(
                self.ds,
                tile_size=tile_size,
                cell_res=cell_res,
                halo=KERNEL_MARGIN[resampling] + 1,
            )
        )

    # ---- joins ----------------------------------------------------------
    def pip_join(self, geom_rows, plan="broadcast", **kwargs):
        if plan == "broadcast":
            return join_mod.pip_join_broadcast(self.ds, geom_rows, **kwargs)
        return join_mod.pip_join_shuffle(self.ds, geom_rows, **kwargs)

    def knn_join(self, point_rows, k=3, **kwargs):
        return join_mod.knn_join(self.ds, point_rows, k=k, **kwargs)

    def zonal_stats(self, geom_rows, **kwargs):
        return join_mod.zonal_stats(self.ds, geom_rows, **kwargs)

    def sample_points(self, point_rows, **kwargs):
        """Raster values at point locations (sel(x, y, method='nearest'))."""
        return join_mod.point_sample(self.ds, point_rows, **kwargs)

    # ---- rolling-window / multi-scene analysis --------------------------
    def focal_mean(self, radius: int = 1, **kwargs):
        """Moving-window mean; call on halo'd tiles (``tile_halo`` or
        ``tile(...)`` with halo >= radius)."""
        from .stages import focal as focal_mod

        return focal_mod.focal_mean_stage(self.ds, radius=radius, **kwargs)

    def terrain(self, **kwargs):
        """Horn slope/aspect/hillshade; call on halo'd tiles (halo >= 1)."""
        from .stages import focal as focal_mod

        return focal_mod.terrain_stage(self.ds, **kwargs)

    def composite_median(self, origin, res, comp_px: int = 64, **kwargs):
        """Per-pixel median composite across scenes on a shared grid."""
        return merge_stage_mod.composite_median(
            self.ds, origin, res, comp_px=comp_px, **kwargs
        )

    def change_crosstab(self, origin, res, comp_px: int = 64,
                        bucket: float = 256.0, **kwargs):
        """Scene-pair contingency table of co-located pixel classes."""
        return merge_stage_mod.change_crosstab(
            self.ds, origin, res, comp_px=comp_px, bucket=bucket, **kwargs
        )

    def temporal_trend(self, origin, res, comp_px: int = 64, **kwargs):
        """Per-pixel least-squares slope over scene time (polyfit deg 1)."""
        return merge_stage_mod.temporal_trend(
            self.ds, origin, res, comp_px=comp_px, **kwargs
        )

    def histogram(self, bucket: int = 16, **kwargs):
        """Per-image valid-pixel value histogram (floor(px/bucket))."""
        from .stages import stats as stats_stage_mod

        return stats_stage_mod.histogram_stage(self.ds, bucket=bucket,
                                               **kwargs)

    def normalized_difference(self, band_a: int = 1, band_b: int = 0,
                              **kwargs):
        """NDVI-style (A-B)/(A+B) between two bands of every tile."""
        from .stages import stats as stats_stage_mod

        return stats_stage_mod.normalized_difference_stage(
            self.ds, band_a=band_a, band_b=band_b, **kwargs
        )

    def overviews(self, levels=(2, 4, 8), **kwargs):
        """Reduced-resolution pyramid (per-block floor-mean of valid px)."""
        from .stages import stats as stats_stage_mod

        return stats_stage_mod.overviews_stage(self.ds, levels=levels,
                                               **kwargs)

    def reclassify(self, bins, values, fill: int = -9999, **kwargs):
        """Range reclassification (class remap; np.digitize contract)."""
        from .stages import stats as stats_stage_mod

        return self._wrap(stats_stage_mod.reclassify_stage(
            self.ds, bins, values, fill=fill, **kwargs
        ))

    def equalize(self, levels: int = 255, fill: int = -1, **kwargs):
        """Per-image histogram equalization (image-global CDF remap)."""
        from .stages import stats as stats_stage_mod

        return self._wrap(stats_stage_mod.equalize_stage(
            self.ds, levels=levels, fill=fill, **kwargs
        ))

    def region_label(self, threshold: float, **kwargs):
        """Connected-region labeling of the threshold classification
        (GDAL polygonize/sieve interior step)."""
        from .stages import stats as stats_stage_mod

        return stats_stage_mod.region_label_stage(
            self.ds, threshold=threshold, **kwargs
        )

    def sieve(self, threshold: float, min_size: int, **kwargs):
        """GDAL SieveFilter: mask foreground regions smaller than
        ``min_size`` connected pixels to nodata."""
        from .stages import stats as stats_stage_mod

        return self._wrap(stats_stage_mod.sieve_stage(
            self.ds, threshold=threshold, min_size=min_size, **kwargs
        ))

    def pansharpen(self, pan_band: int = 0, scale: int = 1000, **kwargs):
        """Brovey pansharpening (integer-exact trunc-division variant)."""
        from .stages import stats as stats_stage_mod

        return self._wrap(stats_stage_mod.pansharpen_stage(
            self.ds, pan_band=pan_band, scale=scale, **kwargs
        ))

    def percentile_stretch(self, lo_permille: int = 20,
                           hi_permille: int = 980, **kwargs):
        """2-98%-style percentile contrast stretch (cumulative count
        cut), integer-exact."""
        from .stages import stats as stats_stage_mod

        return self._wrap(stats_stage_mod.percentile_stretch_stage(
            self.ds, lo_permille=lo_permille, hi_permille=hi_permille,
            **kwargs
        ))

    def match_histograms(self, ref_counts, fill: int = -1, **kwargs):
        """Remap every image's distribution onto a reference
        (band, value, n) distribution — integer closest-rank rule."""
        from .stages import stats as stats_stage_mod

        return self._wrap(stats_stage_mod.match_histograms_stage(
            self.ds, ref_counts, fill=fill, **kwargs
        ))

    def to_xyz(self, skip_nodata: bool = True, **kwargs):
        """gdal2xyz: one row per (valid) pixel with center coords."""
        from .stages import stats as stats_stage_mod

        return stats_stage_mod.to_xyz_stage(
            self.ds, skip_nodata=skip_nodata, **kwargs
        )

    def band_value_counts(self, **kwargs):
        """Exact per-band valid-pixel value counts (band, value, n)."""
        from .stages import stats as stats_stage_mod

        return stats_stage_mod.band_value_counts(self.ds, **kwargs)

    def terrain_indices(self, **kwargs):
        """gdaldem TRI / TPI / roughness (integer-exact numerators)."""
        from .stages import focal as focal_stage_mod

        return focal_stage_mod.terrain_indices_stage(self.ds, **kwargs)

    def flow_direction(self, **kwargs):
        """D8 steepest-descent flow direction (ESRI codes)."""
        from .stages import focal as focal_stage_mod

        return focal_stage_mod.flow_direction_stage(self.ds, **kwargs)

    def flow_accumulation(self, **kwargs):
        """D8 flow accumulation (upstream cell counts, image-global)."""
        from .stages import focal as focal_stage_mod

        return focal_stage_mod.flow_accumulation_stage(self.ds, **kwargs)

    def watershed(self, **kwargs):
        """Watershed basins over the D8 flow graph (image-global)."""
        from .stages import focal as focal_stage_mod

        return focal_stage_mod.watershed_stage(self.ds, **kwargs)

    def focal_mode(self, radius: int = 1, **kwargs):
        """Focal majority (windowed mode, ties to the smallest value)."""
        from .stages import focal as focal_stage_mod

        return focal_stage_mod.focal_mode_stage(self.ds, radius=radius,
                                                **kwargs)

    def proximity(self, threshold: float, units: str = "pixel", **kwargs):
        """gdal_proximity: per-pixel euclidean distance to the nearest
        over-threshold pixel (image-global)."""
        from .stages import stats as stats_stage_mod

        return stats_stage_mod.proximity_stage(
            self.ds, threshold=threshold, units=units, **kwargs
        )

    def idw(self, points, values, radius_px: int = 12, **kwargs):
        """gdal_grid invdist: IDW-interpolate scattered points onto
        every tile's grid (integer-exact variant)."""
        from .stages import clip as clip_stage_mod2

        return clip_stage_mod2.idw_stage(self.ds, points, values,
                                         radius_px=radius_px, **kwargs)

    def rasterize(self, geometries, values, geom_crs=None, fill: int = 0,
                  all_touched: bool = False, merge: str = "replace",
                  **kwargs):
        """Burn a (geometry, value) table into every tile's grid
        (rasterio.features.rasterize contract)."""
        from .stages import clip as clip_stage_mod

        return self._wrap(clip_stage_mod.rasterize_stage(
            self.ds, geometries, values, geom_crs=geom_crs, fill=fill,
            all_touched=all_touched, merge=merge, **kwargs
        ))

    def band_stats(self, **kwargs):
        """Corpus-wide per-band n/sum/sum² of valid pixels."""
        from .stages import stats as stats_stage_mod

        return stats_stage_mod.band_stats_stage(self.ds, **kwargs)

    def cell_rollup(self, levels=(8, 6, 4), **kwargs):
        """Tile counts + pixel coverage aggregated to parent cells."""
        from .stages import tile as tile_stage_mod

        return tile_stage_mod.cell_rollup_stage(self.ds, levels=levels,
                                                **kwargs)

    # ---- consumption ----------------------------------------------------
    def bounds_table(self):
        """Per-row footprint bounds (metadata aggregate source)."""

        def fb(batch: pa.Table) -> pa.Table:
            out = []
            for row in batch.select(
                ["image_id", "transform", "w", "h"]
            ).to_pylist():
                left, bottom, right, top = aff.bounds(
                    tuple(row["transform"]), row["w"], row["h"]
                )
                out.append(
                    {
                        "image_id": row["image_id"],
                        "left": left,
                        "bottom": bottom,
                        "right": right,
                        "top": top,
                    }
                )
            return pa.Table.from_pylist(out)

        return self.ds.map_batches(
            fb, batch_format="pyarrow", zero_copy_batch=True
        )

    def write_parquet(self, path: str, **kwargs):
        """to_raster analogue: per-block parallel parquet files — the
        reference's single-file chunk-lock protocol
        (raster_writer.py:245-264) is replaced by Ray's per-block naming.
        attrs/encoding persist as an ``_attrs.json`` sidecar (the tags the
        reference writes into the GeoTIFF, raster_writer.py:83-119)."""
        import json
        import os

        out = self.ds.write_parquet(path, **kwargs)
        if self.attrs or self.encoding:
            os.makedirs(path, exist_ok=True)
            with open(os.path.join(path, "_attrs.json"), "w") as f:
                json.dump({"attrs": self.attrs, "encoding": self.encoding}, f)
        return out

    def to_geotiffs(self, out_dir: str, compression: str = "deflate"):
        """to_raster writing REAL GeoTIFF: one ``<image_id>.tif`` per row
        (each row is an independent raster here — the reference's one-file
        windowed writer, raster_writer.py:245-264, maps to per-row files
        the way write_parquet maps its chunk protocol to per-block files).
        Rows write in parallel from the map tasks; a ``_MANIFEST.json``
        records the written ids so a resumed run can skip completed rows.
        Returns the manifest path."""
        import json
        import os

        from .kernels import tiff as tiff_mod
        from .stages.schema import pixel_views

        os.makedirs(out_dir, exist_ok=True)
        comp = compression

        def write_batch(batch: pa.Table) -> pa.Table:
            meta = batch.drop_columns(["pixels"]).to_pylist()
            written = []
            for r, px in zip(meta, pixel_views(batch)):
                name = str(r["image_id"]).replace("/", "_")
                path = os.path.join(out_dir, f"{name}.tif")
                payload = tiff_mod.encode_geotiff(
                    px, transform=tuple(r["transform"]),
                    crs=r["crs"], compression=comp,
                )
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(payload)
                os.replace(tmp, path)  # atomic: readers never see partials
                written.append(r["image_id"])
            return pa.Table.from_pydict({"image_id": pa.array(written)})

        ids = [
            r["image_id"]
            for r in self.ds.map_batches(
                write_batch, batch_format="pyarrow", zero_copy_batch=True
            ).take_all()
        ]
        manifest = os.path.join(out_dir, "_MANIFEST.json")
        with open(manifest, "w") as f:
            json.dump({"written": sorted(ids)}, f)
        return manifest

    def to_raster(self, path: str, method: str = "first",
                  dst_tile_size: int = 256, compression: str = "deflate",
                  overview_levels=(), resolution=None, grid=None,
                  sort_tiles: bool = True):
        """The reference's single-file ``to_raster``
        (raster_writer.py:224-341 windowed writes under a lock): mosaic
        every row of this dataset onto one union grid and write ONE
        tiled, sparse-capable GeoTIFF (optionally with multi-IFD
        overviews).  Compositing and compression stay distributed; only
        finished compressed tiles stream to the single writer.  Returns
        ``(path, grid)``.  Capped at 4 GiB (classic-TIFF offsets) — use
        ``to_geotiffs`` / ``write_parquet`` for the partitioned layout
        past that."""
        from .stages.geotiff_sink import write_mosaic_geotiff

        return write_mosaic_geotiff(
            self.ds, path, method=method, dst_tile_size=dst_tile_size,
            compression=compression, overview_levels=overview_levels,
            resolution=resolution, grid=grid, sort_tiles=sort_tiles,
        )

    def count(self) -> int:
        return self.ds.count()

    def take(self, n: int = 20):
        return self.ds.take(n)

    def take_all(self):
        return self.ds.take_all()

    def sort_rows(self) -> "RasterDataset":
        """Deterministic output order (SURVEY.md §2.9)."""
        cols = [c for c in ("image_id", "tile_row", "tile_col")
                if c in self.ds.schema().names]
        return self._wrap(self.ds.sort(cols))

    def stats(self) -> str:
        return self.ds.stats()


def read_cog_window(src, col_off: int, row_off: int, win_w: int,
                    win_h: int, ifd_index: int = 0):
    """Windowed COG read through ranged requests: fetch the TIFF header
    plus ONLY the tile ranges intersecting the window (the reference's
    /vsicurl/ remote-COG path, test_integration__io.py http cases,
    against a two-call RangeReader protocol — swap LocalRangeReader for
    an S3/HTTP range-GET reader in a real deployment).  ``src`` is a path
    or any object with ``read_range(offset, size)``.  Returns a
    kernels.raster.Raster over the window (isel_window semantics)."""
    from .kernels import crs as crs_mod
    from .kernels import tiff as tiff_mod
    from .kernels.raster import Raster

    reader = tiff_mod.LocalRangeReader(src) if isinstance(src, str) else src
    try:
        px, transform, crs_str, nodata = tiff_mod.decode_geotiff_window(
            reader, col_off, row_off, win_w, win_h, ifd_index=ifd_index
        )
    finally:
        if isinstance(src, str):
            reader.close()
    return Raster(
        px,
        transform,
        crs_mod.from_user_input(crs_str) if crs_str else None,
        nodata,
    )


def open_parquet(path: str, **read_kwargs) -> "RasterDataset":
    """Read a written RasterDataset back, restoring the attrs sidecar."""
    import json
    import os

    import ray.data as rd

    rds = RasterDataset(rd.read_parquet(path, **read_kwargs))
    sidecar = os.path.join(path, "_attrs.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            payload = json.load(f)
        rds.attrs = payload.get("attrs", {})
        rds.encoding = payload.get("encoding", {})
    return rds


_SPATIAL_COLUMNS = ("h", "w", "transform", "pixels")


def _check_spatial_schema(name: str, rds: "RasterDataset") -> bool:
    """Per-variable spatial-dims gate (the reference's
    ``_get_spatial_dims`` try/except at raster_dataset.py:100-142): returns
    True when the variable has the spatial columns, False to skip it when
    the ``skip_missing_spatial_dims`` option is set, raises otherwise."""
    from .kernels.raster import MissingSpatialDimensionError
    from .options import SKIP_MISSING_SPATIAL_DIMS, get_option

    names = set(rds.ds.schema().names)
    missing = [c for c in _SPATIAL_COLUMNS if c not in names]
    if not missing:
        return True
    if get_option(SKIP_MISSING_SPATIAL_DIMS):
        return False
    raise MissingSpatialDimensionError(
        f"variable {name!r} is missing spatial columns {missing}; set "
        "rioxarray_ray.set_options(skip_missing_spatial_dims=True) to skip "
        "non-spatial variables"
    )


def write_parquet_dataset(named: dict, out_dir: str, **kwargs) -> str:
    """Multi-variable writer (Dataset.rio.to_raster analogue,
    /root/reference/rioxarray/raster_dataset.py + raster_writer.py band
    naming): each variable writes under ``var=<name>/`` with its own attrs
    sidecar, plus a ``_variables.json`` manifest — the row-store counterpart
    of multi-band output with long band names.  Non-spatial variables raise
    ``MissingSpatialDimensionError`` unless ``skip_missing_spatial_dims``
    is set, in which case they are skipped (reference option semantics,
    raster_dataset.py:136-141)."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for name, rds in named.items():
        if not _check_spatial_schema(name, rds):
            continue
        rds.write_parquet(os.path.join(out_dir, f"var={name}"), **kwargs)
        written.append(name)
    with open(os.path.join(out_dir, "_variables.json"), "w") as f:
        json.dump({"variables": sorted(written)}, f)
    return out_dir


def open_parquet_dataset(out_dir: str, **read_kwargs) -> dict:
    """Read a multi-variable parquet dataset back: {name: RasterDataset}."""
    import json
    import os

    with open(os.path.join(out_dir, "_variables.json")) as f:
        manifest = json.load(f)
    return {
        name: open_parquet(os.path.join(out_dir, f"var={name}"), **read_kwargs)
        for name in manifest["variables"]
    }


def merge_datasets(named: dict, method="first", resolution=None,
                   dst_tile_size: int = 256) -> dict:
    """Per-variable mosaic (merge_datasets semantics,
    /root/reference/rioxarray/merge.py:226-291): each named RasterDataset
    merges independently onto its own union grid; returns
    ``{name: (mosaic RasterDataset, grid)}`` — the reference's per-variable
    loop expressed over named datasets.  Non-spatial variables raise
    ``MissingSpatialDimensionError`` unless ``skip_missing_spatial_dims``
    is set, in which case they pass through unchanged with ``grid=None``
    (the reference copies them verbatim, raster_dataset.py:136-141)."""
    out = {}
    for name, rds in named.items():
        if not _check_spatial_schema(name, rds):
            out[name] = (rds, None)
            continue
        mosaic, grid = rds.merge(
            method=method, resolution=resolution, dst_tile_size=dst_tile_size
        )
        out[name] = (mosaic, grid)
    return out
