"""Reproject stages (the flagship, SURVEY.md §2.4).

Two shapes:

- ``reproject_stage(ds, dst_crs, ...)``: per-row warp — each raster/tile row
  is warped independently onto its own planned dst grid (the semantics of
  ``xds.rio.reproject``, /root/reference/rioxarray/raster_array.py:198-309).
  Stateless rows, but run on an ACTOR POOL (``WarpActor``) so per-worker
  state (CRS objects, cached dst pixel-center lon/lat grids) is built once
  per actor, not once per batch (SURVEY.md §7.2).

- ``reproject_match_stage(ds, grid_spec, ...)``: every row is warped onto
  ONE shared grid (``rio.reproject_match``, raster_array.py:429-491).  The
  grid spec is a broadcast small side: the driver computes it once and
  ships it in the actor constructor args (``ray.put`` under the hood via
  Ray's arg serialization), and the actor caches the dst pixel-center
  lon/lat arrays — the expensive half of the inverse mapping — across ALL
  rows ("pinned warp kernels").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels import affine as aff
from ..kernels import crs as crs_mod
from ..kernels import warp as warp_mod
from .schema import pixels_to_bytes, row_to_raster  # noqa: F401 (row_to_raster kept for callers)


class GridSpec:
    """A destination grid: (crs, transform, shape). The broadcast small side
    of reproject_match (the reference's lookup-join analogue)."""

    def __init__(self, crs, transform, shape):
        self.crs = crs_mod.from_user_input(crs)
        self.transform = tuple(float(v) for v in transform)
        self.shape = (int(shape[0]), int(shape[1]))

    @classmethod
    def from_raster_row(cls, row: dict) -> "GridSpec":
        return cls(row["crs"], tuple(row["transform"]), (row["h"], row["w"]))



# shared tail of every per-band warp — kernels/warp.finalize_band (keeps
# nearest's native-dtype fast lane in one place)
_finalize_band = warp_mod.finalize_band


from .schema import rebuild_table as _rebuild_table  # shared reassembly helper


class WarpActor:
    """Actor-pool warp worker with pinned projection grids.

    The cache maps (dst_transform, shape, dst_crs_string) -> precomputed
    lon/lat of dst pixel centers, reused for every row warped onto the same
    grid (all rows, in match mode).
    """

    def __init__(
        self,
        dst_crs: str | None = None,
        grid_spec: GridSpec | None = None,
        resampling: str = "nearest",
        resolution=None,
        nodata=None,
    ):
        self.dst_crs = (
            crs_mod.from_user_input(dst_crs) if dst_crs is not None else None
        )
        self.grid = grid_spec
        self.resampling = warp_mod.resolve_resampling(resampling)
        self.resolution = resolution
        self.nodata = nodata
        self._lonlat_cache: dict = {}

    def _dst_lonlat(self, transform, shape, dcrs):
        if self.grid is None:
            # per-row mode: every row has a unique dst grid — caching would
            # only accumulate full-size arrays with a zero hit rate
            h, w = shape
            cols = np.arange(w, dtype=np.float64) + 0.5
            rows = np.arange(h, dtype=np.float64) + 0.5
            cgrid, rgrid = np.meshgrid(cols, rows)
            dx, dy = aff.apply(transform, cgrid, rgrid)
            return dcrs.inverse(dx.ravel(), dy.ravel())
        key = (transform, shape, dcrs.to_string())
        hit = self._lonlat_cache.get(key)
        if hit is None:
            h, w = shape
            cols = np.arange(w, dtype=np.float64) + 0.5
            rows = np.arange(h, dtype=np.float64) + 0.5
            cgrid, rgrid = np.meshgrid(cols, rows)
            dx, dy = aff.apply(transform, cgrid, rgrid)
            lon, lat = dcrs.inverse(dx.ravel(), dy.ravel())
            hit = (lon, lat)
            if len(self._lonlat_cache) > 32:  # bound actor memory
                self._lonlat_cache.clear()
            self._lonlat_cache[key] = hit
        return hit

    @staticmethod
    def _separable(c) -> bool:
        """x depends only on lon and y only on lat (so the inverse mapping
        factorizes into two 1-D problems)."""
        return c.kind in ("geographic", "mercator")

    def _fractional_coords(self, dst_transform, dst_shape, dcrs, src):
        """Fractional src pixel coords of dst pixel centers.

        SEPARABLE FAST PATH: when both CRSs are lon/lat- or mercator-like
        and both transforms are rectilinear, the mapping factorizes —
        compute 1-D fcol (per dst column) and frow (per dst row) and let
        every downstream resample op broadcast.  ~10x less coordinate
        memory traffic than the dense 2-D grid; results are bit-identical
        (same IEEE ops per element, and the dropped rectilinear cross
        terms are exact +-0.0 no-ops).
        """
        dh, dw = dst_shape
        if dcrs == src.crs and not aff.has_rotation(dst_transform) \
                and not aff.has_rotation(src.transform):
            # SAME-CRS REGRID: the projection hop is an exact no-op (PROJ
            # short-circuits it too) — pure affine resample, separable,
            # and bit-exact (no etmerc round-trip wobble on the weights)
            cols = np.arange(dw, dtype=np.float64) + 0.5
            rows = np.arange(dh, dtype=np.float64) + 0.5
            a, _, c0, _, e, f0 = dst_transform
            inv = aff.invert(src.transform)
            fcol = (inv[0] * (a * cols + c0) + inv[2])[None, :]
            frow = (inv[4] * (e * rows + f0) + inv[5])[:, None]
            return fcol, frow
        if (
            not aff.has_rotation(dst_transform)
            and not aff.has_rotation(src.transform)
            and self._separable(dcrs)
            and self._separable(src.crs)
        ):
            cols = np.arange(dw, dtype=np.float64) + 0.5
            rows = np.arange(dh, dtype=np.float64) + 0.5
            a, _, c0, _, e, f0 = dst_transform
            dx = a * cols + c0
            dy = e * rows + f0
            lon, _ = dcrs.inverse(dx, np.zeros_like(dx))
            _, lat = dcrs.inverse(np.zeros_like(dy), dy)
            sx, _ = src.crs.forward(lon, np.zeros_like(lon))
            _, sy = src.crs.forward(np.zeros_like(lat), lat)
            inv = aff.invert(src.transform)
            ia, _, ic = inv[0], inv[1], inv[2]
            ie, if_ = inv[4], inv[5]
            fcol = (ia * sx + ic)[None, :]
            frow = (ie * sy + if_)[:, None]
            return fcol, frow
        lon, lat = self._dst_lonlat(dst_transform, dst_shape, dcrs)
        sx, sy = src.crs.forward(lon, lat)
        fcol, frow = aff.apply_inverse(src.transform, sx, sy)
        return fcol.reshape(dh, dw), frow.reshape(dh, dw)

    def _fractional_edges(self, dst_transform, dst_shape, dcrs, src):
        """Fractional src coords of dst pixel EDGES (for the area kernels):
        1-D (w+1,)/(h+1,) on the separable fast path, else the dense
        (h+1, w+1) corner grid."""
        dh, dw = dst_shape
        if dcrs == src.crs and not aff.has_rotation(dst_transform) \
                and not aff.has_rotation(src.transform):
            cols = np.arange(dw + 1, dtype=np.float64)
            rows = np.arange(dh + 1, dtype=np.float64)
            a, _, c0, _, e, f0 = dst_transform
            inv = aff.invert(src.transform)
            return (inv[0] * (a * cols + c0) + inv[2],
                    inv[4] * (e * rows + f0) + inv[5])
        if (
            not aff.has_rotation(dst_transform)
            and not aff.has_rotation(src.transform)
            and self._separable(dcrs)
            and self._separable(src.crs)
        ):
            cols = np.arange(dw + 1, dtype=np.float64)
            rows = np.arange(dh + 1, dtype=np.float64)
            a, _, c0, _, e, f0 = dst_transform
            dx = a * cols + c0
            dy = e * rows + f0
            lon, _ = dcrs.inverse(dx, np.zeros_like(dx))
            _, lat = dcrs.inverse(np.zeros_like(dy), dy)
            sx, _ = src.crs.forward(lon, np.zeros_like(lon))
            _, sy = src.crs.forward(np.zeros_like(lat), lat)
            inv = aff.invert(src.transform)
            return inv[0] * sx + inv[2], inv[4] * sy + inv[5]
        lon, lat = self._dst_lonlat_edges(dst_transform, dst_shape, dcrs)
        sx, sy = src.crs.forward(lon, lat)
        fcol, frow = aff.apply_inverse(src.transform, sx, sy)
        return fcol.reshape(dh + 1, dw + 1), frow.reshape(dh + 1, dw + 1)

    def _dst_lonlat_edges(self, transform, shape, dcrs):
        """lon/lat of dst pixel CORNERS — cached in match mode like
        _dst_lonlat (the projection is the expensive half; without the
        cache every row re-inverts the identical shared grid)."""
        h, w = shape
        if self.grid is None:
            cols = np.arange(w + 1, dtype=np.float64)
            rows = np.arange(h + 1, dtype=np.float64)
            cg, rg = np.meshgrid(cols, rows)
            dx, dy = aff.apply(transform, cg, rg)
            return dcrs.inverse(dx.ravel(), dy.ravel())
        key = ("edges", transform, shape, dcrs.to_string())
        hit = self._lonlat_cache.get(key)
        if hit is None:
            cols = np.arange(w + 1, dtype=np.float64)
            rows = np.arange(h + 1, dtype=np.float64)
            cg, rg = np.meshgrid(cols, rows)
            dx, dy = aff.apply(transform, cg, rg)
            lon, lat = dcrs.inverse(dx.ravel(), dy.ravel())
            hit = (lon, lat)
            if len(self._lonlat_cache) > 32:  # bound actor memory
                self._lonlat_cache.clear()
            self._lonlat_cache[key] = hit
        return hit

    def _resample(self, band, vm, coords):
        """Dispatch one band through the point or area kernel family."""
        kind, a, b = coords
        if kind == "area":
            return warp_mod._resample_band_area(band, vm, a, b, self.resampling)
        return warp_mod._resample_band(band, vm, a, b, self.resampling)

    def _coords_for(self, dst_transform, dst_shape, dcrs, src):
        if self.resampling in warp_mod.AREA_METHODS:
            ce, re_ = self._fractional_edges(dst_transform, dst_shape, dcrs, src)
            return ("area", ce, re_)
        fcol, frow = self._fractional_coords(dst_transform, dst_shape, dcrs, src)
        return ("point", fcol, frow)

    def _warp_pixels(self, pixels, transform, src_crs, src_nodata):
        """Warp one (bands,h,w) array; returns (out, dst_transform, dcrs,
        dst_nodata).  Shared by the columnar __call__ path."""
        from ..kernels.nodata import valid_mask
        from ..kernels.raster import Raster

        src = Raster(pixels, transform, src_crs, src_nodata)
        if self.grid is not None:
            dcrs = self.grid.crs
            dst_transform, (dh, dw) = self.grid.transform, self.grid.shape
        else:
            dcrs = self.dst_crs
            left, bottom, right, top = src.bounds()
            dst_transform, dw, dh = warp_mod.calculate_default_transform(
                src.crs,
                dcrs,
                src.width,
                src.height,
                left,
                bottom,
                right,
                top,
                resolution=self.resolution,
            )
        coords = self._coords_for(dst_transform, (dh, dw), dcrs, src)
        out_dtype = src.pixels.dtype
        dst_nodata = self.nodata
        if dst_nodata is None:
            dst_nodata = (
                src.nodata
                if src.nodata is not None
                else warp_mod.default_nodata(out_dtype)
            )
        from ..kernels.nodata import valid_mask

        bands = src.count
        out = np.empty((bands, dh, dw), dtype=out_dtype)
        fill = float(dst_nodata) if dst_nodata == dst_nodata else np.nan
        for b in range(bands):
            vm = valid_mask(src.pixels[b], src.nodata)
            vals, ok = self._resample(src.pixels[b], vm, coords)
            out[b] = _finalize_band(vals, ok, out_dtype, fill)
        return out, dst_transform, dcrs, float(dst_nodata)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Columnar hot path: pixels via zero-copy views, warped payloads
        into one contiguous output buffer; untouched columns are reused
        from the input batch without conversion."""
        from .schema import BinaryBuilder, pixel_views

        crss = batch["crs"].to_pylist()
        nodatas = batch["nodata"].to_numpy(zero_copy_only=False)
        transforms = batch["transform"].to_pylist()
        dtypes = batch["dtype"].to_pylist()
        hs, ws, out_crs, out_t, out_nod, out_dt = [], [], [], [], [], []
        builder = BinaryBuilder()
        from .schema import decode_nodata

        for i, pixels in enumerate(pixel_views(batch)):
            src_nodata = decode_nodata(float(nodatas[i]), dtypes[i])
            out, dst_transform, dcrs, dst_nodata = self._warp_pixels(
                pixels,  # read-only view; the warp only gathers from it
                tuple(transforms[i]),
                crs_mod.from_user_input(crss[i]),
                src_nodata,
            )
            hs.append(out.shape[1])
            ws.append(out.shape[2])
            out_crs.append(dcrs.to_string())
            out_t.append([float(v) for v in dst_transform])
            out_nod.append(dst_nodata)
            out_dt.append(out.dtype.name)
            builder.append(out)
        return _rebuild_table(
            batch,
            {
                "h": pa.array(hs, pa.int32()),
                "w": pa.array(ws, pa.int32()),
                "crs": pa.array(out_crs, pa.string()),
                "transform": pa.array(
                    out_t, batch.schema.field("transform").type
                ),
                "nodata": pa.array(out_nod, pa.float64()),
                "dtype": pa.array(out_dt, pa.string()),
            },
            builder,
        )


def reproject_stage(
    ds,
    dst_crs,
    resampling: str = "nearest",
    resolution=None,
    nodata=None,
    concurrency=(1, 4),
    batch_size: int | None = 16,
    **map_kwargs,
):
    """Per-row reproject on an actor pool.

    Default ``concurrency`` is an autoscaling ``(min, max)`` tuple, not a
    fixed pool: a fixed pool sized >= the CPU count pins every slot and
    starves its own upstream read tasks (observed deadlock at num_cpus=4).
    Callers that size pools to the machine (bench) still pass ints.
    """
    return ds.map_batches(
        WarpActor,
        fn_constructor_kwargs=dict(
            dst_crs=crs_mod.from_user_input(dst_crs).to_string(),
            resampling=resampling,
            resolution=resolution,
            nodata=nodata,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        **map_kwargs,
    )


class TiledMatchWarpActor(WarpActor):
    """Halo-correct tiled warp onto one shared grid (SURVEY.md §2.4's
    scale path + §7.4 halo correctness).

    Each (halo-expanded) tile warps the dst sub-window covering its CORE
    footprint; a dst pixel is OWNED by the tile whose core contains its
    inverse-mapped src sample (0.25-px overlap margin — overlapping
    assignments compute identical values because the halo supplies full
    kernel support, and the downstream 'first' merge is nodata-transparent,
    so seams can neither hole nor conflict).  Mosaicking the emitted dst
    tiles reproduces the whole-image warp (tested pixel-exact).
    """

    _OWN_MARGIN = 0.25

    def __init__(self, grid_spec: GridSpec, resampling: str = "nearest",
                 nodata=None):
        super().__init__(grid_spec=grid_spec, resampling=resampling,
                         nodata=nodata)
        self._grid_inv = aff.invert(grid_spec.transform)

    def _check_area_halo(self, cedges, redges, row):
        """Area kernels aggregate the dst pixel's whole src-footprint box;
        KERNEL_MARGIN only covers the same-resolution case (box <= ~2 px).
        Verify the tile's built-in halo actually covers the measured box
        extent — silently-truncated boxes would break the tiled==whole
        invariant at tile seams (round-2 review finding)."""
        ce = np.asarray(cedges)
        re_ = np.asarray(redges)
        if ce.ndim == 1:
            box_w = float(np.abs(np.diff(ce)).max(initial=0.0))
            box_h = float(np.abs(np.diff(re_)).max(initial=0.0))
        else:
            # the aggregation box is the axis-aligned HULL of the 4 cell
            # corners (non-separable mappings twist the cell), so measure
            # exactly what _resample_band_area will use — a single-axis
            # diff undercounts by up to 2x under grid convergence
            def hull_extent(e):
                lo = np.minimum.reduce(
                    [e[:-1, :-1], e[:-1, 1:], e[1:, :-1], e[1:, 1:]]
                )
                hi = np.maximum.reduce(
                    [e[:-1, :-1], e[:-1, 1:], e[1:, :-1], e[1:, 1:]]
                )
                return float((hi - lo).max(initial=0.0))

            box_w = hull_extent(ce)
            box_h = hull_extent(re_)
        # owned dst centers sit within core +- OWN_MARGIN; a (roughly
        # centered) box reaches ~box/2 + margin past the core edge
        need = int(np.ceil(max(box_w, box_h) / 2.0 + self._OWN_MARGIN))
        halo = max(
            int(row["core_roff"]),
            int(row["core_coff"]),
            int(row["h"]) - int(row["core_roff"]) - int(row["core_h"]),
            int(row["w"]) - int(row["core_coff"]) - int(row["core_w"]),
        )
        if need > max(halo, 1):
            raise ValueError(
                f"area resampling {self.resampling!r} at this downsampling "
                f"ratio needs a tile halo of >= {need} src pixels, but the "
                f"tiles were built with ~{halo}; rebuild with "
                f"tile_stage(halo={need}) (or tile_halo) before "
                "reproject_match_tiled"
            )

    def _warp_tile_row(self, pixels, row):
        from ..kernels.nodata import valid_mask
        from ..kernels.raster import Raster

        grid = self.grid
        src_crs = crs_mod.from_user_input(row["crs"])
        t_exp = tuple(row["transform"])
        core_roff, core_coff = row["core_roff"], row["core_coff"]
        core_h, core_w = row["core_h"], row["core_w"]
        t_core = aff.window_transform(t_exp, core_coff, core_roff)
        left, bottom, right, top = aff.bounds(t_core, core_w, core_h)
        gl, gb, gr, gt = crs_mod.transform_bounds(
            src_crs, grid.crs, left, bottom, right, top
        )
        c0f, r0f, wf, hf = aff.window_from_bounds(grid.transform, gl, gb, gr, gt)
        margin = warp_mod.KERNEL_MARGIN[self.resampling] + 1
        H, W = grid.shape
        dr0 = max(int(np.floor(r0f)) - margin, 0)
        dc0 = max(int(np.floor(c0f)) - margin, 0)
        dr1 = min(int(np.ceil(r0f + hf)) + margin, H)
        dc1 = min(int(np.ceil(c0f + wf)) + margin, W)
        if dr0 >= dr1 or dc0 >= dc1:
            return None
        dh, dw = dr1 - dr0, dc1 - dc0
        dst_t = aff.window_transform(grid.transform, dc0, dr0)
        from .schema import decode_nodata

        src_nodata = decode_nodata(float(row["nodata"]), row["dtype"])
        src = Raster(pixels, t_exp, src_crs, src_nodata)
        fcol, frow = self._fractional_coords(dst_t, (dh, dw), grid.crs, src)
        # ownership: src sample (dst pixel CENTER preimage, for every kernel
        # family) inside this tile's CORE (+margin)
        own = (
            (fcol >= core_coff - self._OWN_MARGIN)
            & (fcol < core_coff + core_w + self._OWN_MARGIN)
            & (frow >= core_roff - self._OWN_MARGIN)
            & (frow < core_roff + core_h + self._OWN_MARGIN)
        )
        own = np.broadcast_to(own, (dh, dw))
        if self.resampling in warp_mod.AREA_METHODS:
            ce, re_ = self._fractional_edges(dst_t, (dh, dw), grid.crs, src)
            self._check_area_halo(ce, re_, row)
            coords = ("area", ce, re_)
        else:
            coords = ("point", fcol, frow)
        out_dtype = src.pixels.dtype
        dst_nodata = self.nodata
        if dst_nodata is None:
            dst_nodata = (
                src.nodata if src.nodata is not None
                else warp_mod.default_nodata(out_dtype)
            )
        bands = src.count
        out = np.empty((bands, dh, dw), dtype=out_dtype)
        fill = float(dst_nodata) if dst_nodata == dst_nodata else np.nan
        for b in range(bands):
            vm = valid_mask(src.pixels[b], src.nodata)
            vals, ok = self._resample(src.pixels[b], vm, coords)
            out[b] = _finalize_band(vals, ok & own, out_dtype, fill)
        return out, dst_t, float(dst_nodata)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .schema import BinaryBuilder, pixel_views

        # metadata-only row dicts: dropping pixels first keeps the payload
        # out of Python (pixel_views supplies the zero-copy views below)
        rows = batch.drop_columns(["pixels"]).to_pylist()
        keep_idx, hs, ws, out_t, out_nod, out_dt, out_crs = (
            [], [], [], [], [], [], []
        )
        builder = BinaryBuilder()
        for i, pixels in enumerate(pixel_views(batch)):
            res = self._warp_tile_row(pixels, rows[i])
            if res is None:
                continue
            out, dst_t, dst_nod = res
            keep_idx.append(i)
            hs.append(out.shape[1])
            ws.append(out.shape[2])
            out_t.append([float(v) for v in dst_t])
            out_nod.append(dst_nod)
            out_dt.append(out.dtype.name)
            out_crs.append(self.grid.crs.to_string())
            builder.append(out)
        return _rebuild_table(
            batch,
            {
                "h": pa.array(hs, pa.int32()),
                "w": pa.array(ws, pa.int32()),
                "crs": pa.array(out_crs, pa.string()),
                "transform": pa.array(
                    out_t, batch.schema.field("transform").type
                ),
                "nodata": pa.array(out_nod, pa.float64()),
                "dtype": pa.array(out_dt, pa.string()),
            },
            builder,
            keep_idx=keep_idx,
        )


def reproject_match_tiled(
    tiles_ds,
    grid_spec: GridSpec,
    resampling: str = "nearest",
    nodata=None,
    concurrency=(1, 4),
    batch_size: int | None = None,
    **map_kwargs,
):
    """Halo-correct tiled warp onto a shared grid; requires tiles built with
    ``tile_stage(halo >= KERNEL_MARGIN[resampling])``."""
    return tiles_ds.map_batches(
        TiledMatchWarpActor,
        fn_constructor_kwargs=dict(
            grid_spec=grid_spec, resampling=resampling, nodata=nodata
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        **map_kwargs,
    )


def reproject_match_stage(
    ds,
    grid_spec: GridSpec,
    resampling: str = "nearest",
    nodata=None,
    concurrency=(1, 4),
    batch_size: int | None = 16,
    **map_kwargs,
):
    """Warp every row onto one broadcast grid spec."""
    return ds.map_batches(
        WarpActor,
        fn_constructor_kwargs=dict(
            grid_spec=grid_spec, resampling=resampling, nodata=nodata
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
        **map_kwargs,
    )
