"""Single-raster operator semantics (the per-row engine core).

A ``Raster`` is the engine's row-level value: ``pixels`` (bands, h, w),
``transform`` (6-tuple), ``crs`` (kernels.crs.CRS) and ``nodata``.  Every
rioxarray accessor op that acts on one raster is implemented here as a pure
function so that (a) Ray stages call them per-row inside ``map_batches`` and
(b) tests can use the same code single-process as the distributed oracle
(SURVEY.md §5 strategy (c): distribution invariance).

Citations map each op to the reference implementation it mirrors.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

from . import affine as aff
from . import crs as crs_mod
from . import geometry as geom_mod
from . import interpolate as interp_mod
from . import warp as warp_mod
from .nodata import valid_mask


class RioXarrayRayError(RuntimeError):
    pass


class NoDataInBounds(RioXarrayRayError):
    """No data found in bounds (raster_array.py:751-760)."""


class OneDimensionalRaster(RioXarrayRayError):
    """Only 1-D raster found (clip_box contract, raster_array.py:744-749)."""


class MissingCRS(RioXarrayRayError):
    """CRS not set (reproject contract, raster_array.py:262-268)."""


class MissingSpatialDimensionError(RioXarrayRayError):
    """Variable lacks the spatial columns (per-variable Dataset loop
    contract, /root/reference/rioxarray/raster_dataset.py:100-142 — raised
    unless the ``skip_missing_spatial_dims`` option is set)."""


@dataclass(frozen=True)
class Raster:
    pixels: np.ndarray  # (bands, h, w)
    transform: aff.Affine
    crs: crs_mod.CRS | None
    nodata: float | None = None

    def __post_init__(self):
        if self.pixels.ndim == 2:
            object.__setattr__(self, "pixels", self.pixels[None])
        if self.pixels.ndim != 3:
            raise ValueError("pixels must be (bands, h, w)")

    # -- accessors (rioxarray.py:609-852) --------------------------------
    @property
    def count(self) -> int:
        return self.pixels.shape[0]

    @property
    def height(self) -> int:
        return self.pixels.shape[1]

    @property
    def width(self) -> int:
        return self.pixels.shape[2]

    @property
    def shape(self) -> tuple[int, int]:
        return self.pixels.shape[1], self.pixels.shape[2]

    def bounds(self) -> tuple[float, float, float, float]:
        return aff.bounds(self.transform, self.width, self.height)

    def resolution(self) -> tuple[float, float]:
        return aff.resolution(self.transform)

    def coords(self):
        return aff.affine_to_coords(self.transform, self.width, self.height)

    def valid_mask(self) -> np.ndarray:
        return valid_mask(self.pixels, self.nodata)

    def _require_crs(self):
        if self.crs is None:
            raise MissingCRS(
                "CRS not found. Please set the CRS with 'write_crs()'."
            )

    # -- windows (rioxarray.py:854-949) ----------------------------------
    def isel_window(self, row_off: int, col_off: int, height: int, width: int):
        """Integer window slice + shifted transform
        (/root/reference/rioxarray/rioxarray.py:854-904)."""
        r0, c0 = int(row_off), int(col_off)
        sub = self.pixels[:, r0 : r0 + int(height), c0 : c0 + int(width)]
        return replace(
            self,
            pixels=sub,
            transform=aff.window_transform(self.transform, c0, r0),
        )

    def slice_xy(self, minx: float, miny: float, maxx: float, maxy: float):
        """Coordinate-space slice honoring descending y
        (/root/reference/rioxarray/rioxarray.py:906-949)."""
        c0, r0, w, h = aff.window_from_bounds(self.transform, minx, miny, maxx, maxy)
        r1 = int(np.ceil(r0 + h - 1e-9))
        c1 = int(np.ceil(c0 + w - 1e-9))
        # clamp the origin FIRST so a bbox extending past the top/left edge
        # shrinks the window instead of shifting it (the end stays fixed)
        ri = max(int(np.floor(r0 + 1e-9)), 0)
        ci = max(int(np.floor(c0 + 1e-9)), 0)
        return self.isel_window(ri, ci, r1 - ri, c1 - ci)

    # -- clip_box (raster_array.py:628-761) ------------------------------
    def clip_box(
        self,
        minx: float,
        miny: float,
        maxx: float,
        maxy: float,
        auto_expand: bool = False,
        crs=None,
        allow_one_dimensional_raster: bool = False,
    ):
        if crs is not None:
            box_crs = crs_mod.from_user_input(crs)
            self._require_crs()
            if box_crs != self.crs:
                minx, miny, maxx, maxy = crs_mod.transform_bounds(
                    box_crs, self.crs, minx, miny, maxx, maxy
                )
                # "Transformed bounds crossed the antimeridian" contract
                # (raster_array.py:694-704); the envelope-based
                # transform_bounds signals the wrap as a >180-degree span
                if self.crs.is_geographic and (maxx - minx) > 180.0:
                    raise RioXarrayRayError(
                        "Transformed bounds crossed the antimeridian. "
                        "Please transform your bounds manually and clip "
                        "using the bounding box(es) desired."
                    )
        resx, resy = aff.signed_resolution(self.transform)
        attempts = 0
        while True:
            clipped = self.slice_xy(minx, miny, maxx, maxy)
            if clipped.width >= 1 and clipped.height >= 1:
                if (clipped.width == 1 or clipped.height == 1) and not (
                    allow_one_dimensional_raster or auto_expand
                ):
                    raise OneDimensionalRaster(
                        "At least one of the clipped raster x,y coordinates "
                        "has only one point. Set allow_one_dimensional_raster"
                        "=True to disable this error."
                    )
                if not (clipped.width == 1 or clipped.height == 1):
                    break
                if allow_one_dimensional_raster:
                    break
            if not auto_expand or attempts >= 3:
                if clipped.width < 1 or clipped.height < 1:
                    raise NoDataInBounds("No data found in bounds.")
                break
            # half-pixel growth retry loop (raster_array.py:733-742)
            minx -= abs(resx) / 2.0
            maxx += abs(resx) / 2.0
            miny -= abs(resy) / 2.0
            maxy += abs(resy) / 2.0
            attempts += 1
        if not clipped.valid_mask().any() and self.nodata is not None:
            raise NoDataInBounds("No data found in bounds.")
        return clipped

    # -- pad (raster_array.py:493-626) -----------------------------------
    def pad_xy(self, minx: float, miny: float, maxx: float, maxy: float, constant_values=None):
        """Extend the grid to cover the given bounds, preserving pixel phase
        (/root/reference/rioxarray/raster_array.py:493-571)."""
        left, bottom, right, top = self.bounds()
        resx, resy = aff.signed_resolution(self.transform)
        if resy >= 0 or aff.has_rotation(self.transform):
            raise RioXarrayRayError("pad_xy requires a north-up rectilinear grid")
        pad_left = max(int(np.ceil((left - minx) / abs(resx) - 1e-9)), 0)
        pad_right = max(int(np.ceil((maxx - right) / abs(resx) - 1e-9)), 0)
        pad_top = max(int(np.ceil((maxy - top) / abs(resy) - 1e-9)), 0)
        pad_bottom = max(int(np.ceil((bottom - miny) / abs(resy) - 1e-9)), 0)
        if constant_values is None:
            fill = self.nodata if self.nodata is not None else np.nan
        else:
            fill = constant_values
        if self.pixels.dtype.kind in "iu" and fill != fill:
            raise RioXarrayRayError(
                "pad fill NaN requires a float dtype; set a nodata value"
            )
        padded = np.pad(
            self.pixels,
            ((0, 0), (pad_top, pad_bottom), (pad_left, pad_right)),
            mode="constant",
            constant_values=np.array(fill).astype(self.pixels.dtype)
            if fill == fill
            else np.nan,
        )
        new_transform = aff.window_transform(self.transform, -pad_left, -pad_top)
        return replace(self, pixels=padded, transform=new_transform)

    def pad_box(self, minx: float, miny: float, maxx: float, maxy: float, constant_values=None):
        """pad_xy with the half-pixel inset (raster_array.py:573-626)."""
        resx, resy = aff.signed_resolution(self.transform)
        return self.pad_xy(
            minx + abs(resx) / 2.0,
            miny + abs(resy) / 2.0,
            maxx - abs(resx) / 2.0,
            maxy - abs(resy) / 2.0,
            constant_values=constant_values,
        )

    # -- clip by geometry (raster_array.py:763-861) ----------------------
    def clip(
        self,
        geometries,
        crs=None,
        all_touched: bool = False,
        drop: bool = True,
        invert: bool = False,
        from_disk: bool = False,  # accepted for API parity; one path here
    ):
        self._require_crs()
        geoms = [geom_mod.parse_geometry(g) for g in geometries]
        if crs is not None:
            gcrs = crs_mod.from_user_input(crs)
            if gcrs != self.crs:
                geoms = [
                    _reproject_geom(g, gcrs, self.crs) for g in geoms
                ]
        keep = geom_mod.geometry_mask(
            geoms,
            out_shape=self.shape,
            transform=self.transform,
            all_touched=all_touched,
            invert=not invert,
        )
        if not keep.any():
            raise NoDataInBounds(
                "No data found in bounds. Data variable: (clip)"
            )
        fill = self.nodata if self.nodata is not None else 0
        out = np.where(keep[None, :, :], self.pixels, np.array(fill).astype(self.pixels.dtype))
        clipped = replace(self, pixels=out.astype(self.pixels.dtype))
        if drop:
            win = geom_mod.mask_data_window(keep)
            clipped = clipped.isel_window(*win)
        return clipped

    # -- reproject (raster_array.py:198-427) -----------------------------
    def reproject(
        self,
        dst_crs,
        resolution=None,
        shape: tuple[int, int] | None = None,
        transform: aff.Affine | None = None,
        resampling: str = "nearest",
        nodata=None,
    ):
        self._require_crs()
        if resolution is not None and (shape is not None or transform is not None):
            raise RioXarrayRayError(
                "resolution cannot be used with shape or transform. "
                "(raster_array.py:260-261)"
            )
        dst_crs = crs_mod.from_user_input(dst_crs)
        left, bottom, right, top = self.bounds()
        if transform is not None and shape is None:
            # transform without shape: dst shape = src shape (reference
            # semantics, raster_array.py:397-402)
            shape = (self.height, self.width)
        if transform is not None and shape is not None:
            dst_transform, dw, dh = tuple(transform), shape[1], shape[0]
        else:
            dst_transform, dw, dh = warp_mod.calculate_default_transform(
                self.crs,
                dst_crs,
                self.width,
                self.height,
                left,
                bottom,
                right,
                top,
                resolution=resolution,
                dst_width=shape[1] if shape else None,
                dst_height=shape[0] if shape else None,
            )
            if transform is not None:
                dst_transform = tuple(transform)
        dst_pixels, dst_nodata = warp_mod.reproject_array(
            self.pixels,
            self.transform,
            self.crs,
            dst_transform,
            (dh, dw),
            dst_crs,
            resampling=resampling,
            src_nodata=self.nodata,
            dst_nodata=nodata,
        )
        return Raster(dst_pixels, dst_transform, dst_crs, dst_nodata)

    def reproject_match(self, match: "Raster", resampling: str = "nearest", nodata=None):
        """Align exactly onto another raster's grid
        (/root/reference/rioxarray/raster_array.py:429-491)."""
        if match.crs is None:
            raise MissingCRS("match raster has no CRS")
        return self.reproject(
            match.crs,
            transform=match.transform,
            shape=match.shape,
            resampling=resampling,
            nodata=nodata,
        )

    # -- interpolate_na (raster_array.py:863-966) ------------------------
    def interpolate_na(self, method: str = "nearest"):
        return replace(
            self, pixels=interp_mod.interpolate_na(self.pixels, self.nodata, method)
        )


def _reproject_geom(geom, src_crs, dst_crs):
    g = dict(geom)
    if g["type"] == "Polygon":
        rings = crs_mod.transform_geom(
            src_crs, dst_crs, [np.asarray(r) for r in g["coordinates"]]
        )
        g["coordinates"] = [r.tolist() for r in rings]
    elif g["type"] == "MultiPolygon":
        new_polys = []
        for poly in g["coordinates"]:
            rings = crs_mod.transform_geom(
                src_crs, dst_crs, [np.asarray(r) for r in poly]
            )
            new_polys.append([r.tolist() for r in rings])
        g["coordinates"] = new_polys
    elif g["type"] == "Point":
        x, y = crs_mod.transform_points(
            src_crs, dst_crs, [g["coordinates"][0]], [g["coordinates"][1]]
        )
        g["coordinates"] = [float(x[0]), float(y[0])]
    else:
        raise ValueError(f"unsupported geometry type {g['type']}")
    return g
