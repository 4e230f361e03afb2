"""Ground control points & rational polynomial coefficients.

Mirrors the GCP <-> GeoJSON conversion of the reference
(/root/reference/rioxarray/_spatial_utils.py:271-304 and
rioxarray.py:982-1064), plus from-scratch georeferencing math the reference
delegates to GDAL:

- polynomial GCP transformer (GDAL GCPTransformer semantics: least-squares
  monomial fit, auto order by point count) and ``warp_from_gcps``;
- RPC00B rational-polynomial evaluation (the standard NITF/GDAL 20-term
  cubic model, rioxarray.py:1066-1134 stores these as attrs) and
  ``warp_from_rpcs`` — RPCs map ground -> image, which is exactly the
  inverse mapping an inverse-mapped warp needs, so no iteration required.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass

import numpy as np


@dataclass
class GCP:
    row: float
    col: float
    x: float
    y: float
    z: float = 0.0
    id: str | None = None
    info: str | None = None


def gcps_to_geojson(gcps: list[GCP]) -> str:
    features = []
    for g in gcps:
        features.append(
            {
                "type": "Feature",
                "properties": {
                    "id": g.id,
                    "info": g.info,
                    "row": g.row,
                    "col": g.col,
                },
                "geometry": {
                    "type": "Point",
                    "coordinates": [g.x, g.y, g.z],
                },
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": features})


def geojson_to_gcps(payload: str | dict) -> list[GCP]:
    data = json.loads(payload) if isinstance(payload, str) else payload
    out = []
    for f in data["features"]:
        props = f["properties"]
        x, y, *rest = f["geometry"]["coordinates"]
        out.append(
            GCP(
                row=props["row"],
                col=props["col"],
                x=x,
                y=y,
                z=rest[0] if rest else 0.0,
                id=props.get("id"),
                info=props.get("info"),
            )
        )
    return out


def rpcs_to_json(rpcs: dict) -> str:
    """Rational polynomial coefficients round-trip (the reference stores
    RPCs as a JSON attr, rioxarray.py:1066-1134).  Stored verbatim; RPC
    warping is flag-gated with GCP warping."""
    return json.dumps(rpcs, sort_keys=True)


def json_to_rpcs(payload: str) -> dict:
    return json.loads(payload)


# --------------------------------------------------------------- polynomial
def _monomials(x, y, order: int) -> np.ndarray:
    """Design matrix columns x^i y^j for i+j <= order (GDAL GCP poly basis)."""
    cols = [np.ones_like(x)]
    for total in range(1, order + 1):
        for j in range(total + 1):
            i = total - j
            cols.append((x**i) * (y**j))
    return np.stack(cols, axis=-1)


def auto_gcp_order(n_points: int) -> int:
    """GDAL rule: the largest order (<= 3) with enough GCPs to determine it
    (1 needs 3, 2 needs 6, 3 needs 10)."""
    if n_points >= 10:
        return 3
    if n_points >= 6:
        return 2
    if n_points >= 3:
        return 1
    raise ValueError(f"need >= 3 GCPs for a polynomial fit, got {n_points}")


class GCPTransformer:
    """Least-squares polynomial transformer between pixel (col, row) and map
    (x, y) coordinates, fitted both ways (GDAL GCPTransformer semantics)."""

    def __init__(self, gcps: list[GCP], order: int | None = None):
        if order is None:
            order = auto_gcp_order(len(gcps))
        need = (order + 1) * (order + 2) // 2
        if len(gcps) < need:
            raise ValueError(
                f"order-{order} polynomial needs >= {need} GCPs, got {len(gcps)}"
            )
        self.order = order
        col = np.asarray([g.col for g in gcps], np.float64)
        row = np.asarray([g.row for g in gcps], np.float64)
        x = np.asarray([g.x for g in gcps], np.float64)
        y = np.asarray([g.y for g in gcps], np.float64)
        Af = _monomials(col, row, order)
        self._fx, *_ = np.linalg.lstsq(Af, x, rcond=None)
        self._fy, *_ = np.linalg.lstsq(Af, y, rcond=None)
        Ai = _monomials(x, y, order)
        self._ic, *_ = np.linalg.lstsq(Ai, col, rcond=None)
        self._ir, *_ = np.linalg.lstsq(Ai, row, rcond=None)

    def forward(self, col, row):
        """pixel (col, row) -> map (x, y)."""
        A = _monomials(
            np.asarray(col, np.float64), np.asarray(row, np.float64), self.order
        )
        return A @ self._fx, A @ self._fy

    def inverse(self, x, y):
        """map (x, y) -> pixel (col, row)."""
        A = _monomials(
            np.asarray(x, np.float64), np.asarray(y, np.float64), self.order
        )
        return A @ self._ic, A @ self._ir


def warp_from_gcps(
    pixels: np.ndarray,
    gcps: list[GCP],
    order: int | None = None,
    resampling: str = "nearest",
    src_nodata=None,
    dst_nodata=None,
    resolution=None,
    dst_shape: tuple[int, int] | None = None,
):
    """Warp a GCP-georeferenced array onto a regular north-up grid in the
    GCP coordinate space.  Returns (out_array, dst_transform, dst_nodata).

    Inverse mapping: dst pixel centers -> inverse polynomial -> fractional
    src pixel coords -> the shared resample kernels.  The dst grid envelope
    comes from the forward polynomial over the src pixel-corner outline;
    default resolution preserves the src pixel count
    (calculate_default_transform semantics).
    """
    from . import affine as aff
    from .nodata import default_nodata, valid_mask
    from .warp import _resample_band, finalize_band, resolve_resampling

    squeeze = pixels.ndim == 2
    if squeeze:
        pixels = pixels[None]
    method = resolve_resampling(resampling)
    tr = GCPTransformer(gcps, order=order)
    _, h, w = pixels.shape
    # envelope of the warped outline (all four src edges, densified)
    edge_c = np.concatenate(
        [np.linspace(0, w, 41), np.full(41, float(w)),
         np.linspace(w, 0, 41), np.zeros(41)]
    )
    edge_r = np.concatenate(
        [np.zeros(41), np.linspace(0, h, 41),
         np.full(41, float(h)), np.linspace(h, 0, 41)]
    )
    ex, ey = tr.forward(edge_c, edge_r)
    left, right = float(ex.min()), float(ex.max())
    bottom, top = float(ey.min()), float(ey.max())
    if dst_shape is not None:
        dh, dw = int(dst_shape[0]), int(dst_shape[1])
        resx = (right - left) / dw
        resy = (top - bottom) / dh
    else:
        if resolution is None:
            area = (right - left) * (top - bottom)
            res = float(np.sqrt(max(area, 0.0) / max(w * h, 1)))
            resx = resy = res if res > 0 else 1.0
        elif np.isscalar(resolution):
            resx = resy = float(resolution)
        else:
            resx, resy = float(resolution[0]), float(resolution[1])
        dw = max(int(round((right - left) / resx)), 1)
        dh = max(int(round((top - bottom) / resy)), 1)
    dst_transform = aff.compose(
        aff.translation(left, top), aff.scale(resx, -resy)
    )
    cols = np.arange(dw, dtype=np.float64) + 0.5
    rows = np.arange(dh, dtype=np.float64) + 0.5
    cg, rg = np.meshgrid(cols, rows)
    dx, dy = aff.apply(dst_transform, cg, rg)
    fcol, frow = tr.inverse(dx.ravel(), dy.ravel())
    fcol = fcol.reshape(dh, dw)
    frow = frow.reshape(dh, dw)
    out_dtype = pixels.dtype
    if dst_nodata is None:
        dst_nodata = (
            src_nodata if src_nodata is not None else default_nodata(out_dtype)
        )
    out = np.empty((pixels.shape[0], dh, dw), dtype=out_dtype)
    fill = float(dst_nodata) if dst_nodata == dst_nodata else np.nan
    for b in range(pixels.shape[0]):
        vm = valid_mask(pixels[b], src_nodata)
        vals, ok = _resample_band(pixels[b], vm, fcol, frow, method)
        out[b] = finalize_band(vals, ok, out_dtype, fill)
    return (out[0] if squeeze else out), dst_transform, dst_nodata


# --------------------------------------------------------------- RPC00B
# NITF RPC00B / GDAL RPC term order over normalized (P=lat, L=lon, H=height)
def _rpc_terms(P, L, H) -> np.ndarray:
    one = np.ones_like(P)
    return np.stack(
        [
            one, L, P, H, L * P, L * H, P * H, L * L, P * P, H * H,
            P * L * H, L**3, L * P * P, L * H * H, L * L * P, P**3,
            P * H * H, L * L * H, P * P * H, H**3,
        ],
        axis=-1,
    )


def rpc_pixel_coords(rpcs: dict, lon, lat, height=0.0):
    """Evaluate the RPC model: ground (lon, lat, h) -> image (col, row).

    Standard 20-coefficient rational cubics with offset/scale
    normalization (keys follow the GDAL RPC metadata domain)."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    H = (np.asarray(height, np.float64) - rpcs["HEIGHT_OFF"]) / rpcs[
        "HEIGHT_SCALE"
    ]
    P = (lat - rpcs["LAT_OFF"]) / rpcs["LAT_SCALE"]
    L = (lon - rpcs["LONG_OFF"]) / rpcs["LONG_SCALE"]
    H = np.broadcast_to(H, P.shape) if np.shape(H) != P.shape else H
    T = _rpc_terms(P, L, H)
    ln = T @ np.asarray(rpcs["LINE_NUM_COEFF"], np.float64)
    ld = T @ np.asarray(rpcs["LINE_DEN_COEFF"], np.float64)
    sn = T @ np.asarray(rpcs["SAMP_NUM_COEFF"], np.float64)
    sd = T @ np.asarray(rpcs["SAMP_DEN_COEFF"], np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        row = (ln / ld) * rpcs["LINE_SCALE"] + rpcs["LINE_OFF"]
        col = (sn / sd) * rpcs["SAMP_SCALE"] + rpcs["SAMP_OFF"]
    return col, row


def warp_from_rpcs(
    pixels: np.ndarray,
    rpcs: dict,
    bounds: tuple[float, float, float, float],
    dst_shape: tuple[int, int],
    resampling: str = "nearest",
    height: float = 0.0,
    src_nodata=None,
    dst_nodata=None,
):
    """Warp an RPC-georeferenced array onto a lon/lat grid over ``bounds`` =
    (west, south, east, north).  Returns (out, dst_transform, dst_nodata).

    RPCs give image coords from ground coords directly, so the inverse-
    mapping warp needs no iteration: evaluate the model at every dst pixel
    center (at the given ellipsoid ``height``) and gather."""
    from . import affine as aff
    from .nodata import default_nodata, valid_mask
    from .warp import _resample_band, finalize_band, resolve_resampling

    squeeze = pixels.ndim == 2
    if squeeze:
        pixels = pixels[None]
    method = resolve_resampling(resampling)
    west, south, east, north = (float(v) for v in bounds)
    dh, dw = int(dst_shape[0]), int(dst_shape[1])
    resx = (east - west) / dw
    resy = (north - south) / dh
    dst_transform = aff.compose(
        aff.translation(west, north), aff.scale(resx, -resy)
    )
    cols = np.arange(dw, dtype=np.float64) + 0.5
    rows = np.arange(dh, dtype=np.float64) + 0.5
    cg, rg = np.meshgrid(cols, rows)
    lon, lat = aff.apply(dst_transform, cg, rg)
    fcol, frow = rpc_pixel_coords(rpcs, lon.ravel(), lat.ravel(), height)
    # RPC image coords address pixel CENTERS; the kernel convention is
    # pixel-edge fractional coords (center = idx + 0.5)
    fcol = fcol.reshape(dh, dw) + 0.5
    frow = frow.reshape(dh, dw) + 0.5
    out_dtype = pixels.dtype
    if dst_nodata is None:
        dst_nodata = (
            src_nodata if src_nodata is not None else default_nodata(out_dtype)
        )
    out = np.empty((pixels.shape[0], dh, dw), dtype=out_dtype)
    fill = float(dst_nodata) if dst_nodata == dst_nodata else np.nan
    for b in range(pixels.shape[0]):
        vm = valid_mask(pixels[b], src_nodata)
        vals, ok = _resample_band(pixels[b], vm, fcol, frow, method)
        out[b] = finalize_band(vals, ok, out_dtype, fill)
    return (out[0] if squeeze else out), dst_transform, dst_nodata
