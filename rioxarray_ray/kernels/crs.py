"""Coordinate reference systems without pyproj/GDAL.

The engine supports an explicit CRS whitelist (SURVEY.md §7.4) sufficient to
cover the reference's test scenarios (geographic WGS84, Web Mercator, UTM
zones, MODIS sinusoidal).  Forward/inverse math follows the standard public
map-projection formulas (Snyder, "Map Projections — A Working Manual", USGS
1987: Transverse Mercator eqs 8-9..8-25, Mercator eqs 7-1..7-5, Sinusoidal
eqs 30-1..30-2), fully numpy-vectorized.

Lenient parsing mirrors rioxarray.crs.crs_from_user_input
(/root/reference/rioxarray/crs.py:12-45): accepts EPSG ints, "EPSG:n",
proj4-ish strings, minimal WKT with an EPSG authority code, or a CRS object.
``estimate_utm_crs`` reimplements the closed-form UTM zone pick
(/root/reference/rioxarray/rioxarray.py:317-357).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_EP2 = _E2 / (1.0 - _E2)
_K0 = 0.9996  # UTM scale factor
_B = _A * (1.0 - _F)  # WGS84 semi-minor axis
_MERC_R = 6378137.0  # spherical web mercator radius
_SINU_R = 6371007.181  # MODIS sinusoidal sphere radius

_D2R = math.pi / 180.0
_R2D = 180.0 / math.pi


class CRSError(ValueError):
    pass


_E = math.sqrt(_E2)


def _m_factor(phi):
    """Snyder eq 14-15: m = cos(phi)/sqrt(1 - e^2 sin^2 phi)."""
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - _E2 * s * s)


def _wrap_lon_deg(lon):
    """Wrap longitudes into [-180, 180).  The theta-based inverses (conic
    and polar-stereographic) compute lon = theta + lon_0, which crosses the
    antimeridian for valid in-domain points whenever lon_0 != 0 (e.g.
    EPSG:3413's lon_0=-45 maps lon=136E to -224) — correct mod 360 but
    outside the range every downstream consumer (bounds, clip, PIP)
    assumes.  Hypothesis found this; test_property_roundtrips pins it."""
    return (np.asarray(lon, np.float64) + 180.0) % 360.0 - 180.0


def _t_factor(phi):
    """Snyder eq 15-9: t = tan(pi/4 - phi/2) / ((1-e sin)/(1+e sin))^(e/2)."""
    s = np.sin(phi)
    return np.tan(math.pi / 4.0 - phi / 2.0) / (
        ((1.0 - _E * s) / (1.0 + _E * s)) ** (_E / 2.0)
    )


def _q_factor(phi):
    """Snyder eq 3-12: authalic q."""
    s = np.sin(phi)
    return (1.0 - _E2) * (
        s / (1.0 - _E2 * s * s)
        - (1.0 / (2.0 * _E)) * np.log((1.0 - _E * s) / (1.0 + _E * s))
    )


def _meridional_arc(phi, a=None, e2=None):
    """Snyder eq 3-21: meridional arc length M from the equator to phi."""
    a = _A if a is None else a
    e2 = _E2 if e2 is None else e2
    e4, e6 = e2**2, e2**3
    return a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )


# ---- exact transverse Mercator (Engsager & Poder 2007) -------------------
#
# The algorithm PROJ maps ``+proj=utm`` / EPSG method 9807 onto since v6
# ("etmerc"): Gauss-Schreiber -> Gauss-Krueger via 6th-order trig series in
# the third flattening n, accurate to nanometers across a whole zone.  The
# Snyder 8-term series this replaces disagreed with PROJ by ~0.05 m, enough
# to flip ~0.2% of nearest-resampled pixels against the reference's
# GDAL-produced golden grids (test_data/compare/MODIS_ARRAY_UTM*.nc).

def _etmerc_setup(k0: float, phi0: float) -> dict:
    """Precompute etmerc series coefficients for the WGS84 ellipsoid."""
    key = (k0, phi0)
    st = _ETMERC_CACHE.get(key)
    if st is not None:
        return st
    f = 1.0 - math.sqrt(1.0 - _E2)
    n = f / (2.0 - f)  # third flattening
    # geodetic -> Gaussian (cbg) and Gaussian -> geodetic (cgb) latitudes
    cgb = np.empty(6)
    cbg = np.empty(6)
    cgb[0] = n * (2 + n * (-2 / 3.0 + n * (-2 + n * (116 / 45.0 + n * (
        26 / 45.0 + n * (-2854 / 675.0))))))
    cbg[0] = n * (-2 + n * (2 / 3.0 + n * (4 / 3.0 + n * (-82 / 45.0 + n * (
        32 / 45.0 + n * (4642 / 4725.0))))))
    p = n * n
    cgb[1] = p * (7 / 3.0 + n * (-8 / 5.0 + n * (-227 / 45.0 + n * (
        2704 / 315.0 + n * (2323 / 945.0)))))
    cbg[1] = p * (5 / 3.0 + n * (-16 / 15.0 + n * (-13 / 9.0 + n * (
        904 / 315.0 + n * (-1522 / 945.0)))))
    p *= n
    cgb[2] = p * (56 / 15.0 + n * (-136 / 35.0 + n * (-1262 / 105.0 + n * (
        73814 / 2835.0))))
    cbg[2] = p * (-26 / 15.0 + n * (34 / 21.0 + n * (8 / 5.0 + n * (
        -12686 / 2835.0))))
    p *= n
    cgb[3] = p * (4279 / 630.0 + n * (-332 / 35.0 + n * (-399572 / 14175.0)))
    cbg[3] = p * (1237 / 630.0 + n * (-12 / 5.0 + n * (-24832 / 14175.0)))
    p *= n
    cgb[4] = p * (4174 / 315.0 + n * (-144838 / 6237.0))
    cbg[4] = p * (-734 / 315.0 + n * (109598 / 31185.0))
    p *= n
    cgb[5] = p * (601676 / 22275.0)
    cbg[5] = p * (444337 / 155925.0)
    # normalized meridian quadrant
    p = n * n
    qn = k0 / (1 + n) * (1 + p * (1 / 4.0 + p * (1 / 64.0 + p / 256.0)))
    # Gauss-Schreiber <-> Gauss-Krueger series
    utg = np.empty(6)
    gtu = np.empty(6)
    utg[0] = n * (-0.5 + n * (2 / 3.0 + n * (-37 / 96.0 + n * (1 / 360.0
        + n * (81 / 512.0 + n * (-96199 / 604800.0))))))
    gtu[0] = n * (0.5 + n * (-2 / 3.0 + n * (5 / 16.0 + n * (41 / 180.0
        + n * (-127 / 288.0 + n * (7891 / 37800.0))))))
    p = n * n
    utg[1] = p * (-1 / 48.0 + n * (-1 / 15.0 + n * (437 / 1440.0 + n * (
        -46 / 105.0 + n * (1118711 / 3870720.0)))))
    gtu[1] = p * (13 / 48.0 + n * (-3 / 5.0 + n * (557 / 1440.0 + n * (
        281 / 630.0 + n * (-1983433 / 1935360.0)))))
    p *= n
    utg[2] = p * (-17 / 480.0 + n * (37 / 840.0 + n * (209 / 4480.0 + n * (
        -5569 / 90720.0))))
    gtu[2] = p * (61 / 240.0 + n * (-103 / 140.0 + n * (15061 / 26880.0
        + n * (167603 / 181440.0))))
    p *= n
    utg[3] = p * (-4397 / 161280.0 + n * (11 / 504.0 + n * (
        830251 / 7257600.0)))
    gtu[3] = p * (49561 / 161280.0 + n * (-179 / 168.0 + n * (
        6601661 / 7257600.0)))
    p *= n
    utg[4] = p * (-4583 / 161280.0 + n * (108847 / 3991680.0))
    gtu[4] = p * (34729 / 80640.0 + n * (-3418889 / 1995840.0))
    p *= n
    utg[5] = p * (-20648693 / 638668800.0)
    gtu[5] = p * (212378941 / 319334400.0)
    # origin-latitude offset
    z = float(_gatg(cbg, np.float64(phi0)))
    zb = -qn * (z + float(_clen(gtu, np.float64(2.0 * z))))
    st = {"cgb": cgb, "cbg": cbg, "utg": utg, "gtu": gtu, "qn": qn, "zb": zb}
    _ETMERC_CACHE[key] = st
    return st


_ETMERC_CACHE: dict = {}


def _gatg(p: np.ndarray, b):
    """b + sum p[k] * sin(2*(k+1)*b) via Clenshaw summation."""
    cos_2b = np.cos(2.0 * b)
    sin_2b = np.sin(2.0 * b)
    two_cos = 2.0 * cos_2b
    h1 = np.zeros_like(cos_2b) + p[5]
    h2 = np.zeros_like(cos_2b)
    for k in range(4, -1, -1):
        h = two_cos * h1 - h2 + p[k]
        h2 = h1
        h1 = h
    return b + h1 * sin_2b


def _clen(p: np.ndarray, arg):
    """sum p[k] * sin((k+1)*arg) via Clenshaw summation."""
    cos_a = np.cos(arg)
    sin_a = np.sin(arg)
    two_cos = 2.0 * cos_a
    h1 = np.zeros_like(cos_a) + p[5]
    h2 = np.zeros_like(cos_a)
    for k in range(4, -1, -1):
        h = two_cos * h1 - h2 + p[k]
        h2 = h1
        h1 = h
    return h1 * sin_a


def _clen_s(a: np.ndarray, arg_r, arg_i):
    """Complex Clenshaw: Re/Im of sum a[k] * sin((k+1)*(arg_r + i*arg_i))."""
    sin_r, cos_r = np.sin(arg_r), np.cos(arg_r)
    sinh_i, cosh_i = np.sinh(arg_i), np.cosh(arg_i)
    r = 2.0 * cos_r * cosh_i
    im = -2.0 * sin_r * sinh_i
    hr = np.zeros_like(r) + a[5]
    hi = np.zeros_like(r)
    hr1 = np.zeros_like(r)
    hi1 = np.zeros_like(r)
    for k in range(4, -1, -1):
        hr2, hi2 = hr1, hi1
        hr1, hi1 = hr, hi
        hi = -hi2 + im * hr1 + r * hi1
        hr = -hr2 + r * hr1 - im * hi1 + a[k]
    rr = sin_r * cosh_i
    ri = cos_r * sinh_i
    return rr * hr - ri * hi, rr * hi + ri * hr


def merc_ell_forward(lon, lat, lon_0=0.0, x_0=0.0, y_0=0.0, a=None, e=None):
    """Ellipsoidal Mercator forward (Snyder 1987 eqs 7-6..7-8) — the
    EPSG:3395 family.  NOT spherical web mercator: the ellipsoidal y
    diverges by ~0.3% (tens of km at mid latitudes).  ``a``/``e``
    parameterized so tests can drive Snyder's Clarke-1866 worked example."""
    a = _A if a is None else a
    e = _E if e is None else e
    lon = np.asarray(lon, dtype=np.float64)
    phi = np.clip(np.asarray(lat, dtype=np.float64), -89.9999, 89.9999) * _D2R
    lam = (lon - lon_0) * _D2R
    s = e * np.sin(phi)
    x = x_0 + a * lam
    y = y_0 + a * np.log(
        np.tan(math.pi / 4.0 + phi / 2.0) * ((1.0 - s) / (1.0 + s)) ** (e / 2.0)
    )
    return x, y


def merc_ell_inverse(x, y, lon_0=0.0, x_0=0.0, y_0=0.0, a=None, e=None):
    """Ellipsoidal Mercator inverse (Snyder eqs 7-9/7-10, fixed-point in
    phi; converges to <1e-12 rad in ~6 iterations)."""
    a = _A if a is None else a
    e = _E if e is None else e
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    t = np.exp(-(y - y_0) / a)
    phi = math.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(12):
        s = e * np.sin(phi)
        phi_new = math.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (e / 2.0)
        )
        if np.allclose(phi_new, phi, rtol=0.0, atol=1e-13):
            phi = phi_new
            break
        phi = phi_new
    lon = lon_0 + (x - x_0) / a * _R2D
    return lon, phi * _R2D


@dataclass(frozen=True)
class CRS:
    """A supported CRS.

    ``kind`` in {geographic, mercator, merc_ell, utm, tmerc, sinusoidal,
    lcc, aea, ps}; the conic kinds (Lambert conformal conic 2SP / Albers
    equal-area 2SP) carry their projection parameters in ``params`` =
    (lat_1, lat_2, lat_0, lon_0, x_0, y_0) degrees/meters on the WGS84
    ellipsoid (NAD83/GRS80 parameter sets are accepted — the 1/f
    difference is sub-millimeter).
    """

    kind: str
    zone: int = 0  # UTM only
    south: bool = False  # UTM hemisphere / polar-stereographic aspect
    # lcc/aea: (lat_1, lat_2, lat_0, lon_0, x_0, y_0)
    # ps (polar stereographic): (lat_ts, lon_0, x_0, y_0)
    # tmerc (generic transverse mercator): (lat_0, lon_0, k_0, x_0, y_0)
    # merc_ell (ellipsoidal mercator, EPSG:3395 family): (lon_0, x_0, y_0)
    params: tuple = ()

    # ---- identity / serialization -------------------------------------
    @property
    def is_geographic(self) -> bool:
        return self.kind == "geographic"

    @property
    def is_projected(self) -> bool:
        return not self.is_geographic

    def to_epsg(self) -> int | None:
        if self.kind == "geographic":
            return 4326
        if self.kind == "mercator":
            return 3857
        if self.kind == "merc_ell" and self.params == (0.0, 0.0, 0.0):
            return 3395
        if self.kind == "utm":
            return (32700 if self.south else 32600) + self.zone
        if self.kind in ("lcc", "aea"):
            for code, (kind, params) in _CONIC_EPSG.items():
                if kind == self.kind and params == self.params:
                    return code
        if self.kind == "ps":
            for code, params in _PS_EPSG.items():
                if params == self.params:
                    return code
        return None  # sinusoidal (and generic conics) have no EPSG

    def to_string(self) -> str:
        epsg = self.to_epsg()
        if epsg is not None:
            return f"EPSG:{epsg}"
        if self.kind in ("lcc", "aea"):
            lat1, lat2, lat0, lon0, x0, y0 = self.params
            return (
                f"+proj={self.kind} +lat_1={lat1} +lat_2={lat2} "
                f"+lat_0={lat0} +lon_0={lon0} +x_0={x0} +y_0={y0} "
                "+datum=WGS84 +units=m +no_defs"
            )
        if self.kind == "ps":
            lat_ts, lon0, x0, y0 = self.params
            lat0 = -90 if self.south else 90
            return (
                f"+proj=stere +lat_0={lat0} +lat_ts={lat_ts} "
                f"+lon_0={lon0} +x_0={x0} +y_0={y0} "
                "+datum=WGS84 +units=m +no_defs"
            )
        if self.kind == "tmerc":
            lat0, lon0, k0, x0, y0 = self.params
            return (
                f"+proj=tmerc +lat_0={lat0} +lon_0={lon0} +k={k0} "
                f"+x_0={x0} +y_0={y0} +datum=WGS84 +units=m +no_defs"
            )
        if self.kind == "merc_ell":
            lon0, x0, y0 = self.params
            return (
                f"+proj=merc +lon_0={lon0} +k=1 +x_0={x0} +y_0={y0} "
                "+datum=WGS84 +units=m +no_defs"
            )
        return f"+proj=sinu +R={_SINU_R} +units=m +no_defs"

    _WGS84_GEOGCS = (
        'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",'
        '6378137,298.257223563,AUTHORITY["EPSG","7030"]],'
        'AUTHORITY["EPSG","6326"]],PRIMEM["Greenwich",0,'
        'AUTHORITY["EPSG","8901"]],UNIT["degree",0.0174532925199433,'
        'AUTHORITY["EPSG","9122"]],AUTHORITY["EPSG","4326"]]'
    )
    _SPHERE_GEOGCS = (
        'GEOGCS["Unknown datum based upon the custom spheroid",'
        'DATUM["Not_specified_based_on_custom_spheroid",'
        f'SPHEROID["Custom spheroid",{_SINU_R},0]],'
        'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
    )

    def to_wkt(self) -> str:
        """Fully-formed WKT1 readable by external GDAL/pyproj consumers
        (static templates per supported kind; round-tripped in tests)."""
        epsg = self.to_epsg()
        auth = f',AUTHORITY["EPSG","{epsg}"]' if epsg is not None else ""
        if self.kind == "geographic":
            return self._WGS84_GEOGCS
        if self.kind == "mercator":
            return (
                'PROJCS["WGS 84 / Pseudo-Mercator",'
                + self._WGS84_GEOGCS.replace(
                    ',AUTHORITY["EPSG","4326"]]', "]"
                )
                + ',PROJECTION["Mercator_1SP"],'
                'PARAMETER["central_meridian",0],'
                'PARAMETER["scale_factor",1],'
                'PARAMETER["false_easting",0],'
                'PARAMETER["false_northing",0],'
                'UNIT["metre",1,AUTHORITY["EPSG","9001"]]' + auth + "]"
            )
        if self.kind == "merc_ell":
            lon0, x0, y0 = self.params
            return (
                'PROJCS["WGS 84 / World Mercator",'
                + self._WGS84_GEOGCS.replace(
                    ',AUTHORITY["EPSG","4326"]]', "]"
                )
                + ',PROJECTION["Mercator_1SP"],'
                f'PARAMETER["central_meridian",{lon0}],'
                'PARAMETER["scale_factor",1],'
                f'PARAMETER["false_easting",{x0}],'
                f'PARAMETER["false_northing",{y0}],'
                'UNIT["metre",1,AUTHORITY["EPSG","9001"]]' + auth + "]"
            )
        if self.kind == "tmerc":
            lat0, lon0, k0, x0, y0 = self.params
            return (
                'PROJCS["Transverse Mercator custom",'
                + self._WGS84_GEOGCS.replace(
                    ',AUTHORITY["EPSG","4326"]]', "]"
                )
                + ',PROJECTION["Transverse_Mercator"],'
                f'PARAMETER["latitude_of_origin",{lat0}],'
                f'PARAMETER["central_meridian",{lon0}],'
                f'PARAMETER["scale_factor",{k0}],'
                f'PARAMETER["false_easting",{x0}],'
                f'PARAMETER["false_northing",{y0}],'
                'UNIT["metre",1,AUTHORITY["EPSG","9001"]]' + auth + "]"
            )
        if self.kind == "utm":
            hemi = "S" if self.south else "N"
            return (
                f'PROJCS["WGS 84 / UTM zone {self.zone}{hemi}",'
                + self._WGS84_GEOGCS.replace(
                    ',AUTHORITY["EPSG","4326"]]', "]"
                )
                + ',PROJECTION["Transverse_Mercator"],'
                'PARAMETER["latitude_of_origin",0],'
                f'PARAMETER["central_meridian",{self._lon0}],'
                'PARAMETER["scale_factor",0.9996],'
                'PARAMETER["false_easting",500000],'
                f'PARAMETER["false_northing",{10000000 if self.south else 0}],'
                'UNIT["metre",1,AUTHORITY["EPSG","9001"]]' + auth + "]"
            )
        if self.kind == "sinusoidal":
            return (
                'PROJCS["MODIS Sinusoidal",'
                + self._SPHERE_GEOGCS
                + ',PROJECTION["Sinusoidal"],'
                'PARAMETER["longitude_of_center",0],'
                'PARAMETER["false_easting",0],'
                'PARAMETER["false_northing",0],'
                'UNIT["metre",1]]'
            )
        if self.kind == "ps":
            lat_ts, lon0, x0, y0 = self.params
            return (
                'PROJCS["Polar Stereographic custom",'
                + self._WGS84_GEOGCS.replace(
                    ',AUTHORITY["EPSG","4326"]]', "]"
                )
                + ',PROJECTION["Polar_Stereographic"],'
                # WKT1 convention: the SIGNED standard parallel encodes the
                # hemisphere (EPSG:3413 -> 70, EPSG:3031 -> -71)
                f'PARAMETER["latitude_of_origin",{lat_ts}],'
                f'PARAMETER["central_meridian",{lon0}],'
                'PARAMETER["scale_factor",1],'
                f'PARAMETER["false_easting",{x0}],'
                f'PARAMETER["false_northing",{y0}],'
                'UNIT["metre",1,AUTHORITY["EPSG","9001"]]' + auth + "]"
            )
        if self.kind in ("lcc", "aea"):
            lat1, lat2, lat0, lon0, x0, y0 = self.params
            proj_name = (
                "Lambert_Conformal_Conic_2SP"
                if self.kind == "lcc"
                else "Albers_Conic_Equal_Area"
            )
            lat0_key = (
                "latitude_of_origin" if self.kind == "lcc"
                else "latitude_of_center"
            )
            lon0_key = (
                "central_meridian" if self.kind == "lcc"
                else "longitude_of_center"
            )
            return (
                f'PROJCS["{self.kind.upper()} custom",'
                + self._WGS84_GEOGCS.replace(
                    ',AUTHORITY["EPSG","4326"]]', "]"
                )
                + f',PROJECTION["{proj_name}"],'
                f'PARAMETER["standard_parallel_1",{lat1}],'
                f'PARAMETER["standard_parallel_2",{lat2}],'
                f'PARAMETER["{lat0_key}",{lat0}],'
                f'PARAMETER["{lon0_key}",{lon0}],'
                f'PARAMETER["false_easting",{x0}],'
                f'PARAMETER["false_northing",{y0}],'
                'UNIT["metre",1,AUTHORITY["EPSG","9001"]]' + auth + "]"
            )
        raise CRSError(f"unknown kind {self.kind}")

    def __str__(self) -> str:  # pragma: no cover - convenience
        return self.to_string()

    # ---- point transforms ---------------------------------------------
    def forward(self, lon, lat):
        """(lon, lat) degrees -> projected (x, y). Identity for geographic."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        if self.kind == "geographic":
            return lon, lat
        if self.kind == "mercator":
            x = _MERC_R * lon * _D2R
            lat_c = np.clip(lat, -89.9999, 89.9999)
            y = _MERC_R * np.log(np.tan(math.pi / 4.0 + lat_c * _D2R / 2.0))
            return x, y
        if self.kind == "sinusoidal":
            phi = lat * _D2R
            x = _SINU_R * lon * _D2R * np.cos(phi)
            y = _SINU_R * phi
            return x, y
        if self.kind in ("utm", "tmerc"):
            return self._tm_forward(lon, lat)
        if self.kind == "merc_ell":
            return merc_ell_forward(lon, lat, *self.params)
        if self.kind == "lcc":
            return self._lcc_forward(lon, lat)
        if self.kind == "aea":
            return self._aea_forward(lon, lat)
        if self.kind == "ps":
            return self._ps_forward(lon, lat)
        raise CRSError(f"unknown kind {self.kind}")

    def inverse(self, x, y):
        """Projected (x, y) -> (lon, lat) degrees."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        if self.kind == "geographic":
            return x, y
        if self.kind == "mercator":
            lon = x / _MERC_R * _R2D
            lat = (2.0 * np.arctan(np.exp(y / _MERC_R)) - math.pi / 2.0) * _R2D
            return lon, lat
        if self.kind == "sinusoidal":
            phi = y / _SINU_R
            cos_phi = np.cos(phi)
            # guard poles where cos(phi) -> 0
            lon = np.where(
                np.abs(cos_phi) > 1e-12, x / (_SINU_R * cos_phi) * _R2D, 0.0
            )
            return lon, phi * _R2D
        if self.kind in ("utm", "tmerc"):
            return self._tm_inverse(x, y)
        if self.kind == "merc_ell":
            return merc_ell_inverse(x, y, *self.params)
        if self.kind == "lcc":
            return self._lcc_inverse(x, y)
        if self.kind == "aea":
            return self._aea_inverse(x, y)
        if self.kind == "ps":
            return self._ps_inverse(x, y)
        raise CRSError(f"unknown kind {self.kind}")

    # ---- polar stereographic (Snyder 1987 eqs 21-33..21-41) ------------
    def _ps_constants(self):
        lat_ts, lon0, x0, y0 = self.params
        phi_c = abs(lat_ts) * _D2R
        m_c = float(_m_factor(np.float64(phi_c)))
        t_c = float(_t_factor(np.float64(phi_c)))
        return m_c, t_c, lon0 * _D2R, x0, y0

    def _ps_forward(self, lon, lat):
        m_c, t_c, lam0, x0, y0 = self._ps_constants()
        phi = np.asarray(lat, np.float64) * _D2R
        lam = np.asarray(lon, np.float64) * _D2R - lam0
        if self.south:
            t = _t_factor(-phi)
            rho = _A * m_c * t / t_c
            return rho * np.sin(lam) + x0, rho * np.cos(lam) + y0
        t = _t_factor(phi)
        rho = _A * m_c * t / t_c
        return rho * np.sin(lam) + x0, -rho * np.cos(lam) + y0

    def _ps_inverse(self, x, y):
        m_c, t_c, lam0, x0, y0 = self._ps_constants()
        xp = np.asarray(x, np.float64) - x0
        yp = np.asarray(y, np.float64) - y0
        rho = np.hypot(xp, yp)
        t = rho * t_c / (_A * m_c)
        phi = math.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(8):  # Snyder eq 7-9 fixed point
            s = np.sin(phi)
            phi = math.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - _E * s) / (1.0 + _E * s)) ** (_E / 2.0)
            )
        if self.south:
            theta = np.arctan2(xp, yp)
            return _wrap_lon_deg((theta + lam0) * _R2D), -phi * _R2D
        theta = np.arctan2(xp, -yp)
        return _wrap_lon_deg((theta + lam0) * _R2D), phi * _R2D

    # ---- Lambert conformal conic 2SP (Snyder 1987 eqs 15-1..15-11) -----
    def _lcc_constants(self):
        lat1, lat2, lat0, lon0, x0, y0 = self.params
        p1, p2, p0 = lat1 * _D2R, lat2 * _D2R, lat0 * _D2R
        m1, m2 = _m_factor(p1), _m_factor(p2)
        t0, t1, t2 = _t_factor(p0), _t_factor(p1), _t_factor(p2)
        if abs(lat1 - lat2) > 1e-12:
            n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        else:
            n = math.sin(p1)
        F = m1 / (n * t1**n)
        rho0 = _A * F * t0**n
        return n, F, rho0, lon0 * _D2R, x0, y0

    def _lcc_forward(self, lon, lat):
        n, F, rho0, lam0, x0, y0 = self._lcc_constants()
        phi = np.asarray(lat, np.float64) * _D2R
        # wrap lam into [-pi, pi): theta = n*lam with n != 1, so a lon on
        # the other side of the antimeridian (lon_0=170, lon=-175 -> the
        # CORRECT delta is +15 deg, not -345) would otherwise rotate to a
        # wrong cone angle (PROJ wraps identically)
        lam = _wrap_lon_deg(np.asarray(lon, np.float64) - lam0 * _R2D) * _D2R
        rho = _A * F * _t_factor(phi) ** n
        theta = n * lam
        return rho * np.sin(theta) + x0, rho0 - rho * np.cos(theta) + y0

    def _lcc_inverse(self, x, y):
        n, F, rho0, lam0, x0, y0 = self._lcc_constants()
        xp = np.asarray(x, np.float64) - x0
        yp = rho0 - (np.asarray(y, np.float64) - y0)
        rho = np.sign(n) * np.hypot(xp, yp)
        theta = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
        with np.errstate(invalid="ignore", divide="ignore"):
            t = (rho / (_A * F)) ** (1.0 / n)
        phi = math.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(8):  # Snyder eq 7-9 fixed-point; quadratic in e^2
            s = np.sin(phi)
            phi = math.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - _E * s) / (1.0 + _E * s)) ** (_E / 2.0)
            )
        return _wrap_lon_deg((theta / n + lam0) * _R2D), phi * _R2D

    # ---- Albers equal-area conic 2SP (Snyder 1987 eqs 14-1..14-11) -----
    def _aea_constants(self):
        lat1, lat2, lat0, lon0, x0, y0 = self.params
        p1, p2, p0 = lat1 * _D2R, lat2 * _D2R, lat0 * _D2R
        m1, m2 = _m_factor(p1), _m_factor(p2)
        q0, q1, q2 = _q_factor(p0), _q_factor(p1), _q_factor(p2)
        if abs(lat1 - lat2) > 1e-12:
            n = (m1 * m1 - m2 * m2) / (q2 - q1)
        else:
            n = math.sin(p1)
        C = m1 * m1 + n * q1
        rho0 = _A * math.sqrt(C - n * q0) / n
        return n, C, rho0, lon0 * _D2R, x0, y0

    def _aea_forward(self, lon, lat):
        n, C, rho0, lam0, x0, y0 = self._aea_constants()
        phi = np.asarray(lat, np.float64) * _D2R
        # wrap lam into [-pi, pi) — same antimeridian rationale as LCC
        lam = _wrap_lon_deg(np.asarray(lon, np.float64) - lam0 * _R2D) * _D2R
        rho = _A * np.sqrt(C - n * _q_factor(phi)) / n
        theta = n * lam
        return rho * np.sin(theta) + x0, rho0 - rho * np.cos(theta) + y0

    def _aea_inverse(self, x, y):
        n, C, rho0, lam0, x0, y0 = self._aea_constants()
        xp = np.asarray(x, np.float64) - x0
        yp = rho0 - (np.asarray(y, np.float64) - y0)
        rho = np.sign(n) * np.hypot(xp, yp)
        theta = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
        q = (C - (rho * n / _A) ** 2) / n
        # Snyder eq 3-16 iteration from the authalic sphere start
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        for _ in range(8):
            s = np.sin(phi)
            one = 1.0 - _E2 * s * s
            phi = phi + (one * one / (2.0 * np.cos(phi))) * (
                q / (1.0 - _E2)
                - s / one
                + (1.0 / (2.0 * _E)) * np.log((1.0 - _E * s) / (1.0 + _E * s))
            )
        return _wrap_lon_deg((theta / n + lam0) * _R2D), phi * _R2D

    # ---- Transverse Mercator series (Snyder 1987 eqs 8-9..8-25) --------
    @property
    def _lon0(self) -> float:
        return (self.zone - 1) * 6.0 - 180.0 + 3.0

    def _tm_params(self):
        """(lat_0, lon_0, k_0, x_0, y_0) for either TM kind: UTM fixes the
        classic zone parameterization, tmerc carries arbitrary ones."""
        if self.kind == "utm":
            return 0.0, self._lon0, _K0, 500000.0, (
                10000000.0 if self.south else 0.0
            )
        return self.params

    def _tm_forward(self, lon, lat):
        lat_0, lon_0, k_0, x_0, y_0 = self._tm_params()
        phi = np.asarray(lat, dtype=np.float64) * _D2R
        lam = (np.asarray(lon, dtype=np.float64) - lon_0) * _D2R
        st = _etmerc_setup(k_0, lat_0 * _D2R)
        cn = _gatg(st["cbg"], phi)
        sin_cn, cos_cn = np.sin(cn), np.cos(cn)
        sin_ce, cos_ce = np.sin(lam), np.cos(lam)
        cos_cn_cos_ce = cos_cn * cos_ce
        cn = np.arctan2(sin_cn, cos_cn_cos_ce)
        tan_ce = sin_ce * cos_cn / np.hypot(sin_cn, cos_cn_cos_ce)
        ce = np.arcsinh(tan_ce)
        d_cn, d_ce = _clen_s(st["gtu"], 2.0 * cn, 2.0 * ce)
        cn = cn + d_cn
        ce = ce + d_ce
        x = _A * st["qn"] * ce + x_0
        y = _A * (st["qn"] * cn + st["zb"]) + y_0
        return x, y

    def _tm_inverse(self, x, y):
        lat_0, lon_0, k_0, x_0, y_0 = self._tm_params()
        st = _etmerc_setup(k_0, lat_0 * _D2R)
        cn = ((np.asarray(y, dtype=np.float64) - y_0) / _A - st["zb"]) \
            / st["qn"]
        ce = (np.asarray(x, dtype=np.float64) - x_0) / _A / st["qn"]
        d_cn, d_ce = _clen_s(st["utg"], 2.0 * cn, 2.0 * ce)
        cn = cn + d_cn
        ce = np.arctan(np.sinh(ce + d_ce))
        sin_cn, cos_cn = np.sin(cn), np.cos(cn)
        sin_ce, cos_ce = np.sin(ce), np.cos(ce)
        lam = np.arctan2(sin_ce, cos_ce * cos_cn)
        phi = _gatg(
            st["cgb"],
            np.arctan2(cos_ce * sin_cn, np.hypot(sin_ce, cos_ce * cos_cn)),
        )
        return lon_0 + lam * _R2D, phi * _R2D


GEOGRAPHIC = CRS("geographic")
WEB_MERCATOR = CRS("mercator")
SINUSOIDAL = CRS("sinusoidal")

# well-known conic parameter sets: code -> (kind, (lat_1, lat_2, lat_0,
# lon_0, x_0, y_0)).  NAD83/GRS80-defined systems are approximated on the
# WGS84 ellipsoid (1/f differs in the 9th digit — sub-millimeter).
_CONIC_EPSG = {
    5070: ("aea", (29.5, 45.5, 23.0, -96.0, 0.0, 0.0)),   # CONUS Albers
    3310: ("aea", (34.0, 40.5, 0.0, -120.0, 0.0, -4000000.0)),  # CA Albers
    102003: ("aea", (29.5, 45.5, 37.5, -96.0, 0.0, 0.0)),  # ESRI USA Albers
    2154: ("lcc", (49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0)),  # Lambert-93
    3978: ("lcc", (49.0, 77.0, 49.0, -95.0, 0.0, 0.0)),   # Canada LCC
    3347: ("lcc", (49.0, 77.0, 63.390675, -91.866667, 6200000.0, 3000000.0)),
}

# polar stereographic: code -> (lat_ts, lon_0, x_0, y_0); the lat_ts sign
# carries the hemisphere (NSIDC Sea Ice grids + Antarctic PS)
_PS_EPSG = {
    3413: (70.0, -45.0, 0.0, 0.0),   # NSIDC Sea Ice Polar Stereo North
    3031: (-71.0, 0.0, 0.0, 0.0),    # Antarctic Polar Stereographic
    3976: (-70.0, 0.0, 0.0, 0.0),    # NSIDC Sea Ice Polar Stereo South
}


def tmerc(lat_0=0.0, lon_0=0.0, k_0=1.0, x_0=0.0, y_0=0.0) -> CRS:
    """Generic transverse Mercator on WGS84 (Snyder series, same kernel as
    UTM with arbitrary origin/scale/false offsets)."""
    return CRS(
        "tmerc",
        params=(
            float(lat_0), float(lon_0), float(k_0), float(x_0), float(y_0)
        ),
    )


def world_mercator(lon_0=0.0, x_0=0.0, y_0=0.0) -> CRS:
    """Ellipsoidal Mercator on WGS84 (EPSG:3395 when all params are 0)."""
    return CRS("merc_ell", params=(float(lon_0), float(x_0), float(y_0)))


def utm(zone: int, south: bool = False) -> CRS:
    if not 1 <= zone <= 60:
        raise CRSError(f"invalid UTM zone {zone}")
    return CRS("utm", zone=zone, south=south)


def lcc(lat_1, lat_2, lat_0=0.0, lon_0=0.0, x_0=0.0, y_0=0.0) -> CRS:
    """Lambert conformal conic 2SP on WGS84."""
    return CRS("lcc", params=(
        float(lat_1), float(lat_2), float(lat_0), float(lon_0),
        float(x_0), float(y_0),
    ))


def aea(lat_1, lat_2, lat_0=0.0, lon_0=0.0, x_0=0.0, y_0=0.0) -> CRS:
    """Albers equal-area conic 2SP on WGS84."""
    return CRS("aea", params=(
        float(lat_1), float(lat_2), float(lat_0), float(lon_0),
        float(x_0), float(y_0),
    ))


def polar_stereographic(lat_ts, lon_0=0.0, x_0=0.0, y_0=0.0) -> CRS:
    """Polar stereographic on WGS84; the lat_ts sign picks the pole."""
    return CRS(
        "ps",
        south=float(lat_ts) < 0,
        params=(float(lat_ts), float(lon_0), float(x_0), float(y_0)),
    )


def from_epsg(code: int) -> CRS:
    if code == 4326:
        return GEOGRAPHIC
    if code == 3857:
        return WEB_MERCATOR
    if code == 3395:
        return world_mercator()
    if 32601 <= code <= 32660:
        return utm(code - 32600, south=False)
    if 32701 <= code <= 32760:
        return utm(code - 32700, south=True)
    if code in _CONIC_EPSG:
        kind, params = _CONIC_EPSG[code]
        return CRS(kind, params=params)
    if code in _PS_EPSG:
        return polar_stereographic(*_PS_EPSG[code])
    raise CRSError(
        f"EPSG:{code} is outside the supported whitelist — supported: 4326, "
        "3857, 3395, UTM 326xx/327xx, the conic set "
        f"({sorted(_CONIC_EPSG)}), polar stereographic ({sorted(_PS_EPSG)}); "
        "WGS84 +proj=tmerc/merc/sinu/lcc/aea/stere proj4 strings also parse"
    )


def _is_wgs84_axes(a: float, b: float) -> bool:
    """Explicit +a/+b ellipsoid axes must equal WGS84's (mm tolerance)."""
    return abs(a - _A) <= 1e-3 and abs(b - _B) <= 1e-3


def from_user_input(value) -> CRS:
    """Lenient parse (semantics of /root/reference/rioxarray/crs.py:12-45)."""
    if isinstance(value, CRS):
        return value
    if isinstance(value, int):
        return from_epsg(value)
    if hasattr(value, "to_string") and not isinstance(value, str):
        value = value.to_string()
    if not isinstance(value, str):
        raise CRSError(f"cannot parse CRS from {type(value)}")
    s = value.strip()
    m = re.match(r"^(?:epsg|EPSG):(\d+)$", s)
    if m:
        return from_epsg(int(m.group(1)))
    if s.isdigit():
        return from_epsg(int(s))
    if s.startswith("+") or " +" in s:  # proj4-ish
        kv = dict(
            (p.split("=", 1) + [None])[:2] for p in s.split() if p.startswith("+")
        )
        proj = (kv.get("+proj") or "").lower()
        if proj in ("longlat", "latlong"):
            return GEOGRAPHIC
        if proj == "sinu":
            return SINUSOIDAL
        if proj == "webmerc":
            return WEB_MERCATOR
        if proj == "merc":
            # spherical (+R, or +a with no/equal +b: web mercator) vs
            # ellipsoidal (WGS84: EPSG:3395 family) — NOT the same
            # projection (~30 km y error at lat 45).  An explicit +R is
            # spherical in PROJ even alongside +datum/+ellps.
            r_val = kv.get("+R")
            a_val = kv.get("+a")
            b_val = kv.get("+b")
            if r_val is not None or (
                a_val is not None
                and b_val in (None, a_val)
                and "+datum" not in kv
                and "+ellps" not in kv
            ):
                if float(r_val if r_val is not None else a_val) == _MERC_R:
                    return WEB_MERCATOR
                raise CRSError(
                    "spherical '+proj=merc' with a non-web-mercator radius "
                    "is outside the whitelist"
                )
            if a_val is not None or b_val is not None:
                # explicit ellipsoid axes must BE the WGS84 ellipsoid —
                # Airy/International/... would silently run the WGS84
                # kernel hundreds of meters wrong
                if a_val is None or b_val is None or not _is_wgs84_axes(
                    float(a_val), float(b_val)
                ):
                    raise CRSError(
                        "'+proj=merc' with non-WGS84 +a/+b ellipsoid axes "
                        "is outside the whitelist"
                    )
            datum = (kv.get("+datum") or kv.get("+ellps") or "WGS84").upper()
            if datum != "WGS84":
                raise CRSError(
                    f"'+proj=merc' on datum {datum} is outside the "
                    "whitelist (WGS84 only)"
                )
            if float(kv.get("+lat_ts", 0) or 0) != 0.0 or float(
                kv.get("+k", kv.get("+k_0", 1)) or 1
            ) != 1.0:
                raise CRSError(
                    "'+proj=merc' with lat_ts/k scaling is outside the "
                    "whitelist (EPSG:3395 parameterization only)"
                )
            return world_mercator(
                float(kv.get("+lon_0", 0) or 0),
                float(kv.get("+x_0", 0) or 0),
                float(kv.get("+y_0", 0) or 0),
            )
        if proj == "utm":
            zone = int(kv.get("+zone", 0))
            return utm(zone, south="+south" in s)
        if proj in ("lcc", "aea"):
            maker = lcc if proj == "lcc" else aea
            return maker(
                float(kv.get("+lat_1", 0) or 0),
                float(kv.get("+lat_2", kv.get("+lat_1", 0)) or 0),
                float(kv.get("+lat_0", 0) or 0),
                float(kv.get("+lon_0", 0) or 0),
                float(kv.get("+x_0", 0) or 0),
                float(kv.get("+y_0", 0) or 0),
            )
        if proj == "stere":
            lat0 = float(kv.get("+lat_0", 0) or 0)
            if abs(lat0) != 90.0:
                raise CRSError(
                    "oblique '+proj=stere' is outside the whitelist "
                    "(only polar aspects, lat_0=+-90, are supported)"
                )
            lat_ts = float(kv.get("+lat_ts", lat0) or lat0)
            # hemisphere comes from lat_0; force lat_ts onto that side
            lat_ts = abs(lat_ts) if lat0 > 0 else -abs(lat_ts)
            return polar_stereographic(
                lat_ts,
                float(kv.get("+lon_0", 0) or 0),
                float(kv.get("+x_0", 0) or 0),
                float(kv.get("+y_0", 0) or 0),
            )
        if proj == "tmerc":
            datum = (kv.get("+datum") or kv.get("+ellps") or "WGS84").upper()
            if datum != "WGS84":
                raise CRSError(
                    f"'+proj=tmerc' on datum {datum} is outside the "
                    "whitelist (WGS84 only)"
                )
            if "+a" in kv or "+b" in kv or "+R" in kv:
                # explicit axes override any datum keyword in PROJ: an
                # Airy '+a=6377563.396 +b=6356256.909' must not silently
                # run the WGS84 kernel
                a_val, b_val = kv.get("+a"), kv.get("+b")
                if (
                    "+R" in kv
                    or a_val is None
                    or b_val is None
                    or not _is_wgs84_axes(float(a_val), float(b_val))
                ):
                    raise CRSError(
                        "'+proj=tmerc' with non-WGS84 ellipsoid axes "
                        "(+a/+b/+R) is outside the whitelist"
                    )
            lon0 = float(kv.get("+lon_0", 0) or 0)
            k = float(kv.get("+k", kv.get("+k_0", 1.0)) or 1.0)
            x0 = float(kv.get("+x_0", 0) or 0)
            y0 = float(kv.get("+y_0", 0) or 0)
            lat0 = float(kv.get("+lat_0", 0) or 0)
            # exact UTM parameterizations keep the canonical UTM identity
            zone = int(round((lon0 + 183.0) / 6.0))
            if (
                1 <= zone <= 60
                and lon0 == (zone - 1) * 6.0 - 180.0 + 3.0
                and k == _K0
                and x0 == 500000.0
                and lat0 == 0.0
                and y0 in (0.0, 10000000.0)
            ):
                return utm(zone, south=y0 == 10000000.0)
            return tmerc(lat0, lon0, k, x0, y0)
        raise CRSError(
            f"unsupported proj4 string: {s} — supported +proj values: "
            "longlat, merc (spherical & ellipsoidal WGS84), utm, tmerc, "
            "sinu, lcc (2SP), aea (2SP), stere (polar); all WGS84-family "
            "datums only"
        )
    # WKT: try EPSG authority/id codes outermost-last (skipping unit/datum
    # authority ids like 9001 that never name a CRS).  A PROJCS WKT must
    # NEVER resolve through its inner GEOGCS code (e.g. the embedded 4326):
    # that would silently treat meter coordinates as degrees — skip
    # geographic candidates when the string is projected and fall through
    # to PROJECTION-based parsing (or a loud CRSError) instead.
    is_projected_wkt = "PROJCS" in s or "PROJCRS" in s
    codes = re.findall(r'(?:AUTHORITY|ID)\[\s*"?EPSG"?\s*,\s*"?(\d+)"?', s)
    for code in reversed(codes):
        try:
            cand = from_epsg(int(code))
        except CRSError:
            continue
        if is_projected_wkt and cand.is_geographic:
            continue
        return cand
    if "sinusoidal" in s.lower() or '"sinu' in s.lower():
        return SINUSOIDAL
    # WKT1/ESRI: PROJECTION + PARAMETERs.  ESRI WKT differs from OGC only
    # in datum spelling (D_WGS_1984 / GCS_WGS_1984) and a few projection
    # aliases (Lambert_Conformal_Conic without the _2SP suffix, bare
    # Albers) — the lowercased parameter keys already coincide.
    mproj = re.search(r'PROJECTION\[\s*"([^"]+)"', s)
    if mproj:
        pname = mproj.group(1).lower()
        pars = {
            k.lower(): float(v)
            for k, v in re.findall(
                r'PARAMETER\[\s*"([^"]+)"\s*,\s*([-0-9.eE+]+)', s
            )
        }
        return _dispatch_wkt_projection(pname, pars, s)
    # WKT2 (ISO 19162): CONVERSION/METHOD with EPSG operation names and
    # long parameter names (reference leniency: rioxarray/crs.py:12-45
    # accepts anything pyproj parses, and pyproj emits WKT2 by default)
    mmeth = re.search(r'METHOD\[\s*"([^"]+)"', s)
    if mmeth:
        method = mmeth.group(1).lower()
        raw = {
            k.lower(): float(v)
            for k, v in re.findall(
                r'PARAMETER\[\s*"([^"]+)"\s*,\s*([-0-9.eE+]+)', s
            )
        }
        pars = {_WKT2_PARAM.get(k, k): v for k, v in raw.items()}
        pname = _WKT2_METHOD.get(method)
        if pname is None:
            raise CRSError(
                f"unsupported WKT2 operation method {method!r} — supported: "
                f"{sorted(set(_WKT2_METHOD))}"
            )
        if method == "polar stereographic (variant b)":
            # variant B parameterizes by standard parallel (no scale)
            pars.setdefault("standard_parallel_1",
                            raw.get("latitude of standard parallel", 90.0))
            pars.setdefault("scale_factor", 1.0)
        return _dispatch_wkt_projection(pname, pars, s)
    if not is_projected_wkt and re.match(r"^GEOGC(?:S|RS)\[", s) \
            and _wkt_is_wgs84(s):
        return GEOGRAPHIC
    raise CRSError(f"cannot parse CRS: {s[:120]}")


#: WKT2 EPSG operation-method names -> the WKT1 projection vocabulary the
#: shared dispatch speaks
_WKT2_METHOD = {
    "transverse mercator": "transverse_mercator",
    "lambert conic conformal (2sp)": "lambert_conformal_conic_2sp",
    "albers equal area": "albers_conic_equal_area",
    "polar stereographic (variant a)": "polar_stereographic",
    "polar stereographic (variant b)": "polar_stereographic",
    "mercator (variant a)": "mercator_1sp",
    "sinusoidal": "sinusoidal",
}

#: WKT2 EPSG parameter names -> WKT1 keys (lowercased on both sides)
_WKT2_PARAM = {
    "latitude of natural origin": "latitude_of_origin",
    "longitude of natural origin": "central_meridian",
    "scale factor at natural origin": "scale_factor",
    "false easting": "false_easting",
    "false northing": "false_northing",
    "latitude of 1st standard parallel": "standard_parallel_1",
    "latitude of 2nd standard parallel": "standard_parallel_2",
    "latitude of false origin": "latitude_of_origin",
    "longitude of false origin": "central_meridian",
    "easting at false origin": "false_easting",
    "northing at false origin": "false_northing",
    "latitude of standard parallel": "standard_parallel_1",
    "longitude of origin": "central_meridian",
}


def _wkt_is_wgs84(s: str) -> bool:
    """WGS84-family datum spellings across OGC WKT1, ESRI WKT and WKT2."""
    return any(tok in s for tok in (
        '"WGS 84"', '"WGS_1984"', '"D_WGS_1984"', '"GCS_WGS_1984"',
        "World Geodetic System 1984", '"WGS84"',
    ))


def _dispatch_wkt_projection(pname: str, pars: dict, s: str) -> CRS:
    """Shared projection dispatch for WKT1/ESRI/WKT2-normalized names."""
    if pname == "sinusoidal":
        return SINUSOIDAL
    # exact name only: "Universal_Polar_Stereographic" (UPS, k0=0.994,
    # 2e6 false origin) is a DIFFERENT projection and must not parse
    if pname == "polar_stereographic" and pars.get("scale_factor", 1.0) == 1.0:
        return polar_stereographic(
            pars.get("latitude_of_origin",
                     pars.get("standard_parallel_1", 90.0)),
            pars.get("central_meridian", 0.0),
            pars.get("false_easting", 0.0),
            pars.get("false_northing", 0.0),
        )
    if pname == "transverse_mercator":
        # WGS84-only WKT reaches here (Airy/Bessel grids carry other
        # datums — their GEOGCS won't match and stays rejected below)
        if not _wkt_is_wgs84(s):
            raise CRSError(
                "Transverse_Mercator WKT on a non-WGS84 datum is "
                "outside the whitelist"
            )
        t_lat0 = pars.get("latitude_of_origin", 0.0)
        t_lon0 = pars.get("central_meridian", 0.0)
        t_k = pars.get("scale_factor", 1.0)
        t_x0 = pars.get("false_easting", 0.0)
        t_y0 = pars.get("false_northing", 0.0)
        zone = int(round((t_lon0 + 183.0) / 6.0))
        if (
            1 <= zone <= 60
            and t_lon0 == (zone - 1) * 6.0 - 180.0 + 3.0
            and t_k == _K0
            and t_x0 == 500000.0
            and t_lat0 == 0.0
            and t_y0 in (0.0, 10000000.0)
        ):
            return utm(zone, south=t_y0 == 10000000.0)
        return tmerc(t_lat0, t_lon0, t_k, t_x0, t_y0)
    if pname == "mercator_1sp" and pars.get("scale_factor", 1.0) == 1.0:
        # authority-less Mercator_1SP on the WGS84 DATUM is ellipsoidal
        # world mercator (EPSG:3857's official WKT always carries its
        # authority code and resolves above, never here); mirror the
        # transverse_mercator datum guard — a Bessel/Airy Mercator_1SP
        # must not silently run the WGS84 kernel
        if not _wkt_is_wgs84(s):
            raise CRSError(
                "Mercator_1SP WKT on a non-WGS84 datum is outside "
                "the whitelist"
            )
        return world_mercator(
            pars.get("central_meridian", 0.0),
            pars.get("false_easting", 0.0),
            pars.get("false_northing", 0.0),
        )
    if "lambert_conformal_conic" in pname or "albers" in pname:
        maker = lcc if "lambert" in pname else aea
        return maker(
            pars.get("standard_parallel_1", 0.0),
            pars.get("standard_parallel_2",
                     pars.get("standard_parallel_1", 0.0)),
            pars.get("latitude_of_origin",
                     pars.get("latitude_of_center", 0.0)),
            pars.get("central_meridian",
                     pars.get("longitude_of_center", 0.0)),
            pars.get("false_easting", 0.0),
            pars.get("false_northing", 0.0),
        )
    raise CRSError(f"cannot parse CRS: {s[:120]}")


def crs_equal(a, b) -> bool:
    return from_user_input(a) == from_user_input(b)


def estimate_utm_crs(min_lon, min_lat, max_lon, max_lat) -> CRS:
    """Closed-form UTM zone from the bbox center
    (semantics of /root/reference/rioxarray/rioxarray.py:317-357)."""
    lon = (float(min_lon) + float(max_lon)) / 2.0
    lat = (float(min_lat) + float(max_lat)) / 2.0
    zone = int(math.floor((lon + 180.0) / 6.0)) + 1
    zone = min(max(zone, 1), 60)
    return utm(zone, south=lat < 0)


def transform_points(src: CRS, dst: CRS, xs, ys):
    """Project points src -> dst (through lon/lat). Identity when src == dst."""
    if src == dst:
        return np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64)
    lon, lat = src.inverse(xs, ys)
    return dst.forward(lon, lat)


def transform_bounds(
    src: CRS,
    dst: CRS,
    left: float,
    bottom: float,
    right: float,
    top: float,
    densify_pts: int = 21,
):
    """Reproject bounds with edge densification (semantics of
    rasterio.warp.transform_bounds as used at
    /root/reference/rioxarray/rioxarray.py:951-980; densify_pts=21 default)."""
    if densify_pts < 0:
        raise ValueError("densify_pts must be >= 0")
    # separable-monotone fast path: when x depends only on lon and y only
    # on lat, both monotonically, the envelope extremes sit at the corners
    # — identical result to the densified walk (interior edge points can
    # never exceed a corner), at 2 points instead of 4*(densify+2)
    _sep = ("geographic", "mercator", "merc_ell")
    if src.kind in _sep and dst.kind in _sep:
        xs = np.array([left, right], dtype=np.float64)
        ys = np.array([bottom, top], dtype=np.float64)
        px, py = transform_points(src, dst, xs, ys)
        return (
            float(np.min(px)), float(np.min(py)),
            float(np.max(px)), float(np.max(py)),
        )
    n = densify_pts + 2
    tx = np.linspace(left, right, n)
    ty = np.linspace(bottom, top, n)
    xs = np.concatenate([tx, np.full(n, right), tx[::-1], np.full(n, left)])
    ys = np.concatenate([np.full(n, bottom), ty, np.full(n, top), ty[::-1]])
    px, py = transform_points(src, dst, xs, ys)
    return float(np.min(px)), float(np.min(py)), float(np.max(px)), float(np.max(py))


def transform_geom(src: CRS, dst: CRS, rings: list) -> list:
    """Reproject polygon rings (list of (N,2) vertex arrays) src -> dst.

    Semantics of rasterio.warp.transform_geom as used by clip
    (/root/reference/rioxarray/raster_array.py:829-831), without densification.
    """
    out = []
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        x, y = transform_points(src, dst, r[:, 0], r[:, 1])
        out.append(np.stack([x, y], axis=1))
    return out
