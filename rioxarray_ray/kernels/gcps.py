"""Ground control points: GeoJSON round-trip.

Mirrors the GCP <-> GeoJSON conversion of the reference
(/root/reference/rioxarray/_spatial_utils.py:271-304 and
rioxarray.py:982-1064).  GCP-BASED WARPING is explicitly flag-gated out of
the MVP (SURVEY.md §2.2): the engine stores and round-trips GCPs as a JSON
column; ``warp_from_gcps`` raises NotImplementedError until a polynomial
fit path is added.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass


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


def warp_from_gcps(*_args, **_kwargs):
    raise NotImplementedError(
        "GCP-based warping is flag-gated out of the MVP (SURVEY.md §2.2); "
        "GCPs round-trip losslessly through the 'gcps' JSON column"
    )
