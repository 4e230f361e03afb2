"""From-scratch 2-D Delaunay triangulation + barycentric interpolation.

Implements the public Bowyer-Watson incremental algorithm (Bowyer 1981 /
Watson 1981): points are inserted one at a time into a super-triangle;
triangles whose circumcircle contains the new point are removed and the
cavity is re-triangulated.  The inner circumcircle test is vectorized over
all live triangles, so insertion is a single numpy pass.

Used by ``interpolate_na(method="linear")`` — the scipy.griddata(linear)
replacement (/root/reference/rioxarray/raster_array.py:863-966).  Notes on
semantics: linear scattered interpolation is exact for PLANES regardless of
triangulation (the validation oracle in tests); for non-planar data the
result is triangulation-dependent — scipy's included — so parity with
scipy is to triangulation tolerance, not bitwise.
"""

from __future__ import annotations

import numpy as np


def delaunay(points: np.ndarray) -> np.ndarray:
    """Triangulate (n, 2) points; returns (m, 3) vertex-index triangles.

    Duplicate points are not supported (raster pixel centers never
    collide).  Requires n >= 3 and non-collinear input.
    """
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        raise ValueError("need >= 3 points")
    # super-triangle comfortably containing everything
    cmin = pts.min(axis=0)
    cmax = pts.max(axis=0)
    center = (cmin + cmax) / 2.0
    span = float(max(cmax[0] - cmin[0], cmax[1] - cmin[1], 1e-9))
    sp = np.array(
        [
            [center[0] - 20.0 * span, center[1] - 10.0 * span],
            [center[0] + 20.0 * span, center[1] - 10.0 * span],
            [center[0], center[1] + 20.0 * span],
        ]
    )
    allp = np.vstack([pts, sp])
    s0, s1, s2 = n, n + 1, n + 2

    # triangle store as a growing array; circumcenters/radii cached
    tris = [(s0, s1, s2)]
    cc, r2 = _circum(allp, np.array(tris))
    cc = list(cc)
    r2 = list(r2)
    alive = [True]

    # randomized insertion order (deterministic seed) keeps cavities small
    order = np.random.default_rng(0).permutation(n)
    for ip in order:
        p = allp[ip]
        live_idx = [i for i, a in enumerate(alive) if a]
        ccs = np.array([cc[i] for i in live_idx])
        rr = np.array([r2[i] for i in live_idx])
        d2 = (ccs[:, 0] - p[0]) ** 2 + (ccs[:, 1] - p[1]) ** 2
        bad = d2 <= rr * (1.0 + 1e-12)
        bad_tris = [live_idx[i] for i in np.nonzero(bad)[0]]
        if not bad_tris:
            # numerical corner: force-include the containing triangle
            for i in live_idx:
                if _in_triangle(allp, tris[i], p):
                    bad_tris = [i]
                    break
            if not bad_tris:
                continue
        # cavity boundary = edges appearing exactly once among bad triangles
        edge_count: dict[tuple[int, int], int] = {}
        for i in bad_tris:
            a, b, c = tris[i]
            for e in ((a, b), (b, c), (c, a)):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
            alive[i] = False
        for (a, b), cnt in edge_count.items():
            if cnt != 1:
                continue
            tri = (a, b, int(ip))
            tris.append(tri)
            c_, r_ = _circum(allp, np.array([tri]))
            cc.append(c_[0])
            r2.append(r_[0])
            alive.append(True)
    out = [
        t
        for t, a in zip(tris, alive)
        if a and all(v < n for v in t)
    ]
    return np.array(out, dtype=np.int64).reshape(-1, 3)


def _circum(allp: np.ndarray, tris: np.ndarray):
    """Circumcenters + squared radii for (m, 3) triangles (vectorized)."""
    a = allp[tris[:, 0]]
    b = allp[tris[:, 1]]
    c = allp[tris[:, 2]]
    d = 2.0 * (
        a[:, 0] * (b[:, 1] - c[:, 1])
        + b[:, 0] * (c[:, 1] - a[:, 1])
        + c[:, 0] * (a[:, 1] - b[:, 1])
    )
    d = np.where(np.abs(d) < 1e-30, 1e-30, d)
    a2 = (a**2).sum(axis=1)
    b2 = (b**2).sum(axis=1)
    c2 = (c**2).sum(axis=1)
    ux = (
        a2 * (b[:, 1] - c[:, 1]) + b2 * (c[:, 1] - a[:, 1]) + c2 * (a[:, 1] - b[:, 1])
    ) / d
    uy = (
        a2 * (c[:, 0] - b[:, 0]) + b2 * (a[:, 0] - c[:, 0]) + c2 * (b[:, 0] - a[:, 0])
    ) / d
    cc = np.stack([ux, uy], axis=1)
    r2 = ((a - cc) ** 2).sum(axis=1)
    return cc, r2


def _in_triangle(allp, tri, p) -> bool:
    a, b, c = allp[tri[0]], allp[tri[1]], allp[tri[2]]
    d1 = _sign(p, a, b)
    d2 = _sign(p, b, c)
    d3 = _sign(p, c, a)
    neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
    pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
    return not (neg and pos)


def _sign(p, a, b) -> float:
    return (p[0] - b[0]) * (a[1] - b[1]) - (a[0] - b[0]) * (p[1] - b[1])


def interpolate_linear(
    points: np.ndarray, values: np.ndarray, query: np.ndarray
) -> np.ndarray:
    """Barycentric linear interpolation at query points; NaN outside the
    convex hull (scipy.griddata(method='linear') contract)."""
    tris = delaunay(points)
    pts = np.asarray(points, dtype=np.float64)
    vals = np.asarray(values, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    out = np.full(len(q), np.nan)
    if len(tris) == 0:
        return out
    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    det = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + (
        c[:, 0] - b[:, 0]
    ) * (a[:, 1] - c[:, 1])
    det = np.where(np.abs(det) < 1e-300, 1e-300, det)
    unresolved = np.arange(len(q))
    # loop over triangles in chunks, resolving queries by containment —
    # vectorized point-in-triangle via barycentric coords
    for t in range(len(tris)):
        if len(unresolved) == 0:
            break
        qq = q[unresolved]
        l1 = (
            (b[t, 1] - c[t, 1]) * (qq[:, 0] - c[t, 0])
            + (c[t, 0] - b[t, 0]) * (qq[:, 1] - c[t, 1])
        ) / det[t]
        l2 = (
            (c[t, 1] - a[t, 1]) * (qq[:, 0] - c[t, 0])
            + (a[t, 0] - c[t, 0]) * (qq[:, 1] - c[t, 1])
        ) / det[t]
        l3 = 1.0 - l1 - l2
        eps = -1e-9
        inside = (l1 >= eps) & (l2 >= eps) & (l3 >= eps)
        if inside.any():
            idx = unresolved[inside]
            v = (
                l1[inside] * vals[tris[t, 0]]
                + l2[inside] * vals[tris[t, 1]]
                + l3[inside] * vals[tris[t, 2]]
            )
            out[idx] = v
            unresolved = unresolved[~inside]
    return out
