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

    # triangle store: parallel numpy arrays grown geometrically, with a
    # live mask; compacted when the dead fraction exceeds 1/2 so every
    # insertion's circumcircle test is one vectorized pass over ~live
    # triangles (amortized near-linear instead of O(n^2) python scans)
    cap = 16
    tris_a = np.zeros((cap, 3), dtype=np.int64)
    cc_a = np.zeros((cap, 2), dtype=np.float64)
    r2_a = np.zeros(cap, dtype=np.float64)
    alive = np.zeros(cap, dtype=bool)
    tris_a[0] = (s0, s1, s2)
    c0_, r0_ = _circum(allp, tris_a[:1])
    cc_a[0] = c0_[0]
    r2_a[0] = r0_[0]
    alive[0] = True
    m = 1  # high-water mark

    def grow(need):
        nonlocal cap, tris_a, cc_a, r2_a, alive
        while m + need > cap:
            cap *= 2
            tris_a = np.resize(tris_a, (cap, 3))
            cc_a = np.resize(cc_a, (cap, 2))
            r2_a = np.resize(r2_a, cap)
            alive = np.resize(alive, cap)
            alive[m:] = False

    def compact():
        nonlocal m, tris_a, cc_a, r2_a, alive
        keep = np.nonzero(alive[:m])[0]
        k = len(keep)
        tris_a[:k] = tris_a[keep]
        cc_a[:k] = cc_a[keep]
        r2_a[:k] = r2_a[keep]
        alive[:m] = False
        alive[:k] = True
        m = k

    # randomized insertion order (deterministic seed) keeps cavities small
    order = np.random.default_rng(0).permutation(n)
    for ip in order:
        p = allp[ip]
        if m > 64 and alive[:m].sum() * 2 < m:
            compact()
        d2 = (cc_a[:m, 0] - p[0]) ** 2 + (cc_a[:m, 1] - p[1]) ** 2
        bad = alive[:m] & (d2 <= r2_a[:m] * (1.0 + 1e-12))
        bad_tris = np.nonzero(bad)[0]
        if len(bad_tris) == 0:
            # numerical corner: force-include the containing triangle
            hit = None
            for i in np.nonzero(alive[:m])[0]:
                if _in_triangle(allp, tris_a[i], p):
                    hit = i
                    break
            if hit is None:
                continue
            bad_tris = np.array([hit])
        # cavity boundary = edges appearing exactly once among bad triangles
        edge_count: dict[tuple[int, int], int] = {}
        for i in bad_tris:
            a, b, c = (int(v) for v in tris_a[i])
            for e in ((a, b), (b, c), (c, a)):
                key = (min(e), max(e))
                edge_count[key] = edge_count.get(key, 0) + 1
            alive[i] = False
        new_tris = [
            (a, b, int(ip)) for (a, b), cnt in edge_count.items() if cnt == 1
        ]
        if new_tris:
            grow(len(new_tris))
            nt = np.asarray(new_tris, dtype=np.int64)
            c_, r_ = _circum(allp, nt)
            tris_a[m : m + len(nt)] = nt
            cc_a[m : m + len(nt)] = c_
            r2_a[m : m + len(nt)] = r_
            alive[m : m + len(nt)] = True
            m += len(nt)
    live = tris_a[:m][alive[:m]]
    keep = (live < n).all(axis=1)
    return live[keep].astype(np.int64).reshape(-1, 3)


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


def estimate_gradients(
    points: np.ndarray, values: np.ndarray, tris: np.ndarray
) -> np.ndarray:
    """Per-vertex (df/dx, df/dy) by inverse-square-weighted least squares
    over Delaunay edge neighbors (the public local-plane-fit estimator;
    scipy's global Nielson scheme differs only in smoothing)."""
    pts = np.asarray(points, np.float64)
    vals = np.asarray(values, np.float64)
    n = len(pts)
    # undirected edge list from the triangulation, both directions
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    e = np.concatenate([e, e[:, ::-1]])
    src, dst = e[:, 0], e[:, 1]
    d = pts[dst] - pts[src]
    df = vals[dst] - vals[src]
    w = 1.0 / np.maximum((d * d).sum(axis=1), 1e-30)
    sxx = np.zeros(n)
    sxy = np.zeros(n)
    syy = np.zeros(n)
    sxf = np.zeros(n)
    syf = np.zeros(n)
    np.add.at(sxx, src, w * d[:, 0] * d[:, 0])
    np.add.at(sxy, src, w * d[:, 0] * d[:, 1])
    np.add.at(syy, src, w * d[:, 1] * d[:, 1])
    np.add.at(sxf, src, w * d[:, 0] * df)
    np.add.at(syf, src, w * d[:, 1] * df)
    det = sxx * syy - sxy * sxy
    det = np.where(np.abs(det) < 1e-30, 1e-30, det)
    gx = (syy * sxf - sxy * syf) / det
    gy = (sxx * syf - sxy * sxf) / det
    return np.stack([gx, gy], axis=1)


def interpolate_cubic(
    points: np.ndarray, values: np.ndarray, query: np.ndarray
) -> np.ndarray:
    """Cubic scattered interpolation: Hermite blend over the Delaunay
    triangulation with least-squares gradient estimates — the
    griddata(method='cubic') role (/root/reference/rioxarray/
    raster_array.py:863-966).  Within a triangle,

        f(q) = sum_i  w_i(q) * [f_i + g_i . (q - V_i)],
        w_i = l_i^2 (3 - 2 l_i) / sum_j l_j^2 (3 - 2 l_j),

    which interpolates values AND gradients at the vertices (w_i -> 1 with
    zero slope at V_i), reproduces planes exactly, and is cubic along
    edges.  NaN outside the convex hull (the griddata contract).  Parity
    with scipy's Clough-Tocher element is to smoothing tolerance, not
    bitwise (the module docstring's caveat applies)."""
    tris = delaunay(points)
    pts = np.asarray(points, dtype=np.float64)
    vals = np.asarray(values, dtype=np.float64)
    q = np.asarray(query, dtype=np.float64)
    out = np.full(len(q), np.nan)
    if len(tris) == 0:
        return out
    grads = estimate_gradients(pts, vals, tris)
    a = pts[tris[:, 0]]
    b = pts[tris[:, 1]]
    c = pts[tris[:, 2]]
    det = (b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0]) + (
        c[:, 0] - b[:, 0]
    ) * (a[:, 1] - c[:, 1])
    det = np.where(np.abs(det) < 1e-300, 1e-300, det)
    unresolved = np.arange(len(q))
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
        if not inside.any():
            continue
        idx = unresolved[inside]
        lam = np.stack([l1[inside], l2[inside], l3[inside]], axis=1)
        w = lam * lam * (3.0 - 2.0 * lam)
        w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-300)
        acc = np.zeros(len(idx))
        for vi, V in enumerate(tris[t]):
            taylor = vals[V] + (
                (q[idx] - pts[V]) * grads[V][None, :]
            ).sum(axis=1)
            acc += w[:, vi] * taylor
        out[idx] = acc
        unresolved = unresolved[~inside]
    return out


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
