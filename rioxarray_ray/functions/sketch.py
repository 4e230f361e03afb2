"""Distributed sketching: HyperLogLog cardinality + Count-Min frequency.

The classic web-scale "how many distinct users/URLs/docs" primitive
(Flajolet et al. 2007, "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" — public paper; no library code
reused).  At 100 TB an exact COUNT(DISTINCT) is a full shuffle of every
key; the sketch reduces it to a fixed 2^p-register table that merges by
MAX, so the only exchange is (register, rho) partials — bytes, not keys.

Determinism contract (what makes the gate possible): the hash is the
first 8 bytes of md5(utf8(value)) read little-endian — exactly DuckDB's
``md5_number_upper`` — so the register table is a pure function of the
distinct value set and SQL can replay it bit-for-bit.  The float
estimate is kept OUT of the gated output (float harmonic-mean order
isn't reproducible across engines); it's a driver-side function of the
4096-row register table, pytest-bounded against the exact count.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hash_strings(arr: pa.Array) -> np.ndarray:
    """First 8 bytes of md5, little-endian (DuckDB md5_number_upper),
    over zero-copy utf8 buffer views."""
    from ._arrowbytes import utf8_views

    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(v).digest()[:8], "little")
            for v in utf8_views(arr)
        ),
        dtype=np.uint64,
        count=len(arr),
    )


def hll_partial(batch_col, p: int) -> pa.Table:
    """(register, rho) partial maxima for one batch's values."""
    col = batch_col
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pc.cast(col, pa.string())
    u = pc.unique(pc.drop_null(s))
    if len(u) == 0:
        return pa.table(
            {"register": pa.array([], pa.int64()),
             "rho": pa.array([], pa.int64())}
        )
    hv = _hash_strings(u)
    m = np.uint64(1 << p)
    reg = (hv % m).astype(np.int64)
    w = (hv >> np.uint64(p)).astype(np.uint64)
    # exact bit length for any p in [4, 18]: w has up to 60 bits, beyond
    # float64's 53-bit mantissa, so a single frexp would round values just
    # below a power of two UP and report a bit length one too large.
    # Split into 32-bit halves (each exactly float64-representable);
    # frexp exponent == bit length (0 for w == 0).
    hi = (w >> np.uint64(32)).astype(np.float64)
    lo = (w & np.uint64(0xFFFFFFFF)).astype(np.float64)
    bitlen = np.where(hi > 0, 32 + np.frexp(hi)[1], np.frexp(lo)[1])
    rho = (64 - p) - bitlen + 1
    maxes = np.zeros(1 << p, dtype=np.int64)
    np.maximum.at(maxes, reg, rho)
    occ = np.nonzero(maxes)[0]
    return pa.table(
        {
            "register": pa.array(occ, pa.int64()),
            "rho": pa.array(maxes[occ], pa.int64()),
        }
    )


def hll_registers(ds, col: str, p: int = 12):
    """Distributed HLL register table for a column: per-batch partial
    maxima (at most 2^p rows leave any batch regardless of its size),
    merged by ONE groupby(register) Max — the sketch's native combiner.
    Returns a Dataset of (register, rho) for occupied registers.
    """
    if not 4 <= p <= 18:
        raise ValueError(f"p must be in [4, 18], got {p}")
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        return hll_partial(batch[col], p)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("register")
        .aggregate(Max("rho", alias_name="rho"))
    )


def hll_estimate(register_rows, p: int = 12) -> float:
    """Cardinality estimate from (register, rho) rows — the standard
    HLL estimator with the small-range (linear counting) correction.
    Driver-side math over <= 2^p rows."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    for r in register_rows:
        regs[r["register"]] = r["rho"]
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    v = int((regs == 0).sum())
    if e <= 2.5 * m and v > 0:
        return m * math.log(m / v)
    return float(e)


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """End-to-end approximate COUNT(DISTINCT col): ~1.04/sqrt(2^p)
    relative standard error (p=12 -> ~1.6%)."""
    return hll_estimate(hll_registers(ds, col, p).take_all(), p)


def cms_partial(batch_col, width: int, depth: int) -> pa.Table:
    """(row, col, n) Count-Min partial counts for one batch's values:
    value occurrences fold into at most width*depth cells regardless of
    batch size.  Hash_i(v) = md5(utf8(v) || ':' || i) % width — the
    Bloom/HLL md5 convention, SQL-replayable."""
    import hashlib

    from ._arrowbytes import utf8_views

    col = batch_col
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pc.cast(col, pa.string())
    enc = pc.dictionary_encode(pc.fill_null(s, ""))
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.bincount(codes, minlength=len(enc.dictionary))
    salts = [f":{i}".encode() for i in range(depth)]
    cells = np.zeros((depth, width), dtype=np.int64)
    for j, v in enumerate(utf8_views(enc.dictionary)):
        b = bytes(v)
        for i in range(depth):
            c = (
                int.from_bytes(hashlib.md5(b + salts[i]).digest()[:8],
                               "little")
                % width
            )
            cells[i, c] += counts[j]
    rr, cc = np.nonzero(cells)
    return pa.table(
        {
            "row": pa.array(rr.astype(np.int64)),
            "col": pa.array(cc.astype(np.int64)),
            "n": pa.array(cells[rr, cc]),
        }
    )


def cms_build(ds, col: str, width: int = 2048, depth: int = 4):
    """Distributed Count-Min sketch (Cormode & Muthukrishnan 2005 —
    public paper) for approximate frequency queries: per-batch partial
    cell counts (<= width*depth rows leave any batch), merged by ONE
    groupby((row, col)) Sum.  Returns the occupied-cell Dataset; the
    sketch is a deterministic function of the value multiset, so SQL can
    replay it exactly."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        return cms_partial(batch[col], width, depth)

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["row", "col"])
        .aggregate(Sum("n", alias_name="n"))
    )


def cms_query(cell_rows, values, width: int = 2048, depth: int = 4):
    """Point frequency estimates (upper bounds; overcount <= eps*N with
    prob 1-delta, eps=e/width, delta=e^-depth) from a built sketch."""
    import hashlib

    cells = np.zeros((depth, width), dtype=np.int64)
    for r in cell_rows:
        cells[r["row"], r["col"]] = r["n"]
    out = {}
    for v in values:
        b = str(v).encode()
        est = min(
            cells[i][
                int.from_bytes(
                    hashlib.md5(b + f":{i}".encode()).digest()[:8], "little"
                )
                % width
            ]
            for i in range(depth)
        )
        out[v] = int(est)
    return out
