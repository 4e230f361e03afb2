"""CF-convention datetime decoding (the ``units: "<unit> since <epoch>"``
rule, /root/reference/rioxarray/_io.py:541-613 NETCDF_DIM handling via
xarray's decode_cf).

From-scratch over numpy datetime64: supports the proleptic-Gregorian /
standard calendars (identical for post-1582 epochs, the practical corpus
case) and second/minute/hour/day units.  Exotic calendars (360_day,
noleap) are rejected explicitly rather than silently mis-decoded.
"""

from __future__ import annotations

import re

import numpy as np

_UNIT_NS = {
    "second": 1_000_000_000,
    "sec": 1_000_000_000,
    "s": 1_000_000_000,
    "minute": 60_000_000_000,
    "min": 60_000_000_000,
    "hour": 3_600_000_000_000,
    "h": 3_600_000_000_000,
    "day": 86_400_000_000_000,
    "d": 86_400_000_000_000,
    "millisecond": 1_000_000,
    "ms": 1_000_000,
    "microsecond": 1_000,
    "us": 1_000,
}

_UNITS_RE = re.compile(
    r"^\s*([A-Za-z]+?)s?\s+since\s+(.+?)\s*$", re.IGNORECASE
)

_SUPPORTED_CALENDARS = {
    None, "standard", "gregorian", "proleptic_gregorian",
}


def parse_cf_units(units: str):
    """'days since 2000-01-01[ HH:MM:SS[.f]][Z|+HH:MM]' ->
    (ns_per_step, epoch datetime64[ns])."""
    m = _UNITS_RE.match(units)
    if not m:
        raise ValueError(f"cannot parse CF time units: {units!r}")
    unit = m.group(1).lower()
    if unit not in _UNIT_NS:
        # the non-greedy regex strips the trailing 's' ('days' -> 'day')
        # which also mangles the abbreviations 'ms'/'us' -> 'm'/'u';
        # restore and retry before rejecting
        if unit + "s" in _UNIT_NS:
            unit = unit + "s"
        else:
            raise ValueError(
                f"unsupported CF time unit {unit!r} in {units!r}"
            )
    epoch_str = m.group(2).strip()
    # normalize 'T' separator and trailing Z / +00:00 offsets
    epoch_str = epoch_str.replace("T", " ").rstrip("Zz")
    offs = re.search(r"([+-]\d{2}):?(\d{2})$", epoch_str)
    tz_ns = 0
    if offs and " " in epoch_str:
        sign = 1 if offs.group(1).startswith("+") else -1
        tz_ns = sign * (
            int(offs.group(1)[1:]) * 3_600_000_000_000
            + int(offs.group(2)) * 60_000_000_000
        )
        epoch_str = epoch_str[: offs.start()].strip()
    epoch = np.datetime64(epoch_str.replace(" ", "T"), "ns") - np.timedelta64(
        tz_ns, "ns"
    )
    return _UNIT_NS[unit], epoch


def decode_cf_datetime(values, units: str, calendar: str | None = "standard"):
    """Numeric offsets + CF units string -> datetime64[ns] array
    (xarray.decode_cf semantics for the supported calendars; fractional
    offsets are honored to nanosecond resolution)."""
    if calendar not in _SUPPORTED_CALENDARS:
        raise NotImplementedError(
            f"calendar {calendar!r} is not supported (standard/"
            "proleptic_gregorian only; 360_day/noleap need a cftime table)"
        )
    step_ns, epoch = parse_cf_units(units)
    raw = np.asarray(values)
    # int64 fast path (xarray's reference decoder does integral inputs in
    # int64): float64 routing costs ~256 ns of ulp at ~1.7e18 ns offsets,
    # enough to flip a microsecond boundary after a datetime64[us] cast
    if raw.dtype.kind in "iu":
        # a uint64 above 2**63-1 WRAPS under astype(int64) (2**64-5 → -5)
        # and can then pass the magnitude guard — bounds-check unsigned
        # inputs first and fall through to the float path otherwise
        if raw.dtype.kind == "u" and raw.size and not np.all(
            raw <= np.uint64(2**63 - 1)
        ):
            pass
        else:
            iv = raw.astype(np.int64)
            if iv.size == 0 or np.all(np.abs(iv) <= (2**63 - 1) // step_ns):
                return epoch + (iv * step_ns).astype("timedelta64[ns]")
    vals = np.asarray(raw, dtype=np.float64)
    if (
        vals.size
        and np.all(np.isfinite(vals))
        and np.all(vals == np.floor(vals))
        and np.all(np.abs(vals) <= float((2**63 - 1) // step_ns))
    ):
        return epoch + (vals.astype(np.int64) * step_ns).astype(
            "timedelta64[ns]"
        )
    with np.errstate(invalid="ignore"):
        offs_ns = np.round(vals * step_ns)
        if vals.size and np.any(
            np.abs(offs_ns[np.isfinite(offs_ns)]) >= float(2**63)
        ):
            # beyond datetime64[ns] range: astype(int64) would WRAP to a
            # bogus (often pre-epoch) instant — fail loudly instead
            raise ValueError(
                f"CF time offsets under {units!r} overflow the "
                "datetime64[ns] range"
            )
    out = epoch + offs_ns.astype("timedelta64[ns]")
    return out


def encode_cf_datetime(times, units: str, calendar: str | None = "standard"):
    """datetime64 array -> numeric offsets under CF units (float64)."""
    if calendar not in _SUPPORTED_CALENDARS:
        raise NotImplementedError(f"calendar {calendar!r} is not supported")
    step_ns, epoch = parse_cf_units(units)
    t = np.asarray(times, dtype="datetime64[ns]")
    return (t - epoch).astype("timedelta64[ns]").astype(np.int64) / step_ns


def decode_time_column(ds, col: str, units: str,
                       calendar: str | None = "standard", out_col=None):
    """Ray Data stage: decode a numeric CF-time column into a timestamp
    column (vectorized per batch, zero-copy in)."""
    import pyarrow as pa

    target = out_col or col

    def decode(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_numpy(zero_copy_only=False)
        ts = decode_cf_datetime(vals, units, calendar)
        arr = pa.array(ts.astype("datetime64[us]"))
        if target in batch.schema.names:
            return batch.set_column(
                batch.schema.get_field_index(target), target, arr
            )
        return batch.append_column(target, arr)

    return ds.map_batches(decode, batch_format="pyarrow", zero_copy_batch=True)
