"""Event-stream operators (tumbling windows + gap sessionization).

Ray Data has no event-time windowing (SURVEY.md §2.9) — the engine treats
the events table as a keyed log: partition by ``user_id``, sort by ``ts``
within the group, and window with vectorized pandas inside ``map_groups``
(the guide's canonical stream-shaped recipe).  Both ops are SQL-expressible
so the driver gate checks them exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window(ds, unit: str = "hour"):
    """(user_id, window) -> count + min/max event id; see q_events_window."""
    from ray.data.aggregate import Count, Max, Min

    def window(batch: pa.Table) -> pa.Table:
        return batch.append_column("win", pc.floor_temporal(batch["ts"], unit=unit))

    return (
        ds.map_batches(window, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "win"])
        .aggregate(
            Count(alias_name="n"),
            Min("event_id", alias_name="min_event"),
            Max("event_id", alias_name="max_event"),
        )
    )


def sessionize(ds, gap_minutes: int = 30):
    """Gap-based sessions per user: a new session starts when the time
    since the previous event exceeds ``gap_minutes``.

    Output: (user_id, session_id, n_events, first_event, last_event) with
    ``session_id`` = 0-based session ordinal per user.  The groupby ships
    only (event_id, ts, user_id) — pre-projected, no payload columns.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        # (ts, event_id) matches the oracle's ORDER BY — without the id
        # tie-break, equal-timestamp events make the split nondeterministic
        g = group.sort_values(["ts", "event_id"], kind="stable")
        # timedelta comparison is unit-safe (datetime64[us] vs [ns] both work)
        diffs = g["ts"].diff()
        new_session = (diffs.isna() | (diffs > gap)).to_numpy()
        sid = np.cumsum(new_session) - 1
        g = g.assign(session_id=sid.astype(np.int64))
        out = (
            g.groupby("session_id", sort=True)
            .agg(
                n_events=("event_id", "size"),
                first_event=("event_id", "min"),
                last_event=("event_id", "max"),
            )
            .reset_index()
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    return (
        ds.select_columns(["event_id", "ts", "user_id"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pandas")
    )


def sessionize_scalable(ds, gap_minutes: int = 30, bucket_hours: int = 24):
    """Two-phase gap sessionization — the SKEW-SAFE plan (same output as
    :func:`sessionize`, gated against the same SQL oracle).

    A single ``groupby(user_id)`` holds a whole user's history in one
    reducer — unbounded on a skewed user.  Here:

    phase A: group by (user_id, time bucket) and sessionize locally — a
      reducer holds at most one user-bucket (``bucket_hours`` of one user);
      emit one SUMMARY row per local session (n, min/max event id, span).
    phase B: group the summaries by user (tiny: one row per session, not
      per event) and merge consecutive summaries whose gap <= the session
      gap — exact, because a local split at a bucket boundary is the only
      split phase A can introduce beyond true gaps, and the summary merge
      heals exactly those.  Aggregates compose (sum/min/max), so the
      merged rows equal the single-pass output row-for-row.
    """
    gap = pd.Timedelta(minutes=gap_minutes)
    bucket_ns = int(bucket_hours) * 3_600_000_000_000

    def bucketize(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.timestamp("ns")).cast(pa.int64())
        bucket = pc.divide(ts, bucket_ns)
        return batch.append_column("bucket", bucket)

    def local_sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"], kind="stable")
        diffs = g["ts"].diff()
        new_session = (diffs.isna() | (diffs > gap)).to_numpy()
        sid = np.cumsum(new_session) - 1
        g = g.assign(_sid=sid)
        out = (
            g.groupby("_sid", sort=True)
            .agg(
                n_events=("event_id", "size"),
                first_event=("event_id", "min"),
                last_event=("event_id", "max"),
                start_ts=("ts", "min"),
                end_ts=("ts", "max"),
            )
            .reset_index(drop=True)
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    def merge_user(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["start_ts", "first_event"], kind="stable"
        ).reset_index(drop=True)
        starts = g["start_ts"].to_numpy()
        ends = g["end_ts"].to_numpy()
        prev_end = np.maximum.accumulate(ends)
        new_s = np.ones(len(g), dtype=bool)
        new_s[1:] = (starts[1:] - prev_end[:-1]) > gap.to_timedelta64()
        sid = np.cumsum(new_s) - 1
        merged = (
            g.assign(session_id=sid.astype(np.int64))
            .groupby("session_id", sort=True)
            .agg(
                n_events=("n_events", "sum"),
                first_event=("first_event", "min"),
                last_event=("last_event", "max"),
            )
            .reset_index()
        )
        merged.insert(0, "user_id", g["user_id"].iloc[0])
        return merged

    summaries = (
        ds.select_columns(["event_id", "ts", "user_id"])
        .map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "bucket"])
        .map_groups(local_sessions, batch_format="pandas")
    )
    return summaries.groupby("user_id").map_groups(
        merge_user, batch_format="pandas"
    )
