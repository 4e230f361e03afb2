"""Event-stream operators (tumbling windows + gap sessionization).

Ray Data has no event-time windowing (SURVEY.md §2.9) — the engine treats
the events table as a keyed log: partition by ``user_id``, sort by ``ts``
within the group, and window with numpy segment kernels inside
``map_groups`` (Arrow end-to-end; ``np.*.reduceat`` does the per-session
aggregation without a pandas conversion).  Both ops are SQL-expressible so
the driver gate checks them exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_NS_PER_MIN = 60_000_000_000


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


def hopping_window(ds, size_hours: int = 3, hop_hours: int = 1):
    """Overlapping (hopping/sliding) event-time windows: every event lands
    in ``size/hop`` windows (size must be a multiple of hop).  The window
    assignment is a vectorized k-fold fan-out inside ``map_batches`` (one
    shifted copy of the batch per hop offset — flat-map shape, no Python
    per-row work), then one (user, window-start) groupby.  ``win_start``
    is epoch seconds so the oracle compares integers exactly.
    """
    if size_hours % hop_hours:
        raise ValueError("size_hours must be a multiple of hop_hours")
    k = size_hours // hop_hours
    hop_s = hop_hours * 3600
    from ray.data.aggregate import Count, Max, Min

    def fan_out(batch: pa.Table) -> pa.Table:
        ts_s = _ts_ns(batch["ts"]) // 1_000_000_000
        bucket = (ts_s // hop_s) * hop_s
        eid = batch["event_id"].combine_chunks()
        uid = batch["user_id"].combine_chunks()
        tables = []
        for i in range(k):
            tables.append(
                pa.Table.from_arrays(
                    [uid, eid, pa.array(bucket - i * hop_s, pa.int64())],
                    names=["user_id", "event_id", "win_start"],
                )
            )
        return pa.concat_tables(tables)

    return (
        ds.select_columns(["event_id", "ts", "user_id"])
        .map_batches(fan_out, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "win_start"])
        .aggregate(
            Count(alias_name="n"),
            Min("event_id", alias_name="min_event"),
            Max("event_id", alias_name="max_event"),
        )
    )


def _ts_ns(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp column -> int64 nanoseconds (unit-safe)."""
    return (
        col.cast(pa.timestamp("ns"))
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[ns]")
        .astype(np.int64)
    )


def _uid_column(group: pa.Table, n: int) -> pa.Array:
    uid = group["user_id"][0].as_py()
    return pa.array([uid] * n, group.schema.field("user_id").type)


def _segment_sessions(ts: np.ndarray, eid: np.ndarray, gap_ns: int):
    """Sorted-by-(ts, eid) arrays -> (starts, ends) segment offsets where a
    segment breaks when the time since the previous event exceeds gap_ns.
    The (ts, event_id) sort order matches the oracle's ORDER BY — without
    the id tie-break, equal-timestamp events split nondeterministically."""
    new_session = np.empty(len(ts), dtype=bool)
    new_session[0] = True
    new_session[1:] = np.diff(ts) > gap_ns
    starts = np.flatnonzero(new_session)
    ends = np.append(starts[1:], len(ts))
    return starts, ends


def sessionize(ds, gap_minutes: int = 30):
    """Gap-based sessions per user: a new session starts when the time
    since the previous event exceeds ``gap_minutes``.

    Output: (user_id, session_id, n_events, first_event, last_event) with
    ``session_id`` = 0-based session ordinal per user.  The groupby ships
    only (event_id, ts, user_id) — pre-projected, no payload columns.
    """
    gap_ns = int(gap_minutes) * _NS_PER_MIN

    def sessions(group: pa.Table) -> pa.Table:
        ts = _ts_ns(group["ts"])
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts, eid = ts[order], eid[order]
        starts, ends = _segment_sessions(ts, eid, gap_ns)
        k = len(starts)
        return pa.Table.from_pydict(
            {
                "user_id": _uid_column(group, k),
                "session_id": pa.array(np.arange(k, dtype=np.int64)),
                "n_events": pa.array((ends - starts).astype(np.int64)),
                "first_event": pa.array(np.minimum.reduceat(eid, starts)),
                "last_event": pa.array(np.maximum.reduceat(eid, starts)),
            }
        )

    return (
        ds.select_columns(["event_id", "ts", "user_id"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pyarrow")
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
    gap_ns = int(gap_minutes) * _NS_PER_MIN
    bucket_ns = int(bucket_hours) * 3_600_000_000_000

    def bucketize(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.timestamp("ns")).cast(pa.int64())
        bucket = pc.divide(ts, bucket_ns)
        return batch.append_column("bucket", bucket)

    def local_sessions(group: pa.Table) -> pa.Table:
        ts = _ts_ns(group["ts"])
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts, eid = ts[order], eid[order]
        starts, ends = _segment_sessions(ts, eid, gap_ns)
        k = len(starts)
        return pa.Table.from_pydict(
            {
                "user_id": _uid_column(group, k),
                "n_events": pa.array((ends - starts).astype(np.int64)),
                "first_event": pa.array(np.minimum.reduceat(eid, starts)),
                "last_event": pa.array(np.maximum.reduceat(eid, starts)),
                "start_ts": pa.array(ts[starts].view("datetime64[ns]")),
                "end_ts": pa.array(
                    np.maximum.reduceat(ts, starts).view("datetime64[ns]")
                ),
            }
        )

    def merge_user(group: pa.Table) -> pa.Table:
        starts_ts = _ts_ns(group["start_ts"])
        ends_ts = _ts_ns(group["end_ts"])
        first = group["first_event"].to_numpy(zero_copy_only=False)
        last = group["last_event"].to_numpy(zero_copy_only=False)
        n = group["n_events"].to_numpy(zero_copy_only=False)
        order = np.lexsort((first, starts_ts))
        starts_ts, ends_ts = starts_ts[order], ends_ts[order]
        first, last, n = first[order], last[order], n[order]
        prev_end = np.maximum.accumulate(ends_ts)
        new_s = np.ones(len(n), dtype=bool)
        new_s[1:] = (starts_ts[1:] - prev_end[:-1]) > gap_ns
        seg = np.flatnonzero(new_s)
        k = len(seg)
        return pa.Table.from_pydict(
            {
                "user_id": _uid_column(group, k),
                "session_id": pa.array(np.arange(k, dtype=np.int64)),
                "n_events": pa.array(
                    np.add.reduceat(n, seg).astype(np.int64)
                ),
                "first_event": pa.array(np.minimum.reduceat(first, seg)),
                "last_event": pa.array(np.maximum.reduceat(last, seg)),
            }
        )

    summaries = (
        ds.select_columns(["event_id", "ts", "user_id"])
        .map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "bucket"])
        .map_groups(local_sessions, batch_format="pyarrow")
    )
    return summaries.groupby("user_id").map_groups(
        merge_user, batch_format="pyarrow"
    )


def funnel(ds, steps=("signup", "click", "purchase"),
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type"):
    """Funnel analysis: per user, how far through an ordered step
    sequence did they get, first-touch semantics — t_k = MIN ts of a
    step-k event at or after t_{k-1}.  MIN-based, so the result is a
    pure function of the event multiset (ties and arrival order can't
    change it — what makes the SQL gate exact).

    100-TB shape: ONE groupby(user) co-shuffle (the sessionize
    assumption: a user's history fits a task — salted two-phase variant
    applies the same way if not); per-group work is vectorized numpy.
    Returns (user_id, step_reached, t1..tk as epoch micros, -1 where
    unreached).
    """
    steps = tuple(steps)
    k = len(steps)

    def per_user(group: pa.Table) -> pa.Table:
        ts = _ts_ns(group[ts_col]) // 1000  # epoch micros
        et = group[type_col].to_numpy(zero_copy_only=False)
        out_t = np.full(k, -1, dtype=np.int64)
        lo = None
        for i, step in enumerate(steps):
            m = et == step
            if lo is not None:
                m = m & (ts >= lo)
            if not m.any():
                break
            lo = ts[m].min()
            out_t[i] = lo
        reached = int((out_t >= 0).sum())
        cols = {
            user_col: _uid_column(group, 1),
            "step_reached": pa.array([reached], pa.int64()),
        }
        for i in range(k):
            cols[f"t{i + 1}"] = pa.array([out_t[i]], pa.int64())
        return pa.Table.from_pydict(cols)

    return ds.groupby(user_col).map_groups(per_user, batch_format="pyarrow")


def retention(ds, anchor_type: str = "signup", bucket_hours: int = 24,
              user_col: str = "user_id", ts_col: str = "ts",
              type_col: str = "event_type"):
    """Cohort retention: users cohorted by the time-bucket of their
    FIRST ``anchor_type`` event; for every later activity bucket, count
    how many cohort members were active ``k`` buckets after their
    anchor.  Returns (cohort, k, n_users) — the classic retention
    triangle, integer-exact.

    Plan (two small shuffles, both over slim relations):
    1. anchors: groupby(user) MIN ts of anchor events -> (user, cohort)
       — count rows == users, not events;
    2. activity: per-batch (user, bucket) dedup (combiner) then a keyed
       groupby makes it globally DISTINCT; hash-join to anchors on user
       (no broadcast of the unbounded user set); k = bucket -
       anchor_bucket >= 0; ONE groupby((cohort, k)) count finishes the
       triangle (rows are unique per user by construction).
    """
    from ray.data.aggregate import Min

    bucket_us = bucket_hours * 3_600_000_000

    def to_anchor(batch: pa.Table) -> pa.Table:
        et = batch[type_col].to_numpy(zero_copy_only=False)
        keep = pa.array(et == anchor_type)
        sub = batch.filter(keep)
        ts = _ts_ns(sub[ts_col]) // 1000
        return pa.table(
            {user_col: sub[user_col],
             "anchor_us": pa.array(ts, pa.int64())}
        )

    from ..sources.io import coerce_empty_blocks

    anchors = coerce_empty_blocks(
        ds.map_batches(to_anchor, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(user_col)
        .aggregate(Min("anchor_us", alias_name="anchor_us"))
    )

    def to_buckets(batch: pa.Table) -> pa.Table:
        ts = _ts_ns(batch[ts_col]) // 1000
        b = ts // bucket_us
        uid = batch[user_col].to_numpy(zero_copy_only=False)
        uniq = np.unique(np.stack([uid, b], axis=1), axis=0)
        return pa.table(
            {user_col: pa.array(uniq[:, 0], pa.int64()),
             "bucket": pa.array(uniq[:, 1], pa.int64())}
        )

    activity = coerce_empty_blocks(
        ds.map_batches(to_buckets, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby([user_col, "bucket"])
        .count()
        .drop_columns(["count()"])
    )
    joined = activity.join(anchors, "inner", 8, on=(user_col,))

    def relate(batch: pa.Table) -> pa.Table:
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        a = batch["anchor_us"].to_numpy(zero_copy_only=False) // bucket_us
        k = b - a
        keep = k >= 0
        return pa.table(
            {"cohort": pa.array(a[keep], pa.int64()),
             "k": pa.array(k[keep], pa.int64())}
        )

    # (cohort, k) rows are globally unique per user here — activity was
    # made DISTINCT by the (user, bucket) groupby and the anchor join is
    # 1:1 per user — so one count() finishes the triangle.
    rel = joined.map_batches(relate, batch_format="pyarrow")
    return rel.groupby(["cohort", "k"]).count().map_batches(
        lambda t: pa.table(
            {
                "cohort": t["cohort"],
                "k": t["k"],
                "n_users": pc.cast(t["count()"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
