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
