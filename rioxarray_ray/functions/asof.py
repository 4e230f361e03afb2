"""Distributed ASOF join — each left row matched to the single right row
with the greatest right timestamp <= the left timestamp, per key (the
classic event->latest-state join; one of the custom operators the brief
calls out that Ray Data lacks natively).

100-TB plan shape: both sides stay Datasets.  Each side is projected to a
shared (key, ts, side, payload...) schema, unioned, and co-partitioned by
ONE ``groupby(key)`` — the only shuffle.  Inside each group a vectorized
``np.searchsorted`` over the time-sorted right side resolves every left
row at once (no per-row Python).  Partitioning assumption (documented per
the brief): a single key's rows fit in one task — keys are users /
devices / accounts, whose per-key history is bounded; a pathological key
would need a time-bucket pre-split like events.sessionize_scalable's.

Ties on the right timestamp break deterministically by the LARGEST
``right_tie`` column value, so output is partitioning-independent.
Inner semantics: left rows with no prior right row are dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def asof_join(
    left_ds,
    right_ds,
    *,
    key,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    right_tie: str,
):
    """``key`` is the join column name, or a (left_name, right_name)
    pair when the two sides name it differently.

    Returns columns: left_key, left_cols..., left_ts, right_cols...

    ``right_tie`` must be one of ``right_cols`` (or the ts) — the
    deterministic winner among right rows sharing the match timestamp.
    """
    if right_tie not in right_cols and right_tie != right_ts:
        raise ValueError("right_tie must be a right-side column")

    left_key, right_key = (key, key) if isinstance(key, str) else key
    l_pay = [c for c in left_cols if c != left_key]
    r_pay = [c for c in right_cols if c != right_key]
    # concrete null types so the two projected sides share ONE schema
    l_types = {c: left_ds.schema().base_schema.field(c).type for c in l_pay}
    r_types = {c: right_ds.schema().base_schema.field(c).type for c in r_pay}

    def project_left(batch: pa.Table) -> pa.Table:
        cols = {
            "k": batch[left_key],
            "ts": batch[left_ts],
            "side": pa.array(["L"] * batch.num_rows, pa.string()),
        }
        for c in l_pay:
            cols[f"l_{c}"] = batch[c]
        for c in r_pay:
            cols[f"r_{c}"] = pa.nulls(batch.num_rows, r_types[c])
        return pa.Table.from_pydict(cols)

    def project_right(batch: pa.Table) -> pa.Table:
        cols = {
            "k": batch[right_key],
            "ts": batch[right_ts],
            "side": pa.array(["R"] * batch.num_rows, pa.string()),
        }
        for c in l_pay:
            cols[f"l_{c}"] = pa.nulls(batch.num_rows, l_types[c])
        for c in r_pay:
            cols[f"r_{c}"] = batch[c]
        return pa.Table.from_pydict(cols)

    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    both = left_ds.map_batches(project_left, **kw).union(
        right_ds.map_batches(project_right, **kw)
    )

    def resolve(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        is_l = side == "L"
        is_r = ~is_l
        n_l, n_r = int(is_l.sum()), int(is_r.sum())
        empty_schema = pa.schema(
            [group.schema.field("k")]
            + [pa.field(f"l_{c}", group.schema.field(f"l_{c}").type)
               for c in l_pay]
            + [pa.field("ts", group.schema.field("ts").type)]
            + [pa.field(f"r_{c}", group.schema.field(f"r_{c}").type)
               for c in r_pay]
        )
        if n_l == 0 or n_r == 0:
            return pa.Table.from_pylist([], schema=empty_schema)
        r_idx = np.flatnonzero(is_r)
        tie = group[f"r_{right_tie}" if right_tie != right_ts else "ts"]
        tie_np = tie.to_numpy(zero_copy_only=False)[r_idx]
        order = np.lexsort((tie_np, ts[r_idx]))  # ts asc, tie asc
        r_sorted = r_idx[order]
        l_idx = np.flatnonzero(is_l)
        # latest right ts <= left ts; equal-ts ties land on the max tie
        pos = np.searchsorted(ts[r_sorted], ts[l_idx], side="right") - 1
        ok = pos >= 0
        l_keep = l_idx[ok]
        r_match = r_sorted[pos[ok]]
        cols = {"k": group["k"].take(pa.array(l_keep, pa.int64()))}
        for c in l_pay:
            cols[f"l_{c}"] = group[f"l_{c}"].take(pa.array(l_keep, pa.int64()))
        cols["ts"] = group["ts"].take(pa.array(l_keep, pa.int64()))
        for c in r_pay:
            cols[f"r_{c}"] = group[f"r_{c}"].take(pa.array(r_match, pa.int64()))
        return pa.Table.from_pydict(cols)

    out = both.groupby("k").map_groups(resolve, batch_format="pyarrow")

    def rename(batch: pa.Table) -> pa.Table:
        names = ["k"] + [f"l_{c}" for c in l_pay] + ["ts"] + [
            f"r_{c}" for c in r_pay
        ]
        batch = batch.select(names)
        return batch.rename_columns(
            [left_key] + l_pay + [left_ts] + r_pay
        )

    return out.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def interval_join(
    left_ds,
    right_ds,
    *,
    key,
    left_ts: str,
    right_start: str,
    right_end: str,
    left_cols: list[str],
    right_cols: list[str],
):
    """Distributed INTERVAL join — each left row matched to EVERY right
    interval ``[start, end)`` containing its timestamp, per key (the
    point-in-interval / range-join operator; multi-match, inner
    semantics).  Another custom operator Ray Data lacks natively.

    100-TB plan shape: identical to ``asof_join`` — both sides stay
    Datasets, project to one shared schema, union, ONE ``groupby(key)``
    shuffle.  Inside each group the candidate window per left row is
    bounded by the group's max interval length: rights are sorted by
    start, two ``np.searchsorted`` calls bound the candidates in
    ``(ts - max_len, ts]``, and the pair set is expanded with
    ``np.repeat`` + arange offsets (the same vectorized expansion as the
    LSH bucket pairs) then filtered by ``end > ts`` — no per-row Python.
    Worst case degrades with one pathologically long interval in a group
    (it widens every candidate window); split such rights into chained
    sub-intervals upstream if that shape exists.  Partitioning
    assumption: one key's rows fit in one task (same contract and same
    time-bucket salting escape hatch as sessionize_scalable).
    """
    left_key, right_key = (key, key) if isinstance(key, str) else key
    l_pay = [c for c in left_cols if c != left_key]
    r_pay = [c for c in right_cols if c != right_key]
    l_types = {c: left_ds.schema().base_schema.field(c).type for c in l_pay}
    r_types = {c: right_ds.schema().base_schema.field(c).type for c in r_pay}
    ts_type = left_ds.schema().base_schema.field(left_ts).type

    def project_left(batch: pa.Table) -> pa.Table:
        cols = {
            "k": batch[left_key],
            "ts": batch[left_ts],
            "end": pa.nulls(batch.num_rows, ts_type),
            "side": pa.array(["L"] * batch.num_rows, pa.string()),
        }
        for c in l_pay:
            cols[f"l_{c}"] = batch[c]
        for c in r_pay:
            cols[f"r_{c}"] = pa.nulls(batch.num_rows, r_types[c])
        return pa.Table.from_pydict(cols)

    def project_right(batch: pa.Table) -> pa.Table:
        cols = {
            "k": batch[right_key],
            "ts": batch[right_start],
            "end": pc.cast(batch[right_end], ts_type),
            "side": pa.array(["R"] * batch.num_rows, pa.string()),
        }
        for c in l_pay:
            cols[f"l_{c}"] = pa.nulls(batch.num_rows, l_types[c])
        for c in r_pay:
            cols[f"r_{c}"] = batch[c]
        return pa.Table.from_pydict(cols)

    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    both = left_ds.map_batches(project_left, **kw).union(
        right_ds.map_batches(project_right, **kw)
    )

    out_schema_fields = None

    def resolve(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False).astype("int64")
        is_l = side == "L"
        is_r = ~is_l
        empty = pa.schema(
            [group.schema.field("k")]
            + [pa.field(f"l_{c}", group.schema.field(f"l_{c}").type)
               for c in l_pay]
            + [pa.field("ts", group.schema.field("ts").type)]
            + [pa.field(f"r_{c}", group.schema.field(f"r_{c}").type)
               for c in r_pay]
        )
        if not is_l.any() or not is_r.any():
            return pa.Table.from_pylist([], schema=empty)
        r_idx = np.flatnonzero(is_r)
        ends = (
            group["end"].to_numpy(zero_copy_only=False).astype("int64")[r_idx]
        )
        starts = ts[r_idx]
        order = np.argsort(starts, kind="stable")
        r_sorted = r_idx[order]
        s_sorted = starts[order]
        e_sorted = ends[order]
        max_len = int((e_sorted - s_sorted).max())
        if max_len <= 0:
            return pa.Table.from_pylist([], schema=empty)
        l_idx = np.flatnonzero(is_l)
        lts = ts[l_idx]
        lo = np.searchsorted(s_sorted, lts - max_len, side="left")
        hi = np.searchsorted(s_sorted, lts, side="right")
        counts = hi - lo
        cand_l = np.repeat(np.arange(l_idx.size), counts)
        # arange-offset expansion: for left i, candidates lo[i]..hi[i]-1
        cum = np.concatenate([[0], np.cumsum(counts)])
        cand_r = np.arange(cum[-1]) - np.repeat(cum[:-1], counts) + np.repeat(
            lo, counts
        )
        keep = e_sorted[cand_r] > lts[cand_l]
        lk = l_idx[cand_l[keep]]
        rk = r_sorted[cand_r[keep]]
        cols = {"k": group["k"].take(pa.array(lk, pa.int64()))}
        for c in l_pay:
            cols[f"l_{c}"] = group[f"l_{c}"].take(pa.array(lk, pa.int64()))
        cols["ts"] = group["ts"].take(pa.array(lk, pa.int64()))
        for c in r_pay:
            cols[f"r_{c}"] = group[f"r_{c}"].take(pa.array(rk, pa.int64()))
        return pa.Table.from_pydict(cols, schema=empty)

    out = both.groupby("k").map_groups(resolve, batch_format="pyarrow")

    def rename(batch: pa.Table) -> pa.Table:
        names = ["k"] + [f"l_{c}" for c in l_pay] + ["ts"] + [
            f"r_{c}" for c in r_pay
        ]
        batch = batch.select(names)
        return batch.rename_columns([left_key] + l_pay + [left_ts] + r_pay)

    return out.map_batches(rename, batch_format="pyarrow",
                           zero_copy_batch=True)
