"""Deterministic corpus sampling — the reproducible subsetting step every
large-scale training-data pipeline needs (and the distributed analogue of
the ad-hoc slicing rioxarray users do before heavy ops).

``hash_sample`` is content-stable: membership depends only on
(seed, key), never on partitioning, block order or cluster size, so a
resumed / re-partitioned / re-run job samples the SAME rows.  It is a
pure per-batch filter — no shuffle, no driver state, trivially scale-safe
at 100 TB.

The hash is DuckDB's ``md5_number_upper`` (first 8 md5 digest bytes,
little-endian) over ``f"{seed}:{key}"``, so the driver gate mirrors the
exact membership set in SQL.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def sample_mask(keys, rate_permille: int, seed: int = 0) -> np.ndarray:
    """Boolean keep-mask: md5_number_upper(f"{seed}:{key}") % 1000 < rate."""
    from ._arrowbytes import utf8_views

    n = len(keys)
    pref = pa.array([f"{seed}:"] * n, pa.string())
    salted = pc.binary_join_element_wise(pref, pc.cast(keys, pa.string()), "")
    out = np.empty(n, dtype=bool)
    for i, v in enumerate(utf8_views(salted)):
        u = int.from_bytes(hashlib.md5(v).digest()[:8], "little")
        out[i] = (u % 1000) < rate_permille
    return out


def hash_sample(ds, rate_permille: int, key_col: str = "doc_id",
                seed: int = 0):
    """Keep ~rate_permille/1000 of rows, deterministically by key."""
    if not 0 <= rate_permille <= 1000:
        raise ValueError(f"rate_permille must be in [0, 1000], got {rate_permille}")

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pa.array(sample_mask(batch[key_col], rate_permille, seed))
        )

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def quantiles_disc(ds, col: str, qs=(0.25, 0.5, 0.9, 0.99)):
    """Exact discrete quantiles (percentile_disc semantics: the value at
    1-indexed position max(1, ceil(q*n)) in sorted order) of a
    bounded-cardinality column, computed as a distributed value-histogram
    fold: ONE ``groupby(value).count()`` shuffle moves (value, count)
    rows, then the cumulative walk runs driver-side over the SMALL
    distinct-value table.

    Partitioning assumption (documented per the brief): the number of
    DISTINCT values is small (counters, token lengths, scores binned to
    ints) — the histogram, not the data, must fit on the driver.  For
    continuous columns, bin first.
    """
    import math

    rows = ds.groupby(col).count().take_all()  # small by assumption
    rows.sort(key=lambda r: r[col])
    total = sum(r["count()"] for r in rows)
    if total == 0:
        raise ValueError("quantiles_disc: empty input")
    out_q, out_v = [], []
    cum = 0
    it = iter(rows)
    cur = next(it)
    for q in sorted(qs):
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        target = max(1, math.ceil(q * total))
        while cum + cur["count()"] < target:
            cum += cur["count()"]
            cur = next(it)
        out_q.append(float(q))
        out_v.append(cur[col])
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v)})


def rank_u64(keys, seed: int = 0) -> np.ndarray:
    """Deterministic uint64 rank per key: md5_number_upper(f"{seed}:{key}")
    — same hash family as :func:`sample_mask`, so membership and ranking
    share one SQL-mirrorable primitive."""
    from ._arrowbytes import utf8_views

    n = len(keys)
    pref = pa.array([f"{seed}:"] * n, pa.string())
    salted = pc.binary_join_element_wise(pref, pc.cast(keys, pa.string()), "")
    out = np.empty(n, dtype=np.uint64)
    for i, v in enumerate(utf8_views(salted)):
        out[i] = int.from_bytes(hashlib.md5(v).digest()[:8], "little")
    return out


def _top_n_per_group(grp: np.ndarray, u: np.ndarray, keys: np.ndarray,
                     n_per_group: int) -> np.ndarray:
    """Indices of the n smallest (u, key) rows per group — vectorized
    (lexsort + change-point scan), no per-group python loop."""
    n = len(grp)
    order = np.lexsort((keys, u, grp))
    g_sorted = grp[order]
    new_grp = np.ones(n, dtype=bool)
    new_grp[1:] = g_sorted[1:] != g_sorted[:-1]
    starts = np.where(new_grp, np.arange(n), 0)
    starts = np.maximum.accumulate(starts)
    within = np.arange(n) - starts
    return order[within < n_per_group]


def stratified_sample(ds, group_col: str, n_per_group: int,
                      key_col: str = "doc_id", seed: int = 0):
    """Exact deterministic per-group quota sample ("n docs per language"
    — the class-balanced subsetting step of a training-data pipeline).

    Membership = the ``n_per_group`` smallest ``(rank_u64(key), key)``
    rows of each group — content-stable like :func:`hash_sample`
    (partitioning / block order / cluster size never change the sample).

    100-TB shape: top-n per group is a proper COMBINER — each map batch
    emits at most n rows per group it contains, then ONE
    ``groupby(group)`` merges partials and keeps the global top n.
    Shuffle volume <= n x groups x blocks, never the data; no driver
    state.  Equivalent SQL: ``row_number() OVER (PARTITION BY grp ORDER
    BY md5_number_upper(seed || ':' || key), key) <= n``.
    """
    if n_per_group < 1:
        raise ValueError(f"n_per_group must be >= 1, got {n_per_group}")

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(
                "_srank", pa.array([], pa.uint64())
            )
        u = rank_u64(batch[key_col], seed)
        grp = np.asarray(batch[group_col].to_numpy(zero_copy_only=False))
        keys = np.asarray(batch[key_col].to_numpy(zero_copy_only=False))
        keep = _top_n_per_group(grp, u, keys, n_per_group)
        keep.sort()
        return batch.take(pa.array(keep)).append_column(
            "_srank", pa.array(u[keep], pa.uint64())
        )

    def final(group: pa.Table) -> pa.Table:
        u = group["_srank"].to_numpy(zero_copy_only=False)
        keys = np.asarray(group[key_col].to_numpy(zero_copy_only=False))
        order = np.lexsort((keys, u))[:n_per_group]
        order.sort()
        return group.take(pa.array(order)).drop_columns(["_srank"])

    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    return part.groupby(group_col).map_groups(final, batch_format="pyarrow")


def weighted_sample(ds, rates_permille: dict, group_col: str = "source",
                    key_col: str = "doc_id", seed: int = 0,
                    default_permille: int = 0):
    """Corpus MIXING: per-group sampling rates in one deterministic pass
    ("2x web, 0.5x forums" — the data-mixture step of a pre-training
    pipeline, e.g. the Pile / LLaMA mixture tables; rates here are
    keep-rates in permille per ``group_col`` value).

    Membership reuses the hash_sample rule (md5(seed:key) % 1000 <
    rate[group]), so it is partitioning- and cluster-size-independent,
    stable under reruns, and composable with hash_sample (a doc kept at
    300 permille is a subset of the same doc kept at 600).  Groups
    absent from ``rates_permille`` fall back to ``default_permille``.
    Pure per-batch filter — no shuffle, no driver state beyond the
    small rate table.
    """
    for g, r in rates_permille.items():
        if not 0 <= int(r) <= 1000:
            raise ValueError(f"rate for {g!r} must be in [0, 1000], got {r}")

    items = sorted(rates_permille.items())
    groups = pa.array([str(g) for g, _ in items], pa.string())
    rates = np.array([int(r) for _, r in items], dtype=np.int64)

    def keep(batch: pa.Table) -> pa.Table:
        found = pc.index_in(
            pc.cast(batch[group_col], pa.string()), value_set=groups
        )
        miss = pc.is_null(found).to_numpy(zero_copy_only=False)
        idx = pc.fill_null(found, 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        row_rate = np.where(miss, default_permille, rates[idx])
        from ._arrowbytes import utf8_views

        n = batch.num_rows
        pref = pa.array([f"{seed}:"] * n, pa.string())
        salted = pc.binary_join_element_wise(
            pref, pc.cast(batch[key_col], pa.string()), ""
        )
        hv = np.empty(n, dtype=np.int64)
        for i, v in enumerate(utf8_views(salted)):
            hv[i] = int.from_bytes(
                hashlib.md5(v).digest()[:8], "little"
            ) % 1000
        return batch.filter(pa.array(hv < row_rate))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def deterministic_shuffle(ds, key_col: str = "doc_id", seed: int = 0):
    """Deterministic pretraining-order shuffle: a RANGE-PARTITIONED
    distributed sort on the content-stable md5 rank
    (``rank_u64(f"{seed}:{key}")``) — the epoch-shuffle step of a
    training-data pipeline, reproducible across runs/partitionings (no
    RNG state; changing ``seed`` re-deals the whole order, and a resumed
    job re-derives the identical order).  Ties (md5 collisions) break on
    the key itself.

    Unlike ``ds.random_shuffle()`` (seeded but all-to-all over opaque
    state) this is the SQL-mirrorable shuffle — rank and order replay in
    DuckDB via ``md5_number_upper``.  Shuffle volume = one global sort;
    at 100 TB use it exactly once as the final write-ordering pass.
    """

    def with_rank(batch: pa.Table) -> pa.Table:
        u = rank_u64(
            batch[key_col].combine_chunks()
            if isinstance(batch[key_col], pa.ChunkedArray)
            else batch[key_col],
            seed,
        )
        return batch.append_column("shuffle_key", pa.array(u, pa.uint64()))

    return ds.map_batches(
        with_rank, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["shuffle_key", key_col])
