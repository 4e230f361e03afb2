"""Generic grouped-ranking aggregates.

``topk_per_group`` is the "top-N rows per key" shape (top purchases per
user, best-scoring docs per domain, largest tiles per scene) — the
window-function ``row_number() OVER (PARTITION BY g ORDER BY v) <= k``
recast as a Ray Data COMBINER plan: every map batch emits at most k rows
per group it contains, then ONE ``groupby(group)`` merges partials and
keeps the global top k.  Shuffle volume <= k x groups x blocks — never
the data — and reducer memory is k x (groups per reducer), so the plan
holds at 100 TB with hot keys (a group's shuffled rows are already capped
at k per upstream block).

Values are compared by ORDER only (no arithmetic), so float columns gate
bit-exactly against the SQL window mirror; NaN orders last (kept only
when a group has fewer than k non-NaN rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _topk_indices(grp: np.ndarray, primary: np.ndarray, tie: np.ndarray,
                  k: int) -> np.ndarray:
    """Indices of the first k rows per group under (primary, tie)
    ascending — vectorized lexsort + change-point scan."""
    n = len(grp)
    order = np.lexsort((tie, primary, grp))
    g_sorted = grp[order]
    new_grp = np.ones(n, dtype=bool)
    new_grp[1:] = g_sorted[1:] != g_sorted[:-1]
    starts = np.maximum.accumulate(np.where(new_grp, np.arange(n), 0))
    within = np.arange(n) - starts
    return order[within < k]


def topk_per_group(ds, group_col: str, order_col: str, k: int,
                   descending: bool = True, tiebreak_col: str | None = None):
    """Top ``k`` rows per group ordered by ``order_col`` (ties broken by
    ``tiebreak_col`` ascending — required for a deterministic, SQL-
    mirrorable result when order values repeat)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def _key(batch: pa.Table):
        v = batch[order_col].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        return -v if descending else v

    def _tie(batch: pa.Table):
        if tiebreak_col is None:
            return np.zeros(batch.num_rows)
        return np.asarray(
            batch[tiebreak_col].to_numpy(zero_copy_only=False)
        )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        grp = np.asarray(batch[group_col].to_numpy(zero_copy_only=False))
        keep = _topk_indices(grp, _key(batch), _tie(batch), k)
        keep.sort()
        return batch.take(pa.array(keep))

    def final(group: pa.Table) -> pa.Table:
        keep = np.lexsort((_tie(group), _key(group)))[:k]
        keep.sort()
        return group.take(pa.array(keep))

    part = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
    return part.groupby(group_col).map_groups(final, batch_format="pyarrow")
