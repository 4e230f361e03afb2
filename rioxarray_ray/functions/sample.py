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
