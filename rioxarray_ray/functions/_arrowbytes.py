"""Zero-copy access to Arrow utf8/binary column bytes.

Hashing hot paths (exact dedup, fingerprinting) need one C call per row
(hashlib.md5 — Arrow ships no md5 kernel, and DuckDB parity fixes the
hash), but nothing forces the per-row Python str materialization +
re-encode that ``to_pylist()`` implies: the utf8 bytes already sit
contiguously in the array's data buffer, so hand out memoryview slices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def utf8_views(arr):
    """Yield one memoryview per value of a (Chunked)Array of
    string/large_string/binary/large_binary.  Nulls must be filled by the
    caller first (``pc.fill_null``) — a null's slice is empty by Arrow
    layout, which silently aliases the empty string; we refuse instead."""
    chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
    for c in chunks:
        if c.null_count:
            raise ValueError("utf8_views: fill_null before taking views")
        width = 8 if pa.types.is_large_string(c.type) or pa.types.is_large_binary(
            c.type
        ) else 4
        bufs = c.buffers()
        offs = np.frombuffer(
            bufs[1], np.int64 if width == 8 else np.int32,
            count=len(c) + 1, offset=c.offset * width,
        )
        data = memoryview(bufs[2])
        for i in range(len(c)):
            yield data[offs[i] : offs[i + 1]]
