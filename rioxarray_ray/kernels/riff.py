"""Generic RIFF container walking (shared by kernels/wav.py and
kernels/avi.py; public Microsoft RIFF spec: little-endian fourcc chunks,
odd-sized chunks padded to word alignment, LIST chunks nest)."""

from __future__ import annotations

import struct


def form_type(data: bytes) -> bytes | None:
    """The RIFF form fourcc (b'WAVE', b'AVI ', ...), or None if not RIFF."""
    if len(data) >= 12 and data[:4] == b"RIFF":
        return data[8:12]
    return None


def walk(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) for chunks in data[start:end].

    Word alignment honored; a chunk whose declared size overruns ``end``
    raises (truncation must never be silently masked)."""
    pos = start
    while pos + 8 <= end:
        cc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + size > end:
            raise ValueError(f"riff: truncated {cc!r} chunk")
        yield cc, pos + 8, size
        pos += 8 + size + (size & 1)


def top_level(data: bytes):
    """Walk the chunks of a whole RIFF file (after the 12-byte header)."""
    if form_type(data) is None:
        raise ValueError("riff: missing RIFF signature")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    return walk(data, 12, min(len(data), 8 + riff_size))
