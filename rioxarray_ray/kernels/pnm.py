"""From-scratch Netpbm (PGM/PPM) codec — GDAL ships a PNM driver, so the
reference's open-any-format front door reads these natively (behavior
anchor: /root/reference/rioxarray/_io.py:1000-1328).

Public-spec implementation (Netpbm format family):

- P2 (ASCII graymap), P3 (ASCII pixmap), P5 (binary graymap),
  P6 (binary pixmap)
- header tokens (width, height, maxval) separated by whitespace, with
  ``#`` comments legal anywhere in the header
- binary sample layout: 1 byte per sample for maxval < 256, else 2 bytes
  BIG-endian; P6 samples interleave RGB

``decode_pnm`` returns (bands, h, w) uint8/uint16.  Malformed payloads
raise ValueError.  ``encode_pnm`` writes the canonical binary (P5/P6)
form for tests/pipelines.
"""

from __future__ import annotations

import numpy as np

_MAGICS = (b"P2", b"P3", b"P5", b"P6")


def is_pnm(data: bytes) -> bool:
    return (
        len(data) > 3
        and bytes(data[:2]) in _MAGICS
        and data[2:3].isspace()
    )


def _header_tokens(data: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated integer tokens, honoring # comments."""
    toks: list[int] = []
    i = start
    while len(toks) < n:
        if i >= len(data):
            raise ValueError("pnm: truncated header")
        ch = data[i]
        if ch == 0x23:  # '#' comment runs to end of line
            while i < len(data) and data[i] not in (0x0A, 0x0D):
                i += 1
        elif chr(ch).isspace():
            i += 1
        elif 0x30 <= ch <= 0x39:
            j = i
            while j < len(data) and 0x30 <= data[j] <= 0x39:
                j += 1
            toks.append(int(data[i:j]))
            i = j
        else:
            raise ValueError(f"pnm: unexpected header byte 0x{ch:02x}")
    return toks, i


def decode_pnm(data: bytes) -> np.ndarray:
    """PGM/PPM bytes -> (bands, h, w) uint8 (maxval < 256) or uint16."""
    if not is_pnm(data):
        raise ValueError("pnm: missing P2/P3/P5/P6 signature")
    magic = bytes(data[:2])
    bands = 3 if magic in (b"P3", b"P6") else 1
    (w, h, maxval), pos = _header_tokens(data, 3, 2)
    if w <= 0 or h <= 0 or not 0 < maxval < 65536:
        raise ValueError(f"pnm: bad dimensions/maxval {w}x{h}/{maxval}")
    n = w * h * bands
    if magic in (b"P2", b"P3"):
        vals, _ = _header_tokens(data, n, pos)
        flat = np.asarray(vals, np.uint16 if maxval > 255 else np.uint8)
    else:
        pos += 1  # exactly ONE whitespace byte after maxval, by spec
        if maxval > 255:
            flat = np.frombuffer(data, ">u2", offset=pos, count=min(
                n, (len(data) - pos) // 2)).astype(np.uint16)
        else:
            flat = np.frombuffer(data, np.uint8, offset=pos,
                                 count=min(n, len(data) - pos))
        if flat.size < n:
            raise ValueError("pnm: raster data shorter than the pixel grid")
    if int(flat.max(initial=0)) > maxval:
        raise ValueError("pnm: sample exceeds declared maxval")
    return np.ascontiguousarray(
        flat[:n].reshape(h, w, bands).transpose(2, 0, 1)
    )


def encode_pnm(pixels: np.ndarray, maxval: int | None = None) -> bytes:
    """(h, w) / (1|3, h, w) uint8/uint16 -> binary PGM (P5) / PPM (P6)."""
    arr = np.asarray(pixels)
    if arr.ndim == 2:
        arr = arr[None]
    if arr.ndim != 3 or arr.shape[0] not in (1, 3):
        raise ValueError("pixels must be (h, w), (1, h, w) or (3, h, w)")
    if maxval is None:
        maxval = 65535 if arr.dtype.itemsize > 1 else 255
    bands, h, w = arr.shape
    magic = b"P6" if bands == 3 else b"P5"
    hdr = magic + f"\n{w} {h}\n{maxval}\n".encode()
    body = arr.transpose(1, 2, 0)
    if maxval > 255:
        return hdr + np.ascontiguousarray(body, ">u2").tobytes()
    return hdr + np.ascontiguousarray(body, np.uint8).tobytes()
