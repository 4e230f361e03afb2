"""From-scratch Windows BMP codec — another real "wild" image format
behind the codec registry (reference behavior anchor: the
open-any-GDAL-format front door of /root/reference/rioxarray/_io.py;
GDAL ships a BMP driver, so the reference opens these natively).

Public-spec implementation (Windows BITMAPFILEHEADER + DIB):

- BITMAPFILEHEADER (14 bytes): 'BM' magic, file size, bfOffBits pointing
  at the pixel array
- BITMAPINFOHEADER (biSize 40; the V4/108 and V5/124 extensions share
  the same leading 40-byte layout and are accepted for the non-palette
  depths) — parsed by the shared DIB reader in kernels/avi.py
- pixel array: BI_RGB at 8 (palettized), 24 or 32 bits per pixel,
  BGR(A) samples, bottom-up (or top-down when biHeight < 0) rows,
  scanlines padded to 4-byte alignment — decoded by the shared
  frame reader in kernels/avi.py

``decode_bmp`` returns a (3, height, width) uint8 array in RGB band
order.  Malformed payloads raise ValueError (never silently masked).
``encode_bmp`` writes the canonical 24-bit file for tests/pipelines.
"""

from __future__ import annotations

import struct

import numpy as np

from .avi import _decode_frame, _parse_bitmapinfo

_FILE_HDR = struct.Struct("<2sIHHI")  # magic, bfSize, res1, res2, bfOffBits


def is_bmp(data: bytes) -> bool:
    """Cheap magic check: 'BM' + a plausible DIB header size word."""
    if len(data) < 54 or bytes(data[:2]) != b"BM":
        return False
    (bi_size,) = struct.unpack_from("<I", data, 14)
    return bi_size in (40, 52, 56, 108, 124)


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> (3, h, w) uint8 RGB."""
    if len(data) < 54 or bytes(data[:2]) != b"BM":
        raise ValueError("bmp: missing BM signature")
    _magic, bf_size, _r1, _r2, off_bits = _FILE_HDR.unpack_from(data, 0)
    (bi_size,) = struct.unpack_from("<I", data, 14)
    if bi_size < 40:
        raise ValueError(f"bmp: unsupported DIB header size {bi_size}")
    # the shared reader expects the palette right after a 40-byte header;
    # extended headers (V4/V5) only matter for palettized depths
    (bitcount,) = struct.unpack_from("<H", data, 14 + 14)
    if bitcount == 8 and bi_size != 40:
        raise ValueError(
            f"bmp: palettized pixels with a {bi_size}-byte DIB header "
            "are not supported (palette offset is header-size dependent)"
        )
    dib = bytes(data[14:off_bits]) if bi_size == 40 else (
        bytes(data[14:54]).ljust(40, b"\x00")
    )
    width, height, bitcount, palette = _parse_bitmapinfo(dib)
    if off_bits < 14 + bi_size or off_bits > len(data):
        raise ValueError(f"bmp: pixel offset {off_bits} out of range")
    try:
        return _decode_frame(data[off_bits:], width, height, bitcount, palette)
    except ValueError as exc:
        raise ValueError(str(exc).replace("avi:", "bmp:")) from None


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(3, h, w) or (h, w) uint8 -> canonical 24-bit bottom-up BMP."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[None], 3, axis=0)
    if arr.ndim != 3 or arr.shape[0] != 3:
        raise ValueError("pixels must be (3, h, w) or (h, w)")
    _, h, w = arr.shape
    stride = ((w * 3) + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    bgr = arr[[2, 1, 0]].transpose(1, 2, 0)  # (h, w, 3) BGR
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    body = rows[::-1].tobytes()  # bottom-up
    off = 14 + 40
    hdr = _FILE_HDR.pack(b"BM", off + len(body), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return hdr + dib + body
