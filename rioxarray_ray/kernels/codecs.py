"""Image codecs for the corpus ``fmt`` column (FIXTURES.md F1).

The sandbox has no PIL/GDAL, so the corpus uses four self-defined formats:

- ``raw16``: little-endian int16, band-major (band, row, col) C-order.
- ``rawu8``: uint8, band-major.
- ``pngz`` : lossless zlib-compressed scanline stream of the raw16 payload
  (PNG-like in spirit: per-image zlib over row-major scanlines).
- ``lq8``  : defined lossy quantization codec standing in for JPEG — per-band
  affine quantization of int16 data to uint8 (code 255 reserved for nodata),
  zlib-compressed.  PSNR >= 40 dB vs the pre-encode pixels is guaranteed for
  the corpus's amplitude range and asserted in tests.

Every payload starts with a 1-byte codec tag + band_count/h/w so decode is
self-describing (decode also takes the row's w/h columns and validates them).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = {"raw16": b"\x01", "rawu8": b"\x02", "pngz": b"\x03", "lq8": b"\x04"}
_HDR = struct.Struct("<cBHH")  # magic, bands, h, w

FORMATS = tuple(_MAGIC)
LOSSLESS = ("raw16", "rawu8", "pngz")
NODATA_CODE = 255  # lq8 reserved code


def sniff(data: bytes) -> str | None:
    """Format tag when the payload carries a recognized magic, else None.

    The cheap membership test callers use to separate "not one of ours"
    (foreign format — fall back / route elsewhere) from "ours but
    malformed" (corruption — decode() must raise, never be masked).
    Besides the four corpus formats this recognizes real PNG, (Geo)TIFF,
    baseline JPEG and Windows BMP bytes (kernels/{png,tiff,jpeg,bmp}.py,
    from-scratch decoders)."""
    from . import bmp as _bmp
    from . import png as _png
    from . import tiff as _tiff

    if bytes(data[:8]) == _png.SIGNATURE:
        return "png"
    if _tiff.is_tiff(bytes(data[:8])):
        return "tiff"
    if bytes(data[:3]) == b"\xff\xd8\xff":
        return "jpeg"
    if _bmp.is_bmp(bytes(data[:54])):
        return "bmp"
    if bytes(data[:6]) in (b"GIF87a", b"GIF89a"):
        return "gif"
    from . import pnm as _pnm

    if _pnm.is_pnm(bytes(data[:4])):
        return "pnm"
    return {v: k for k, v in _MAGIC.items()}.get(data[:1])


def dtype_for(fmt: str) -> np.dtype:
    return np.dtype(np.uint8) if fmt == "rawu8" else np.dtype(np.int16)


def encode(pixels: np.ndarray, fmt: str, nodata: float | None = None) -> bytes:
    """Encode a (bands, h, w) array. ``nodata`` is needed for lq8 only."""
    if pixels.ndim == 2:
        pixels = pixels[None]
    bands, h, w = pixels.shape
    hdr = _HDR.pack(_MAGIC[fmt], bands, h, w)
    if fmt == "raw16":
        return hdr + np.ascontiguousarray(pixels, dtype="<i2").tobytes()
    if fmt == "rawu8":
        return hdr + np.ascontiguousarray(pixels, dtype=np.uint8).tobytes()
    if fmt == "pngz":
        return hdr + zlib.compress(
            np.ascontiguousarray(pixels, dtype="<i2").tobytes(), 6
        )
    if fmt == "lq8":
        from .nodata import valid_mask

        arr = pixels.astype(np.float64)
        valid = valid_mask(pixels, nodata)  # None/NaN/value-aware
        body = bytearray()
        codes = np.empty(arr.shape, dtype=np.uint8)
        for b in range(bands):
            v = arr[b][valid[b]]
            lo = float(v.min()) if v.size else 0.0
            hi = float(v.max()) if v.size else 1.0
            if hi <= lo:
                hi = lo + 1.0
            step = (hi - lo) / 254.0
            # neutralize invalid pixels (NaN-safe) before the uint8 cast;
            # they are overwritten with the reserved code right after
            band = np.where(valid[b], arr[b], lo)
            q = np.clip(np.rint((band - lo) / step), 0, 254).astype(np.uint8)
            q[~valid[b]] = NODATA_CODE
            codes[b] = q
            body += struct.pack("<dd", lo, step)
        nod = float(nodata) if nodata is not None else float("nan")
        return hdr + struct.pack("<d", nod) + bytes(body) + zlib.compress(
            codes.tobytes(), 6
        )
    raise ValueError(f"unknown fmt {fmt}")


def decode(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode to a (bands, h, w) numpy array (int16, or uint8 for rawu8).

    For lq8 the dequantized value is rounded back to int16 and nodata codes
    map back to the nodata value embedded in the payload header (exactly the
    value the encoder was given), so nodata pixels round-trip losslessly.

    Real PNG payloads (W3C signature) route to the from-scratch PNG
    decoder (kernels/png.py) and return uint8/uint16; real (Geo)TIFF
    payloads route to kernels/tiff.py (pixels only — callers needing the
    georeferencing call tiff.decode_geotiff directly).
    """
    if bytes(data[:8]) == b"\x89PNG\r\n\x1a\n":
        if fmt is not None and fmt != "png":
            raise ValueError(f"fmt column says {fmt} but payload is png")
        from . import png as _png

        return _png.decode_png(data)
    from . import tiff as _tiff

    if _tiff.is_tiff(bytes(data[:8])):
        if fmt is not None and fmt != "tiff":
            raise ValueError(f"fmt column says {fmt} but payload is tiff")
        return _tiff.decode_geotiff(data)[0]
    if bytes(data[:3]) == b"\xff\xd8\xff":
        if fmt is not None and fmt != "jpeg":
            raise ValueError(f"fmt column says {fmt} but payload is jpeg")
        from . import jpeg as _jpeg

        return _jpeg.decode_jpeg(data)
    from . import bmp as _bmp

    if _bmp.is_bmp(bytes(data[:54])):
        if fmt is not None and fmt != "bmp":
            raise ValueError(f"fmt column says {fmt} but payload is bmp")
        return _bmp.decode_bmp(data)
    if bytes(data[:6]) in (b"GIF87a", b"GIF89a"):
        if fmt is not None and fmt != "gif":
            raise ValueError(f"fmt column says {fmt} but payload is gif")
        from . import gif as _gif

        return _gif.decode_gif(data)
    from . import pnm as _pnm

    if _pnm.is_pnm(bytes(data[:4])):
        if fmt is not None and fmt != "pnm":
            raise ValueError(f"fmt column says {fmt} but payload is pnm")
        return _pnm.decode_pnm(data)
    magic, bands, h, w = _HDR.unpack_from(data, 0)
    try:
        tag = {v: k for k, v in _MAGIC.items()}[magic]
    except KeyError:
        raise ValueError(f"unknown payload tag {magic!r}") from None
    if fmt is not None and fmt != tag:
        raise ValueError(f"fmt column says {fmt} but payload is {tag}")
    off = _HDR.size
    if tag == "raw16":
        return (
            np.frombuffer(data, dtype="<i2", offset=off)
            .reshape(bands, h, w)
            .astype(np.int16)
        )
    if tag == "rawu8":
        return (
            np.frombuffer(data, dtype=np.uint8, offset=off)
            .reshape(bands, h, w)
            .copy()
        )
    if tag == "pngz":
        raw = zlib.decompress(data[off:])
        return np.frombuffer(raw, dtype="<i2").reshape(bands, h, w).astype(np.int16)
    if tag == "lq8":
        (nod,) = struct.unpack_from("<d", data, off)
        off += 8
        params = []
        for _ in range(bands):
            lo, step = struct.unpack_from("<dd", data, off)
            params.append((lo, step))
            off += 16
        codes = np.frombuffer(zlib.decompress(data[off:]), dtype=np.uint8).reshape(
            bands, h, w
        )
        out = np.empty((bands, h, w), dtype=np.int16)
        nod_i = np.int16(nod) if nod == nod else np.int16(-32768)
        for b, (lo, step) in enumerate(params):
            vals = np.rint(lo + codes[b].astype(np.float64) * step)
            band = np.clip(vals, -32768, 32767).astype(np.int16)
            band[codes[b] == NODATA_CODE] = nod_i
            out[b] = band
        return out
    raise ValueError(f"unknown payload tag {magic!r}")


def psnr(reference: np.ndarray, decoded: np.ndarray, mask: np.ndarray | None = None):
    """Peak signal-to-noise ratio in dB over valid pixels (inf when exact)."""
    a = reference.astype(np.float64)
    b = decoded.astype(np.float64)
    if mask is not None:
        a, b = a[mask], b[mask]
    if a.size == 0:
        return float("inf")
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    peak = float(np.max(np.abs(a))) or 1.0
    return 10.0 * np.log10(peak * peak / mse)


def decode_complex_int16(data: bytes | np.ndarray, shape) -> np.ndarray:
    """GDAL ``complex_int16`` payload (interleaved int16 real/imag pairs)
    -> complex64, the reference's open-time conversion
    (/root/reference/rioxarray/_io.py:493-501, raster_writer.py:149-186)."""
    raw = np.frombuffer(data, dtype="<i2") if isinstance(
        data, (bytes, bytearray, memoryview)
    ) else np.asarray(data, dtype=np.int16)
    pairs = raw.reshape(-1, 2).astype(np.float32)
    out = (pairs[:, 0] + 1j * pairs[:, 1]).astype(np.complex64)
    return out.reshape(shape)


def encode_complex_int16(arr: np.ndarray) -> bytes:
    """complex64/128 -> interleaved int16 pairs (write-side counterpart;
    values must be in int16 range — the writer's dtype contract)."""
    a = np.asarray(arr)
    out = np.empty(a.shape + (2,), dtype="<i2")
    out[..., 0] = np.rint(a.real)
    out[..., 1] = np.rint(a.imag)
    return out.tobytes()
