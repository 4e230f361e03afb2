"""From-scratch PNG codec (public W3C PNG spec / RFC 2083; zlib only).

Gives the engine ONE real wild image format so the multimodal decode path
(`functions/multimodal.py`) and `open_corpus`'s codec registry are exercised
on actual foreign bytes, not just the corpus's self-defined payloads — the
reference opens any GDAL-readable format at this boundary
(/root/reference/rioxarray/_io.py:1000-1328).

Decoder supports the full static-image core of the spec:

- bit depths 1/2/4/8/16, color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA),
- all 5 scanline filters (None/Sub/Up/Average/Paeth),
- interlace methods 0 (null) and 1 (Adam7),
- chunk CRC-32 validation (corrupt chunks RAISE — corruption must never
  silently become pixels, same contract as kernels/codecs.py),
- multiple IDAT chunks, ancillary chunks skipped.

Encoder writes non-interlaced 8/16-bit gray/RGB/gray-alpha/RGBA with a
selectable per-row filter (useful to exercise every decode filter path).

Returned layout is the engine's band-major ``(bands, h, w)``; palette
images are expanded to RGB (+alpha when a tRNS chunk is present), the
GDAL color-table expansion the reference relies on rasterio for.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_VALID_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

#: Adam7 pass grid: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)

FILTER_NAMES = ("none", "sub", "up", "average", "paeth")


class PNGError(ValueError):
    pass


# ---------------------------------------------------------------------------
# chunk layer
# ---------------------------------------------------------------------------

def _iter_chunks(data: bytes):
    if data[:8] != SIGNATURE:
        raise PNGError("not a PNG: bad signature")
    off = 8
    n = len(data)
    while off < n:
        if off + 8 > n:
            raise PNGError("truncated chunk header")
        (length,) = struct.unpack_from(">I", data, off)
        ctype = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + length]
        if len(body) != length or off + 12 + length > n:
            raise PNGError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack_from(">I", data, off + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PNGError(f"CRC mismatch in {ctype!r} chunk")
        yield ctype, body
        off += 12 + length
        if ctype == b"IEND":
            return
    raise PNGError("missing IEND chunk")


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


# ---------------------------------------------------------------------------
# filter reconstruction (decode side)
# ---------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_ = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: memoryview, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reconstruct h scanlines of ``stride`` bytes each from the filtered
    stream (1 filter byte + stride bytes per line).  Filters None/Sub/Up are
    numpy-vectorized; Average/Paeth need the just-reconstructed left byte so
    they run per-byte (spec-exact reference loop)."""
    need = h * (stride + 1)
    if len(raw) < need:
        raise PNGError("IDAT stream shorter than the scanline geometry")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, offset=pos, count=stride)
        pos += stride
        if ftype == 0:
            rec = line.copy()
        elif ftype == 1:  # Sub: per-lane cumulative sum mod 256
            lanes = line.reshape(-1, bpp).astype(np.uint32)
            rec = (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            rec = line + prev  # uint8 wraps mod 256
        elif ftype in (3, 4):
            rb = bytearray(stride)
            lv = line.tolist()
            pv = prev.tolist()
            if ftype == 3:  # Average
                for i in range(stride):
                    a = rb[i - bpp] if i >= bpp else 0
                    rb[i] = (lv[i] + ((a + pv[i]) >> 1)) & 0xFF
            else:  # Paeth
                for i in range(stride):
                    a = rb[i - bpp] if i >= bpp else 0
                    c = pv[i - bpp] if i >= bpp else 0
                    rb[i] = (lv[i] + _paeth(a, pv[i], c)) & 0xFF
            rec = np.frombuffer(bytes(rb), dtype=np.uint8)
        else:
            raise PNGError(f"unknown scanline filter {ftype}")
        out[y] = rec
        prev = out[y]
    return out


def _bytes_to_samples(rows: np.ndarray, w: int, channels: int,
                      depth: int) -> np.ndarray:
    """(h, stride) reconstructed bytes -> (h, w, channels) sample values."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        flat = np.ascontiguousarray(rows[:, : w * channels * 2]).view(">u2")
        return flat.reshape(h, w, channels).astype(np.uint16)
    # sub-byte depths: MSB-first packed bits, one channel only (spec)
    bits = np.unpackbits(rows, axis=1)
    per = depth
    vals = bits[:, : w * per].reshape(h, w, per)
    weights = (1 << np.arange(per - 1, -1, -1)).astype(np.uint16)
    return (vals * weights).sum(axis=2, dtype=np.uint16).astype(
        np.uint8
    )[..., None]


# ---------------------------------------------------------------------------
# public decode
# ---------------------------------------------------------------------------

def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> band-major (bands, h, w) uint8/uint16 array."""
    ihdr = None
    plte = None
    trns = None
    idat = []
    for ctype, body in _iter_chunks(bytes(data)):
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat.append(body)
    if ihdr is None or len(ihdr) != 13:
        raise PNGError("missing/short IHDR")
    w, h, depth, ctype_i, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if comp != 0 or filt != 0:
        raise PNGError("unknown compression/filter method")
    if ctype_i not in _CHANNELS or depth not in _VALID_DEPTHS[ctype_i]:
        raise PNGError(f"invalid color-type/bit-depth ({ctype_i}/{depth})")
    if interlace not in (0, 1):
        raise PNGError(f"unknown interlace method {interlace}")
    if w == 0 or h == 0:
        raise PNGError("zero-sized image")
    if not idat:
        raise PNGError("no IDAT data")
    channels = _CHANNELS[ctype_i]
    bpp = max(1, channels * depth // 8)
    raw = memoryview(zlib.decompress(b"".join(idat)))

    def stride_for(width: int) -> int:
        return (width * channels * depth + 7) // 8

    if interlace == 0:
        rows = _unfilter(raw, h, stride_for(w), bpp)
        img = _bytes_to_samples(rows, w, channels, depth)
    else:  # Adam7
        dtype = np.uint16 if depth == 16 else np.uint8
        img = np.zeros((h, w, channels), dtype=dtype)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = stride_for(pw)
            rows = _unfilter(raw[pos:], ph, stride, bpp)
            pos += ph * (stride + 1)
            sub = _bytes_to_samples(rows, pw, channels, depth)
            img[y0::dy, x0::dx] = sub
    if ctype_i == 3:
        if plte is None or len(plte) % 3:
            raise PNGError("palette image without a valid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = img[..., 0]
        if int(idx.max()) >= pal.shape[0]:
            raise PNGError("palette index out of range")
        img = pal[idx]
        if trns is not None:
            alpha = np.full(pal.shape[0], 255, dtype=np.uint8)
            a = np.frombuffer(trns, dtype=np.uint8)
            alpha[: len(a)] = a
            img = np.concatenate([img, alpha[idx][..., None]], axis=2)
    return np.ascontiguousarray(img.transpose(2, 0, 1))


# ---------------------------------------------------------------------------
# encode (non-interlaced)
# ---------------------------------------------------------------------------

def _filter_row(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(line))
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, c)
        out[i] = (line[i] - pred) & 0xFF
    return bytes(out)


def encode_png(arr: np.ndarray, filter_type: int | str = 4,
               level: int = 6) -> bytes:
    """(bands, h, w) or (h, w) uint8/uint16 -> PNG bytes (interlace 0).

    ``filter_type``: 0-4 / name applied to every row, or "mixed" to cycle
    through all five (exercises every decode filter path)."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[None]
    bands, h, w = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(bands)
    if ctype is None:
        raise PNGError(f"cannot encode {bands} bands as PNG")
    if a.dtype == np.uint8:
        depth = 8
        payload = np.ascontiguousarray(a.transpose(1, 2, 0))
        rows_bytes = payload.reshape(h, -1).tobytes()
    elif a.dtype == np.uint16:
        depth = 16
        payload = np.ascontiguousarray(
            a.transpose(1, 2, 0).astype(">u2")
        )
        rows_bytes = payload.reshape(h, -1).tobytes()
    else:
        raise PNGError(f"cannot encode dtype {a.dtype} as PNG")
    stride = w * bands * depth // 8
    bpp = max(1, bands * depth // 8)
    if isinstance(filter_type, str) and filter_type != "mixed":
        filter_type = FILTER_NAMES.index(filter_type)
    body = bytearray()
    prev = b"\x00" * stride
    for y in range(h):
        line = rows_bytes[y * stride : (y + 1) * stride]
        ft = (y % 5) if filter_type == "mixed" else int(filter_type)
        body.append(ft)
        body += _filter_row(ft, line, prev, bpp)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(body), level))
        + _chunk(b"IEND", b"")
    )
