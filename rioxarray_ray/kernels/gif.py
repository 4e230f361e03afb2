"""From-scratch GIF (87a/89a) codec — another real "wild" image format
behind the codec registry (reference behavior anchor: the
open-any-GDAL-format front door of /root/reference/rioxarray/_io.py;
GDAL ships a GIF driver, so the reference opens these natively).

Public-spec implementation (CompuServe GIF89a specification):

- logical screen descriptor + global color table
- extension blocks (graphic control / comment / application) skipped by
  sub-block walking; image descriptors with local color tables
- LZW decompression: variable-width codes packed LSB-first (unlike the
  MSB-first TIFF variant in kernels/tiff.py), CLEAR/EOI codes, dict
  growth to 4095 with width bumps at 2^width, deferred-clear tolerant
- 4-pass interlace reordering (rows 0/8, 4/8, 2/4, 1/2)

``decode_gif`` renders the FIRST frame onto the logical screen and
returns (3, height, width) uint8 RGB — the same representative-frame
contract as kernels/avi.py (animated-GIF disposal compositing is out of
scope; frame 1 is always disposal-free by spec).  Malformed payloads
raise ValueError.  ``encode_gif`` writes a single-frame GIF89a with a
real growing-dictionary LZW compressor for tests/pipelines.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def is_gif(data: bytes) -> bool:
    return bytes(data[:6]) in (b"GIF87a", b"GIF89a")


def _color_table(data: bytes, off: int, packed: int) -> tuple[np.ndarray, int]:
    n = 2 << (packed & 0x07)
    end = off + 3 * n
    if end > len(data):
        raise ValueError("gif: color table extends past end of file")
    table = np.frombuffer(data, np.uint8, count=3 * n, offset=off).reshape(n, 3)
    return table, end


def _skip_subblocks(data: bytes, off: int) -> int:
    while True:
        if off >= len(data):
            raise ValueError("gif: unterminated sub-block chain")
        size = data[off]
        off += 1
        if size == 0:
            return off
        off += size


def _lzw_decode(blocks: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: LSB-first bit packing, growing dictionary."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    # dictionary as (prefix_code, suffix byte) pairs; roots are implicit
    prefix = np.zeros(4096, np.int32)
    suffix = np.zeros(4096, np.uint8)
    length = np.zeros(4096, np.int32)
    for c in range(clear):
        suffix[c] = c
        length[c] = 1
    next_code = eoi + 1
    width = min_code_size + 1
    prev = -1

    bitpos = 0
    total_bits = len(blocks) * 8
    buf = np.frombuffer(blocks, np.uint8)

    def emit(code: int) -> int:
        """Write code's byte string into out; return its first byte."""
        nonlocal n_out
        ln = int(length[code])
        if n_out + ln > n_pixels:
            raise ValueError("gif: LZW stream overruns the pixel grid")
        pos = n_out + ln
        c = code
        while c >= clear:
            pos -= 1
            out[pos] = suffix[c]
            c = int(prefix[c])
        pos -= 1
        out[pos] = suffix[c]
        n_out += ln
        return int(out[n_out - ln])

    while n_out < n_pixels:
        if bitpos + width > total_bits:
            raise ValueError("gif: LZW stream truncated")
        byte0 = bitpos >> 3
        # LSB-first: assemble up to 3 bytes, shift off the intra-byte offset
        window = int(buf[byte0])
        if byte0 + 1 < len(buf):
            window |= int(buf[byte0 + 1]) << 8
        if byte0 + 2 < len(buf):
            window |= int(buf[byte0 + 2]) << 16
        code = (window >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width

        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("gif: first LZW code after clear is invalid")
            emit(code)
            prev = code
            continue
        if code < next_code:
            first = emit(code)
        elif code == next_code:
            # KwKwK case: emit prev's string + its first byte
            ln = int(length[prev])
            if n_out + ln + 1 > n_pixels:
                raise ValueError("gif: LZW stream overruns the pixel grid")
            first = emit(prev)
            out[n_out] = first
            n_out += 1
        else:
            raise ValueError(f"gif: LZW code {code} out of range")
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            length[next_code] = length[prev] + 1
            next_code += 1
        # giflib width schedule: after processing each code, widen as soon
        # as the next free slot no longer fits (NOT one code later)
        if next_code >= (1 << width) and width < 12:
            width += 1
        prev = code
    if n_out < n_pixels:
        raise ValueError("gif: LZW stream ended before the pixel grid filled")
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (3, h, w) uint8 RGB of the first frame on the screen."""
    if not is_gif(data):
        raise ValueError("gif: missing GIF87a/GIF89a signature")
    if len(data) < 13:
        raise ValueError("gif: truncated logical screen descriptor")
    sw, sh, packed, bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    off = 13
    gct = None
    if packed & 0x80:
        gct, off = _color_table(data, off, packed)

    while off < len(data):
        block = data[off]
        off += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + sub-blocks
            if off >= len(data):
                raise ValueError("gif: truncated extension block")
            off = _skip_subblocks(data, off + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"gif: unknown block introducer 0x{block:02x}")
        # image descriptor
        if off + 9 > len(data):
            raise ValueError("gif: truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, off)
        off += 9
        lct = gct
        if ipacked & 0x80:
            lct, off = _color_table(data, off, ipacked)
        if lct is None:
            raise ValueError("gif: image has neither local nor global palette")
        if left + w > sw or top + h > sh:
            raise ValueError("gif: image rectangle exceeds the logical screen")
        if off >= len(data):
            raise ValueError("gif: truncated before LZW minimum code size")
        min_code_size = data[off]
        off += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"gif: bad LZW minimum code size {min_code_size}")
        chunks = []
        while True:
            if off >= len(data):
                raise ValueError("gif: unterminated image data sub-blocks")
            size = data[off]
            off += 1
            if size == 0:
                break
            chunks.append(data[off : off + size])
            off += size
        idx = _lzw_decode(b"".join(chunks), min_code_size, w * h).reshape(h, w)
        if ipacked & 0x40:  # interlaced: reorder rows into the 4 passes
            rows = np.concatenate(
                [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
            )
            deinter = np.empty_like(idx)
            deinter[rows] = idx
            idx = deinter
        if int(idx.max(initial=0)) >= len(lct):
            raise ValueError("gif: pixel index outside the color table")
        screen = np.zeros((sh, sw), np.uint8)
        if gct is not None and bg < len(gct):
            screen[:] = bg
        screen[top : top + h, left : left + w] = idx
        table = lct if lct is not None else gct
        pad = np.zeros((256, 3), np.uint8)
        pad[: len(table)] = table
        return np.ascontiguousarray(pad[screen].transpose(2, 0, 1))
    raise ValueError("gif: no image descriptor found")


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real growing-dictionary GIF LZW compressor (LSB-first packing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    codes: list[tuple[int, int]] = [(clear, min_code_size + 1)]
    table: dict[bytes, int] = {bytes([c]): c for c in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    run = b""
    for v in indices.tobytes():
        cand = run + bytes([v])
        if cand in table:
            run = cand
            continue
        codes.append((table[run], width))
        # mirror the decoder's schedule: bump AFTER emitting, BEFORE the
        # insert, against the pre-insert slot counter
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
        else:
            codes.append((clear, width))
            table = {bytes([c]): c for c in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([v])
    if run:
        codes.append((table[run], width))
    codes.append((eoi, width))
    # pack LSB-first
    acc = 0
    nbits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(pixels: np.ndarray) -> bytes:
    """(3, h, w) or (h, w) uint8 -> single-frame GIF89a.

    Colors are mapped through an exact palette when the image has <= 256
    distinct RGB triples (lossless round-trip); more raises (a quantizer
    is out of scope for a test/pipeline encoder).
    """
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[None], 3, axis=0)
    if arr.ndim != 3 or arr.shape[0] != 3:
        raise ValueError("pixels must be (3, h, w) or (h, w)")
    _, h, w = arr.shape
    flat = arr.transpose(1, 2, 0).reshape(-1, 3)
    colors, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    depth = max(int(np.ceil(np.log2(max(len(colors), 2)))), 1)
    n = 1 << depth
    palette = np.zeros((n, 3), np.uint8)
    palette[: len(colors)] = colors
    min_code_size = max(depth, 2)
    lzw = _lzw_encode(indices.astype(np.uint8), min_code_size)
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        sub.append(len(chunk))
        sub += chunk
    sub.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
        + palette.tobytes()
        + struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        + bytes([min_code_size])
        + bytes(sub)
        + b"\x3b"
    )
