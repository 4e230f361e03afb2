"""Malformed-input robustness for the from-scratch codecs.

Every decoder must either decode or raise a clean error on truncated,
bit-flipped, and hostile-header payloads — never hang, crash the
interpreter, or allocate from attacker-controlled dimensions before
validating them against the actual payload size (allocation bombs).
Deterministic (seeded) so failures reproduce.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rioxarray_ray.kernels import avi, bmp, gif, jpeg, png, pnm, tiff, wav


def _payloads():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (3, 16, 16)).astype(np.uint8)
    gray = rgb[0]
    frames = rng.integers(0, 255, (2, 3, 16, 16)).astype(np.uint8)
    samples = (rng.standard_normal((2, 64)) * 1000).astype(np.int16)
    return {
        "png": (png.encode_png(rgb), png.decode_png),
        "jpeg": (jpeg.encode_jpeg(rgb), jpeg.decode_jpeg),
        "bmp": (bmp.encode_bmp(rgb), bmp.decode_bmp),
        "gif": (gif.encode_gif(gray), gif.decode_gif),
        "pnm": (pnm.encode_pnm(rgb), pnm.decode_pnm),
        "wav": (wav.encode_wav(samples, 16000), wav.decode_wav),
        "avi": (avi.encode_avi(frames), avi.decode_avi),
        "tiff": (tiff.encode_geotiff(rgb), tiff.decode_geotiff),
    }


@pytest.mark.parametrize("name", list(_payloads()))
def test_codec_truncation_and_bitflip_never_hangs(name):
    buf, dec = _payloads()[name]
    for cut in range(0, len(buf), max(1, len(buf) // 40)):
        try:
            dec(buf[:cut])
        except Exception:
            pass  # clean raise is the contract; hangs fail via timeout
    arr = bytearray(buf)
    for pos in range(0, len(buf), max(1, len(buf) // 60)):
        mut = bytearray(arr)
        mut[pos] ^= 0xFF
        try:
            dec(bytes(mut))
        except Exception:
            pass


def test_codec_hostile_headers_no_allocation_bomb():
    """Dimensions fields set to 2**30+: decoders must reject against the
    actual payload size instead of allocating header-declared memory."""

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data))

    ihdr = struct.pack(">IIBBBBB", 2**31 - 1, 2**31 - 1, 8, 0, 0, 0, 0)
    evil_png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(Exception):
        png.decode_png(evil_png)

    with pytest.raises(Exception):
        pnm.decode_pnm(b"P5\n999999999 999999999\n255\n" + b"\x00" * 10)

    rgb = np.zeros((3, 4, 4), np.uint8)
    evil_bmp = bytearray(bmp.encode_bmp(rgb))
    struct.pack_into("<ii", evil_bmp, 18, 2**30, 2**30)
    with pytest.raises(Exception):
        bmp.decode_bmp(bytes(evil_bmp))

    evil_wav = bytearray(wav.encode_wav(np.zeros((1, 8), np.int16), 16000))
    struct.pack_into("<H", evil_wav, 22, 60000)  # 60k channels
    with pytest.raises(Exception):
        wav.decode_wav(bytes(evil_wav))

    with pytest.raises(Exception):
        tiff.decode_geotiff(tiff.encode_geotiff(rgb)[:60])
