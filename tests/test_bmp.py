"""From-scratch BMP codec tests — hand-built BITMAPFILEHEADER+DIB goldens
pin the decoder independently of the encoder (BGR order, bottom-up rows,
stride padding, palette, top-down), then encoder round-trips cover both
ways and the codec-registry routing."""

import struct

import numpy as np
import pytest

from rioxarray_ray.kernels import bmp, codecs


def _file(dib: bytes, pixels: bytes, off_extra: int = 0) -> bytes:
    off = 14 + len(dib) + off_extra
    return (
        struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off)
        + dib
        + b"\x00" * off_extra
        + pixels
    )


def _dib(w, h, bitcount, used=0):
    return struct.pack("<IiiHHIIiiII", 40, w, h, 1, bitcount, 0, 0, 0, 0, used, 0)


def test_hand_built_24bit_bottom_up_stride_golden():
    # 2x2, 24-bit BGR bottom-up; w*3=6 -> stride 8 (2 pad bytes/row)
    # target RGB image: [[red, green], [blue, white]]
    top = bytes([0, 0, 255, 0, 255, 0])       # BGR: red, green
    bot = bytes([255, 0, 0, 255, 255, 255])   # BGR: blue, white
    data = _file(_dib(2, 2, 24), bot + b"\x00\x00" + top + b"\x00\x00")
    assert bmp.is_bmp(data)
    rgb = bmp.decode_bmp(data).transpose(1, 2, 0)
    np.testing.assert_array_equal(rgb[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(rgb[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(rgb[1, 0], [0, 0, 255])
    np.testing.assert_array_equal(rgb[1, 1], [255, 255, 255])


def test_hand_built_top_down_32bit():
    # negative biHeight -> top-down; 32-bit BGRA, alpha dropped, no pad
    px = bytes([10, 20, 30, 99]) + bytes([40, 50, 60, 99])  # row 0: two px
    px += bytes([70, 80, 90, 99]) + bytes([1, 2, 3, 99])    # row 1
    data = _file(_dib(2, -2, 32), px)
    rgb = bmp.decode_bmp(data).transpose(1, 2, 0)
    np.testing.assert_array_equal(rgb[0, 0], [30, 20, 10])
    np.testing.assert_array_equal(rgb[1, 1], [3, 2, 1])


def test_hand_built_8bit_palette():
    # palette follows the 40-byte header: index 0 -> (10,20,30), 1 -> (200,100,50)
    dib = _dib(2, 1, 8, used=2)
    dib += bytes([30, 20, 10, 0]) + bytes([50, 100, 200, 0])  # BGRX quads
    data = _file(dib, bytes([0, 1]) + b"\x00\x00")  # stride 4
    rgb = bmp.decode_bmp(data).transpose(1, 2, 0)
    np.testing.assert_array_equal(rgb[0, 0], [10, 20, 30])
    np.testing.assert_array_equal(rgb[0, 1], [200, 100, 50])


def test_gap_before_pixel_array_honored():
    # bfOffBits may point past a gap (e.g. an unused palette block)
    top = bytes([0, 0, 255, 0, 255, 0])
    bot = bytes([255, 0, 0, 255, 255, 255])
    data = _file(_dib(2, 2, 24), bot + b"\x00\x00" + top + b"\x00\x00",
                 off_extra=16)
    rgb = bmp.decode_bmp(data).transpose(1, 2, 0)
    np.testing.assert_array_equal(rgb[0, 0], [255, 0, 0])


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(11)
    src = rng.integers(0, 256, size=(3, 9, 7), dtype=np.uint8)
    payload = bmp.encode_bmp(src)
    assert bmp.is_bmp(payload)
    np.testing.assert_array_equal(bmp.decode_bmp(payload), src)


def test_codec_registry_routes_bmp():
    src = np.arange(3 * 4 * 5, dtype=np.uint8).reshape(3, 4, 5)
    payload = bmp.encode_bmp(src)
    assert codecs.sniff(payload) == "bmp"
    np.testing.assert_array_equal(codecs.decode(payload), src)
    np.testing.assert_array_equal(codecs.decode(payload, fmt="bmp"), src)
    with pytest.raises(ValueError, match="payload is bmp"):
        codecs.decode(payload, fmt="png")


def test_multimodal_image_decoder_takes_bmp():
    from rioxarray_ray.functions import multimodal

    src = np.arange(3 * 4 * 4, dtype=np.uint8).reshape(3, 4, 4)
    payload = bmp.encode_bmp(src)
    np.testing.assert_array_equal(multimodal.DECODERS["image"](payload), src)


def test_error_contracts():
    with pytest.raises(ValueError, match="BM signature"):
        bmp.decode_bmp(b"XX" + b"\x00" * 60)
    src = np.zeros((3, 4, 4), np.uint8)
    payload = bytearray(bmp.encode_bmp(src))
    truncated = bytes(payload[:-8])
    with pytest.raises(ValueError, match="bmp: frame chunk shorter"):
        bmp.decode_bmp(truncated)
    # a malformed native payload must RAISE through the image decoder,
    # never silently fall back to the deterministic fake
    from rioxarray_ray.functions import multimodal

    with pytest.raises(ValueError, match="malformed"):
        multimodal.DECODERS["image"](truncated)
    # compressed (non-BI_RGB) BMPs are foreign
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 1, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="unsupported biCompression"):
        bmp.decode_bmp(_file(dib, b"\x00" * 16))
