"""From-scratch GIF codec tests — hand-packed LZW bit-stream goldens pin
the decoder independently of the encoder (LSB-first packing, width bumps,
interlace, extension skipping), then encoder round-trips cover dict
growth, 12-bit codes and the KwKwK case."""

import struct

import numpy as np
import pytest

from rioxarray_ray.kernels import codecs, gif

# 4-entry palette used by the hand-built files
_PAL = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])


def _lsd(w, h, depth=2):
    return b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)


def test_hand_packed_lzw_golden():
    # 2x2, palette 4, pixels [[0,1],[2,3]]; codes 4,0,1,2,3,5 at widths
    # 3,3,3,3,4,4 pack LSB-first to exactly 44 34 05 (worked by hand)
    data = (
        _lsd(2, 2) + _PAL
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
        + bytes([2, 3, 0x44, 0x34, 0x05, 0])
        + b"\x3b"
    )
    rgb = gif.decode_gif(data).transpose(1, 2, 0)
    np.testing.assert_array_equal(rgb[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(rgb[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(rgb[1, 0], [0, 0, 255])
    np.testing.assert_array_equal(rgb[1, 1], [255, 255, 255])


def test_hand_packed_interlace_and_extension_skip():
    # 1x5 column, interlaced: file row order 0,4,2,1,3 carries values
    # 0,0,2,1,3 so the de-interlaced screen reads 0,1,2,3,0 top-down;
    # codes 4,0,0,2,1,3,5 at widths 3,3,3,3,4,4,4 (giflib schedule: the
    # bump lands after the 4th code) pack LSB-first to 04 14 53 (worked
    # by hand).  A graphic-control extension precedes the image and must
    # be skipped by sub-block walking.
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    data = (
        _lsd(1, 5) + _PAL + gce
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 1, 5, 0x40)
        + bytes([2, 3, 0x04, 0x14, 0x53, 0])
        + b"\x3b"
    )
    rgb = gif.decode_gif(data).transpose(1, 2, 0)
    expect = [[255, 0, 0], [0, 255, 0], [0, 0, 255],
              [255, 255, 255], [255, 0, 0]]
    np.testing.assert_array_equal(rgb[:, 0], expect)


def test_encode_decode_roundtrip_dict_growth():
    # 64x64 of 256 grays: dictionary grows far past the 9->10->11 bit
    # bumps; byte-exact round-trip proves encoder/decoder width schedules
    # stay in lockstep
    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    src = np.repeat(gray[None], 3, axis=0)
    payload = gif.encode_gif(src)
    assert gif.is_gif(payload)
    np.testing.assert_array_equal(gif.decode_gif(payload), src)


def test_encode_decode_roundtrip_dict_full_reset():
    # 160x160 random forces the dictionary to 4096 -> encoder emits a
    # mid-stream CLEAR; decoder must reset width/dict identically
    rng = np.random.default_rng(9)
    gray = rng.integers(0, 256, size=(160, 160), dtype=np.uint8)
    src = np.repeat(gray[None], 3, axis=0)
    np.testing.assert_array_equal(gif.decode_gif(gif.encode_gif(src)), src)


def test_kwkwk_case():
    # aaa... runs produce the code==next_code (KwKwK) path immediately
    src = np.zeros((3, 4, 16), np.uint8)
    src[:, :, 8:] = 7
    np.testing.assert_array_equal(gif.decode_gif(gif.encode_gif(src)), src)


def test_codec_registry_routes_gif():
    src = np.repeat(
        np.arange(48, dtype=np.uint8).reshape(1, 6, 8) * 5, 3, axis=0
    )
    payload = gif.encode_gif(src)
    assert codecs.sniff(payload) == "gif"
    np.testing.assert_array_equal(codecs.decode(payload), src)
    with pytest.raises(ValueError, match="payload is gif"):
        codecs.decode(payload, fmt="bmp")


def test_error_contracts():
    with pytest.raises(ValueError, match="signature"):
        gif.decode_gif(b"NOTGIF" + b"\x00" * 20)
    src = np.zeros((3, 8, 8), np.uint8)
    payload = bytearray(gif.encode_gif(src))
    with pytest.raises(ValueError, match="gif:"):
        gif.decode_gif(bytes(payload[:20]))  # truncated mid-stream
    # malformed native payload RAISES through the image decoder
    from rioxarray_ray.functions import multimodal

    with pytest.raises(ValueError, match="malformed"):
        multimodal.DECODERS["image"](bytes(payload[:20]))
    with pytest.raises(ValueError, match="more than 256"):
        rgb = np.indices((32, 32), dtype=np.uint8)
        gif.encode_gif(np.stack([rgb[0], rgb[1], rgb[0] ^ rgb[1]]))
