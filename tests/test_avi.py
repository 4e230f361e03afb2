"""From-scratch AVI codec tests — hand-built RIFF/AVI goldens pin the
decoder independently of the encoder (BGR order, bottom-up rows, stride
padding, palette, nesting), then encoder round-trips cover both ways."""

import struct

import numpy as np
import pytest

from rioxarray_ray.kernels import avi


def _chunk(cc, payload):
    return cc + struct.pack("<I", len(payload)) + payload + (
        b"\x00" if len(payload) & 1 else b""
    )


def _lst(ltype, payload):
    return _chunk(b"LIST", ltype + payload)


def _riff(body):
    return b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body


def _strf24(w, h):
    return struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 0, 0, 0, 0)


def _strh(scale=1, rate=10):
    return (
        b"vids" + b"DIB " + struct.pack("<IHHII", 0, 0, 0, 0, scale)
        + struct.pack("<IIIIII", rate, 0, 0, 0, 0, 0)
    )


def test_hand_built_24bit_bottom_up_stride_golden():
    # 2x2 frame, 24-bit BGR bottom-up; w*3=6 -> stride 8 (2 pad bytes/row)
    # target RGB image: [[red, green], [blue, white]]
    top = bytes([0, 0, 255, 0, 255, 0])       # BGR: red, green
    bot = bytes([255, 0, 0, 255, 255, 255])   # BGR: blue, white
    frame = bot + b"\x00\x00" + top + b"\x00\x00"  # bottom-up + stride pad
    data = _riff(
        _lst(b"hdrl", _lst(b"strl", _chunk(b"strh", _strh(1, 10))
                           + _chunk(b"strf", _strf24(2, 2))))
        + _lst(b"movi", _chunk(b"00db", frame))
    )
    frames, fps = avi.decode_avi(data)
    assert fps == 10.0
    assert frames.shape == (1, 3, 2, 2)
    rgb = frames[0].transpose(1, 2, 0)
    np.testing.assert_array_equal(rgb[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(rgb[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(rgb[1, 0], [0, 0, 255])
    np.testing.assert_array_equal(rgb[1, 1], [255, 255, 255])


def test_hand_built_8bit_palette():
    # 1x2 frame, palettized: index 0 -> (10,20,30), 1 -> (200,100,50)
    strf = struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 8, 0, 0, 0, 0, 2, 0)
    strf += bytes([30, 20, 10, 0]) + bytes([50, 100, 200, 0])  # BGRX quads
    frame = bytes([0, 1]) + b"\x00\x00"  # stride 4
    data = _riff(
        _lst(b"hdrl", _lst(b"strl", _chunk(b"strh", _strh())
                           + _chunk(b"strf", strf)))
        + _lst(b"movi", _chunk(b"00db", frame))
    )
    frames, _ = avi.decode_avi(data)
    rgb = frames[0].transpose(1, 2, 0)
    np.testing.assert_array_equal(rgb[0, 0], [10, 20, 30])
    np.testing.assert_array_equal(rgb[0, 1], [200, 100, 50])


def test_audio_chunks_and_rec_lists_skipped():
    frame = bytes([5, 5, 5, 0, 0, 0]) + b"\x00\x00"  # 1x2 gray-ish, stride 8
    movi = (
        _chunk(b"01wb", b"\x00" * 16)  # interleaved audio chunk -> skip
        + _lst(b"rec ", _chunk(b"00db", frame))  # frames nest in rec lists
    )
    data = _riff(
        _lst(b"hdrl", _lst(b"strl", _chunk(b"strh", _strh())
                           + _chunk(b"strf", _strf24(2, 1))))
        + _lst(b"movi", movi)
    )
    frames, _ = avi.decode_avi(data)
    assert frames.shape == (1, 3, 1, 2)


def test_encode_decode_roundtrip_multiframe():
    rng = np.random.default_rng(7)
    src = rng.integers(0, 256, size=(5, 3, 9, 7), dtype=np.uint8)
    payload = avi.encode_avi(src, fps=24.0)
    assert avi.is_avi(payload)
    back, fps = avi.decode_avi(payload)
    assert fps == 24.0
    np.testing.assert_array_equal(back, src)


def test_error_contracts():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        avi.decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="unsupported biCompression"):
        bad = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 1, 0, 0, 0, 0, 0)
        avi.decode_avi(_riff(
            _lst(b"hdrl", _lst(b"strl", _chunk(b"strh", _strh())
                               + _chunk(b"strf", bad)))
            + _lst(b"movi", _chunk(b"00db", b"\x00" * 32))))
    with pytest.raises(ValueError, match="no frame chunks"):
        avi.decode_avi(_riff(
            _lst(b"hdrl", _lst(b"strl", _chunk(b"strh", _strh())
                               + _chunk(b"strf", _strf24(2, 2))))
            + _lst(b"movi", b"")))
    with pytest.raises(ValueError, match="shorter than its pixel grid"):
        avi.decode_avi(_riff(
            _lst(b"hdrl", _lst(b"strl", _chunk(b"strh", _strh())
                               + _chunk(b"strf", _strf24(4, 4))))
            + _lst(b"movi", _chunk(b"00db", b"\x00" * 8))))


def test_multimodal_video_decoder_and_frame_sampling():
    from rioxarray_ray.functions import multimodal

    src = np.arange(2 * 3 * 4 * 4, dtype=np.uint8).reshape(2, 3, 4, 4)
    payload = avi.encode_avi(src, fps=5.0)
    rep = multimodal.DECODERS["video"](payload)
    np.testing.assert_array_equal(rep, src[0])  # representative frame
    with pytest.raises(NotImplementedError, match="non-AVI video"):
        multimodal.DECODERS["video"](b"\x00\x00\x00\x20ftypisom mp4??")
