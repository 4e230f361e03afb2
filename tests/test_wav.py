"""From-scratch WAV codec tests.

Goldens are HAND-BUILT byte-by-byte in the test (struct.pack per the
public RIFF/WAVE spec), so the decoder is pinned independently of the
encoder; encoder round-trips then cover every dtype path both ways.
"""

import struct

import numpy as np
import pytest

from rioxarray_ray.kernels import wav


def _riff(*chunks: bytes) -> bytes:
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunk(cc: bytes, payload: bytes) -> bytes:
    return cc + struct.pack("<I", len(payload)) + payload + (
        b"\x00" if len(payload) & 1 else b""
    )


def _fmt(code, channels, rate, bits) -> bytes:
    block = channels * bits // 8
    return _chunk(
        b"fmt ",
        struct.pack("<HHIIHH", code, channels, rate, rate * block, block, bits),
    )


def test_hand_built_pcm16_stereo_golden():
    # 3 frames, 2 channels, interleaved on disk: L0 R0 L1 R1 L2 R2
    data = struct.pack("<6h", 100, -200, 300, -400, 32767, -32768)
    payload = _riff(_fmt(1, 2, 8000, 16), _chunk(b"data", data))
    samples, rate = wav.decode_wav(payload)
    assert rate == 8000
    assert samples.dtype == np.int16
    np.testing.assert_array_equal(
        samples, [[100, 300, 32767], [-200, -400, -32768]]
    )


def test_hand_built_pcm8_and_float32():
    p8 = _riff(_fmt(1, 1, 44100, 8), _chunk(b"data", bytes([0, 128, 255])))
    s8, _ = wav.decode_wav(p8)
    np.testing.assert_array_equal(s8, [[0, 128, 255]])
    assert s8.dtype == np.uint8

    f = struct.pack("<4f", 0.5, -1.0, 0.25, 2.0)
    pf = _riff(_fmt(3, 2, 48000, 32), _chunk(b"data", f))
    sf, rate = wav.decode_wav(pf)
    assert rate == 48000 and sf.dtype == np.float32
    np.testing.assert_array_equal(sf, [[0.5, 0.25], [-1.0, 2.0]])


def test_hand_built_pcm24_sign_extension():
    # -1 = FF FF FF, 1 = 01 00 00, -(2^23) = 00 00 80, 2^23-1 = FF FF 7F
    data = bytes.fromhex("ffffff" "010000" "000080" "ffff7f")
    p = _riff(_fmt(1, 1, 16000, 24), _chunk(b"data", data))
    s, _ = wav.decode_wav(p)
    np.testing.assert_array_equal(s, [[-1, 1, -(1 << 23), (1 << 23) - 1]])


def test_unknown_chunks_skipped_and_odd_padding():
    # LIST metadata chunk (odd-sized, so spec requires a pad byte) comes
    # between fmt and data and must be ignored
    data = struct.pack("<2h", 7, -7)
    p = _riff(
        _fmt(1, 1, 8000, 16),
        _chunk(b"LIST", b"INFOabc"),  # 7 bytes -> padded
        _chunk(b"data", data),
    )
    s, _ = wav.decode_wav(p)
    np.testing.assert_array_equal(s, [[7, -7]])


def test_extensible_format_resolves_subformat():
    sub_pcm = struct.pack("<H", 1) + bytes.fromhex(
        "0000" "000010008000" "00aa00389b71"
    )
    ext = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    ext += struct.pack("<HHI", 22, 16, 0x4) + sub_pcm
    p = _riff(_chunk(b"fmt ", ext), _chunk(b"data", struct.pack("<2h", 5, 6)))
    s, _ = wav.decode_wav(p)
    np.testing.assert_array_equal(s, [[5, 6]])


@pytest.mark.parametrize(
    "arr,bits",
    [
        (np.array([[0, 17, 255]], np.uint8), None),
        (np.array([[1, -2, 32000], [3, -4, -32000]], np.int16), None),
        (np.array([[2**30, -(2**30), 5]], np.int32), None),
        (np.array([[2**22, -(2**22), 9]], np.int32), 24),
        (np.array([[0.5, -0.125]], np.float32), None),
        (np.array([[1e-9, -3.5]], np.float64), None),
    ],
)
def test_encode_decode_roundtrip(arr, bits):
    payload = wav.encode_wav(arr, 22050, bits=bits)
    assert wav.is_wav(payload)
    back, rate = wav.decode_wav(payload)
    assert rate == 22050
    np.testing.assert_array_equal(back, arr)
    if bits != 24:
        assert back.dtype == arr.dtype


def test_error_contracts():
    with pytest.raises(ValueError, match="RIFF/WAVE"):
        wav.decode_wav(b"not a wav at all")
    with pytest.raises(ValueError, match="no data chunk"):
        wav.decode_wav(_riff(_fmt(1, 1, 8000, 16)))
    with pytest.raises(ValueError, match="data chunk before fmt"):
        wav.decode_wav(_riff(_chunk(b"data", b"\x00\x00")))
    with pytest.raises(ValueError, match="no fmt chunk"):
        wav.decode_wav(_riff(_chunk(b"LIST", b"INFO")))
    with pytest.raises(ValueError, match="unsupported format code"):
        wav.decode_wav(
            _riff(_fmt(2, 1, 8000, 16), _chunk(b"data", b"\x00\x00"))
        )
    with pytest.raises(ValueError, match="truncated"):
        # data chunk declares 99 bytes but only 4 follow
        wav.decode_wav(
            _riff(
                _fmt(1, 1, 8000, 16),
                b"data" + struct.pack("<I", 99) + b"\x00\x00\x00\x00",
            )
        )
    with pytest.raises(ValueError, match="out of 24-bit range"):
        wav.encode_wav(np.array([[1 << 24]], np.int32), 8000, bits=24)


def test_multimodal_audio_decoder_routes_wav():
    from rioxarray_ray.functions import multimodal

    arr = np.array([[10, -20, 30]], np.int16)
    out = multimodal.DECODERS["audio"](wav.encode_wav(arr, 8000))
    np.testing.assert_array_equal(out, arr)
    with pytest.raises(NotImplementedError, match="non-WAV audio"):
        multimodal.DECODERS["audio"](b"\xff\xfbmp3 frame header etc")
