"""From-scratch RIFF/WAVE (WAV) codec — the engine's real "wild" audio
format (multimodal DECODERS swap point; reference behavior anchor: the
open-any-GDAL-format front door of /root/reference/rioxarray/_io.py —
this is the audio analogue of the PNG decoder in kernels/png.py).

Public-spec implementation (Microsoft RIFF / WAVE format, multimedia
programming interface spec): chunk-walked container, ``fmt `` +
``data`` chunks, word-aligned chunk padding, unknown chunks skipped.

Supported sample encodings (all numpy-vectorized):

- PCM (format code 1): 8-bit unsigned, 16/24/32-bit signed little-endian
- IEEE float (format code 3): float32, float64
- WAVE_FORMAT_EXTENSIBLE (code 0xFFFE): resolved through the SubFormat
  GUID to PCM / IEEE float

``decode_wav`` returns ``(samples, sample_rate)`` with samples shaped
``(channels, n_frames)`` in the NATIVE dtype (no normalization — lossless
round-trip is the contract, like the image codecs).  Malformed payloads
raise ValueError; they are never silently masked (multimodal contract).
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_IEEE_FLOAT = 3
_EXTENSIBLE = 0xFFFE

# first 2 bytes of the 16-byte SubFormat GUID identify the wrapped code;
# the remainder is the fixed KSDATAFORMAT_SUBTYPE tail
_GUID_TAIL = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def _parse_fmt(body: bytes):
    if len(body) < 16:
        raise ValueError("wav: fmt chunk shorter than 16 bytes")
    code, channels, rate, _byterate, block_align, bits = struct.unpack(
        "<HHIIHH", body[:16]
    )
    if code == _EXTENSIBLE:
        if len(body) < 40:
            raise ValueError("wav: extensible fmt chunk shorter than 40 bytes")
        # cbSize(2) valid_bits(2) channel_mask(4) SubFormat(16)
        sub = body[24:40]
        if sub[2:16] != _GUID_TAIL:
            raise ValueError("wav: unknown SubFormat GUID")
        code = struct.unpack("<H", sub[:2])[0]
    if channels < 1:
        raise ValueError("wav: channel count must be >= 1")
    return code, channels, rate, block_align, bits


def _chunks(data: bytes):
    """Yield (fourcc, payload) walking the RIFF body, honoring the
    spec's word alignment (odd-sized chunks are padded with one byte)."""
    pos = 12
    n = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    while pos + 8 <= n:
        cc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"wav: truncated {cc!r} chunk")
        yield cc, body
        pos += 8 + size + (size & 1)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> ((channels, n_frames) native-dtype array, rate)."""
    if not is_wav(data):
        raise ValueError("wav: missing RIFF/WAVE signature")
    fmt = None
    frames = None
    for cc, body in _chunks(data):
        if cc == b"fmt ":
            fmt = _parse_fmt(body)
        elif cc == b"data":
            if fmt is None:
                raise ValueError("wav: data chunk before fmt chunk")
            frames = _decode_data(body, *fmt)
        # every other chunk (LIST, fact, cue , ...) is skipped by spec
    if fmt is None:
        raise ValueError("wav: no fmt chunk")
    if frames is None:
        raise ValueError("wav: no data chunk")
    return frames, fmt[2]


def _decode_data(body, code, channels, rate, block_align, bits):
    if code == _PCM:
        if bits == 8:
            flat = np.frombuffer(body, dtype=np.uint8)
        elif bits == 16:
            flat = np.frombuffer(body[: len(body) & ~1], dtype="<i2")
        elif bits == 24:
            b = np.frombuffer(body[: len(body) - len(body) % 3], np.uint8)
            b = b.reshape(-1, 3)
            # sign-extend 24 -> 32 via the shifted-int trick
            flat = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            flat = (flat << 8) >> 8
        elif bits == 32:
            flat = np.frombuffer(body[: len(body) & ~3], dtype="<i4")
        else:
            raise ValueError(f"wav: unsupported PCM bit depth {bits}")
    elif code == _IEEE_FLOAT:
        if bits == 32:
            flat = np.frombuffer(body[: len(body) & ~3], dtype="<f4")
        elif bits == 64:
            flat = np.frombuffer(body[: len(body) & ~7], dtype="<f8")
        else:
            raise ValueError(f"wav: unsupported float bit depth {bits}")
    else:
        raise ValueError(f"wav: unsupported format code {code}")
    n_frames = len(flat) // channels
    if n_frames * channels != len(flat):
        raise ValueError("wav: data size is not a whole number of frames")
    # interleaved on disk: frame-major (f0c0 f0c1 f1c0 f1c1 ...)
    return np.ascontiguousarray(
        flat[: n_frames * channels].reshape(n_frames, channels).T
    )


_ENCODE = {
    # dtype -> (format code, bits, writer)
    np.dtype(np.uint8): (_PCM, 8, lambda a: a.astype(np.uint8).tobytes()),
    np.dtype(np.int16): (_PCM, 16, lambda a: a.astype("<i2").tobytes()),
    np.dtype(np.int32): (_PCM, 32, lambda a: a.astype("<i4").tobytes()),
    np.dtype(np.float32): (_IEEE_FLOAT, 32, lambda a: a.astype("<f4").tobytes()),
    np.dtype(np.float64): (_IEEE_FLOAT, 64, lambda a: a.astype("<f8").tobytes()),
}


def _pack24(a: np.ndarray) -> bytes:
    v = a.astype(np.int32)
    if v.size and (v.max() >= 1 << 23 or v.min() < -(1 << 23)):
        raise ValueError("wav: sample out of 24-bit range")
    u = (v & 0xFFFFFF).astype(np.uint32).ravel()
    out = np.empty((v.size, 3), dtype=np.uint8)
    out[:, 0] = u & 0xFF
    out[:, 1] = (u >> 8) & 0xFF
    out[:, 2] = (u >> 16) & 0xFF
    return out.tobytes()


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int | None = None) -> bytes:
    """(channels, n_frames) array -> canonical RIFF/WAVE bytes.

    The sample encoding follows the array dtype (uint8/int16/int32 PCM,
    float32/float64 IEEE); ``bits=24`` packs an int32 array as 24-bit PCM.
    """
    if samples.ndim == 1:
        samples = samples[None]
    if samples.ndim != 2:
        raise ValueError("samples must be (channels, n_frames)")
    channels, _n = samples.shape
    interleaved = np.ascontiguousarray(samples.T)
    if bits == 24:
        code, nbits, payload = _PCM, 24, _pack24(interleaved)
    else:
        try:
            code, nbits, writer = _ENCODE[samples.dtype]
        except KeyError:
            raise ValueError(f"wav: unsupported sample dtype {samples.dtype}")
        payload = writer(interleaved)
    block_align = channels * nbits // 8
    fmt = struct.pack(
        "<HHIIHH", code, channels, sample_rate,
        sample_rate * block_align, block_align, nbits,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
