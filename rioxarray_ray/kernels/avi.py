"""From-scratch AVI (RIFF 'AVI ') codec for uncompressed-DIB video — the
real "wild" video format behind multimodal.DECODERS (the video analogue
of kernels/png.py and kernels/wav.py; reference behavior anchor: the
open-any-GDAL-format front door of /root/reference/rioxarray/_io.py).

Public-spec implementation (Microsoft AVI RIFF form + BITMAPINFOHEADER):

- header parse: LIST 'hdrl' -> 'avih' (frame count, dims, usec/frame),
  LIST 'strl' -> 'strh' (stream type/fps) + 'strf' (BITMAPINFOHEADER)
- frame data: LIST 'movi' -> '00db'/'00dc' chunks in stream order
  (a '##wb' audio chunk in an interleaved file is skipped)
- pixel layout: BI_RGB (biCompression=0) at 24 or 32 bits per pixel —
  BGR(A) samples, BOTTOM-UP rows, scanlines padded to 4-byte alignment;
  and 8-bit palettized through the strf palette (grayscale or color)

``decode_avi`` returns ``(frames, fps)`` with frames shaped
``(n_frames, 3, height, width)`` uint8 in RGB band order.  Malformed
payloads raise ValueError (never silently masked).  ``encode_avi``
writes the canonical single-video-stream file for tests/pipelines.
"""

from __future__ import annotations

import struct

import numpy as np

from . import riff


def is_avi(data: bytes) -> bool:
    return riff.form_type(data) == b"AVI "


def _parse_bitmapinfo(body: bytes):
    if len(body) < 40:
        raise ValueError("avi: BITMAPINFOHEADER shorter than 40 bytes")
    (size, width, height, planes, bitcount, compression) = struct.unpack_from(
        "<IiiHHI", body, 0
    )
    if compression != 0:  # BI_RGB only — compressed codecs are foreign
        raise ValueError(f"avi: unsupported biCompression {compression}")
    if bitcount not in (8, 24, 32):
        raise ValueError(f"avi: unsupported biBitCount {bitcount}")
    palette = None
    if bitcount == 8:
        # palette entries are BGRX quads following the 40-byte header
        (used,) = struct.unpack_from("<I", body, 32)
        n = used or 256
        quads = np.frombuffer(body, np.uint8, count=4 * n, offset=40)
        palette = quads.reshape(n, 4)[:, [2, 1, 0]].copy()  # BGRX -> RGB
    return width, height, bitcount, palette


def _decode_frame(body, width, height, bitcount, palette) -> np.ndarray:
    bottom_up = height > 0
    h = abs(height)
    stride = ((width * bitcount // 8) + 3) & ~3
    if len(body) < stride * h:
        raise ValueError("avi: frame chunk shorter than its pixel grid")
    rows = np.frombuffer(body, np.uint8, count=stride * h).reshape(h, stride)
    if bottom_up:
        rows = rows[::-1]
    if bitcount == 8:
        idx = rows[:, :width]
        rgb = palette[idx]  # (h, w, 3)
    else:
        nb = bitcount // 8
        px = rows[:, : width * nb].reshape(h, width, nb)
        rgb = px[:, :, [2, 1, 0]]  # BGR(A) -> RGB, alpha dropped
    return np.ascontiguousarray(rgb.transpose(2, 0, 1))  # (3, h, w)


def decode_avi(data: bytes) -> tuple[np.ndarray, float]:
    """AVI bytes -> ((n_frames, 3, h, w) uint8 RGB frames, fps)."""
    if not is_avi(data):
        raise ValueError("avi: missing RIFF/AVI signature")
    fmt = None
    fps = 0.0
    frames: list[np.ndarray] = []

    def handle_list(body_start, body_size):
        nonlocal fmt, fps
        ltype = data[body_start : body_start + 4]
        inner = riff.walk(data, body_start + 4, body_start + body_size)
        if ltype in (b"hdrl", b"strl"):
            for cc, off, size in inner:
                if cc == b"LIST":
                    handle_list(off, size)
                elif cc == b"strh":
                    if data[off : off + 4] == b"vids" and size >= 32:
                        scale, rate = struct.unpack_from("<II", data, off + 20)
                        if scale:
                            fps = rate / scale
                elif cc == b"strf" and fmt is None:
                    fmt = _parse_bitmapinfo(data[off : off + size])
        elif ltype in (b"movi", b"rec "):
            if fmt is None:
                raise ValueError("avi: movi list before video strf header")
            for cc, off, size in inner:
                if cc[2:4] in (b"db", b"dc"):
                    frames.append(_decode_frame(data[off : off + size], *fmt))
                elif cc == b"LIST":  # 'rec ' interleave groups nest frames
                    handle_list(off, size)

    for cc, off, size in riff.top_level(data):
        if cc == b"LIST":
            handle_list(off, size)
        # 'idx1' index and 'JUNK' alignment chunks are skipped by spec
    if fmt is None:
        raise ValueError("avi: no video stream format (strf) found")
    if not frames:
        raise ValueError("avi: no frame chunks in movi list")
    return np.stack(frames), fps


def encode_avi(frames: np.ndarray, fps: float = 10.0) -> bytes:
    """(n_frames, 3, h, w) uint8 RGB -> canonical 24-bit BI_RGB AVI."""
    if frames.ndim != 4 or frames.shape[1] != 3:
        raise ValueError("frames must be (n_frames, 3, h, w)")
    n, _, h, w = frames.shape
    stride = ((w * 3) + 3) & ~3
    usec = int(round(1_000_000 / fps)) if fps else 0

    def chunk(cc: bytes, payload: bytes) -> bytes:
        return cc + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII", usec, stride * h * max(int(fps), 1), 0, 0x10,
        n, 0, 1, stride * h, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
                                        1, max(int(round(fps)), 1) if fps else 0,
                                        0, n, stride * h, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                       0, 0, 0, 0)
    movi_frames = []
    pad = np.zeros((h, stride), np.uint8)
    for k in range(n):
        rows = pad.copy()
        bgr = frames[k][[2, 1, 0]].transpose(1, 2, 0)  # (h, w, 3) BGR
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        movi_frames.append(chunk(b"00db", rows[::-1].tobytes()))
    body = (
        b"AVI "
        + lst(b"hdrl", chunk(b"avih", avih)
              + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
        + lst(b"movi", b"".join(movi_frames))
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
