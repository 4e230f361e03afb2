"""From-scratch PNG codec tests (kernels/png.py).

The goldens here are INDEPENDENT of the encoder: tests assemble PNG byte
streams by hand (struct + zlib + their own plain-Python filter application)
so the decoder is checked against the public spec, not against its own
writer.  Reference behavior anchor: the reference opens PNG through GDAL
(/root/reference/rioxarray/_io.py:1000-1328); this engine decodes it
natively.
"""

import struct
import zlib

import numpy as np
import pytest

from rioxarray_ray.kernels import png


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _build(w, h, depth, ctype, scanlines, extra=b"", interlace=0):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    return (
        png.SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def test_golden_gray8_all_filters_hand_built():
    """4x5 grayscale, one scanline per filter type, filters applied by hand
    (spec formulas written out inline, independent of the codec module)."""
    img = np.array(
        [
            [10, 20, 30, 40],
            [15, 25, 35, 45],
            [100, 90, 80, 70],
            [1, 2, 3, 4],
            [255, 0, 128, 7],
        ],
        dtype=np.uint8,
    )
    lines = bytearray()
    prev = [0, 0, 0, 0]
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        row = [int(v) for v in img[y]]
        lines.append(ftype)
        for i in range(4):
            a = row[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb and pa_ <= pc else (b if pb <= pc else c)
            lines.append((row[i] - pred) % 256)
        prev = row
    out = png.decode_png(_build(4, 5, 8, 0, bytes(lines)))
    assert out.shape == (1, 5, 4)
    assert np.array_equal(out[0], img)


def test_golden_rgb16_big_endian():
    """2x2 RGB 16-bit, filter 0: samples are big-endian per spec."""
    px = np.array(
        [[[1, 2, 3], [60000, 500, 0]], [[256, 257, 258], [65535, 0, 1]]],
        dtype=np.uint16,
    )
    lines = bytearray()
    for y in range(2):
        lines.append(0)
        for x in range(2):
            for c in range(3):
                lines += struct.pack(">H", int(px[y, x, c]))
    out = png.decode_png(_build(2, 2, 16, 2, bytes(lines)))
    assert out.dtype == np.uint16 and out.shape == (3, 2, 2)
    assert np.array_equal(out, px.transpose(2, 0, 1))


def test_golden_palette_with_trns():
    """2x2 palette image: PLTE expansion + tRNS alpha."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    trns = bytes([10, 20])  # alpha for entries 0,1; entry 2 -> opaque 255
    scan = bytes([0, 0, 1, 0, 2, 0])  # rows: [0,1], [2,0]
    data = _build(
        2, 2, 8, 3, scan,
        extra=_chunk(b"PLTE", plte) + _chunk(b"tRNS", trns),
    )
    out = png.decode_png(data)
    assert out.shape == (4, 2, 2)
    assert out[:, 0, 0].tolist() == [255, 0, 0, 10]
    assert out[:, 0, 1].tolist() == [0, 255, 0, 20]
    assert out[:, 1, 0].tolist() == [0, 0, 255, 255]


def test_golden_sub_byte_depths():
    """1/2/4-bit grayscale: MSB-first bit packing."""
    # 1-bit, 10 px wide (crosses a byte boundary): 1010101010 -> 0xAA 0x80
    out = png.decode_png(_build(10, 1, 1, 0, bytes([0, 0b10101010, 0b10000000])))
    assert out[0, 0].tolist() == [1, 0, 1, 0, 1, 0, 1, 0, 1, 0]
    # 2-bit, 3 px: values 3,0,2 -> bits 11 00 10 xx = 0xC8
    out = png.decode_png(_build(3, 1, 2, 0, bytes([0, 0b11001000])))
    assert out[0, 0].tolist() == [3, 0, 2]
    # 4-bit, 3 px: 15, 1, 9 -> 0xF1 0x90
    out = png.decode_png(_build(3, 1, 4, 0, bytes([0, 0xF1, 0x90])))
    assert out[0, 0].tolist() == [15, 1, 9]


def test_golden_adam7_interlaced():
    """9x9 gray8 Adam7: passes assembled by hand with the public pass grid
    (independent scatter loop), decoder must reproduce the de-interlaced
    image."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(9, 9), dtype=np.uint8)
    grid = [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]
    stream = bytearray()
    for x0, y0, dx, dy in grid:
        ys = list(range(y0, 9, dy))
        xs = list(range(x0, 9, dx))
        if not ys or not xs:
            continue
        for y in ys:
            stream.append(0)  # filter None per pass scanline
            for x in xs:
                stream.append(int(img[y, x]))
    out = png.decode_png(_build(9, 9, 8, 0, bytes(stream), interlace=1))
    assert np.array_equal(out[0], img)


def test_round_trip_every_band_count_and_filter():
    rng = np.random.default_rng(3)
    for bands in (1, 2, 3, 4):
        for dt in (np.uint8, np.uint16):
            arr = rng.integers(
                0, np.iinfo(dt).max + 1, size=(bands, 13, 7)
            ).astype(dt)
            for ft in (0, 1, 2, 3, 4, "mixed", "paeth"):
                back = png.decode_png(png.encode_png(arr, filter_type=ft))
                assert back.dtype == arr.dtype
                assert np.array_equal(back, arr), (bands, dt, ft)


def test_corruption_raises_never_masks():
    data = bytearray(png.encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8)))
    # flip one IDAT byte -> CRC mismatch must raise
    idx = data.index(b"IDAT") + 6
    data[idx] ^= 0xFF
    with pytest.raises(png.PNGError, match="CRC"):
        png.decode_png(bytes(data))
    with pytest.raises(png.PNGError, match="signature"):
        png.decode_png(b"\x89PNX" + bytes(12))
    # truncated stream
    good = png.encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8))
    with pytest.raises(png.PNGError):
        png.decode_png(good[:20])
    # IDAT shorter than geometry demands
    short = _build(4, 4, 8, 0, bytes([0, 1, 2, 3, 4]))  # 1 of 4 scanlines
    with pytest.raises(png.PNGError, match="shorter"):
        png.decode_png(short)


def test_codec_registry_routes_png():
    """kernels/codecs.sniff recognizes the PNG signature and decode()
    dispatches to the native PNG decoder — real foreign bytes stop hitting
    the multimodal fake."""
    from rioxarray_ray.kernels import codecs

    arr = np.arange(3 * 4 * 5, dtype=np.uint8).reshape(3, 4, 5)
    payload = png.encode_png(arr)
    assert codecs.sniff(payload) == "png"
    assert np.array_equal(codecs.decode(payload), arr)
    # fmt cross-check contract still holds
    with pytest.raises(ValueError, match="payload is png"):
        codecs.decode(payload, fmt="raw16")


def test_multimodal_feature_stage_decodes_real_png(ray_session):
    """feature_stage over REAL PNG payloads: the features must come from the
    actual pixels (identical pixels under different filter encodings give
    identical features; the hash-seeded fake would diverge)."""
    import ray.data as rd

    from rioxarray_ray.functions import multimodal

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(3, 32, 32), dtype=np.uint8)
    p_none = png.encode_png(arr, filter_type=0)
    p_paeth = png.encode_png(arr, filter_type=4)
    assert p_none != p_paeth  # different bytes, same pixels
    rows = [
        {"media_id": "a", "payload": p_none, "media_type": "image", "meta": "{}"},
        {"media_id": "b", "payload": p_paeth, "media_type": "image", "meta": "{}"},
    ]
    out = multimodal.feature_stage(
        rd.from_items(rows), concurrency=1, batch_size=2
    ).to_pandas()
    feats = {r["media_id"]: np.asarray(r["feature"]) for _, r in out.iterrows()}
    assert np.allclose(feats["a"], feats["b"])
    # and they equal the direct projection of the true pixels
    ext = multimodal.FeatureExtractor()
    expected = ext._standardize(arr).reshape(-1) @ ext.proj
    assert np.allclose(feats["a"], expected)
