"""From-scratch (Geo)TIFF codec tests.

The decoder is pinned by HAND-BUILT files (IFD packed tag by tag with
struct, independent of the encoder) covering both byte orders, strip
splits, planar layout, predictor 2, and the GeoTIFF tags; encoder
round-trips then cover every dtype/compression both ways."""

import struct
import zlib

import numpy as np
import pytest

from rioxarray_ray.kernels import tiff

FMT = {1: "B", 3: "H", 4: "I", 12: "d"}
SIZE = {1: 1, 3: 2, 4: 4, 12: 8}


def build_tiff(bo, tags, payload):
    """Minimal single-IFD writer for golden construction (independent
    reimplementation: tags = [(tag, type, [values])], payload = strips)."""
    ifd_off = 8
    n = len(tags)
    data_off = ifd_off + 2 + 12 * n + 4
    extra = bytearray()
    blobs = {}
    for tag, typ, vals in tags:
        size = SIZE[typ] * len(vals)
        if size > 4:
            blobs[tag] = data_off + len(extra)
            extra += struct.pack(bo + FMT[typ] * len(vals), *vals)
    out = bytearray(struct.pack(bo + "2sHI",
                                b"II" if bo == "<" else b"MM", 42, ifd_off))
    out += struct.pack(bo + "H", n)
    for tag, typ, vals in sorted(tags):
        size = SIZE[typ] * len(vals)
        if size > 4:
            out += struct.pack(bo + "HHII", tag, typ, len(vals), blobs[tag])
        else:
            packed = struct.pack(bo + FMT[typ] * len(vals), *vals)
            out += struct.pack(bo + "HHI", tag, typ, len(vals))
            out += packed + b"\x00" * (4 - len(packed))
    out += struct.pack(bo + "I", 0)
    out += extra
    out += payload
    return bytes(out)


def _base_tags(w, h, strip_off, strip_len, bits=8, samples=1, extra=()):
    t = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [bits] * samples),
        (259, 3, [1]), (262, 3, [1]), (273, 4, [strip_off]),
        (277, 3, [samples]), (278, 4, [h]), (279, 4, [strip_len]),
        (284, 3, [1]),
    ]
    t.extend(extra)
    return t


def test_hand_built_uint8_both_endians():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    for bo in ("<", ">"):
        tags = _base_tags(4, 3, 0, 12)
        # compute strip offset after layout: header+ifd = 8+2+12*10+4
        off = 8 + 2 + 12 * len(tags) + 4
        tags = _base_tags(4, 3, off, 12)
        data = build_tiff(bo, tags, px.tobytes())
        out, transform, crs = tiff.decode_geotiff(data)
        np.testing.assert_array_equal(out[0], px)
        assert transform is None and crs is None


def test_hand_built_multi_strip_uint16_big_endian():
    px = np.arange(24, dtype=">u2").reshape(4, 6)
    tags0 = _base_tags(6, 4, 0, 0, bits=16)
    tags0.append((339, 3, [1]))
    # two strips of 2 rows each
    n = len(tags0) + 2  # offsets+counts become 2-count arrays -> blobs
    hdr = 8 + 2 + 12 * (len(tags0)) + 4
    # offsets/counts each 2x4 bytes -> blobbed after IFD
    blob = hdr
    s0 = blob + 16
    strips = [px[:2].tobytes(), px[2:].tobytes()]
    tags = [t for t in tags0 if t[0] not in (273, 278, 279)]
    tags += [(273, 4, [s0, s0 + len(strips[0])]), (278, 4, [2]),
             (279, 4, [len(strips[0]), len(strips[1])])]
    data = build_tiff(">", tags, b"".join(strips))
    out, _, _ = tiff.decode_geotiff(data)
    np.testing.assert_array_equal(out[0], px.astype(np.uint16))


def test_hand_built_geotiff_tags():
    px = np.ones((2, 2), dtype=np.uint8)
    tags = _base_tags(2, 2, 0, 4, extra=[
        (33550, 12, [0.5, 0.25, 0.0]),               # pixel scale
        (33922, 12, [0.0, 0.0, 0.0, 10.0, 20.0, 0.0]),  # tiepoint
        (34735, 3, [1, 1, 0, 2, 1024, 0, 1, 1, 3072, 0, 1, 3857]),
    ])
    off = 8 + 2 + 12 * len(tags) + 4
    # three oversize blobs precede the strip: scale 24B, tiepoint 48B, keys 24B
    strip_off = off + 24 + 48 + 24
    tags = _base_tags(2, 2, strip_off, 4, extra=[
        (33550, 12, [0.5, 0.25, 0.0]),
        (33922, 12, [0.0, 0.0, 0.0, 10.0, 20.0, 0.0]),
        (34735, 3, [1, 1, 0, 2, 1024, 0, 1, 1, 3072, 0, 1, 3857]),
    ])
    data = build_tiff("<", tags, px.tobytes())
    out, transform, crs = tiff.decode_geotiff(data)
    assert crs == "EPSG:3857"
    assert transform == (0.5, 0.0, 10.0, 0.0, -0.25, 20.0)
    np.testing.assert_array_equal(out[0], px)


def test_hand_built_lzw_with_predictor():
    """LZW golden encoded by an independent mini-encoder in the test."""
    row = np.array([10, 12, 11, 11, 15], dtype=np.uint8)
    # predictor 2: first sample verbatim, then horizontal differences
    diff = np.diff(row.astype(np.int16), prepend=np.int16(0))
    diff = (diff % 256).astype(np.uint8)

    def lzw_encode(data):
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        width = 9
        out_bits = []
        out_bits.append((256, width))  # clear
        cur = b""
        for byte in data:
            nxt = cur + bytes([byte])
            if nxt in table:
                cur = nxt
            else:
                out_bits.append((table[cur], width))
                table[nxt] = next_code
                next_code += 1
                if next_code + 1 > (1 << width):
                    width += 1
                cur = bytes([byte])
        if cur:
            out_bits.append((table[cur], width))
        out_bits.append((257, width))  # EOI
        buf = 0
        nb = 0
        res = bytearray()
        for code, wdt in out_bits:
            buf = (buf << wdt) | code
            nb += wdt
            while nb >= 8:
                res.append((buf >> (nb - 8)) & 0xFF)
                nb -= 8
        if nb:
            res.append((buf << (8 - nb)) & 0xFF)
        return bytes(res)

    payload = lzw_encode(bytes(diff))
    tags = _base_tags(5, 1, 0, len(payload),
                      extra=[(317, 3, [2]), (259, 3, [5])])
    tags = [t for t in tags if not (t[0] == 259 and t[2] == [1])]
    off = 8 + 2 + 12 * len(tags) + 4
    tags = [(t, ty, [off] if t == 273 else v) for t, ty, v in tags]
    data = build_tiff("<", tags, payload)
    out, _, _ = tiff.decode_geotiff(data)
    np.testing.assert_array_equal(out[0, 0], row)


@pytest.mark.parametrize(
    "arr,comp",
    [
        (np.arange(60, dtype=np.uint8).reshape(1, 6, 10), "none"),
        (np.arange(60, dtype=np.int16).reshape(1, 6, 10) - 30, "none"),
        ((np.arange(90, dtype=np.float32) / 7).reshape(3, 5, 6), "deflate"),
        (np.arange(48, dtype=np.uint16).reshape(3, 4, 4) * 100, "deflate"),
        (np.arange(24, dtype=np.int32).reshape(2, 3, 4) - 5, "none"),
    ],
)
def test_encode_decode_roundtrip(arr, comp):
    t = (0.1, 0.0, -58.0, 0.0, -0.2, 39.0)
    payload = tiff.encode_geotiff(arr, transform=t, crs="EPSG:32621",
                                  compression=comp)
    assert tiff.is_tiff(payload)
    out, transform, crs = tiff.decode_geotiff(payload)
    np.testing.assert_array_equal(out, arr)
    assert crs == "EPSG:32621"
    assert transform == pytest.approx(t)


def test_geographic_crs_and_error_contracts():
    arr = np.zeros((1, 2, 2), np.uint8)
    p = tiff.encode_geotiff(arr, crs="EPSG:4326")
    _, _, crs = tiff.decode_geotiff(p)
    assert crs == "EPSG:4326"
    with pytest.raises(ValueError, match="TIFF signature"):
        tiff.decode_geotiff(b"nope")
    with pytest.raises(ValueError, match="unsupported Compression"):
        bad = bytearray(tiff.encode_geotiff(arr))
        # patch Compression (tag 259) value to 7 (JPEG)
        n = struct.unpack_from("<H", bad, 8)[0]
        for k in range(n):
            base = 10 + 12 * k
            if struct.unpack_from("<H", bad, base)[0] == 259:
                struct.pack_into("<H", bad, base + 8, 7)
        tiff.decode_geotiff(bytes(bad))
    with pytest.raises(ValueError, match="truncated strip"):
        tiff.decode_geotiff(tiff.encode_geotiff(arr)[:-2])


def test_multimodal_image_decoder_routes_tiff():
    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels import codecs

    arr = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    payload = tiff.encode_geotiff(arr, compression="deflate")
    assert codecs.sniff(payload) == "tiff"
    np.testing.assert_array_equal(codecs.decode(payload), arr)
    np.testing.assert_array_equal(multimodal.DECODERS["image"](payload), arr)


def _tiled_tags(w, h, tw, tl, offs, counts, samples=1, extra=()):
    t = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8] * samples),
        (259, 3, [1]), (262, 3, [1]), (277, 3, [samples]), (284, 3, [1]),
        (322, 4, [tw]), (323, 4, [tl]), (324, 4, offs), (325, 4, counts),
    ]
    t.extend(extra)
    return t


def test_hand_built_tiled_edge_padding():
    # 3x3 image in 2x2 tiles: edge tiles are padded to full size in the
    # file and must be cropped on decode (TIFF 6.0 §15)
    px = np.arange(1, 10, dtype=np.uint8).reshape(3, 3)
    tiles = [
        bytes([1, 2, 4, 5]), bytes([3, 0, 6, 0]),
        bytes([7, 8, 0, 0]), bytes([9, 0, 0, 0]),
    ]
    tags = _tiled_tags(3, 3, 2, 2, [0, 0, 0, 0], [4, 4, 4, 4])
    hdr_end = 8 + 2 + 12 * len(tags) + 4
    base = hdr_end + 16 + 16  # offsets + counts blobs precede the tiles
    offs = [base, base + 4, base + 8, base + 12]
    tags = _tiled_tags(3, 3, 2, 2, offs, [4, 4, 4, 4])
    data = build_tiff("<", tags, b"".join(tiles))
    out, transform, crs = tiff.decode_geotiff(data)
    assert out.shape == (1, 3, 3)
    np.testing.assert_array_equal(out[0], px)


def test_hand_built_tiled_predictor():
    # horizontal differencing restarts on every TILE row, not image row
    tiles = [bytes([10, 2, 30, 1]), bytes([20, 3, 40, 4])]
    tags = _tiled_tags(4, 2, 2, 2, [0, 0], [4, 4], extra=[(317, 3, [2])])
    hdr_end = 8 + 2 + 12 * len(tags) + 4
    base = hdr_end + 8 + 8  # 2-entry offset/count arrays are 8-byte blobs
    tags = _tiled_tags(4, 2, 2, 2, [base, base + 4], [4, 4],
                       extra=[(317, 3, [2])])
    data = build_tiff("<", tags, b"".join(tiles))
    out, _, _ = tiff.decode_geotiff(data)
    np.testing.assert_array_equal(
        out[0], [[10, 12, 20, 23], [30, 31, 40, 44]]
    )


def test_encode_decode_tiled_roundtrip():
    rng = np.random.default_rng(13)
    src = rng.integers(0, 60000, size=(3, 10, 13), dtype=np.uint16)
    for comp in ("none", "deflate"):
        payload = tiff.encode_geotiff(
            src, transform=(0.5, 0.0, 7.0, 0.0, -0.25, 3.0),
            crs="EPSG:32633", compression=comp, tile=(8, 4),
        )
        out, transform, crs = tiff.decode_geotiff(payload)
        np.testing.assert_array_equal(out, src)
        assert crs == "EPSG:32633"
        assert transform == (0.5, 0.0, 7.0, 0.0, -0.25, 3.0)


def test_tiled_error_contracts():
    tags = _tiled_tags(4, 4, 2, 2, [0], [4])  # 4-tile grid, 1 offset
    data = build_tiff("<", tags, b"\x00" * 4)
    with pytest.raises(ValueError, match="tile offsets"):
        tiff.decode_geotiff(data)
