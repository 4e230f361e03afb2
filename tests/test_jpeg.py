"""From-scratch baseline JPEG codec tests.

The decoder is pinned by a HAND-BUILT minimal JFIF file (markers packed
with struct, entropy bits assembled against the Annex K tables in the
test itself) whose blocks are DC-only — the one case T.81 makes exact:
a flat block decodes to round(DC*Q0/8) + 128 precisely.  Encoder
round-trips then bound the full pipeline (structure exact at quality
100, PSNR on smooth content)."""

import struct

import numpy as np
import pytest

from rioxarray_ray.kernels import jpeg


def _canonical_codes(bits, values):
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


class _Bits:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def put(self, code, length):
        self.buf = (self.buf << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.buf >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0)
            self.n -= 8

    def done(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


def _mag(v):
    a, t = abs(v), 0
    while a:
        a >>= 1
        t += 1
    return t, (v if v >= 0 else v + (1 << t) - 1)


def test_hand_built_dc_only_grayscale_golden():
    """8x16 grayscale, two DC-only blocks, Q0=1: decoded blocks must be
    exactly round(DC/8)+128 -> flat 178 and 103."""
    dcs = [400, -200]  # DC coefficients => values 128+50=178, 128-25=103
    dc_tab = _canonical_codes(*jpeg.DC_LUM)
    ac_tab = _canonical_codes(*jpeg.AC_LUM)
    bits = _Bits()
    pred = 0
    for dc in dcs:
        t, code = _mag(dc - pred)
        pred = dc
        ln, cd = dc_tab[t]
        bits.put(cd, ln)
        bits.put(code & ((1 << t) - 1), t)
        ln, cd = ac_tab[0x00]  # EOB right away: AC all zero
        bits.put(cd, ln)
    entropy = bits.done()

    q = bytes([0]) + bytes([1] * 64)  # table 0, all ones
    dqt = b"\xff\xdb" + struct.pack(">H", len(q) + 2) + q
    sof = bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0])
    sof = b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof

    def dht(tc, spec):
        b, v = spec
        body = bytes([tc << 4]) + bytes(b) + bytes(v)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    sos = bytes([1, 1, 0x00, 0, 63, 0])
    sos = b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    payload = (b"\xff\xd8" + dqt + sof + dht(0, jpeg.DC_LUM)
               + dht(1, jpeg.AC_LUM) + sos + entropy + b"\xff\xd9")
    out = jpeg.decode_jpeg(payload)
    assert out.shape == (1, 8, 16)
    np.testing.assert_array_equal(out[0, :, :8], np.full((8, 8), 178))
    np.testing.assert_array_equal(out[0, :, 8:], np.full((8, 8), 103))


def test_flat_blocks_quality100_exact():
    """Per-8x8-flat content at quality 100 is DC-only with Q0=1 -> the
    whole encode/decode chain must be bit-exact."""
    rng = np.random.default_rng(11)
    blocks = rng.integers(0, 256, (3, 4), dtype=np.int64)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)[None]
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100))
    np.testing.assert_array_equal(out, img)


def test_structure_exact_quality100_420():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (32, 48)).astype(np.uint8)
    img = np.stack([g, g, g])  # constant chroma
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100, subsample=True))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_psnr_smooth_content():
    x, y = np.meshgrid(np.linspace(0, 1, 40), np.linspace(0, 1, 40))
    base = 128 + 90 * np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y)
    img = np.stack([base, 255 - base, np.full_like(base, 60)]).astype(np.uint8)
    for sub in (False, True):
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90, subsample=sub))
        mse = float(((out.astype(float) - img.astype(float)) ** 2).mean())
        psnr = 10 * np.log10(255**2 / mse)
        assert psnr >= (38 if not sub else 30), (sub, psnr)


def test_odd_dimensions_and_grayscale():
    img = (np.arange(3 * 13 * 19) % 251).astype(np.uint8).reshape(3, 13, 19)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=85, subsample=True))
    assert out.shape == (3, 13, 19)
    gray = img[:1]
    outg = jpeg.decode_jpeg(jpeg.encode_jpeg(gray, quality=85))
    assert outg.shape == (1, 13, 19)


def test_error_contracts():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"nope")
    good = jpeg.encode_jpeg(np.zeros((1, 8, 8), np.uint8))
    bad = bytearray(good)
    i = bad.index(b"\xff\xc0")
    bad[i + 1] = 0xC3  # lossless SOF: still outside the supported set
    with pytest.raises(ValueError, match="baseline and progressive"):
        jpeg.decode_jpeg(bytes(bad))
    # a baseline scan header is malformed under SOF2 rules (DC scan Se=63)
    prog = bytearray(good)
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        jpeg.decode_jpeg(bytes(prog))


@pytest.mark.parametrize(
    "shape,subsample,quality",
    [((1, 16, 16), False, 90), ((3, 37, 29), False, 85),
     ((3, 40, 48), True, 75), ((1, 8, 8), False, 50),
     ((3, 13, 11), False, 95)],
)
def test_progressive_roundtrip_bit_identical_to_baseline(
        shape, subsample, quality):
    """SOF2 multi-scan decode must reassemble EXACTLY the coefficients the
    baseline stream carries: decode(progressive) == decode(baseline)
    byte-for-byte at equal quality (both encoders share quantization)."""
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    base = jpeg.decode_jpeg(
        jpeg.encode_jpeg(px, quality=quality, subsample=subsample))
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(
        px, quality=quality, subsample=subsample))
    np.testing.assert_array_equal(base, prog)


def test_progressive_smooth_image_exercises_eob_runs():
    """A flat image makes every AC band empty -> long EOBn runs across
    blocks (the run-coalescing decode path), still bit-identical."""
    px = np.full((3, 64, 64), 128, np.uint8)
    px[:, 20:30, 20:30] = 200  # one feature so not all scans degenerate
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=90))
    prog = jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(px, quality=90))
    np.testing.assert_array_equal(base, prog)


def test_progressive_sniffs_and_routes_like_baseline():
    from rioxarray_ray.kernels import codecs

    px = (np.arange(3 * 24 * 24) % 251).astype(np.uint8).reshape(3, 24, 24)
    payload = jpeg.encode_jpeg_progressive(px, quality=92)
    assert jpeg.is_jpeg(payload)
    assert codecs.sniff(payload) == "jpeg"
    np.testing.assert_array_equal(
        codecs.decode(payload),
        jpeg.decode_jpeg(jpeg.encode_jpeg(px, quality=92)))


def test_multimodal_image_decoder_routes_jpeg():
    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels import codecs

    blocks = np.array([[10, 200], [90, 160]], dtype=np.int64)
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1).astype(np.uint8)[None]
    payload = jpeg.encode_jpeg(img, quality=100)
    assert codecs.sniff(payload) == "jpeg"
    np.testing.assert_array_equal(codecs.decode(payload), img)
    np.testing.assert_array_equal(multimodal.DECODERS["image"](payload), img)


def test_malformed_jpeg_raises_not_fake():
    from rioxarray_ray.functions import multimodal

    with pytest.raises(ValueError, match="malformed"):
        multimodal.DECODERS["image"](b"\xff\xd8\xff\xe0 not a real jpeg")
