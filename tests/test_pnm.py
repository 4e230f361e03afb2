"""From-scratch Netpbm codec tests — hand-written header/body goldens pin
the decoder independently of the encoder (comments, ASCII variants,
16-bit big-endian), then encoder round-trips cover both ways."""

import numpy as np
import pytest

from rioxarray_ray.kernels import codecs, pnm


def test_hand_built_p5_with_comments():
    data = b"P5 # graymap\n# another comment\n3 2\n255\n" + bytes(
        [10, 20, 30, 40, 50, 60]
    )
    assert pnm.is_pnm(data)
    out = pnm.decode_pnm(data)
    np.testing.assert_array_equal(out, [[[10, 20, 30], [40, 50, 60]]])


def test_hand_built_p2_ascii():
    data = b"P2\n2 2\n99\n0 7\n  99\t3\n"
    np.testing.assert_array_equal(pnm.decode_pnm(data), [[[0, 7], [99, 3]]])


def test_hand_built_p6_16bit_big_endian():
    # one RGB pixel, samples 256, 1, 65535 -> BE pairs
    data = b"P6\n1 1\n65535\n" + bytes([1, 0, 0, 1, 255, 255])
    out = pnm.decode_pnm(data)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out[:, 0, 0], [256, 1, 65535])


def test_encode_decode_roundtrips():
    rng = np.random.default_rng(3)
    g8 = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    np.testing.assert_array_equal(pnm.decode_pnm(pnm.encode_pnm(g8)), g8[None])
    rgb = rng.integers(0, 256, size=(3, 4, 6), dtype=np.uint8)
    np.testing.assert_array_equal(pnm.decode_pnm(pnm.encode_pnm(rgb)), rgb)
    g16 = rng.integers(0, 65536, size=(1, 3, 3), dtype=np.uint16)
    np.testing.assert_array_equal(pnm.decode_pnm(pnm.encode_pnm(g16)), g16)


def test_codec_registry_routes_pnm():
    src = np.arange(3 * 2 * 4, dtype=np.uint8).reshape(3, 2, 4)
    payload = pnm.encode_pnm(src)
    assert codecs.sniff(payload) == "pnm"
    np.testing.assert_array_equal(codecs.decode(payload), src)
    with pytest.raises(ValueError, match="payload is pnm"):
        codecs.decode(payload, fmt="gif")


def test_error_contracts():
    with pytest.raises(ValueError, match="signature"):
        pnm.decode_pnm(b"P7\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="shorter than the pixel grid"):
        pnm.decode_pnm(b"P5\n4 4\n255\n" + b"\x00" * 5)
    with pytest.raises(ValueError, match="truncated header"):
        pnm.decode_pnm(b"P5\n4 4")
    with pytest.raises(ValueError, match="exceeds declared maxval"):
        pnm.decode_pnm(b"P5\n2 1\n10\n" + bytes([5, 200]))
    from rioxarray_ray.functions import multimodal

    with pytest.raises(ValueError, match="malformed"):
        multimodal.DECODERS["image"](b"P5\n4 4\n255\n\x00")
