"""From-scratch (Geo)TIFF codec — the reference's PRIMARY native format
(rioxarray's open_rasterio reads GeoTIFF through rasterio/GDAL:
/root/reference/rioxarray/_io.py:1000-1120).  Public-spec
implementation: TIFF 6.0 baseline (header, IFD walk, strip layout, both
byte orders) + the GeoTIFF 1.1 georeferencing tags.

Supported on decode (foreign layouts raise ValueError — corruption and
unimplemented features are never silently masked):

- byte order II / MM; single IFD (first image)
- strip organization (RowsPerStrip / StripOffsets / StripByteCounts)
- Compression 1 (none), 8 / 32946 (zlib DEFLATE), 5 (LZW, the spec's
  8-bit-code variant with horizontal differencing predictor 2)
- BitsPerSample 8/16/32/64, SampleFormat uint/int/ieeefp
- PlanarConfiguration 1 (chunky) and 2 (planar)
- GeoTIFF: ModelPixelScale + ModelTiepoint (or ModelTransformation)
  -> the affine transform; GeoKeyDirectory ProjectedCSTypeGeoKey /
  GeographicTypeGeoKey -> "EPSG:xxxx"

``decode_geotiff`` returns ``(pixels(bands,h,w), transform, crs_string)``
(transform/crs None when the georeferencing tags are absent — plain TIFF).
``encode_geotiff`` writes the canonical little-endian chunky single-strip
form with the geo tags, for tests and pipelines.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322
_TAG_SAMPLE_FORMAT = 339
_TAG_PIXEL_SCALE = 33550
_TAG_TIEPOINT = 33922
_TAG_TRANSFORM = 34264
_TAG_GEO_KEYS = 34735

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d"}

_GEOKEY_PROJECTED_CS = 3072
_GEOKEY_GEOGRAPHIC_TYPE = 2048


def is_tiff(data: bytes) -> bool:
    return len(data) >= 8 and data[:4] in (b"II*\x00", b"MM\x00*")


def _read_ifd(data: bytes, bo: str):
    (off,) = struct.unpack_from(bo + "I", data, 4)
    if off + 2 > len(data):
        raise ValueError("tiff: IFD offset past end of file")
    (n,) = struct.unpack_from(bo + "H", data, off)
    tags = {}
    for k in range(n):
        base = off + 2 + 12 * k
        tag, typ, count = struct.unpack_from(bo + "HHI", data, base)
        size = _TYPE_SIZE.get(typ, 1) * count
        if size <= 4:
            payload = data[base + 8 : base + 8 + size]
        else:
            (ptr,) = struct.unpack_from(bo + "I", data, base + 8)
            payload = data[ptr : ptr + size]
            if len(payload) < size:
                raise ValueError(f"tiff: truncated tag {tag}")
        if typ == 5:  # RATIONAL
            vals = struct.unpack(bo + "I" * (2 * count), payload)
            tags[tag] = [vals[2 * i] / (vals[2 * i + 1] or 1)
                         for i in range(count)]
        elif typ in _TYPE_FMT:
            tags[tag] = list(
                struct.unpack(bo + _TYPE_FMT[typ] * count, payload)
            )
        else:
            tags[tag] = payload
    return tags


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (8-bit codes, early-change, ClearCode 256)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset()
    width = 9
    buf = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (buf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                reset()
                width = 9
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("tiff: corrupt LZW stream")
            out += entry
            prev = entry
            # TIFF uses "early change": bump width one code early
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _dtype(bits: int, fmt: int, bo: str) -> np.dtype:
    kind = {1: "u", 2: "i", 3: "f"}.get(fmt)
    if kind is None:
        raise ValueError(f"tiff: unsupported SampleFormat {fmt}")
    if kind == "f" and bits not in (32, 64):
        raise ValueError(f"tiff: unsupported float width {bits}")
    if kind != "f" and bits not in (8, 16, 32):
        raise ValueError(f"tiff: unsupported integer width {bits}")
    return np.dtype(f"{'<' if bo == '<' else '>'}{kind}{bits // 8}")


def decode_geotiff(data: bytes):
    """TIFF bytes -> ((bands, h, w) native-dtype array, transform, crs)."""
    if not is_tiff(data):
        raise ValueError("tiff: missing TIFF signature")
    bo = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, bo)
    if _TAG_TILE_WIDTH in tags:
        raise ValueError("tiff: tiled layout not supported (strips only)")
    w = int(tags[_TAG_WIDTH][0])
    h = int(tags[_TAG_LENGTH][0])
    samples = int(tags.get(_TAG_SAMPLES, [1])[0])
    bits_list = tags.get(_TAG_BITS, [8])
    if len(set(bits_list)) != 1:
        raise ValueError("tiff: mixed per-sample bit depths")
    bits = int(bits_list[0])
    fmts = tags.get(_TAG_SAMPLE_FORMAT, [1] * samples)
    if len(set(fmts)) != 1:
        raise ValueError("tiff: mixed sample formats")
    dt = _dtype(bits, int(fmts[0]), bo)
    compression = int(tags.get(_TAG_COMPRESSION, [1])[0])
    planar = int(tags.get(_TAG_PLANAR, [1])[0])
    predictor = int(tags.get(_TAG_PREDICTOR, [1])[0])
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags[_TAG_STRIP_COUNTS]
    rows_per_strip = int(tags.get(_TAG_ROWS_PER_STRIP, [h])[0])

    raw = bytearray()
    for off, cnt in zip(offsets, counts):
        chunk = bytes(data[int(off) : int(off) + int(cnt)])
        if len(chunk) < int(cnt):
            raise ValueError("tiff: truncated strip")
        if compression == 1:
            raw += chunk
        elif compression in (8, 32946):
            raw += zlib.decompress(chunk)
        elif compression == 5:
            raw += _lzw_decode(chunk)
        else:
            raise ValueError(f"tiff: unsupported Compression {compression}")

    npx = h * w * samples
    flat = np.frombuffer(bytes(raw), dtype=dt, count=npx)
    if flat.size < npx:
        raise ValueError("tiff: strip data shorter than the pixel grid")
    if predictor == 2:
        if dt.kind == "f":
            raise ValueError("tiff: predictor 2 on float samples")
        if planar == 1:
            rows = flat.reshape(h, w, samples)
            flat = np.cumsum(
                rows.astype(np.int64), axis=1, dtype=np.int64
            ).astype(dt.newbyteorder("="))
            flat = flat.reshape(-1)
        else:
            rows = flat.reshape(samples, h, w)
            flat = np.cumsum(
                rows.astype(np.int64), axis=2, dtype=np.int64
            ).astype(dt.newbyteorder("=")).reshape(-1)
    elif predictor != 1:
        raise ValueError(f"tiff: unsupported Predictor {predictor}")
    if planar == 1:
        px = flat.reshape(h, w, samples).transpose(2, 0, 1)
    elif planar == 2:
        px = flat.reshape(samples, h, w)
    else:
        raise ValueError(f"tiff: unsupported PlanarConfiguration {planar}")
    pixels = np.ascontiguousarray(px.astype(dt.newbyteorder("=")))

    transform = None
    if _TAG_TRANSFORM in tags:
        m = tags[_TAG_TRANSFORM]
        transform = (m[0], m[1], m[3], m[4], m[5], m[7])
    elif _TAG_PIXEL_SCALE in tags and _TAG_TIEPOINT in tags:
        sx, sy = tags[_TAG_PIXEL_SCALE][0], tags[_TAG_PIXEL_SCALE][1]
        i, j, _k, x, y, _z = tags[_TAG_TIEPOINT][:6]
        # raster point (i,j) pins model point (x,y); scale y is NEGATED
        transform = (sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy)

    crs = None
    if _TAG_GEO_KEYS in tags:
        keys = tags[_TAG_GEO_KEYS]
        n_keys = int(keys[3])
        found = {}
        for k in range(n_keys):
            key_id, loc, cnt, val = keys[4 + 4 * k : 8 + 4 * k]
            if loc == 0 and cnt == 1:
                found[int(key_id)] = int(val)
        code = found.get(_GEOKEY_PROJECTED_CS) or found.get(
            _GEOKEY_GEOGRAPHIC_TYPE
        )
        if code and code not in (32767, 0):  # 32767 = user-defined
            crs = f"EPSG:{code}"
    return pixels, transform, crs


def encode_geotiff(pixels: np.ndarray, transform=None, crs: str | None = None,
                   compression: str = "none") -> bytes:
    """(bands, h, w) -> canonical GeoTIFF (little-endian, chunky, one
    strip; ``compression`` in none|deflate)."""
    if pixels.ndim == 2:
        pixels = pixels[None]
    bands, h, w = pixels.shape
    dt = pixels.dtype
    fmt = {"u": 1, "i": 2, "f": 3}.get(dt.kind)
    if fmt is None:
        raise ValueError(f"tiff: unsupported dtype {dt}")
    body = np.ascontiguousarray(
        pixels.transpose(1, 2, 0), dtype=dt.newbyteorder("<")
    ).tobytes()
    if compression == "deflate":
        comp_code, payload = 8, zlib.compress(body, 6)
    elif compression == "none":
        comp_code, payload = 1, body
    else:
        raise ValueError(f"tiff: unsupported compression {compression}")

    entries = []  # (tag, type, count, value-bytes or int)
    extra = bytearray()
    header_size = 8

    def add(tag, typ, values):
        entries.append((tag, typ, values))

    add(_TAG_WIDTH, 4, [w])
    add(_TAG_LENGTH, 4, [h])
    add(_TAG_BITS, 3, [dt.itemsize * 8] * bands)
    add(_TAG_COMPRESSION, 3, [comp_code])
    add(_TAG_PHOTOMETRIC, 3, [1])
    add(_TAG_STRIP_OFFSETS, 4, [0])  # patched below
    add(_TAG_SAMPLES, 3, [bands])
    add(_TAG_ROWS_PER_STRIP, 4, [h])
    add(_TAG_STRIP_COUNTS, 4, [len(payload)])
    add(_TAG_PLANAR, 3, [1])
    add(_TAG_SAMPLE_FORMAT, 3, [fmt] * bands)
    if transform is not None:
        a, b, c, d, e, f = transform
        if b or d:
            add(_TAG_TRANSFORM, 12,
                [a, b, 0.0, c, d, e, 0.0, f, 0.0, 0.0, 0.0, 0.0,
                 0.0, 0.0, 0.0, 1.0])
        else:
            add(_TAG_PIXEL_SCALE, 12, [a, -e, 0.0])
            add(_TAG_TIEPOINT, 12, [0.0, 0.0, 0.0, c, f, 0.0])
    if crs is not None:
        code = int(str(crs).upper().replace("EPSG:", ""))
        geo_key = (_GEOKEY_PROJECTED_CS
                   if code not in (4326, 4267, 4269) else
                   _GEOKEY_GEOGRAPHIC_TYPE)
        model = 2 if geo_key == _GEOKEY_GEOGRAPHIC_TYPE else 1
        add(_TAG_GEO_KEYS, 3,
            [1, 1, 0, 2, 1024, 0, 1, model, geo_key, 0, 1, code])
    entries.sort(key=lambda t: t[0])

    ifd_off = header_size
    ifd_size = 2 + 12 * len(entries) + 4
    data_off = ifd_off + ifd_size
    # lay out oversize tag payloads after the IFD
    blobs = {}
    for tag, typ, values in entries:
        size = _TYPE_SIZE[typ] * len(values)
        if size > 4:
            blobs[tag] = data_off + len(extra)
            extra += struct.pack("<" + _TYPE_FMT[typ] * len(values), *values)
            if len(extra) & 1:
                extra += b"\x00"
    strip_off = data_off + len(extra)

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, values in entries:
        if tag == _TAG_STRIP_OFFSETS:
            values = [strip_off]
        size = _TYPE_SIZE[typ] * len(values)
        if size > 4:
            out += struct.pack("<HHII", tag, typ, len(values), blobs[tag])
        else:
            packed = struct.pack("<" + _TYPE_FMT[typ] * len(values), *values)
            out += struct.pack("<HHI", tag, typ, len(values))
            out += packed + b"\x00" * (4 - len(packed))
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    out += payload
    return bytes(out)
