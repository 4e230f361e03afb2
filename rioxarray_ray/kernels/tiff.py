"""From-scratch (Geo)TIFF codec — the reference's PRIMARY native format
(rioxarray's open_rasterio reads GeoTIFF through rasterio/GDAL:
/root/reference/rioxarray/_io.py:1000-1120).  Public-spec
implementation: TIFF 6.0 baseline (header, IFD walk, strip layout, both
byte orders) + the GeoTIFF 1.1 georeferencing tags.

Supported on decode (foreign layouts raise ValueError — corruption and
unimplemented features are never silently masked):

- byte order II / MM; single IFD (first image)
- strip organization (RowsPerStrip / StripOffsets / StripByteCounts)
- tile organization (TileWidth/TileLength/TileOffsets/TileByteCounts,
  edge-padded tiles cropped, chunky and planar) — the layout real
  cloud-optimized GeoTIFFs use
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
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_SAMPLE_FORMAT = 339
_TAG_PIXEL_SCALE = 33550
_TAG_GDAL_NODATA = 42113
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


def _read_ifd(data: bytes, bo: str, ifd_index: int = 0):
    """Read the ``ifd_index``-th IFD of the chain (0 = primary image;
    1.. = reduced-resolution overviews in a COG-style multi-IFD file)."""
    (off,) = struct.unpack_from(bo + "I", data, 4)
    for _hop in range(int(ifd_index)):
        if off == 0 or off + 2 > len(data):
            raise ValueError(f"tiff: no IFD at chain index {ifd_index}")
        (n,) = struct.unpack_from(bo + "H", data, off)
        next_at = off + 2 + 12 * n
        if next_at + 4 > len(data):
            raise ValueError("tiff: IFD chain pointer past end of file")
        (off,) = struct.unpack_from(bo + "I", data, next_at)
    if off == 0 or off + 2 > len(data):
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


def _decode_tiled(tags, w, h, samples, dt, planar, predictor, decompress,
                  fill=0):
    """Tiled layout (TIFF 6.0 §15): fixed-size tiles left-to-right,
    top-to-bottom, edge tiles padded to full size (cropped here); planar
    files repeat the whole tile grid per sample plane.  The horizontal
    predictor restarts on every tile row.  Offset/count 0 marks a sparse
    (absent) tile — GDAL convention — filled with ``fill``."""
    tw = int(tags[_TAG_TILE_WIDTH][0])
    tl = int(tags[_TAG_TILE_LENGTH][0])
    if tw <= 0 or tl <= 0:
        raise ValueError("tiff: non-positive tile dimensions")
    offsets = tags[_TAG_TILE_OFFSETS]
    counts = tags[_TAG_TILE_COUNTS]
    across = -(-w // tw)
    down = -(-h // tl)
    planes = samples if planar == 2 else 1
    spp = 1 if planar == 2 else samples
    n_tiles = across * down * planes
    if len(offsets) < n_tiles or len(counts) < n_tiles:
        raise ValueError(
            f"tiff: {len(offsets)} tile offsets for a {n_tiles}-tile grid"
        )
    native = dt.newbyteorder("=")
    out = np.empty((samples, h, w), dtype=native)
    n_t = tl * tw * spp
    idx = 0
    for p in range(planes):
        for ty in range(down):
            for tx in range(across):
                if offsets[idx] == 0 or counts[idx] == 0:
                    ys, xs = ty * tl, tx * tw
                    ye, xe = min(ys + tl, h), min(xs + tw, w)
                    if planar == 1:
                        out[:, ys:ye, xs:xe] = fill
                    else:
                        out[p, ys:ye, xs:xe] = fill
                    idx += 1
                    continue
                raw = decompress(offsets[idx], counts[idx], "tile")
                idx += 1
                flat = np.frombuffer(raw, dtype=dt, count=-1)
                if flat.size < n_t:
                    raise ValueError(
                        "tiff: tile data shorter than the tile grid"
                    )
                tile = flat[:n_t].reshape(tl, tw, spp)
                if predictor == 2:
                    tile = np.cumsum(
                        tile.astype(np.int64), axis=1, dtype=np.int64
                    ).astype(native)
                ys, xs = ty * tl, tx * tw
                ye, xe = min(ys + tl, h), min(xs + tw, w)
                part = tile[: ye - ys, : xe - xs].astype(native)
                if planar == 1:
                    out[:, ys:ye, xs:xe] = part.transpose(2, 0, 1)
                else:
                    out[p, ys:ye, xs:xe] = part[:, :, 0]
    return np.ascontiguousarray(out)


def decode_geotiff(data: bytes, ifd_index: int = 0):
    """TIFF bytes -> ((bands, h, w) native-dtype array, transform, crs).

    ``ifd_index`` selects an IFD along the chain (0 = full-resolution
    image, 1.. = overviews in a multi-IFD/COG file).  Sparse tiles
    (TileOffsets/ByteCounts of 0, the GDAL sparse-file convention) fill
    with the ``GDAL_NODATA`` (tag 42113) value, or 0 when absent."""
    if not is_tiff(data):
        raise ValueError("tiff: missing TIFF signature")
    bo = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, bo, ifd_index)
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
    if predictor not in (1, 2):
        raise ValueError(f"tiff: unsupported Predictor {predictor}")
    if predictor == 2 and dt.kind == "f":
        raise ValueError("tiff: predictor 2 on float samples")

    def _decompress(off, cnt, what):
        chunk = bytes(data[int(off) : int(off) + int(cnt)])
        if len(chunk) < int(cnt):
            raise ValueError(f"tiff: truncated {what}")
        if compression == 1:
            return chunk
        if compression in (8, 32946):
            return zlib.decompress(chunk)
        if compression == 5:
            return _lzw_decode(chunk)
        raise ValueError(f"tiff: unsupported Compression {compression}")

    if planar not in (1, 2):
        raise ValueError(f"tiff: unsupported PlanarConfiguration {planar}")

    if _TAG_TILE_WIDTH in tags:
        fill = 0
        nod_raw = tags.get(_TAG_GDAL_NODATA)
        if nod_raw is not None:
            try:
                nod_val = float(
                    bytes(nod_raw).split(b"\x00")[0].decode("ascii").strip()
                )
                if nod_val == nod_val or dt.kind == "f":
                    fill = np.asarray(nod_val).astype(dt.newbyteorder("="))
            except (ValueError, UnicodeDecodeError):
                pass
        pixels = _decode_tiled(tags, w, h, samples, dt, planar, predictor,
                               _decompress, fill=fill)
    else:
        offsets = tags[_TAG_STRIP_OFFSETS]
        counts = tags[_TAG_STRIP_COUNTS]

        raw = bytearray()
        for off, cnt in zip(offsets, counts):
            raw += _decompress(off, cnt, "strip")

        npx = h * w * samples
        flat = np.frombuffer(bytes(raw), dtype=dt, count=npx)
        if flat.size < npx:
            raise ValueError("tiff: strip data shorter than the pixel grid")
        if predictor == 2:
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
        if planar == 1:
            px = flat.reshape(h, w, samples).transpose(2, 0, 1)
        else:
            px = flat.reshape(samples, h, w)
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
                   compression: str = "none",
                   tile: tuple[int, int] | None = None) -> bytes:
    """(bands, h, w) -> canonical GeoTIFF (little-endian, chunky; one
    strip, or a tiled layout when ``tile=(tile_w, tile_h)`` is given;
    ``compression`` in none|deflate)."""
    if pixels.ndim == 2:
        pixels = pixels[None]
    bands, h, w = pixels.shape
    dt = pixels.dtype
    fmt = {"u": 1, "i": 2, "f": 3}.get(dt.kind)
    if fmt is None:
        raise ValueError(f"tiff: unsupported dtype {dt}")
    if compression == "deflate":
        comp_code = 8

        def _compress(b):
            return zlib.compress(b, 6)
    elif compression == "none":
        comp_code = 1

        def _compress(b):
            return b
    else:
        raise ValueError(f"tiff: unsupported compression {compression}")

    chunky = np.ascontiguousarray(
        pixels.transpose(1, 2, 0), dtype=dt.newbyteorder("<")
    )
    if tile is None:
        payloads = [_compress(chunky.tobytes())]
    else:
        twd, tht = int(tile[0]), int(tile[1])
        if twd <= 0 or tht <= 0:
            raise ValueError("tiff: non-positive tile dimensions")
        payloads = []
        for ys in range(0, h, tht):
            for xs in range(0, w, twd):
                block = np.zeros((tht, twd, bands), chunky.dtype)
                part = chunky[ys : ys + tht, xs : xs + twd]
                block[: part.shape[0], : part.shape[1]] = part
                payloads.append(_compress(block.tobytes()))

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
    if tile is None:
        add(_TAG_STRIP_OFFSETS, 4, [0])  # patched below
        add(_TAG_ROWS_PER_STRIP, 4, [h])
        add(_TAG_STRIP_COUNTS, 4, [len(payloads[0])])
    else:
        add(_TAG_TILE_WIDTH, 4, [twd])
        add(_TAG_TILE_LENGTH, 4, [tht])
        add(_TAG_TILE_OFFSETS, 4, [0] * len(payloads))  # patched below
        add(_TAG_TILE_COUNTS, 4, [len(p) for p in payloads])
    add(_TAG_SAMPLES, 3, [bands])
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
    pixel_off = data_off + len(extra)
    # pixel payloads are concatenated in tile/strip order from pixel_off
    sizes = [len(p) for p in payloads]
    offs = [pixel_off + int(s) for s in np.cumsum([0] + sizes[:-1])]
    if _TAG_TILE_OFFSETS in blobs:
        # rewrite the placeholder offsets blob in place
        pos = blobs[_TAG_TILE_OFFSETS] - data_off
        packed = struct.pack("<" + "I" * len(offs), *offs)
        extra[pos : pos + len(packed)] = packed

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, values in entries:
        if tag in (_TAG_STRIP_OFFSETS, _TAG_TILE_OFFSETS) and len(values) == 1:
            values = [offs[0]]
        size = _TYPE_SIZE[typ] * len(values)
        if size > 4:
            out += struct.pack("<HHII", tag, typ, len(values), blobs[tag])
        else:
            packed = struct.pack("<" + _TYPE_FMT[typ] * len(values), *values)
            out += struct.pack("<HHI", tag, typ, len(values))
            out += packed + b"\x00" * (4 - len(packed))
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    for p in payloads:
        out += p
    return bytes(out)


# --------------------------------------------------------------------------
# Range-request (COG) reading: header + only the tile ranges a window needs
# --------------------------------------------------------------------------


class LocalRangeReader:
    """RangeReader over a local file: the protocol is two calls —
    ``read_range(offset, size) -> bytes`` and ``size() -> int`` — exactly
    the surface an S3/HTTP range GET exposes, so a remote deployment
    swaps this class without touching the decode path.  (The reference
    reads COGs over /vsicurl/ the same way, test_integration__io.py http
    cases; no network exists in this sandbox.)"""

    def __init__(self, path: str):
        self._f = open(path, "rb")
        self._f.seek(0, 2)
        self._size = self._f.tell()
        self.ranges_read = 0
        self.bytes_read = 0

    def read_range(self, offset: int, size: int) -> bytes:
        self._f.seek(offset)
        out = self._f.read(size)
        self.ranges_read += 1
        self.bytes_read += len(out)
        return out

    def size(self) -> int:
        return self._size

    def close(self):
        self._f.close()


def _read_ifd_ranged(reader, ifd_index: int = 0):
    """Parse one IFD through ranged reads only: header (8 B), the entry
    table, and each oversize tag payload as its own range."""
    head = reader.read_range(0, 8)
    if len(head) < 8 or head[:2] not in (b"II", b"MM"):
        raise ValueError("tiff: missing TIFF signature")
    bo = "<" if head[:2] == b"II" else ">"
    if struct.unpack_from(bo + "H", head, 2)[0] != 42:
        raise ValueError("tiff: bad magic")
    (off,) = struct.unpack_from(bo + "I", head, 4)
    for _hop in range(int(ifd_index)):
        if off == 0:
            raise ValueError(f"tiff: no IFD at chain index {ifd_index}")
        (n,) = struct.unpack_from(bo + "H", reader.read_range(off, 2), 0)
        nxt = reader.read_range(off + 2 + 12 * n, 4)
        (off,) = struct.unpack_from(bo + "I", nxt, 0)
    if off == 0:
        raise ValueError("tiff: zero IFD offset")
    (n,) = struct.unpack_from(bo + "H", reader.read_range(off, 2), 0)
    table = reader.read_range(off + 2, 12 * n)
    tags = {}
    for k in range(n):
        tag, typ, count = struct.unpack_from(bo + "HHI", table, 12 * k)
        size = _TYPE_SIZE.get(typ, 1) * count
        if size <= 4:
            payload = table[12 * k + 8 : 12 * k + 8 + size]
        else:
            (ptr,) = struct.unpack_from(bo + "I", table, 12 * k + 8)
            payload = reader.read_range(ptr, size)
            if len(payload) < size:
                raise ValueError(f"tiff: truncated tag {tag}")
        if typ == 5:
            vals = struct.unpack(bo + "I" * (2 * count), payload)
            tags[tag] = [vals[2 * i] / (vals[2 * i + 1] or 1)
                         for i in range(count)]
        elif typ in _TYPE_FMT:
            tags[tag] = list(
                struct.unpack(bo + _TYPE_FMT[typ] * count, payload)
            )
        else:
            tags[tag] = payload
    return tags, bo


def _tag_nodata(tags, dt: np.dtype):
    nod_raw = tags.get(_TAG_GDAL_NODATA)
    if nod_raw is None:
        return None
    try:
        val = float(bytes(nod_raw).split(b"\x00")[0].decode("ascii").strip())
    except (ValueError, UnicodeDecodeError):
        return None
    if val != val and dt.kind != "f":
        return None
    return val


def decode_geotiff_window(reader, col_off: int, row_off: int,
                          win_w: int, win_h: int, ifd_index: int = 0):
    """Windowed COG read: fetch the header plus ONLY the tile ranges the
    window intersects.  Returns ((bands, win_h, win_w) pixels, the
    window-shifted transform, crs, nodata) — isel_window semantics
    (/root/reference/rioxarray/rioxarray.py:854-904) without ever reading
    the rest of the file.  Requires a tiled layout (strips would force a
    full-width read; the engine's own sink always writes tiles)."""
    tags, bo = _read_ifd_ranged(reader, ifd_index)
    if _TAG_TILE_WIDTH not in tags:
        raise ValueError("tiff: ranged window reads need a tiled layout")
    w = int(tags[_TAG_WIDTH][0])
    h = int(tags[_TAG_LENGTH][0])
    samples = int(tags.get(_TAG_SAMPLES, [1])[0])
    bits = int(tags.get(_TAG_BITS, [8])[0])
    fmts = tags.get(_TAG_SAMPLE_FORMAT, [1] * samples)
    dt = _dtype(bits, int(fmts[0]), bo)
    compression = int(tags.get(_TAG_COMPRESSION, [1])[0])
    planar = int(tags.get(_TAG_PLANAR, [1])[0])
    predictor = int(tags.get(_TAG_PREDICTOR, [1])[0])
    if planar != 1:
        raise ValueError("tiff: ranged reads support chunky layout only")
    if predictor not in (1, 2):
        raise ValueError(f"tiff: unsupported Predictor {predictor}")
    if col_off < 0 or row_off < 0 or win_w <= 0 or win_h <= 0 \
            or col_off + win_w > w or row_off + win_h > h:
        raise ValueError("tiff: window outside the raster extent")
    tw = int(tags[_TAG_TILE_WIDTH][0])
    tl = int(tags[_TAG_TILE_LENGTH][0])
    offsets = tags[_TAG_TILE_OFFSETS]
    counts = tags[_TAG_TILE_COUNTS]
    across = -(-w // tw)
    nod = _tag_nodata(tags, dt)
    native = dt.newbyteorder("=")
    fill = 0
    if nod is not None:
        fill = np.asarray(nod).astype(native)
    out = np.empty((samples, win_h, win_w), dtype=native)
    ty0, ty1 = row_off // tl, (row_off + win_h - 1) // tl
    tx0, tx1 = col_off // tw, (col_off + win_w - 1) // tw
    n_px_tile = tl * tw * samples
    for ty in range(ty0, ty1 + 1):
        for tx in range(tx0, tx1 + 1):
            # overlap of this tile with the window, absolute pixel coords
            ys, ye = max(ty * tl, row_off), min((ty + 1) * tl,
                                                row_off + win_h)
            xs, xe = max(tx * tw, col_off), min((tx + 1) * tw,
                                                col_off + win_w)
            idx = ty * across + tx
            if offsets[idx] == 0 or counts[idx] == 0:
                out[:, ys - row_off : ye - row_off,
                    xs - col_off : xe - col_off] = fill
                continue
            chunk = reader.read_range(int(offsets[idx]), int(counts[idx]))
            if len(chunk) < int(counts[idx]):
                raise ValueError("tiff: truncated tile range")
            if compression in (8, 32946):
                raw = zlib.decompress(chunk)
            elif compression == 5:
                raw = _lzw_decode(chunk)
            elif compression == 1:
                raw = chunk
            else:
                raise ValueError(
                    f"tiff: unsupported Compression {compression}"
                )
            flat = np.frombuffer(raw, dtype=dt, count=-1)
            if flat.size < n_px_tile:
                raise ValueError("tiff: tile data shorter than the tile")
            tile = flat[:n_px_tile].reshape(tl, tw, samples)
            if predictor == 2:
                tile = np.cumsum(
                    tile.astype(np.int64), axis=1, dtype=np.int64
                ).astype(native)
            part = tile[ys - ty * tl : ye - ty * tl,
                        xs - tx * tw : xe - tx * tw].astype(native)
            out[:, ys - row_off : ye - row_off,
                xs - col_off : xe - col_off] = part.transpose(2, 0, 1)
    transform = None
    if _TAG_TRANSFORM in tags:
        m = tags[_TAG_TRANSFORM]
        transform = (m[0], m[1], m[3], m[4], m[5], m[7])
    elif _TAG_PIXEL_SCALE in tags and _TAG_TIEPOINT in tags:
        sx, sy = tags[_TAG_PIXEL_SCALE][0], tags[_TAG_PIXEL_SCALE][1]
        i, j, _k, x, y, _z = tags[_TAG_TIEPOINT][:6]
        transform = (sx, 0.0, x - i * sx, 0.0, -sy, y + j * sy)
    if transform is not None:
        a, b, c, d, e, f = transform
        transform = (a, b, c + a * col_off + b * row_off,
                     d, e, f + d * col_off + e * row_off)
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
        if code and code not in (32767, 0):
            crs = f"EPSG:{code}"
    return np.ascontiguousarray(out), transform, crs, nod
