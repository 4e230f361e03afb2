"""Single-file mosaic GeoTIFF sink (COG-style tiled layout + overviews).

The reference writes one georeferenced output file through windowed
rasterio writes under a lock (/root/reference/rioxarray/raster_writer.py:
224-341 ``RasterioWriter.to_raster`` with ``windowed=True``/``lock``).
The Ray-Data recast keeps every expensive step distributed — per-tile
compositing (stages/merge.py ``merge_stage``) and deflate compression run
in map tasks — and only finished COMPRESSED tile payloads stream to the
single writer, which lays them into a tiled, sparse-capable, optionally
overviewed (multi-IFD) GeoTIFF.  Driver state is the O(n_tiles) offset
table — the cost inherent to the one-file format — never pixels.

Sparse tiles follow the GDAL convention: TileOffsets/TileByteCounts of 0
mean "tile not present, fill with nodata" (kernels/tiff.py decodes them).
``GDAL_NODATA`` (ASCII tag 42113) carries the fill value.

At 100 TB the one-file contract is itself the bottleneck (one sequential
sink, 32-bit classic-TIFF offsets cap the file at 4 GiB); the engine's
native output is partitioned parquet / per-range GeoTIFFs
(api.to_geotiffs), and this sink exists for the reference-parity export
path.  The writer raises rather than silently corrupting past 4 GiB.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from ..kernels import affine as aff
from ..kernels import tiff as tiff_mod
from .merge import merge_stage, plan_union_grid

_T = tiff_mod  # tag constants live with the codec
_TAG_SUBFILE_TYPE = 254
_TAG_GDAL_NODATA = 42113

# classic-TIFF offsets are 32-bit; the writer refuses to cross this
_OFFSET_LIMIT = (1 << 32) - 1

_COMP_SCHEMA = pa.schema(
    [
        ("tile_id", pa.int64()),
        ("level", pa.int32()),  # 1 = base, L = overview decimation
        ("payload", pa.binary()),
    ]
)


def _nodata_fill(nodata, dt: np.dtype):
    """Fill value under the engine's NaN-sentinel convention (schema.py):
    NaN nodata on an integer dtype means "none declared" -> fill 0 (the
    rasterio unset default, mirrored from stages/merge.py reduce_tile)."""
    if nodata is None or nodata != nodata:
        return 0 if dt.kind in "iu" else np.nan
    return nodata


def _pad_tile(pixels: np.ndarray, ts: int, fill) -> np.ndarray:
    """Pad a (bands, th, tw) tile to (bands, ts, ts) with ``fill`` —
    TIFF tile payloads are always full tile size."""
    b, th, tw = pixels.shape
    if th == ts and tw == ts:
        return pixels
    out = np.full((b, ts, ts), fill, dtype=pixels.dtype)
    out[:, :th, :tw] = pixels
    return out


def compress_tiles_stage(
    mosaic_ds, n_tc: int, dst_tile_size: int, compression: str = "deflate",
    level: int = 1, **map_kwargs
):
    """mosaic rows (image_id 'mosaic/r/c') -> (tile_id, level, payload).

    Chunky (band-interleaved) layout, little-endian, zlib level 6 —
    matching kernels/tiff.encode_geotiff so the shared decoder round-trips
    bit-exact.  Runs distributed; payloads leaving this stage are the only
    bytes the single-file writer ever sees.
    """
    from .schema import pixel_views

    if compression not in ("deflate", "none"):
        raise ValueError(f"geotiff sink: unsupported compression {compression}")
    ts = int(dst_tile_size)

    def run(batch: pa.Table) -> pa.Table:
        ids, lvls, payloads = [], [], []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, px in zip(meta, pixel_views(batch)):
            _, tr, tc = row["image_id"].split("/")
            fill = np.asarray(
                _nodata_fill(row["nodata"], px.dtype), dtype=px.dtype
            )
            padded = _pad_tile(px, ts, fill)
            chunky = np.ascontiguousarray(
                padded.transpose(1, 2, 0),
                dtype=px.dtype.newbyteorder("<"),
            ).tobytes()
            if compression == "deflate":
                chunky = zlib.compress(chunky, 6)
            ids.append(int(tr) * n_tc + int(tc))
            lvls.append(level)
            payloads.append(chunky)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(lvls, pa.int32()),
                pa.array(payloads, pa.binary()),
            ],
            schema=_COMP_SCHEMA,
        )

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return mosaic_ds.map_batches(run, **kwargs)


def overview_mosaic_stage(mosaic_ds, grid, level: int, dst_tile_size: int):
    """Base mosaic tiles -> level-``level`` overview mosaic tiles.

    GDAL AVERAGE semantics via stages/stats.overview_blocks: each LxL
    block of VALID base pixels folds to the floor of their mean;
    all-invalid blocks stay nodata.  One groupby of base tiles onto
    their covering overview tile ((tr//L, tc//L)) — base tile size ts
    and ts//L both integral keeps every base tile wholly inside one
    overview tile, so pixels shuffle exactly once and each group's
    reduce is local numpy."""
    from ..kernels.nodata import valid_mask
    from .schema import RASTER_SCHEMA, binary_views, pixels_to_bytes
    from .stats import overview_blocks

    transform, width, height, crs_str, nodata, dtype = grid
    ts = int(dst_tile_size)
    lv = int(level)
    if ts % lv:
        raise ValueError(
            f"overview level {lv} must divide dst_tile_size {ts}"
        )
    ov_w = -(-width // lv)
    ov_h = -(-height // lv)
    ov_n_tc = -(-ov_w // ts)
    sub = ts // lv  # overview pixels contributed by one full base tile
    ov_transform = (
        transform[0] * lv,
        transform[1] * lv,
        transform[2],
        transform[3] * lv,
        transform[4] * lv,
        transform[5],
    )

    def keyed(batch: pa.Table) -> pa.Table:
        trs, tcs = [], []
        for iid in batch["image_id"].to_pylist():
            _, tr, tc = iid.split("/")
            trs.append(int(tr) // lv)
            tcs.append(int(tc) // lv)
        return batch.append_column(
            "ov_tile", pa.array(
                [r * ov_n_tc + c for r, c in zip(trs, tcs)], pa.int64()
            )
        )

    def reduce_group(group: pa.Table) -> pa.Table:
        ov_tile = int(group["ov_tile"][0].as_py())
        ovr, ovc = ov_tile // ov_n_tc, ov_tile % ov_n_tc
        lh = min(ts, ov_h - ovr * ts)
        lw = min(ts, ov_w - ovc * ts)
        bands = int(group["band_count"][0].as_py())
        dt = np.dtype(group["dtype"][0].as_py())
        nod = group["nodata"][0].as_py()
        fill = _nodata_fill(nod, dt)
        canvas = np.full((bands, lh, lw), fill, dtype=dt)
        hs = group["h"].to_numpy(zero_copy_only=False)
        ws = group["w"].to_numpy(zero_copy_only=False)
        bcs = group["band_count"].to_numpy(zero_copy_only=False)
        dts = group["dtype"].to_pylist()
        ids = group["image_id"].to_pylist()
        from .schema import decode_nodata

        sent = decode_nodata(float(nod), dt.name) if nod is not None else None
        for i, view in enumerate(binary_views(group, "pixels")):
            px = view.view(np.dtype(dts[i]).newbyteorder("<")).reshape(
                int(bcs[i]), int(hs[i]), int(ws[i])
            )
            _, tr, tc = ids[i].split("/")
            tr, tc = int(tr), int(tc)
            b, th, tw = px.shape
            ph = -(-th // lv) * lv
            pw = -(-tw // lv) * lv
            vm = valid_mask(px, sent)
            if ph != th or pw != tw:
                pad = np.full((b, ph, pw), fill, dtype=dt)
                pad[:, :th, :tw] = px
                vpad = np.zeros((b, ph, pw), dtype=bool)
                vpad[:, :th, :tw] = vm
                px, vm = pad, vpad
            ov, ok = overview_blocks(px, vm, lv)
            r0 = (tr - ovr * lv) * sub
            c0 = (tc - ovc * lv) * sub
            dst = canvas[:, r0 : r0 + ov.shape[1], c0 : c0 + ov.shape[2]]
            dst[ok] = ov[ok].astype(dt)
        tile_t = aff.window_transform(ov_transform, ovc * ts, ovr * ts)
        return pa.Table.from_pylist(
            [
                {
                    "image_id": f"mosaic/{ovr}/{ovc}",
                    "band_count": bands,
                    "h": lh,
                    "w": lw,
                    "dtype": dt.name,
                    "nodata": nod,
                    "crs": crs_str,
                    "transform": [float(v) for v in tile_t],
                    "pixels": pixels_to_bytes(canvas),
                    "caption": "",
                    "phash": 0,
                }
            ],
            schema=RASTER_SCHEMA,
        )

    keyed_ds = mosaic_ds.map_batches(
        keyed, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        keyed_ds.groupby("ov_tile").map_groups(
            reduce_group, batch_format="pyarrow"
        ),
        (ov_transform, ov_w, ov_h, crs_str, nodata, dtype),
    )


class _IFDPlan:
    """One IFD's deterministic byte layout: entry table + oversize-value
    region, sized before any payload exists so the writer knows the data
    start offset upfront."""

    def __init__(self, entries):
        # entries: list of (tag, typ, values:list) sorted by tag
        self.entries = sorted(entries, key=lambda t: t[0])
        self.table_size = 2 + 12 * len(self.entries) + 4
        extra = 0
        for _tag, typ, values in self.entries:
            size = tiff_mod._TYPE_SIZE[typ] * len(values)
            if size > 4:
                extra += size + (size & 1)
        self.extra_size = extra
        self.size = self.table_size + self.extra_size

    def serialize(self, offset: int, next_ifd: int) -> bytes:
        table = bytearray(struct.pack("<H", len(self.entries)))
        extra = bytearray()
        data_off = offset + self.table_size
        for tag, typ, values in self.entries:
            fmt = tiff_mod._TYPE_FMT.get(typ, "B")  # ASCII (2) packs as bytes
            size = tiff_mod._TYPE_SIZE[typ] * len(values)
            payload = struct.pack("<" + fmt * len(values), *values)
            if size <= 4:
                table += struct.pack("<HHI", tag, typ, len(values))
                table += payload.ljust(4, b"\x00")
            else:
                table += struct.pack(
                    "<HHII", tag, typ, len(values), data_off + len(extra)
                )
                extra += payload
                if len(extra) & 1:
                    extra += b"\x00"
        table += struct.pack("<I", next_ifd)
        assert len(table) == self.table_size and len(extra) == self.extra_size
        return bytes(table) + bytes(extra)


def _ascii_values(text: str):
    raw = text.encode("ascii") + b"\x00"
    return list(raw)


def _ifd_entries(grid, n_bands: int, dt: np.dtype, ts: int,
                 offsets, counts, compression: str, primary: bool,
                 nodata_text: str | None):
    transform, width, height, crs_str, _nodata, _dtype = grid
    fmt = {"u": 1, "i": 2, "f": 3}[dt.kind]
    comp_code = 8 if compression == "deflate" else 1
    entries = [
        (_TAG_SUBFILE_TYPE, 4, [0 if primary else 1]),
        (tiff_mod._TAG_WIDTH, 4, [int(width)]),
        (tiff_mod._TAG_LENGTH, 4, [int(height)]),
        (tiff_mod._TAG_BITS, 3, [dt.itemsize * 8] * n_bands),
        (tiff_mod._TAG_COMPRESSION, 3, [comp_code]),
        (tiff_mod._TAG_PHOTOMETRIC, 3, [1]),
        (tiff_mod._TAG_SAMPLES, 3, [n_bands]),
        (tiff_mod._TAG_PLANAR, 3, [1]),
        (tiff_mod._TAG_TILE_WIDTH, 4, [ts]),
        (tiff_mod._TAG_TILE_LENGTH, 4, [ts]),
        (tiff_mod._TAG_TILE_OFFSETS, 4, list(offsets)),
        (tiff_mod._TAG_TILE_COUNTS, 4, list(counts)),
        (tiff_mod._TAG_SAMPLE_FORMAT, 3, [fmt] * n_bands),
    ]
    if primary:
        a, b, c, d, e, f = transform
        if b or d:
            entries.append(
                (tiff_mod._TAG_TRANSFORM, 12,
                 [a, b, 0.0, c, d, e, 0.0, f,
                  0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
            )
        else:
            entries.append((tiff_mod._TAG_PIXEL_SCALE, 12, [a, -e, 0.0]))
            entries.append(
                (tiff_mod._TAG_TIEPOINT, 12, [0.0, 0.0, 0.0, c, f, 0.0])
            )
        if crs_str:
            code = int(str(crs_str).upper().replace("EPSG:", ""))
            geo_key = (
                tiff_mod._GEOKEY_PROJECTED_CS
                if code not in (4326, 4267, 4269)
                else tiff_mod._GEOKEY_GEOGRAPHIC_TYPE
            )
            model = 2 if geo_key == tiff_mod._GEOKEY_GEOGRAPHIC_TYPE else 1
            entries.append(
                (tiff_mod._TAG_GEO_KEYS, 3,
                 [1, 1, 0, 2, 1024, 0, 1, model, geo_key, 0, 1, code])
            )
        if nodata_text is not None:
            entries.append(
                (_TAG_GDAL_NODATA, 2, _ascii_values(nodata_text))
            )
    return entries


def write_mosaic_geotiff(
    ds,
    path: str,
    method: str = "first",
    dst_tile_size: int = 256,
    compression: str = "deflate",
    overview_levels=(),
    resolution=None,
    grid=None,
    sort_tiles: bool = True,
):
    """Mosaic ``ds`` (same-CRS raster/tile rows) into ONE tiled GeoTIFF.

    Distributed plan: metadata-only union-grid plan -> place+reduce
    compositing per dst tile -> per-tile deflate in map tasks ->
    (optional) per-level overview fold -> ONE writer streaming finished
    payloads into the file.  ``sort_tiles=True`` (default) range-sorts
    the compressed rows so tiles land in row-major order (the COG
    layout); ``False`` skips that shuffle and writes arrival order —
    valid TIFF, cheaper at scale.

    Returns ``(path, grid)`` where grid is the 6-tuple
    (transform, width, height, crs, nodata, dtype).
    """
    if grid is None:
        grid = plan_union_grid(ds, resolution=resolution)
    transform, width, height, crs_str, nodata, dtype = grid
    ts = int(dst_tile_size)
    n_tr = -(-height // ts)
    n_tc = -(-width // ts)
    mosaic, _ = merge_stage(
        ds, method=method, dst_tile_size=ts, grid=grid
    )
    # the merge reduce may change the dtype (count -> int64); mirror it
    dt = np.dtype(np.int64) if method == "count" else np.dtype(dtype)
    levels = []
    comp = compress_tiles_stage(mosaic, n_tc, ts, compression=compression)
    plans = [(1, n_tr, n_tc)]
    base_for_ov = mosaic
    for lv in sorted(int(v) for v in overview_levels):
        ov_ds, ov_grid = overview_mosaic_stage(base_for_ov, grid, lv, ts)
        _ovt, ov_w, ov_h, *_rest = ov_grid
        ov_n_tr, ov_n_tc = -(-ov_h // ts), -(-ov_w // ts)
        comp = comp.union(
            compress_tiles_stage(ov_ds, ov_n_tc, ts,
                                 compression=compression, level=lv)
        )
        plans.append((lv, ov_n_tr, ov_n_tc))
        levels.append((lv, ov_grid))
    if sort_tiles:
        comp = comp.sort(["level", "tile_id"])

    # deterministic layout: IFD sizes depend only on tile counts + bands.
    # Band count is a grid-level invariant (the merge precondition), so a
    # metadata-only single-row probe suffices
    probe = ds.select_columns(["band_count"]).limit(1).take_all()
    n_bands = int(probe[0]["band_count"]) if probe else 1

    nodata_text = None
    if nodata is not None and nodata == nodata:
        nodata_text = (
            str(int(nodata))
            if float(nodata).is_integer()
            else repr(float(nodata))
        )
    elif dt.kind == "f":
        nodata_text = "nan"

    grids = [grid] + [g for _lv, g in levels]
    ifd_plans = []
    for k, (lv, p_tr, p_tc) in enumerate(plans):
        n_tiles = p_tr * p_tc
        entries = _ifd_entries(
            grids[k], n_bands, dt, ts, [0] * n_tiles, [0] * n_tiles,
            compression, primary=(k == 0),
            nodata_text=nodata_text if k == 0 else None,
        )
        ifd_plans.append(_IFDPlan(entries))
    pos = 8
    ifd_offsets = []
    for plan in ifd_plans:
        ifd_offsets.append(pos)
        pos += plan.size + (plan.size & 1)
    data_start = pos

    # stream payloads -> file; record per-level offset tables
    offset_tables = {
        lv: ([0] * (p_tr * p_tc), [0] * (p_tr * p_tc))
        for lv, p_tr, p_tc in plans
    }
    limit = _OFFSET_LIMIT
    with open(path, "wb") as f:
        f.write(b"\x00" * data_start)
        cur = data_start
        for batch in comp.iter_batches(
            batch_size=1024, batch_format="pyarrow"
        ):
            lvls = batch["level"].to_numpy(zero_copy_only=False)
            tids = batch["tile_id"].to_numpy(zero_copy_only=False)
            payloads = batch["payload"]
            for i in range(batch.num_rows):
                blob = payloads[i].as_py()
                offs, cnts = offset_tables[int(lvls[i])]
                tid = int(tids[i])
                if cur + len(blob) > limit:
                    raise ValueError(
                        "geotiff sink: output exceeds the 4 GiB classic-"
                        "TIFF offset space — write per-range GeoTIFFs "
                        "(api.to_geotiffs) or raise dst_tile_size"
                    )
                offs[tid] = cur
                cnts[tid] = len(blob)
                f.write(blob)
                cur += len(blob)
        # final IFDs with the real offset tables
        f.seek(0)
        f.write(struct.pack("<2sHI", b"II", 42, ifd_offsets[0]))
        for k, (lv, p_tr, p_tc) in enumerate(plans):
            offs, cnts = offset_tables[lv]
            entries = _ifd_entries(
                grids[k], n_bands, dt, ts, offs, cnts, compression,
                primary=(k == 0),
                nodata_text=nodata_text if k == 0 else None,
            )
            plan = _IFDPlan(entries)
            if plan.size != ifd_plans[k].size:
                raise AssertionError("geotiff sink: IFD layout drifted")
            next_off = ifd_offsets[k + 1] if k + 1 < len(plans) else 0
            f.seek(ifd_offsets[k])
            f.write(plan.serialize(ifd_offsets[k], next_off))
    return path, grid
