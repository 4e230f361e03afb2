"""Arrow schemas for engine-internal row shapes (SURVEY.md §1.2).

A row is a raster (whole image) or a tile of one — never a pixel.  Pixel
payloads are canonical little-endian buffers in a ``binary`` column with a
``dtype`` string column; ``transform`` is a 6-double list column (rasterio
order a,b,c,d,e,f).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TRANSFORM_TYPE = pa.list_(pa.float64(), 6)

RASTER_FIELDS = [
    ("image_id", pa.string()),
    ("band_count", pa.int32()),
    ("h", pa.int32()),
    ("w", pa.int32()),
    ("dtype", pa.string()),
    ("nodata", pa.float64()),
    ("crs", pa.string()),
    ("transform", TRANSFORM_TYPE),
    ("pixels", pa.binary()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
]

RASTER_SCHEMA = pa.schema(RASTER_FIELDS)

TILE_FIELDS = RASTER_FIELDS + [
    ("tile_row", pa.int32()),
    ("tile_col", pa.int32()),
    ("cell", pa.int64()),
    ("win_row_off", pa.int32()),
    ("win_col_off", pa.int32()),
    # halo bookkeeping (== 0/h/w when tiled without halo): core region
    # position within the (possibly expanded) pixel window
    ("core_roff", pa.int32()),
    ("core_coff", pa.int32()),
    ("core_h", pa.int32()),
    ("core_w", pa.int32()),
]

TILE_SCHEMA = pa.schema(TILE_FIELDS)


def pixels_to_bytes(arr: np.ndarray) -> bytes:
    """Canonical buffer: little-endian, C-order, band-major."""
    if arr.dtype == np.uint8:
        return np.ascontiguousarray(arr).tobytes()
    return np.ascontiguousarray(arr.astype(arr.dtype.newbyteorder("<"))).tobytes()


def binary_views(batch: pa.Table, column: str):
    """ZERO-COPY uint8 numpy views of every value in a binary column.

    Reads the Arrow offsets+data buffers directly — no python ``bytes``
    objects, no copies.  Views are read-only slices of the Arrow buffer.
    """
    col = batch[column]
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for chunk in chunks:
        buffers = chunk.buffers()
        offsets = np.frombuffer(
            buffers[1], dtype=np.int32, count=len(chunk) + 1,
            offset=chunk.offset * 4,
        )
        data = np.frombuffer(buffers[2], dtype=np.uint8)
        for j in range(len(chunk)):
            yield data[offsets[j] : offsets[j + 1]]


def pixel_views(batch: pa.Table):
    """ZERO-COPY (bands, h, w) numpy views of every row's pixels column."""
    bands = batch["band_count"].to_numpy(zero_copy_only=False)
    hs = batch["h"].to_numpy(zero_copy_only=False)
    ws = batch["w"].to_numpy(zero_copy_only=False)
    dtypes = batch["dtype"].to_pylist()
    for i, raw in enumerate(binary_views(batch, "pixels")):
        dt = np.dtype(dtypes[i]).newbyteorder("<")
        yield raw.view(dt).reshape(int(bands[i]), int(hs[i]), int(ws[i]))


class BinaryBuilder:
    """Accumulate numpy pixel arrays into ONE contiguous buffer and emit a
    pyarrow BinaryArray without creating per-row python bytes objects.

    ``reserve`` presizes the buffer: callers that know (or can bound) the
    total payload upfront skip the amortized-doubling reallocs, which on
    multi-GB decode/tile batches are pure extra DRAM traffic (~2x the
    payload).  Undersized reserves grow transparently.
    """

    _MAX = (1 << 31) - 1  # int32 offsets

    def __init__(self, reserve: int = 0):
        self._arr = np.empty(
            int(min(max(reserve, 0), self._MAX)), dtype=np.uint8
        )
        self._pos = 0
        self._offsets = [0]

    def _grow(self, need: int):
        new_cap = max(len(self._arr) * 2, self._pos + need, 1 << 16)
        grown = np.empty(int(min(new_cap, self._MAX)), dtype=np.uint8)
        grown[: self._pos] = self._arr[: self._pos]
        self._arr = grown

    def append(self, arr: np.ndarray):
        if arr.dtype.byteorder == ">":
            arr = arr.astype(arr.dtype.newbyteorder("<"))
        flat = np.ascontiguousarray(arr).reshape(-1).view(np.uint8)
        nb = flat.nbytes
        if self._pos + nb > self._MAX:
            raise ValueError(
                "BinaryBuilder output exceeds 2 GiB (int32 offsets); "
                "use a smaller batch_size / block size for this stage"
            )
        if self._pos + nb > len(self._arr):
            self._grow(nb)
        self._arr[self._pos : self._pos + nb] = flat
        self._pos += nb
        self._offsets.append(self._pos)

    def finish(self) -> pa.Array:
        n = len(self._offsets) - 1
        offsets_buf = pa.py_buffer(
            np.asarray(self._offsets, dtype=np.int32).tobytes()
        )
        # wrap the accumulated buffer WITHOUT copying: py_buffer keeps
        # the base object alive and nothing mutates it after finish()
        data_buf = pa.py_buffer(memoryview(self._arr)[: self._pos])
        return pa.Array.from_buffers(
            pa.binary(), n, [None, offsets_buf, data_buf]
        )


def build_binary_array(arrays) -> pa.Array:
    b = BinaryBuilder()
    for a in arrays:
        b.append(a)
    return b.finish()


def rebuild_table(batch, updates, builder, keep_idx=None):
    """Reassemble an output table on the input schema: ``updates`` maps
    column name -> pa.Array; ``builder.finish()`` supplies pixels; all other
    columns pass through (optionally row-filtered by ``keep_idx``)."""
    base = batch
    if keep_idx is not None:
        base = (
            batch.take(pa.array(keep_idx, pa.int32()))
            if keep_idx
            else batch.slice(0, 0)
        )
    arrays = []
    for field in batch.schema:
        if field.name in updates:
            arrays.append(updates[field.name])
        elif field.name == "pixels":
            arrays.append(builder.finish())
        else:
            col = base[field.name]
            arrays.append(
                col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            )
    return pa.Table.from_arrays(arrays, schema=batch.schema)


def decode_nodata(nodata: float, dtype: str):
    """NaN-sentinel convention: NaN = 'no nodata' for int dtypes, a real
    NaN nodata for float dtypes (round-1 convention, see stages/warp.py)."""
    if nodata != nodata:
        return None if np.dtype(dtype).kind in "iu" else float("nan")
    return nodata


def raster_from_view(pixels: np.ndarray, row: dict):
    """Raster over a zero-copy pixels view + its metadata row (no payload
    copy — the caller must treat the pixels as read-only)."""
    from ..kernels import crs as crs_mod
    from ..kernels.raster import Raster

    return Raster(
        pixels,
        tuple(row["transform"]),
        crs_mod.from_user_input(row["crs"]) if row["crs"] else None,
        nodata=decode_nodata(row["nodata"], row["dtype"]),
    )


def pixels_from_row(row: dict) -> np.ndarray:
    """Rebuild the (bands, h, w) array from a row dict (zero-copy view when
    the buffer alignment allows)."""
    dt = np.dtype(row["dtype"]).newbyteorder("<")
    arr = np.frombuffer(row["pixels"], dtype=dt)
    return arr.reshape(row["band_count"], row["h"], row["w"])


def raster_to_row(raster, image_id: str, caption: str = "", phash: int = 0) -> dict:
    from ..kernels.raster import Raster  # noqa: F401  (type ref)

    return {
        "image_id": image_id,
        "band_count": raster.count,
        "h": raster.height,
        "w": raster.width,
        "dtype": raster.pixels.dtype.name,
        "nodata": float(raster.nodata) if raster.nodata is not None else float("nan"),
        "crs": raster.crs.to_string() if raster.crs is not None else "",
        "transform": [float(v) for v in raster.transform],
        "pixels": pixels_to_bytes(raster.pixels),
        "caption": caption,
        "phash": phash,
    }


def row_to_raster(row: dict):
    from ..kernels import crs as crs_mod
    from ..kernels.raster import Raster

    return Raster(
        pixels_from_row(row).copy(),
        tuple(row["transform"]),
        crs_mod.from_user_input(row["crs"]) if row["crs"] else None,
        nodata=decode_nodata(row["nodata"], row["dtype"]),
    )
