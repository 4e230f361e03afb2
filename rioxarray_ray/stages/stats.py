"""Raster value statistics: histograms, band math, overview pyramids.

Reference recipes these recast (rioxarray delegates all three to
numpy/xarray or GDAL utilities; the semantics below are the public,
documented ones):

- histogram: ``np.histogram(rds.values[rds.values != nodata])`` over a
  rioxarray-opened raster (the xarray ``plot.hist`` path); GDAL's
  ``gdalinfo -hist`` equivalent.
- band math: ``(rds.sel(band=2) - rds.sel(band=1)) / (sel2 + sel1)`` —
  the NDVI-style normalized-difference recipe from rioxarray's docs
  (georeferencing survives because arithmetic preserves dims/coords,
  see /root/reference/rioxarray/rioxarray.py accessor docs).
- overviews: GDAL ``BuildOverviews(AVERAGE)`` / COG overview levels —
  rioxarray exposes them at read time via ``open_rasterio(overview_level=)``
  (/root/reference/rioxarray/_io.py URI option handling).

Ray-Data recast (all three are ZERO-SHUFFLE or one-small-shuffle):

- ``histogram_stage``: per-batch bincount partials (tile loop, vectorized
  inside) -> ONE groupby((image_id, bucket)) Sum.  The shuffle moves
  (image_id, bucket, n) count rows only — at 100 TB the exchange volume
  is bounded by images x occupied buckets, never by pixels.
- ``normalized_difference_stage``: embarrassingly parallel map_batches;
  output volume ~= 8x input bytes/band-pair (float64 ratio), streams.
- ``overviews_stage``: per-tile block reduction with NO halo and NO
  shuffle — valid because the tile grid is cut at multiples of 64 and
  every level divides the tile size, so per-tile overview blocks ARE
  per-image overview blocks (the partitioning assumption, checked at
  runtime).  A failed run re-derives any tile independently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HIST_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bucket", pa.int64()),
        ("n", pa.int64()),
    ]
)

ND_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("win_row_off", pa.int32()),
        ("win_col_off", pa.int32()),
        ("nd", pa.list_(pa.float64())),
    ]
)

OVERVIEW_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("band", pa.int32()),
        ("level", pa.int32()),
        ("ov_h", pa.int32()),
        ("ov_w", pa.int32()),
        ("win_row_off", pa.int32()),
        ("win_col_off", pa.int32()),
        ("ov", pa.list_(pa.int64())),
        ("ov_valid", pa.list_(pa.bool_())),
    ]
)


def _row_nodata(row: dict):
    """Nodata coercion shared with focal_mean_stage: parquet NaN means
    'none' for integer rasters and NaN-sentinel for float ones."""
    nod = row["nodata"]
    if nod != nod:
        return None if np.dtype(row["dtype"]).kind in "iu" else float("nan")
    return nod


def histogram_stage(tiles_ds, bucket: int = 16, **map_kwargs):
    """Per-image pixel-value histogram of VALID pixels, bucketed by
    ``floor(px / bucket)`` (floor, not truncation — negative values fall
    in the bucket below zero, matching ``np.floor_divide``).

    Returns a Dataset of (image_id, bucket, n) rows.
    """
    from ray.data.aggregate import Sum

    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[tuple[str, int], int] = {}
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            vm = valid_mask(pixels, _row_nodata(row))
            v = pixels[vm].astype(np.int64)
            if v.size == 0:
                continue
            bo = np.floor_divide(v, bucket)
            uniq, counts = np.unique(bo, return_counts=True)
            iid = row["image_id"]
            for u, c in zip(uniq.tolist(), counts.tolist()):
                key = (iid, u)
                acc[key] = acc.get(key, 0) + c
        if not acc:
            return HIST_SCHEMA.empty_table()
        keys = list(acc.keys())
        return pa.table(
            {
                "image_id": pa.array([k[0] for k in keys]),
                "bucket": pa.array([k[1] for k in keys], pa.int64()),
                "n": pa.array([acc[k] for k in keys], pa.int64()),
            }
        )

    partials = tiles_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, **map_kwargs
    )
    return partials.groupby(["image_id", "bucket"]).aggregate(
        Sum("n", alias_name="n")
    )


def normalized_difference_stage(tiles_ds, band_a: int = 1, band_b: int = 0,
                                **map_kwargs):
    """NDVI-style normalized difference ``(A - B) / (A + B)`` between two
    bands of every tile (float64; NaN where either band is nodata or the
    denominator is zero).  Tiles with fewer bands than required raise.

    IEEE-determinism contract (lets DuckDB replay it bit-for-bit for the
    gate): the ratio is computed exactly as ``(a - b) / (a + b)`` on
    float64 promotions of the integer pixel values — one subtraction,
    one addition, one division, no rearrangement.
    """
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    need = max(band_a, band_b) + 1

    def run(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {name: [] for name in ND_SCHEMA.names}
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            if pixels.shape[0] < need:
                raise ValueError(
                    f"normalized_difference needs >= {need} bands; "
                    f"{row['image_id']} has {pixels.shape[0]}"
                )
            vm = valid_mask(pixels, _row_nodata(row))
            a = pixels[band_a].astype(np.float64)
            b = pixels[band_b].astype(np.float64)
            num = a - b
            den = a + b
            ok = vm[band_a] & vm[band_b] & (den != 0.0)
            with np.errstate(invalid="ignore", divide="ignore"):
                nd = np.where(ok, num / den, np.nan)
            out["image_id"].append(row["image_id"])
            out["tile_row"].append(row["tile_row"])
            out["tile_col"].append(row["tile_col"])
            out["h"].append(row["h"])
            out["w"].append(row["w"])
            out["win_row_off"].append(row["win_row_off"])
            out["win_col_off"].append(row["win_col_off"])
            out["nd"].append(nd.ravel())
        return pa.Table.from_pydict(out, schema=ND_SCHEMA)

    return tiles_ds.map_batches(
        run, batch_format="pyarrow", zero_copy_batch=True, **map_kwargs
    )


def overview_blocks(values: np.ndarray, vm: np.ndarray, level: int):
    """(bands, h//L, w//L) floor-mean of VALID pixels per LxL block plus
    the any-valid mask.  h and w must divide by ``level`` (the tile-grid
    alignment assumption; callers raise otherwise)."""
    b, h, w = values.shape
    v = np.where(vm, values.astype(np.int64), 0)
    s = v.reshape(b, h // level, level, w // level, level).sum(axis=(2, 4))
    c = (
        vm.astype(np.int64)
        .reshape(b, h // level, level, w // level, level)
        .sum(axis=(2, 4))
    )
    ok = c > 0
    ov = np.floor_divide(s, np.maximum(c, 1))
    return ov, ok


def overviews_stage(tiles_ds, levels=(2, 4, 8), **map_kwargs):
    """Overview (reduced-resolution) pyramid per tile: each level-L cell
    is the floor of the mean of the VALID base pixels in its LxL block
    (GDAL AVERAGE built from the base raster; all-nodata blocks are
    invalid).  Zero-shuffle: tile dims must divide every level, which the
    64-aligned tile grid guarantees for levels up to 8 on this corpus;
    violations raise rather than silently misalign.
    """
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    levels = tuple(int(lv) for lv in levels)

    def run(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {name: [] for name in OVERVIEW_SCHEMA.names}
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            h, w = pixels.shape[1], pixels.shape[2]
            vm = valid_mask(pixels, _row_nodata(row))
            for lv in levels:
                if h % lv or w % lv:
                    raise ValueError(
                        f"overview level {lv} does not divide tile "
                        f"{h}x{w} of {row['image_id']} — cut tiles at a "
                        f"multiple of {lv}"
                    )
                ov, ok = overview_blocks(pixels, vm, lv)
                for band in range(pixels.shape[0]):
                    out["image_id"].append(row["image_id"])
                    out["tile_row"].append(row["tile_row"])
                    out["tile_col"].append(row["tile_col"])
                    out["band"].append(band)
                    out["level"].append(lv)
                    out["ov_h"].append(h // lv)
                    out["ov_w"].append(w // lv)
                    out["win_row_off"].append(row["win_row_off"])
                    out["win_col_off"].append(row["win_col_off"])
                    out["ov"].append(ov[band].ravel())
                    out["ov_valid"].append(ok[band].ravel())
        return pa.Table.from_pydict(out, schema=OVERVIEW_SCHEMA)

    return tiles_ds.map_batches(
        run, batch_format="pyarrow", zero_copy_batch=True, **map_kwargs
    )


CONTOUR_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("tile_row", pa.int32()),
        ("tile_col", pa.int32()),
        ("band", pa.int32()),
        ("n_h", pa.int64()),
        ("n_v", pa.int64()),
        ("wsum_h", pa.int64()),
        ("wsum_v", pa.int64()),
        # boundary segment endpoints in tile-local pixel coords: each
        # horizontal edge separates (r, c) | (r, c+1), stored as (r, c);
        # vertical edges separate (r, c) / (r+1, c)
        ("edges_h", pa.list_(pa.int32())),
        ("edges_v", pa.list_(pa.int32())),
    ]
)


def contour_edges_stage(tiles_ds, threshold: float,
                        global_edges: bool = False, **map_kwargs):
    """Iso-contour boundary extraction at a threshold — the raster->
    vector step (GDAL ``gdal_contour`` / ``polygonize`` family; rioxarray
    users run these via the GDAL utilities on opened rasters).  An edge
    exists between two ADJACENT VALID pixels whose (value >= threshold)
    classification differs; nodata pixels never contribute.

    Zero-shuffle either way:

    - ``global_edges=False``: edges within each tile's own window only
      (cross-tile seam edges omitted).
    - ``global_edges=True``: tiles must be cut WITH ``halo >= 1``
      (stages/tile.py, the focal_mean recipe); each tile emits exactly
      the edges whose FIRST pixel lies in its core region, so seam
      edges appear once globally (ownership rule) and the union over
      tiles equals the whole-image edge set.  Thin margins raise.

    Output rows carry the boundary segment coordinates (core-local
    (r, c) of the first pixel) plus position-weighted checksums so the
    gate catches a misplaced edge, not just a miscount.  Tiles with no
    edge on any band emit nothing.
    """
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    def run(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {name: [] for name in CONTOUR_SCHEMA.names}
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            vm = valid_mask(pixels, _row_nodata(row))
            mk = pixels >= threshold
            cr, cc = row["core_roff"], row["core_coff"]
            ch, cw = row["core_h"], row["core_w"]
            if global_edges:
                for off, name in ((cr, "row"), (cc, "col")):
                    if off < 1 and row[f"win_{name}_off"] != off:
                        raise ValueError(
                            "global_edges needs tiles cut with halo >= 1 "
                            f"(got a {off}-px {name} margin)"
                        )
            for b in range(pixels.shape[0]):
                both_h = vm[b, :, :-1] & vm[b, :, 1:]
                dif_h = both_h & (mk[b, :, :-1] != mk[b, :, 1:])
                both_v = vm[b, :-1, :] & vm[b, 1:, :]
                dif_v = both_v & (mk[b, :-1, :] != mk[b, 1:, :])
                if global_edges:
                    own_h = np.zeros_like(dif_h)
                    own_h[cr : cr + ch, cc : cc + cw - 0] = True
                    # first pixel of an h-edge is at (r, c), c < W-1;
                    # ownership = first pixel in core
                    dif_h = dif_h & own_h[:, : dif_h.shape[1]]
                    own_v = np.zeros_like(dif_v)
                    own_v[cr : cr + ch - 0, cc : cc + cw] = True
                    dif_v = dif_v & own_v[: dif_v.shape[0], :]
                elif (cr, cc) != (0, 0) or (ch, cw) != pixels.shape[1:]:
                    # per-window edges over halo-cut tiles double-count
                    # every edge falling in two tiles' overlap — that
                    # mode is what global_edges=True (with ownership)
                    # is for
                    raise ValueError(
                        "global_edges=False requires halo=0 tiles "
                        f"(tile window {pixels.shape[1:]} != core "
                        f"({ch}, {cw}) at offset ({cr}, {cc})); cut "
                        "tiles without halo or pass global_edges=True"
                    )
                if not (dif_h.any() or dif_v.any()):
                    continue
                hr, hc = np.nonzero(dif_h)
                vr, vc = np.nonzero(dif_v)
                if global_edges:
                    hr, hc = hr - cr, hc - cc
                    vr, vc = vr - cr, vc - cc
                wt_h = 1 + (hr.astype(np.int64) * 64 + hc) % 97
                wt_v = 1 + (vr.astype(np.int64) * 64 + vc) % 97
                out["image_id"].append(row["image_id"])
                out["tile_row"].append(row["tile_row"])
                out["tile_col"].append(row["tile_col"])
                out["band"].append(b)
                out["n_h"].append(int(dif_h.sum()))
                out["n_v"].append(int(dif_v.sum()))
                out["wsum_h"].append(int(wt_h.sum()))
                out["wsum_v"].append(int(wt_v.sum()))
                out["edges_h"].append(
                    np.stack([hr, hc], axis=1).ravel().astype(np.int32)
                )
                out["edges_v"].append(
                    np.stack([vr, vc], axis=1).ravel().astype(np.int32)
                )
        return pa.Table.from_pydict(out, schema=CONTOUR_SCHEMA)

    return tiles_ds.map_batches(
        run, batch_format="pyarrow", zero_copy_batch=True, **map_kwargs
    )


def reclassify_stage(tiles_ds, bins, values, fill: int = -9999,
                     **map_kwargs):
    """Range reclassification (class remap) of pixel values — the
    land-cover-remap recipe rioxarray users run as
    ``xr.where`` chains / ``np.digitize`` over an opened raster
    (georeferencing survives because the op is per-pixel and preserves
    dims/coords, same contract as band math).  GDAL analogue:
    ``gdal_calc`` class tables / ``gdaldem color-relief`` binning.

    ``len(values) == len(bins) + 1``; a pixel maps to
    ``values[np.searchsorted(bins, px, side="right")]`` — i.e.
    ``px < bins[0] -> values[0]``, ``bins[i-1] <= px < bins[i] ->
    values[i]``, ``px >= bins[-1] -> values[-1]``.  Invalid (nodata)
    pixels map to ``fill`` and the output rows carry ``nodata=fill`` so
    downstream stages keep masking them.

    Ray-Data recast: embarrassingly parallel ``map_batches``, zero
    shuffle, output volume = 4 bytes/pixel (int32).  The class table is
    a few dozen scalars captured in the closure; a million-entry lookup
    table would instead be ``ray.put`` once and read inside an
    actor-pool ``__init__`` (same broadcast pattern as the PIP join's
    geometry index).
    """
    from ..kernels.nodata import valid_mask
    from .schema import TILE_SCHEMA, pixel_views, pixels_to_bytes

    edges = np.asarray(bins, dtype=np.int64)
    if edges.ndim != 1 or not np.all(np.diff(edges) > 0):
        raise ValueError("bins must be strictly increasing 1-D edges")
    table = np.asarray(values, dtype=np.int32)
    if table.shape != (edges.size + 1,):
        raise ValueError("need len(values) == len(bins) + 1")

    def run(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {name: [] for name in TILE_SCHEMA.names}
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            vm = valid_mask(pixels, _row_nodata(row))
            cls = table[np.searchsorted(edges, pixels.astype(np.int64),
                                        side="right")]
            burned = np.where(vm, cls, np.int32(fill)).astype(np.int32)
            for name in TILE_SCHEMA.names:
                if name == "pixels":
                    out[name].append(pixels_to_bytes(burned))
                elif name == "dtype":
                    out[name].append("int32")
                elif name == "nodata":
                    out[name].append(float(fill))
                else:
                    out[name].append(row[name])
        return pa.Table.from_pydict(out, schema=TILE_SCHEMA)

    return tiles_ds.map_batches(
        run, batch_format="pyarrow", zero_copy_batch=True, **map_kwargs
    )


def band_stats_stage(tiles_ds, **map_kwargs):
    """Corpus-wide per-band pixel moments — the dataset-normalization
    statistics every training pipeline computes before standardizing
    inputs (mean/std per channel; torchvision Normalize's upstream
    numbers).  Integer-exact: n, sum, sum-of-squares as BIGINT over
    VALID pixels.

    100-TB shape: per-batch partials (one row per band per batch) ->
    ONE groupby(band) Sum over rows whose cardinality is bands x
    batches — the canonical combiner-before-shuffle reduction; pixels
    never shuffle.
    """
    from ray.data.aggregate import Sum

    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[int, list[int]] = {}
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            vm = valid_mask(pixels, _row_nodata(row))
            for b in range(pixels.shape[0]):
                v = pixels[b][vm[b]].astype(np.int64)
                if v.size == 0:
                    continue
                ent = acc.setdefault(b, [0, 0, 0])
                ent[0] += int(v.size)
                ent[1] += int(v.sum())
                ent[2] += int((v * v).sum())
        return pa.table(
            {
                "band": pa.array(sorted(acc), pa.int64()),
                "n": pa.array([acc[b][0] for b in sorted(acc)], pa.int64()),
                "s1": pa.array([acc[b][1] for b in sorted(acc)], pa.int64()),
                "s2": pa.array([acc[b][2] for b in sorted(acc)], pa.int64()),
            }
        )

    partials = tiles_ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True, **map_kwargs
    )
    return partials.groupby("band").aggregate(
        Sum("n", alias_name="n"),
        Sum("s1", alias_name="s1"),
        Sum("s2", alias_name="s2"),
    )


def equalize_stage(tiles_ds, levels: int = 255, fill: int = -1,
                   **map_kwargs):
    """Per-image histogram equalization — the classic CDF remap
    (OpenCV ``equalizeHist`` / skimage ``equalize_hist`` contract,
    integerized): for each (image, band),

        eq(v) = floor((cnt_le(v) - cnt_min) * levels / (n - cnt_min))

    where ``cnt_le`` counts valid pixels <= v in the WHOLE image band,
    ``cnt_min`` is the count of the minimum value and ``n`` the valid
    total; constant bands map to 0; nodata pixels map to ``fill``.

    100-TB shape: equalization needs image-global order statistics, so
    tiles co-shuffle to their image via ONE groupby(image_id) — the
    same partition assumption as merge/overviews (one image's tiles fit
    one task; images are bounded by sensor geometry).  The LUT is built
    once per (image, band) via np.unique + cumsum and applied with one
    searchsorted per tile — no per-pixel Python.
    """
    from ..kernels.nodata import valid_mask
    from .schema import TILE_SCHEMA, pixel_views, pixels_to_bytes

    def eq_group(group: pa.Table) -> pa.Table:
        meta = group.drop_columns(["pixels"]).to_pylist()
        views = list(pixel_views(group))
        n_bands = views[0].shape[0] if views else 0
        vms = [valid_mask(px, _row_nodata(row))
               for row, px in zip(meta, views)]
        luts: list[tuple[np.ndarray, np.ndarray]] = []
        for b in range(n_bands):
            allv = np.concatenate(
                [px[b][vm[b]].ravel() for px, vm in zip(views, vms)]
            ) if views else np.empty(0, np.int64)
            if allv.size == 0:
                luts.append((np.empty(0, np.int64),
                             np.empty(0, np.int64)))
                continue
            vals, counts = np.unique(allv.astype(np.int64),
                                     return_counts=True)
            cle = np.cumsum(counts)
            n = int(cle[-1])
            cmin = int(counts[0])
            if n > cmin:
                eq = (cle - cmin) * levels // (n - cmin)
            else:
                eq = np.zeros_like(cle)
            luts.append((vals, eq.astype(np.int64)))
        out: dict[str, list] = {name: [] for name in TILE_SCHEMA.names}
        for row, px, vm in zip(meta, views, vms):
            burned = np.full(px.shape, np.int32(fill), np.int32)
            for b in range(px.shape[0]):
                vals, eq = luts[b]
                if vals.size == 0:
                    continue
                m = vm[b]
                burned[b][m] = eq[
                    np.searchsorted(vals, px[b][m].astype(np.int64))
                ].astype(np.int32)
            for name in TILE_SCHEMA.names:
                if name == "pixels":
                    out[name].append(pixels_to_bytes(burned))
                elif name == "dtype":
                    out[name].append("int32")
                elif name == "nodata":
                    out[name].append(float(fill))
                else:
                    out[name].append(row[name])
        return pa.Table.from_pydict(out, schema=TILE_SCHEMA)

    return tiles_ds.groupby("image_id").map_groups(
        eq_group, batch_format="pyarrow", **map_kwargs
    )


REGION_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("band", pa.int64()),
        ("label", pa.int64()),
        ("area", pa.int64()),
        ("min_r", pa.int64()),
        ("min_c", pa.int64()),
        ("max_r", pa.int64()),
        ("max_c", pa.int64()),
        ("wsum", pa.int64()),
    ]
)


def label_components(fg: np.ndarray) -> np.ndarray:
    """Min-flat-index 4-connected component labels of a boolean mask
    (values >= H*W outside the mask); vectorized min-propagation with
    pointer jumping — L = min(L, L[L], 4-neighbor mins) until fixpoint,
    no per-pixel Python."""
    H, W = fg.shape
    BIG = np.int64(H * W + 7)
    idx = np.arange(H * W, dtype=np.int64).reshape(H, W)
    lab = np.where(fg, idx, BIG)
    while True:
        new = lab.copy()
        new[1:, :] = np.minimum(new[1:, :],
                                np.where(fg[1:, :], lab[:-1, :], BIG))
        new[:-1, :] = np.minimum(new[:-1, :],
                                 np.where(fg[:-1, :], lab[1:, :], BIG))
        new[:, 1:] = np.minimum(new[:, 1:],
                                np.where(fg[:, 1:], lab[:, :-1], BIG))
        new[:, :-1] = np.minimum(new[:, :-1],
                                 np.where(fg[:, :-1], lab[:, 1:], BIG))
        new = np.where(fg, new, BIG)
        flat = new.ravel()
        j = flat[np.where(flat < BIG, flat, 0)]
        new = np.where(flat < BIG, np.minimum(flat, j), BIG).reshape(H, W)
        if np.array_equal(new, lab):
            return lab
        lab = new


def region_label_stage(tiles_ds, threshold: float, **map_kwargs):
    """Connected-region labeling of the threshold classification — the
    raster→vector region step (GDAL ``polygonize`` / ``sieve`` family:
    rioxarray users run both on opened rasters; contour_edges_stage
    extracts the boundaries, this labels the interiors).  A region is a
    4-connected component of VALID pixels with ``px >= threshold``; its
    label is the minimum flat pixel index ``r*w + c`` it contains — a
    schedule-independent fixed point, so any correct labeling agrees.

    Per (image, band, region): area, bbox and a position-weighted
    checksum (misassigned pixels break the hash, not just counts).

    100-TB shape: labeling needs image-global connectivity, so tiles
    co-group by image via ONE groupby(image_id) (same partition
    assumption as merge/equalize: one image per task).  Inside the task
    the labeling is vectorized min-propagation WITH pointer jumping
    (L = min(L, L[L], 4-neighbor mins) until fixpoint — O(log diameter)
    rounds, no per-pixel Python).
    """
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    def label_group(group: pa.Table) -> pa.Table:
        meta = group.drop_columns(["pixels"]).to_pylist()
        views = list(pixel_views(group))
        if not meta:
            return REGION_SCHEMA.empty_table()
        # reassemble the image grid from its tiles
        H = max(r["win_row_off"] + r["h"] for r in meta)
        W = max(r["win_col_off"] + r["w"] for r in meta)
        bands = views[0].shape[0]
        iid = meta[0]["image_id"]
        out: dict[str, list] = {n: [] for n in REGION_SCHEMA.names}
        for b in range(bands):
            fg = np.zeros((H, W), bool)
            for row, px in zip(meta, views):
                vm = valid_mask(px, _row_nodata(row))
                ro, co = row["win_row_off"], row["win_col_off"]
                fg[ro:ro + row["h"], co:co + row["w"]] = (
                    vm[b] & (px[b] >= threshold)
                )
            if not fg.any():
                continue
            lab = label_components(fg)
            labs = lab[fg]
            rr, cc = np.nonzero(fg)
            wt = 1 + ((rr % 64) * 64 + (cc % 64)) % 97
            order = np.argsort(labs, kind="stable")
            labs_s = labs[order]
            uniq, starts = np.unique(labs_s, return_index=True)
            ends = np.append(starts[1:], labs_s.size)
            rr_s, cc_s, wt_s = rr[order], cc[order], wt[order]
            for u, s, t in zip(uniq, starts, ends):
                out["image_id"].append(iid)
                out["band"].append(b)
                out["label"].append(int(u))
                out["area"].append(int(t - s))
                out["min_r"].append(int(rr_s[s:t].min()))
                out["min_c"].append(int(cc_s[s:t].min()))
                out["max_r"].append(int(rr_s[s:t].max()))
                out["max_c"].append(int(cc_s[s:t].max()))
                out["wsum"].append(int(wt_s[s:t].sum()))
        return pa.Table.from_pydict(out, schema=REGION_SCHEMA)

    return tiles_ds.groupby("image_id").map_groups(
        label_group, batch_format="pyarrow", **map_kwargs
    )


def sieve_stage(tiles_ds, threshold: float, min_size: int, **map_kwargs):
    """GDAL ``SieveFilter`` semantics on the threshold classification:
    foreground regions SMALLER than ``min_size`` connected pixels are
    masked to nodata (speckle removal before polygonize/contour); all
    other pixels pass through unchanged.

    Same distribution shape as region_label_stage (ONE
    groupby(image_id); image-global connectivity via label_components);
    output rows are the input tiles with small-region pixels replaced
    by the row's nodata value (integer rasters without a nodata
    sentinel raise — the caller must pick one first, same contract as
    the reference's masking ops).
    """
    from ..kernels.nodata import valid_mask
    from .schema import TILE_SCHEMA, pixel_views, pixels_to_bytes

    def sieve_group(group: pa.Table) -> pa.Table:
        meta = group.drop_columns(["pixels"]).to_pylist()
        views = list(pixel_views(group))
        if not meta:
            return TILE_SCHEMA.empty_table()
        H = max(r["win_row_off"] + r["h"] for r in meta)
        W = max(r["win_col_off"] + r["w"] for r in meta)
        bands = views[0].shape[0]
        kill = np.zeros((bands, H, W), bool)
        vms = []
        for row, px in zip(meta, views):
            vms.append(valid_mask(px, _row_nodata(row)))
        for b in range(bands):
            fg = np.zeros((H, W), bool)
            for (row, px), vm in zip(zip(meta, views), vms):
                ro, co = row["win_row_off"], row["win_col_off"]
                fg[ro:ro + row["h"], co:co + row["w"]] = (
                    vm[b] & (px[b] >= threshold)
                )
            if not fg.any():
                continue
            lab = label_components(fg)
            uniq, counts = np.unique(lab[fg], return_counts=True)
            small = uniq[counts < min_size]
            if small.size == 0:
                continue
            kill[b] = fg & np.isin(lab, small)
        out: dict[str, list] = {n: [] for n in TILE_SCHEMA.names}
        for row, px in zip(meta, views):
            nod = _row_nodata(row)
            if nod is None:
                raise ValueError(
                    f"sieve needs a nodata sentinel; {row['image_id']} "
                    "has none (integer raster, nodata unset)"
                )
            ro, co = row["win_row_off"], row["win_col_off"]
            kz = kill[:, ro:ro + row["h"], co:co + row["w"]]
            arr = np.where(
                kz, np.array(nod).astype(px.dtype), px
            ).astype(px.dtype)
            for name in TILE_SCHEMA.names:
                if name == "pixels":
                    out[name].append(pixels_to_bytes(arr))
                else:
                    out[name].append(row[name])
        return pa.Table.from_pydict(out, schema=TILE_SCHEMA)

    return tiles_ds.groupby("image_id").map_groups(
        sieve_group, batch_format="pyarrow", **map_kwargs
    )


PROXIMITY_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("band", pa.int32()),
        ("win_row_off", pa.int32()),
        ("win_col_off", pa.int32()),
        ("h", pa.int32()),
        ("w", pa.int32()),
        ("d2", pa.list_(pa.int64())),
        ("distance", pa.list_(pa.float64())),
        ("valid", pa.list_(pa.bool_())),
    ]
)

_D2_NONE = np.int64(1) << 60  # "no target anywhere" sentinel (pre-sqrt)


def proximity_d2(fg: np.ndarray) -> np.ndarray:
    """Exact squared euclidean distance from every pixel to the nearest
    True pixel of ``fg`` (0 on targets; ``_D2_NONE`` if fg is empty).

    Exact row decomposition (no tie-break dependence — distance is a
    pure min): d2(r,c) = min over rows r0 of (r-r0)^2 + dx2(r0,c), with
    dx2 the 1-D in-row squared distance (vectorized two-scan
    nearest-site index).  The r0 fold is an O(h) loop of (h, w)
    vectorized mins — no per-pixel Python."""
    h, w = fg.shape
    if not fg.any():
        return np.full((h, w), _D2_NONE, np.int64)
    idx = np.arange(w, dtype=np.int64)
    far = np.int64(1) << 40
    last = np.maximum.accumulate(np.where(fg, idx, -far), axis=1)
    nxt = np.minimum.accumulate(
        np.where(fg, idx, far)[:, ::-1], axis=1
    )[:, ::-1]
    dx = np.minimum(idx[None, :] - last, nxt - idx[None, :])
    dx2 = np.minimum(dx * dx, _D2_NONE)
    rows_with = np.nonzero(fg.any(axis=1))[0]
    rr = np.arange(h, dtype=np.int64)[:, None]
    d2 = np.full((h, w), _D2_NONE, np.int64)
    for r0 in rows_with:
        np.minimum(d2, (rr - r0) ** 2 + dx2[r0][None, :], out=d2)
    return d2


def proximity_stage(tiles_ds, threshold: float, units: str = "pixel",
                    **map_kwargs):
    """GDAL ``gdal_proximity`` semantics: per-pixel euclidean distance to
    the nearest TARGET pixel (valid and ``>= threshold``), image-global —
    a tile's nearest target may sit in another tile, so this is the same
    ONE ``groupby(image_id)`` co-shuffle as region_label_stage.

    Output: one row per (tile, band) with core-sized ``d2`` (exact
    integer squared distance, the gate quantity), ``distance``
    (``sqrt(d2)``, pixel units; ``units='geo'`` scales by |xres|) and
    ``valid`` payloads.  Invalid source pixels get no distance
    (valid=False, d2=0); images with no target anywhere emit NaN
    distance and the _D2_NONE sentinel.
    """
    from ..kernels.affine import resolution
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    if units not in ("pixel", "geo"):
        raise ValueError("units must be 'pixel' or 'geo'")

    def prox_group(group: pa.Table) -> pa.Table:
        meta = group.drop_columns(["pixels"]).to_pylist()
        views = list(pixel_views(group))
        if not meta:
            return PROXIMITY_SCHEMA.empty_table()
        H = max(r["win_row_off"] + r["h"] for r in meta)
        W = max(r["win_col_off"] + r["w"] for r in meta)
        bands = views[0].shape[0]
        vms = [valid_mask(px, _row_nodata(row))
               for row, px in zip(meta, views)]
        scale = (abs(resolution(tuple(meta[0]["transform"]))[0])
                 if units == "geo" else 1.0)
        d2_full = np.empty((bands, H, W), np.int64)
        for b in range(bands):
            fg = np.zeros((H, W), bool)
            for (row, px), vm in zip(zip(meta, views), vms):
                ro, co = row["win_row_off"], row["win_col_off"]
                fg[ro:ro + row["h"], co:co + row["w"]] = (
                    vm[b] & (px[b] >= threshold)
                )
            d2_full[b] = proximity_d2(fg)
        out: dict[str, list] = {n: [] for n in PROXIMITY_SCHEMA.names}
        for (row, px), vm in zip(zip(meta, views), vms):
            ro, co = row["win_row_off"], row["win_col_off"]
            for b in range(bands):
                d2 = d2_full[b, ro:ro + row["h"], co:co + row["w"]].copy()
                v = vm[b]
                d2[~v] = 0
                with np.errstate(invalid="ignore"):
                    dist = np.where(
                        v & (d2 < _D2_NONE),
                        np.sqrt(d2.astype(np.float64)) * scale,
                        np.nan,
                    )
                out["image_id"].append(row["image_id"])
                out["band"].append(b)
                out["win_row_off"].append(ro)
                out["win_col_off"].append(co)
                out["h"].append(row["h"])
                out["w"].append(row["w"])
                out["d2"].append(d2.ravel())
                out["distance"].append(dist.ravel())
                out["valid"].append(v.ravel())
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in PROXIMITY_SCHEMA],
            schema=PROXIMITY_SCHEMA,
        )

    return tiles_ds.groupby("image_id").map_groups(
        prox_group, batch_format="pyarrow", **map_kwargs
    )


def band_value_counts(tiles_ds, **map_kwargs):
    """Exact per-band valid-pixel value counts of a tile Dataset —
    (band, value, n) rows.  Same shape as histogram_stage (per-batch
    bincount partials -> ONE groupby Sum); exchange volume is bounded by
    bands x distinct values (<= dtype cardinality), never pixels."""
    from ray.data.aggregate import Sum

    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    def partial(batch: pa.Table) -> pa.Table:
        meta = batch.drop_columns(["pixels"]).to_pylist()
        bs, vs, ns = [], [], []
        for row, px in zip(meta, pixel_views(batch)):
            vm = valid_mask(px, _row_nodata(row))
            for b in range(px.shape[0]):
                vals, counts = np.unique(
                    px[b][vm[b]].astype(np.int64), return_counts=True
                )
                bs.append(np.full(len(vals), b, np.int64))
                vs.append(vals)
                ns.append(counts)
        if not bs:
            return pa.table(
                {"band": pa.array([], pa.int64()),
                 "value": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "band": pa.array(np.concatenate(bs)),
                "value": pa.array(np.concatenate(vs)),
                "n": pa.array(np.concatenate(ns)),
            }
        )

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return (
        tiles_ds.map_batches(partial, **kwargs)
        .groupby(["band", "value"])
        .aggregate(Sum("n", alias_name="n"))
    )


def match_histograms_stage(tiles_ds, ref_counts, fill: int = -1,
                           **map_kwargs):
    """Histogram matching — remap every image's pixel distribution onto a
    reference distribution (skimage ``match_histograms`` / the classic
    seamless-mosaic color-balancing step), in the INTEGER closest-rank
    variant so the rule is bit-reproducible and SQL-mirrorable:

        match(v) = min { u in ref values :
                         cdf_ref(u) * n_src >= cdf_src(v) * n_ref }

    (pure integer cross-multiplication — no float quantiles; the
    smallest reference value whose quantile reaches v's quantile).

    ``ref_counts`` is a (band, value, n) table — a ``band_value_counts``
    Dataset, a pyarrow Table, or a list of dicts.  A Dataset is
    materialized driver-side: it is bounded by bands x dtype cardinality
    (a LEGITIMATE small side — broadcast once per task via closure;
    ``ray.put`` documented for wide-dtype references).  Sources with a
    band absent from the reference raise.

    100-TB shape: matching needs image-global order statistics, so this
    is the same ONE groupby(image_id) co-shuffle as equalize_stage; the
    LUT is built once per (image, band) (np.unique + cumsum +
    searchsorted over the cross-multiplied cumulative counts) and
    applied with one searchsorted per tile.  Output tiles carry int32
    pixels from the reference value domain, nodata = ``fill``.
    """
    from ..kernels.nodata import valid_mask
    from .schema import TILE_SCHEMA, pixel_views, pixels_to_bytes

    if hasattr(ref_counts, "to_pandas"):  # ray Dataset / pyarrow Table
        ref_rows = (
            ref_counts.take_all()
            if hasattr(ref_counts, "take_all")
            else ref_counts.to_pylist()
        )
    else:
        ref_rows = list(ref_counts)
    ref: dict[int, tuple[np.ndarray, np.ndarray, int]] = {}
    byband: dict[int, list] = {}
    for r in ref_rows:
        byband.setdefault(int(r["band"]), []).append(
            (int(r["value"]), int(r["n"]))
        )
    for b, pairs in byband.items():
        pairs.sort()
        u = np.array([p[0] for p in pairs], np.int64)
        d = np.cumsum(np.array([p[1] for p in pairs], np.int64))
        ref[b] = (u, d, int(d[-1]))
    if not ref:
        raise ValueError("empty reference distribution")

    def match_group(group: pa.Table) -> pa.Table:
        meta = group.drop_columns(["pixels"]).to_pylist()
        views = list(pixel_views(group))
        n_bands = views[0].shape[0] if views else 0
        vms = [valid_mask(px, _row_nodata(row))
               for row, px in zip(meta, views)]
        luts: list[tuple[np.ndarray, np.ndarray]] = []
        for b in range(n_bands):
            if b not in ref:
                raise ValueError(
                    f"source band {b} missing from the reference "
                    f"distribution (ref bands: {sorted(ref)})"
                )
            allv = np.concatenate(
                [px[b][vm[b]].ravel() for px, vm in zip(views, vms)]
            ) if views else np.empty(0, np.int64)
            if allv.size == 0:
                luts.append((np.empty(0, np.int64),
                             np.empty(0, np.int64)))
                continue
            vals, counts = np.unique(allv.astype(np.int64),
                                     return_counts=True)
            csrc = np.cumsum(counts)
            ns = int(csrc[-1])
            u, d, nr = ref[b]
            if ns * nr < 2**63:
                j = np.searchsorted(d * ns, csrc * nr, side="left")
            else:
                # cross-multiplied ranks overflow int64 once
                # n_src*n_ref >= 2^63 (~3e9 valid px/side, reachable at
                # corpus scale): fall back to exact Python-int compare
                j = np.searchsorted(d.astype(object) * ns,
                                    csrc.astype(object) * nr,
                                    side="left")
            luts.append((vals, u[j]))
        out: dict[str, list] = {name: [] for name in TILE_SCHEMA.names}
        for row, px, vm in zip(meta, views, vms):
            burned = np.full(px.shape, np.int32(fill), np.int32)
            for b in range(px.shape[0]):
                vals, mapped = luts[b]
                if vals.size == 0:
                    continue
                m = vm[b]
                burned[b][m] = mapped[
                    np.searchsorted(vals, px[b][m].astype(np.int64))
                ].astype(np.int32)
            for name in TILE_SCHEMA.names:
                if name == "pixels":
                    out[name].append(pixels_to_bytes(burned))
                elif name == "dtype":
                    out[name].append("int32")
                elif name == "nodata":
                    out[name].append(float(fill))
                else:
                    out[name].append(row[name])
        return pa.Table.from_pydict(out, schema=TILE_SCHEMA)

    return tiles_ds.groupby("image_id").map_groups(
        match_group, batch_format="pyarrow", **map_kwargs
    )


def percentile_stretch_stage(tiles_ds, lo_permille: int = 20,
                             hi_permille: int = 980, levels: int = 255,
                             fill: int = -1, **map_kwargs):
    """Per-image percentile contrast stretch — the classic 2-98%
    remote-sensing normalization (QGIS "cumulative count cut" / GDAL
    ``gdal_translate -scale`` with percentile bounds), integerized so the
    rule is bit-reproducible and SQL-mirrorable:

        lo = value at 1-indexed rank max(1, ceil(lo_permille/1000 * n))
        hi = value at rank max(1, ceil(hi_permille/1000 * n))
        out(v) = clip((v - lo) * levels // max(hi - lo, 1), 0, levels)

    (percentile_disc rank semantics, the same rule as
    ``sample.quantiles_disc``; constant bands map to 0; nodata -> fill.)

    100-TB shape: image-global order statistics via the equalize_stage
    co-shuffle (ONE groupby(image_id)); per-band bounds from one
    np.unique + cumsum + searchsorted, applied vectorized per tile.
    """
    from ..kernels.nodata import valid_mask
    from .schema import TILE_SCHEMA, pixel_views, pixels_to_bytes

    if not 0 <= lo_permille < hi_permille <= 1000:
        raise ValueError("need 0 <= lo_permille < hi_permille <= 1000")

    def stretch_group(group: pa.Table) -> pa.Table:
        meta = group.drop_columns(["pixels"]).to_pylist()
        views = list(pixel_views(group))
        n_bands = views[0].shape[0] if views else 0
        vms = [valid_mask(px, _row_nodata(row))
               for row, px in zip(meta, views)]
        bounds: list[tuple[int, int]] = []
        for b in range(n_bands):
            allv = np.concatenate(
                [px[b][vm[b]].ravel() for px, vm in zip(views, vms)]
            ) if views else np.empty(0, np.int64)
            if allv.size == 0:
                bounds.append((0, 0))
                continue
            vals, counts = np.unique(allv.astype(np.int64),
                                     return_counts=True)
            cle = np.cumsum(counts)
            n = int(cle[-1])
            ranks = []
            for pm in (lo_permille, hi_permille):
                target = max(1, -(-pm * n // 1000))  # ceil
                ranks.append(int(vals[np.searchsorted(cle, target)]))
            bounds.append((ranks[0], ranks[1]))
        out: dict[str, list] = {name: [] for name in TILE_SCHEMA.names}
        for row, px, vm in zip(meta, views, vms):
            burned = np.full(px.shape, np.int32(fill), np.int32)
            for b in range(px.shape[0]):
                lo, hi = bounds[b]
                m = vm[b]
                v = px[b][m].astype(np.int64)
                burned[b][m] = np.clip(
                    (v - lo) * levels // max(hi - lo, 1), 0, levels
                ).astype(np.int32)
            for name in TILE_SCHEMA.names:
                if name == "pixels":
                    out[name].append(pixels_to_bytes(burned))
                elif name == "dtype":
                    out[name].append("int32")
                elif name == "nodata":
                    out[name].append(float(fill))
                else:
                    out[name].append(row[name])
        return pa.Table.from_pydict(out, schema=TILE_SCHEMA)

    return tiles_ds.groupby("image_id").map_groups(
        stretch_group, batch_format="pyarrow", **map_kwargs
    )


def pansharpen_stage(tiles_ds, pan_band: int = 0, scale: int = 1000,
                     fill: int = -1, **map_kwargs):
    """Brovey pansharpening (the ``gdal_pansharpen`` weighted-Brovey
    algorithm) in an INTEGER-EXACT variant: one band plays the
    panchromatic channel, the remaining multispectral bands are scaled
    by the pan/intensity ratio,

        out_i = trunc((ms_i * pan * scale * n_ms) / max(sum_ms, 1))

    (intensity = mean of the ms bands, folded in by cross-multiplication
    so everything stays integer; ``scale`` keeps ratio precision;
    division TRUNCATES toward zero — C / DuckDB ``//`` semantics, which
    matters on negative radiance values).  A
    pixel invalid in ANY band maps to ``fill`` in every output band —
    the ratio is undefined there (gdal_pansharpen's nodata contract).

    Zero shuffle: bands of a tile live in one row (band-major pixels),
    so this is a pure map_batches; single-band inputs raise.
    """
    from ..kernels.nodata import valid_mask
    from .schema import TILE_SCHEMA, pixel_views, pixels_to_bytes

    def run(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {name: [] for name in TILE_SCHEMA.names}
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, px in zip(meta, pixel_views(batch)):
            nb = px.shape[0]
            if nb < 2:
                raise ValueError(
                    "pansharpen needs >= 2 bands (pan + multispectral); "
                    f"{row['image_id']} has {nb}"
                )
            if not 0 <= pan_band < nb:
                raise ValueError(f"pan_band {pan_band} out of range")
            vm = valid_mask(px, _row_nodata(row))
            allv = vm.all(axis=0)
            ms_idx = [b for b in range(nb) if b != pan_band]
            z = px.astype(np.int64)
            pan = z[pan_band]
            sum_ms = np.zeros(pan.shape, np.int64)
            for b in ms_idx:
                sum_ms += z[b]
            burned = np.full((len(ms_idx),) + pan.shape, np.int64(fill),
                             np.int64)
            den = np.maximum(sum_ms, 1)
            for j, b in enumerate(ms_idx):
                num = z[b] * pan * scale * len(ms_idx)
                # trunc-toward-zero (C / DuckDB //), not numpy floor
                val = np.sign(num) * (np.abs(num) // den)
                burned[j] = np.where(allv, val, fill)
            arr = burned.astype(np.int64)
            for name in TILE_SCHEMA.names:
                if name == "pixels":
                    out[name].append(pixels_to_bytes(arr))
                elif name == "dtype":
                    out[name].append("int64")
                elif name == "nodata":
                    out[name].append(float(fill))
                elif name == "band_count":
                    out[name].append(len(ms_idx))
                else:
                    out[name].append(row[name])
        return pa.Table.from_pydict(out, schema=TILE_SCHEMA)

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return tiles_ds.map_batches(run, **kwargs)


def to_xyz_stage(tiles_ds, skip_nodata: bool = True, **map_kwargs):
    """Raster → point-table export (``gdal2xyz`` / the xarray
    ``to_dataframe`` recipe): one row per (valid) pixel with its
    CENTER coordinates — the raster→vector bridge for joins against
    point tooling.

    Zero shuffle, pure flat-map shape; output volume = pixels x row
    width, so at 100 TB this is a format conversion you stream straight
    into a partitioned write (never collect).  Coordinates are the
    affine closed form ``x = c3 + (col + 0.5) * a`` / ``y = c5 +
    (row + 0.5) * e`` — bit-reproducible, so the gate compares float
    columns exactly."""
    from ..kernels.nodata import valid_mask
    from .schema import pixel_views

    def run(batch: pa.Table) -> pa.Table:
        ids, bs, xs, ys, vs = [], [], [], [], []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, px in zip(meta, pixel_views(batch)):
            t = row["transform"]
            h, w = row["h"], row["w"]
            vm = (valid_mask(px, _row_nodata(row)) if skip_nodata
                  else np.ones(px.shape, bool))
            cols = np.arange(w, dtype=np.float64)
            rows_ = np.arange(h, dtype=np.float64)
            gx = t[2] + (cols + 0.5) * t[0]
            gy = t[5] + (rows_ + 0.5) * t[4]
            for b in range(px.shape[0]):
                m = vm[b]
                n = int(m.sum())
                if n == 0:
                    continue
                rr, cc = np.nonzero(m)
                ids.append(np.repeat(row["image_id"], n))
                bs.append(np.full(n, b, np.int32))
                xs.append(gx[cc])
                ys.append(gy[rr])
                vs.append(px[b][m].astype(np.float64))
        if not ids:
            return pa.table(
                {"image_id": pa.array([], pa.string()),
                 "band": pa.array([], pa.int32()),
                 "x": pa.array([], pa.float64()),
                 "y": pa.array([], pa.float64()),
                 "value": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "image_id": pa.array(np.concatenate(ids)),
                "band": pa.array(np.concatenate(bs), pa.int32()),
                "x": pa.array(np.concatenate(xs), pa.float64()),
                "y": pa.array(np.concatenate(ys), pa.float64()),
                "value": pa.array(np.concatenate(vs), pa.float64()),
            }
        )

    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    kwargs.update(map_kwargs)
    return tiles_ds.map_batches(run, **kwargs)
