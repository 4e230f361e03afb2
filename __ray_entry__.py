"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (decode -> tile -> cell assign -> PIP
spatial join -> reproject) on the sf0.001-sized corpus.  ``queries()`` maps
every implemented operator from SURVEY.md §2 (+ the training-data ops) to a
callable; ``oracle_sql()`` gives DuckDB equivalents where the op is
SQL-expressible (geo metadata ops mirror the corpus generation spec in
rioxarray_ray/sources/corpus.py closed-form; pixel-level ops are rows-only
and are covered by pytest oracles instead).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------

_TILE = 64  # tile size used by the SQL-checked tile queries
_CELL_RES = 10
_BOX = (-59.74871, 36.12337, -57.19979, 39.48719)  # generic mid-pixel box
_N_GEOMS = 200
_ANN_K = 10
_NEAR_DUP_TAU = 0.40

_tiled_cache: dict = {}


def _rd():
    import ray.data as rd

    return rd


def _read_pq(path, **kw):
    """read_parquet with schema-level metadata stripped (pandas-written
    parquet carries an unhashable-schema metadata dict that defeats Ray's
    block-schema dedup -- see rioxarray_ray/sources/io.py)."""
    from rioxarray_ray.sources.io import read_parquet_clean

    return read_parquet_clean(path, **kw)


def _ndocs(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def _tiles(sf_dir: str):
    """Decoded + tiled corpus for this sf dir (cached per driver session)."""
    n = _ndocs(sf_dir)
    key = (n, _TILE)
    if key not in _tiled_cache:
        from rioxarray_ray.pipelines import flagship as fpipe
        from rioxarray_ray.stages import decode as dstage
        from rioxarray_ray.stages import tile as tstage

        ds = fpipe.read_corpus(n, override_num_blocks=max(n // 64, 8))
        tiles = tstage.tile_stage(
            dstage.decode_stage(ds), tile_size=_TILE, cell_res=_CELL_RES
        )
        _tiled_cache[key] = tiles.materialize()
    return _tiled_cache[key]


def _tiles_4326(sf_dir: str):
    def keep(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx % 7 != 6))

    return _tiles(sf_dir).map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


def _geoms(kind: str | None = None):
    from rioxarray_ray.sources import corpus

    rows = corpus.geometry_table(_N_GEOMS)
    if kind is None:
        return rows
    return [g for g in rows if g["kind"] == kind]


# --------------------------------------------------------------------------
# geo queries (SQL-checked)
# --------------------------------------------------------------------------


def q_geo_footprint(sf_dir: str):
    from rioxarray_ray.kernels import affine as aff
    from rioxarray_ray.sources import corpus

    n = _ndocs(sf_dir)
    m = corpus.image_meta(np.arange(n))
    keep = ~m["projected"]
    tbl = pa.table(
        {
            "image_id": pa.array(m["image_id"][keep]),
            "w": pa.array(m["w"][keep], pa.int32()),
            "h": pa.array(m["h"][keep], pa.int32()),
            "fmt": pa.array(m["fmt"][keep]),
            "band_count": pa.array(m["band_count"][keep], pa.int32()),
            "lon_left": pa.array(m["lon_left"][keep]),
            "lat_top": pa.array(m["lat_top"][keep]),
        }
    )

    def fp(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = []
        for r in rows:
            t = (corpus.RES, 0.0, r["lon_left"], 0.0, -corpus.RES, r["lat_top"])
            left, bottom, right, top = aff.bounds(t, r["w"], r["h"])
            out.append(
                {
                    "image_id": r["image_id"],
                    "w": r["w"],
                    "h": r["h"],
                    "fmt": r["fmt"],
                    "band_count": r["band_count"],
                    "left_x": left,
                    "bottom_y": bottom,
                    "right_x": right,
                    "top_y": top,
                }
            )
        return pa.Table.from_pylist(out)

    return _rd().from_arrow(tbl).map_batches(fp, batch_format="pyarrow")


def q_geo_tile_cells(sf_dir: str):
    tiles = _tiles_4326(sf_dir)
    return tiles.select_columns(
        ["image_id", "tile_row", "tile_col", "h", "w",
         "win_row_off", "win_col_off", "cell"]
    ).rename_columns(
        {"h": "th", "w": "tw"}
    )


def q_geo_clip_box(sf_dir: str):
    from rioxarray_ray.stages import clip as cstage

    tiles = _tiles_4326(sf_dir)
    clipped = cstage.clip_box_stage(
        tiles, _BOX, box_crs="EPSG:4326", cell_res=_CELL_RES
    )

    def project(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = []
        for r in rows:
            t = r["transform"]
            out.append(
                {
                    "image_id": r["image_id"],
                    "tile_row": r["tile_row"],
                    "tile_col": r["tile_col"],
                    "cw": r["w"],
                    "ch": r["h"],
                    "new_left": t[2],
                    "new_top": t[5],
                }
            )
        return pa.Table.from_pylist(out)

    return clipped.map_batches(project, batch_format="pyarrow")


def q_geo_pip_rect(sf_dir: str):
    from rioxarray_ray.stages import join as jstage

    tiles = _tiles_4326(sf_dir)
    joined = jstage.pip_join_broadcast(
        tiles, _geoms("rect"), cell_res=_CELL_RES, concurrency=4
    )
    return joined.select_columns(
        ["image_id", "tile_row", "tile_col", "geom_id", "n_pixels"]
    )


def q_geo_pip_shuffle(sf_dir: str):
    """Same join as geo_pip_rect via the SALTED SHUFFLE plan — must match
    the same SQL oracle row-for-row (plan equivalence at the gate)."""
    from rioxarray_ray.stages import join as jstage

    tiles = _tiles_4326(sf_dir)
    joined = jstage.pip_join_shuffle(
        tiles, _geoms("rect"), cell_res=_CELL_RES, salt=4
    )
    return joined.select_columns(
        ["image_id", "tile_row", "tile_col", "geom_id", "n_pixels"]
    )


def q_geo_zonal_stats(sf_dir: str):
    """Per-geometry zonal statistics (count/sum/min/max of valid pixels
    inside each rect geometry), oracle-gated EXACTLY: DuckDB regenerates
    the frozen pixel spec (the geo_pixel_checksum chain, all 4 codecs) and
    aggregates pixel values over the rect's global-pixel index range —
    the same equivalence the geo_pip_rect oracle established for counts,
    extended to values.  Engine side is stages/join.zonal_stats: PIP
    partials -> ONE groupby(geom_id) reduce; pixels never shuffle.
    Restricted to doc_id < 64 to keep the DuckDB pixel regeneration
    tractable at gate scale."""
    from rioxarray_ray.stages import join as jstage

    tiles = _tiles_4326(sf_dir)

    def keep64(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx < 64))

    small = tiles.map_batches(keep64, batch_format="pyarrow",
                              zero_copy_batch=True)
    stats = jstage.zonal_stats(
        small, _geoms("rect"), cell_res=_CELL_RES, concurrency=4
    )

    def finalize(batch: pa.Table) -> pa.Table:
        import numpy as np

        mn = batch["min_inside"].to_numpy(zero_copy_only=False)
        mx = batch["max_inside"].to_numpy(zero_copy_only=False)
        nulls = np.isnan(mn.astype(np.float64))
        return pa.Table.from_pydict(
            {
                "geom_id": batch["geom_id"],
                "n_pixels": pc.cast(batch["n_pixels"], pa.int64()),
                "n_inside": pc.cast(batch["n_inside"], pa.int64()),
                "sum_inside": pa.array(
                    np.rint(
                        batch["sum_inside"].to_numpy(zero_copy_only=False)
                    ).astype(np.int64)
                ),
                # -999999 sentinel for the no-valid-pixel case on BOTH
                # sides (hash canonicalization treats NaN/null unreliably)
                "min_inside": pa.array(
                    np.where(nulls, -999999, mn).astype(np.int64)
                ),
                "max_inside": pa.array(
                    np.where(nulls, -999999, mx).astype(np.int64)
                ),
            }
        )

    return stats.map_batches(finalize, batch_format="pyarrow",
                             zero_copy_batch=True)


def q_geo_focal_mean(sf_dir: str):
    """Focal (3x3 moving-window) statistics via halo'd tiles
    (stages/focal.focal_mean_stage — xarray's rolling(...).mean() recipe,
    zero-shuffle), oracle-gated EXACTLY: DuckDB recomputes every valid
    pixel's windowed sum/count with a 3x3 offset self-join over the
    regenerated pixel spec and folds per-(image, band) integer checksums,
    including a position-weighted sum so halo/crop misalignment breaks
    the hash.  Restricted to doc_id < 16 (the oracle shifts every pixel
    9x; a shift->groupby, not a self-join probe — the probe form made
    DuckDB materialize a 44 GB intermediate)."""
    from rioxarray_ray.pipelines import flagship as fpipe
    from rioxarray_ray.stages import decode as dstage
    from rioxarray_ray.stages import focal as fstage
    from rioxarray_ray.stages import tile as tstage

    n = min(_ndocs(sf_dir), 16)
    ds = fpipe.read_corpus(n, override_num_blocks=8)

    def keep(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx % 7 != 6))

    small = ds.map_batches(keep, batch_format="pyarrow",
                           zero_copy_batch=True)
    tiles = tstage.tile_stage(
        dstage.decode_stage(small), tile_size=_TILE, cell_res=_CELL_RES,
        halo=1,
    )
    rows = fstage.focal_mean_stage(tiles, radius=1)

    def summarize(batch: pa.Table) -> pa.Table:
        import numpy as np

        fs = batch["focal_sum"].combine_chunks()
        fc = batch["focal_cnt"].combine_chunks()
        mn = batch["mean"].combine_chunks()
        ro = batch["win_row_off"].to_numpy(zero_copy_only=False)
        co = batch["win_col_off"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        ws = batch["w"].to_numpy(zero_copy_only=False)
        out = {"image_id": [], "band": [], "n_valid": [], "sum_fsum": [],
               "sum_fcnt": [], "wsum_fsum": []}
        ids = batch["image_id"].to_pylist()
        bands = batch["band"].to_numpy(zero_copy_only=False)
        for i in range(batch.num_rows):
            h, w = int(hs[i]), int(ws[i])
            s = np.asarray(fs[i].values, dtype=np.float64).reshape(h, w)
            c = np.asarray(fc[i].values, dtype=np.int64).reshape(h, w)
            valid = ~np.isnan(
                np.asarray(mn[i].values, dtype=np.float64).reshape(h, w)
            )
            gr = np.arange(h, dtype=np.int64)[:, None] + int(ro[i])
            gc = np.arange(w, dtype=np.int64)[None, :] + int(co[i])
            wgt = (gr * 1315423911 + gc * 2654435761) % 1000003
            si = np.rint(s).astype(np.int64)
            out["image_id"].append(ids[i])
            out["band"].append(int(bands[i]))
            out["n_valid"].append(int(valid.sum()))
            out["sum_fsum"].append(int(si[valid].sum()))
            out["sum_fcnt"].append(int(c[valid].sum()))
            out["wsum_fsum"].append(int((si[valid] * wgt[valid]).sum()))
        return pa.Table.from_pydict(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "band": pa.array(out["band"], pa.int32()),
                "n_valid": pa.array(out["n_valid"], pa.int64()),
                "sum_fsum": pa.array(out["sum_fsum"], pa.int64()),
                "sum_fcnt": pa.array(out["sum_fcnt"], pa.int64()),
                "wsum_fsum": pa.array(out["wsum_fsum"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    partial = rows.map_batches(summarize, batch_format="pyarrow",
                               zero_copy_batch=True)
    return partial.groupby(["image_id", "band"]).aggregate(
        Sum("n_valid", alias_name="n_valid"),
        Sum("sum_fsum", alias_name="sum_fsum"),
        Sum("sum_fcnt", alias_name="sum_fcnt"),
        Sum("wsum_fsum", alias_name="wsum_fsum"),
    )


def q_geo_terrain(sf_dir: str):
    """Slope/aspect/hillshade (stages/focal.terrain_stage, Horn's method
    over halo'd tiles), oracle-gated on the EXACT INTEGER Horn gradient
    numerators: DuckDB re-derives gx/gy per interior all-valid pixel via
    the same shift->groupby the focal oracle uses (weights folded in at
    shift time) and folds per-(image, band) integer checksums including a
    position-weighted sum.  The trig outputs (slope/aspect/hillshade) are
    pure per-pixel functions of these gated numerators — pytest pins them
    against closed-form plane rasters."""
    from rioxarray_ray.pipelines import flagship as fpipe
    from rioxarray_ray.stages import decode as dstage
    from rioxarray_ray.stages import focal as fstage
    from rioxarray_ray.stages import tile as tstage

    n = min(_ndocs(sf_dir), 16)
    ds = fpipe.read_corpus(n, override_num_blocks=8)

    def keep(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx % 7 != 6))

    small = ds.map_batches(keep, batch_format="pyarrow",
                           zero_copy_batch=True)
    tiles = tstage.tile_stage(
        dstage.decode_stage(small), tile_size=_TILE, cell_res=_CELL_RES,
        halo=1,
    )
    rows = fstage.terrain_stage(tiles)

    def summarize(batch: pa.Table) -> pa.Table:
        import numpy as np

        gxs = batch["gx_num"].combine_chunks()
        gys = batch["gy_num"].combine_chunks()
        ro = batch["win_row_off"].to_numpy(zero_copy_only=False)
        co = batch["win_col_off"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        ws = batch["w"].to_numpy(zero_copy_only=False)
        ids = batch["image_id"].to_pylist()
        bands = batch["band"].to_numpy(zero_copy_only=False)
        out = {"image_id": [], "band": [], "n_interior": [],
               "sum_gx": [], "sum_gy": [], "wsum_gx": []}
        for i in range(batch.num_rows):
            h, w = int(hs[i]), int(ws[i])
            gx = np.asarray(gxs[i].values, dtype=np.float64).reshape(h, w)
            gy = np.asarray(gys[i].values, dtype=np.float64).reshape(h, w)
            ok = ~np.isnan(gx)
            gr = np.arange(h, dtype=np.int64)[:, None] + int(ro[i])
            gc = np.arange(w, dtype=np.int64)[None, :] + int(co[i])
            wgt = (gr * 1315423911 + gc * 2654435761) % 1000003
            gxi = np.rint(np.where(ok, gx, 0.0)).astype(np.int64)
            gyi = np.rint(np.where(ok, gy, 0.0)).astype(np.int64)
            out["image_id"].append(ids[i])
            out["band"].append(int(bands[i]))
            out["n_interior"].append(int(ok.sum()))
            out["sum_gx"].append(int(gxi[ok].sum()))
            out["sum_gy"].append(int(gyi[ok].sum()))
            out["wsum_gx"].append(int((gxi[ok] * wgt[ok]).sum()))
        return pa.Table.from_pydict(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "band": pa.array(out["band"], pa.int32()),
                "n_interior": pa.array(out["n_interior"], pa.int64()),
                "sum_gx": pa.array(out["sum_gx"], pa.int64()),
                "sum_gy": pa.array(out["sum_gy"], pa.int64()),
                "wsum_gx": pa.array(out["wsum_gx"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    partial = rows.map_batches(summarize, batch_format="pyarrow",
                               zero_copy_batch=True)
    return partial.groupby(["image_id", "band"]).aggregate(
        Sum("n_interior", alias_name="n_interior"),
        Sum("sum_gx", alias_name="sum_gx"),
        Sum("sum_gy", alias_name="sum_gy"),
        Sum("wsum_gx", alias_name="wsum_gx"),
    )


def q_geo_composite_median(sf_dir: str):
    """Per-pixel median composite across overlapping scenes
    (stages/merge.composite_median — the xarray concat+median(dim="time")
    recipe), oracle-gated EXACTLY: DuckDB recomputes the per-global-pixel
    median over the regenerated pixel spec and folds the same per-
    composite-tile checksum (2x the median sum is integral, so the BIGINT
    cast is exact on both sides).  Restricted to doc_id < 64 (the oracle
    scans every pixel, like geo_zonal_stats)."""
    from rioxarray_ray.stages import merge as mstage

    tiles = _tiles_4326(sf_dir)

    def keep64(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx < 64))

    small = tiles.map_batches(keep64, batch_format="pyarrow",
                              zero_copy_batch=True)
    comp = mstage.composite_median(
        small, origin=(-60.0, 40.0), res=5e-3, comp_px=64
    )

    def summarize(batch: pa.Table) -> pa.Table:
        import numpy as np

        flat = batch["pixels"].combine_chunks()
        n_pixels, sum2 = [], []
        for i in range(batch.num_rows):
            px = np.asarray(flat[i].values, dtype=np.float64)
            ok = ~np.isnan(px)
            n_pixels.append(int(ok.sum()))
            sum2.append(int(np.rint((2.0 * px[ok]).sum())))
        return pa.Table.from_pydict(
            {
                "ctx": batch["ctx"],
                "cty": batch["cty"],
                "band": batch["band"],
                "n_pixels": pa.array(n_pixels, pa.int64()),
                "sum2_median": pa.array(sum2, pa.int64()),
                "n_values": batch["n_values"],
            }
        )

    return comp.map_batches(summarize, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_geo_change_crosstab(sf_dir: str):
    """Cross-scene change-detection contingency table
    (stages/merge.change_crosstab — align scenes on the shared grid,
    crosstab co-located pixel classes per scene pair), oracle-gated
    EXACTLY: DuckDB self-joins the regenerated pixel spec on global pixel
    identity and groups by the same floor(px/256) classes (floor, not
    DuckDB's truncating // — they differ on negatives).  doc_id < 64."""
    from rioxarray_ray.stages import merge as mstage

    tiles = _tiles_4326(sf_dir)

    def keep64(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx < 64))

    small = tiles.map_batches(keep64, batch_format="pyarrow",
                              zero_copy_batch=True)
    return mstage.change_crosstab(
        small, origin=(-60.0, 40.0), res=5e-3, comp_px=64, bucket=256.0
    )


def q_geo_temporal_trend(sf_dir: str):
    """Per-pixel temporal least-squares slope across overlapping scenes
    (stages/merge.temporal_trend — the xarray polyfit(dim='time', deg=1)
    recipe over reproject_match-aligned scenes), gated EXACTLY on the
    integer OLS numerator/denominator: DuckDB groups the regenerated
    pixel spec by global pixel identity, rebuilds n/st/st2/sy/sty per
    pixel, and the position-weighted checksums must match bit-for-bit.
    doc_id < 64 bounds the regeneration (all scenes in one grid row
    band, so overlaps are purely horizontal)."""
    from rioxarray_ray.stages import merge as mstage

    tiles = _tiles_4326(sf_dir)
    small = _keep_idx(tiles, lambda idx: idx < 64)
    trend = mstage.temporal_trend(
        small, origin=(-60.0, 40.0), res=5e-3, comp_px=64
    )

    def finalize(batch: pa.Table) -> pa.Table:
        out = {
            "ctx": [], "cty": [], "band": [],
            "n_ok": [], "num_wsum": [], "den_wsum": [],
        }
        for row in batch.to_pylist():
            num = np.asarray(row["num"], dtype=np.int64)
            den = np.asarray(row["den"], dtype=np.int64)
            ok = den != 0
            if not ok.any():
                continue
            p = np.arange(num.size, dtype=np.int64)
            wt = 1 + (p % 97)
            out["ctx"].append(int(row["ctx"]))
            out["cty"].append(int(row["cty"]))
            out["band"].append(int(row["band"]))
            out["n_ok"].append(int(ok.sum()))
            out["num_wsum"].append(int((num[ok] * wt[ok]).sum()))
            out["den_wsum"].append(int((den[ok] * wt[ok]).sum()))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    return trend.map_batches(finalize, batch_format="pyarrow")


def q_geo_contour_edges(sf_dir: str):
    """Iso-contour boundary extraction (stages/stats.contour_edges_stage,
    threshold 120): boundary edges between adjacent valid pixels whose
    >= classification differs, per tile/band, with position-weighted
    checksums over the segment coordinates — DuckDB rebuilds every edge
    by self-joining the regenerated pixel spec on pixel adjacency, so a
    misplaced segment (not just a miscount) breaks the hash."""
    from rioxarray_ray.stages import stats as sstage

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 64)
    edges = sstage.contour_edges_stage(small, threshold=120.0,
                                       concurrency=4)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "image_id": batch["image_id"],
                "tile_row": pc.cast(batch["tile_row"], pa.int64()),
                "tile_col": pc.cast(batch["tile_col"], pa.int64()),
                "band": pc.cast(batch["band"], pa.int64()),
                "n_h": batch["n_h"],
                "n_v": batch["n_v"],
                "wsum_h": batch["wsum_h"],
                "wsum_v": batch["wsum_v"],
            }
        )

    return edges.map_batches(finalize, batch_format="pyarrow")


def q_multimodal_augment(sf_dir: str):
    """Deterministic vision augmentation (functions/multimodal
    .augment_stage: hflip / vflip / rot90-clockwise), gated on
    position-weighted checksums of the TRANSFORMED arrays — DuckDB maps
    every valid source pixel to its post-permutation position, so a
    wrong axis, a wrong rotation direction, or a nodata pixel left
    behind each breaks the hash.  doc_id < 64."""
    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels.nodata import valid_mask
    from rioxarray_ray.stages.schema import pixel_views

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 64)
    aug = multimodal.augment_stage(small, concurrency=4)

    def finalize(batch: pa.Table) -> pa.Table:
        out = {
            "image_id": [], "tile_row": [], "tile_col": [], "band": [],
            "op": [], "n_valid": [], "wsum": [],
        }
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for row, pixels in zip(meta, pixel_views(batch)):
            nod = row["nodata"]
            if nod != nod:
                nod = (
                    None if np.dtype(row["dtype"]).kind in "iu"
                    else float("nan")
                )
            vm = valid_mask(pixels, nod)
            w = pixels.shape[2]
            for b in range(pixels.shape[0]):
                rr, cc = np.nonzero(vm[b])
                if not len(rr):
                    continue
                pos = rr.astype(np.int64) * w + cc
                wt = 1 + pos % 97
                vals = pixels[b][vm[b]].astype(np.int64)
                out["image_id"].append(row["image_id"])
                out["tile_row"].append(int(row["tile_row"]))
                out["tile_col"].append(int(row["tile_col"]))
                out["band"].append(b)
                out["op"].append(row["op"])
                out["n_valid"].append(int(len(rr)))
                out["wsum"].append(int((vals * wt).sum()))
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "tile_row": pa.array(out["tile_row"], pa.int64()),
                "tile_col": pa.array(out["tile_col"], pa.int64()),
                "band": pa.array(out["band"], pa.int64()),
                "op": pa.array(out["op"], pa.string()),
                "n_valid": pa.array(out["n_valid"], pa.int64()),
                "wsum": pa.array(out["wsum"], pa.int64()),
            }
        )

    return aug.map_batches(finalize, batch_format="pyarrow")


def q_multimodal_patchify(sf_dir: str):
    """ViT patch extraction (functions/multimodal.patchify_stage,
    16x16): per-patch integer moment statistics over valid pixels —
    DuckDB regroups the regenerated pixel spec into the same global
    patch blocks and rebuilds n/sum/sumsq/min/max exactly.
    doc_id < 64."""
    from rioxarray_ray.functions import multimodal

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 64)
    patches = multimodal.patchify_stage(small, patch=8, concurrency=4)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "image_id": batch["image_id"],
                "tile_row": pc.cast(batch["tile_row"], pa.int64()),
                "tile_col": pc.cast(batch["tile_col"], pa.int64()),
                "band": pc.cast(batch["band"], pa.int64()),
                "patch_row": pc.cast(batch["patch_row"], pa.int64()),
                "patch_col": pc.cast(batch["patch_col"], pa.int64()),
                "n_valid": batch["n_valid"],
                "psum": batch["psum"],
                "psumsq": batch["psumsq"],
                "pmin": batch["pmin"],
                "pmax": batch["pmax"],
            }
        )

    return patches.map_batches(finalize, batch_format="pyarrow")


def q_geo_contour_edges_global(sf_dir: str):
    """GLOBAL iso-contour extraction: tiles cut with halo=1, each tile
    owns exactly the edges whose first pixel lies in its core, so seam
    edges appear once and the union equals the whole-image edge set —
    still zero-shuffle.  The oracle drops the tile-locality condition
    and assigns each edge to its first pixel's 64-grid tile; any
    double-counted or dropped seam edge breaks rows AND hash."""
    from rioxarray_ray.pipelines import flagship as fpipe
    from rioxarray_ray.stages import decode as dstage
    from rioxarray_ray.stages import stats as sstage
    from rioxarray_ray.stages import tile as tstage

    n = _ndocs(sf_dir)
    ds = fpipe.read_corpus(n, override_num_blocks=max(n // 64, 8))
    halo_tiles = tstage.tile_stage(
        dstage.decode_stage(ds), tile_size=_TILE, cell_res=_CELL_RES,
        halo=1,
    )
    small = _keep_idx(
        halo_tiles, lambda idx: (idx < 64) & (idx % 7 != 6)
    )
    edges = sstage.contour_edges_stage(
        small, threshold=120.0, global_edges=True, concurrency=4
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "image_id": batch["image_id"],
                "tile_row": pc.cast(batch["tile_row"], pa.int64()),
                "tile_col": pc.cast(batch["tile_col"], pa.int64()),
                "band": pc.cast(batch["band"], pa.int64()),
                "n_h": batch["n_h"],
                "n_v": batch["n_v"],
                "wsum_h": batch["wsum_h"],
                "wsum_v": batch["wsum_v"],
            }
        )

    return edges.map_batches(finalize, batch_format="pyarrow")


def q_geo_point_sample(sf_dir: str):
    """Raster value extraction at vector point locations (the reference's
    ``rds.sel(x, y, method="nearest")`` recipe), oracle-gated EXACTLY:
    the corpus points sit on pixel centers, so DuckDB maps each point to
    its global pixel index, joins the regenerated pixel spec, and must
    reproduce the engine's sampled value bit-for-bit (-999999 sentinel
    when the point lands in the nodata disc).  Engine side is
    stages/join.point_sample: broadcast point index, tiles stream,
    only (point, band, value) rows leave the actors.  Restricted to
    doc_id < 448 (wider than geo_zonal_stats: this oracle only probes
    single pixels, so DuckDB's regeneration stays cheap)."""
    from rioxarray_ray.stages import join as jstage

    tiles = _tiles_4326(sf_dir)

    def keep448(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx < 448))

    small = tiles.map_batches(keep448, batch_format="pyarrow",
                              zero_copy_batch=True)
    samp = jstage.point_sample(
        small, _geoms("point"), cell_res=_CELL_RES, concurrency=4
    )

    def finalize(batch: pa.Table) -> pa.Table:
        import numpy as np

        vals = batch["value"].to_numpy(zero_copy_only=False)
        valid = batch["valid"].to_numpy(zero_copy_only=False)
        pxv = np.where(valid, np.rint(vals), -999999).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "geom_id": batch["geom_id"],
                "image_id": batch["image_id"],
                "band": batch["band"],
                "px_val": pa.array(pxv),
            }
        )

    return samp.map_batches(finalize, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_geo_knn(sf_dir: str):
    from rioxarray_ray.stages import join as jstage

    tiles = _tiles_4326(sf_dir)
    joined = jstage.knn_join(
        tiles, _geoms("point"), k=3, cell_res=_CELL_RES, concurrency=4
    )
    return joined.select_columns(
        ["image_id", "tile_row", "tile_col", "geom_id", "rank"]
    )


def q_geo_reproject_grid(sf_dir: str):
    from rioxarray_ray.kernels import affine as aff
    from rioxarray_ray.kernels import warp as warp_kernel
    from rioxarray_ray.sources import corpus

    n = _ndocs(sf_dir)
    m = corpus.image_meta(np.arange(n))
    keep = ~m["projected"]
    tbl = pa.table(
        {
            "image_id": pa.array(m["image_id"][keep]),
            "w": pa.array(m["w"][keep], pa.int32()),
            "h": pa.array(m["h"][keep], pa.int32()),
            "lon_left": pa.array(m["lon_left"][keep]),
            "lat_top": pa.array(m["lat_top"][keep]),
        }
    )

    def plan(batch: pa.Table) -> pa.Table:
        out = []
        for r in batch.to_pylist():
            t = (corpus.RES, 0.0, r["lon_left"], 0.0, -corpus.RES, r["lat_top"])
            left, bottom, right, top = aff.bounds(t, r["w"], r["h"])
            _, dw, dh = warp_kernel.calculate_default_transform(
                "EPSG:4326", "EPSG:3857", r["w"], r["h"], left, bottom, right, top
            )
            out.append({"image_id": r["image_id"], "dst_w": dw, "dst_h": dh})
        return pa.Table.from_pylist(out)

    return _rd().from_arrow(tbl).map_batches(plan, batch_format="pyarrow")


def _keep_idx(tiles, pred):
    """Filter tile rows by a vectorized predicate over the numeric doc_id
    parsed from image_id (gate-side subsetting shared by the pixel-exact
    oracles, which bound DuckDB's pixel regeneration cost)."""

    def keep(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(pred(idx)))

    return tiles.map_batches(keep, batch_format="pyarrow",
                             zero_copy_batch=True)


def q_geo_histogram(sf_dir: str):
    """Per-image pixel-value histogram (stages/stats.histogram_stage:
    per-batch bincount partials -> ONE (image_id, bucket) groupby Sum;
    the shuffle carries count rows, never pixels), oracle-gated EXACTLY:
    DuckDB regenerates the frozen pixel spec and groups the same
    floor(px/16) buckets.  doc_id < 64 bounds the SQL regeneration."""
    from rioxarray_ray.stages import stats as sstage

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 64)
    hist = sstage.histogram_stage(small, bucket=16, concurrency=4)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "image_id": batch["image_id"],
                "bucket": pc.cast(batch["bucket"], pa.int64()),
                "n": pc.cast(batch["n"], pa.int64()),
            }
        )

    return hist.map_batches(finalize, batch_format="pyarrow")


def q_geo_band_math(sf_dir: str):
    """NDVI-style normalized difference (band1 - band0)/(band1 + band0)
    over the 3-band scenes (stages/stats.normalized_difference_stage),
    projected to per-tile integer aggregates of round_even(nd * 1e6) so
    DuckDB can replay the IEEE float chain term-for-term from the
    regenerated pixel spec — any per-pixel ratio error breaks the hash.
    Tiles whose every pixel is masked (or zero-denominator) carry no
    gate row; that case is pytest-covered."""
    from rioxarray_ray.stages import stats as sstage

    small = _keep_idx(
        _tiles_4326(sf_dir), lambda idx: (idx < 320) & (idx % 5 == 0)
    )
    nd = sstage.normalized_difference_stage(
        small, band_a=1, band_b=0, concurrency=4
    )

    def finalize(batch: pa.Table) -> pa.Table:
        out = {
            "image_id": [], "tile_row": [], "tile_col": [],
            "n_ok": [], "nd_sum": [], "nd_min": [], "nd_max": [],
        }
        for row in batch.to_pylist():
            vals = np.asarray(row["nd"], dtype=np.float64)
            ok = ~np.isnan(vals)
            if not ok.any():
                continue
            q = np.rint(vals[ok] * 1e6).astype(np.int64)
            out["image_id"].append(row["image_id"])
            out["tile_row"].append(int(row["tile_row"]))
            out["tile_col"].append(int(row["tile_col"]))
            out["n_ok"].append(int(ok.sum()))
            out["nd_sum"].append(int(q.sum()))
            out["nd_min"].append(int(q.min()))
            out["nd_max"].append(int(q.max()))
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "tile_row": pa.array(out["tile_row"], pa.int64()),
                "tile_col": pa.array(out["tile_col"], pa.int64()),
                "n_ok": pa.array(out["n_ok"], pa.int64()),
                "nd_sum": pa.array(out["nd_sum"], pa.int64()),
                "nd_min": pa.array(out["nd_min"], pa.int64()),
                "nd_max": pa.array(out["nd_max"], pa.int64()),
            }
        )

    return nd.map_batches(finalize, batch_format="pyarrow")


def q_geo_overviews(sf_dir: str):
    """Overview pyramid levels 2/4/8 (stages/stats.overviews_stage:
    per-LxL-block floor-mean of valid pixels, zero-shuffle because the
    64-aligned tile grid divides every level), projected to
    position-weighted checksums per (tile, band, level) so a block
    misplacement, a wrong floor-mean, or a nodata leak each break the
    hash.  DuckDB rebuilds every overview cell from the regenerated
    pixel spec; doc_id < 64 bounds the regeneration."""
    from rioxarray_ray.stages import stats as sstage

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 64)
    ov = sstage.overviews_stage(small, levels=(2, 4, 8), concurrency=4)

    def finalize(batch: pa.Table) -> pa.Table:
        out = {
            "image_id": [], "tile_row": [], "tile_col": [], "band": [],
            "level": [], "ov_h": [], "ov_w": [], "n_valid": [], "wsum": [],
        }
        for row in batch.to_pylist():
            vals = np.asarray(row["ov"], dtype=np.int64)
            ok = np.asarray(row["ov_valid"], dtype=bool)
            if not ok.any():
                continue
            p = np.arange(vals.size, dtype=np.int64)
            weights = 1 + (p % 97)
            out["image_id"].append(row["image_id"])
            out["tile_row"].append(int(row["tile_row"]))
            out["tile_col"].append(int(row["tile_col"]))
            out["band"].append(int(row["band"]))
            out["level"].append(int(row["level"]))
            out["ov_h"].append(int(row["ov_h"]))
            out["ov_w"].append(int(row["ov_w"]))
            out["n_valid"].append(int(ok.sum()))
            out["wsum"].append(int((vals[ok] * weights[ok]).sum()))
        return pa.table(
            {k: pa.array(v, pa.string() if k == "image_id" else pa.int64())
             for k, v in out.items()}
        )

    return ov.map_batches(finalize, batch_format="pyarrow")


# --------------------------------------------------------------------------
# geo queries (rows-only; pixel semantics covered by pytest oracles)
# --------------------------------------------------------------------------


def q_geo_pixel_checksum(sf_dir: str):
    """Decode integrity: per-image integer checksum of valid pixels +
    byte-identical caption passthrough (input_hint invariant).  EXACT SQL
    oracle: the frozen pixel spec (sources/corpus.py) regenerated in
    DuckDB for all four codecs — incl. the lq8 lossy quantize/dequantize
    chain — with BIGINT sums (order-free, no float accumulation).  Pixel
    oracles in pytest: tests/test_stages.py::
    test_decode_matches_single_process_oracle (literal checksums) and
    ::test_decode_phash_integrity_detects_corruption."""
    from rioxarray_ray.kernels.nodata import valid_mask
    from rioxarray_ray.pipelines import flagship as fpipe
    from rioxarray_ray.stages import decode as dstage
    from rioxarray_ray.stages.schema import pixel_views

    n = min(_ndocs(sf_dir), 128)
    ds = fpipe.read_corpus(n)
    decoded = dstage.decode_stage(ds)

    def checksum(batch: pa.Table) -> pa.Table:
        out = []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            vm = valid_mask(px, r["nodata"])
            out.append(
                {
                    "image_id": r["image_id"],
                    "caption": r["caption"],
                    "checksum": int(px.astype(np.int64)[vm].sum()),
                    "n_valid": int(vm.sum()),
                }
            )
        return pa.Table.from_pylist(out)

    return decoded.map_batches(checksum, batch_format="pyarrow")


def q_geo_downsample_avg(sf_dir: str):
    """Area-kernel reproject (resampling='average'): aligned 2x downsample
    over the native-4326 images.  EXACT SQL oracle: the SAT box sums are
    float64 sums of integers far below 2**53 (exact), each dst pixel is
    rint(block_sum / block_count) in the native dtype, and the per-image
    checksum sums those ints as BIGINT — DuckDB regenerates the blocks by
    grouping the pixel spec on (r//2, c//2).  Pixel oracles in pytest:
    per-kernel area tests in tests/test_kernels.py (projected inputs,
    which this gate's scope excludes, are covered there)."""
    from rioxarray_ray.kernels.nodata import valid_mask
    from rioxarray_ray.pipelines import flagship as fpipe
    from rioxarray_ray.stages import decode as dstage
    from rioxarray_ray.stages import warp as wstage
    from rioxarray_ray.stages.schema import pixel_views

    n = min(_ndocs(sf_dir), 64)
    ds = fpipe.read_corpus(n)

    def native_4326(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx % 7 != 6))

    decoded = dstage.decode_stage(
        ds.map_batches(native_4326, batch_format="pyarrow", zero_copy_batch=True)
    )
    down = wstage.reproject_stage(
        decoded,
        "EPSG:4326",
        resampling="average",
        resolution=0.01,  # 2x the corpus RES=5e-3 -> exact 2x2 block means
        concurrency=2,
    )

    def summarize(batch: pa.Table) -> pa.Table:
        out = []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            vm = valid_mask(px, r["nodata"])
            out.append(
                {
                    "image_id": r["image_id"],
                    "h": int(r["h"]),
                    "w": int(r["w"]),
                    "n_valid": int(vm.sum()),
                    "checksum": int(px.astype(np.int64)[vm].sum()),
                }
            )
        return pa.Table.from_pylist(out)

    return down.map_batches(summarize, batch_format="pyarrow")


def q_geo_reproject_roundtrip(sf_dir: str):
    """Identity-grid reproject is exact; UTM round trip preserves captions
    and produces deterministic valid-pixel counts.  Pixel oracles:
    tests/test_stages.py::test_warp_stage_matches_kernel and the per-kernel
    plane/rotation oracles in tests/test_kernels.py."""
    from rioxarray_ray.stages import warp as wstage

    tiles = _tiles_4326(sf_dir).limit(64)
    warped = wstage.reproject_stage(
        tiles, "EPSG:3857", resampling="bilinear", concurrency=2
    )

    def summarize(batch: pa.Table) -> pa.Table:
        from rioxarray_ray.kernels.nodata import valid_mask
        from rioxarray_ray.stages.schema import pixel_views

        out = []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            out.append(
                {
                    "image_id": r["image_id"],
                    "tile_row": r["tile_row"],
                    "tile_col": r["tile_col"],
                    "caption": r["caption"],
                    "dst_w": r["w"],
                    "dst_h": r["h"],
                    "n_valid": int(valid_mask(px, r["nodata"]).sum()),
                }
            )
        return pa.Table.from_pylist(out)

    return warped.map_batches(summarize, batch_format="pyarrow")


def q_geo_reproject_bilinear_fixed(sf_dir: str):
    """SQL-exact twin for the smooth-kernel reproject (round-4 verdict
    item #6: ``geo_reproject_roundtrip`` was the last rows-only gate).
    The grid is designed so bilinear is exactly replayable: src is an
    8x8 float64 raster of closed-form integers at res 1, dst the same
    CRS at res 2 with aligned origin — every dst center falls exactly
    midway between 4 src centers, so bilinear = the mean of a 2x2 block
    (dyadic rational, exact in IEEE double and in DuckDB).  Runs through
    the REAL actor-pool warp stage (stages/warp.py WarpActor ->
    kernels/warp.py bilinear), so a weight, edge-clamp or grid-plan
    defect breaks the value hash."""
    from rioxarray_ray.stages import warp as wstage
    from rioxarray_ray.stages.schema import RASTER_SCHEMA, pixels_to_bytes

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_rasters(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = np.arange(64, dtype=np.int64)
        vals = (ids[:, None] * 7 + k[None, :] * k[None, :]) % 511
        rows = []
        for j, d in enumerate(ids):
            px = vals[j].astype(np.float64).reshape(1, 8, 8)
            rows.append({
                "image_id": str(d),
                "band_count": 1,
                "h": 8,
                "w": 8,
                "dtype": "float64",
                "nodata": float("nan"),
                "crs": "EPSG:32615",
                "transform": [1.0, 0.0, 0.0, 0.0, -1.0, 0.0],
                "pixels": pixels_to_bytes(px),
                "caption": None,
                "phash": None,
            })
        return pa.Table.from_pylist(rows, schema=RASTER_SCHEMA)

    rasters = ds.map_batches(to_rasters, batch_format="pyarrow",
                             zero_copy_batch=True)
    grid = wstage.GridSpec(
        "EPSG:32615", (2.0, 0.0, 0.0, 0.0, -2.0, 0.0), (4, 4))
    warped = wstage.reproject_match_stage(
        rasters, grid, resampling="bilinear", concurrency=2)

    def summarize(batch: pa.Table) -> pa.Table:
        from rioxarray_ray.stages.schema import pixel_views

        wts = (np.arange(16, dtype=np.float64) + 1.0).reshape(4, 4)
        meta = batch.drop_columns(["pixels"]).to_pylist()
        rows = []
        for r, px in zip(meta, pixel_views(batch)):
            rows.append({
                "doc_id": int(r["image_id"]),
                "dst_h": r["h"],
                "dst_w": r["w"],
                "wsum": float((px[0] * wts).sum()),
            })
        return pa.Table.from_pylist(rows)

    return warped.map_batches(summarize, batch_format="pyarrow",
                              zero_copy_batch=True)


def q_geo_tiled_halo_warp(sf_dir: str):
    """Halo-correct tiled warp onto a shared grid (the scale path of
    SURVEY §2.4): per-dst-window integer checksums.  Pixel-exactness vs
    the whole-image warp is asserted in
    tests/test_stages.py::test_tiled_halo_warp_equals_whole_image."""
    from rioxarray_ray.pipelines import flagship as fpipe
    from rioxarray_ray.stages import decode as dstage
    from rioxarray_ray.stages import tile as tstage
    from rioxarray_ray.stages import warp as wstage

    n = min(_ndocs(sf_dir), 64)
    ds = fpipe.read_corpus(n)
    tiles = tstage.tile_stage(dstage.decode_stage(ds), tile_size=_TILE, halo=3)
    grid = wstage.GridSpec(
        "EPSG:3857", (600.0, 0.0, -6690000.0, 0.0, -600.0, 4790000.0),
        (512, 512),
    )
    out = wstage.reproject_match_tiled(
        tiles, grid, resampling="bilinear", concurrency=2
    )

    def summarize(batch: pa.Table) -> pa.Table:
        from rioxarray_ray.kernels.nodata import valid_mask
        from rioxarray_ray.stages.schema import pixel_views

        rows = []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            vm = valid_mask(px, r["nodata"])
            rows.append(
                {
                    "image_id": r["image_id"],
                    "tile_row": r["tile_row"],
                    "tile_col": r["tile_col"],
                    "n_valid": int(vm.sum()),
                    "checksum": int(px.astype(np.int64)[vm].sum()),
                }
            )
        return pa.Table.from_pylist(rows)

    return out.map_batches(summarize, batch_format="pyarrow")


def q_geo_reproject_identity(sf_dir: str):
    """GATED: identity reproject (4326 -> 4326, nearest) over halo-free
    tiles — SURVEY §5 invariant (b): reproject onto the same CRS plans a
    grid within 1 ulp of the source, so nearest passes every pixel through
    verbatim (fractional coords land j+0.5 +- ~4e-12, floor is stable).
    EXACT SQL oracle: the tile slices of the regenerated pixel spec
    (round-3 verdict item #2 — the per-row warp stage's gate row)."""
    from rioxarray_ray.stages import warp as wstage

    def keep_small(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx < 64))

    tiles = _tiles_4326(sf_dir).map_batches(
        keep_small, batch_format="pyarrow", zero_copy_batch=True
    )
    warped = wstage.reproject_stage(
        tiles, "EPSG:4326", resampling="nearest", concurrency=2
    )

    def summarize(batch: pa.Table) -> pa.Table:
        from rioxarray_ray.kernels.nodata import valid_mask
        from rioxarray_ray.stages.schema import decode_nodata, pixel_views

        out = []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            nod = decode_nodata(float(r["nodata"]), r["dtype"])
            vm = valid_mask(px, nod)
            out.append(
                {
                    "image_id": r["image_id"],
                    "tile_row": r["tile_row"],
                    "tile_col": r["tile_col"],
                    "dst_h": int(r["h"]),
                    "dst_w": int(r["w"]),
                    "n_valid": int(vm.sum()),
                    "checksum": int(px.astype(np.int64)[vm].sum()),
                }
            )
        return pa.Table.from_pylist(out)

    return warped.map_batches(summarize, batch_format="pyarrow")


# Shared grid of the NEAREST tiled-halo gate: res 2**-7 deg and integer
# origin make every dst pixel-center coordinate an EXACT binary float, so
# the value is identical whichever tile window computes it AND identical
# to the SQL oracle's global closed form (no per-window rounding skew).
_NGRID_RES = 7.8125e-3
_NGRID_T = (_NGRID_RES, 0.0, -60.0, 0.0, -_NGRID_RES, 40.0)
_NGRID_SHAPE = (170, 10500)


def q_geo_tiled_halo_warp_nearest(sf_dir: str):
    """GATED: the 100-TB scale path (halo tiles -> shared grid) in nearest
    mode, mosaicked per image — round-3 verdict item #1.  The mosaic
    dedups ownership-margin overlaps (overlapping windows compute
    identical values; pytest test_tiled_halo_warp_equals_whole_image).
    EXACT SQL oracle: per-dst-pixel src index is closed-form floor() over
    the corpus pixel spec (reference nearest semantics:
    /root/reference/rioxarray/raster_array.py:287-298)."""
    from rioxarray_ray.pipelines import flagship as fpipe
    from rioxarray_ray.stages import decode as dstage
    from rioxarray_ray.stages import tile as tstage
    from rioxarray_ray.stages import warp as wstage

    n = min(_ndocs(sf_dir), 64)
    ds = fpipe.read_corpus(n)

    def native_4326(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx % 7 != 6))

    tiles = tstage.tile_stage(
        dstage.decode_stage(
            ds.map_batches(
                native_4326, batch_format="pyarrow", zero_copy_batch=True
            )
        ),
        tile_size=_TILE,
        halo=3,
    )
    grid = wstage.GridSpec("EPSG:4326", _NGRID_T, _NGRID_SHAPE)
    out = wstage.reproject_match_tiled(
        tiles, grid, resampling="nearest", concurrency=2
    )
    H, W = _NGRID_SHAPE

    def mosaic(group: pa.Table) -> pa.Table:
        """First-valid mosaic of one image's dst windows on the shared
        grid: distinct (band, I, J) valid positions (values agree across
        ownership-margin overlaps, so 'first' needs no ordering)."""
        from rioxarray_ray.kernels.nodata import valid_mask
        from rioxarray_ray.stages.schema import decode_nodata, pixel_views

        meta = group.drop_columns(["pixels"]).to_pylist()
        keys, vals = [], []
        for r, px in zip(meta, pixel_views(group)):
            t = r["transform"]
            c0 = round((t[2] - _NGRID_T[2]) / _NGRID_T[0])
            r0 = round((t[5] - _NGRID_T[5]) / _NGRID_T[4])
            nod = decode_nodata(float(r["nodata"]), r["dtype"])
            vm = valid_mask(px, nod)
            b_i, i_i, j_i = np.nonzero(vm)
            keys.append((b_i.astype(np.int64) * H + (r0 + i_i)) * W + (c0 + j_i))
            vals.append(px[vm].astype(np.int64))
        if not keys:
            return pa.table(
                {
                    "image_id": pa.array([], pa.string()),
                    "n_valid": pa.array([], pa.int64()),
                    "checksum": pa.array([], pa.int64()),
                }
            )
        all_keys = np.concatenate(keys)
        all_vals = np.concatenate(vals)
        _, first = np.unique(all_keys, return_index=True)
        return pa.table(
            {
                "image_id": pa.array([meta[0]["image_id"]], pa.string()),
                "n_valid": pa.array([len(first)], pa.int64()),
                "checksum": pa.array(
                    [int(all_vals[first].sum())], pa.int64()
                ),
            }
        )

    return out.groupby("image_id").map_groups(mosaic, batch_format="pyarrow")


def q_geo_clip_geometry(sf_dir: str):
    """Polygon clip (concave stars) over tiles: kept tiles + valid counts.
    EXACT SQL oracle: star vertices + the same even-odd ray-casting PIP
    per pixel center, bbox candidate rule, drop-empty contract (DuckDB).
    Pixel oracles in pytest:
    tests/test_kernels.py::test_clip_rect_equals_window_slice,
    ::test_clip_invert_checksum, and the all_touched superset test."""
    from rioxarray_ray.stages import clip as cstage

    tiles = _tiles_4326(sf_dir)
    clipped = cstage.clip_stage(
        tiles, [g["geometry"] for g in _geoms("concave")], concurrency=4
    )

    def summarize(batch: pa.Table) -> pa.Table:
        from rioxarray_ray.kernels.nodata import valid_mask
        from rioxarray_ray.stages.schema import pixel_views

        out = []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            out.append(
                {
                    "image_id": r["image_id"],
                    "tile_row": r["tile_row"],
                    "tile_col": r["tile_col"],
                    "n_valid": int(valid_mask(px, r["nodata"]).sum()),
                }
            )
        return pa.Table.from_pylist(out)

    return clipped.map_batches(summarize, batch_format="pyarrow")


def q_geo_merge(sf_dir: str):
    """Mosaic the first 16 non-projected images (method=first) and emit
    per-dst-tile integer checksums.  EXACT SQL oracle: union-grid plan,
    round-even tile anchors, per-pixel first-valid-source winners and
    BIGINT sums of the regenerated pixel spec, all in DuckDB.  Pixel
    oracles in pytest: tests/test_stages.py::test_merge_stage_reassembles
    and tests/test_kernels.py::test_merge_quadrants_reassembles /
    ::test_merge_methods_on_overlap (literal MODIS bounds + overlap
    rules)."""
    from rioxarray_ray.stages import merge as mstage

    tiles = _tiles_4326(sf_dir)
    # uniform sources only (same band_count / dtype / nodata — the
    # reference's own merge precondition, raster_dataset.py:553-567):
    # idx%4==0 -> raw16 int16 nodata=-28672; skip 3-band (idx%5==0) and
    # projected (idx%7==6) images
    idx_keep = pa.array(
        [
            f"img{i:08d}"
            for i in range(0, 200, 4)
            if i % 7 != 6 and i % 5 != 0
        ][:16]
    )
    subset = tiles.map_batches(
        lambda b: b.filter(pc.is_in(b["image_id"], value_set=idx_keep)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    mosaic, _grid = mstage.merge_stage(subset, method="first")

    def summarize(batch: pa.Table) -> pa.Table:
        from rioxarray_ray.kernels.nodata import valid_mask
        from rioxarray_ray.stages.schema import pixel_views

        out = []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            vm = valid_mask(px, r["nodata"])
            out.append(
                {
                    "tile_id": r["image_id"],
                    "h": r["h"],
                    "w": r["w"],
                    "checksum": int(px.astype(np.int64)[vm].sum()),
                }
            )
        return pa.Table.from_pylist(out)

    return mosaic.map_batches(summarize, batch_format="pyarrow")


def q_geo_mosaic_tiff(sf_dir: str):
    """Single-file GeoTIFF mosaic sink round trip: the SAME 16 sources and
    merge semantics as geo_merge, but written through
    stages/geotiff_sink.write_mosaic_geotiff (distributed compositing +
    per-tile deflate, ONE sparse tiled file) and then re-decoded with the
    from-scratch TIFF reader — per-dst-tile checksums over the FULL grid.
    EXACT SQL oracle: geo_merge's CTE chain with the tile enumeration
    widened to every grid tile (sparse tiles checksum 0).  Pixel oracles
    in pytest: tests/test_geotiff_sink.py (bit-exact round trip, sparse
    fill, overview IFDs, 4 GiB guard)."""
    import os

    from rioxarray_ray.kernels import tiff as tiff_mod
    from rioxarray_ray.stages import geotiff_sink

    tiles = _tiles_4326(sf_dir)
    idx_keep = pa.array(
        [
            f"img{i:08d}"
            for i in range(0, 200, 4)
            if i % 7 != 6 and i % 5 != 0
        ][:16]
    )
    subset = tiles.map_batches(
        lambda b: b.filter(pc.is_in(b["image_id"], value_set=idx_keep)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    path = f"/tmp/rioxarray_ray/mosaic_gate_{os.path.basename(sf_dir)}.tif"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    _, grid = geotiff_sink.write_mosaic_geotiff(subset, path, method="first")
    _transform, width, height, _crs, nodata, dtype = grid
    px, _t, _c = tiff_mod.decode_geotiff(open(path, "rb").read())
    nod = np.asarray(nodata, dtype=px.dtype)
    rows = []
    for tr in range(-(-height // 256)):
        for tc in range(-(-width // 256)):
            block = px[:, tr * 256 : (tr + 1) * 256, tc * 256 : (tc + 1) * 256]
            rows.append(
                {
                    "tile_id": f"mosaic/{tr}/{tc}",
                    "h": block.shape[1],
                    "w": block.shape[2],
                    "checksum": int(
                        block.astype(np.int64)[block != nod].sum()
                    ),
                }
            )
    return pa.Table.from_pylist(rows)


def q_geo_interpolate_na(sf_dir: str):
    """interpolate_na on a tile subset (nearest + cubic side by side):
    all-valid outputs with deterministic integer checksums.  Pixel oracles:
    tests/test_kernels.py::test_interpolate_na_nearest_exact,
    ::test_interpolate_na_linear_plane (exact plane reproduction) and
    ::test_interpolate_na_cubic_plane_exact_and_quadratic_close."""
    from rioxarray_ray.stages.schema import pixel_views, raster_from_view

    tiles = _tiles_4326(sf_dir).limit(48)

    def interp(batch: pa.Table) -> pa.Table:
        out = []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            near = raster_from_view(px, r).interpolate_na("nearest")
            cub = raster_from_view(px, r).interpolate_na("cubic")
            out.append(
                {
                    "image_id": r["image_id"],
                    "tile_row": r["tile_row"],
                    "tile_col": r["tile_col"],
                    "checksum": int(near.pixels.astype(np.int64).sum()),
                    "n_nodata_left": int((~near.valid_mask()).sum()),
                    "checksum_cubic": int(cub.pixels.astype(np.int64).sum()),
                }
            )
        return pa.Table.from_pylist(out)

    return tiles.map_batches(interp, batch_format="pyarrow")


def q_geo_interpolate_na_plane(sf_dir: str):
    """interpolate_na('linear'), oracle-gated via exact plane reproduction.
    Each doc gets a 24x24 raster whose pixels lie on the plane
    v = a*r + b*c + d (integer a,b,d from doc_id) with deterministic
    INTERIOR holes (2 <= r,c <= 21, (r*24 + c + doc_id) % 13 == 0 — inside
    the convex hull of the valid set, so barycentric linear interpolation
    over the Delaunay triangulation reproduces the plane exactly; pytest
    ::test_interpolate_na_linear_plane proves the kernel property).  The
    summed-and-rounded checksum therefore equals the closed-form plane sum
    DuckDB computes — any Delaunay/interpolation defect breaks the hash.
    Reference semantics: raster_array.py interpolate_na (scipy griddata
    'linear')."""
    import numpy as np

    from rioxarray_ray.kernels.raster import Raster
    from rioxarray_ray.kernels import crs as crs_mod

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    N = 24
    wgs = crs_mod.from_user_input("EPSG:4326")

    def interp(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = np.arange(N)[:, None]
        c = np.arange(N)[None, :]
        interior = (r >= 2) & (r <= N - 3) & (c >= 2) & (c <= N - 3)
        sums, holes = [], []
        for d in ids:
            a, b, dd = 1 + int(d) % 5, 2 + int(d) % 7, int(d) % 100
            plane = (a * r + b * c + dd).astype(np.float64)
            hole = interior & ((r * N + c + int(d)) % 13 == 0)
            px = np.where(hole, -9999.0, plane)
            rast = Raster(px[None], transform=(0.01, 0.0, 0.0, 0.0, -0.01, 1.0),
                          crs=wgs, nodata=-9999.0)
            filled = rast.interpolate_na("linear")
            assert filled.valid_mask().all()
            sums.append(int(np.rint(filled.pixels).astype(np.int64).sum()))
            holes.append(int(hole.sum()))
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "pixel_sum": pa.array(sums, pa.int64()),
                "n_holes_filled": pa.array(holes, pa.int64()),
            }
        )

    return ds.map_batches(interp, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_geo_interpolate_na_nearest(sf_dir: str):
    """interpolate_na('nearest'), oracle-gated via a TIE-FREE hole
    pattern: per doc a 32x32 raster with closed-form pixels
    v = (doc_id*37 + r*61 + c*13) % 1000 and whole-column holes at
    c % 4 in (1, 2).  Every hole's euclidean-nearest valid pixel is
    UNIQUE (horizontal neighbor at distance 1; the competing sites sit
    at sqrt(2) and 2), so the exact-EDT fill is tie-break-independent
    and DuckDB can regenerate it closed-form: filled(r,c) = v(r,c-1)
    for c%4==1, v(r,c+1) for c%4==2.  Any EDT/argmin defect breaks the
    BIGINT pixel-sum hash.  The general-tie semantics are pytest-pinned
    (test_interpolate_na_nearest_exact); the ungated md5-style sibling
    geo_interpolate_na runs nearest+cubic on real corpus tiles."""
    import numpy as np

    from rioxarray_ray.kernels import crs as crs_mod
    from rioxarray_ray.kernels.raster import Raster

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    N = 32
    wgs = crs_mod.from_user_input("EPSG:4326")

    def interp(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = np.arange(N)[:, None]
        c = np.arange(N)[None, :]
        hole = (c % 4 == 1) | (c % 4 == 2)
        hole = np.broadcast_to(hole, (N, N))
        sums, holes = [], []
        for d in ids:
            v = ((int(d) * 37 + r * 61 + c * 13) % 1000).astype(np.float64)
            px = np.where(hole, -1.0, v)
            rast = Raster(
                px[None], transform=(0.01, 0.0, 0.0, 0.0, -0.01, 1.0),
                crs=wgs, nodata=-1.0,
            )
            filled = rast.interpolate_na("nearest")
            assert filled.valid_mask().all()
            sums.append(int(np.rint(filled.pixels).astype(np.int64).sum()))
            holes.append(int(hole.sum()))
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "pixel_sum": pa.array(sums, pa.int64()),
                "n_holes_filled": pa.array(holes, pa.int64()),
            }
        )

    return ds.map_batches(interp, batch_format="pyarrow",
                          zero_copy_batch=True)


# --------------------------------------------------------------------------
# training-data queries over documents / embeddings / events / lineitem
# --------------------------------------------------------------------------


def q_multimodal_features(sf_dir: str):
    """Multimodal plumbing over the documents table (payload = utf-8 text
    bytes through the deterministic stub decoder): schema/actor/fan-out are
    the real engine path; the codec boundary is the documented stub."""
    from rioxarray_ray.functions import multimodal

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def to_media(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(
                    [f"m{v}" for v in batch["doc_id"].to_pylist()]
                ),
                "payload": pa.array(
                    [(t or "").encode() for t in batch["text"].to_pylist()],
                    pa.binary(),
                ),
                "media_type": pa.array(["image"] * batch.num_rows),
                "meta": pa.array(["{}"] * batch.num_rows),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow", zero_copy_batch=True)
    out = multimodal.feature_stage(media, feature_dim=8, concurrency=2)

    def summarize(batch: pa.Table) -> pa.Table:
        import numpy as np

        feats = [
            round(float(np.sum(f)), 6) for f in batch["feature"].to_pylist()
        ]
        return pa.Table.from_pydict(
            {"media_id": batch["media_id"], "feat_sum": pa.array(feats)}
        )

    return out.map_batches(summarize, batch_format="pyarrow")


def q_multimodal_features_pooled(sf_dir: str):
    """Oracle-gated twin of multimodal_features: the SAME FeatureExtractor
    actor path (decode -> standardize nearest-gather to 3x32x32 -> feature
    vector), but with the pooled-statistics projection (per-channel
    sum/min/max) instead of the Gaussian matrix, fed REAL native-codec
    bytes (rawu8) whose pixels are closed-form ((doc_id*61 + i*i) % 253
    over 3x16x16).  Decode is real (kernels/codecs.py) and the oracle
    regenerates the standardize gather in SQL — v(b, (r*16)//32,
    (c*16)//32) — so a decode, resize-gather, channel-order, or pooling
    defect breaks the value hash.  Gaussian twin shares every line up to
    the final projection step."""
    import numpy as np

    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels import codecs

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.arange(3 * 16 * 16, dtype=np.int64)
        vals = (ids[:, None] * 61 + i[None, :] * i[None, :]) % 253
        payloads = [
            codecs.encode(vals[k].astype(np.uint8).reshape(3, 16, 16), "rawu8")
            for k in range(len(ids))
        ]
        return pa.Table.from_pydict(
            {
                "media_id": pa.array([str(d) for d in ids], pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array(["image"] * len(ids), pa.string()),
                "meta": pa.array(["{}"] * len(ids), pa.string()),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow",
                           zero_copy_batch=True)
    out = multimodal.feature_stage(media, projection="pooled", concurrency=2)

    def summarize(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = [int(v) for v in batch["media_id"].to_pylist()]
        feats = np.asarray(batch["feature"].to_pylist(), np.float64)
        assert feats.shape[1] == 9
        cols = {"doc_id": pa.array(ids, pa.int64())}
        for ch in range(3):
            cols[f"sum_{ch}"] = pa.array(
                np.rint(feats[:, 3 * ch]).astype(np.int64), pa.int64()
            )
            cols[f"min_{ch}"] = pa.array(
                np.rint(feats[:, 3 * ch + 1]).astype(np.int64), pa.int64()
            )
            cols[f"max_{ch}"] = pa.array(
                np.rint(feats[:, 3 * ch + 2]).astype(np.int64), pa.int64()
            )
        return pa.Table.from_pydict(cols)

    return out.map_batches(summarize, batch_format="pyarrow")


def q_multimodal_png(sf_dir: str):
    """REAL PNG bytes through the codec registry, oracle-gated.  Pixels are
    a closed-form function of doc_id ((doc_id*31 + i*i) % 251 over a
    3x16x16 image), encoded to PNG with filter = doc_id % 5 (every
    scanline filter exercised across the corpus), decoded back via the
    registry's signature sniff (kernels/png.py), and summarized FROM THE
    DECODED ARRAY.  The oracle computes the same sums directly from the
    formula, so a codec defect (filter reconstruction, geometry, sample
    order, byte order) breaks the value hash.  The decoder is additionally
    pinned by encoder-independent hand-built spec goldens in
    tests/test_png.py."""
    import numpy as np

    from rioxarray_ray.kernels import codecs, png

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.arange(3 * 16 * 16, dtype=np.int64)
        vals = (ids[:, None] * 31 + i[None, :] * i[None, :]) % 251
        sums, mins, maxs, bands, hs, ws = [], [], [], [], [], []
        for k, d in enumerate(ids):
            arr = vals[k].astype(np.uint8).reshape(3, 16, 16)
            payload = png.encode_png(arr, filter_type=int(d) % 5)
            back = codecs.decode(payload)  # sniff routes to the PNG decoder
            sums.append(int(back.astype(np.int64).sum()))
            mins.append(int(back.min()))
            maxs.append(int(back.max()))
            b, h, w = back.shape
            bands.append(b)
            hs.append(h)
            ws.append(w)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "pixel_sum": pa.array(sums, pa.int64()),
                "pixel_min": pa.array(mins, pa.int64()),
                "pixel_max": pa.array(maxs, pa.int64()),
                "bands": pa.array(bands, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "w": pa.array(ws, pa.int64()),
            }
        )

    return ds.map_batches(
        roundtrip, batch_format="pyarrow", zero_copy_batch=True
    )


def q_multimodal_wav(sf_dir: str):
    """REAL RIFF/WAVE bytes through the audio decoder, oracle-gated.
    Samples are a closed-form function of doc_id
    (((doc_id*37 + i*i) % 2001) - 1000 over 1024 samples), encoded to WAV
    with a rotating sample encoding (16/24/32-bit PCM, float32 — every
    supported depth exercised across the corpus) and channel count
    (1 + doc_id % 2), decoded back via multimodal.DECODERS['audio']
    (kernels/wav.py), and summarized FROM THE DECODED ARRAY.  The oracle
    recomputes the sums from the formula, so a codec defect (sign
    extension, interleave order, float layout, chunk walking) breaks the
    value hash.  The decoder is additionally pinned by hand-built spec
    goldens in tests/test_wav.py."""
    import numpy as np

    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels import wav

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    _DTYPES = (np.int16, np.int32, np.int32, np.float32)  # idx 1 packs 24-bit

    def roundtrip(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.arange(1024, dtype=np.int64)
        vals = (ids[:, None] * 37 + i[None, :] * i[None, :]) % 2001 - 1000
        cols = {k: [] for k in
                ("n_samples", "channels", "sample_sum", "sample_min",
                 "sample_max", "energy")}
        for k, d in enumerate(ids):
            depth = int(d) % 4
            channels = 1 + int(d) % 2
            arr = vals[k].astype(_DTYPES[depth]).reshape(channels, -1)
            payload = wav.encode_wav(
                arr, 16000, bits=24 if depth == 1 else None
            )
            back = multimodal.DECODERS["audio"](payload).astype(np.int64)
            cols["n_samples"].append(int(back.size))
            cols["channels"].append(back.shape[0])
            cols["sample_sum"].append(int(back.sum()))
            cols["sample_min"].append(int(back.min()))
            cols["sample_max"].append(int(back.max()))
            cols["energy"].append(int((back * back).sum()))
        out = {"doc_id": batch["doc_id"]}
        out.update({k: pa.array(v, pa.int64()) for k, v in cols.items()})
        return pa.Table.from_pydict(out)

    return ds.map_batches(
        roundtrip, batch_format="pyarrow", zero_copy_batch=True
    )


def q_multimodal_avi(sf_dir: str):
    """REAL uncompressed-DIB AVI bytes through the video path, oracle-gated.
    Each doc gets a 5-frame 3x8x8 video with closed-form pixels
    ((doc_id*13 + f*257 + i*i) % 256), encoded to AVI (BGR bottom-up
    scanlines, stride padding), decoded + frame-sampled (every 2nd frame)
    by frame_sample_stage, whose per-frame checksums come FROM THE DECODED
    FRAMES.  The oracle recomputes the checksums from the formula, so a
    codec defect (BGR swap, row flip, stride, frame order) breaks the
    value hash.  Hand-built spec goldens in tests/test_avi.py pin the
    decoder independently."""
    import json

    import numpy as np

    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels import avi

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        f = np.arange(5, dtype=np.int64)
        i = np.arange(3 * 8 * 8, dtype=np.int64)
        vals = (
            ids[:, None, None] * 13 + f[None, :, None] * 257
            + i[None, None, :] * i[None, None, :]
        ) % 256
        payloads = [
            avi.encode_avi(vals[k].astype(np.uint8).reshape(5, 3, 8, 8),
                           fps=10.0)
            for k in range(len(ids))
        ]
        return pa.Table.from_pydict(
            {
                "media_id": pa.array([str(d) for d in ids], pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array(["video"] * len(ids), pa.string()),
                "meta": pa.array([json.dumps({"n_frames": 5})] * len(ids)),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow",
                           zero_copy_batch=True)
    sampled = multimodal.frame_sample_stage(media, every_nth=2)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": pc.cast(batch["media_id"], pa.int64()),
                "frame_index": pc.cast(batch["frame_index"], pa.int64()),
                "frame_sum": batch["frame_sum"],
            }
        )

    return sampled.map_batches(finalize, batch_format="pyarrow",
                               zero_copy_batch=True)


def q_multimodal_audio_features(sf_dir: str):
    """Frame-level audio features (energy / zero-crossings / peak over
    256-sample frames, hop 128) through the REAL WAV codec chain
    (functions/multimodal.audio_features_stage).  Same closed-form
    waveform + depth/channel rotation as q_multimodal_wav, so the oracle
    replays every frame's integer features from the formula — a framing
    bug (hop, window, channel split) or a codec defect breaks the hash."""
    import numpy as np

    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels import wav

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    _DTYPES = (np.int16, np.int32, np.int32, np.float32)

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.arange(1024, dtype=np.int64)
        vals = (ids[:, None] * 37 + i[None, :] * i[None, :]) % 2001 - 1000
        payloads = []
        for k, d in enumerate(ids):
            depth = int(d) % 4
            channels = 1 + int(d) % 2
            arr = vals[k].astype(_DTYPES[depth]).reshape(channels, -1)
            payloads.append(
                wav.encode_wav(arr, 16000, bits=24 if depth == 1 else None)
            )
        return pa.Table.from_pydict(
            {
                "media_id": pa.array([str(d) for d in ids], pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow",
                           zero_copy_batch=True)
    feats = multimodal.audio_features_stage(media, frame=256, hop=128)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": pc.cast(batch["media_id"], pa.int64()),
                "channel": pc.cast(batch["channel"], pa.int64()),
                "frame_index": pc.cast(batch["frame_index"], pa.int64()),
                "energy": batch["energy"],
                "zero_crossings": batch["zero_crossings"],
                "peak": batch["peak"],
            }
        )

    return feats.map_batches(finalize, batch_format="pyarrow",
                             zero_copy_batch=True)


def q_multimodal_scene_cut(sf_dir: str):
    """Shot-boundary detection through the REAL AVI codec chain
    (functions/multimodal.scene_cut_stage): SAD between consecutive
    frames + thresholded cut flags.  Same closed-form 5-frame video as
    q_multimodal_avi — frame f+1 is frame f shifted by +1 mod 256, so
    SAD = 192 + 254*k where k counts the pixels that wrap; the oracle
    recomputes every SAD from the formula, catching frame-order, BGR,
    stride and diff bugs."""
    import numpy as np

    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels import avi

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        f = np.arange(5, dtype=np.int64)
        i = np.arange(3 * 8 * 8, dtype=np.int64)
        vals = (
            ids[:, None, None] * 13 + f[None, :, None] * 257
            + i[None, None, :] * i[None, None, :]
        ) % 256
        payloads = [
            avi.encode_avi(vals[k].astype(np.uint8).reshape(5, 3, 8, 8),
                           fps=10.0)
            for k in range(len(ids))
        ]
        return pa.Table.from_pydict(
            {
                "media_id": pa.array([str(d) for d in ids], pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow",
                           zero_copy_batch=True)
    cuts = multimodal.scene_cut_stage(media, threshold=400)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": pc.cast(batch["media_id"], pa.int64()),
                "frame_index": pc.cast(batch["frame_index"], pa.int64()),
                "sad": batch["sad"],
                "is_cut": batch["is_cut"],
            }
        )

    return cuts.map_batches(finalize, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_multimodal_jpeg(sf_dir: str):
    """REAL baseline JPEG bytes through the image registry, oracle-gated.
    Each doc gets a 16x24 grayscale image that is FLAT per 8x8 block
    (block value = (doc_id*23 + b*b) % 256 over 6 blocks): flat blocks at
    quality 100 are DC-only with Q0 = 1, the one case T.81 makes exact,
    so the full Huffman + DCT chain must return the input bit-for-bit and
    DuckDB can recompute the sums from the formula.  ODD doc ids encode
    PROGRESSIVE (SOF2 multi-scan: spectral selection + successive
    approximation, kernels/jpeg.py encode_jpeg_progressive) and even ids
    baseline, so BOTH entropy layouts must reconstruct the identical
    exact pixels to hash-match one oracle.  Lossy-path quality is
    bounded separately in tests/test_jpeg.py (PSNR + the
    progressive==baseline bit-identity roundtrips), and the decoder is
    pinned by a hand-built Annex-K entropy-stream golden there."""
    import numpy as np

    from rioxarray_ray.kernels import codecs, jpeg

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.arange(6, dtype=np.int64)
        vals = (ids[:, None] * 23 + b[None, :] * b[None, :]) % 256
        sums, mins, maxs = [], [], []
        for k, d in enumerate(ids):
            blocks = vals[k].reshape(2, 3)
            img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
            img = img.astype(np.uint8)[None]
            enc = (jpeg.encode_jpeg_progressive if int(d) % 2
                   else jpeg.encode_jpeg)
            payload = enc(img, quality=100)
            back = codecs.decode(payload)  # sniff routes to the JPEG decoder
            sums.append(int(back.astype(np.int64).sum()))
            mins.append(int(back.min()))
            maxs.append(int(back.max()))
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "pixel_sum": pa.array(sums, pa.int64()),
                "pixel_min": pa.array(mins, pa.int64()),
                "pixel_max": pa.array(maxs, pa.int64()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_multimodal_bmp(sf_dir: str):
    """REAL Windows BMP bytes through the image registry, oracle-gated.
    Each doc gets a 3x10x14 image with closed-form pixels
    ((doc_id*41 + i*i) % 256); width 14 makes the 24-bit scanline 42
    bytes -> stride 44, so the 4-byte row padding, the BGR sample swap
    and the bottom-up row flip are all on the exact path.  Encoded with
    kernels/bmp.encode_bmp, decoded back via the registry's magic sniff
    (kernels/bmp.py reuses the shared DIB reader), summarized FROM THE
    DECODED ARRAY with a POSITION-WEIGHTED checksum (band-major
    px[i]*(i+1)): a BGR swap / row flip / stride defect permutes values
    and breaks the hash even where a plain sum would not.  Hand-built
    spec goldens in tests/test_bmp.py pin the decoder independently of
    the encoder."""
    import numpy as np

    from rioxarray_ray.kernels import bmp, codecs

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.arange(3 * 10 * 14, dtype=np.int64)
        vals = (ids[:, None] * 41 + i[None, :] * i[None, :]) % 256
        wts = i + 1
        sums, wsums, mins, maxs, bands, hs, ws = [], [], [], [], [], [], []
        for k in range(len(ids)):
            arr = vals[k].astype(np.uint8).reshape(3, 10, 14)
            payload = bmp.encode_bmp(arr)
            back = codecs.decode(payload)  # sniff routes to the BMP decoder
            flat = back.reshape(-1).astype(np.int64)
            sums.append(int(flat.sum()))
            wsums.append(int((flat * wts).sum()))
            mins.append(int(flat.min()))
            maxs.append(int(flat.max()))
            b, h, w = back.shape
            bands.append(b)
            hs.append(h)
            ws.append(w)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "pixel_sum": pa.array(sums, pa.int64()),
                "weighted_sum": pa.array(wsums, pa.int64()),
                "pixel_min": pa.array(mins, pa.int64()),
                "pixel_max": pa.array(maxs, pa.int64()),
                "bands": pa.array(bands, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "w": pa.array(ws, pa.int64()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_multimodal_gif(sf_dir: str):
    """REAL GIF89a bytes through the image registry, oracle-gated.  Each
    doc gets a 20x17 grayscale image with closed-form pixels
    ((doc_id*43 + i*i) % 256 over h*w, replicated to 3 bands — <=256
    distinct colors so the exact-palette encoder applies), encoded with
    kernels/gif.encode_gif (real growing-dictionary LZW), decoded back
    via the registry's signature sniff (kernels/gif.py: LSB-first
    variable-width codes, giflib width schedule), and summarized FROM THE
    DECODED ARRAY.  The oracle recomputes 3x the gray sum from the
    formula, so an LZW defect (width bump timing, KwKwK, packing order,
    palette mapping) breaks the value hash; the POSITION-WEIGHTED
    checksum additionally breaks on any within-band permutation (row
    reorder, interlace misread) a plain sum would miss.  Hand-packed
    bit-stream goldens in tests/test_gif.py pin the decoder
    independently."""
    import numpy as np

    from rioxarray_ray.kernels import codecs, gif

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.arange(20 * 17, dtype=np.int64)
        vals = (ids[:, None] * 43 + i[None, :] * i[None, :]) % 256
        wts = np.arange(3 * 20 * 17, dtype=np.int64) + 1
        sums, wsums, mins, maxs, bands, hs, ws = [], [], [], [], [], [], []
        for k in range(len(ids)):
            gray = vals[k].astype(np.uint8).reshape(20, 17)
            payload = gif.encode_gif(np.repeat(gray[None], 3, axis=0))
            back = codecs.decode(payload)  # sniff routes to the GIF decoder
            flat = back.reshape(-1).astype(np.int64)
            sums.append(int(flat.sum()))
            wsums.append(int((flat * wts).sum()))
            mins.append(int(flat.min()))
            maxs.append(int(flat.max()))
            b, h, w = back.shape
            bands.append(b)
            hs.append(h)
            ws.append(w)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "pixel_sum": pa.array(sums, pa.int64()),
                "weighted_sum": pa.array(wsums, pa.int64()),
                "pixel_min": pa.array(mins, pa.int64()),
                "pixel_max": pa.array(maxs, pa.int64()),
                "bands": pa.array(bands, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "w": pa.array(ws, pa.int64()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_multimodal_pnm(sf_dir: str):
    """REAL Netpbm (P6 binary PPM) bytes through the image registry,
    oracle-gated.  Each doc gets a 3x9x11 RGB image with closed-form
    band-major pixels ((doc_id*47 + i*i) % 256), encoded with
    kernels/pnm.encode_pnm (interleaved RGB samples), decoded back via
    the registry's magic sniff, and summarized FROM THE DECODED ARRAY
    with a POSITION-WEIGHTED checksum (sum of px[i]*(i+1) in band-major
    order) — unlike a plain sum, any interleave/transpose/row-order
    defect permutes values and breaks the hash.  Hand-written goldens in
    tests/test_pnm.py pin the header grammar and 16-bit BE layout."""
    import numpy as np

    from rioxarray_ray.kernels import codecs, pnm

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def roundtrip(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.arange(3 * 9 * 11, dtype=np.int64)
        vals = (ids[:, None] * 47 + i[None, :] * i[None, :]) % 256
        wts = i + 1
        sums, wsums, mins, maxs = [], [], [], []
        for k in range(len(ids)):
            arr = vals[k].astype(np.uint8).reshape(3, 9, 11)
            back = codecs.decode(pnm.encode_pnm(arr))
            flat = back.reshape(-1).astype(np.int64)
            sums.append(int(flat.sum()))
            wsums.append(int((flat * wts).sum()))
            mins.append(int(flat.min()))
            maxs.append(int(flat.max()))
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "pixel_sum": pa.array(sums, pa.int64()),
                "weighted_sum": pa.array(wsums, pa.int64()),
                "pixel_min": pa.array(mins, pa.int64()),
                "pixel_max": pa.array(maxs, pa.int64()),
            }
        )

    return ds.map_batches(roundtrip, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_multimodal_resize(sf_dir: str):
    """The multimodal Resizer stage, oracle-gated.  Each doc gets a
    3x12x10 native-codec image with closed-form pixels
    ((doc_id*53 + i*i) % 256), runs through resize_stage (nearest
    index-gather to 5x4: src index r*12//5, c*10//4), and the output
    payload is summarized with a position-weighted checksum.  The oracle
    regenerates the SAME gather in SQL — resized(b,r,c) =
    v(b, r*12//5, c*10//4) — so a stride/rounding/band-order defect in
    the resize math breaks the hash."""
    import numpy as np

    from rioxarray_ray.functions import multimodal
    from rioxarray_ray.kernels import codecs

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.arange(3 * 12 * 10, dtype=np.int64)
        vals = (ids[:, None] * 53 + i[None, :] * i[None, :]) % 256
        payloads = [
            codecs.encode(vals[k].astype(np.uint8).reshape(3, 12, 10), "rawu8")
            for k in range(len(ids))
        ]
        return pa.Table.from_pydict(
            {
                "media_id": pa.array([str(d) for d in ids], pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array(["image"] * len(ids), pa.string()),
                "meta": pa.array(["{}"] * len(ids), pa.string()),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow",
                           zero_copy_batch=True)
    resized = multimodal.resize_stage(media, out_h=5, out_w=4)

    def summarize(batch: pa.Table) -> pa.Table:
        wts = np.arange(3 * 5 * 4, dtype=np.int64) + 1
        ids, sums, wsums = [], [], []
        for rid, payload, shape in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["shape"].to_pylist(),
        ):
            assert list(shape) == [3, 5, 4]
            flat = np.frombuffer(payload, np.uint8).astype(np.int64)
            ids.append(int(rid))
            sums.append(int(flat.sum()))
            wsums.append(int((flat * wts).sum()))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pixel_sum": pa.array(sums, pa.int64()),
                "weighted_sum": pa.array(wsums, pa.int64()),
            }
        )

    return resized.map_batches(summarize, batch_format="pyarrow",
                               zero_copy_batch=True)


def q_geo_open_geotiff(sf_dir: str):
    """REAL GeoTIFF bytes through the open_rasterio analogue, oracle-gated.
    Each doc becomes a georeferenced int16 GeoTIFF (closed-form pixels
    ((doc_id*19 + i*i) % 4001 - 2000 over 2x12x12; deflate-compressed for
    even doc ids; TILED 8x8 layout — the cloud-optimized-GeoTIFF shape —
    for doc_id % 3 == 0, strips otherwise), opened via api.open_geotiffs
    (kernels/tiff.py decodes from scratch), and summarized FROM THE
    OPENED ENGINE ROWS — pixel sum, dims, dtype, recovered EPSG code and
    transform cells.  The oracle recomputes everything from the formula,
    so a TIFF defect (IFD walk, strip/tile decode, edge-tile cropping,
    deflate, sample format, GeoKey/tiepoint parse) breaks the value
    hash."""
    import numpy as np

    import rioxarray_ray.api as api
    from rioxarray_ray.kernels import tiff

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_tiffs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.arange(2 * 12 * 12, dtype=np.int64)
        vals = (ids[:, None] * 19 + i[None, :] * i[None, :]) % 4001 - 2000
        payloads = []
        for k, d in enumerate(ids):
            arr = vals[k].astype(np.int16).reshape(2, 12, 12)
            t = (0.5, 0.0, float(d % 100), 0.0, -0.25, float(d % 50))
            payloads.append(
                tiff.encode_geotiff(
                    arr, transform=t, crs="EPSG:32621",
                    compression="deflate" if int(d) % 2 == 0 else "none",
                    tile=(8, 8) if int(d) % 3 == 0 else None,
                )
            )
        return pa.Table.from_pydict(
            {
                "image_id": pa.array([str(d) for d in ids]),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    tiffs = ds.map_batches(to_tiffs, batch_format="pyarrow",
                           zero_copy_batch=True)
    opened = api.open_geotiffs(tiffs)

    def summarize(batch: pa.Table) -> pa.Table:
        from rioxarray_ray.stages.schema import pixel_views

        meta = batch.drop_columns(["pixels"]).to_pylist()
        rows = []
        for r, px in zip(meta, pixel_views(batch)):
            t = r["transform"]
            rows.append(
                {
                    "doc_id": int(r["image_id"]),
                    "pixel_sum": int(px.astype(np.int64).sum()),
                    "bands": r["band_count"],
                    "h": r["h"],
                    "w": r["w"],
                    "dtype_ok": r["dtype"] == "int16",
                    "epsg": int(r["crs"].split(":")[1]),
                    "origin_x": float(t[2]),
                    "origin_y": float(t[5]),
                }
            )
        return pa.Table.from_pylist(rows)

    return opened.ds.map_batches(summarize, batch_format="pyarrow",
                                 zero_copy_batch=True)


def q_geo_open_netcdf(sf_dir: str):
    """REAL netCDF4/HDF5 container bytes through the open_rasterio
    analogue, oracle-gated.  Each doc becomes a georeferenced int16
    netCDF (closed-form pixels (doc_id*31 + i*i) % 3001 - 1500 over
    2x9x11; coordinate variables carry the grid; _FillValue/crs attrs
    ride on the variable), serialized by the from-scratch HDF5 WRITER
    (kernels/hdf5.py write_netcdf: superblock v0, v1 object headers,
    symbol-table group), opened via api.open_netcdfs (the from-scratch
    HDF5 READER), and summarized FROM THE OPENED ENGINE ROWS — pixel
    sum, dims, dtype, nodata, CRS and transform cells.  The oracle
    recomputes everything from the formula, so any defect on either
    side of the container round-trip (heap/btree/symbol-table layout,
    attribute codec, dimension resolution, coord->transform) breaks
    the value hash.  The reference opens these containers through
    xarray/netCDF4 (its golden corpus IS this format:
    test/integration/test_integration_rioxarray.py:53-69); spec
    conformance against foreign files is pytest-gated on the
    reference's own .nc goldens (tests/test_hdf5.py)."""
    import numpy as np

    import rioxarray_ray.api as api
    from rioxarray_ray.kernels import hdf5

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_netcdfs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.arange(2 * 9 * 11, dtype=np.int64)
        vals = (ids[:, None] * 31 + i[None, :] * i[None, :]) % 3001 - 1500
        payloads = []
        for k, d in enumerate(ids):
            arr = vals[k].astype(np.int16).reshape(2, 9, 11)
            x = float(d % 7) + (np.arange(11) + 0.5) * 0.5
            y = float(d % 13) - (np.arange(9) + 0.5) * 0.25
            payloads.append(hdf5.write_netcdf({
                "x": (x, ("x",), {"axis": "X"}),
                "y": (y, ("y",), {"axis": "Y"}),
                "sst": (arr, ("band", "y", "x"),
                        {"_FillValue": np.int16(-77),
                         "crs": "EPSG:32615"}),
            }))
        return pa.Table.from_pydict(
            {
                "image_id": pa.array([str(d) for d in ids]),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    ncs = ds.map_batches(to_netcdfs, batch_format="pyarrow",
                         zero_copy_batch=True)
    opened = api.open_netcdfs(ncs, variable="sst")

    def summarize(batch: pa.Table) -> pa.Table:
        from rioxarray_ray.stages.schema import pixel_views

        meta = batch.drop_columns(["pixels"]).to_pylist()
        rows = []
        for r, px in zip(meta, pixel_views(batch)):
            t = r["transform"]
            rows.append(
                {
                    "doc_id": int(r["image_id"].split("/")[0]),
                    "pixel_sum": int(px.astype(np.int64).sum()),
                    "bands": r["band_count"],
                    "h": r["h"],
                    "w": r["w"],
                    "dtype_ok": r["dtype"] == "int16",
                    "nodata": float(r["nodata"]),
                    "epsg": int(r["crs"].split(":")[1]),
                    "origin_x": float(t[2]),
                    "origin_y": float(t[5]),
                    "res_x": float(t[0]),
                    "res_y": float(t[4]),
                }
            )
        return pa.Table.from_pylist(rows)

    return opened.ds.map_batches(summarize, batch_format="pyarrow",
                                 zero_copy_batch=True)


def q_dedup_exact(sf_dir: str):
    from rioxarray_ray.functions import dedup

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dedup.exact_dedup(ds)


def q_text_tokens(sf_dir: str):
    from rioxarray_ray.functions import text

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        text.token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "n_tokens", "n_chars_m"])


def q_text_quality(sf_dir: str):
    from rioxarray_ray.functions import text

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    scored = ds.map_batches(
        text.QualityScorer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=2,
    )

    def ints(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        n_punct = _pc.count_substring_regex(
            _pc.fill_null(batch["text"], ""), r"[^\w\s]"
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": batch["n_words"],
                "n_punct": _pc.cast(n_punct, pa.int64()),
            }
        )

    return scored.map_batches(ints, batch_format="pyarrow")


def q_text_langid(sf_dir: str):
    from rioxarray_ray.functions import text

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    pred = ds.map_batches(
        text.LangId, batch_format="pyarrow", zero_copy_batch=True, concurrency=2
    )
    return pred.select_columns(["doc_id", "lang", "lang_pred"])


def q_text_fingerprint(sf_dir: str):
    from rioxarray_ray.functions import text

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        text.fingerprint_batch, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "fingerprint"])


def q_text_length_quantiles(sf_dir: str):
    """Exact discrete quantiles of per-doc token counts
    (functions/sample.quantiles_disc): ONE groupby(value).count()
    histogram shuffle, driver-side cumulative walk over the SMALL
    distinct-value table.  Quantile points are dyadic fractions so
    q*n is float-exact and the ceil(q*n) position rule (verified =
    DuckDB quantile_disc) is unambiguous on both sides."""
    from rioxarray_ray.functions import sample, text

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    with_counts = ds.map_batches(
        text.token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["n_tokens"])
    return sample.quantiles_disc(
        with_counts, "n_tokens", qs=(0.0, 0.25, 0.5, 0.75, 0.875, 1.0)
    )


def q_events_asof_orders(sf_dir: str):
    """Distributed ASOF join (functions/asof.asof_join): each event joins
    the user's latest order with o_orderdate <= event ts (ties broken by
    max o_orderkey — deterministic, partitioning-independent).  ONE
    groupby(key) co-shuffle + vectorized searchsorted per group.  The
    oracle ranks candidates with a window function implementing the same
    rule.  Timestamps compare as epoch microseconds (BIGINT) on both
    sides."""
    from rioxarray_ray.functions.asof import asof_join

    events = _read_pq(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orders = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    joined = asof_join(
        events,
        orders,
        key=("user_id", "o_custkey"),
        left_ts="ts",
        right_ts="o_orderdate",
        left_cols=["event_id"],
        right_cols=["o_orderkey", "o_totalprice"],
        right_tie="o_orderkey",
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": pc.cast(pc.cast(batch["ts"], pa.int64()), pa.int64()),
                "o_orderkey": batch["o_orderkey"],
                "o_totalprice": batch["o_totalprice"],
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


def q_text_sample(sf_dir: str):
    """Deterministic hash sampling (functions/sample.hash_sample):
    membership = md5_number_upper(f"{seed}:{doc_id}") % 1000 < rate —
    content-stable (partitioning/cluster-size independent), mirrored
    exactly in DuckDB.  Output carries the per-doc token count so the
    sampled rows also exercise the tokenizer downstream."""
    from rioxarray_ray.functions import sample, text

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    kept = sample.hash_sample(ds, rate_permille=200, key_col="doc_id", seed=7)
    return kept.map_batches(
        text.token_count_batch, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "n_tokens"])


def q_text_stratified_sample(sf_dir: str):
    """Per-language quota sample (functions/sample.stratified_sample):
    the class-balanced subsetting step — membership = the 5 smallest
    (md5_number_upper(seed:doc_id), doc_id) rows per lang, a proper
    combiner plan (each batch emits <= 5 rows per lang, one groupby
    merges partials).  SQL mirror is a window row_number <= 5."""
    from rioxarray_ray.functions import sample

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    out = sample.stratified_sample(
        ds, group_col="lang", n_per_group=5, key_col="doc_id", seed=7
    )
    return out.select_columns(["lang", "doc_id"])


def q_text_token_topk(sf_dir: str):
    """Global top-50 token frequencies (functions/text.token_topk): the
    vocabulary heavy-hitter pipeline — per-batch value_counts partials,
    ONE Sum groupby over (token, count) rows, deterministic
    (cnt desc, token asc) tie-break at the k boundary."""
    from rioxarray_ray.functions import text

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["text"])
    return text.token_topk(ds, k=50)


def _ahash_media(sf_dir: str):
    """Shared synth for the image-dedup gates: one REAL PNG per doc
    (kernels/png.py encoder -> from-scratch decoder in the query path),
    closed-form pixels so DuckDB can regenerate the hash.  Docs come in
    near-dup groups of 3: base pattern v(i) = ((doc_id//3)*53 + i*i) % 256
    on a 1x16x16 grid; variants (doc_id%3 = 1, 2) flip one pixel
    (i = 37 / 74, +128 mod 256) so in-group aHash hamming is tiny."""
    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        from rioxarray_ray.kernels.png import encode_png

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.arange(256, dtype=np.int64)
        v = ((ids // 3)[:, None] * 53 + i[None, :] * i[None, :]) % 256
        for k in (1, 2):
            sel = ids % 3 == k
            v[sel, k * 37] = (v[sel, k * 37] + 128) % 256
        payloads = [
            encode_png(v[r].astype(np.uint8).reshape(1, 16, 16))
            for r in range(len(ids))
        ]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return ds.map_batches(to_media, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_image_ahash(sf_dir: str):
    """Perceptual 8x8 average-hash over real PNG bytes
    (functions/multimodal.ahash64): integer-exact bits (block_sum x area
    cross-multiplication), so the oracle regenerates the hash from the
    closed-form pixels entirely in SQL."""
    from rioxarray_ray.functions import multimodal

    hashed = multimodal.ahash_stage(_ahash_media(sf_dir), id_col="media_id")

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "ahash"])

    return hashed.map_batches(rename, batch_format="pyarrow")


def q_image_phash(sf_dir: str):
    """DCT perceptual hash (functions/multimodal.phash64 — the
    imagehash/imagededup standard, integerized: quantized 2^14 DCT
    basis + lower-median threshold, all integer).  Oracle: the SAME
    basis integers inlined as literals, the 64 low-frequency
    coefficients as SUM(t_u * v * t_v), and the rank-32 median replayed
    with a window — the hash must match bit for bit."""
    from rioxarray_ray.functions import multimodal

    hashed = multimodal.phash_stage(_ahash_media(sf_dir),
                                    id_col="media_id")

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["doc_id", "phash64"])

    return hashed.map_batches(rename, batch_format="pyarrow")


def q_image_near_dup(sf_dir: str):
    """Image near-duplicate pairs (functions/multimodal.image_near_dup):
    decode -> aHash actor pool -> certified banded hamming-LSH (the
    factored functions/dedup.banded_hamming_candidates plan).  Pixels
    never shuffle; the oracle mirrors segment bucketing + bit_count(xor)
    exactly (the dedup_simhash_pairs_md5 pattern)."""
    from rioxarray_ray.functions import multimodal

    pairs = multimodal.image_near_dup(
        _ahash_media(sf_dir), id_col="media_id", max_hamming=3, bands=4
    )
    return pairs


def q_image_near_dup_verify(sf_dir: str):
    """EXACT pixel verification of the image near-dup candidates
    (functions/multimodal.verify_mse_pairs — the image analogue of the
    text Jaccard verify): aHash-LSH pairs re-join the media payloads,
    decode, and compare by integer MSE numerators.  Oracle: the image
    pair CTE joined back to the closed-form pixel spec, SUM((va-vb)^2)
    per pair."""
    from rioxarray_ray.functions import multimodal

    media = _ahash_media(sf_dir).materialize()  # tiny; consumed 3x
    pairs = multimodal.image_near_dup(
        media, id_col="media_id", max_hamming=3, bands=4
    )
    return multimodal.verify_mse_pairs(pairs, media)


def q_image_dedup_apply(sf_dir: str):
    """APPLY the image dedup: connected components over the aHash
    banded-LSH pair list (pure composition of two gated operators —
    multimodal.image_near_dup edges into dedup.connected_components'
    min-label propagation), canonical = min media id per cluster.
    Oracle: recursive reachability CTE over the identical image-pair
    SQL."""
    from rioxarray_ray.functions import dedup, multimodal

    pairs = multimodal.image_near_dup(
        _ahash_media(sf_dir), id_col="media_id", max_hamming=3, bands=4
    )
    ids = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return dedup.connected_components(pairs, ids)


def q_multimodal_joint_near_dup(sf_dir: str):
    """Joint image+caption near-dup scoring — the cross-modal dedup shape
    of an image+caption corpus: aHash banded-LSH image pairs, then the
    exact caption word-trigram Jaccard computed per pair by joining the
    texts back (functions/dedup.verify_jaccard_pairs — two slim hash
    joins; the corpus text is never broadcast).  threshold=0 keeps every
    image pair so the output is a joint (image-similarity, caption-
    similarity) relation a filter composes over."""
    from rioxarray_ray.functions import dedup, multimodal

    pairs = multimodal.image_near_dup(
        _ahash_media(sf_dir), id_col="media_id", max_hamming=3, bands=4
    )
    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup.verify_jaccard_pairs(
        pairs, docs, threshold=0.0, ngram=3, num_partitions=8
    )


def q_text_repetition(sf_dir: str):
    """Gopher-style repetition statistics (functions/text.repetition_batch):
    duplicate-line counts/chars + top word-bigram frequency per document,
    all-integer outputs so the DuckDB mirror gates bit-exactly.  Pure
    map_batches — no shuffle."""
    from rioxarray_ray.functions import text

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(
        text.repetition_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return out.select_columns(
        ["doc_id", "n_lines", "n_distinct_lines", "line_chars",
         "dup_line_chars", "top_bigram_count", "n_bigrams"]
    )


def q_text_redact(sf_dir: str):
    """PII redaction (functions/text.redact_batch) — emails, IPv4 and
    phone numbers scrubbed by sequential vectorized RE2 rewrites.  The
    corpus text is augmented with deterministic doc_id-derived PII (both
    sides construct the same string) so every rule fires on every row;
    output = per-rule match counts + md5 of the redacted text, which the
    oracle mirrors with nested regexp_replace (same RE2 engine)."""
    import numpy as np

    from rioxarray_ray.functions import text as textmod
    from rioxarray_ray.functions._arrowbytes import utf8_views

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def augment(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids_s = pa.array(ids.astype(str), pa.string())
        mod7 = pa.array((ids % 7).astype(str), pa.string())
        mod256 = pa.array((ids % 256).astype(str), pa.string())
        aug = pc.binary_join_element_wise(
            pc.fill_null(batch["text"], ""), " contact user", ids_s, "@ex",
            mod7, ".com or +1 555 00", ids_s, " ip 10.0.", mod256, ".1 end",
            "",
        )
        return pa.table({"doc_id": batch["doc_id"], "text": aug})

    out = ds.map_batches(augment, batch_format="pyarrow",
                         zero_copy_batch=True).map_batches(
        textmod.redact_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def summarize(batch: pa.Table) -> pa.Table:
        import hashlib

        md5s = [
            hashlib.md5(v).hexdigest() for v in utf8_views(batch["clean"])
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_email": batch["n_email"],
                "n_ip": batch["n_ip"],
                "n_phone": batch["n_phone"],
                "clean_md5": pa.array(md5s, pa.string()),
            }
        )

    return out.map_batches(summarize, batch_format="pyarrow",
                           zero_copy_batch=True)


def q_text_decontaminate(sf_dir: str):
    """Benchmark decontamination (functions/text.decontaminate_stage):
    flags corpus documents sharing any 5-token gram with the benchmark
    subset (doc_id % 50 == 0 plays the eval suite).  The benchmark gram
    set broadcasts once via ray.put and membership is one vectorized
    pc.is_in per batch; the oracle rebuilds the same grams in SQL and
    LEFT JOINs against the distinct benchmark grams."""
    import ray

    from rioxarray_ray.functions import text as textmod

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def bench_only(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        keep = pc.equal(
            pc.subtract(ids, pc.multiply(pc.divide(ids, 50), 50)), 0
        )
        return batch.filter(keep)

    bench = ds.map_batches(bench_only, batch_format="pyarrow",
                           zero_copy_batch=True)
    grams = textmod.benchmark_ngrams(bench, n=5)
    ref = ray.put(grams)
    out = textmod.decontaminate_stage(ds, ref, n=5)
    return out.select_columns(
        ["doc_id", "n_grams", "n_contaminated", "contaminated"]
    )


def q_text_chunk(sf_dir: str):
    """Fixed-size token chunking with overlap (functions/text.chunk_batch)
    — the context-window prep of a RAG/pretraining pipeline.  Pure
    flat_map shape (no shuffle); one ragged-ranges gather + binary_join
    per batch; oracle rebuilds every chunk string and md5 in SQL."""
    from rioxarray_ray.functions import text as textmod

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: textmod.chunk_batch(b, size=32, overlap=8),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_text_doc_freq(sf_dir: str):
    """Corpus document-frequency table (functions/text.doc_frequency):
    per-batch dictionary-encoded (token, tf, df) partials, ONE Sum
    groupby — the inverted-index statistics step of TF-IDF."""
    from rioxarray_ray.functions import text

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return text.doc_frequency(ds, min_df=2)


def q_text_decontaminate_bloom(sf_dir: str):
    """Bloom-filter decontamination (functions/text.bloom_build +
    decontaminate_bloom_stage) — the scale path of text_decontaminate
    for when the benchmark gram set exceeds exact-broadcast size: a
    2^20-bit md5-keyed Bloom filter built distributively (distinct bit
    positions reduce; only the packed bitset crosses to ray.put),
    membership = all k=3 positions set.  DETERMINISTIC false positives
    (zero false negatives), so DuckDB replays every flag including the
    FPs — counts here are per DISTINCT (doc, gram) pair."""
    import ray

    from rioxarray_ray.functions import text

    M, K = 1 << 20, 3
    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def bench_grams(batch: pa.Table) -> pa.Table:
        mask = pa.array(
            batch["doc_id"].to_numpy(zero_copy_only=False) % 50 == 0
        )
        sub = batch.filter(mask)
        grams, _ = text._gram_windows(sub["text"], 5)
        return pa.table({"g": pc.unique(grams)})

    grams_ds = ds.map_batches(bench_grams, batch_format="pyarrow",
                              zero_copy_batch=True)
    bloom = text.bloom_build(grams_ds, m_bits=M, k=K)
    ref = ray.put(bloom)
    return text.decontaminate_bloom_stage(ds, ref, m_bits=M, k=K, n=5)


def q_embedding_quantize(sf_dir: str):
    """Per-vector symmetric int8 quantization
    (functions/ann.quantize_embeddings — the 4x ANN memory scale path),
    exploded to one row per coordinate so the gate checks EVERY code:
    DuckDB replays scale = list_max(|x|) and round_even(x/scale*127)
    from the same float32 values."""
    from rioxarray_ray.functions import ann

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
    qds = ann.quantize_embeddings(ds)

    def explode(batch: pa.Table) -> pa.Table:
        qcol = batch["q"]
        if isinstance(qcol, pa.ChunkedArray):
            qcol = qcol.combine_chunks()
        flat = pc.list_flatten(qcol).to_numpy(zero_copy_only=False)
        parents = pc.list_parent_indices(qcol).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        offs = np.zeros(len(parents), dtype=np.int64)
        if len(parents):
            # dim index = position within the row's list
            starts = np.nonzero(np.diff(parents, prepend=-1))[0]
            offs = np.arange(len(parents)) - starts[
                np.searchsorted(starts, np.arange(len(parents)),
                                side="right") - 1
            ]
        vid = batch["vec_id"].take(pa.array(parents, pa.int64()))
        sc = batch["scale"].take(pa.array(parents, pa.int64()))
        return pa.table(
            {
                "vec_id": vid,
                "dim": pa.array(offs, pa.int64()),
                "qv": pa.array(flat.astype(np.int64), pa.int64()),
                "scale": sc,
            }
        )

    return qds.map_batches(explode, batch_format="pyarrow")


def q_ann_topk_int8(sf_dir: str):
    """Quantized maximum-inner-product top-k (functions/ann
    .topk_int8_dot): corpus codes quantized in-stream, integer dot
    products, combiner top-k — the memory-bound quantized-ANN scan,
    int64-exact so DuckDB replays rank and score bit-for-bit (unlike
    float cosine rescaling).  Same query set as ann_topk."""
    from rioxarray_ray.functions import ann

    ds = _read_pq(f"{sf_dir}/embeddings.parquet")
    qdf = (
        _read_pq(f"{sf_dir}/embeddings.parquet")
        .map_batches(
            lambda b: b.filter(
                pa.array(b["vec_id"].to_numpy(zero_copy_only=False) % 50 == 0)
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
    )
    qtab = ann.quantize_embeddings_table(
        pa.Table.from_pandas(qdf[["vec_id", "embedding"]])
    )
    qcodes = np.asarray(
        [np.asarray(v, dtype=np.int64) for v in qtab["q"].to_pylist()]
    )
    out = ann.topk_int8_dot(
        ds, qtab["vec_id"].to_numpy(zero_copy_only=False), qcodes, k=_ANN_K
    )
    return out.select_columns(["query_id", "vec_id", "rank", "dot"])


def q_text_weighted_sample(sf_dir: str):
    """Corpus mixing (functions/sample.weighted_sample): per-source
    keep-rates in one deterministic pass — the data-mixture step of a
    pre-training pipeline.  Membership = the hash_sample md5 rule per
    group, so DuckDB replays every kept row; sources outside the rate
    table fall back to the default rate (exercised: src4 absent)."""
    from rioxarray_ray.functions import sample

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["doc_id", "source", "n_chars"])
    rates = {"src0": 1000, "src1": 600, "src2": 300, "src3": 50}
    return sample.weighted_sample(ds, rates, group_col="source",
                                  key_col="doc_id", seed=7,
                                  default_permille=150)


def q_text_tfidf_search(sf_dir: str):
    """Keyword relevance ranking (functions/text.tfidf_search): top-25
    docs by the integer-exact tf-idf surrogate
    score = sum_t tf * ((N*1000) // df(t)) over a fixed 3-term query.
    Plan: one tiny df aggregate over the query vocabulary (broadcast),
    streaming scorer with score>0 pushdown, combiner top-k — no full
    sort.  Oracle ranks with a SQL window over the same integer score."""
    from rioxarray_ray.functions import text

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return text.tfidf_search(ds, terms=("merge", "window", "hash"), k=25)


def q_text_bm25(sf_dir: str):
    """Okapi BM25 ranking (functions/text.bm25_search, k1=1.2 b=0.75 as
    exact integer rationals): top-25 docs for the same fixed 3-term
    query as tfidf_search — document-length normalization folded in by
    cross-multiplication, every quantity integer.  Oracle replays the
    identical floor-division chain in a SQL window."""
    from rioxarray_ray.functions import text

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return text.bm25_search(ds, terms=("merge", "window", "hash"), k=25)


def q_text_collocations(sf_dir: str):
    """Top-25 word-bigram collocations by the integer-exact PMI
    surrogate (functions/text.collocations): score =
    (c12 * N * 1000) // (c1 * c2), c12 >= 5, ties to the smaller
    bigram.  Oracle replays counts, the prune and the floor chain in a
    SQL window."""
    from rioxarray_ray.functions import text

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return text.collocations(ds, k=25, min_count=5)


def q_text_fluency(sf_dir: str):
    """Per-doc bigram-LM fluency (functions/text.fluency — the
    integer-exact CCNet/Gopher perplexity-filter analogue):
    fluency_sum = sum over the doc's bigram occurrences of
    (c12 * 1000) // c1.  Oracle replays corpus stats, the joins and the
    floor chain per document."""
    from rioxarray_ray.functions import text

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return text.fluency(ds)


def q_text_pack(sf_dir: str):
    """Sequence-packing offsets (functions/text.pack_sequences — GPT
    concat-then-cut): global token offset per doc via a distributed
    exclusive scan (deterministic doc-id bucketing; the only driver
    state is the tiny per-bucket total table), plus the training
    sequence span each doc lands in.  Oracle: SUM() OVER (ORDER BY
    doc_id) exclusive window + the same floor arithmetic."""
    from rioxarray_ray.functions import text

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return text.pack_sequences(ds, seq_len=512, bucket_size=64)


def q_text_rarest_term(sf_dir: str):
    """Most distinctive token per document (functions/text.rarest_term):
    distinct (doc, token) explode -> native hash join to the df table ->
    grouped top-1 by (df asc, token asc).  The integer-exact core of
    TF-IDF ranking, mirrored by a window-ranked SQL oracle."""
    from rioxarray_ray.functions import text

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return text.rarest_term(ds, num_partitions=8)


def q_text_ngram_jaccard(sf_dir: str):
    """Exact word-trigram Jaccard for consecutive-id doc pairs — gives the
    n-gram-Jaccard kernel its own exact SQL oracle (the LSH candidate path
    feeds the same kernel through verify_jaccard_pairs)."""
    from rioxarray_ray.functions import dedup

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dedup.ngram_jaccard_pairs(ds, ngram=3, num_partitions=8)


def q_dedup_simhash(sf_dir: str):
    """64-bit SimHash signatures (rows-only gate; the signature kernel is
    pytest-verified: tests/test_functions.py::test_simhash_similar_docs_close_hamming
    and the banded certification in ::test_simhash_banded_candidates_certified)."""
    from rioxarray_ray.functions import dedup

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(
        dedup.simhash_batch, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "simhash"])


def q_dedup_simhash_pairs(sf_dir: str):
    """Banded SimHash near-dup candidates (certified: every hamming<=3
    pair shares an exact 16-bit band by pigeonhole) — rows-only gate;
    the certification is pytest-verified."""
    from rioxarray_ray.functions import dedup

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dedup.simhash_candidates(ds, max_hamming=3, bands=4)


def q_dedup_minhash(sf_dir: str):
    """Banded MinHash-LSH near-dup candidates (rows-only gate; the planted
    near-duplicate oracle lives in
    tests/test_functions.py::test_minhash_lsh_finds_near_duplicates)."""
    from rioxarray_ray.functions import dedup

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dedup.minhash_candidates(ds, num_perm=64, bands=16)


def q_dedup_minhash_md5(sf_dir: str):
    """Oracle-gated twin of ``dedup_minhash``: SAME pipeline (band rows ->
    capped bucket collect -> pair expansion -> dedup), only the gram-hash
    kernel swapped to md5 (= DuckDB ``md5_number_upper``) so the full LSH
    banding — signatures, rolling-poly band buckets, candidate pairs — is
    replicated bit-exactly by the SQL oracle.  Plan equivalence: the fast
    rolling-poly mode shares every line of pipeline code with this one."""
    from rioxarray_ray.functions import dedup

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dedup.minhash_candidates(
        ds, num_perm=64, bands=16, gram_hash="md5"
    )


def q_dedup_clusters(sf_dir: str):
    """Connected-components dedup clustering, oracle-gated end-to-end.
    Edges = the md5 MinHash-LSH candidate pairs (the same pipeline the
    dedup_minhash_md5 oracle replicates bit-exactly); the distributed
    min-label propagation (functions/dedup.py connected_components — one
    hash join + one groupby-min per round, no driver hop) must converge
    to the same (doc_id, cluster_id, keep) relation DuckDB derives with a
    recursive reachability CTE over the identical edge SQL."""
    from rioxarray_ray.functions import dedup

    docs = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = dedup.minhash_candidates(
        docs, num_perm=64, bands=16, gram_hash="md5"
    )
    return dedup.connected_components(pairs, docs)


def q_dedup_apply(sf_dir: str):
    """APPLY the dedup: one canonical representative per duplicate
    cluster, keep-rule = longest doc (n_chars), tie -> smallest doc_id —
    the step that turns cluster labels into the deduplicated corpus.
    Pure composition of gated operators: md5-MinHash candidates ->
    distributed connected components -> Ray native hash join to doc
    metadata -> grouped top-1 (functions/agg.topk_per_group).  Oracle
    extends the dedup_clusters recursive CTE with the same window rule."""
    from rioxarray_ray.functions import agg, dedup

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    pairs = dedup.minhash_candidates(
        docs, num_perm=64, bands=16, gram_hash="md5"
    )
    cc = dedup.connected_components(pairs, docs)
    meta = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "n_chars"])
    joined = cc.join(meta, "inner", 8, on=("doc_id",))
    best = agg.topk_per_group(
        joined, group_col="cluster_id", order_col="n_chars", k=1,
        descending=True, tiebreak_col="doc_id",
    )
    return best.select_columns(["cluster_id", "doc_id", "n_chars"])


def q_dedup_chunks(sf_dir: str):
    """Chunk-granularity exact dedup (functions/dedup.chunk_dedup — the
    RefinedWeb/FineWeb line-level dedup shape): per-doc counts of chunks
    and of chunks this doc canonically OWNS (min (doc_id, chunk_id) per
    chunk md5 corpus-wide).  EXACT SQL oracle: the text_chunk CTE chain
    rebuilds every chunk string + md5, then the same packed-min /
    COALESCE-left-join arithmetic."""
    from rioxarray_ray.functions import dedup

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup.chunk_dedup(docs, size=32, overlap=8)


def q_dedup_spans(sf_dir: str):
    """Exact duplicated-substring spans (functions/dedup.duplicate_spans
    — the Lee et al. 2022 suffix-array exact-substring dedup recast as
    three slim exchanges): per-doc maximal token spans covered by
    8-grams occurring >= 2 times anywhere in the corpus.  EXACT SQL
    oracle: the same [a-z']+ tokenize, LATERAL k-gram enumeration,
    HAVING-count repeat set, and gaps-and-islands merge in DuckDB."""
    from rioxarray_ray.functions import dedup

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return dedup.duplicate_spans(docs, k=8, min_count=2)


def q_dedup_simhash_md5(sf_dir: str):
    """Oracle-gated twin of ``dedup_simhash``: md5 gram hashes make the
    64-bit Charikar signature SQL-replicable (per-bit vote = signed sum
    over gram occurrences, mirrored with a 64-row bits cross join)."""
    from rioxarray_ray.functions import dedup
    import functools

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    fn = functools.partial(dedup.simhash_batch, gram_hash="md5")
    return ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "simhash"])


def q_dedup_simhash_pairs_md5(sf_dir: str):
    """Oracle-gated twin of ``dedup_simhash_pairs``: banded hamming-LSH
    candidates over md5-gram simhashes; the oracle replicates segment
    bucketing and verifies hamming via ``bit_count(xor(...))``."""
    from rioxarray_ray.functions import dedup

    ds = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return dedup.simhash_candidates(
        ds, max_hamming=3, bands=4, gram_hash="md5"
    )


def q_embedding_near_dup(sf_dir: str):
    """GATED SCALE PLAN: exact distributed block-pair cosine join — no
    driver collect, no whole-corpus broadcast (round-1 verdict item #1)."""
    from rioxarray_ray.functions import ann

    ds = _read_pq(f"{sf_dir}/embeddings.parquet")
    out = ann.blocked_cosine_pairs(ds, threshold=_NEAR_DUP_TAU, n_blocks=8)
    return out.select_columns(["vec_a", "vec_b"])


def q_embedding_near_dup_bcast(sf_dir: str):
    """Plan-equivalence twin: O(n^2) broadcast brute force against the SAME
    oracle (the geo_pip_rect/geo_pip_shuffle pattern)."""
    from rioxarray_ray.functions import ann

    ds = _read_pq(f"{sf_dir}/embeddings.parquet")
    all_rows = _read_pq(
        f"{sf_dir}/embeddings.parquet"
    ).to_pandas()
    out = ann.exact_cosine_pairs(
        ds,
        all_rows["vec_id"].to_numpy(),
        np.asarray(all_rows["embedding"].to_list(), dtype=np.float64),
        threshold=_NEAR_DUP_TAU,
    )
    return out.select_columns(["vec_a", "vec_b"])


def q_embedding_kmedians(sf_dir: str):
    """Distributed k-medians clustering (functions/cluster.kmedians) —
    2 assignment passes + 1 median update over the embeddings table,
    integer-exact by construction (x2-scaled quantization makes every
    median an integer; L1 distances are integers), so the DuckDB oracle
    replays the whole iteration bit for bit: same seeds (k smallest
    vec_ids), same argmin tie rule, same empty-cluster carry."""
    from rioxarray_ray.functions import cluster

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
    return cluster.kmedians(ds, k=8, iters=2)


def q_embedding_sketch(sf_dir: str):
    """Deterministic ±1 signed-projection sketch (functions/cluster.
    signed_projection_batch) — 64-dim quantized embeddings down to 16
    integer coordinates in one int64 matmul per batch; the oracle
    recomputes every coordinate as SUM(w * sign) with the same closed-form
    product-hash sign matrix."""
    from rioxarray_ray.functions import cluster

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
    return ds.map_batches(
        cluster.signed_projection_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_ann_topk(sf_dir: str):
    from rioxarray_ray.functions import ann

    ds = _read_pq(f"{sf_dir}/embeddings.parquet")
    qdf = (
        _read_pq(f"{sf_dir}/embeddings.parquet")
        .map_batches(
            lambda b: b.filter(
                pa.array(b["vec_id"].to_numpy(zero_copy_only=False) % 50 == 0)
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .to_pandas()
    )
    out = ann.topk_cosine(
        ds,
        qdf["vec_id"].to_numpy(),
        np.asarray(qdf["embedding"].to_list(), dtype=np.float64),
        k=_ANN_K,
    )
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_ann_topk_blocked(sf_dir: str):
    """GATED SCALE PLAN: blocked cross-join exact top-k — the query set
    stays a Dataset (no driver collect, no broadcast matrix); same oracle
    as ann_topk (plan equivalence)."""
    from rioxarray_ray.functions import ann

    ds = _read_pq(f"{sf_dir}/embeddings.parquet")
    queries_ds = _read_pq(f"{sf_dir}/embeddings.parquet").map_batches(
        lambda b: b.filter(
            pa.array(b["vec_id"].to_numpy(zero_copy_only=False) % 50 == 0)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = ann.blocked_topk_cosine(
        ds, queries_ds, k=_ANN_K, n_query_blocks=4, n_data_blocks=4
    )
    return out.select_columns(["query_id", "vec_id", "rank"])


def _ann_queries_ds(sf_dir: str):
    """The standard gate query set (vec_id % 50 == 0) as a DATASET — the
    IVF plan never collects queries driver-side."""
    return _read_pq(f"{sf_dir}/embeddings.parquet").map_batches(
        lambda b: b.filter(
            pa.array(b["vec_id"].to_numpy(zero_copy_only=False) % 50 == 0)
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_ann_topk_ivf(sf_dir: str):
    """IVF approximate top-k (recall/throughput tradeoff — rows-only gate;
    the recall bound vs the exact plan is asserted in pytest).  Queries
    stay a Dataset (round-3 verdict item #3)."""
    from rioxarray_ray.functions import ann

    ds = _read_pq(f"{sf_dir}/embeddings.parquet")
    out = ann.ivf_topk(
        ds, _ann_queries_ds(sf_dir), k=_ANN_K, n_centroids=16, nprobe=4
    )
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_ann_topk_ivf_exhaustive(sf_dir: str):
    """GATED: IVF with nprobe == n_centroids is an exhaustive probe —
    every (query, vector) pair meets in exactly one bucket group, so the
    result equals exact top-k; gated against the SAME oracle as ann_topk
    (plan equivalence, the geo_pip_rect/geo_pip_shuffle pattern)."""
    from rioxarray_ray.functions import ann

    ds = _read_pq(f"{sf_dir}/embeddings.parquet")
    out = ann.ivf_topk(
        ds, _ann_queries_ds(sf_dir), k=_ANN_K, n_centroids=16, nprobe=16
    )
    return out.select_columns(["query_id", "vec_id", "rank"])


def q_events_approx_distinct(sf_dir: str):
    """HyperLogLog register table for COUNT(DISTINCT user_id)
    (functions/sketch.hll_registers, p=12): per-batch partial maxima
    (<= 4096 rows leave a batch of ANY size) merged by one
    groupby(register) Max.  The md5-based hash makes the whole sketch a
    deterministic function of the distinct key set, so DuckDB replays
    every register's max rank exactly — the float estimate stays out of
    the gate (pytest bounds it against the exact count instead)."""
    from rioxarray_ray.functions import sketch

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id"])
    return sketch.hll_registers(ds, "user_id", p=12)


def q_events_cms(sf_dir: str):
    """Count-Min sketch of per-user event frequencies
    (functions/sketch.cms_build, width 1024 x depth 3): per-batch
    partial cell counts merged by one (row, col) groupby Sum — the
    approximate-frequency companion of the HLL gate.  Deterministic
    given the md5 hash convention, so DuckDB rebuilds every occupied
    cell exactly; point-query bounds are pytest-verified."""
    from rioxarray_ray.functions import sketch

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id"])
    return sketch.cms_build(ds, "user_id", width=1024, depth=3)


def q_events_funnel(sf_dir: str):
    """Funnel analysis signup -> click -> purchase
    (functions/events.funnel): per user, first-touch step times with
    MIN-based semantics (t_k = min ts of step k at/after t_{k-1}) — a
    pure function of the event multiset, so ties and arrival order
    cannot change it and DuckDB replays it exactly.  One groupby(user)
    co-shuffle, vectorized per group."""
    from rioxarray_ray.functions import events

    ds = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_type"])
    return events.funnel(ds)


def q_events_retention(sf_dir: str):
    """Cohort retention triangle (functions/events.retention): users
    cohorted by the day-bucket of their first signup; n_users active k
    days after their anchor.  Slim-relation plan: distinct
    (user, bucket) via a keyed groupby combiner, hash join to the
    anchor table, one (cohort, k) count.  Day buckets are positive
    epoch-micro floor divisions on both sides."""
    from rioxarray_ray.functions import events

    ds = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_type"])
    return events.retention(ds, anchor_type="signup", bucket_hours=24)


def q_events_topk_per_user(sf_dir: str):
    """Top-3 events per user by value (functions/agg.topk_per_group):
    the generic window row_number()<=k shape as a COMBINER plan — each
    batch emits <= k rows per user, ONE groupby merges partials.  Pure
    ordering, no arithmetic, so the double column gates bit-exactly."""
    from rioxarray_ray.functions import agg

    ds = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_id", "value"])
    out = agg.topk_per_group(
        ds, group_col="user_id", order_col="value", k=3,
        descending=True, tiebreak_col="event_id",
    )
    return out.select_columns(["user_id", "event_id", "value"])


def q_events_window(sf_dir: str):
    from rioxarray_ray.functions import events

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return events.tumbling_window(ds, unit="hour")


def q_events_window_hopping(sf_dir: str):
    """Hopping windows (3h size, 1h hop): every event counted in 3
    overlapping windows; oracle = the same 3-offset fan-out in SQL."""
    from rioxarray_ray.functions import events

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return events.hopping_window(ds, size_hours=3, hop_hours=1)


def q_events_sessionize(sf_dir: str):
    from rioxarray_ray.functions import events

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return events.sessionize(ds, gap_minutes=30)


def q_events_sessionize_scalable(sf_dir: str):
    """GATED SCALE PLAN: two-phase (user, time-bucket) sessionization —
    skew-safe per-reducer memory; same oracle as events_sessionize."""
    from rioxarray_ray.functions import events

    ds = _read_pq(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return events.sessionize_scalable(ds, gap_minutes=30, bucket_hours=24)


def q_agg_pricing(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    return ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Count(alias_name="n"),
    )


def q_geo_equalize(sf_dir: str):
    """Per-image histogram equalization (stages/stats.equalize_stage):
    image-global CDF remap, ONE groupby(image_id) co-shuffle, per-band
    LUT via unique+cumsum, searchsorted apply.  Projected to per-(tile,
    band) counts + eq-value sums + position-weighted sums.  EXACT SQL
    oracle: DuckDB rebuilds cnt_le with a cumulative window over the
    regenerated pixel spec and replays the same integer floor-div
    remap.  doc_id < 64 bounds the regeneration."""
    from rioxarray_ray.stages import stats as sstage

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 64)
    eq = sstage.equalize_stage(small, levels=255, fill=-1)

    def summarize(batch: pa.Table) -> pa.Table:
        from rioxarray_ray.stages.schema import pixel_views

        out: dict[str, list] = {
            "image_id": [], "tile_row": [], "tile_col": [],
            "band": [], "n": [], "esum": [], "ewsum": [],
        }
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            h, w = px.shape[1], px.shape[2]
            rr, cc = np.meshgrid(
                np.arange(h, dtype=np.int64),
                np.arange(w, dtype=np.int64),
                indexing="ij",
            )
            wt = 1 + (rr * 64 + cc) % 97
            for b in range(px.shape[0]):
                band = px[b].astype(np.int64)
                m = band != -1
                if not m.any():
                    continue
                out["image_id"].append(r["image_id"])
                out["tile_row"].append(int(r["tile_row"]))
                out["tile_col"].append(int(r["tile_col"]))
                out["band"].append(b)
                out["n"].append(int(m.sum()))
                out["esum"].append(int(band[m].sum()))
                out["ewsum"].append(int((band[m] * wt[m]).sum()))
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "tile_row": pa.array(out["tile_row"], pa.int64()),
                "tile_col": pa.array(out["tile_col"], pa.int64()),
                "band": pa.array(out["band"], pa.int64()),
                "n": pa.array(out["n"], pa.int64()),
                "esum": pa.array(out["esum"], pa.int64()),
                "ewsum": pa.array(out["ewsum"], pa.int64()),
            }
        )

    return eq.map_batches(summarize, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_agg_revenue_nation(sf_dir: str):
    """TPC-H-Q5-shaped multiway join: lineitem ⋈ orders ⋈ customer via
    native hash joins (pruned columns only — no payload beyond the join
    keys and the two revenue terms), then the 25-row nation table
    BROADCAST as a plain dict inside map_batches (never shuffled), then
    ONE groupby(nation) Sum.  Revenue is integer-exact:
    cents(ep) * (100 - pct(discount)) summed as BIGINT, so the gate is
    order-independent."""
    from ray.data.aggregate import Count, Sum

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def li_project(batch: pa.Table) -> pa.Table:
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.rint(ep * 100).astype(np.int64) * (
            100 - np.rint(dc * 100).astype(np.int64)
        )
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "revenue_u": pa.array(rev, pa.int64()),
            }
        )

    li = li.map_batches(li_project, batch_format="pyarrow",
                        zero_copy_batch=True)
    orders = _read_pq(f"{sf_dir}/orders.parquet",
                      columns=["o_orderkey", "o_custkey"])
    cust = _read_pq(f"{sf_dir}/customer.parquet",
                    columns=["c_custkey", "c_nationkey"])
    j = li.join(orders, "inner", 8,
                on=("l_orderkey",), right_on=("o_orderkey",))
    j = j.join(cust, "inner", 8,
               on=("o_custkey",), right_on=("c_custkey",))

    import pandas as pd

    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    n_name = dict(zip(nation["n_nationkey"].astype(int),
                      nation["n_name"]))

    def with_nation(batch: pa.Table) -> pa.Table:
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "nation": pa.array([n_name[int(k)] for k in nk],
                                   pa.string()),
                "revenue_u": batch["revenue_u"],
            }
        )

    out = (
        j.map_batches(with_nation, batch_format="pyarrow",
                      zero_copy_batch=True)
        .groupby("nation")
        .aggregate(Sum("revenue_u", alias_name="revenue_u"),
                   Count(alias_name="n_items"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "nation": batch["nation"],
                "revenue_u": pc.cast(batch["revenue_u"], pa.int64()),
                "n_items": pc.cast(batch["n_items"], pa.int64()),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def q_geo_band_stats(sf_dir: str):
    """Corpus-wide per-band normalization statistics
    (stages/stats.band_stats_stage): integer-exact n/sum/sum-of-squares
    of valid pixels, combiner-before-shuffle (pixels never shuffle).
    EXACT SQL oracle over the regenerated pixel spec; doc_id < 96
    bounds the regeneration."""
    from rioxarray_ray.stages import stats as sstage

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 96)
    out = sstage.band_stats_stage(small, concurrency=4)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "band": pc.cast(batch["band"], pa.int64()),
                "n": pc.cast(batch["n"], pa.int64()),
                "s1": pc.cast(batch["s1"], pa.int64()),
                "s2": pc.cast(batch["s2"], pa.int64()),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def q_geo_zorder_layout(sf_dir: str):
    """Z-order (Morton) layout sort — the space-filling-curve clustering
    order for output files (Delta/Iceberg Z-ORDER analogue;
    kernels/cellindex.morton bit-interleaves the res-10 cell row/col).
    The real pipeline sorts tiles by this key before write_parquet so
    spatially adjacent tiles land in the same file; the gate takes the
    first 512 tiles of the global order (deterministic tie-break) and
    checks every rank — Ray's range-partitioned ds.sort vs DuckDB's
    row_number over the same interleave arithmetic."""
    from rioxarray_ray.kernels import cellindex

    tiles = _tiles_4326(sf_dir)

    def with_z(batch: pa.Table) -> pa.Table:
        z = cellindex.morton(
            batch["cell"].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {
                "z": pa.array(z, pa.int64()),
                "image_id": batch["image_id"],
                "tile_row": pc.cast(batch["tile_row"], pa.int64()),
                "tile_col": pc.cast(batch["tile_col"], pa.int64()),
            }
        )

    ordered = (
        tiles.map_batches(with_z, batch_format="pyarrow",
                          zero_copy_batch=True)
        .sort(["z", "image_id", "tile_row", "tile_col"])
        .limit(512)
        .repartition(1)
    )

    def rank(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "rank", pa.array(np.arange(1, batch.num_rows + 1), pa.int64())
        )

    # single 512-row block after limit+repartition(1): the arange rank
    # is the global rank (batch_size=None => whole-block batches)
    return ordered.map_batches(rank, batch_format="pyarrow",
                               batch_size=None)


def q_text_shuffle(sf_dir: str):
    """Deterministic pretraining-order shuffle
    (functions/sample.deterministic_shuffle): range-partitioned
    distributed sort on the content-stable md5 rank — reproducible
    epoch shuffling with no RNG state.  The gate takes the first 512
    docs of the global order and checks EVERY rank (same pattern as
    geo_zorder_layout) against DuckDB's row_number over
    md5_number_upper."""
    from rioxarray_ray.functions import sample

    ds = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ordered = (
        sample.deterministic_shuffle(ds, key_col="doc_id", seed=7)
        .limit(512)
        .repartition(1)
    )

    def rank(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "rank": pa.array(
                    np.arange(1, batch.num_rows + 1), pa.int64()
                ),
            }
        )

    # single 512-row block after limit+repartition(1): arange = global rank
    return ordered.map_batches(rank, batch_format="pyarrow",
                               batch_size=None)


def q_embedding_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic near-dup (functions/cluster.
    semantic_dedup_pairs): k-medians clustering first, then
    cosine>=tau pairs ONLY within each cluster — the approximate plan
    that collapses all-pairs to within-cluster pairs.  EXACT SQL
    oracle by composition: the kmedians oracle CTE reproduces the
    cluster assignment bit-for-bit, then a literal within-cluster
    cosine join."""
    from rioxarray_ray.functions import cluster

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
    return cluster.semantic_dedup_pairs(
        ds, threshold=_NEAR_DUP_TAU, k=8, iters=2
    )


def q_geo_region_label(sf_dir: str):
    """Connected-region labeling of the threshold classification
    (stages/stats.region_label_stage — the GDAL polygonize/sieve
    interior step; contour_edges extracts the same classification's
    boundaries).  ONE groupby(image_id) co-shuffle, vectorized
    min-propagation with pointer jumping inside the task.  EXACT SQL
    oracle: 20 unrolled hop+jump rounds over the pixel adjacency graph
    converge to the same schedule-independent min-index fixpoint;
    per-region area/bbox/weighted checksums compare."""
    from rioxarray_ray.stages import stats as sstage

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 8)
    return sstage.region_label_stage(small, threshold=120)


def q_geo_sieve(sf_dir: str):
    """GDAL SieveFilter semantics (stages/stats.sieve_stage): foreground
    regions of the threshold classification smaller than min_size
    connected pixels are masked to nodata; everything else passes
    through bit-unchanged.  Same ONE-groupby(image_id) shape as
    region_label_stage.  EXACT SQL oracle: run-length CCL components
    (shared CTE chain with geo_region_label), the < min_size regions
    subtracted, and the per-(image, band, 64-window) BIGINT checksum +
    count of the SURVIVING valid pixels compared."""
    from rioxarray_ray.kernels.nodata import valid_mask
    from rioxarray_ray.stages import stats as sstage
    from rioxarray_ray.stages.schema import pixel_views

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 8)
    sieved = sstage.sieve_stage(small, threshold=120, min_size=100)

    def summarize(batch: pa.Table) -> pa.Table:
        out = []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            vm = valid_mask(px, r["nodata"])
            for b in range(px.shape[0]):
                n_valid = int(vm[b].sum())
                if n_valid == 0:
                    continue
                out.append(
                    {
                        "image_id": r["image_id"],
                        "band": b,
                        "win_row_off": int(r["win_row_off"]),
                        "win_col_off": int(r["win_col_off"]),
                        "checksum": int(px[b].astype(np.int64)[vm[b]].sum()),
                        "n_valid": n_valid,
                    }
                )
        return pa.Table.from_pylist(out)

    return sieved.map_batches(summarize, batch_format="pyarrow")


def q_geo_focal_mode(sf_dir: str):
    """Focal MAJORITY filter (stages/focal.focal_mode_stage — the
    categorical-smoothing focal statistic: windowed most-frequent valid
    value, ties to the smallest), zero-shuffle over halo'd tiles.  EXACT
    SQL oracle: the focal-mean shift->groupby pattern extended with a
    per-(pixel, value) count and a (count DESC, value ASC) window rank;
    per-(image, band) integer checksums incl. position-weighted."""
    from rioxarray_ray.pipelines import flagship as fpipe
    from rioxarray_ray.stages import decode as dstage
    from rioxarray_ray.stages import focal as fstage
    from rioxarray_ray.stages import tile as tstage

    n = min(_ndocs(sf_dir), 16)
    ds = fpipe.read_corpus(n, override_num_blocks=8)

    def keep(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx % 7 != 6))

    small = ds.map_batches(keep, batch_format="pyarrow",
                           zero_copy_batch=True)
    tiles = tstage.tile_stage(
        dstage.decode_stage(small), tile_size=_TILE, cell_res=_CELL_RES,
        halo=1,
    )
    rows = fstage.focal_mode_stage(tiles, radius=1)

    def summarize(batch: pa.Table) -> pa.Table:
        out = {"image_id": [], "band": [], "n_valid": [], "sum_mode": [],
               "wsum_mode": [], "sum_nmodal": []}
        ids = batch["image_id"].to_pylist()
        bands = batch["band"].to_numpy(zero_copy_only=False)
        ro = batch["win_row_off"].to_numpy(zero_copy_only=False)
        co = batch["win_col_off"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        ws = batch["w"].to_numpy(zero_copy_only=False)
        mc = batch["mode"].combine_chunks()
        nc = batch["n_modal"].combine_chunks()
        vc = batch["valid"].combine_chunks()
        for i in range(batch.num_rows):
            h, w = int(hs[i]), int(ws[i])
            m = np.asarray(mc[i].values, np.int64).reshape(h, w)
            nm = np.asarray(nc[i].values, np.int64).reshape(h, w)
            v = np.asarray(vc[i].values, bool).reshape(h, w)
            gr = np.arange(h, dtype=np.int64)[:, None] + int(ro[i])
            gc = np.arange(w, dtype=np.int64)[None, :] + int(co[i])
            wgt = (gr * 1315423911 + gc * 2654435761) % 1000003
            out["image_id"].append(ids[i])
            out["band"].append(int(bands[i]))
            out["n_valid"].append(int(v.sum()))
            out["sum_mode"].append(int(m[v].sum()))
            out["wsum_mode"].append(int((m[v] * wgt[v]).sum()))
            out["sum_nmodal"].append(int(nm[v].sum()))
        return pa.Table.from_pydict(
            {k: pa.array(out[k],
                         pa.string() if k == "image_id" else pa.int64())
             for k in out}
        )

    from ray.data.aggregate import Sum

    partial = rows.map_batches(summarize, batch_format="pyarrow",
                               zero_copy_batch=True)
    return partial.groupby(["image_id", "band"]).aggregate(
        Sum("n_valid", alias_name="n_valid"),
        Sum("sum_mode", alias_name="sum_mode"),
        Sum("wsum_mode", alias_name="wsum_mode"),
        Sum("sum_nmodal", alias_name="sum_nmodal"),
    )


def q_geo_percentile_stretch(sf_dir: str):
    """Percentile contrast stretch (stages/stats.percentile_stretch_stage
    — the 2-98%% cumulative-count-cut normalization, integerized with
    percentile_disc rank bounds).  Same ONE-groupby(image_id) shape and
    oracle pattern as geo_equalize: DuckDB derives the rank bounds from
    a cumulative window and replays the clip((v-lo)*255//(hi-lo))
    floor-division chain per pixel."""
    from rioxarray_ray.kernels.nodata import valid_mask
    from rioxarray_ray.stages import stats as sstage
    from rioxarray_ray.stages.schema import pixel_views

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 64)
    out = sstage.percentile_stretch_stage(small, lo_permille=20,
                                          hi_permille=980)

    def summarize(batch: pa.Table) -> pa.Table:
        rows = []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            vm = valid_mask(px, r["nodata"])
            for b in range(px.shape[0]):
                m = vm[b]
                if not m.any():
                    continue
                wt = 1 + ((np.arange(px.shape[1])[:, None] % 64) * 64
                          + (np.arange(px.shape[2])[None, :] % 64)) % 97
                v = px[b].astype(np.int64)
                rows.append(
                    {
                        "image_id": r["image_id"],
                        "tile_row": int(r["tile_row"]),
                        "tile_col": int(r["tile_col"]),
                        "band": b,
                        "n": int(m.sum()),
                        "ssum": int(v[m].sum()),
                        "swsum": int((v[m] * wt[m]).sum()),
                    }
                )
        return pa.Table.from_pylist(rows)

    return out.map_batches(summarize, batch_format="pyarrow")


def q_geo_terrain_indices(sf_dir: str):
    """gdaldem TRI / TPI / roughness (stages/focal.terrain_indices_stage
    — the remaining gdaldem modes; integer-exact numerators over the
    full-3x3-valid interior).  EXACT SQL oracle: center-joined shifted
    pixels with a HAVING count-9 interior rule; per-(image, band) BIGINT
    sums + a position-weighted TRI sum."""
    from rioxarray_ray.pipelines import flagship as fpipe
    from rioxarray_ray.stages import decode as dstage
    from rioxarray_ray.stages import focal as fstage
    from rioxarray_ray.stages import tile as tstage

    n = min(_ndocs(sf_dir), 16)
    ds = fpipe.read_corpus(n, override_num_blocks=8)

    def keep(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx % 7 != 6))

    small = ds.map_batches(keep, batch_format="pyarrow",
                           zero_copy_batch=True)
    tiles = tstage.tile_stage(
        dstage.decode_stage(small), tile_size=_TILE, cell_res=_CELL_RES,
        halo=1,
    )
    rows = fstage.terrain_indices_stage(tiles)

    def summarize(batch: pa.Table) -> pa.Table:
        out = {"image_id": [], "band": [], "n_defined": [],
               "sum_tri": [], "wsum_tri": [], "sum_tpi": [],
               "sum_rough": []}
        ids = batch["image_id"].to_pylist()
        bands = batch["band"].to_numpy(zero_copy_only=False)
        ro = batch["win_row_off"].to_numpy(zero_copy_only=False)
        co = batch["win_col_off"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        ws = batch["w"].to_numpy(zero_copy_only=False)
        tric = batch["tri_sum"].combine_chunks()
        tpic = batch["tpi8"].combine_chunks()
        rgc = batch["roughness"].combine_chunks()
        dfc = batch["defined"].combine_chunks()
        for i in range(batch.num_rows):
            h, w = int(hs[i]), int(ws[i])
            tri = np.asarray(tric[i].values, np.int64).reshape(h, w)
            tpi = np.asarray(tpic[i].values, np.int64).reshape(h, w)
            rg = np.asarray(rgc[i].values, np.int64).reshape(h, w)
            d = np.asarray(dfc[i].values, bool).reshape(h, w)
            gr = np.arange(h, dtype=np.int64)[:, None] + int(ro[i])
            gc = np.arange(w, dtype=np.int64)[None, :] + int(co[i])
            wgt = (gr * 1315423911 + gc * 2654435761) % 1000003
            out["image_id"].append(ids[i])
            out["band"].append(int(bands[i]))
            out["n_defined"].append(int(d.sum()))
            out["sum_tri"].append(int(tri[d].sum()))
            out["wsum_tri"].append(int((tri[d] * wgt[d]).sum()))
            out["sum_tpi"].append(int(tpi[d].sum()))
            out["sum_rough"].append(int(rg[d].sum()))
        return pa.Table.from_pydict(
            {k: pa.array(out[k],
                         pa.string() if k == "image_id" else pa.int64())
             for k in out}
        )

    from ray.data.aggregate import Sum

    partial = rows.map_batches(summarize, batch_format="pyarrow",
                               zero_copy_batch=True)
    return partial.groupby(["image_id", "band"]).aggregate(
        Sum("n_defined", alias_name="n_defined"),
        Sum("sum_tri", alias_name="sum_tri"),
        Sum("wsum_tri", alias_name="wsum_tri"),
        Sum("sum_tpi", alias_name="sum_tpi"),
        Sum("sum_rough", alias_name="sum_rough"),
    )


def q_geo_idw(sf_dir: str):
    """gdal_grid invdist (stages/clip.idw_stage — IDW interpolation of
    scattered points onto the raster grid, pixel-snapped integer-exact
    variant: num += (v*1e6)//d2, den += 1e6//d2 within radius 12).
    Points = the corpus point geometries (pixel-center closed forms),
    values = (k*37)%1000+1.  EXACT SQL oracle: the point CTE's global
    pixel indices + a windowed distance join replay both floored sums;
    per-tile BIGINT checksums incl. position-weighted."""
    from rioxarray_ray.stages import clip as cstage

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 16)
    pts = _geoms("point")
    vals = [
        (int(g["geom_id"][4:]) * 37) % 1000 + 1 for g in pts
    ]
    rows = cstage.idw_stage(
        small, [g["geometry"] for g in pts], vals,
        radius_px=12, concurrency=2,
    )

    def summarize(batch: pa.Table) -> pa.Table:
        out = {"image_id": [], "win_row_off": [], "win_col_off": [],
               "sum_num": [], "wsum_num": [], "sum_den": [],
               "n_covered": []}
        ids = batch["image_id"].to_pylist()
        ro = batch["win_row_off"].to_numpy(zero_copy_only=False)
        co = batch["win_col_off"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        ws = batch["w"].to_numpy(zero_copy_only=False)
        nc = batch["idw_num"].combine_chunks()
        dc = batch["idw_den"].combine_chunks()
        pcnt = batch["n_pts"].combine_chunks()
        for i in range(batch.num_rows):
            h, w = int(hs[i]), int(ws[i])
            num = np.asarray(nc[i].values, np.int64).reshape(h, w)
            den = np.asarray(dc[i].values, np.int64).reshape(h, w)
            np_ = np.asarray(pcnt[i].values, np.int64).reshape(h, w)
            gr = np.arange(h, dtype=np.int64)[:, None] + int(ro[i])
            gc = np.arange(w, dtype=np.int64)[None, :] + int(co[i])
            wgt = (gr * 1315423911 + gc * 2654435761) % 1000003
            out["image_id"].append(ids[i])
            out["win_row_off"].append(int(ro[i]))
            out["win_col_off"].append(int(co[i]))
            out["sum_num"].append(int(num.sum()))
            out["wsum_num"].append(int((num * wgt).sum()))
            out["sum_den"].append(int(den.sum()))
            n_cov = int((np_ > 0).sum())
            if n_cov == 0:
                # oracle groups only covered pixels — skip empty windows
                for kk in ("image_id", "win_row_off", "win_col_off",
                           "sum_num", "wsum_num", "sum_den"):
                    out[kk].pop()
                continue
            out["n_covered"].append(n_cov)
        return pa.Table.from_pydict(
            {k: pa.array(out[k],
                         pa.string() if k == "image_id" else pa.int64())
             for k in out}
        )

    return rows.map_batches(summarize, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_geo_pansharpen(sf_dir: str):
    """Brovey pansharpening (stages/stats.pansharpen_stage — the
    gdal_pansharpen weighted-Brovey algorithm, integer-exact cross
    -multiplied variant) over the 3-band scenes: band 0 plays pan,
    bands 1-2 are sharpened by the pan/intensity ratio.  EXACT SQL
    oracle: the pixel spec pivoted per (r, c) with a count-3 all-valid
    rule, the same floor chain, per-(image, out-band, 64-window)
    checksums."""
    from rioxarray_ray.stages import stats as sstage
    from rioxarray_ray.stages.schema import pixel_views

    FILL = -(1 << 62)  # unreachable by any computed ratio value
    small = _keep_idx(
        _tiles_4326(sf_dir), lambda idx: (idx < 40) & (idx % 5 == 0)
    )
    out = sstage.pansharpen_stage(small, pan_band=0, scale=1000,
                                  fill=FILL)

    def summarize(batch: pa.Table) -> pa.Table:
        rows = []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            for b in range(px.shape[0]):
                v = px[b]
                m = v != FILL
                if not m.any():
                    continue
                gr = np.arange(px.shape[1], dtype=np.int64)[:, None] \
                    + int(r["win_row_off"])
                gc = np.arange(px.shape[2], dtype=np.int64)[None, :] \
                    + int(r["win_col_off"])
                wgt = (gr * 1315423911 + gc * 2654435761) % 1000003
                rows.append(
                    {
                        "image_id": r["image_id"],
                        "band": b,
                        "win_row_off": int(r["win_row_off"]),
                        "win_col_off": int(r["win_col_off"]),
                        "checksum": int(v[m].sum()),
                        "wsum": int((v[m] * wgt[m]).sum()),
                        "n_valid": int(m.sum()),
                    }
                )
        return pa.Table.from_pylist(rows)

    return out.map_batches(summarize, batch_format="pyarrow")


def q_geo_composite_argmax(sf_dir: str):
    """Best-pixel (argmax) compositing across overlapping scenes
    (stages/merge.composite_argmax — max-NDVI-style best-observation
    mosaics with WINNER identity, ties to the smallest image id).
    EXACT SQL oracle: per-global-pixel MAX + min-winner over the
    regenerated pixel spec, per-composite-tile BIGINT checksums incl. a
    position-weighted winner sum."""
    from rioxarray_ray.stages import merge as mstage

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 64)
    comp = mstage.composite_argmax(
        small, origin=(-60.0, 40.0), res=5e-3, comp_px=64
    )

    def summarize(batch: pa.Table) -> pa.Table:
        rows = []
        pxc = batch["pixels"].combine_chunks()
        wnc = batch["winner"].combine_chunks()
        imc = batch["images"].combine_chunks()
        for i in range(batch.num_rows):
            px = np.asarray(pxc[i].values, np.float64).reshape(64, 64)
            wn = np.asarray(wnc[i].values, np.int64).reshape(64, 64)
            imgs = [int(v[3:]) for v in imc[i].as_py()]
            ok = ~np.isnan(px)
            if not ok.any():
                continue
            ctx = int(batch["ctx"][i].as_py())
            cty = int(batch["cty"][i].as_py())
            gr = np.arange(64, dtype=np.int64)[:, None] + cty * 64
            gc = np.arange(64, dtype=np.int64)[None, :] + ctx * 64
            wgt = (gr * 1315423911 + gc * 2654435761) % 1000003
            widx = np.where(ok, np.asarray(imgs, np.int64)[
                np.maximum(wn, 0)], 0)
            rows.append(
                {
                    "ctx": ctx,
                    "cty": cty,
                    "band": int(batch["band"][i].as_py()),
                    "n_defined": int(ok.sum()),
                    "sum_max": int(np.rint(px[ok]).astype(np.int64).sum()),
                    "wsum_winner": int((widx[ok] * wgt[ok]).sum()),
                    "n_values": int(batch["n_values"][i].as_py()),
                }
            )
        return pa.Table.from_pylist(rows)

    return comp.map_batches(summarize, batch_format="pyarrow")


def q_geo_flowdir(sf_dir: str):
    """D8 steepest-descent flow direction (stages/focal.
    flow_direction_stage — the hydrology front end of the terrain
    family; ESRI codes, ties to the smallest code, flat/pit = 0).
    Irrational-free: straight-vs-diagonal slope comparison decided by
    the integer key 2*drop^2 vs drop^2.  EXACT SQL oracle: shift-join
    neighbors ranked by (key DESC, code ASC) with the count-9 interior
    rule; per-(image, band) code checksums incl. position-weighted."""
    from rioxarray_ray.pipelines import flagship as fpipe
    from rioxarray_ray.stages import decode as dstage
    from rioxarray_ray.stages import focal as fstage
    from rioxarray_ray.stages import tile as tstage

    n = min(_ndocs(sf_dir), 16)
    ds = fpipe.read_corpus(n, override_num_blocks=8)

    def keep(batch: pa.Table) -> pa.Table:
        idx = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(idx % 7 != 6))

    small = ds.map_batches(keep, batch_format="pyarrow",
                           zero_copy_batch=True)
    tiles = tstage.tile_stage(
        dstage.decode_stage(small), tile_size=_TILE, cell_res=_CELL_RES,
        halo=1,
    )
    rows = fstage.flow_direction_stage(tiles)

    def summarize(batch: pa.Table) -> pa.Table:
        out = {"image_id": [], "band": [], "n_defined": [],
               "sum_dir": [], "wsum_dir": []}
        ids = batch["image_id"].to_pylist()
        bands = batch["band"].to_numpy(zero_copy_only=False)
        ro = batch["win_row_off"].to_numpy(zero_copy_only=False)
        co = batch["win_col_off"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        ws = batch["w"].to_numpy(zero_copy_only=False)
        fdc = batch["flowdir"].combine_chunks()
        dfc = batch["defined"].combine_chunks()
        for i in range(batch.num_rows):
            h, w = int(hs[i]), int(ws[i])
            fd = np.asarray(fdc[i].values, np.int64).reshape(h, w)
            d = np.asarray(dfc[i].values, bool).reshape(h, w)
            gr = np.arange(h, dtype=np.int64)[:, None] + int(ro[i])
            gc = np.arange(w, dtype=np.int64)[None, :] + int(co[i])
            wgt = (gr * 1315423911 + gc * 2654435761) % 1000003
            out["image_id"].append(ids[i])
            out["band"].append(int(bands[i]))
            out["n_defined"].append(int(d.sum()))
            out["sum_dir"].append(int(fd[d].sum()))
            out["wsum_dir"].append(int((fd[d] * wgt[d]).sum()))
        return pa.Table.from_pydict(
            {k: pa.array(out[k],
                         pa.string() if k == "image_id" else pa.int64())
             for k in out}
        )

    from ray.data.aggregate import Sum

    partial = rows.map_batches(summarize, batch_format="pyarrow",
                               zero_copy_batch=True)
    return partial.groupby(["image_id", "band"]).aggregate(
        Sum("n_defined", alias_name="n_defined"),
        Sum("sum_dir", alias_name="sum_dir"),
        Sum("wsum_dir", alias_name="wsum_dir"),
    )


def q_geo_flowacc(sf_dir: str):
    """D8 flow accumulation (stages/focal.flow_accumulation_stage —
    upstream cell counts over the flow graph; the watershed-analytics
    step after flow direction).  Image-global via ONE groupby(image_id);
    the in-task fixpoint is vectorized shifted adds (rounds = longest
    flow path; the D8 graph is acyclic because flow strictly descends).
    EXACT SQL oracle: recursive reachability over the replayed direction
    grid — acc(c) = COUNT of start pixels whose path visits c — with
    per-(image, band, 64-window) checksums."""
    from rioxarray_ray.stages import focal as fstage

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 2)
    rows = fstage.flow_accumulation_stage(small)

    def summarize(batch: pa.Table) -> pa.Table:
        out = {"image_id": [], "band": [], "win_row_off": [],
               "win_col_off": [], "n_defined": [], "sum_acc": [],
               "wsum_acc": []}
        ids = batch["image_id"].to_pylist()
        bands = batch["band"].to_numpy(zero_copy_only=False)
        ro = batch["win_row_off"].to_numpy(zero_copy_only=False)
        co = batch["win_col_off"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        ws = batch["w"].to_numpy(zero_copy_only=False)
        fac = batch["flowacc"].combine_chunks()
        dfc = batch["defined"].combine_chunks()
        for i in range(batch.num_rows):
            h, w = int(hs[i]), int(ws[i])
            acc = np.asarray(fac[i].values, np.int64).reshape(h, w)
            d = np.asarray(dfc[i].values, bool).reshape(h, w)
            gr = np.arange(h, dtype=np.int64)[:, None] + int(ro[i])
            gc = np.arange(w, dtype=np.int64)[None, :] + int(co[i])
            wgt = (gr * 1315423911 + gc * 2654435761) % 1000003
            out["image_id"].append(ids[i])
            out["band"].append(int(bands[i]))
            out["win_row_off"].append(int(ro[i]))
            out["win_col_off"].append(int(co[i]))
            out["n_defined"].append(int(d.sum()))
            out["sum_acc"].append(int(acc[d].sum()))
            out["wsum_acc"].append(int((acc[d] * wgt[d]).sum()))
        return pa.Table.from_pydict(
            {k: pa.array(out[k],
                         pa.string() if k == "image_id" else pa.int64())
             for k in out}
        )

    return rows.map_batches(summarize, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_geo_watershed(sf_dir: str):
    """Watershed delineation (stages/focal.watershed_stage — basin label
    = the flat index of the terminal each cell's D8 path drains to; the
    hydrology trio's third member).  Pointer jumping converges in
    O(log path) vectorized rounds; labels are schedule-independent.
    EXACT SQL oracle: the flow-path recursive CTE keeps only terminal
    reaches (no outgoing step) and labels each start with the terminal's
    flat index; per-(image, band, 64-window) label checksums."""
    from rioxarray_ray.stages import focal as fstage

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 2)
    rows = fstage.watershed_stage(small)

    def summarize(batch: pa.Table) -> pa.Table:
        out = {"image_id": [], "band": [], "win_row_off": [],
               "win_col_off": [], "n_defined": [], "sum_basin": [],
               "wsum_basin": [], "n_basins": []}
        ids = batch["image_id"].to_pylist()
        bands = batch["band"].to_numpy(zero_copy_only=False)
        ro = batch["win_row_off"].to_numpy(zero_copy_only=False)
        co = batch["win_col_off"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        ws = batch["w"].to_numpy(zero_copy_only=False)
        bsc = batch["basin"].combine_chunks()
        dfc = batch["defined"].combine_chunks()
        for i in range(batch.num_rows):
            h, w = int(hs[i]), int(ws[i])
            bs = np.asarray(bsc[i].values, np.int64).reshape(h, w)
            d = np.asarray(dfc[i].values, bool).reshape(h, w)
            gr = np.arange(h, dtype=np.int64)[:, None] + int(ro[i])
            gc = np.arange(w, dtype=np.int64)[None, :] + int(co[i])
            wgt = (gr * 1315423911 + gc * 2654435761) % 1000003
            out["image_id"].append(ids[i])
            out["band"].append(int(bands[i]))
            out["win_row_off"].append(int(ro[i]))
            out["win_col_off"].append(int(co[i]))
            out["n_defined"].append(int(d.sum()))
            out["sum_basin"].append(int(bs[d].sum()))
            out["wsum_basin"].append(int((bs[d] * wgt[d]).sum()))
            out["n_basins"].append(int(len(np.unique(bs[d]))))
        return pa.Table.from_pydict(
            {k: pa.array(out[k],
                         pa.string() if k == "image_id" else pa.int64())
             for k in out}
        )

    return rows.map_batches(summarize, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_geo_xyz(sf_dir: str):
    """Raster -> XYZ point-table export (stages/stats.to_xyz_stage — the
    gdal2xyz / to_dataframe bridge): one row per valid pixel with exact
    affine CENTER coordinates.  EXACT SQL oracle incl. bit-identical
    float coordinates: DuckDB rebuilds x = res*(c+0.5) + tile_left from
    the same IEEE chain (commutativity-safe) and the pixel values from
    the spec."""
    from rioxarray_ray.stages import stats as sstage

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 2)
    return sstage.to_xyz_stage(small)


def q_geo_proximity(sf_dir: str):
    """gdal_proximity: per-pixel euclidean distance to the nearest
    over-threshold pixel, image-global (stages/stats.proximity_stage —
    ONE groupby(image_id) co-shuffle, vectorized exact row-decomposition
    EDT).  EXACT SQL oracle: squared distance is a tie-independent pure
    MIN, decomposed the same way the kernel computes it — an in-row
    (c-c0)^2 MIN per (row, column), then a (r-r0)^2 + dx2 MIN over
    target rows — and compared as per-(image, band, 64-window) BIGINT
    sums + position-weighted sums of d2 over valid pixels."""
    from rioxarray_ray.stages import stats as sstage

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 4)
    rows = sstage.proximity_stage(small, threshold=120)

    def summarize(batch: pa.Table) -> pa.Table:
        out = {"image_id": [], "band": [], "win_row_off": [],
               "win_col_off": [], "sum_d2": [], "wsum_d2": [],
               "n_valid": []}
        ids = batch["image_id"].to_pylist()
        bands = batch["band"].to_numpy(zero_copy_only=False)
        ro = batch["win_row_off"].to_numpy(zero_copy_only=False)
        co = batch["win_col_off"].to_numpy(zero_copy_only=False)
        hs = batch["h"].to_numpy(zero_copy_only=False)
        ws = batch["w"].to_numpy(zero_copy_only=False)
        d2c = batch["d2"].combine_chunks()
        vc = batch["valid"].combine_chunks()
        for i in range(batch.num_rows):
            h, w = int(hs[i]), int(ws[i])
            d2 = np.asarray(d2c[i].values, dtype=np.int64).reshape(h, w)
            v = np.asarray(vc[i].values, dtype=bool).reshape(h, w)
            gr = np.arange(h, dtype=np.int64)[:, None] + int(ro[i])
            gc = np.arange(w, dtype=np.int64)[None, :] + int(co[i])
            wgt = (gr * 1315423911 + gc * 2654435761) % 1000003
            out["image_id"].append(ids[i])
            out["band"].append(int(bands[i]))
            out["win_row_off"].append(int(ro[i]))
            out["win_col_off"].append(int(co[i]))
            out["sum_d2"].append(int(d2[v].sum()))
            out["wsum_d2"].append(int((d2[v] * wgt[v]).sum()))
            out["n_valid"].append(int(v.sum()))
        return pa.Table.from_pydict(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "band": pa.array(out["band"], pa.int64()),
                "win_row_off": pa.array(out["win_row_off"], pa.int64()),
                "win_col_off": pa.array(out["win_col_off"], pa.int64()),
                "sum_d2": pa.array(out["sum_d2"], pa.int64()),
                "wsum_d2": pa.array(out["wsum_d2"], pa.int64()),
                "n_valid": pa.array(out["n_valid"], pa.int64()),
            }
        )

    return rows.map_batches(summarize, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_geo_match_histograms(sf_dir: str):
    """Histogram matching to a reference image's distribution
    (stages/stats.match_histograms_stage — skimage match_histograms in
    the integer closest-rank variant; the seamless-mosaic color-balance
    step).  Reference = img00000001's band_value_counts (a distributed
    aggregate collected as a LEGITIMATE small side); sources = the other
    single-band rawu8 natives below doc 32.  EXACT SQL oracle: DuckDB
    rebuilds both CDFs from the pixel spec and replays the
    cross-multiplied min-rank rule, then per-(image, band, 64-window)
    BIGINT checksums of the remapped pixels."""
    from rioxarray_ray.kernels.nodata import valid_mask
    from rioxarray_ray.stages import stats as sstage
    from rioxarray_ray.stages.schema import pixel_views

    tiles = _tiles_4326(sf_dir)
    ref_tiles = _keep_idx(tiles, lambda idx: idx == 1)
    src_tiles = _keep_idx(
        tiles,
        lambda idx: (idx < 32) & (idx % 4 == 1) & (idx % 5 != 0)
        & (idx != 1),
    )
    ref_counts = sstage.band_value_counts(ref_tiles)
    matched = sstage.match_histograms_stage(src_tiles, ref_counts)

    def summarize(batch: pa.Table) -> pa.Table:
        out = []
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            vm = valid_mask(px, r["nodata"])
            for b in range(px.shape[0]):
                n_valid = int(vm[b].sum())
                if n_valid == 0:
                    continue
                gr = np.arange(px.shape[1], dtype=np.int64)[:, None] \
                    + int(r["win_row_off"])
                gc = np.arange(px.shape[2], dtype=np.int64)[None, :] \
                    + int(r["win_col_off"])
                wgt = (gr * 1315423911 + gc * 2654435761) % 1000003
                v = px[b].astype(np.int64)
                out.append(
                    {
                        "image_id": r["image_id"],
                        "band": b,
                        "win_row_off": int(r["win_row_off"]),
                        "win_col_off": int(r["win_col_off"]),
                        "checksum": int(v[vm[b]].sum()),
                        "wsum": int((v[vm[b]] * wgt[vm[b]]).sum()),
                        "n_valid": n_valid,
                    }
                )
        return pa.Table.from_pylist(out)

    return matched.map_batches(summarize, batch_format="pyarrow")


def q_embedding_semantic_clusters(sf_dir: str):
    """APPLY the semantic dedup: connected components over the
    SemDeDup pair list (pure composition of two gated operators —
    cluster.semantic_dedup_pairs edges into dedup.connected_components'
    min-label propagation).  Oracle: recursive reachability CTE over
    the composed semantic-pairs SQL."""
    from rioxarray_ray.functions import cluster, dedup

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
    pairs = cluster.semantic_dedup_pairs(
        ds, threshold=_NEAR_DUP_TAU, k=8, iters=2
    )
    return dedup.connected_components(
        pairs, ds.select_columns(["vec_id"]),
        id_col="vec_id", a_col="vec_a", b_col="vec_b",
    )


def q_embedding_lsh_near_dup(sf_dir: str):
    """Embedding near-dup via DETERMINISTIC hyperplane LSH
    (functions/cluster.hyperplane_lsh_near_dup): 64-plane sign signature
    -> banded hamming-LSH candidates (the certified SimHash plan) ->
    exact cosine verify through slim hash joins.  The corpus has no
    hamming-close pairs, so the input PLANTS a deterministic twin for
    every 17th vector (id + 10^6, coord 0 nudged by +5e-4 — quantizes to
    a near-identical signature); the LSH plan must recover exactly the
    planted pairs.  EXACT SQL oracle by composition: the same planted
    union, the embedding_sketch SUM extended to 64 planes, sign bits
    packed to a HUGEINT signature, the simhash segment/bucket CTEs, and
    a literal list_cosine_similarity verify."""
    from rioxarray_ray.functions import cluster

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(batch["embedding"]).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        d = len(flat) // max(len(ids), 1)
        m = flat.reshape(len(ids), d)
        twin_mask = ids % 17 == 0
        twins = m[twin_mask].copy()
        twins[:, 0] = twins[:, 0] + 0.0005
        out_ids = np.concatenate([ids, ids[twin_mask] + 1_000_000])
        out_m = np.concatenate([m, twins])
        return pa.table(
            {
                "vec_id": pa.array(out_ids, pa.int64()),
                "embedding": pa.array(list(out_m)),
            }
        )

    planted = ds.map_batches(plant, batch_format="pyarrow",
                             zero_copy_batch=True)
    return cluster.hyperplane_lsh_near_dup(
        planted, threshold=_NEAR_DUP_TAU, bands=4, max_hamming=3
    )


def q_embedding_diverse_sample(sf_dir: str):
    """Diversity-balanced subset — per-semantic-cluster quota sampling
    (the corpus-curation move: cluster first, take n per cluster so rare
    topics survive).  Pure composition of gated operators:
    cluster.kmedians labels -> sample.stratified_sample (content-stable
    md5 rank quota per cluster).  Oracle: the kmedians replay CTE + the
    same row_number window."""
    from rioxarray_ray.functions import cluster, sample

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
    labeled = cluster.kmedians(ds, k=8, iters=2)
    picked = sample.stratified_sample(
        labeled, group_col="cluster", n_per_group=16,
        key_col="vec_id", seed=7,
    )
    return picked.select_columns(["vec_id", "cluster"])


def q_embedding_outliers(sf_dir: str):
    """Per-cluster outlier mining — the farthest members of each
    semantic cluster (curation: inspect/drop low-coherence points; the
    inverse of diversity sampling's quota).  Composition:
    cluster.kmedians (integer L1 distances) -> agg.topk_per_group
    (k=8 farthest per cluster, ties to the smallest id).  Oracle: the
    kmedians replay CTE + a distance-ranked window."""
    from rioxarray_ray.functions import agg, cluster

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
    labeled = cluster.kmedians(ds, k=8, iters=2)
    top = agg.topk_per_group(
        labeled, group_col="cluster", order_col="l1_dist", k=8,
        descending=True, tiebreak_col="vec_id",
    )
    return top.select_columns(["cluster", "vec_id", "l1_dist"])


def q_embedding_gram(sf_dir: str):
    """Distributed Gram/scatter matrix (functions/cluster.gram_matrix):
    per-batch int64 w.T@w partials over the x2-quantized embeddings ->
    ONE (i, j) groupby Sum — the accumulation step of corpus-scale PCA
    / whitening (driver-side eigh of the tiny d x d result is
    pca_components).  EXACT SQL oracle: DuckDB replays every
    upper-triangle entry as SUM(w_i * w_j)."""
    from rioxarray_ray.functions import cluster

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
    out = cluster.gram_matrix(ds)

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "i": pc.cast(batch["i"], pa.int64()),
                "j": pc.cast(batch["j"], pa.int64()),
                "s": pc.cast(batch["s"], pa.int64()),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


def q_geo_cell_rollup(sf_dir: str):
    """Hierarchical cell roll-up (stages/tile.cell_rollup_stage): tile
    counts + covered-pixel counts aggregated to parent cells at levels
    8/6/4 via kernels/cellindex.parent (h3 cell_to_parent analogue).
    Partials combine per batch BEFORE the one (level, cell) groupby —
    the shuffle moves cell-count rows, never tiles.  EXACT SQL oracle:
    DuckDB recomputes the res-10 cell arithmetic and the right-shift
    parent packing."""
    from rioxarray_ray.stages import tile as tstage

    roll = tstage.cell_rollup_stage(_tiles_4326(sf_dir), levels=(8, 6, 4))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "level": pc.cast(batch["level"], pa.int64()),
                "cell": pc.cast(batch["cell"], pa.int64()),
                "n_tiles": pc.cast(batch["n_tiles"], pa.int64()),
                "px": pc.cast(batch["px"], pa.int64()),
            }
        )

    return roll.map_batches(finalize, batch_format="pyarrow")


def q_events_interval_orders(sf_dir: str):
    """Distributed INTERVAL join (functions/asof.interval_join): each
    event joins EVERY order of the same user whose promo window
    [start, start + len) contains the event ts — multi-match
    point-in-interval semantics, ONE groupby(key) co-shuffle, candidate
    windows bounded by the group max interval length (two searchsorteds
    + vectorized pair expansion).  Windows are derived from the order
    key by modular arithmetic into the event month (orders predate the
    event stream by decades, so o_orderdate itself can't contain any
    event ts): start = 2024-01-01 + (key*2654435761 mod 2592000) sec,
    len = 300 + key mod 86400 sec.  The oracle is the literal SQL range
    join over the same arithmetic."""
    from rioxarray_ray.functions.asof import interval_join

    events = _read_pq(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orders = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    epoch_2024 = 1_704_067_200_000_000  # epoch_us(2024-01-01)

    def with_window(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        start = epoch_2024 + ((ok * 2654435761) % 2_592_000) * 1_000_000
        end = start + (300 + ok % 86_400) * 1_000_000
        batch = batch.append_column(
            "o_start", pc.cast(pa.array(start, pa.int64()),
                               pa.timestamp("us"))
        )
        return batch.append_column(
            "o_end", pc.cast(pa.array(end, pa.int64()), pa.timestamp("us"))
        )

    orders = orders.map_batches(with_window, batch_format="pyarrow",
                                zero_copy_batch=True)
    joined = interval_join(
        events,
        orders,
        key=("user_id", "o_custkey"),
        left_ts="ts",
        right_start="o_start",
        right_end="o_end",
        left_cols=["event_id"],
        right_cols=["o_orderkey", "o_totalprice"],
    )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
                "o_orderkey": batch["o_orderkey"],
                "o_totalprice": batch["o_totalprice"],
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow",
                              zero_copy_batch=True)


_RECLASS_BINS = (-500, 0, 250, 500, 800, 1200, 2000)
_RECLASS_VALUES = (10, 20, 30, 40, 50, 60, 70, 80)


def q_geo_reclassify(sf_dir: str):
    """Range reclassification (land-cover-style class remap,
    stages/stats.reclassify_stage: searchsorted over strictly-increasing
    edges, nodata -> fill, zero shuffle), projected to per-(tile, band,
    class) counts + position-weighted sums so a single misclassified or
    misplaced pixel breaks the hash.  EXACT SQL oracle: DuckDB
    regenerates the pixel spec and replays the same CASE ladder.
    doc_id < 96 bounds the SQL regeneration."""
    from rioxarray_ray.stages import stats as sstage

    small = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 96)
    rc = sstage.reclassify_stage(
        small, _RECLASS_BINS, _RECLASS_VALUES, fill=-9999, concurrency=4
    )

    def summarize(batch: pa.Table) -> pa.Table:
        from rioxarray_ray.stages.schema import pixel_views

        out: dict[str, list] = {
            "image_id": [], "tile_row": [], "tile_col": [],
            "band": [], "cls": [], "n": [], "wsum": [],
        }
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            h, w = px.shape[1], px.shape[2]
            rr, cc = np.meshgrid(
                np.arange(h, dtype=np.int64),
                np.arange(w, dtype=np.int64),
                indexing="ij",
            )
            wt = 1 + (rr * 64 + cc) % 97
            for b in range(px.shape[0]):
                band = px[b]
                ok = band != -9999
                if not ok.any():
                    continue
                for cls in np.unique(band[ok]).tolist():
                    m = band == cls
                    out["image_id"].append(r["image_id"])
                    out["tile_row"].append(int(r["tile_row"]))
                    out["tile_col"].append(int(r["tile_col"]))
                    out["band"].append(b)
                    out["cls"].append(int(cls))
                    out["n"].append(int(m.sum()))
                    out["wsum"].append(int(wt[m].sum()))
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "tile_row": pa.array(out["tile_row"], pa.int64()),
                "tile_col": pa.array(out["tile_col"], pa.int64()),
                "band": pa.array(out["band"], pa.int64()),
                "cls": pa.array(out["cls"], pa.int64()),
                "n": pa.array(out["n"], pa.int64()),
                "wsum": pa.array(out["wsum"], pa.int64()),
            }
        )

    return rc.map_batches(summarize, batch_format="pyarrow",
                          zero_copy_batch=True)


def _burn_values(geom_rows):
    import hashlib

    return [
        1 + hashlib.sha256(g["geom_id"].encode()).digest()[4] % 250
        for g in geom_rows
    ]


def q_geo_rasterize(sf_dir: str):
    """Vector->raster value burn (stages/clip.rasterize_stage: broadcast
    (geometry, value) table painted in input order, later shapes win —
    rasterio.features.rasterize MergeAlg.replace contract) over rect +
    concave-star geometries, projected to per-tile burned-pixel counts,
    value sums and position-weighted value sums.  EXACT SQL oracle:
    DuckDB places the same rects (pixel-aligned modular arithmetic) and
    star vertices (sha-derived radii), ray-casts pixel centers, picks
    the max-geom_id winner per pixel and derives the same sha-byte burn
    values."""
    from rioxarray_ray.stages import clip as cstage

    tiles = _keep_idx(_tiles_4326(sf_dir), lambda idx: idx < 128)
    polys = [g for g in _geoms() if g["kind"] in ("rect", "concave")]
    burned = cstage.rasterize_stage(
        tiles,
        [g["geometry"] for g in polys],
        _burn_values(polys),
        fill=0,
        concurrency=4,
    )

    def summarize(batch: pa.Table) -> pa.Table:
        from rioxarray_ray.stages.schema import pixel_views

        out: dict[str, list] = {
            "image_id": [], "tile_row": [], "tile_col": [],
            "n_burned": [], "vsum": [], "wsum": [],
        }
        meta = batch.drop_columns(["pixels"]).to_pylist()
        for r, px in zip(meta, pixel_views(batch)):
            band = px[0].astype(np.int64)
            m = band != 0
            if not m.any():
                continue
            h, w = band.shape
            rr, cc = np.meshgrid(
                np.arange(h, dtype=np.int64),
                np.arange(w, dtype=np.int64),
                indexing="ij",
            )
            wt = 1 + (rr * 64 + cc) % 97
            out["image_id"].append(r["image_id"])
            out["tile_row"].append(int(r["tile_row"]))
            out["tile_col"].append(int(r["tile_col"]))
            out["n_burned"].append(int(m.sum()))
            out["vsum"].append(int(band[m].sum()))
            out["wsum"].append(int((band[m] * wt[m]).sum()))
        return pa.table(
            {
                "image_id": pa.array(out["image_id"], pa.string()),
                "tile_row": pa.array(out["tile_row"], pa.int64()),
                "tile_col": pa.array(out["tile_col"], pa.int64()),
                "n_burned": pa.array(out["n_burned"], pa.int64()),
                "vsum": pa.array(out["vsum"], pa.int64()),
                "wsum": pa.array(out["wsum"], pa.int64()),
            }
        )

    return burned.map_batches(summarize, batch_format="pyarrow",
                              zero_copy_batch=True)


# --------------------------------------------------------------------------
# contract functions
# --------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on the sf0.001-sized corpus (256 images):
    decode -> tile -> PIP join -> reproject; returns the warped tile set."""
    from rioxarray_ray.pipelines import flagship as fpipe

    warped, _join = fpipe.flagship(
        n_images=256, n_geoms=64, dst_crs="EPSG:3857", concurrency=4,
        warp_scope="matched",
    )
    return warped.select_columns(
        [
            "image_id",
            "tile_row",
            "tile_col",
            "cell",
            "crs",
            "h",
            "w",
            "caption",
        ]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "geo_footprint": q_geo_footprint,
        "geo_tile_cells": q_geo_tile_cells,
        "geo_clip_box": q_geo_clip_box,
        "geo_pip_rect": q_geo_pip_rect,
        "geo_pip_shuffle": q_geo_pip_shuffle,
        "geo_zonal_stats": q_geo_zonal_stats,
        "geo_point_sample": q_geo_point_sample,
        "geo_change_crosstab": q_geo_change_crosstab,
        "geo_composite_median": q_geo_composite_median,
        "geo_focal_mean": q_geo_focal_mean,
        "geo_terrain": q_geo_terrain,
        "geo_histogram": q_geo_histogram,
        "geo_temporal_trend": q_geo_temporal_trend,
        "geo_contour_edges": q_geo_contour_edges,
        "geo_contour_edges_global": q_geo_contour_edges_global,
        "geo_band_math": q_geo_band_math,
        "geo_overviews": q_geo_overviews,
        "geo_knn": q_geo_knn,
        "geo_reproject_grid": q_geo_reproject_grid,
        "geo_downsample_avg": q_geo_downsample_avg,
        "geo_pixel_checksum": q_geo_pixel_checksum,
        "geo_reproject_roundtrip": q_geo_reproject_roundtrip,
        "geo_reproject_bilinear_fixed": q_geo_reproject_bilinear_fixed,
        "geo_reproject_identity": q_geo_reproject_identity,
        "geo_tiled_halo_warp": q_geo_tiled_halo_warp,
        "geo_tiled_halo_warp_nearest": q_geo_tiled_halo_warp_nearest,
        "geo_clip_geometry": q_geo_clip_geometry,
        "geo_reclassify": q_geo_reclassify,
        "geo_rasterize": q_geo_rasterize,
        "geo_merge": q_geo_merge,
        "geo_mosaic_tiff": q_geo_mosaic_tiff,
        "geo_interpolate_na": q_geo_interpolate_na,
        "geo_interpolate_na_plane": q_geo_interpolate_na_plane,
        "geo_interpolate_na_nearest": q_geo_interpolate_na_nearest,
        "multimodal_features": q_multimodal_features,
        "multimodal_features_pooled": q_multimodal_features_pooled,
        "multimodal_png": q_multimodal_png,
        "multimodal_wav": q_multimodal_wav,
        "multimodal_avi": q_multimodal_avi,
        "multimodal_audio_features": q_multimodal_audio_features,
        "multimodal_scene_cut": q_multimodal_scene_cut,
        "multimodal_augment": q_multimodal_augment,
        "multimodal_patchify": q_multimodal_patchify,
        "geo_open_geotiff": q_geo_open_geotiff,
        "geo_open_netcdf": q_geo_open_netcdf,
        "multimodal_jpeg": q_multimodal_jpeg,
        "multimodal_bmp": q_multimodal_bmp,
        "multimodal_gif": q_multimodal_gif,
        "multimodal_pnm": q_multimodal_pnm,
        "multimodal_resize": q_multimodal_resize,
        "dedup_exact": q_dedup_exact,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "dedup_minhash": q_dedup_minhash,
        "dedup_minhash_md5": q_dedup_minhash_md5,
        "dedup_clusters": q_dedup_clusters,
        "dedup_apply": q_dedup_apply,
        "dedup_simhash_md5": q_dedup_simhash_md5,
        "dedup_simhash_pairs_md5": q_dedup_simhash_pairs_md5,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_kmedians": q_embedding_kmedians,
        "embedding_sketch": q_embedding_sketch,
        "embedding_near_dup_bcast": q_embedding_near_dup_bcast,
        "ann_topk": q_ann_topk,
        "ann_topk_blocked": q_ann_topk_blocked,
        "ann_topk_ivf": q_ann_topk_ivf,
        "ann_topk_ivf_exhaustive": q_ann_topk_ivf_exhaustive,
        "text_tokens": q_text_tokens,
        "text_ngram_jaccard": q_text_ngram_jaccard,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "text_fingerprint": q_text_fingerprint,
        "text_sample": q_text_sample,
        "text_shuffle": q_text_shuffle,
        "text_stratified_sample": q_text_stratified_sample,
        "text_token_topk": q_text_token_topk,
        "image_ahash": q_image_ahash,
        "image_near_dup": q_image_near_dup,
        "image_phash": q_image_phash,
        "image_dedup_apply": q_image_dedup_apply,
        "image_near_dup_verify": q_image_near_dup_verify,
        "multimodal_joint_near_dup": q_multimodal_joint_near_dup,
        "text_repetition": q_text_repetition,
        "text_redact": q_text_redact,
        "text_decontaminate": q_text_decontaminate,
        "text_decontaminate_bloom": q_text_decontaminate_bloom,
        "text_chunk": q_text_chunk,
        "dedup_chunks": q_dedup_chunks,
        "dedup_spans": q_dedup_spans,
        "text_doc_freq": q_text_doc_freq,
        "text_rarest_term": q_text_rarest_term,
        "text_tfidf_search": q_text_tfidf_search,
        "text_bm25": q_text_bm25,
        "text_collocations": q_text_collocations,
        "text_fluency": q_text_fluency,
        "text_pack": q_text_pack,
        "text_weighted_sample": q_text_weighted_sample,
        "embedding_quantize": q_embedding_quantize,
        "ann_topk_int8": q_ann_topk_int8,
        "events_asof_orders": q_events_asof_orders,
        "events_interval_orders": q_events_interval_orders,
        "geo_cell_rollup": q_geo_cell_rollup,
        "embedding_semantic_dedup": q_embedding_semantic_dedup,
        "embedding_gram": q_embedding_gram,
        "embedding_lsh_near_dup": q_embedding_lsh_near_dup,
        "embedding_diverse_sample": q_embedding_diverse_sample,
        "embedding_outliers": q_embedding_outliers,
        "embedding_semantic_clusters": q_embedding_semantic_clusters,
        "geo_region_label": q_geo_region_label,
        "geo_sieve": q_geo_sieve,
        "geo_proximity": q_geo_proximity,
        "geo_focal_mode": q_geo_focal_mode,
        "geo_percentile_stretch": q_geo_percentile_stretch,
        "geo_terrain_indices": q_geo_terrain_indices,
        "geo_idw": q_geo_idw,
        "geo_pansharpen": q_geo_pansharpen,
        "geo_composite_argmax": q_geo_composite_argmax,
        "geo_flowdir": q_geo_flowdir,
        "geo_flowacc": q_geo_flowacc,
        "geo_watershed": q_geo_watershed,
        "geo_xyz": q_geo_xyz,
        "geo_match_histograms": q_geo_match_histograms,
        "geo_zorder_layout": q_geo_zorder_layout,
        "geo_band_stats": q_geo_band_stats,
        "agg_revenue_nation": q_agg_revenue_nation,
        "geo_equalize": q_geo_equalize,
        "text_length_quantiles": q_text_length_quantiles,
        "events_topk_per_user": q_events_topk_per_user,
        "events_approx_distinct": q_events_approx_distinct,
        "events_cms": q_events_cms,
        "events_funnel": q_events_funnel,
        "events_retention": q_events_retention,
        "events_window": q_events_window,
        "events_window_hopping": q_events_window_hopping,
        "events_sessionize": q_events_sessionize,
        "events_sessionize_scalable": q_events_sessionize_scalable,
        "agg_pricing": q_agg_pricing,
    }


# SQL building blocks mirroring rioxarray_ray/sources/corpus.py exactly
def _allpx_cte(img_where: str) -> str:
    """The frozen corpus pixel spec (sources/corpus.py) regenerated in SQL
    — identical chain to the geo_pixel_checksum oracle, parameterized by
    the image subset.  Yields ``allpx(idx, image_id, b, r, c, px)`` with
    only VALID (non-disc) pixels, plus ``img`` with the metadata columns."""
    return f"""
img AS (
  SELECT doc_id AS idx,
         'img' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS image_id,
         CASE doc_id % 4 WHEN 0 THEN 64 WHEN 1 THEN 128 WHEN 2 THEN 200 ELSE 256 END AS w,
         CASE (doc_id + 1) % 4 WHEN 0 THEN 64 WHEN 1 THEN 128 WHEN 2 THEN 200 ELSE 256 END AS h,
         CASE doc_id % 4 WHEN 0 THEN 'raw16' WHEN 1 THEN 'rawu8' WHEN 2 THEN 'pngz' ELSE 'lq8' END AS fmt,
         CASE WHEN doc_id % 5 = 0 THEN 3 ELSE 1 END AS band_count
  FROM documents WHERE {img_where}
),
par AS (
  SELECT *,
         1e3 + CAST(('0x' || substr(sha256(image_id), 1, 2)) AS INT) * 8e0 AS amp,
         1 + CAST(('0x' || substr(sha256(image_id), 3, 2)) AS INT) % 8 AS f1,
         1 + CAST(('0x' || substr(sha256(image_id), 5, 2)) AS INT) % 8 AS f2,
         CAST(('0x' || substr(sha256(image_id), 7, 2)) AS INT) / 2.55e2 AS phi,
         CAST(('0x' || substr(sha256(image_id), 9, 2)) AS INT) % h AS cr,
         CAST(('0x' || substr(sha256(image_id), 11, 2)) AS INT) % w AS cc,
         5e-2 * h * w / pi() AS radius2
  FROM img
),
pr AS (SELECT *, unnest(range(0, h)) AS r FROM par),
prc AS (SELECT *, unnest(range(0, w)) AS c FROM pr),
pb AS (SELECT *, unnest(range(0, band_count)) AS b FROM prc),
v0 AS (
  SELECT idx, image_id, fmt, h, w, b, r, c,
         amp * sin(((2*pi())*f1)*(CAST(r AS DOUBLE)+(phi + 3.7e-1*b))/h)
             * cos(((2*pi())*f2)*(CAST(c AS DOUBLE)+(phi + 3.7e-1*b))/w)
         + (5e2*(CAST(r AS DOUBLE)/h) + 3e2*(CAST(c AS DOUBLE)/w)) AS vf,
         ((r-cr)*(r-cr) + (c-cc)*(c-cc)) < radius2 AS disc
  FROM pb
),
v16 AS (SELECT *, CAST(round_even(vf, 0) AS BIGINT) AS q16 FROM v0),
u8 AS (
  SELECT *, MIN(vf) OVER (PARTITION BY idx) AS lo8,
            MAX(vf) OVER (PARTITION BY idx) AS hi8
  FROM v16 WHERE fmt = 'rawu8'
),
u8px AS (
  SELECT idx, image_id, b, r, c,
         CAST(round_even((vf - lo8) / GREATEST(hi8 - lo8, 1e-9) * 2.54e2, 0) AS BIGINT) AS px
  FROM u8 WHERE NOT disc
),
lmm AS (
  SELECT idx, b,
         CAST(MIN(q16) AS DOUBLE) AS lo,
         CASE WHEN MAX(q16) <= MIN(q16)
              THEN CAST(MIN(q16) AS DOUBLE) + 1 ELSE CAST(MAX(q16) AS DOUBLE) END AS hi
  FROM v16 WHERE fmt = 'lq8' AND NOT disc GROUP BY idx, b
),
lq AS (
  SELECT v.idx, v.image_id, v.b, v.r, v.c, v.q16, m.lo, (m.hi - m.lo) / 2.54e2 AS step
  FROM v16 v JOIN lmm m ON v.idx = m.idx AND v.b = m.b
  WHERE v.fmt = 'lq8' AND NOT v.disc
),
lqpx AS (
  SELECT idx, image_id, b, r, c,
         CAST(round_even(lo + LEAST(GREATEST(round_even((CAST(q16 AS DOUBLE) - lo) / step, 0), 0e0), 2.54e2) * step, 0) AS BIGINT) AS px
  FROM lq
),
i16px AS (
  SELECT idx, image_id, b, r, c, q16 AS px
  FROM v16 WHERE fmt IN ('raw16', 'pngz') AND NOT disc
),
allpx AS (
  SELECT * FROM i16px UNION ALL SELECT * FROM u8px UNION ALL SELECT * FROM lqpx
)
"""


def _runccl_ctes(threshold: int) -> str:
    """Run-length CCL CTE chain shared by the region-label and sieve
    oracles: horizontal runs of foreground pixels from one
    gaps-and-islands window (c - row_number()), vertical run adjacency
    as an interval overlap join, recursive reachability closure over
    the RUN graph — hundreds of nodes per image instead of 10^5 pixels,
    so the O(component_runs^2) closure stays tiny.  The component label
    (min flat pixel index) is a schedule-independent fixed point, so it
    equals the engine's own iterate-to-fixpoint labeling.  Yields
    ``px(image_id, b, comp, r, c, wt)`` (one row per foreground pixel,
    labeled); splice after ``WITH RECURSIVE {_allpx_cte(...)},``."""
    return f"""
fg AS MATERIALIZED (
  SELECT a.idx, a.image_id, a.b, a.r, a.c,
         a.r * i.w + a.c AS p,
         1 + ((a.r % 64) * 64 + (a.c % 64)) % 97 AS wt
  FROM allpx a JOIN img i ON a.idx = i.idx
  WHERE a.px >= {threshold}
),
runs AS MATERIALIZED (
  SELECT idx, image_id, b, r, MIN(c) AS c0, MAX(c) AS c1,
         MIN(p) AS rlab
  FROM (SELECT *,
               c - ROW_NUMBER() OVER (PARTITION BY idx, b, r ORDER BY c)
                 AS grp
        FROM fg)
  GROUP BY idx, image_id, b, r, grp
),
radj AS (
  SELECT a.idx, a.b, a.rlab AS x, n.rlab AS y
  FROM runs a JOIN runs n ON n.idx = a.idx AND n.b = a.b
   AND n.r = a.r + 1 AND n.c0 <= a.c1 AND a.c0 <= n.c1
),
redges AS (
  SELECT idx, b, x, y FROM radj
  UNION
  SELECT idx, b, y AS x, x AS y FROM radj
),
conn(idx, b, n, m) AS (
  SELECT idx, b, rlab, rlab FROM runs
  UNION
  SELECT e.idx, e.b, e.y, c.m
  FROM redges e JOIN conn c ON c.idx = e.idx AND c.b = e.b AND c.n = e.x
),
rcomp AS (
  SELECT idx, b, n AS rlab, MIN(m) AS comp
  FROM conn GROUP BY idx, b, n
),
px AS (
  SELECT f.idx, f.image_id, f.b, rc.comp, f.r, f.c, f.wt
  FROM fg f
  JOIN runs u ON u.idx = f.idx AND u.b = f.b AND u.r = f.r
             AND f.c BETWEEN u.c0 AND u.c1
  JOIN rcomp rc ON rc.idx = u.idx AND rc.b = u.b AND rc.rlab = u.rlab
)"""


def _region_label_sql(img_where: str, threshold: int) -> str:
    """Connected-component labeling in plain SQL (run-length CCL; see
    _runccl_ctes): per-region area/bbox/weighted checksums."""
    return f"""
WITH RECURSIVE {_allpx_cte(img_where)},{_runccl_ctes(threshold)}
SELECT image_id,
       CAST(b AS BIGINT) AS band,
       CAST(comp AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS area,
       CAST(MIN(r) AS BIGINT) AS min_r,
       CAST(MIN(c) AS BIGINT) AS min_c,
       CAST(MAX(r) AS BIGINT) AS max_r,
       CAST(MAX(c) AS BIGINT) AS max_c,
       CAST(SUM(wt) AS BIGINT) AS wsum
FROM px GROUP BY image_id, b, comp
"""


def _sieve_sql(img_where: str, threshold: int, min_size: int) -> str:
    """GDAL SieveFilter oracle: run-length CCL components (shared CTE
    chain), regions with area < min_size become nodata, and the check
    is the per-(image, band, tile) BIGINT checksum + count of the
    pixels that SURVIVE — exactly what the engine's sieve_stage leaves
    valid after writing the sentinel into killed pixels."""
    return f"""
WITH RECURSIVE {_allpx_cte(img_where)},{_runccl_ctes(threshold)},
small AS (
  SELECT idx, b, comp FROM px
  GROUP BY idx, b, comp HAVING COUNT(*) < {min_size}
),
killed AS (
  SELECT p.idx, p.b, p.r, p.c
  FROM px p JOIN small s
    ON s.idx = p.idx AND s.b = p.b AND s.comp = p.comp
),
kept AS (
  SELECT a.image_id, a.b, a.r, a.c, a.px
  FROM allpx a
  LEFT JOIN killed k
    ON k.idx = a.idx AND k.b = a.b AND k.r = a.r AND k.c = a.c
  WHERE k.idx IS NULL
)
SELECT image_id,
       CAST(b AS BIGINT) AS band,
       CAST((r // 64) * 64 AS BIGINT) AS win_row_off,
       CAST((c // 64) * 64 AS BIGINT) AS win_col_off,
       CAST(SUM(px) AS BIGINT) AS checksum,
       CAST(COUNT(*) AS BIGINT) AS n_valid
FROM kept GROUP BY image_id, b, win_row_off, win_col_off
"""


_IMG_CTE = """
img AS (
  SELECT doc_id AS idx,
         'img' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS image_id,
         CASE doc_id % 4 WHEN 0 THEN 64 WHEN 1 THEN 128 WHEN 2 THEN 200 ELSE 256 END AS w,
         CASE (doc_id + 1) % 4 WHEN 0 THEN 64 WHEN 1 THEN 128 WHEN 2 THEN 200 ELSE 256 END AS h,
         CASE doc_id % 4 WHEN 0 THEN 'raw16' WHEN 1 THEN 'rawu8' WHEN 2 THEN 'pngz' ELSE 'lq8' END AS fmt,
         CASE WHEN doc_id % 5 = 0 THEN 3 ELSE 1 END AS band_count
  FROM documents
),
img4326 AS (
  SELECT *,
         -6e1 + (idx % 64) * w * 5e-3 AS left_x,
         4e1 - ((idx // 64) % 64) * h * 5e-3 AS top_y,
         (idx % 64) * w AS gx0,
         ((idx // 64) % 64) * h AS gy0
  FROM img WHERE idx % 7 <> 6
)
"""

_TILES_CTE = (
    _IMG_CTE
    + """,
tiles AS (
  SELECT i.image_id, i.idx, i.left_x, i.top_y, i.gx0, i.gy0,
         tr.tr AS tile_row, tc.tc AS tile_col,
         CAST(LEAST(64, i.h - tr.tr * 64) AS INT) AS th,
         CAST(LEAST(64, i.w - tc.tc * 64) AS INT) AS tw,
         CAST(tr.tr * 64 AS INT) AS win_row_off,
         CAST(tc.tc * 64 AS INT) AS win_col_off,
         (5e-3 * (tc.tc * 64) + i.left_x) AS tile_left,
         ((-5e-3) * (tr.tr * 64) + i.top_y) AS tile_top
  FROM img4326 i,
       LATERAL (SELECT unnest(range(0, CAST(ceil(i.h / 6.4e1) AS BIGINT))) AS tr) tr,
       LATERAL (SELECT unnest(range(0, CAST(ceil(i.w / 6.4e1) AS BIGINT))) AS tc) tc
),
tiles_c AS (
  SELECT *,
         (5e-3 * (tw / 2e0) + tile_left) AS lon_c,
         ((-5e-3) * (th / 2e0) + tile_top) AS lat_c
  FROM tiles
)
"""
)

# geometry generation mirror (rect + point kinds; corpus.geometry_row)
_GEOMS_CTE = """
geoms AS (
  SELECT k,
         'poly' || lpad(CAST(k AS VARCHAR), 6, '0') AS geom_id,
         (k * 2654435761) % 4294967296 AS h1,
         CASE k % 5 WHEN 0 THEN 'rect' WHEN 1 THEN 'convex'
              WHEN 2 THEN 'concave' WHEN 3 THEN 'point' ELSE 'rect' END AS kind
  FROM range(0, 200) t(k)
),
geoms_placed AS (
  SELECT *,
         CASE WHEN k % 10 < 8 THEN (h1 % 40) * 16
              ELSE ((h1 // 1600) % 256) * 64 END AS gx,
         CASE WHEN k % 10 < 8 THEN ((h1 // 40) % 40) * 16
              ELSE ((h1 // 409600) % 256) * 64 END AS gy
  FROM geoms
),
rects AS (
  SELECT geom_id, gx, gy,
         8 + (h1 // 7) % 56 AS wpx,
         8 + (h1 // 11) % 56 AS hpx
  FROM geoms_placed WHERE kind = 'rect'
),
points AS (
  SELECT geom_id,
         (-6e1 + (gx + (h1 // 13) % 16) * 5e-3) + 2.5e-3 AS px,
         (4e1 - (gy + (h1 // 17) % 16) * 5e-3) - 2.5e-3 AS py
  FROM geoms_placed WHERE kind = 'point'
)
"""

_PIP_RECT_SQL = f"""
WITH {_TILES_CTE},
{_GEOMS_CTE.strip().lstrip()}
SELECT t.image_id, t.tile_row, t.tile_col, r.geom_id,
       CAST(
         GREATEST(0, LEAST(r.gx + r.wpx, t.gx0 + t.win_col_off + t.tw)
                     - GREATEST(r.gx, t.gx0 + t.win_col_off))
         * GREATEST(0, LEAST(r.gy + r.hpx, t.gy0 + t.win_row_off + t.th)
                       - GREATEST(r.gy, t.gy0 + t.win_row_off))
         AS BIGINT) AS n_pixels
FROM tiles_c t CROSS JOIN rects r
WHERE GREATEST(0, LEAST(r.gx + r.wpx, t.gx0 + t.win_col_off + t.tw)
                  - GREATEST(r.gx, t.gx0 + t.win_col_off))
    * GREATEST(0, LEAST(r.gy + r.hpx, t.gy0 + t.win_row_off + t.th)
                  - GREATEST(r.gy, t.gy0 + t.win_row_off)) > 0
"""


# Exact concave-polygon clip gate: regenerate the star vertices
# (sha-derived radii, linspace angles), run the SAME even-odd
# ray-casting rule as kernels/geometry.py points_in_rings per pixel
# center, apply the bbox-index candidate rule and the drop-empty
# contract, and count surviving valid pixels (disc validity only —
# no per-pixel transcendentals needed).
_CLIP_GEOM_SQL = f"""
WITH {_TILES_CTE},
{_GEOMS_CTE.strip().lstrip()},
stars AS (
  SELECT k, geom_id, gx, gy FROM geoms_placed WHERE kind = 'concave'
),
sv AS (
  SELECT s.geom_id, i.i,
         (-6e1 + s.gx * 5e-3)
           + (CASE WHEN i.i % 2 = 0
                THEN 5e-2 + (CAST(('0x' || substr(sha256(s.geom_id), 5, 2)) AS INT) / 2.55e2) * 2.5e-1
                ELSE 2e-2 + (CAST(('0x' || substr(sha256(s.geom_id), 7, 2)) AS INT) / 2.55e2) * 5e-2 END)
             * cos(CAST(i.i AS DOUBLE) * ((2*pi()) / 1e1)) AS vx,
         (4e1 - s.gy * 5e-3)
           + (CASE WHEN i.i % 2 = 0
                THEN 5e-2 + (CAST(('0x' || substr(sha256(s.geom_id), 5, 2)) AS INT) / 2.55e2) * 2.5e-1
                ELSE 2e-2 + (CAST(('0x' || substr(sha256(s.geom_id), 7, 2)) AS INT) / 2.55e2) * 5e-2 END)
             * sin(CAST(i.i AS DOUBLE) * ((2*pi()) / 1e1)) AS vy
  FROM stars s, LATERAL (SELECT unnest(range(0, 10)) AS i) i
),
gbox AS (
  SELECT geom_id, MIN(vx) AS minx, MAX(vx) AS maxx,
         MIN(vy) AS miny, MAX(vy) AS maxy
  FROM sv GROUP BY geom_id
),
edges AS (
  SELECT a.geom_id, a.vx AS ex1, a.vy AS ey1, b.vx AS ex2, b.vy AS ey2
  FROM sv a JOIN sv b ON a.geom_id = b.geom_id AND b.i = (a.i + 1) % 10
),
pairs AS (
  SELECT t.image_id, t.idx, t.tile_row, t.tile_col, t.th, t.tw,
         t.tile_left, t.tile_top, t.win_row_off, t.win_col_off,
         g.geom_id, g.minx, g.maxx, g.miny, g.maxy
  FROM tiles t JOIN gbox g
    ON g.minx <= (5e-3 * t.tw + t.tile_left) AND g.maxx >= t.tile_left
   AND g.miny <= t.tile_top AND g.maxy >= ((-5e-3) * t.th + t.tile_top)
),
pairpx AS (
  SELECT p.*, r.r, c.c,
         (5e-3 * (CAST(c.c AS DOUBLE) + 5e-1)) + p.tile_left AS px,
         ((-5e-3) * (CAST(r.r AS DOUBLE) + 5e-1)) + p.tile_top AS py
  FROM pairs p,
       LATERAL (SELECT unnest(range(0, p.th)) AS r) r,
       LATERAL (SELECT unnest(range(0, p.tw)) AS c) c
  WHERE (5e-3 * (CAST(c.c AS DOUBLE) + 5e-1)) + p.tile_left BETWEEN p.minx AND p.maxx
    AND ((-5e-3) * (CAST(r.r AS DOUBLE) + 5e-1)) + p.tile_top BETWEEN p.miny AND p.maxy
),
cross_ AS (
  SELECT pp.image_id, pp.tile_row, pp.tile_col, pp.r, pp.c, pp.geom_id,
         SUM(CASE WHEN ((e.ey1 > pp.py) <> (e.ey2 > pp.py))
                   AND pp.px < (((e.ex2 - e.ex1) * (pp.py - e.ey1) / (e.ey2 - e.ey1)) + e.ex1)
              THEN 1 ELSE 0 END) AS ncross
  FROM pairpx pp JOIN edges e ON pp.geom_id = e.geom_id
  GROUP BY pp.image_id, pp.tile_row, pp.tile_col, pp.r, pp.c, pp.geom_id
),
inside AS (
  SELECT image_id, tile_row, tile_col, r, c, bool_or(ncross % 2 = 1) AS ins
  FROM cross_ GROUP BY image_id, tile_row, tile_col, r, c
),
tinfo AS (
  SELECT DISTINCT image_id, idx, tile_row, tile_col, win_row_off, win_col_off FROM pairs
),
ipar AS (
  SELECT idx, h, w, band_count,
         CAST(('0x' || substr(sha256(image_id), 9, 2)) AS INT) % h AS cr,
         CAST(('0x' || substr(sha256(image_id), 11, 2)) AS INT) % w AS cc,
         5e-2 * h * w / pi() AS radius2
  FROM img4326
),
agg AS (
  SELECT i.image_id, i.tile_row, i.tile_col,
         COUNT(*) FILTER (WHERE i.ins) AS n_inside,
         COUNT(*) FILTER (WHERE i.ins AND NOT (
           ((t.win_row_off + i.r) - p.cr) * ((t.win_row_off + i.r) - p.cr)
           + ((t.win_col_off + i.c) - p.cc) * ((t.win_col_off + i.c) - p.cc)
           < p.radius2)) AS n_valid_1b,
         MAX(p.band_count) AS band_count
  FROM inside i
  JOIN tinfo t ON i.image_id = t.image_id AND i.tile_row = t.tile_row AND i.tile_col = t.tile_col
  JOIN ipar p ON t.idx = p.idx
  GROUP BY i.image_id, i.tile_row, i.tile_col
)
SELECT image_id, tile_row, tile_col,
       CAST(band_count * n_valid_1b AS BIGINT) AS n_valid
FROM agg WHERE n_inside >= 1
ORDER BY image_id, tile_row, tile_col
"""


# ---- md5-gram dedup oracles: SQL that replicates functions/dedup.py's
# md5 gram-hash mode bit-exactly (gram = words joined by ' ', hash =
# md5_number_upper = first 8 md5 digest bytes little-endian)


def _gram_cte_sql(n: int) -> str:
    """tok+grams CTEs mirroring MinHasher._gram_hashes_md5: lowercase,
    whitespace-split, drop empty tokens; short docs (0 < len < n) hash
    their whole token run; empty docs contribute no grams."""
    joined = " || ' ' || ".join(
        "ws[i]" if j == 0 else f"ws[i+{j}]" for j in range(n)
    )
    stop = "len(ws)" if n == 2 else f"len(ws) - {n - 2}"
    return f"""tok AS (
  SELECT doc_id, list_filter(string_split(lower(coalesce(text,'')), ' '), w -> w <> '') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id,
    CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[])
         WHEN len(ws) < {n} THEN [array_to_string(ws, ' ')]
         ELSE list_transform(range(1, {stop}), i -> {joined})
    END AS gs
  FROM tok
)"""


def _minhash_md5_oracle(num_perm: int = 64, bands: int = 16,
                        ngram: int = 3) -> str:
    from rioxarray_ray.functions.dedup import _minhash_params, _MERSENNE, _POLY

    a, b = _minhash_params(num_perm)
    perm_vals = ",".join(
        f"({p},{int(a[p])},{int(b[p])})" for p in range(num_perm)
    )
    r = num_perm // bands
    pivots = ",\n         ".join(
        f"MAX(CASE WHEN p % {r} = {t} THEN s END) AS s{t}" for t in range(r)
    )
    # rolling-poly band bucket: acc = (acc * POLY + s_t) mod 2^64, >> 1
    acc = "CAST(s0 AS HUGEINT)"
    for t in range(1, r):
        acc = f"((({acc}) * {int(_POLY)} + s{t}) % {1 << 64}::HUGEINT)"
    return f"""
WITH perms(p, a, b) AS (VALUES {perm_vals}),
{_gram_cte_sql(ngram)},
gh AS (
  SELECT doc_id, CAST(md5_number_upper(g) % {_MERSENNE} AS BIGINT) AS x
  FROM (SELECT doc_id, unnest(gs) AS g FROM grams)
),
sig AS (
  SELECT d.doc_id, perms.p,
         COALESCE(MIN((gh.x * perms.a + perms.b) % {_MERSENNE}), {_MERSENNE}) AS s
  FROM documents d CROSS JOIN perms LEFT JOIN gh ON gh.doc_id = d.doc_id
  GROUP BY d.doc_id, perms.p
),
bsig AS (
  SELECT doc_id, p // {r} AS band,
         {pivots}
  FROM sig GROUP BY doc_id, p // {r}
),
buckets AS (
  SELECT doc_id, band, CAST(({acc}) // 2 AS BIGINT) AS bucket FROM bsig
)
SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
FROM buckets l
JOIN buckets r ON l.band = r.band AND l.bucket = r.bucket
              AND l.doc_id < r.doc_id
"""


_SIMHASH_MD5_CTE = f"""{_gram_cte_sql(2)},
gh AS (
  SELECT doc_id, md5_number_upper(g) AS h
  FROM (SELECT doc_id, unnest(gs) AS g FROM grams)
),
votes AS (
  SELECT d.doc_id, bits.b,
         COALESCE(SUM(CASE WHEN (gh.h >> bits.b) & 1 = 1 THEN 1 ELSE -1 END), 0) AS v
  FROM documents d CROSS JOIN (SELECT unnest(range(64)) AS b) bits
  LEFT JOIN gh ON gh.doc_id = d.doc_id
  GROUP BY d.doc_id, bits.b
),
sh AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN CAST(1 AS HUGEINT) << CAST(b AS INT) ELSE 0 END) AS u
  FROM votes GROUP BY doc_id
)"""


# closed-form 1x16x16 pixel grid of the image-dedup gates (_ahash_media)
# + the integer-exact aHash rule of functions/multimodal.ahash64:
# bit k=(i//16//2)*8+(i%16//2) set iff block_sum * 256 > total_sum * 4
_AHASH_CTE = """px AS (
  SELECT d.doc_id, t.i,
         CASE WHEN d.doc_id % 3 = 1 AND t.i = 37
                THEN ((d.doc_id // 3) * 53 + t.i * t.i + 128) % 256
              WHEN d.doc_id % 3 = 2 AND t.i = 74
                THEN ((d.doc_id // 3) * 53 + t.i * t.i + 128) % 256
              ELSE ((d.doc_id // 3) * 53 + t.i * t.i) % 256 END AS v
  FROM documents d CROSS JOIN generate_series(0, 255) t(i)
),
tot AS (SELECT doc_id, SUM(v) AS ts FROM px GROUP BY doc_id),
blk AS (
  SELECT doc_id, ((i // 16) // 2) * 8 + ((i % 16) // 2) AS k, SUM(v) AS bs
  FROM px GROUP BY doc_id, ((i // 16) // 2) * 8 + ((i % 16) // 2)
),
hb AS (
  SELECT b.doc_id,
         SUM(CASE WHEN b.bs * 256 > t.ts * 4
                  THEN CAST(1 AS HUGEINT) << CAST(b.k AS INT)
                  ELSE CAST(0 AS HUGEINT) END) AS u
  FROM blk b JOIN tot t ON b.doc_id = t.doc_id
  GROUP BY b.doc_id
)"""


def oracle_sql() -> dict[str, str]:
    box = _BOX
    sql = {
        "geo_footprint": f"""
WITH {_IMG_CTE}
SELECT image_id, w, h, fmt, band_count,
       left_x,
       (-5e-3) * h + top_y AS bottom_y,
       5e-3 * w + left_x AS right_x,
       top_y
FROM img4326
""",
        "geo_tile_cells": f"""
WITH {_TILES_CTE}
SELECT image_id, tile_row, tile_col, th, tw, win_row_off, win_col_off,
       CAST(10 * 4503599627370496
            + CAST(floor((9e1 - lat_c) / 1.8e2 * 1024) AS BIGINT) * 67108864
            + CAST(floor((lon_c + 1.8e2) / 3.6e2 * 1024) AS BIGINT)
            AS BIGINT) AS cell
FROM tiles_c
""",
        "geo_clip_box": f"""
WITH {_TILES_CTE},
inter AS (
  SELECT *,
         GREATEST({box[0]}e0, tile_left) AS ix0,
         GREATEST({box[1]}e0, ((-5e-3) * th + tile_top)) AS iy0,
         LEAST({box[2]}e0, (5e-3 * tw + tile_left)) AS ix1,
         LEAST({box[3]}e0, tile_top) AS iy1
  FROM tiles_c
  WHERE {box[0]}e0 < (5e-3 * tw + tile_left) AND {box[2]}e0 > tile_left
    AND {box[1]}e0 < tile_top AND {box[3]}e0 > ((-5e-3) * th + tile_top)
),
win AS (
  SELECT *,
         ((-5e-3) / (5e-3 * (-5e-3))) * ix0
           + (-(((-5e-3) / (5e-3 * (-5e-3))) * tile_left)) AS c0,
         ((-5e-3) / (5e-3 * (-5e-3))) * ix1
           + (-(((-5e-3) / (5e-3 * (-5e-3))) * tile_left)) AS c1,
         (0.005 / (5e-3 * (-5e-3))) * iy1
           + (-((0.005 / (5e-3 * (-5e-3))) * tile_top)) AS r0,
         (0.005 / (5e-3 * (-5e-3))) * iy0
           + (-((0.005 / (5e-3 * (-5e-3))) * tile_top)) AS r1
  FROM inter
),
sliced AS (
  SELECT *,
         GREATEST(CAST(floor(r0 + 1e-9) AS BIGINT), 0) AS ri,
         GREATEST(CAST(floor(c0 + 1e-9) AS BIGINT), 0) AS ci,
         CAST(ceil((r0 + (r1 - r0)) - 1e-9) AS BIGINT)
           - CAST(floor(r0 + 1e-9) AS BIGINT) AS rh,
         CAST(ceil((c0 + (c1 - c0)) - 1e-9) AS BIGINT)
           - CAST(floor(c0 + 1e-9) AS BIGINT) AS cw
  FROM win
)
SELECT image_id, tile_row, tile_col,
       CAST(LEAST(cw, tw - ci) AS INT) AS cw,
       CAST(LEAST(rh, th - ri) AS INT) AS ch,
       (5e-3 * ci + tile_left) AS new_left,
       ((-5e-3) * ri + tile_top) AS new_top
FROM sliced
WHERE LEAST(cw, tw - ci) >= 1 AND LEAST(rh, th - ri) >= 1
""",
        "geo_pip_rect": _PIP_RECT_SQL,
        "geo_pip_shuffle": _PIP_RECT_SQL,
        "geo_contour_edges_global": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")},
m AS (
  SELECT idx, image_id, b, r, c,
         CASE WHEN px >= 120 THEN 1 ELSE 0 END AS mk
  FROM allpx
),
hh AS (
  SELECT a.image_id, a.b AS band, a.r // 64 AS tile_row,
         a.c // 64 AS tile_col,
         1 + ((a.r % 64) * 64 + (a.c % 64)) % 97 AS wt
  FROM m a JOIN m n ON n.idx = a.idx AND n.b = a.b
                   AND n.r = a.r AND n.c = a.c + 1
  WHERE a.mk <> n.mk
),
vv AS (
  SELECT a.image_id, a.b AS band, a.r // 64 AS tile_row,
         a.c // 64 AS tile_col,
         1 + ((a.r % 64) * 64 + (a.c % 64)) % 97 AS wt
  FROM m a JOIN m n ON n.idx = a.idx AND n.b = a.b
                   AND n.r = a.r + 1 AND n.c = a.c
  WHERE a.mk <> n.mk
),
uni AS (
  SELECT *, 'h' AS kind FROM hh
  UNION ALL
  SELECT *, 'v' AS kind FROM vv
)
SELECT image_id,
       CAST(tile_row AS BIGINT) AS tile_row,
       CAST(tile_col AS BIGINT) AS tile_col,
       CAST(band AS BIGINT) AS band,
       CAST(COUNT(*) FILTER (kind = 'h') AS BIGINT) AS n_h,
       CAST(COUNT(*) FILTER (kind = 'v') AS BIGINT) AS n_v,
       CAST(COALESCE(SUM(wt) FILTER (kind = 'h'), 0) AS BIGINT) AS wsum_h,
       CAST(COALESCE(SUM(wt) FILTER (kind = 'v'), 0) AS BIGINT) AS wsum_v
FROM uni GROUP BY image_id, tile_row, tile_col, band
""",
        "geo_contour_edges": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")},
m AS (
  SELECT idx, image_id, b, r, c,
         CASE WHEN px >= 120 THEN 1 ELSE 0 END AS mk
  FROM allpx
),
hh AS (
  SELECT a.image_id, a.b AS band, a.r // 64 AS tile_row,
         a.c // 64 AS tile_col,
         1 + ((a.r % 64) * 64 + (a.c % 64)) % 97 AS wt
  FROM m a JOIN m n ON n.idx = a.idx AND n.b = a.b
                   AND n.r = a.r AND n.c = a.c + 1
  WHERE a.c // 64 = (a.c + 1) // 64 AND a.mk <> n.mk
),
vv AS (
  SELECT a.image_id, a.b AS band, a.r // 64 AS tile_row,
         a.c // 64 AS tile_col,
         1 + ((a.r % 64) * 64 + (a.c % 64)) % 97 AS wt
  FROM m a JOIN m n ON n.idx = a.idx AND n.b = a.b
                   AND n.r = a.r + 1 AND n.c = a.c
  WHERE a.r // 64 = (a.r + 1) // 64 AND a.mk <> n.mk
),
uni AS (
  SELECT *, 'h' AS kind FROM hh
  UNION ALL
  SELECT *, 'v' AS kind FROM vv
)
SELECT image_id,
       CAST(tile_row AS BIGINT) AS tile_row,
       CAST(tile_col AS BIGINT) AS tile_col,
       CAST(band AS BIGINT) AS band,
       CAST(COUNT(*) FILTER (kind = 'h') AS BIGINT) AS n_h,
       CAST(COUNT(*) FILTER (kind = 'v') AS BIGINT) AS n_v,
       CAST(COALESCE(SUM(wt) FILTER (kind = 'h'), 0) AS BIGINT) AS wsum_h,
       CAST(COALESCE(SUM(wt) FILTER (kind = 'v'), 0) AS BIGINT) AS wsum_v
FROM uni GROUP BY image_id, tile_row, tile_col, band
""",
        "geo_temporal_trend": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")},
imj AS (
  SELECT idx, (idx % 64) * w AS gx0, ((idx // 64) % 64) * h AS gy0 FROM img
),
gpx AS (
  SELECT p.idx AS t, p.b AS band, i.gx0 + p.c AS gx, i.gy0 + p.r AS gy, p.px
  FROM allpx p JOIN imj i ON i.idx = p.idx
),
cell AS (
  SELECT band, gx, gy,
         COUNT(*) AS n, SUM(t) AS st, SUM(t * t) AS st2,
         SUM(px) AS sy, SUM(t * px) AS sty
  FROM gpx GROUP BY band, gx, gy
  HAVING COUNT(*) >= 2
     AND COUNT(*) * SUM(t * t) - SUM(t) * SUM(t) <> 0
),
nd2 AS (
  SELECT band, gx // 64 AS ctx, gy // 64 AS cty,
         (gy % 64) * 64 + (gx % 64) AS p,
         n * sty - st * sy AS num, n * st2 - st * st AS den
  FROM cell
)
SELECT CAST(ctx AS BIGINT) AS ctx, CAST(cty AS BIGINT) AS cty,
       CAST(band AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_ok,
       CAST(SUM(num * (1 + p % 97)) AS BIGINT) AS num_wsum,
       CAST(SUM(den * (1 + p % 97)) AS BIGINT) AS den_wsum
FROM nd2 GROUP BY ctx, cty, band
""",
        "geo_histogram": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")}
SELECT image_id,
       CAST(floor(CAST(px AS DOUBLE) / 16) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM allpx
GROUP BY image_id, floor(CAST(px AS DOUBLE) / 16)
""",
        "geo_band_math": f"""
WITH {_allpx_cte(
    "doc_id < 320 AND doc_id % 5 = 0 AND doc_id % 7 <> 6")},
nd AS (
  SELECT b0.image_id,
         b0.r // 64 AS tile_row, b0.c // 64 AS tile_col,
         round_even(((b1.px - b0.px) / CAST(b1.px + b0.px AS DOUBLE)) * 1e6,
                    0) AS ndv
  FROM (SELECT * FROM allpx WHERE b = 0) b0
  JOIN (SELECT * FROM allpx WHERE b = 1) b1
    ON b1.idx = b0.idx AND b1.r = b0.r AND b1.c = b0.c
  WHERE (b1.px + b0.px) <> 0
)
SELECT image_id,
       CAST(tile_row AS BIGINT) AS tile_row,
       CAST(tile_col AS BIGINT) AS tile_col,
       CAST(COUNT(*) AS BIGINT) AS n_ok,
       CAST(SUM(CAST(ndv AS BIGINT)) AS BIGINT) AS nd_sum,
       CAST(MIN(CAST(ndv AS BIGINT)) AS BIGINT) AS nd_min,
       CAST(MAX(CAST(ndv AS BIGINT)) AS BIGINT) AS nd_max
FROM nd
GROUP BY image_id, tile_row, tile_col
""",
        "geo_overviews": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")},
lv AS (SELECT unnest([2, 4, 8]) AS level),
blocks AS (
  SELECT p.image_id, p.idx, p.b AS band, lv.level,
         p.r // 64 AS tile_row, p.c // 64 AS tile_col,
         (p.r % 64) // lv.level AS br, (p.c % 64) // lv.level AS bc,
         CAST(floor(CAST(SUM(p.px) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ov
  FROM allpx p CROSS JOIN lv
  GROUP BY p.image_id, p.idx, p.b, lv.level,
           p.r // 64, p.c // 64,
           (p.r % 64) // lv.level, (p.c % 64) // lv.level
),
dims AS (
  SELECT bl.*,
         CAST(LEAST(64, i.h - 64 * bl.tile_row) AS BIGINT) // bl.level
           AS ov_h,
         CAST(LEAST(64, i.w - 64 * bl.tile_col) AS BIGINT) // bl.level
           AS ov_w
  FROM blocks bl JOIN img i ON i.idx = bl.idx
)
SELECT image_id,
       CAST(tile_row AS BIGINT) AS tile_row,
       CAST(tile_col AS BIGINT) AS tile_col,
       CAST(band AS BIGINT) AS band,
       CAST(level AS BIGINT) AS level,
       CAST(ov_h AS BIGINT) AS ov_h,
       CAST(ov_w AS BIGINT) AS ov_w,
       CAST(COUNT(*) AS BIGINT) AS n_valid,
       CAST(SUM(ov * (1 + (br * ov_w + bc) % 97)) AS BIGINT) AS wsum
FROM dims
GROUP BY image_id, tile_row, tile_col, band, level, ov_h, ov_w
""",
        "geo_zonal_stats": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")},
imj AS (
  SELECT *, (idx % 64) * w AS gx0, ((idx // 64) % 64) * h AS gy0 FROM img
),
{_GEOMS_CTE.strip().lstrip()},
counts AS (
  SELECT r.geom_id,
         SUM(GREATEST(0, LEAST(r.gx + r.wpx, i.gx0 + i.w) - GREATEST(r.gx, i.gx0))
           * GREATEST(0, LEAST(r.gy + r.hpx, i.gy0 + i.h) - GREATEST(r.gy, i.gy0))
         ) AS n_pixels
  FROM imj i CROSS JOIN rects r
  GROUP BY r.geom_id
  HAVING SUM(GREATEST(0, LEAST(r.gx + r.wpx, i.gx0 + i.w) - GREATEST(r.gx, i.gx0))
           * GREATEST(0, LEAST(r.gy + r.hpx, i.gy0 + i.h) - GREATEST(r.gy, i.gy0))) > 0
),
vals AS (
  SELECT r.geom_id,
         COUNT(*) AS n_inside,
         SUM(p.px) AS sum_inside,
         MIN(p.px) AS min_inside,
         MAX(p.px) AS max_inside
  FROM allpx p
  JOIN imj i ON p.idx = i.idx
  JOIN rects r
    ON i.gx0 + p.c >= r.gx AND i.gx0 + p.c < r.gx + r.wpx
   AND i.gy0 + p.r >= r.gy AND i.gy0 + p.r < r.gy + r.hpx
  GROUP BY r.geom_id
)
SELECT c.geom_id,
       CAST(c.n_pixels AS BIGINT) AS n_pixels,
       CAST(COALESCE(v.n_inside, 0) AS BIGINT) AS n_inside,
       CAST(COALESCE(v.sum_inside, 0) AS BIGINT) AS sum_inside,
       CAST(COALESCE(v.min_inside, -999999) AS BIGINT) AS min_inside,
       CAST(COALESCE(v.max_inside, -999999) AS BIGINT) AS max_inside
FROM counts c LEFT JOIN vals v USING (geom_id)
""",
        "geo_change_crosstab": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")},
imj AS (
  SELECT *, (idx % 64) * w AS gx0, ((idx // 64) % 64) * h AS gy0 FROM img
),
gpx AS (
  SELECT p.idx, i.image_id, i.gx0 + p.c AS gx, i.gy0 + p.r AS gy, p.b, p.px
  FROM allpx p JOIN imj i ON p.idx = i.idx
)
SELECT a.image_id AS image_a, b.image_id AS image_b, CAST(a.b AS INT) AS band,
       CAST(floor(a.px / 2.56e2) AS BIGINT) AS class_a,
       CAST(floor(b.px / 2.56e2) AS BIGINT) AS class_b,
       CAST(COUNT(*) AS BIGINT) AS n
FROM gpx a JOIN gpx b
  ON a.gx = b.gx AND a.gy = b.gy AND a.b = b.b AND a.idx < b.idx
GROUP BY 1, 2, 3, 4, 5
""",
        "geo_terrain": f"""
WITH {_allpx_cte("doc_id < 16 AND doc_id % 7 <> 6")},
offs AS (
  SELECT dr.dr, dc.dc
  FROM (SELECT unnest(range(-1, 2)) AS dr) dr,
       (SELECT unnest(range(-1, 2)) AS dc) dc
),
shifted AS (
  -- a source pixel shifted by (dr, dc) sits at relative offset
  -- (-dr, -dc) from its target: Horn weights folded in at shift time
  SELECT idx, b, r + o.dr AS r, c + o.dc AS c,
         px * ((-o.dc) * (2 - abs(o.dr))) AS wxv,
         px * ((-o.dr) * (2 - abs(o.dc))) AS wyv
  FROM allpx CROSS JOIN offs o
),
agg AS (
  SELECT idx, b, r, c, SUM(wxv) AS gx, SUM(wyv) AS gy, COUNT(*) AS fcnt
  FROM shifted GROUP BY 1, 2, 3, 4
),
nbr AS (
  SELECT a.image_id, a.b, a.r, a.c, g.gx, g.gy
  FROM allpx a JOIN agg g
    ON g.idx = a.idx AND g.b = a.b AND g.r = a.r AND g.c = a.c
  WHERE g.fcnt = 9
)
SELECT image_id, CAST(b AS INT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_interior,
       CAST(SUM(gx) AS BIGINT) AS sum_gx,
       CAST(SUM(gy) AS BIGINT) AS sum_gy,
       CAST(SUM(gx * ((r * 1315423911 + c * 2654435761) % 1000003))
            AS BIGINT) AS wsum_gx
FROM nbr GROUP BY 1, 2
""",
        "geo_focal_mean": f"""
WITH {_allpx_cte("doc_id < 16 AND doc_id % 7 <> 6")},
offs AS (
  SELECT dr.dr, dc.dc
  FROM (SELECT unnest(range(-1, 2)) AS dr) dr,
       (SELECT unnest(range(-1, 2)) AS dc) dc
),
shifted AS (
  SELECT idx, b, r + o.dr AS r, c + o.dc AS c, px
  FROM allpx CROSS JOIN offs o
),
agg AS (
  SELECT idx, b, r, c, SUM(px) AS fsum, COUNT(*) AS fcnt
  FROM shifted GROUP BY 1, 2, 3, 4
),
nbr AS (
  SELECT a.image_id, a.b, a.r, a.c, g.fsum, g.fcnt
  FROM allpx a JOIN agg g
    ON g.idx = a.idx AND g.b = a.b AND g.r = a.r AND g.c = a.c
)
SELECT image_id, CAST(b AS INT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_valid,
       CAST(SUM(fsum) AS BIGINT) AS sum_fsum,
       CAST(SUM(fcnt) AS BIGINT) AS sum_fcnt,
       CAST(SUM(fsum * ((r * 1315423911 + c * 2654435761) % 1000003))
            AS BIGINT) AS wsum_fsum
FROM nbr GROUP BY 1, 2
""",
        "geo_focal_mode": f"""
WITH {_allpx_cte("doc_id < 16 AND doc_id % 7 <> 6")},
offs AS (
  SELECT dr.dr, dc.dc
  FROM (SELECT unnest(range(-1, 2)) AS dr) dr,
       (SELECT unnest(range(-1, 2)) AS dc) dc
),
shifted AS (
  SELECT idx, b, r + o.dr AS r, c + o.dc AS c, px
  FROM allpx CROSS JOIN offs o
),
vcount AS (
  SELECT idx, b, r, c, px AS v, COUNT(*) AS n
  FROM shifted GROUP BY 1, 2, 3, 4, 5
),
winner AS (
  SELECT idx, b, r, c, v, n,
         row_number() OVER (PARTITION BY idx, b, r, c
                            ORDER BY n DESC, v ASC) AS rk
  FROM vcount
),
nbr AS (
  SELECT a.image_id, a.b, a.r, a.c, wn.v AS mode, wn.n AS n_modal
  FROM allpx a JOIN winner wn
    ON wn.idx = a.idx AND wn.b = a.b AND wn.r = a.r AND wn.c = a.c
   AND wn.rk = 1
)
SELECT image_id, CAST(b AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_valid,
       CAST(SUM(mode) AS BIGINT) AS sum_mode,
       CAST(SUM(mode * ((r * 1315423911 + c * 2654435761) % 1000003))
            AS BIGINT) AS wsum_mode,
       CAST(SUM(n_modal) AS BIGINT) AS sum_nmodal
FROM nbr GROUP BY 1, 2
""",
        "geo_terrain_indices": f"""
WITH {_allpx_cte("doc_id < 16 AND doc_id % 7 <> 6")},
offs AS (
  SELECT dr.dr, dc.dc
  FROM (SELECT unnest(range(-1, 2)) AS dr) dr,
       (SELECT unnest(range(-1, 2)) AS dc) dc
),
shifted AS MATERIALIZED (
  -- shift->groupby form, not a probe join: the probe form makes DuckDB
  -- materialize a huge intermediate (same lesson as geo_focal_mean)
  SELECT idx, b, r + o.dr AS r, c + o.dc AS c, px AS nv,
         (o.dr = 0 AND o.dc = 0) AS is_center
  FROM allpx CROSS JOIN offs o
),
pairs AS (
  SELECT a.image_id, a.b, a.r, a.c, a.px AS cv, s.nv, s.is_center
  FROM shifted s JOIN allpx a
    ON a.idx = s.idx AND a.b = s.b AND a.r = s.r AND a.c = s.c
),
agg AS (
  SELECT image_id, b, r, c,
         SUM(CASE WHEN NOT is_center THEN ABS(nv - cv) ELSE 0 END) AS tri,
         8 * MAX(cv) - SUM(CASE WHEN NOT is_center THEN nv ELSE 0 END)
           AS tpi,
         MAX(nv) - MIN(nv) AS rough
  FROM pairs GROUP BY image_id, b, r, c
  HAVING COUNT(*) = 9
)
SELECT image_id, CAST(b AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_defined,
       CAST(SUM(tri) AS BIGINT) AS sum_tri,
       CAST(SUM(tri * ((r * 1315423911 + c * 2654435761) % 1000003))
            AS BIGINT) AS wsum_tri,
       CAST(SUM(tpi) AS BIGINT) AS sum_tpi,
       CAST(SUM(rough) AS BIGINT) AS sum_rough
FROM agg GROUP BY image_id, b
""",
        "geo_idw": f"""
WITH {_allpx_cte("doc_id < 16 AND doc_id % 7 <> 6")},
imj AS (
  SELECT *, (idx % 64) * w AS gx0, ((idx // 64) % 64) * h AS gy0 FROM img
),
{_GEOMS_CTE.strip().lstrip()},
ptv AS (
  SELECT CAST(floor((px + 6e1) / 5e-3) AS BIGINT) AS gpx,
         CAST(floor((4e1 - py) / 5e-3) AS BIGINT) AS gpy,
         (CAST(substr(geom_id, 5) AS BIGINT) * 37) % 1000 + 1 AS v
  FROM points
),
pr2 AS (SELECT idx, image_id, gx0, gy0, h, w, unnest(range(0, h)) AS r
        FROM imj),
pxg AS (SELECT idx, image_id, gx0, gy0, r, unnest(range(0, w)) AS c
        FROM pr2),
pairs AS (
  SELECT g.image_id, g.r, g.c, p.v,
         (g.gy0 + g.r - p.gpy) * (g.gy0 + g.r - p.gpy)
         + (g.gx0 + g.c - p.gpx) * (g.gx0 + g.c - p.gpx) AS d2
  FROM pxg g JOIN ptv p
    ON p.gpx BETWEEN g.gx0 + g.c - 12 AND g.gx0 + g.c + 12
   AND p.gpy BETWEEN g.gy0 + g.r - 12 AND g.gy0 + g.r + 12
),
acc AS (
  SELECT image_id, r, c,
         SUM(CASE WHEN d2 = 0 THEN v * 1000000
                  ELSE (v * 1000000) // d2 END) AS num,
         SUM(CASE WHEN d2 = 0 THEN 1000000 ELSE 1000000 // d2 END) AS den
  FROM pairs WHERE d2 <= 144 GROUP BY 1, 2, 3
)
SELECT image_id,
       CAST((r // 64) * 64 AS BIGINT) AS win_row_off,
       CAST((c // 64) * 64 AS BIGINT) AS win_col_off,
       CAST(SUM(num) AS BIGINT) AS sum_num,
       CAST(SUM(num * ((r * 1315423911 + c * 2654435761) % 1000003))
            AS BIGINT) AS wsum_num,
       CAST(SUM(den) AS BIGINT) AS sum_den,
       CAST(COUNT(*) AS BIGINT) AS n_covered
FROM acc GROUP BY image_id, win_row_off, win_col_off
""",
        "geo_pansharpen": f"""
WITH {_allpx_cte("doc_id < 40 AND doc_id % 5 = 0 AND doc_id % 7 <> 6")},
px3 AS (
  SELECT idx, image_id, r, c,
         MAX(CASE WHEN b = 0 THEN px END) AS z0,
         MAX(CASE WHEN b = 1 THEN px END) AS z1,
         MAX(CASE WHEN b = 2 THEN px END) AS z2
  FROM allpx GROUP BY idx, image_id, r, c HAVING COUNT(*) = 3
),
outv AS (
  SELECT image_id, r, c, 0 AS ob,
         (z1 * z0 * 1000 * 2) // GREATEST(z1 + z2, 1) AS v
  FROM px3
  UNION ALL
  SELECT image_id, r, c, 1,
         (z2 * z0 * 1000 * 2) // GREATEST(z1 + z2, 1)
  FROM px3
)
SELECT image_id, CAST(ob AS BIGINT) AS band,
       CAST((r // 64) * 64 AS BIGINT) AS win_row_off,
       CAST((c // 64) * 64 AS BIGINT) AS win_col_off,
       CAST(SUM(v) AS BIGINT) AS checksum,
       CAST(SUM(v * ((r * 1315423911 + c * 2654435761) % 1000003))
            AS BIGINT) AS wsum,
       CAST(COUNT(*) AS BIGINT) AS n_valid
FROM outv GROUP BY image_id, ob, win_row_off, win_col_off
""",
        "geo_flowdir": f"""
WITH {_allpx_cte("doc_id < 16 AND doc_id % 7 <> 6")},
d8 AS (
  -- (dr, dc) are SHIFT offsets: source+shift = center, so the neighbor
  -- sits at (-dr, -dc) from the center — each shift carries the code of
  -- that INVERTED direction (E code 1 rides shift (0,-1), etc.)
  SELECT * FROM (VALUES
    (0, -1, 1, FALSE), (-1, -1, 2, TRUE), (-1, 0, 4, FALSE),
    (-1, 1, 8, TRUE), (0, 1, 16, FALSE), (1, 1, 32, TRUE),
    (1, 0, 64, FALSE), (1, -1, 128, TRUE)
  ) t(dr, dc, code, diag)
),
shifted AS MATERIALIZED (
  SELECT idx, b, r + o.dr AS r, c + o.dc AS c, px AS nv,
         o.code, o.diag
  FROM allpx CROSS JOIN d8 o
),
nbr AS (
  SELECT a.image_id, a.b, a.r, a.c, a.px AS cv, s.nv, s.code, s.diag
  FROM shifted s JOIN allpx a
    ON a.idx = s.idx AND a.b = s.b AND a.r = s.r AND a.c = s.c
),
ranked AS (
  SELECT image_id, b, r, c, code,
         CASE WHEN cv - nv > 0
              THEN (cv - nv) * (cv - nv) * (CASE WHEN diag THEN 1 ELSE 2 END)
              ELSE 0 END AS key,
         COUNT(*) OVER (PARTITION BY image_id, b, r, c) AS n8
  FROM nbr
),
win AS (
  SELECT image_id, b, r, c,
         CASE WHEN MAX(key) = 0 THEN 0
              ELSE MIN(CASE WHEN key = mkey THEN code END) END AS dir
  FROM (SELECT *, MAX(key) OVER (PARTITION BY image_id, b, r, c) AS mkey
        FROM ranked WHERE n8 = 8) GROUP BY image_id, b, r, c
)
SELECT image_id, CAST(b AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_defined,
       CAST(SUM(dir) AS BIGINT) AS sum_dir,
       CAST(SUM(dir * ((r * 1315423911 + c * 2654435761) % 1000003))
            AS BIGINT) AS wsum_dir
FROM win GROUP BY image_id, b
""",
        "geo_flowacc": f"""
WITH RECURSIVE {_allpx_cte("doc_id < 2 AND doc_id % 7 <> 6")},
d8 AS (
  -- inverted shift offsets (see geo_flowdir)
  SELECT * FROM (VALUES
    (0, -1, 1, FALSE), (-1, -1, 2, TRUE), (-1, 0, 4, FALSE),
    (-1, 1, 8, TRUE), (0, 1, 16, FALSE), (1, 1, 32, TRUE),
    (1, 0, 64, FALSE), (1, -1, 128, TRUE)
  ) t(dr, dc, code, diag)
),
shifted AS MATERIALIZED (
  SELECT idx, b, r + o.dr AS r, c + o.dc AS c, px AS nv,
         o.code, o.diag
  FROM allpx CROSS JOIN d8 o
),
nbr AS (
  SELECT a.idx, a.b, a.r, a.c, a.px AS cv, s.nv, s.code, s.diag
  FROM shifted s JOIN allpx a
    ON a.idx = s.idx AND a.b = s.b AND a.r = s.r AND a.c = s.c
),
ranked AS (
  SELECT idx, b, r, c, code,
         CASE WHEN cv - nv > 0
              THEN (cv - nv) * (cv - nv) * (CASE WHEN diag THEN 1 ELSE 2 END)
              ELSE 0 END AS key,
         COUNT(*) OVER (PARTITION BY idx, b, r, c) AS n8
  FROM nbr
),
win AS MATERIALIZED (
  SELECT idx, b, r, c,
         CASE WHEN MAX(key) = 0 THEN 0
              ELSE MIN(CASE WHEN key = mkey THEN code END) END AS dir
  FROM (SELECT *, MAX(key) OVER (PARTITION BY idx, b, r, c) AS mkey
        FROM ranked WHERE n8 = 8) GROUP BY idx, b, r, c
),
dirstep AS MATERIALIZED (
  -- forward step of the flow graph: code -> the (dr, dc) it points AT
  -- (the NON-inverted direction, so negate the shift offsets back)
  SELECT w.idx, w.b, w.r, w.c, -o.dr AS dr, -o.dc AS dc
  FROM win w JOIN d8 o ON o.code = w.dir WHERE w.dir <> 0
),
reach(idx, b, sr, sc, r, c) AS (
  SELECT idx, b, r, c, r, c FROM allpx
  UNION
  SELECT v.idx, v.b, v.sr, v.sc, v.r + s.dr, v.c + s.dc
  FROM reach v JOIN dirstep s
    ON s.idx = v.idx AND s.b = v.b AND s.r = v.r AND s.c = v.c
),
acc AS (
  SELECT a.idx, a.b, a.r, a.c, COUNT(*) AS acc
  FROM reach a GROUP BY a.idx, a.b, a.r, a.c
),
img2 AS (SELECT idx, image_id FROM img),
masked AS (
  SELECT i.image_id, w.b, w.r, w.c, x.acc
  FROM win w
  JOIN acc x ON x.idx = w.idx AND x.b = w.b AND x.r = w.r AND x.c = w.c
  JOIN img2 i ON i.idx = w.idx
)
SELECT image_id, CAST(b AS BIGINT) AS band,
       CAST((r // 64) * 64 AS BIGINT) AS win_row_off,
       CAST((c // 64) * 64 AS BIGINT) AS win_col_off,
       CAST(COUNT(*) AS BIGINT) AS n_defined,
       CAST(SUM(acc) AS BIGINT) AS sum_acc,
       CAST(SUM(acc * ((r * 1315423911 + c * 2654435761) % 1000003))
            AS BIGINT) AS wsum_acc
FROM masked GROUP BY image_id, b, win_row_off, win_col_off
""",
        "geo_watershed": f"""
WITH RECURSIVE {_allpx_cte("doc_id < 2 AND doc_id % 7 <> 6")},
d8 AS (
  -- inverted shift offsets (see geo_flowdir)
  SELECT * FROM (VALUES
    (0, -1, 1, FALSE), (-1, -1, 2, TRUE), (-1, 0, 4, FALSE),
    (-1, 1, 8, TRUE), (0, 1, 16, FALSE), (1, 1, 32, TRUE),
    (1, 0, 64, FALSE), (1, -1, 128, TRUE)
  ) t(dr, dc, code, diag)
),
shifted AS MATERIALIZED (
  SELECT idx, b, r + o.dr AS r, c + o.dc AS c, px AS nv,
         o.code, o.diag
  FROM allpx CROSS JOIN d8 o
),
nbr AS (
  SELECT a.idx, a.b, a.r, a.c, a.px AS cv, s.nv, s.code, s.diag
  FROM shifted s JOIN allpx a
    ON a.idx = s.idx AND a.b = s.b AND a.r = s.r AND a.c = s.c
),
ranked AS (
  SELECT idx, b, r, c, code,
         CASE WHEN cv - nv > 0
              THEN (cv - nv) * (cv - nv) * (CASE WHEN diag THEN 1 ELSE 2 END)
              ELSE 0 END AS key,
         COUNT(*) OVER (PARTITION BY idx, b, r, c) AS n8
  FROM nbr
),
win AS MATERIALIZED (
  SELECT idx, b, r, c,
         CASE WHEN MAX(key) = 0 THEN 0
              ELSE MIN(CASE WHEN key = mkey THEN code END) END AS dir
  FROM (SELECT *, MAX(key) OVER (PARTITION BY idx, b, r, c) AS mkey
        FROM ranked WHERE n8 = 8) GROUP BY idx, b, r, c
),
dirstep AS MATERIALIZED (
  -- forward step of the flow graph: code -> the (dr, dc) it points AT
  -- (the NON-inverted direction, so negate the shift offsets back)
  SELECT w.idx, w.b, w.r, w.c, -o.dr AS dr, -o.dc AS dc
  FROM win w JOIN d8 o ON o.code = w.dir WHERE w.dir <> 0
),
walk(idx, b, sr, sc, r, c) AS (
  SELECT w.idx, w.b, w.r, w.c, w.r, w.c FROM win w
  UNION
  SELECT v.idx, v.b, v.sr, v.sc, v.r + s.dr, v.c + s.dc
  FROM walk v JOIN dirstep s
    ON s.idx = v.idx AND s.b = v.b AND s.r = v.r AND s.c = v.c
),
terminal AS (
  -- the reach with no outgoing step = the basin terminal
  SELECT v.idx, v.b, v.sr, v.sc, v.r, v.c
  FROM walk v LEFT JOIN dirstep s
    ON s.idx = v.idx AND s.b = v.b AND s.r = v.r AND s.c = v.c
  WHERE s.idx IS NULL
),
img2 AS (SELECT idx, image_id, w AS iw FROM img),
labeled AS (
  SELECT i.image_id, t.b, t.sr AS r, t.sc AS c,
         t.r * i.iw + t.c AS basin
  FROM terminal t JOIN img2 i ON i.idx = t.idx
)
SELECT image_id, CAST(b AS BIGINT) AS band,
       CAST((r // 64) * 64 AS BIGINT) AS win_row_off,
       CAST((c // 64) * 64 AS BIGINT) AS win_col_off,
       CAST(COUNT(*) AS BIGINT) AS n_defined,
       CAST(SUM(basin) AS BIGINT) AS sum_basin,
       CAST(SUM(basin * ((r * 1315423911 + c * 2654435761) % 1000003))
            AS BIGINT) AS wsum_basin,
       CAST(COUNT(DISTINCT basin) AS BIGINT) AS n_basins
FROM labeled GROUP BY image_id, b, win_row_off, win_col_off
""",
        "geo_xyz": f"""
WITH {_allpx_cte("doc_id < 2 AND doc_id % 7 <> 6")},
imj AS (
  SELECT idx, image_id, w, h,
         (-6e1 + ((idx % 64) * w) * 5e-3) AS left_x,
         (4e1 - (((idx // 64) % 64) * h) * 5e-3) AS top_y
  FROM img
)
SELECT i.image_id, CAST(p.b AS INT) AS band,
       (5e-3 * ((p.c % 64) + 5e-1)
        + (5e-3 * ((p.c // 64) * 64) + i.left_x)) AS x,
       ((-5e-3) * ((p.r % 64) + 5e-1)
        + ((-5e-3) * ((p.r // 64) * 64) + i.top_y)) AS y,
       CAST(p.px AS DOUBLE) AS value
FROM allpx p JOIN imj i ON i.idx = p.idx
""",
        "geo_composite_median": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")},
imj AS (
  SELECT *, (idx % 64) * w AS gx0, ((idx // 64) % 64) * h AS gy0 FROM img
),
gpx AS (
  SELECT i.gx0 + p.c AS gx, i.gy0 + p.r AS gy, p.b, p.px
  FROM allpx p JOIN imj i ON p.idx = i.idx
),
med AS (
  SELECT gx, gy, b, median(px) AS m, COUNT(*) AS nv
  FROM gpx GROUP BY gx, gy, b
)
SELECT CAST(gx // 64 AS BIGINT) AS ctx, CAST(gy // 64 AS BIGINT) AS cty,
       CAST(b AS INT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_pixels,
       CAST(round(SUM(2 * m)) AS BIGINT) AS sum2_median,
       CAST(SUM(nv) AS BIGINT) AS n_values
FROM med GROUP BY 1, 2, 3
""",
        "geo_composite_argmax": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")},
imj AS (
  SELECT *, (idx % 64) * w AS gx0, ((idx // 64) % 64) * h AS gy0 FROM img
),
gpx AS (
  SELECT i.gx0 + p.c AS gx, i.gy0 + p.r AS gy, p.b, p.px, p.idx
  FROM allpx p JOIN imj i ON p.idx = i.idx
),
mx AS (
  SELECT gx, gy, b, MAX(px) AS m, COUNT(*) AS nv
  FROM gpx GROUP BY gx, gy, b
),
win AS (
  SELECT x.gx, x.gy, x.b, x.m, x.nv, MIN(g.idx) AS widx
  FROM mx x JOIN gpx g
    ON g.gx = x.gx AND g.gy = x.gy AND g.b = x.b AND g.px = x.m
  GROUP BY x.gx, x.gy, x.b, x.m, x.nv
)
SELECT CAST(gx // 64 AS BIGINT) AS ctx, CAST(gy // 64 AS BIGINT) AS cty,
       CAST(b AS INT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_defined,
       CAST(SUM(m) AS BIGINT) AS sum_max,
       CAST(SUM(widx * ((gy * 1315423911 + gx * 2654435761) % 1000003))
            AS BIGINT) AS wsum_winner,
       CAST(SUM(nv) AS BIGINT) AS n_values
FROM win GROUP BY 1, 2, 3
""",
        "geo_point_sample": f"""
WITH {_allpx_cte("doc_id < 448 AND doc_id % 7 <> 6")},
imj AS (
  SELECT *, (idx % 64) * w AS gx0, ((idx // 64) % 64) * h AS gy0 FROM img
),
{_GEOMS_CTE.strip().lstrip()},
pts AS (
  SELECT geom_id,
         CAST(floor((px + 6e1) / 5e-3) AS BIGINT) AS gpx,
         CAST(floor((4e1 - py) / 5e-3) AS BIGINT) AS gpy
  FROM points
),
hits AS (
  SELECT p.geom_id, i.image_id, i.idx, i.band_count,
         p.gpx - i.gx0 AS c, p.gpy - i.gy0 AS r
  FROM pts p JOIN imj i
    ON p.gpx >= i.gx0 AND p.gpx < i.gx0 + i.w
   AND p.gpy >= i.gy0 AND p.gpy < i.gy0 + i.h
)
SELECT h.geom_id, h.image_id, CAST(b.b AS INT) AS band,
       CAST(COALESCE(a.px, -999999) AS BIGINT) AS px_val
FROM hits h
CROSS JOIN LATERAL (SELECT unnest(range(0, h.band_count)) AS b) b
LEFT JOIN allpx a
  ON a.idx = h.idx AND a.b = b.b AND a.r = h.r AND a.c = h.c
""",
        "geo_clip_geometry": _CLIP_GEOM_SQL,
        "geo_reclassify": f"""
WITH {_allpx_cte("doc_id < 96 AND doc_id % 7 <> 6")},
cl AS (
  SELECT image_id, b, r // 64 AS tile_row, c // 64 AS tile_col,
         CASE WHEN px < -500 THEN 10 WHEN px < 0 THEN 20
              WHEN px < 250 THEN 30 WHEN px < 500 THEN 40
              WHEN px < 800 THEN 50 WHEN px < 1200 THEN 60
              WHEN px < 2000 THEN 70 ELSE 80 END AS cls,
         1 + ((r % 64) * 64 + (c % 64)) % 97 AS wt
  FROM allpx
)
SELECT image_id,
       CAST(tile_row AS BIGINT) AS tile_row,
       CAST(tile_col AS BIGINT) AS tile_col,
       CAST(b AS BIGINT) AS band,
       CAST(cls AS BIGINT) AS cls,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(wt) AS BIGINT) AS wsum
FROM cl GROUP BY image_id, tile_row, tile_col, b, cls
""",
        "geo_rasterize": f"""
WITH {_TILES_CTE},
{_GEOMS_CTE.strip().lstrip()},
gval AS (
  SELECT geom_id,
         1 + CAST(('0x' || substr(sha256(geom_id), 9, 2)) AS INT) % 250 AS val
  FROM geoms_placed WHERE kind IN ('rect', 'concave')
),
rb AS (
  SELECT geom_id,
         -6e1 + gx * 5e-3 AS minx,
         (-6e1 + gx * 5e-3) + wpx * 5e-3 AS maxx,
         (4e1 - gy * 5e-3) - hpx * 5e-3 AS miny,
         4e1 - gy * 5e-3 AS maxy
  FROM rects
),
rpairs AS (
  SELECT t.image_id, t.tile_row, t.tile_col, t.th, t.tw,
         t.tile_left, t.tile_top, g.geom_id, g.minx, g.maxx, g.miny, g.maxy
  FROM tiles t JOIN rb g
    ON g.minx <= (5e-3 * t.tw + t.tile_left) AND g.maxx >= t.tile_left
   AND g.miny <= t.tile_top AND g.maxy >= ((-5e-3) * t.th + t.tile_top)
  WHERE t.idx < 128
),
cov_rect AS (
  SELECT p.image_id, p.tile_row, p.tile_col, r.r, c.c, p.geom_id
  FROM rpairs p,
       LATERAL (SELECT unnest(range(0, p.th)) AS r) r,
       LATERAL (SELECT unnest(range(0, p.tw)) AS c) c
  WHERE (5e-3 * (CAST(c.c AS DOUBLE) + 5e-1)) + p.tile_left
          BETWEEN p.minx AND p.maxx
    AND ((-5e-3) * (CAST(r.r AS DOUBLE) + 5e-1)) + p.tile_top
          BETWEEN p.miny AND p.maxy
),
stars AS (
  SELECT k, geom_id, gx, gy FROM geoms_placed WHERE kind = 'concave'
),
sv AS (
  SELECT s.geom_id, i.i,
         (-6e1 + s.gx * 5e-3)
           + (CASE WHEN i.i % 2 = 0
                THEN 5e-2 + (CAST(('0x' || substr(sha256(s.geom_id), 5, 2)) AS INT) / 2.55e2) * 2.5e-1
                ELSE 2e-2 + (CAST(('0x' || substr(sha256(s.geom_id), 7, 2)) AS INT) / 2.55e2) * 5e-2 END)
             * cos(CAST(i.i AS DOUBLE) * ((2*pi()) / 1e1)) AS vx,
         (4e1 - s.gy * 5e-3)
           + (CASE WHEN i.i % 2 = 0
                THEN 5e-2 + (CAST(('0x' || substr(sha256(s.geom_id), 5, 2)) AS INT) / 2.55e2) * 2.5e-1
                ELSE 2e-2 + (CAST(('0x' || substr(sha256(s.geom_id), 7, 2)) AS INT) / 2.55e2) * 5e-2 END)
             * sin(CAST(i.i AS DOUBLE) * ((2*pi()) / 1e1)) AS vy
  FROM stars s, LATERAL (SELECT unnest(range(0, 10)) AS i) i
),
gbox AS (
  SELECT geom_id, MIN(vx) AS minx, MAX(vx) AS maxx,
         MIN(vy) AS miny, MAX(vy) AS maxy
  FROM sv GROUP BY geom_id
),
edges AS (
  SELECT a.geom_id, a.vx AS ex1, a.vy AS ey1, b.vx AS ex2, b.vy AS ey2
  FROM sv a JOIN sv b ON a.geom_id = b.geom_id AND b.i = (a.i + 1) % 10
),
spairs AS (
  SELECT t.image_id, t.tile_row, t.tile_col, t.th, t.tw,
         t.tile_left, t.tile_top, g.geom_id, g.minx, g.maxx, g.miny, g.maxy
  FROM tiles t JOIN gbox g
    ON g.minx <= (5e-3 * t.tw + t.tile_left) AND g.maxx >= t.tile_left
   AND g.miny <= t.tile_top AND g.maxy >= ((-5e-3) * t.th + t.tile_top)
  WHERE t.idx < 128
),
spx AS (
  SELECT p.*, r.r, c.c,
         (5e-3 * (CAST(c.c AS DOUBLE) + 5e-1)) + p.tile_left AS px,
         ((-5e-3) * (CAST(r.r AS DOUBLE) + 5e-1)) + p.tile_top AS py
  FROM spairs p,
       LATERAL (SELECT unnest(range(0, p.th)) AS r) r,
       LATERAL (SELECT unnest(range(0, p.tw)) AS c) c
  WHERE (5e-3 * (CAST(c.c AS DOUBLE) + 5e-1)) + p.tile_left
          BETWEEN p.minx AND p.maxx
    AND ((-5e-3) * (CAST(r.r AS DOUBLE) + 5e-1)) + p.tile_top
          BETWEEN p.miny AND p.maxy
),
cov_star AS (
  SELECT pp.image_id, pp.tile_row, pp.tile_col, pp.r, pp.c, pp.geom_id
  FROM spx pp JOIN edges e ON pp.geom_id = e.geom_id
  GROUP BY pp.image_id, pp.tile_row, pp.tile_col, pp.r, pp.c, pp.geom_id
  HAVING SUM(CASE WHEN ((e.ey1 > pp.py) <> (e.ey2 > pp.py))
                   AND pp.px < (((e.ex2 - e.ex1) * (pp.py - e.ey1) / (e.ey2 - e.ey1)) + e.ex1)
              THEN 1 ELSE 0 END) % 2 = 1
),
covered AS (
  SELECT * FROM cov_rect UNION ALL SELECT * FROM cov_star
),
winner AS (
  SELECT image_id, tile_row, tile_col, r, c, MAX(geom_id) AS geom_id
  FROM covered GROUP BY image_id, tile_row, tile_col, r, c
),
burned AS (
  SELECT w.image_id, w.tile_row, w.tile_col, v.val,
         1 + (w.r * 64 + w.c) % 97 AS wt
  FROM winner w JOIN gval v ON w.geom_id = v.geom_id
)
SELECT image_id,
       CAST(tile_row AS BIGINT) AS tile_row,
       CAST(tile_col AS BIGINT) AS tile_col,
       CAST(COUNT(*) AS BIGINT) AS n_burned,
       CAST(SUM(val) AS BIGINT) AS vsum,
       CAST(SUM(val * wt) AS BIGINT) AS wsum
FROM burned GROUP BY image_id, tile_row, tile_col
""",
        "geo_equalize": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")},
ranked AS (
  SELECT idx, image_id, b, r, c,
         COUNT(*) OVER (PARTITION BY idx, b ORDER BY px
                        RANGE BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cle,
         COUNT(*) OVER (PARTITION BY idx, b) AS n
  FROM allpx
),
withmin AS (
  SELECT *, MIN(cle) OVER (PARTITION BY idx, b) AS cmin FROM ranked
),
eqpx AS (
  SELECT image_id, b, r // 64 AS tile_row, c // 64 AS tile_col,
         CASE WHEN n > cmin THEN ((cle - cmin) * 255) // (n - cmin)
              ELSE 0 END AS eq,
         1 + ((r % 64) * 64 + (c % 64)) % 97 AS wt
  FROM withmin
)
SELECT image_id,
       CAST(tile_row AS BIGINT) AS tile_row,
       CAST(tile_col AS BIGINT) AS tile_col,
       CAST(b AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(eq) AS BIGINT) AS esum,
       CAST(SUM(eq * wt) AS BIGINT) AS ewsum
FROM eqpx GROUP BY image_id, tile_row, tile_col, b
""",
        "geo_percentile_stretch": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")},
ranked AS (
  SELECT idx, image_id, b, r, c, px,
         COUNT(*) OVER (PARTITION BY idx, b ORDER BY px
                        RANGE BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cle,
         COUNT(*) OVER (PARTITION BY idx, b) AS n
  FROM allpx
),
bounds AS (
  SELECT idx, b,
         MIN(CASE WHEN cle >= GREATEST(1, (20 * n + 999) // 1000)
                  THEN px END) AS lo,
         MIN(CASE WHEN cle >= GREATEST(1, (980 * n + 999) // 1000)
                  THEN px END) AS hi
  FROM ranked GROUP BY idx, b
),
spx AS (
  SELECT p.image_id, p.b, p.r // 64 AS tile_row, p.c // 64 AS tile_col,
         GREATEST(0, LEAST(255,
           ((p.px - d.lo) * 255) // GREATEST(d.hi - d.lo, 1))) AS sv,
         1 + ((p.r % 64) * 64 + (p.c % 64)) % 97 AS wt
  FROM allpx p JOIN bounds d ON d.idx = p.idx AND d.b = p.b
)
SELECT image_id,
       CAST(tile_row AS BIGINT) AS tile_row,
       CAST(tile_col AS BIGINT) AS tile_col,
       CAST(b AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(sv) AS BIGINT) AS ssum,
       CAST(SUM(sv * wt) AS BIGINT) AS swsum
FROM spx GROUP BY image_id, tile_row, tile_col, b
""",
        "geo_band_stats": f"""
WITH {_allpx_cte("doc_id < 96 AND doc_id % 7 <> 6")}
SELECT CAST(b AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(px) AS BIGINT) AS s1,
       CAST(SUM(px * px) AS BIGINT) AS s2
FROM allpx GROUP BY b
""",
        "geo_zorder_layout": f"""
WITH {_TILES_CTE},
base AS (
  SELECT image_id, CAST(tile_row AS BIGINT) AS tile_row,
         CAST(tile_col AS BIGINT) AS tile_col,
         CAST(floor((9e1 - lat_c) / 1.8e2 * 1024) AS BIGINT) AS r10,
         CAST(floor((lon_c + 1.8e2) / 3.6e2 * 1024) AS BIGINT) AS c10
  FROM tiles_c
),
zed AS (
  SELECT image_id, tile_row, tile_col,
         {" + ".join(
             f"(((r10 >> {i}) & 1) << {2 * i + 1})"
             f" + (((c10 >> {i}) & 1) << {2 * i})"
             for i in range(10)
         )} AS z
  FROM base
)
SELECT z, image_id, tile_row, tile_col,
       CAST(row_number() OVER (
         ORDER BY z, image_id, tile_row, tile_col
       ) AS BIGINT) AS rank
FROM zed
ORDER BY rank LIMIT 512
""",
        "geo_cell_rollup": f"""
WITH {_TILES_CTE},
base AS (
  SELECT th, tw,
         CAST(floor((9e1 - lat_c) / 1.8e2 * 1024) AS BIGINT) AS r10,
         CAST(floor((lon_c + 1.8e2) / 3.6e2 * 1024) AS BIGINT) AS c10
  FROM tiles_c
),
lv AS (
  SELECT l.lv, b.th, b.tw,
         l.lv * 4503599627370496
           + (b.r10 // (1 << (10 - l.lv))) * 67108864
           + (b.c10 // (1 << (10 - l.lv))) AS cell
  FROM base b, (SELECT unnest([8, 6, 4]) AS lv) l
)
SELECT CAST(lv AS BIGINT) AS level, CAST(cell AS BIGINT) AS cell,
       CAST(COUNT(*) AS BIGINT) AS n_tiles,
       CAST(SUM(th * tw) AS BIGINT) AS px
FROM lv GROUP BY lv, cell
""",
        "geo_knn": f"""
WITH {_TILES_CTE},
{_GEOMS_CTE.strip().lstrip()},
ranked AS (
  SELECT t.image_id, t.tile_row, t.tile_col, p.geom_id,
         row_number() OVER (
           PARTITION BY t.image_id, t.tile_row, t.tile_col
           ORDER BY sqrt((t.lon_c - p.px) * (t.lon_c - p.px)
                         + (t.lat_c - p.py) * (t.lat_c - p.py)), p.geom_id
         ) AS rank
  FROM tiles_c t CROSS JOIN points p
)
SELECT image_id, tile_row, tile_col, geom_id, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3
""",
        "geo_reproject_grid": f"""
WITH {_IMG_CTE},
m AS (
  SELECT image_id, w, h,
         6.378137e6 * left_x * (pi() / 1.8e2) AS dl,
         6.378137e6 * (5e-3 * w + left_x) * (pi() / 1.8e2) AS dr,
         6.378137e6 * ln(tan(pi() / 4e0 + ((-5e-3) * h + top_y) * (pi() / 1.8e2) / 2e0)) AS db,
         6.378137e6 * ln(tan(pi() / 4e0 + top_y * (pi() / 1.8e2) / 2e0)) AS dt
  FROM img4326
),
r AS (
  SELECT image_id, w, h, dl, dr, db, dt,
         sqrt(((dr - dl) * (dt - db)) / CAST(w * h AS DOUBLE)) AS res
  FROM m
)
SELECT image_id,
       CAST(GREATEST(CAST(round((dr - dl) / res) AS BIGINT), 1) AS INT) AS dst_w,
       CAST(GREATEST(CAST(round((dt - db) / res) AS BIGINT), 1) AS INT) AS dst_h
FROM r
""",
        # Exact decode gate for ALL FOUR codecs: regenerate the frozen
        # corpus pixel spec (sources/corpus.py docstring) in plain SQL —
        # sha256-derived params, the band-limited sin*cos+gradient pattern,
        # round_even (numpy rint = banker's), the nodata disc, the rawu8
        # min/max normalization and the lq8 quantize->dequantize chain —
        # then sum decoded values as BIGINT (order-free, no float
        # accumulation).  numpy SIMD sin/cos differ from libm by <=1 ulp on
        # this box but every rounded value agrees (verified exhaustively
        # at sf0.01; deterministic corpus => deterministic gate).
        "geo_pixel_checksum": """
WITH img AS (
  SELECT doc_id AS idx,
         'img' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS image_id,
         CASE doc_id % 4 WHEN 0 THEN 64 WHEN 1 THEN 128 WHEN 2 THEN 200 ELSE 256 END AS w,
         CASE (doc_id + 1) % 4 WHEN 0 THEN 64 WHEN 1 THEN 128 WHEN 2 THEN 200 ELSE 256 END AS h,
         CASE doc_id % 4 WHEN 0 THEN 'raw16' WHEN 1 THEN 'rawu8' WHEN 2 THEN 'pngz' ELSE 'lq8' END AS fmt,
         CASE WHEN doc_id % 5 = 0 THEN 3 ELSE 1 END AS band_count
  FROM documents WHERE doc_id < 128
),
par AS (
  SELECT *,
         'caption-' || CAST(idx AS VARCHAR) || '-' || substr(sha256(image_id), 1, 8) AS caption,
         1e3 + CAST(('0x' || substr(sha256(image_id), 1, 2)) AS INT) * 8e0 AS amp,
         1 + CAST(('0x' || substr(sha256(image_id), 3, 2)) AS INT) % 8 AS f1,
         1 + CAST(('0x' || substr(sha256(image_id), 5, 2)) AS INT) % 8 AS f2,
         CAST(('0x' || substr(sha256(image_id), 7, 2)) AS INT) / 2.55e2 AS phi,
         CAST(('0x' || substr(sha256(image_id), 9, 2)) AS INT) % h AS cr,
         CAST(('0x' || substr(sha256(image_id), 11, 2)) AS INT) % w AS cc,
         5e-2 * h * w / pi() AS radius2
  FROM img
),
pr AS (SELECT *, unnest(range(0, h)) AS r FROM par),
prc AS (SELECT *, unnest(range(0, w)) AS c FROM pr),
pb AS (SELECT *, unnest(range(0, band_count)) AS b FROM prc),
v0 AS (
  SELECT idx, image_id, caption, fmt, h, w, b, r, c,
         amp * sin(((2*pi())*f1)*(CAST(r AS DOUBLE)+(phi + 3.7e-1*b))/h)
             * cos(((2*pi())*f2)*(CAST(c AS DOUBLE)+(phi + 3.7e-1*b))/w)
         + (5e2*(CAST(r AS DOUBLE)/h) + 3e2*(CAST(c AS DOUBLE)/w)) AS vf,
         ((r-cr)*(r-cr) + (c-cc)*(c-cc)) < radius2 AS disc
  FROM pb
),
v16 AS (SELECT *, CAST(round_even(vf, 0) AS BIGINT) AS q16 FROM v0),
u8 AS (
  SELECT *, MIN(vf) OVER (PARTITION BY idx) AS lo8,
            MAX(vf) OVER (PARTITION BY idx) AS hi8
  FROM v16 WHERE fmt = 'rawu8'
),
u8px AS (
  SELECT idx, image_id, caption,
         CAST(round_even((vf - lo8) / GREATEST(hi8 - lo8, 1e-9) * 2.54e2, 0) AS BIGINT) AS px
  FROM u8 WHERE NOT disc
),
lmm AS (
  SELECT idx, b,
         CAST(MIN(q16) AS DOUBLE) AS lo,
         CASE WHEN MAX(q16) <= MIN(q16)
              THEN CAST(MIN(q16) AS DOUBLE) + 1 ELSE CAST(MAX(q16) AS DOUBLE) END AS hi
  FROM v16 WHERE fmt = 'lq8' AND NOT disc GROUP BY idx, b
),
lq AS (
  SELECT v.idx, v.image_id, v.caption, v.q16, m.lo, (m.hi - m.lo) / 2.54e2 AS step
  FROM v16 v JOIN lmm m ON v.idx = m.idx AND v.b = m.b
  WHERE v.fmt = 'lq8' AND NOT v.disc
),
lqpx AS (
  SELECT idx, image_id, caption,
         CAST(round_even(lo + LEAST(GREATEST(round_even((CAST(q16 AS DOUBLE) - lo) / step, 0), 0e0), 2.54e2) * step, 0) AS BIGINT) AS px
  FROM lq
),
i16px AS (
  SELECT idx, image_id, caption, q16 AS px
  FROM v16 WHERE fmt IN ('raw16', 'pngz') AND NOT disc
),
allpx AS (
  SELECT * FROM i16px UNION ALL SELECT * FROM u8px UNION ALL SELECT * FROM lqpx
)
SELECT image_id, caption,
       CAST(SUM(px) AS BIGINT) AS checksum,
       CAST(COUNT(*) AS BIGINT) AS n_valid
FROM allpx GROUP BY image_id, caption
""",
        # Exact area-resampling gate: regenerate decoded pixels (all 3
        # native-4326 codec lanes), group into the aligned 2x2 blocks the
        # separable area kernel resolves (SAT box sums of ints < 2**53 are
        # exact in float64), dst pixel = round_even(sum/count) in the
        # native dtype, checksum = BIGINT sum of dst pixels.
        # Identity-reproject gate: nearest 4326->4326 passes every tile
        # pixel through verbatim, so the oracle is the tile slices of the
        # regenerated pixel spec (r//64, c//64 lattice).
        "geo_reproject_identity": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")}
SELECT a.image_id,
       CAST(a.r // 64 AS INT) AS tile_row,
       CAST(a.c // 64 AS INT) AS tile_col,
       CAST(LEAST(64, MAX(i.h) - (a.r // 64) * 64) AS INT) AS dst_h,
       CAST(LEAST(64, MAX(i.w) - (a.c // 64) * 64) AS INT) AS dst_w,
       CAST(COUNT(*) AS BIGINT) AS n_valid,
       CAST(SUM(a.px) AS BIGINT) AS checksum
FROM allpx a JOIN img i ON a.idx = i.idx
GROUP BY a.image_id, a.r // 64, a.c // 64
""",
        # Tiled-halo nearest warp onto the shared 2**-7-degree grid: every
        # dst pixel-center coordinate is an exact binary float, the src
        # index is closed-form floor() over the affine inverse (mirrored
        # term-by-term from kernels/affine.invert/apply as in geo_clip_box)
        # and the per-image mosaic equals this direct per-pixel map.
        "geo_tiled_halo_warp_nearest": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")},
imj AS (
  SELECT *,
         -6e1 + (idx % 64) * w * 5e-3 AS left_x,
         4e1 - ((idx // 64) % 64) * h * 5e-3 AS top_y
  FROM img
),
jr AS (
  SELECT *, unnest(range(
    GREATEST(CAST(floor((left_x + 6e1) / 7.8125e-3 - 5e-1) AS BIGINT), 0),
    CAST(ceil((left_x + w * 5e-3 + 6e1) / 7.8125e-3) AS BIGINT) + 1)) AS J
  FROM imj
),
ir AS (
  SELECT *, unnest(range(
    GREATEST(CAST(floor((4e1 - top_y) / 7.8125e-3 - 5e-1) AS BIGINT), 0),
    CAST(floor((4e1 - top_y) / 7.8125e-3 - 5e-1) AS BIGINT)
      + CAST(ceil(h * 5e-3 / 7.8125e-3) AS BIGINT) + 2)) AS I
  FROM jr
),
mapd AS (
  SELECT idx, image_id, w, h,
         CAST(floor(
           ((-5e-3) / (5e-3 * (-5e-3)))
             * (7.8125e-3 * (CAST(J AS DOUBLE) + 5e-1) + (-6e1))
           + (-(((-5e-3) / (5e-3 * (-5e-3))) * left_x))
         ) AS BIGINT) AS c_src,
         CAST(floor(
           ((5e-3) / (5e-3 * (-5e-3)))
             * ((-7.8125e-3) * (CAST(I AS DOUBLE) + 5e-1) + 4e1)
           + (-(((5e-3) / (5e-3 * (-5e-3))) * top_y))
         ) AS BIGINT) AS r_src
  FROM ir
),
hit AS (
  SELECT idx, image_id, c_src, r_src FROM mapd
  WHERE c_src BETWEEN 0 AND w - 1 AND r_src BETWEEN 0 AND h - 1
)
SELECT t.image_id,
       CAST(COUNT(*) AS BIGINT) AS n_valid,
       CAST(SUM(p.px) AS BIGINT) AS checksum
FROM hit t JOIN allpx p
  ON p.idx = t.idx AND p.r = t.r_src AND p.c = t.c_src
GROUP BY t.image_id
""",
        "geo_downsample_avg": """
WITH img AS (
  SELECT doc_id AS idx,
         'img' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS image_id,
         CASE doc_id % 4 WHEN 0 THEN 64 WHEN 1 THEN 128 WHEN 2 THEN 200 ELSE 256 END AS w,
         CASE (doc_id + 1) % 4 WHEN 0 THEN 64 WHEN 1 THEN 128 WHEN 2 THEN 200 ELSE 256 END AS h,
         CASE doc_id % 4 WHEN 0 THEN 'raw16' WHEN 1 THEN 'rawu8' WHEN 2 THEN 'pngz' ELSE 'lq8' END AS fmt,
         CASE WHEN doc_id % 5 = 0 THEN 3 ELSE 1 END AS band_count
  FROM documents WHERE doc_id < 64 AND doc_id % 7 <> 6
),
par AS (
  SELECT *,
         1e3 + CAST(('0x' || substr(sha256(image_id), 1, 2)) AS INT) * 8e0 AS amp,
         1 + CAST(('0x' || substr(sha256(image_id), 3, 2)) AS INT) % 8 AS f1,
         1 + CAST(('0x' || substr(sha256(image_id), 5, 2)) AS INT) % 8 AS f2,
         CAST(('0x' || substr(sha256(image_id), 7, 2)) AS INT) / 2.55e2 AS phi,
         CAST(('0x' || substr(sha256(image_id), 9, 2)) AS INT) % h AS cr,
         CAST(('0x' || substr(sha256(image_id), 11, 2)) AS INT) % w AS cc,
         5e-2 * h * w / pi() AS radius2
  FROM img
),
pr AS (SELECT *, unnest(range(0, h)) AS r FROM par),
prc AS (SELECT *, unnest(range(0, w)) AS c FROM pr),
pb AS (SELECT *, unnest(range(0, band_count)) AS b FROM prc),
v0 AS (
  SELECT idx, image_id, fmt, h, w, b, r, c,
         amp * sin(((2*pi())*f1)*(CAST(r AS DOUBLE)+(phi + 3.7e-1*b))/h)
             * cos(((2*pi())*f2)*(CAST(c AS DOUBLE)+(phi + 3.7e-1*b))/w)
         + (5e2*(CAST(r AS DOUBLE)/h) + 3e2*(CAST(c AS DOUBLE)/w)) AS vf,
         ((r-cr)*(r-cr) + (c-cc)*(c-cc)) < radius2 AS disc
  FROM pb
),
v16 AS (SELECT *, CAST(round_even(vf, 0) AS BIGINT) AS q16 FROM v0),
u8 AS (
  SELECT *, MIN(vf) OVER (PARTITION BY idx) AS lo8,
            MAX(vf) OVER (PARTITION BY idx) AS hi8
  FROM v16 WHERE fmt = 'rawu8'
),
u8px AS (
  SELECT idx, image_id, b, r, c,
         CAST(round_even((vf - lo8) / GREATEST(hi8 - lo8, 1e-9) * 2.54e2, 0) AS BIGINT) AS px
  FROM u8 WHERE NOT disc
),
lmm AS (
  SELECT idx, b,
         CAST(MIN(q16) AS DOUBLE) AS lo,
         CASE WHEN MAX(q16) <= MIN(q16)
              THEN CAST(MIN(q16) AS DOUBLE) + 1 ELSE CAST(MAX(q16) AS DOUBLE) END AS hi
  FROM v16 WHERE fmt = 'lq8' AND NOT disc GROUP BY idx, b
),
lq AS (
  SELECT v.idx, v.image_id, v.b, v.r, v.c, v.q16, m.lo, (m.hi - m.lo) / 2.54e2 AS step
  FROM v16 v JOIN lmm m ON v.idx = m.idx AND v.b = m.b
  WHERE v.fmt = 'lq8' AND NOT v.disc
),
lqpx AS (
  SELECT idx, image_id, b, r, c,
         CAST(round_even(lo + LEAST(GREATEST(round_even((CAST(q16 AS DOUBLE) - lo) / step, 0), 0e0), 2.54e2) * step, 0) AS BIGINT) AS px
  FROM lq
),
i16px AS (
  SELECT idx, image_id, b, r, c, q16 AS px
  FROM v16 WHERE fmt IN ('raw16', 'pngz') AND NOT disc
),
allpx AS (
  SELECT * FROM i16px UNION ALL SELECT * FROM u8px UNION ALL SELECT * FROM lqpx
),
blocks AS (
  SELECT image_id, b, r // 2 AS br, c // 2 AS bc,
         CAST(SUM(px) AS BIGINT) AS s, COUNT(*) AS n
  FROM allpx GROUP BY image_id, b, r // 2, c // 2
),
dstpx AS (
  SELECT image_id,
         CAST(round_even(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 0) AS BIGINT) AS dpx
  FROM blocks
)
SELECT i.image_id,
       CAST(i.h // 2 AS BIGINT) AS h,
       CAST(i.w // 2 AS BIGINT) AS w,
       CAST(COUNT(d.dpx) AS BIGINT) AS n_valid,
       CAST(COALESCE(SUM(d.dpx), 0) AS BIGINT) AS checksum
FROM img i JOIN dstpx d ON i.image_id = d.image_id
GROUP BY i.image_id, i.h, i.w
""",
        # Exact mosaic gate: union grid (rasterio ceil-snap sizing), the
        # round-even integer anchor of every source tile on the dst grid,
        # per-dst-pixel 'first' winner (= lexicographically-first VALID
        # source, stages/merge.py reduce order), BIGINT per-tile sums of
        # the regenerated raw16 pixel spec.  All float exprs mirror the
        # engine term-by-term (kernels/affine.py invert/apply with the
        # +-0.0 no-op terms dropped).
        "geo_merge": """
WITH img AS (
  SELECT doc_id AS idx,
         'img' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS image_id,
         CASE doc_id % 4 WHEN 0 THEN 64 WHEN 1 THEN 128 WHEN 2 THEN 200 ELSE 256 END AS w,
         CASE (doc_id + 1) % 4 WHEN 0 THEN 64 WHEN 1 THEN 128 WHEN 2 THEN 200 ELSE 256 END AS h,
         -6e1 + (doc_id % 64) * (CASE doc_id % 4 WHEN 0 THEN 64 WHEN 1 THEN 128 WHEN 2 THEN 200 ELSE 256 END) * 5e-3 AS left_x,
         4e1 - ((doc_id // 64) % 64) * (CASE (doc_id + 1) % 4 WHEN 0 THEN 64 WHEN 1 THEN 128 WHEN 2 THEN 200 ELSE 256 END) * 5e-3 AS top_y
  FROM documents
  WHERE doc_id % 4 = 0 AND doc_id % 7 <> 6 AND doc_id % 5 <> 0 AND doc_id < 200
  QUALIFY row_number() OVER (ORDER BY doc_id) <= 16
),
stiles AS (
  SELECT i.*, tr.tr AS s_tr, tc.tc AS s_tc,
         CAST(LEAST(64, i.h - tr.tr * 64) AS INT) AS th,
         CAST(LEAST(64, i.w - tc.tc * 64) AS INT) AS tw,
         (5e-3 * (tc.tc * 64) + i.left_x) AS tile_left,
         ((-5e-3) * (tr.tr * 64) + i.top_y) AS tile_top
  FROM img i,
       LATERAL (SELECT unnest(range(0, CAST(ceil(i.h / 6.4e1) AS BIGINT))) AS tr) tr,
       LATERAL (SELECT unnest(range(0, CAST(ceil(i.w / 6.4e1) AS BIGINT))) AS tc) tc
),
u AS (
  SELECT MIN(tile_left) AS uleft,
         MIN((-5e-3) * th + tile_top) AS ubottom,
         MAX(5e-3 * tw + tile_left) AS uright,
         MAX(tile_top) AS utop
  FROM stiles
),
grid AS (
  SELECT *,
         CAST(ceil((uright - uleft) / 5e-3 - 1e-9) AS BIGINT) AS gw,
         CAST(ceil((utop - ubottom) / 5e-3 - 1e-9) AS BIGINT) AS gh,
         (-5e-3) / (5e-3 * (-5e-3)) AS ia,
         5e-3 / (5e-3 * (-5e-3)) AS ie
  FROM u
),
g2 AS (SELECT *, (gw + 255) // 256 AS n_tc, (gh + 255) // 256 AS n_tr FROM grid),
anch AS (
  SELECT s.*, g.gw, g.gh, g.n_tc, g.n_tr,
         CAST(round_even((g.ia * s.tile_left) + (-(g.ia * g.uleft)), 0) AS BIGINT) AS ic0,
         CAST(round_even((g.ie * s.tile_top) + (-(g.ie * g.utop)), 0) AS BIGINT) AS ir0
  FROM stiles s CROSS JOIN g2 g
),
par AS (
  SELECT idx, image_id, w, h,
         1e3 + CAST(('0x' || substr(sha256(image_id), 1, 2)) AS INT) * 8e0 AS amp,
         1 + CAST(('0x' || substr(sha256(image_id), 3, 2)) AS INT) % 8 AS f1,
         1 + CAST(('0x' || substr(sha256(image_id), 5, 2)) AS INT) % 8 AS f2,
         CAST(('0x' || substr(sha256(image_id), 7, 2)) AS INT) / 2.55e2 AS phi,
         CAST(('0x' || substr(sha256(image_id), 9, 2)) AS INT) % h AS cr,
         CAST(('0x' || substr(sha256(image_id), 11, 2)) AS INT) % w AS cc,
         5e-2 * h * w / pi() AS radius2
  FROM img
),
pr AS (SELECT *, unnest(range(0, h)) AS r FROM par),
prc AS (SELECT *, unnest(range(0, w)) AS c FROM pr),
px AS (
  SELECT idx, image_id, r, c,
         CAST(round_even(
           amp * sin(((2*pi())*f1)*(CAST(r AS DOUBLE)+phi)/h)
               * cos(((2*pi())*f2)*(CAST(c AS DOUBLE)+phi)/w)
           + (5e2*(CAST(r AS DOUBLE)/h) + 3e2*(CAST(c AS DOUBLE)/w)), 0) AS BIGINT) AS v,
         NOT (((r-cr)*(r-cr) + (c-cc)*(c-cc)) < radius2) AS valid
  FROM prc
),
placed AS (
  SELECT a.image_id, a.n_tc,
         a.ir0 + (p.r - a.s_tr * 64) AS gr,
         a.ic0 + (p.c - a.s_tc * 64) AS gc,
         p.v, p.valid
  FROM anch a JOIN px p ON a.idx = p.idx
   AND p.r >= a.s_tr * 64 AND p.r < a.s_tr * 64 + a.th
   AND p.c >= a.s_tc * 64 AND p.c < a.s_tc * 64 + a.tw
),
winner AS (
  SELECT (gr // 256) AS d_tr, (gc // 256) AS d_tc,
         arg_min(v, image_id) AS v
  FROM placed WHERE valid
  GROUP BY gr, gc, (gr // 256), (gc // 256)
),
dtiles AS (
  SELECT DISTINCT (gr // 256) AS d_tr, (gc // 256) AS d_tc FROM placed
),
sums AS (
  SELECT d_tr, d_tc, CAST(SUM(v) AS BIGINT) AS s FROM winner GROUP BY d_tr, d_tc
)
SELECT 'mosaic/' || CAST(t.d_tr AS VARCHAR) || '/' || CAST(t.d_tc AS VARCHAR) AS tile_id,
       CAST(LEAST(256, g.gh - t.d_tr * 256) AS BIGINT) AS h,
       CAST(LEAST(256, g.gw - t.d_tc * 256) AS BIGINT) AS w,
       COALESCE(s.s, 0) AS checksum
FROM dtiles t CROSS JOIN g2 g LEFT JOIN sums s ON t.d_tr = s.d_tr AND t.d_tc = s.d_tc
""",
        "dedup_exact": """
SELECT md5(text) AS content_hash, min(doc_id) AS doc_id
FROM documents GROUP BY 1
""",
        # dedup_spans: the engine hashes gram TEXT to md5 and groups on
        # the hash; the oracle groups on the gram text itself — identical
        # sets barring md5 collisions.  Island rule: positions p, p' merge
        # while p' - p <= k (contiguous token coverage).
        "dedup_spans": r"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(COALESCE(text, '')), '[a-z'']+') AS ts
  FROM documents
),
g AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(ts[i:i+7], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(range(1, len(ts) - 8 + 2)) AS i) r
  WHERE len(ts) >= 8
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
dp AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER w <= 8 THEN 0 ELSE 1 END AS brk
  FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
isl AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM marked
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + 8 - MIN(pos) AS span_len,
       COUNT(*) AS n_grams
FROM isl GROUP BY doc_id, island
""",
        "multimodal_png": """
SELECT d.doc_id,
       s.pixel_sum, s.pixel_min, s.pixel_max,
       CAST(3 AS BIGINT) AS bands,
       CAST(16 AS BIGINT) AS h,
       CAST(16 AS BIGINT) AS w
FROM documents d, LATERAL (
  SELECT CAST(SUM((d.doc_id * 31 + i * i) % 251) AS BIGINT) AS pixel_sum,
         CAST(MIN((d.doc_id * 31 + i * i) % 251) AS BIGINT) AS pixel_min,
         CAST(MAX((d.doc_id * 31 + i * i) % 251) AS BIGINT) AS pixel_max
  FROM generate_series(0, 767) t(i)
) s
""",
        "multimodal_bmp": """
SELECT d.doc_id,
       s.pixel_sum, s.weighted_sum, s.pixel_min, s.pixel_max,
       CAST(3 AS BIGINT) AS bands,
       CAST(10 AS BIGINT) AS h,
       CAST(14 AS BIGINT) AS w
FROM documents d, LATERAL (
  SELECT CAST(SUM((d.doc_id * 41 + i * i) % 256) AS BIGINT) AS pixel_sum,
         CAST(SUM(((d.doc_id * 41 + i * i) % 256) * (i + 1)) AS BIGINT)
           AS weighted_sum,
         CAST(MIN((d.doc_id * 41 + i * i) % 256) AS BIGINT) AS pixel_min,
         CAST(MAX((d.doc_id * 41 + i * i) % 256) AS BIGINT) AS pixel_max
  FROM generate_series(0, 419) t(i)
) s
""",
        "multimodal_gif": """
SELECT d.doc_id,
       s.pixel_sum, s.weighted_sum, s.pixel_min, s.pixel_max,
       CAST(3 AS BIGINT) AS bands,
       CAST(20 AS BIGINT) AS h,
       CAST(17 AS BIGINT) AS w
FROM documents d, LATERAL (
  SELECT CAST(3 * SUM((d.doc_id * 43 + i * i) % 256) AS BIGINT) AS pixel_sum,
         -- band-major weights fold across the 3 identical gray bands:
         -- sum_b sum_i v_i*(b*340+i+1) = 3*sum(v*(i+1)) + 1020*sum(v)
         CAST(3 * SUM(((d.doc_id * 43 + i * i) % 256) * (i + 1))
              + 1020 * SUM((d.doc_id * 43 + i * i) % 256) AS BIGINT)
           AS weighted_sum,
         CAST(MIN((d.doc_id * 43 + i * i) % 256) AS BIGINT) AS pixel_min,
         CAST(MAX((d.doc_id * 43 + i * i) % 256) AS BIGINT) AS pixel_max
  FROM generate_series(0, 339) t(i)
) s
""",
        "multimodal_resize": """
SELECT d.doc_id, s.pixel_sum, s.weighted_sum
FROM documents d, LATERAL (
  SELECT CAST(SUM(v) AS BIGINT) AS pixel_sum,
         CAST(SUM(v * (b.b * 20 + r.r * 4 + c.c + 1)) AS BIGINT)
           AS weighted_sum
  FROM generate_series(0, 2) b(b)
  CROSS JOIN generate_series(0, 4) r(r)
  CROSS JOIN generate_series(0, 3) c(c),
  LATERAL (
    SELECT b.b * 120 + ((r.r * 12) // 5) * 10 + ((c.c * 10) // 4) AS i
  ) si,
  LATERAL (SELECT (d.doc_id * 53 + si.i * si.i) % 256 AS v) sv
) s
""",
        "multimodal_features_pooled": """
SELECT d.doc_id,
       s.sum_0, s.min_0, s.max_0,
       s.sum_1, s.min_1, s.max_1,
       s.sum_2, s.min_2, s.max_2
FROM documents d, LATERAL (
  SELECT
    CAST(SUM(CASE WHEN b = 0 THEN v END) AS BIGINT) AS sum_0,
    CAST(MIN(CASE WHEN b = 0 THEN v END) AS BIGINT) AS min_0,
    CAST(MAX(CASE WHEN b = 0 THEN v END) AS BIGINT) AS max_0,
    CAST(SUM(CASE WHEN b = 1 THEN v END) AS BIGINT) AS sum_1,
    CAST(MIN(CASE WHEN b = 1 THEN v END) AS BIGINT) AS min_1,
    CAST(MAX(CASE WHEN b = 1 THEN v END) AS BIGINT) AS max_1,
    CAST(SUM(CASE WHEN b = 2 THEN v END) AS BIGINT) AS sum_2,
    CAST(MIN(CASE WHEN b = 2 THEN v END) AS BIGINT) AS min_2,
    CAST(MAX(CASE WHEN b = 2 THEN v END) AS BIGINT) AS max_2
  FROM generate_series(0, 2) tb(b)
  CROSS JOIN generate_series(0, 31) tr(r)
  CROSS JOIN generate_series(0, 31) tc(c),
  LATERAL (
    SELECT b * 256 + ((r * 16) // 32) * 16 + ((c * 16) // 32) AS i
  ) si,
  LATERAL (SELECT (d.doc_id * 61 + si.i * si.i) % 253 AS v) sv
) s
""",
        "multimodal_pnm": """
SELECT d.doc_id, s.pixel_sum, s.weighted_sum, s.pixel_min, s.pixel_max
FROM documents d, LATERAL (
  SELECT CAST(SUM((d.doc_id * 47 + i * i) % 256) AS BIGINT) AS pixel_sum,
         CAST(SUM(((d.doc_id * 47 + i * i) % 256) * (i + 1)) AS BIGINT)
           AS weighted_sum,
         CAST(MIN((d.doc_id * 47 + i * i) % 256) AS BIGINT) AS pixel_min,
         CAST(MAX((d.doc_id * 47 + i * i) % 256) AS BIGINT) AS pixel_max
  FROM generate_series(0, 296) t(i)
) s
""",
        "multimodal_wav": """
SELECT d.doc_id,
       CAST(1024 AS BIGINT) AS n_samples,
       CAST(1 + d.doc_id % 2 AS BIGINT) AS channels,
       s.sample_sum, s.sample_min, s.sample_max, s.energy
FROM documents d, LATERAL (
  SELECT CAST(SUM(v) AS BIGINT) AS sample_sum,
         CAST(MIN(v) AS BIGINT) AS sample_min,
         CAST(MAX(v) AS BIGINT) AS sample_max,
         CAST(SUM(v * v) AS BIGINT) AS energy
  FROM (SELECT (d.doc_id * 37 + i * i) % 2001 - 1000 AS v
        FROM generate_series(0, 1023) t(i))
) s
""",
        "multimodal_avi": """
SELECT d.doc_id, f.f AS frame_index, s.frame_sum
FROM documents d
CROSS JOIN (SELECT unnest([0, 2, 4]) AS f) f,
LATERAL (
  SELECT CAST(SUM((d.doc_id * 13 + f.f * 257 + i * i) % 256) AS BIGINT)
         AS frame_sum
  FROM generate_series(0, 191) t(i)
) s
""",
        "multimodal_patchify": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")}
SELECT image_id,
       CAST(r // 64 AS BIGINT) AS tile_row,
       CAST(c // 64 AS BIGINT) AS tile_col,
       CAST(b AS BIGINT) AS band,
       CAST((r % 64) // 8 AS BIGINT) AS patch_row,
       CAST((c % 64) // 8 AS BIGINT) AS patch_col,
       CAST(COUNT(*) AS BIGINT) AS n_valid,
       CAST(SUM(px) AS BIGINT) AS psum,
       CAST(SUM(px * px) AS BIGINT) AS psumsq,
       CAST(MIN(px) AS BIGINT) AS pmin,
       CAST(MAX(px) AS BIGINT) AS pmax
FROM allpx
GROUP BY image_id, r // 64, c // 64, b, (r % 64) // 8, (c % 64) // 8
""",
        "multimodal_augment": f"""
WITH {_allpx_cte("doc_id < 64 AND doc_id % 7 <> 6")},
base AS (
  SELECT p.image_id, p.b, p.r // 64 AS tr, p.c // 64 AS tc,
         p.r % 64 AS lr, p.c % 64 AS lc,
         LEAST(64, i.h - 64 * (p.r // 64)) AS th,
         LEAST(64, i.w - 64 * (p.c // 64)) AS tw,
         p.px
  FROM allpx p JOIN img i ON i.idx = p.idx
),
ops AS (SELECT unnest(['hflip', 'vflip', 'rot90']) AS op)
SELECT image_id,
       CAST(tr AS BIGINT) AS tile_row,
       CAST(tc AS BIGINT) AS tile_col,
       CAST(b AS BIGINT) AS band,
       op,
       CAST(COUNT(*) AS BIGINT) AS n_valid,
       CAST(SUM(px * (1 + (CASE op
              WHEN 'hflip' THEN lr * tw + (tw - 1 - lc)
              WHEN 'vflip' THEN (th - 1 - lr) * tw + lc
              ELSE lc * th + (th - 1 - lr) END) % 97)) AS BIGINT) AS wsum
FROM base CROSS JOIN ops
GROUP BY image_id, tr, tc, b, op
""",
        "multimodal_audio_features": """
WITH d AS (
  SELECT doc_id, 1 + doc_id % 2 AS channels,
         1024 // (1 + doc_id % 2) AS per
  FROM documents
),
pos AS (
  SELECT doc_id, per, unnest(range(0, 1024)) AS i FROM d
),
s AS (
  SELECT doc_id, per, i // per AS ch, i % per AS p,
         (doc_id * 37 + i * i) % 2001 - 1000 AS x
  FROM pos
),
sx AS (
  SELECT *, lead(x) OVER (PARTITION BY doc_id, ch ORDER BY p) AS xn FROM s
),
fr AS (
  SELECT doc_id, unnest(range(0, 1 + (per - 256) // 128)) AS f FROM d
)
SELECT s.doc_id,
       CAST(s.ch AS BIGINT) AS channel,
       CAST(fr.f AS BIGINT) AS frame_index,
       CAST(SUM(s.x * s.x) AS BIGINT) AS energy,
       CAST(SUM(CASE WHEN s.p < fr.f * 128 + 255 AND s.x * s.xn < 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
       CAST(MAX(ABS(s.x)) AS BIGINT) AS peak
FROM sx s
JOIN fr ON fr.doc_id = s.doc_id
       AND s.p >= fr.f * 128 AND s.p < fr.f * 128 + 256
GROUP BY s.doc_id, s.ch, fr.f
""",
        "multimodal_scene_cut": """
WITH fx AS (SELECT doc_id, unnest(range(1, 5)) AS f FROM documents),
px AS (SELECT doc_id, f, unnest(range(0, 192)) AS i FROM fx),
sad AS (
  SELECT doc_id, f,
         SUM(ABS(((doc_id * 13 + f * 257 + i * i) % 256)
               - ((doc_id * 13 + (f - 1) * 257 + i * i) % 256))) AS sad
  FROM px GROUP BY doc_id, f
)
SELECT doc_id, CAST(f AS BIGINT) AS frame_index,
       CAST(sad AS BIGINT) AS sad,
       CAST(CASE WHEN sad > 400 THEN 1 ELSE 0 END AS BIGINT) AS is_cut
FROM sad
""",
        "geo_interpolate_na_plane": """
SELECT d.doc_id, s.pixel_sum, h.n_holes_filled
FROM documents d,
LATERAL (
  SELECT CAST(SUM((1 + d.doc_id % 5) * r + (2 + d.doc_id % 7) * c
                  + d.doc_id % 100) AS BIGINT) AS pixel_sum
  FROM generate_series(0, 23) tr(r) CROSS JOIN generate_series(0, 23) tc(c)
) s,
LATERAL (
  SELECT COUNT(*) AS n_holes_filled
  FROM generate_series(2, 21) tr(r) CROSS JOIN generate_series(2, 21) tc(c)
  WHERE (r * 24 + c + d.doc_id) % 13 = 0
) h
""",
        "geo_interpolate_na_nearest": """
SELECT d.doc_id, s.pixel_sum, CAST(512 AS BIGINT) AS n_holes_filled
FROM documents d, LATERAL (
  SELECT CAST(SUM(
    (d.doc_id * 37 + r * 61
     + (CASE WHEN c % 4 = 1 THEN c - 1
             WHEN c % 4 = 2 THEN c + 1
             ELSE c END) * 13) % 1000
  ) AS BIGINT) AS pixel_sum
  FROM generate_series(0, 31) tr(r) CROSS JOIN generate_series(0, 31) tc(c)
) s
""",
        "geo_reproject_bilinear_fixed": """
SELECT d.doc_id,
       CAST(4 AS BIGINT) AS dst_h, CAST(4 AS BIGINT) AS dst_w,
       s.wsum
FROM documents d, LATERAL (
  SELECT SUM(
           ((  (d.doc_id * 7 + (2*R*8 + 2*C) * (2*R*8 + 2*C)) % 511
             + (d.doc_id * 7 + (2*R*8 + 2*C + 1) * (2*R*8 + 2*C + 1)) % 511
             + (d.doc_id * 7 + ((2*R+1)*8 + 2*C) * ((2*R+1)*8 + 2*C)) % 511
             + (d.doc_id * 7 + ((2*R+1)*8 + 2*C + 1) * ((2*R+1)*8 + 2*C + 1)) % 511
            ) / 4.0) * (R * 4 + C + 1)
         ) AS wsum
  FROM generate_series(0, 3) tr(R), generate_series(0, 3) tc(C)
) s
""",
        "geo_open_netcdf": """
SELECT d.doc_id,
       s.pixel_sum,
       CAST(2 AS BIGINT) AS bands, CAST(9 AS BIGINT) AS h,
       CAST(11 AS BIGINT) AS w,
       TRUE AS dtype_ok,
       CAST(-77 AS DOUBLE) AS nodata,
       CAST(32615 AS BIGINT) AS epsg,
       CAST(d.doc_id % 7 AS DOUBLE) AS origin_x,
       CAST(d.doc_id % 13 AS DOUBLE) AS origin_y,
       CAST(0.5 AS DOUBLE) AS res_x,
       CAST(-0.25 AS DOUBLE) AS res_y
FROM documents d, LATERAL (
  SELECT CAST(SUM((d.doc_id * 31 + i * i) % 3001 - 1500) AS BIGINT)
         AS pixel_sum
  FROM generate_series(0, 197) t(i)
) s
""",
        "geo_open_geotiff": """
SELECT d.doc_id,
       s.pixel_sum,
       CAST(2 AS BIGINT) AS bands, CAST(12 AS BIGINT) AS h,
       CAST(12 AS BIGINT) AS w,
       TRUE AS dtype_ok,
       CAST(32621 AS BIGINT) AS epsg,
       CAST(d.doc_id % 100 AS DOUBLE) AS origin_x,
       CAST(d.doc_id % 50 AS DOUBLE) AS origin_y
FROM documents d, LATERAL (
  SELECT CAST(SUM((d.doc_id * 19 + i * i) % 4001 - 2000) AS BIGINT)
         AS pixel_sum
  FROM generate_series(0, 287) t(i)
) s
""",
        "multimodal_jpeg": """
SELECT d.doc_id,
       s.pixel_sum * 64 AS pixel_sum,
       s.pixel_min AS pixel_min, s.pixel_max AS pixel_max
FROM documents d, LATERAL (
  SELECT CAST(SUM((d.doc_id * 23 + b * b) % 256) AS BIGINT) AS pixel_sum,
         CAST(MIN((d.doc_id * 23 + b * b) % 256) AS BIGINT) AS pixel_min,
         CAST(MAX((d.doc_id * 23 + b * b) % 256) AS BIGINT) AS pixel_max
  FROM generate_series(0, 5) t(b)
) s
""",
        "text_length_quantiles": r"""
WITH t AS (
  SELECT CASE WHEN trim(text) = '' THEN 0
              ELSE CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
         END AS n_tokens
  FROM documents
),
ql AS (
  SELECT quantile_disc(n_tokens, [0.0, 0.25, 0.5, 0.75, 0.875, 1.0]) AS vs
  FROM t
)
SELECT unnest([0.0, 0.25, 0.5, 0.75, 0.875, 1.0]) AS q,
       unnest(vs) AS value
FROM ql
""",
        "events_asof_orders": """
WITH cand AS (
  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
         o.o_orderkey, o.o_totalprice,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
         ) AS rn
  FROM events e
  JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id, ts_us, o_orderkey, o_totalprice
FROM cand WHERE rn = 1
""",
        "events_interval_orders": """
WITH win AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         1704067200000000
           + ((o_orderkey * 2654435761) % 2592000) * 1000000 AS start_us,
         1704067200000000
           + ((o_orderkey * 2654435761) % 2592000) * 1000000
           + (300 + o_orderkey % 86400) * 1000000 AS end_us
  FROM orders
)
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
       w.o_orderkey, w.o_totalprice
FROM events e
JOIN win w
  ON w.o_custkey = e.user_id
 AND epoch_us(e.ts) >= w.start_us
 AND epoch_us(e.ts) < w.end_us
""",
        "text_sample": r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
       END AS n_tokens
FROM documents
WHERE md5_number_upper('7:' || CAST(doc_id AS VARCHAR)) % 1000 < 200
""",
        "text_shuffle": """
WITH r AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY md5_number_upper('7:' || CAST(doc_id AS VARCHAR)),
                    doc_id) AS rank
  FROM documents
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 512
""",
        "text_collocations": r"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z'']+') AS ts
  FROM documents
),
u AS (
  SELECT unnest(ts) AS token, generate_subscripts(ts, 1) AS pos, doc_id
  FROM toks
),
uni AS (SELECT token, COUNT(*) AS n FROM u GROUP BY token),
bi AS (
  SELECT a.token AS w1, b.token AS w2, COUNT(*) AS c12
  FROM u a JOIN u b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY a.token, b.token
),
nt AS (SELECT SUM(c12) AS n FROM bi),
s AS (
  SELECT bi.w1 || ' ' || bi.w2 AS bigram, bi.c12,
         (bi.c12 * nt.n * 1000) // (u1.n * u2.n) AS score
  FROM bi
  JOIN uni u1 ON u1.token = bi.w1
  JOIN uni u2 ON u2.token = bi.w2
  CROSS JOIN nt
  WHERE bi.c12 >= 5
),
r AS (
  SELECT bigram, c12, score,
         row_number() OVER (ORDER BY score DESC, bigram ASC) AS rk
  FROM s
)
SELECT bigram, CAST(c12 AS BIGINT) AS c12, CAST(score AS BIGINT) AS score
FROM r WHERE rk <= 25
""",
        "text_fluency": r"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z'']+') AS ts
  FROM documents
),
u AS (
  SELECT unnest(ts) AS token, generate_subscripts(ts, 1) AS pos, doc_id
  FROM toks
),
uni AS (SELECT token, COUNT(*) AS c1 FROM u GROUP BY token),
bipos AS (
  SELECT a.doc_id, a.token AS w1, b.token AS w2
  FROM u a JOIN u b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
bi AS (SELECT w1, w2, COUNT(*) AS c12 FROM bipos GROUP BY w1, w2)
SELECT p.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM((bi.c12 * 1000) // uni.c1) AS BIGINT) AS fluency_sum
FROM bipos p
JOIN bi ON bi.w1 = p.w1 AND bi.w2 = p.w2
JOIN uni ON uni.token = p.w1
GROUP BY p.doc_id
""",
        "text_pack": r"""
WITH toks AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(coalesce(text, '')), '[a-z'']+'))
           AS n_tokens
  FROM documents
),
nz AS (SELECT * FROM toks WHERE n_tokens > 0),
scanned AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING), 0) AS tok_offset
  FROM nz
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(tok_offset AS BIGINT) AS tok_offset,
       CAST(tok_offset // 512 AS BIGINT) AS seq_first,
       CAST((tok_offset + n_tokens - 1) // 512 AS BIGINT) AS seq_last
FROM scanned
""",
        "text_stratified_sample": """
WITH d AS (
  SELECT doc_id, lang, md5_number_upper('7:' || doc_id) AS u
  FROM documents
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rk
  FROM d
)
SELECT lang, doc_id FROM r WHERE rk <= 5
""",
        "text_token_topk": """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z'']+'))
           AS token
  FROM documents
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
FROM toks
GROUP BY token
ORDER BY cnt DESC, token ASC
LIMIT 50
""",
        # line split + per-(doc,line) group mirrors repetition_batch's
        # dictionary-encode + composite-key unique exactly; bigrams via
        # ordinality self-join on i+1
        # sequential rewrite mirrored stage by stage: each rule counts on
        # the text as seen at its turn (email -> ip -> phone), exactly as
        # redact_batch applies PII_RULES in order; same RE2 engine
        "text_redact": r"""
SELECT doc_id,
 CAST(length(regexp_extract_all(t0,
   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
 CAST(length(regexp_extract_all(t1,
   '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
 CAST(length(regexp_extract_all(t2,
   '\+[0-9][0-9 ()\-]{6,}[0-9]')) AS BIGINT) AS n_phone,
 md5(regexp_replace(t2, '\+[0-9][0-9 ()\-]{6,}[0-9]', '<PHONE>', 'g'))
   AS clean_md5
FROM (
 SELECT doc_id, t0, t1,
   regexp_replace(t1,
     '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS t2
 FROM (
  SELECT doc_id, t0,
    regexp_replace(t0,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
  FROM (
   SELECT doc_id,
     COALESCE(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)
       || '@ex' || CAST(doc_id % 7 AS VARCHAR)
       || '.com or +1 555 00' || CAST(doc_id AS VARCHAR)
       || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 end' AS t0
   FROM documents
  )
 )
)
""",
        # chunk i covers [i*stride, min(i*stride+size, m)); n_chunks =
        # ceil(max(m-overlap,1)/stride) via integer arithmetic; chunk text
        # rebuilt with 1-based inclusive list slicing and md5'd
        "text_chunk": """
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(COALESCE(text, '')), '[a-z'']+') AS ts,
         len(regexp_extract_all(lower(COALESCE(text, '')), '[a-z'']+')) AS m
  FROM documents
),
chunks AS (
  SELECT doc_id, i AS chunk_id, i * 24 AS tok_start,
         LEAST(i * 24 + 32, m) AS tok_end, ts
  FROM (SELECT doc_id, ts, m,
               unnest(generate_series(0, (GREATEST(m - 8, 1) + 23) // 24 - 1))
                 AS i
        FROM toks WHERE m > 0)
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(tok_start AS BIGINT) AS tok_start,
       CAST(tok_end AS BIGINT) AS tok_end,
       md5(array_to_string(ts[tok_start + 1:tok_end], ' ')) AS chunk_md5
FROM chunks
""",
        "dedup_chunks": """
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(COALESCE(text, '')), '[a-z'']+') AS ts,
         len(regexp_extract_all(lower(COALESCE(text, '')), '[a-z'']+')) AS m
  FROM documents
),
chunks AS (
  SELECT doc_id, i AS chunk_id, i * 24 AS tok_start,
         LEAST(i * 24 + 32, m) AS tok_end, ts
  FROM (SELECT doc_id, ts, m,
               unnest(generate_series(0, (GREATEST(m - 8, 1) + 23) // 24 - 1))
                 AS i
        FROM toks WHERE m > 0)
),
ch AS (
  SELECT doc_id, chunk_id,
         md5(array_to_string(ts[tok_start + 1:tok_end], ' ')) AS h
  FROM chunks
),
own AS (
  SELECT h, MIN(doc_id * 1048576 + chunk_id) AS packed FROM ch GROUP BY h
),
kept AS (
  SELECT packed // 1048576 AS doc_id, COUNT(*) AS n_kept
  FROM own GROUP BY 1
),
nc AS (SELECT doc_id, COUNT(*) AS n_chunks FROM ch GROUP BY doc_id)
SELECT nc.doc_id, CAST(nc.n_chunks AS BIGINT) AS n_chunks,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM nc LEFT JOIN kept k ON k.doc_id = nc.doc_id
""",
        # grams rebuilt with the shared [a-z']+ token rule; the benchmark
        # side (doc_id % 50 = 0) is deduplicated before the LEFT JOIN so
        # each corpus gram occurrence is counted once, matching pc.is_in
        "text_decontaminate_bloom": r"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(COALESCE(text, '')), '[a-z'']+') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(ts[i:i+4], ' ') AS g
  FROM (SELECT doc_id, ts,
               unnest(generate_series(1, len(ts) - 4)) AS i
        FROM toks)
),
dg AS (SELECT DISTINCT doc_id, g FROM grams),
bg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
ks AS (SELECT unnest([0, 1, 2]) AS i),
bp AS (
  SELECT DISTINCT md5_number_upper(g || ':' || i) % 1048576 AS p
  FROM bg CROSS JOIN ks
),
dpos AS (
  SELECT doc_id, g, i, md5_number_upper(g || ':' || i) % 1048576 AS p
  FROM dg CROSS JOIN ks
),
hits AS (
  SELECT doc_id, g
  FROM dpos JOIN bp ON bp.p = dpos.p
  GROUP BY doc_id, g HAVING COUNT(DISTINCT i) = 3
),
counts AS (SELECT doc_id, COUNT(*) AS n_grams FROM dg GROUP BY doc_id),
h AS (SELECT doc_id, COUNT(*) AS n_bloom_hits FROM hits GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(c.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(h.n_bloom_hits, 0) AS BIGINT) AS n_bloom_hits,
       CAST(COALESCE(h.n_bloom_hits, 0) > 0 AS BIGINT) AS flagged
FROM documents d
LEFT JOIN counts c USING (doc_id)
LEFT JOIN h USING (doc_id)
""",
        "text_decontaminate": r"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(COALESCE(text, '')), '[a-z'']+') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(ts[i:i+4], ' ') AS g
  FROM (SELECT doc_id, ts,
               unnest(generate_series(1, len(ts) - 4)) AS i
        FROM toks)
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
agg AS (
  SELECT gr.doc_id, COUNT(*) AS n_grams, COUNT(b.g) AS n_contaminated
  FROM grams gr LEFT JOIN bench b ON gr.g = b.g
  GROUP BY gr.doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams,
  CAST(COALESCE(a.n_contaminated, 0) AS BIGINT) AS n_contaminated,
  CAST(COALESCE(a.n_contaminated, 0) > 0 AS BIGINT) AS contaminated
FROM documents d LEFT JOIN agg a USING (doc_id)
""",
        "text_repetition": r"""
WITH l AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), chr(10))) AS line
  FROM documents
),
per AS (
  SELECT doc_id, line, COUNT(*) AS c, length(line) AS len
  FROM l GROUP BY doc_id, line
),
lagg AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_lines,
         CAST(COUNT(*) AS BIGINT) AS n_distinct_lines,
         CAST(SUM(c * len) AS BIGINT) AS line_chars,
         CAST(SUM((c - 1) * len) AS BIGINT) AS dup_line_chars
  FROM per GROUP BY doc_id
),
t AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z'']+') AS toks
  FROM documents
),
u AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS i
  FROM t
),
bg AS (
  SELECT a.doc_id, a.w AS w1, b.w AS w2
  FROM u a JOIN u b ON a.doc_id = b.doc_id AND b.i = a.i + 1
),
gc AS (
  SELECT doc_id, w1, w2, COUNT(*) AS c FROM bg GROUP BY doc_id, w1, w2
),
bagg AS (
  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_count,
         CAST(SUM(c) AS BIGINT) AS n_bigrams
  FROM gc GROUP BY doc_id
)
SELECT d.doc_id, l.n_lines, l.n_distinct_lines, l.line_chars,
       l.dup_line_chars,
       COALESCE(b.top_bigram_count, 0) AS top_bigram_count,
       COALESCE(b.n_bigrams, 0) AS n_bigrams
FROM documents d
JOIN lagg l ON l.doc_id = d.doc_id
LEFT JOIN bagg b ON b.doc_id = d.doc_id
""",
        "text_doc_freq": r"""
WITH u AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z'']+'))
           AS token
  FROM documents
)
SELECT token,
       CAST(COUNT(*) AS BIGINT) AS tf,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
FROM u GROUP BY token HAVING COUNT(DISTINCT doc_id) >= 2
""",
        "ann_topk_int8": r"""
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
                                 x -> ABS(CAST(x AS DOUBLE)))) AS scale
  FROM embeddings
),
e AS (
  SELECT vec_id, scale, embedding,
         unnest(generate_series(1, len(embedding))) AS i
  FROM s
),
qc AS (
  SELECT vec_id, i,
         CAST(CASE WHEN scale = 0 THEN 0
                   ELSE round_even((CAST(embedding[i] AS DOUBLE) / scale)
                                   * 127, 0) END AS BIGINT) AS q
  FROM e
),
dots AS (
  SELECT a.vec_id AS query_id, b.vec_id AS vec_id, SUM(a.q * b.q) AS dot
  FROM qc a JOIN qc b ON b.i = a.i
  WHERE a.vec_id % 50 = 0
  GROUP BY a.vec_id, b.vec_id
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dot DESC, vec_id ASC) AS rk
  FROM dots
)
SELECT query_id, vec_id, CAST(rk AS BIGINT) AS rank,
       CAST(dot AS BIGINT) AS dot
FROM r WHERE rk <= 10
""",
        "embedding_quantize": r"""
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
                                 x -> ABS(CAST(x AS DOUBLE)))) AS scale
  FROM embeddings
),
e AS (
  SELECT vec_id, scale, embedding,
         unnest(generate_series(1, len(embedding))) AS i
  FROM s
)
SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
       CAST(CASE WHEN scale = 0 THEN 0
                 ELSE round_even((CAST(embedding[i] AS DOUBLE) / scale)
                                 * 127, 0) END AS BIGINT) AS qv,
       CAST(scale AS DOUBLE) AS scale
FROM e
""",
        "text_weighted_sample": r"""
WITH r AS (
  SELECT doc_id, source, n_chars,
         md5_number_upper('7:' || CAST(doc_id AS VARCHAR)) % 1000 AS hv,
         CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 600
                     WHEN 'src2' THEN 300 WHEN 'src3' THEN 50
                     ELSE 150 END AS rate
  FROM documents
)
SELECT doc_id, source, n_chars FROM r WHERE hv < rate
""",
        "text_tfidf_search": r"""
WITH u AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z'']+'))
           AS token
  FROM documents
),
q AS (SELECT unnest(['merge', 'window', 'hash']) AS token),
n AS (SELECT COUNT(*) AS nd FROM documents),
df AS (
  SELECT u.token, COUNT(DISTINCT u.doc_id) AS df
  FROM u JOIN q ON q.token = u.token GROUP BY u.token
),
tf AS (
  SELECT u.doc_id, u.token, COUNT(*) AS tf
  FROM u JOIN q ON q.token = u.token GROUP BY u.doc_id, u.token
),
s AS (
  SELECT tf.doc_id,
         SUM(tf.tf * ((n.nd * 1000) // df.df)) AS score
  FROM tf JOIN df ON df.token = tf.token CROSS JOIN n
  GROUP BY tf.doc_id
),
r AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
  FROM s WHERE score > 0
)
SELECT doc_id, CAST(score AS BIGINT) AS score FROM r WHERE rk <= 25
""",
        "text_bm25": r"""
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z'']+') AS ts
  FROM documents
),
u AS (SELECT doc_id, unnest(ts) AS token FROM toks),
dl AS (SELECT doc_id, len(ts) AS dl FROM toks),
n AS (SELECT COUNT(*) AS nd FROM documents),
tt AS (SELECT SUM(dl) AS tt FROM dl),
q AS (SELECT unnest(['merge', 'window', 'hash']) AS token),
df AS (
  SELECT u.token, COUNT(DISTINCT u.doc_id) AS df
  FROM u JOIN q ON q.token = u.token GROUP BY u.token
),
tf AS (
  SELECT u.doc_id, u.token, COUNT(*) AS tf
  FROM u JOIN q ON q.token = u.token GROUP BY u.doc_id, u.token
),
s AS (
  SELECT tf.doc_id,
         SUM(
           (((n.nd * 1000) // df.df) * 22 * tt.tt * tf.tf)
           // (10 * tt.tt * tf.tf + 3 * tt.tt + 9 * dl.dl * n.nd)
         ) AS score
  FROM tf
  JOIN df ON df.token = tf.token
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN n CROSS JOIN tt
  GROUP BY tf.doc_id
),
r AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rk
  FROM s WHERE score > 0
)
SELECT doc_id, CAST(score AS BIGINT) AS score FROM r WHERE rk <= 25
""",
        "text_rarest_term": r"""
WITH u AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z'']+'))
           AS token
  FROM documents
),
g AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM u GROUP BY token
),
r AS (
  SELECT u.doc_id, u.token, g.df,
         row_number() OVER (PARTITION BY u.doc_id
                            ORDER BY g.df ASC, u.token ASC) AS rk
  FROM u JOIN g ON g.token = u.token
)
SELECT doc_id, token, df FROM r WHERE rk = 1
""",
        "text_tokens": r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE CAST(length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
       END AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_m
FROM documents
""",
        "text_ngram_jaccard": r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS words
  FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(words) < 3 THEN
            CASE WHEN len(words[1]) = 0 THEN []
                 ELSE [array_to_string(words, ' ')] END
         ELSE [array_to_string(words[i:i+2], ' ')
               FOR i IN range(1, len(words) - 1)]
         END AS grams
  FROM w
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CASE WHEN len(list_distinct(a.grams)) = 0
                 AND len(list_distinct(b.grams)) = 0 THEN 1.0
            WHEN len(list_distinct(a.grams)) = 0
                 OR len(list_distinct(b.grams)) = 0 THEN 0.0
            ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / CAST(len(list_distinct(a.grams || b.grams)) AS DOUBLE)
       END AS jaccard
FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
""",
        "text_quality": r"""
SELECT doc_id,
       CAST(length(regexp_extract_all(lower(text), '[a-z'']+')) AS BIGINT) AS n_words,
       CAST(length(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS n_punct
FROM documents
""",
        # same stopword lists + tokenization + strict-unique-argmax tie rule
        # as functions/text.py LangId (keep the two in lockstep)
        "text_langid": r"""
WITH t AS (
  SELECT doc_id, lang,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z'']+') AS toks
  FROM documents
),
c AS (
  SELECT doc_id, lang,
    len(list_filter(toks, w -> w IN ('der','die','das','und','ist','nicht','ein','mit','zu','den'))) AS c_de,
    len(list_filter(toks, w -> w IN ('the','and','of','to','a','in','is','that','it','for'))) AS c_en,
    len(list_filter(toks, w -> w IN ('el','la','los','y','de','un','una','es','que','por'))) AS c_es,
    len(list_filter(toks, w -> w IN ('le','la','les','et','de','un','une','est','que','pour'))) AS c_fr
  FROM t
),
g AS (
  SELECT *, greatest(c_de, c_en, c_es, c_fr) AS top,
         CAST(c_de = greatest(c_de, c_en, c_es, c_fr) AS INT)
           + CAST(c_en = greatest(c_de, c_en, c_es, c_fr) AS INT)
           + CAST(c_es = greatest(c_de, c_en, c_es, c_fr) AS INT)
           + CAST(c_fr = greatest(c_de, c_en, c_es, c_fr) AS INT) AS n_at_top
  FROM c
)
SELECT doc_id, lang,
       CASE WHEN top = 0 OR n_at_top > 1 THEN 'und'
            WHEN c_de = top THEN 'de'
            WHEN c_en = top THEN 'en'
            WHEN c_es = top THEN 'es'
            ELSE 'fr' END AS lang_pred
FROM g
""",
        # fingerprint = md5_number_upper(ws-normalized text): first 8 md5
        # digest bytes little-endian, matching functions/text.py exactly
        "text_fingerprint": r"""
SELECT doc_id,
       md5_number_upper(trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g'), ' ')) AS fingerprint
FROM documents
""",
        "dedup_minhash_md5": _minhash_md5_oracle(64, 16, 3),
        "dedup_simhash_md5": f"""
WITH {_SIMHASH_MD5_CTE}
SELECT doc_id,
       CAST(CASE WHEN u >= {1 << 63} THEN u - {1 << 64} ELSE u END AS BIGINT)
         AS simhash
FROM sh
""",
        "image_ahash": f"""
WITH {_AHASH_CTE}
SELECT doc_id,
       CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
                 THEN u - CAST('18446744073709551616' AS HUGEINT)
                 ELSE u END AS BIGINT) AS ahash
FROM hb
""",
        "image_near_dup": f"""
WITH {_AHASH_CTE},
segs AS (
  SELECT doc_id, u, k.band,
         CAST((u // (CAST(1 AS HUGEINT) << CAST(16 * k.band AS INT))) % 65536
              AS BIGINT) AS bucket
  FROM hb CROSS JOIN (SELECT unnest(range(4)) AS band) k
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b, l.u AS ua, r.u AS ub
  FROM segs l JOIN segs r ON l.band = r.band AND l.bucket = r.bucket
                         AND l.doc_id < r.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(CAST(ua AS UBIGINT), CAST(ub AS UBIGINT))) AS BIGINT)
         AS hamming
FROM cand
WHERE bit_count(xor(CAST(ua AS UBIGINT), CAST(ub AS UBIGINT))) <= 3
""",
        "image_phash": f"""
WITH {_AHASH_CTE},
tmat(u, j, t) AS (
  SELECT * FROM (VALUES
    (0, 0, 4096), (0, 1, 4096), (0, 2, 4096), (0, 3, 4096), (0, 4, 4096), (0, 5, 4096), (0, 6, 4096), (0, 7, 4096), (0, 8, 4096), (0, 9, 4096), (0, 10, 4096), (0, 11, 4096), (0, 12, 4096), (0, 13, 4096), (0, 14, 4096), (0, 15, 4096),
    (1, 0, 5765), (1, 1, 5543), (1, 2, 5109), (1, 3, 4478), (1, 4, 3675), (1, 5, 2731), (1, 6, 1682), (1, 7, 568), (1, 8, -568), (1, 9, -1682), (1, 10, -2731), (1, 11, -3675), (1, 12, -4478), (1, 13, -5109), (1, 14, -5543), (1, 15, -5765),
    (2, 0, 5681), (2, 1, 4816), (2, 2, 3218), (2, 3, 1130), (2, 4, -1130), (2, 5, -3218), (2, 6, -4816), (2, 7, -5681), (2, 8, -5681), (2, 9, -4816), (2, 10, -3218), (2, 11, -1130), (2, 12, 1130), (2, 13, 3218), (2, 14, 4816), (2, 15, 5681),
    (3, 0, 5543), (3, 1, 3675), (3, 2, 568), (3, 3, -2731), (3, 4, -5109), (3, 5, -5765), (3, 6, -4478), (3, 7, -1682), (3, 8, 1682), (3, 9, 4478), (3, 10, 5765), (3, 11, 5109), (3, 12, 2731), (3, 13, -568), (3, 14, -3675), (3, 15, -5543),
    (4, 0, 5352), (4, 1, 2217), (4, 2, -2217), (4, 3, -5352), (4, 4, -5352), (4, 5, -2217), (4, 6, 2217), (4, 7, 5352), (4, 8, 5352), (4, 9, 2217), (4, 10, -2217), (4, 11, -5352), (4, 12, -5352), (4, 13, -2217), (4, 14, 2217), (4, 15, 5352),
    (5, 0, 5109), (5, 1, 568), (5, 2, -4478), (5, 3, -5543), (5, 4, -1682), (5, 5, 3675), (5, 6, 5765), (5, 7, 2731), (5, 8, -2731), (5, 9, -5765), (5, 10, -3675), (5, 11, 1682), (5, 12, 5543), (5, 13, 4478), (5, 14, -568), (5, 15, -5109),
    (6, 0, 4816), (6, 1, -1130), (6, 2, -5681), (6, 3, -3218), (6, 4, 3218), (6, 5, 5681), (6, 6, 1130), (6, 7, -4816), (6, 8, -4816), (6, 9, 1130), (6, 10, 5681), (6, 11, 3218), (6, 12, -3218), (6, 13, -5681), (6, 14, -1130), (6, 15, 4816),
    (7, 0, 4478), (7, 1, -2731), (7, 2, -5543), (7, 3, 568), (7, 4, 5765), (7, 5, 1682), (7, 6, -5109), (7, 7, -3675), (7, 8, 3675), (7, 9, 5109), (7, 10, -1682), (7, 11, -5765), (7, 12, -568), (7, 13, 5543), (7, 14, 2731), (7, 15, -4478),
    (8, 0, 4096), (8, 1, -4096), (8, 2, -4096), (8, 3, 4096), (8, 4, 4096), (8, 5, -4096), (8, 6, -4096), (8, 7, 4096), (8, 8, 4096), (8, 9, -4096), (8, 10, -4096), (8, 11, 4096), (8, 12, 4096), (8, 13, -4096), (8, 14, -4096), (8, 15, 4096),
    (9, 0, 3675), (9, 1, -5109), (9, 2, -1682), (9, 3, 5765), (9, 4, -568), (9, 5, -5543), (9, 6, 2731), (9, 7, 4478), (9, 8, -4478), (9, 9, -2731), (9, 10, 5543), (9, 11, 568), (9, 12, -5765), (9, 13, 1682), (9, 14, 5109), (9, 15, -3675),
    (10, 0, 3218), (10, 1, -5681), (10, 2, 1130), (10, 3, 4816), (10, 4, -4816), (10, 5, -1130), (10, 6, 5681), (10, 7, -3218), (10, 8, -3218), (10, 9, 5681), (10, 10, -1130), (10, 11, -4816), (10, 12, 4816), (10, 13, 1130), (10, 14, -5681), (10, 15, 3218),
    (11, 0, 2731), (11, 1, -5765), (11, 2, 3675), (11, 3, 1682), (11, 4, -5543), (11, 5, 4478), (11, 6, 568), (11, 7, -5109), (11, 8, 5109), (11, 9, -568), (11, 10, -4478), (11, 11, 5543), (11, 12, -1682), (11, 13, -3675), (11, 14, 5765), (11, 15, -2731),
    (12, 0, 2217), (12, 1, -5352), (12, 2, 5352), (12, 3, -2217), (12, 4, -2217), (12, 5, 5352), (12, 6, -5352), (12, 7, 2217), (12, 8, 2217), (12, 9, -5352), (12, 10, 5352), (12, 11, -2217), (12, 12, -2217), (12, 13, 5352), (12, 14, -5352), (12, 15, 2217),
    (13, 0, 1682), (13, 1, -4478), (13, 2, 5765), (13, 3, -5109), (13, 4, 2731), (13, 5, 568), (13, 6, -3675), (13, 7, 5543), (13, 8, -5543), (13, 9, 3675), (13, 10, -568), (13, 11, -2731), (13, 12, 5109), (13, 13, -5765), (13, 14, 4478), (13, 15, -1682),
    (14, 0, 1130), (14, 1, -3218), (14, 2, 4816), (14, 3, -5681), (14, 4, 5681), (14, 5, -4816), (14, 6, 3218), (14, 7, -1130), (14, 8, -1130), (14, 9, 3218), (14, 10, -4816), (14, 11, 5681), (14, 12, -5681), (14, 13, 4816), (14, 14, -3218), (14, 15, 1130),
    (15, 0, 568), (15, 1, -1682), (15, 2, 2731), (15, 3, -3675), (15, 4, 4478), (15, 5, -5109), (15, 6, 5543), (15, 7, -5765), (15, 8, 5765), (15, 9, -5543), (15, 10, 5109), (15, 11, -4478), (15, 12, 3675), (15, 13, -2731), (15, 14, 1682), (15, 15, -568)
  ) x(u, j, t)
),
g AS (SELECT doc_id, i // 16 AS r, i % 16 AS c, v FROM px),
coef AS (
  SELECT g.doc_id, tu.u AS cu, tv.u AS cv,
         SUM(tu.t * g.v * tv.t) AS coef
  FROM g
  JOIN tmat tu ON tu.j = g.r
  JOIN tmat tv ON tv.j = g.c
  WHERE tu.u < 8 AND tv.u < 8
  GROUP BY g.doc_id, tu.u, tv.u
),
med AS (
  SELECT doc_id, coef AS m FROM (
    SELECT doc_id, coef,
           row_number() OVER (PARTITION BY doc_id ORDER BY coef) AS rk
    FROM coef WHERE NOT (cu = 0 AND cv = 0)
  ) WHERE rk = 32
),
hp AS (
  SELECT c.doc_id,
         SUM(CASE WHEN c.coef > m.m
                  THEN CAST(1 AS HUGEINT) << CAST(c.cu * 8 + c.cv AS INT)
                  ELSE CAST(0 AS HUGEINT) END) AS u
  FROM coef c JOIN med m ON m.doc_id = c.doc_id
  GROUP BY c.doc_id
)
SELECT doc_id,
       CAST(CASE WHEN u >= CAST('9223372036854775808' AS HUGEINT)
                 THEN u - CAST('18446744073709551616' AS HUGEINT)
                 ELSE u END AS BIGINT) AS phash64
FROM hp
""",
        "multimodal_joint_near_dup": f"""
WITH {_AHASH_CTE},
segs AS (
  SELECT doc_id, u, k.band,
         CAST((u // (CAST(1 AS HUGEINT) << CAST(16 * k.band AS INT))) % 65536
              AS BIGINT) AS bucket
  FROM hb CROSS JOIN (SELECT unnest(range(4)) AS band) k
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b, l.u AS ua, r.u AS ub
  FROM segs l JOIN segs r ON l.band = r.band AND l.bucket = r.bucket
                         AND l.doc_id < r.doc_id
),
ip AS (
  SELECT doc_a, doc_b FROM cand
  WHERE bit_count(xor(CAST(ua AS UBIGINT), CAST(ub AS UBIGINT))) <= 3
),
w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS words
  FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(words) < 3 THEN
            CASE WHEN len(words[1]) = 0 THEN []
                 ELSE [array_to_string(words, ' ')] END
         ELSE [array_to_string(words[i:i+2], ' ')
               FOR i IN range(1, len(words) - 1)]
         END AS grams
  FROM w
)
SELECT ip.doc_a, ip.doc_b,
       CASE WHEN len(list_distinct(a.grams)) = 0
                 AND len(list_distinct(b.grams)) = 0 THEN 1.0
            WHEN len(list_distinct(a.grams)) = 0
                 OR len(list_distinct(b.grams)) = 0 THEN 0.0
            ELSE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / CAST(len(list_distinct(a.grams || b.grams)) AS DOUBLE)
       END AS jaccard
FROM ip JOIN g a ON a.doc_id = ip.doc_a JOIN g b ON b.doc_id = ip.doc_b
""",
        "dedup_simhash_pairs_md5": f"""
WITH {_SIMHASH_MD5_CTE},
segs AS (
  SELECT doc_id, u, k.band,
         CAST((u // (CAST(1 AS HUGEINT) << CAST(16 * k.band AS INT))) % 65536
              AS BIGINT) AS bucket
  FROM sh CROSS JOIN (SELECT unnest(range(4)) AS band) k
),
cand AS (
  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b, l.u AS ua, r.u AS ub
  FROM segs l JOIN segs r ON l.band = r.band AND l.bucket = r.bucket
                         AND l.doc_id < r.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(CAST(ua AS UBIGINT), CAST(ub AS UBIGINT))) AS BIGINT)
         AS hamming
FROM cand
WHERE bit_count(xor(CAST(ua AS UBIGINT), CAST(ub AS UBIGINT))) <= 3
""",
        # hyperplane LSH near-dup, composed: 64-plane signed projections
        # (the embedding_sketch SUM over generate_series(0,63)), sign bits
        # packed to a HUGEINT signature, the simhash segment/bucket CTEs,
        # then a literal cosine verify
        "embedding_lsh_near_dup": f"""
WITH src AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         list_concat([CAST(embedding AS DOUBLE[])[1] + 0.0005],
                     CAST(embedding AS DOUBLE[])[2:])
  FROM embeddings WHERE vec_id % 17 = 0
),
q AS (
  SELECT vec_id, i AS dim,
         CAST(2 * FLOOR(1000 * v) AS BIGINT) AS w
  FROM (SELECT vec_id, unnest(src.v) AS v,
               generate_subscripts(src.v, 1) AS i
        FROM src)
),
proj AS (
  SELECT q.vec_id, od.od AS j,
         SUM(q.w * (1 - 2 * (((q.dim) * (od.od + 1) * 2654435761)
                             % 1000000007 % 2))) AS s
  FROM q CROSS JOIN generate_series(0, 63) od(od)
  GROUP BY q.vec_id, od.od
),
sh AS (
  SELECT vec_id,
         SUM(CASE WHEN s >= 0
                  THEN CAST(1 AS HUGEINT) << CAST(j AS INT)
                  ELSE CAST(0 AS HUGEINT) END) AS u
  FROM proj GROUP BY vec_id
),
segs AS (
  SELECT vec_id, u, k.band,
         CAST((u // (CAST(1 AS HUGEINT) << CAST(16 * k.band AS INT))) % 65536
              AS BIGINT) AS bucket
  FROM sh CROSS JOIN (SELECT unnest(range(4)) AS band) k
),
cand AS (
  SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b, l.u AS ua, r.u AS ub
  FROM segs l JOIN segs r ON l.band = r.band AND l.bucket = r.bucket
                         AND l.vec_id < r.vec_id
),
ham AS (
  SELECT vec_a, vec_b FROM cand
  WHERE bit_count(xor(CAST(ua AS UBIGINT), CAST(ub AS UBIGINT))) <= 3
)
SELECT h.vec_a, h.vec_b
FROM ham h
JOIN src ea ON ea.vec_id = h.vec_a
JOIN src eb ON eb.vec_id = h.vec_b
WHERE list_cosine_similarity(ea.v, eb.v) >= {_NEAR_DUP_TAU}e0
""",
        # same x2-quantization as kmedians; sign = product hash parity
        "embedding_sketch": """
WITH q AS (
  SELECT vec_id, i AS dim,
         CAST(2 * FLOOR(1000 * CAST(v AS DOUBLE)) AS BIGINT) AS w
  FROM (SELECT vec_id, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings)
)
SELECT q.vec_id, od.od AS out_dim,
       CAST(SUM(q.w * (1 - 2 * (((q.dim) * (od.od + 1) * 2654435761)
                                % 1000000007 % 2))) AS BIGINT) AS value
FROM q CROSS JOIN generate_series(0, 15) od(od)
GROUP BY q.vec_id, od.od
""",
        # full 2-pass k-medians replay: quantize w = 2*floor(1000*e)
        # (all-even ints => every median is an integer), L1 argmin with
        # ties to the smallest cluster, per-(cluster,dim) median update,
        # empty clusters carry the previous centroid
        "embedding_gram": """
WITH q AS (
  SELECT vec_id, i AS dim,
         CAST(2 * FLOOR(1000 * CAST(v AS DOUBLE)) AS BIGINT) AS w
  FROM (SELECT vec_id, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings)
)
SELECT CAST(a.dim - 1 AS BIGINT) AS i, CAST(b.dim - 1 AS BIGINT) AS j,
       CAST(SUM(a.w * b.w) AS BIGINT) AS s
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY a.dim, b.dim
""",
        "embedding_kmedians": """
WITH q AS (
  SELECT vec_id, i AS dim,
         CAST(2 * FLOOR(1000 * CAST(v AS DOUBLE)) AS BIGINT) AS w
  FROM (SELECT vec_id, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings)
),
init AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS c,
         vec_id
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
),
c0 AS (SELECT init.c, q.dim, q.w AS cw FROM init JOIN q USING (vec_id)),
d1 AS (
  SELECT q.vec_id, c0.c, SUM(ABS(q.w - c0.cw)) AS dist
  FROM q JOIN c0 ON q.dim = c0.dim GROUP BY q.vec_id, c0.c
),
a1 AS (
  SELECT vec_id, c FROM (
    SELECT vec_id, c,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
    FROM d1
  ) WHERE rn = 1
),
c1 AS (
  SELECT a1.c, q.dim, CAST(median(q.w) AS BIGINT) AS cw
  FROM a1 JOIN q USING (vec_id) GROUP BY a1.c, q.dim
),
c1f AS (
  SELECT c0.c, c0.dim, COALESCE(c1.cw, c0.cw) AS cw
  FROM c0 LEFT JOIN c1 ON c0.c = c1.c AND c0.dim = c1.dim
),
d2 AS (
  SELECT q.vec_id, c1f.c, SUM(ABS(q.w - c1f.cw)) AS dist
  FROM q JOIN c1f ON q.dim = c1f.dim GROUP BY q.vec_id, c1f.c
)
SELECT vec_id, c AS cluster, CAST(dist AS BIGINT) AS l1_dist FROM (
  SELECT vec_id, c, dist,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn
  FROM d2
) WHERE rn = 1
""",
        "embedding_near_dup": f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {_NEAR_DUP_TAU}e0
""",
        "ann_topk": f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id % 50 = 0
),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS cos
  FROM q CROSS JOIN embeddings e
),
r AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id)
           AS rank
  FROM s
)
SELECT query_id, vec_id, CAST(rank AS INT) AS rank FROM r
WHERE rank <= {_ANN_K}
""",
        "events_topk_per_user": """
WITH r AS (
  SELECT user_id, event_id, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY value DESC, event_id
         ) AS rk
  FROM events
)
SELECT user_id, event_id, value FROM r WHERE rk <= 3
""",
        "events_retention": """
WITH a AS (
  SELECT user_id, epoch_us(MIN(ts)) // 86400000000 AS cohort,
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS bucket
  FROM events
),
r AS (
  SELECT a.cohort, act.bucket - a.cohort AS k
  FROM act JOIN a USING (user_id)
  WHERE act.bucket >= a.cohort
)
SELECT cohort, k, CAST(COUNT(*) AS BIGINT) AS n_users
FROM r GROUP BY cohort, k
""",
        "events_funnel": """
WITH u AS (SELECT DISTINCT user_id FROM events),
s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY e.user_id
)
SELECT u.user_id,
       CAST(CASE WHEN s3.t IS NOT NULL THEN 3
                 WHEN s2.t IS NOT NULL THEN 2
                 WHEN s1.t IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS step_reached,
       CAST(COALESCE(epoch_us(s1.t), -1) AS BIGINT) AS t1,
       CAST(COALESCE(epoch_us(s2.t), -1) AS BIGINT) AS t2,
       CAST(COALESCE(epoch_us(s3.t), -1) AS BIGINT) AS t3
FROM u
LEFT JOIN s1 USING (user_id)
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
""",
        "events_cms": """
WITH vc AS (
  SELECT CAST(user_id AS VARCHAR) AS s, COUNT(*) AS cnt
  FROM events GROUP BY user_id
),
ks AS (SELECT unnest([0, 1, 2]) AS i),
cells AS (
  SELECT i, md5_number_upper(s || ':' || i) % 1024 AS c, SUM(cnt) AS n
  FROM vc CROSS JOIN ks
  GROUP BY i, md5_number_upper(s || ':' || i) % 1024
)
SELECT CAST(i AS BIGINT) AS row, CAST(c AS BIGINT) AS col,
       CAST(n AS BIGINT) AS n
FROM cells
""",
        "events_approx_distinct": """
WITH u AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS s FROM events),
h AS (SELECT md5_number_upper(s) AS hv FROM u),
rr AS (SELECT CAST(hv % 4096 AS BIGINT) AS register, hv // 4096 AS w FROM h),
rho AS (
  SELECT register,
         CASE WHEN w = 0 THEN 53
              ELSE CAST(53 - length(bin(w)) AS BIGINT) END AS rho
  FROM rr
)
SELECT register, CAST(MAX(rho) AS BIGINT) AS rho FROM rho GROUP BY register
""",
        "events_window": """
SELECT user_id, date_trunc('hour', ts) AS win,
       count(*) AS n,
       min(event_id) AS min_event, max(event_id) AS max_event
FROM events GROUP BY 1, 2
""",
        "events_window_hopping": """
SELECT user_id,
       (CAST(floor(epoch(ts) / 3600) AS BIGINT) - i) * 3600 AS win_start,
       count(*) AS n,
       min(event_id) AS min_event, max(event_id) AS max_event
FROM events CROSS JOIN generate_series(0, 2) t(i)
GROUP BY 1, 2
""",
        "events_sessionize": """
WITH e AS (
  SELECT event_id, ts, user_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM e
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM s GROUP BY 1, 2
""",
        "agg_revenue_nation": """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue_u,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
        "agg_pricing": """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY 1, 2
""",
    }
    # plan-equivalence twins: the scalable plan and the brute-force plan are
    # both gated against ONE oracle (geo_pip_rect/geo_pip_shuffle pattern)
    sql["embedding_near_dup_bcast"] = sql["embedding_near_dup"]
    sql["ann_topk_blocked"] = sql["ann_topk"]
    # exhaustive probe (nprobe == n_centroids) is exact -> same oracle
    sql["ann_topk_ivf_exhaustive"] = sql["ann_topk"]
    sql["events_sessionize_scalable"] = sql["events_sessionize"]
    # connected-components clustering over the SAME md5-LSH edge SQL the
    # dedup_minhash_md5 oracle replicates: recursive reachability CTE,
    # cluster id = min reachable doc id
    sql["embedding_semantic_dedup"] = f"""
WITH km AS ({sql["embedding_kmedians"]}),
e AS (
  SELECT e0.vec_id, e0.embedding, km.cluster
  FROM embeddings e0 JOIN km ON e0.vec_id = km.vec_id
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cluster
FROM e a JOIN e b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {_NEAR_DUP_TAU}e0
"""
    sql["geo_region_label"] = _region_label_sql(
        "doc_id < 8 AND doc_id % 7 <> 6", threshold=120
    )
    sql["geo_sieve"] = _sieve_sql(
        "doc_id < 8 AND doc_id % 7 <> 6", threshold=120, min_size=100
    )
    # proximity: squared distance is a tie-independent pure MIN; the SQL
    # mirrors the kernel's exact row decomposition (in-row dx2, then a
    # MIN over target rows) so the 65k-pixel-per-image fold stays a pair
    # of bounded hash joins, never an all-pairs pixel join
    sql["geo_proximity"] = f"""
WITH RECURSIVE {_allpx_cte("doc_id < 4 AND doc_id % 7 <> 6")},
fgx AS MATERIALIZED (SELECT idx, b, r, c FROM allpx WHERE px >= 120),
cols AS (SELECT i.idx, unnest(range(0, i.w)) AS c FROM img i),
dx2 AS MATERIALIZED (
  SELECT f.idx, f.b, f.r, k.c, MIN((k.c - f.c) * (k.c - f.c)) AS dx2
  FROM fgx f JOIN cols k ON k.idx = f.idx
  GROUP BY f.idx, f.b, f.r, k.c
),
d2 AS (
  SELECT a.idx, a.image_id, a.b, a.r, a.c,
         MIN((a.r - x.r) * (a.r - x.r) + x.dx2) AS d2
  FROM allpx a JOIN dx2 x ON x.idx = a.idx AND x.b = a.b AND x.c = a.c
  GROUP BY a.idx, a.image_id, a.b, a.r, a.c
)
SELECT image_id, CAST(b AS BIGINT) AS band,
       CAST((r // 64) * 64 AS BIGINT) AS win_row_off,
       CAST((c // 64) * 64 AS BIGINT) AS win_col_off,
       CAST(SUM(d2) AS BIGINT) AS sum_d2,
       CAST(SUM(d2 * ((r * 1315423911 + c * 2654435761) % 1000003))
            AS BIGINT) AS wsum_d2,
       CAST(COUNT(*) AS BIGINT) AS n_valid
FROM d2 GROUP BY image_id, b, win_row_off, win_col_off
"""
    # histogram matching: both CDFs rebuilt from the pixel spec; the
    # closest-rank rule is the same integer cross-multiplication the
    # engine's searchsorted applies (doc 1 = reference, the other
    # single-band rawu8 natives < 32 = sources; 255-value domains keep
    # the rank join tiny)
    sql["geo_match_histograms"] = f"""
WITH RECURSIVE {_allpx_cte(
        "doc_id < 32 AND doc_id % 4 = 1 AND doc_id % 5 <> 0 "
        "AND doc_id % 7 <> 6")},
refc AS (
  SELECT b, px AS u,
         SUM(COUNT(*)) OVER (PARTITION BY b ORDER BY px) AS d,
         SUM(COUNT(*)) OVER (PARTITION BY b) AS nr
  FROM allpx WHERE idx = 1 GROUP BY b, px
),
srcc AS (
  SELECT idx, b, px AS v,
         SUM(COUNT(*)) OVER (PARTITION BY idx, b ORDER BY px) AS csrc,
         SUM(COUNT(*)) OVER (PARTITION BY idx, b) AS ns
  FROM allpx WHERE idx <> 1 GROUP BY idx, b, px
),
lut AS (
  SELECT s.idx, s.b, s.v, MIN(r.u) AS mapped
  FROM srcc s JOIN refc r ON r.b = s.b AND r.d * s.ns >= s.csrc * r.nr
  GROUP BY s.idx, s.b, s.v
),
mapped AS (
  SELECT p.image_id, p.b, p.r, p.c, l.mapped AS px
  FROM allpx p JOIN lut l ON l.idx = p.idx AND l.b = p.b AND l.v = p.px
  WHERE p.idx <> 1
)
SELECT image_id, CAST(b AS BIGINT) AS band,
       CAST((r // 64) * 64 AS BIGINT) AS win_row_off,
       CAST((c // 64) * 64 AS BIGINT) AS win_col_off,
       CAST(SUM(px) AS BIGINT) AS checksum,
       CAST(SUM(px * ((r * 1315423911 + c * 2654435761) % 1000003))
            AS BIGINT) AS wsum,
       CAST(COUNT(*) AS BIGINT) AS n_valid
FROM mapped GROUP BY image_id, b, win_row_off, win_col_off
"""
    sql["embedding_semantic_clusters"] = f"""
WITH RECURSIVE spairs AS ({sql["embedding_semantic_dedup"]}),
sedges AS (
  SELECT vec_a AS a, vec_b AS b FROM spairs
  UNION
  SELECT vec_b AS a, vec_a AS b FROM spairs
),
sconn(n, m) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.b, c.m FROM sedges e JOIN sconn c ON c.n = e.a
)
SELECT n AS vec_id, CAST(MIN(m) AS BIGINT) AS cluster_id,
       MIN(m) = n AS keep
FROM sconn GROUP BY n
"""
    sql["embedding_diverse_sample"] = f"""
WITH km AS ({sql["embedding_kmedians"]}),
ranked AS (
  SELECT vec_id, cluster,
         row_number() OVER (
           PARTITION BY cluster
           ORDER BY md5_number_upper('7:' || CAST(vec_id AS VARCHAR)),
                    vec_id) AS rk
  FROM km
)
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster
FROM ranked WHERE rk <= 16
"""
    sql["embedding_outliers"] = f"""
WITH km AS ({sql["embedding_kmedians"]}),
ranked AS (
  SELECT cluster, vec_id, l1_dist,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY l1_dist DESC, vec_id ASC) AS rk
  FROM km
)
SELECT CAST(cluster AS BIGINT) AS cluster, vec_id,
       CAST(l1_dist AS BIGINT) AS l1_dist
FROM ranked WHERE rk <= 8
"""
    sql["image_near_dup_verify"] = f"""
WITH ipairs AS ({sql["image_near_dup"]}),
pxv AS (
  SELECT d.doc_id, t.i,
         CASE WHEN d.doc_id % 3 = 1 AND t.i = 37
                THEN ((d.doc_id // 3) * 53 + t.i * t.i + 128) % 256
              WHEN d.doc_id % 3 = 2 AND t.i = 74
                THEN ((d.doc_id // 3) * 53 + t.i * t.i + 128) % 256
              ELSE ((d.doc_id // 3) * 53 + t.i * t.i) % 256 END AS v
  FROM documents d CROSS JOIN generate_series(0, 255) t(i)
)
SELECT p.doc_a, p.doc_b,
       CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS mse_num,
       CAST(COUNT(*) AS BIGINT) AS n_px
FROM ipairs p
JOIN pxv a ON a.doc_id = p.doc_a
JOIN pxv b ON b.doc_id = p.doc_b AND b.i = a.i
GROUP BY p.doc_a, p.doc_b
"""
    sql["image_dedup_apply"] = f"""
WITH RECURSIVE ipairs AS ({sql["image_near_dup"]}),
iedges AS (
  SELECT doc_a AS a, doc_b AS b FROM ipairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM ipairs
),
iconn(n, m) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, c.m FROM iedges e JOIN iconn c ON c.n = e.a
)
SELECT n AS doc_id, CAST(MIN(m) AS BIGINT) AS cluster_id,
       MIN(m) = n AS keep
FROM iconn GROUP BY n
"""
    sql["dedup_clusters"] = f"""
WITH RECURSIVE pairs AS ({sql["dedup_minhash_md5"]}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
conn(n, m) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, c.m FROM edges e JOIN conn c ON c.n = e.a
)
SELECT n AS doc_id, CAST(MIN(m) AS BIGINT) AS cluster_id,
       MIN(m) = n AS keep
FROM conn GROUP BY n
"""
    sql["dedup_apply"] = f"""
WITH RECURSIVE pairs AS ({sql["dedup_minhash_md5"]}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
conn(n, m) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, c.m FROM edges e JOIN conn c ON c.n = e.a
),
clusters AS (
  SELECT n AS doc_id, MIN(m) AS cluster_id FROM conn GROUP BY n
),
scored AS (
  SELECT c.doc_id, c.cluster_id, d.n_chars,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id) AS rk
  FROM clusters c JOIN documents d USING (doc_id)
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id, doc_id,
       CAST(n_chars AS BIGINT) AS n_chars
FROM scored WHERE rk = 1
"""
    # geo_mosaic_tiff: the single-file GeoTIFF sink round trip carries the
    # SAME merge semantics as geo_merge (same 16 sources, same union grid,
    # same first-winner rule) but the file covers the FULL tile grid —
    # sparse (uncovered) tiles decode to nodata and contribute checksum 0.
    # Derive the oracle from geo_merge's by swapping the non-empty-tile
    # enumeration for the full grid, so the two mirrored CTE chains can
    # never drift apart.
    _dtiles_nonempty = (
        "dtiles AS (\n"
        "  SELECT DISTINCT (gr // 256) AS d_tr, (gc // 256) AS d_tc "
        "FROM placed\n"
        "),"
    )
    _dtiles_full = (
        "dtiles AS (\n"
        "  SELECT tr.d_tr, tc.d_tc FROM g2,\n"
        "   LATERAL (SELECT unnest(range(0, g2.n_tr)) AS d_tr) tr,\n"
        "   LATERAL (SELECT unnest(range(0, g2.n_tc)) AS d_tc) tc\n"
        "),"
    )
    assert _dtiles_nonempty in sql["geo_merge"]
    sql["geo_mosaic_tiff"] = sql["geo_merge"].replace(
        _dtiles_nonempty, _dtiles_full
    )
    return sql
