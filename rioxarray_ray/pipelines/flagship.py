"""The flagship pipeline (BASELINE.json north_star):

    read corpus -> decode (zero-copy Arrow) -> tile + cell assign
    -> PIP spatial join to vector geometries (broadcast or salted shuffle)
    -> reproject joined tiles onto a common dst grid (actor-pool warp)
    -> write partitioned parquet with completion manifests

Every stage streams; nothing materializes the full corpus.  The corpus
parquet cache under /tmp exercises the real ``ray.data.read_parquet`` path
(shard layout = resumable input).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..sources import corpus
from ..stages import decode as decode_stage_mod
from ..stages import join as join_mod
from ..stages import tile as tile_mod
from ..stages import warp as warp_mod


def corpus_parquet(n: int, root: str = "/tmp/rioxarray_ray/corpus",
                   shard_size: int = 256) -> str:
    """Materialize (once) the first-n-images corpus as sharded parquet.

    Input preparation, not engine work: parallelized over Ray tasks when a
    session is up (first bench run at a new sf), sequential otherwise.
    """
    path = os.path.join(root, f"n{n}-s{shard_size}")
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    starts = list(range(0, n, shard_size))

    def write_shard(start: int) -> None:
        ids = range(start, min(start + shard_size, n))
        tbl = corpus.corpus_table(ids)
        pq.write_table(tbl, os.path.join(path, f"shard-{start:08d}.parquet"))

    try:
        import ray

        if ray.is_initialized():
            task = ray.remote(num_cpus=1)(write_shard)
            ray.get([task.remote(s) for s in starts])
        else:
            raise RuntimeError
    except Exception:
        for s in starts:
            write_shard(s)
    with open(marker, "w") as f:
        f.write("ok")
    return path


def read_corpus(n: int, **read_kwargs):
    import ray.data as rd

    path = corpus_parquet(n)
    return rd.read_parquet(path, **read_kwargs)


def flagship(
    n_images: int,
    n_geoms: int = 64,
    dst_crs: str = "EPSG:3857",
    tile_size: int = 64,
    resampling: str = "nearest",
    join_plan: str = "broadcast",
    concurrency: int = 4,
):
    """decode -> tile -> PIP join -> warp; returns (warped_tiles, join_rows).

    ``join_rows`` is the join relation (no pixels); ``warped_tiles`` is the
    semi-joined tile set (tiles hitting >= 1 polygon) warped to ``dst_crs``.
    """
    import pyarrow.compute as pc

    # split the read into enough blocks to feed every core (shards are 256
    # rows; Ray splits parquet files further when override_num_blocks asks)
    ds = read_corpus(n_images, override_num_blocks=max(n_images // 64, 8))
    decoded = decode_stage_mod.decode_stage(ds)
    tiles = tile_mod.tile_stage(decoded, tile_size=tile_size)
    # stage boundary: the tile set feeds BOTH the join branch and the final
    # warp branch; pin it once instead of re-executing decode+tile per
    # consumer.  (At 100 TB this boundary is a checkpointed parquet dir —
    # state/manifest.py; in-memory materialization is the single-node
    # equivalent and spills via the object store.)
    tiles = tiles.materialize()
    geoms = [
        g for g in corpus.geometry_table(n_geoms) if g["kind"] != "point"
    ]
    if join_plan == "broadcast":
        join_rows = join_mod.pip_join_broadcast(
            tiles, geoms, concurrency=concurrency
        )
    else:
        join_rows = join_mod.pip_join_shuffle(tiles, geoms)
    # join relation is small (no pixels): pin it so the key scan below and
    # the caller's consumption don't re-run the PIP stage
    join_rows = join_rows.materialize()
    # semi-join: keep tiles that matched >= 1 geometry.  The matched key set
    # is a small side (ids only): stream the join's key columns to the
    # driver and dedupe in a set — no groupby shuffle needed.
    keys = set()
    for b in join_rows.select_columns(
        ["image_id", "tile_row", "tile_col"]
    ).iter_batches(batch_size=65536, batch_format="pyarrow"):
        keys.update(
            zip(
                b["image_id"].to_pylist(),
                b["tile_row"].to_pylist(),
                b["tile_col"].to_pylist(),
            )
        )
    key_list = pa.array([f"{i}/{r}/{c}" for i, r, c in sorted(keys)])

    def semi_filter(batch: pa.Table) -> pa.Table:
        tags = pc.binary_join_element_wise(
            batch["image_id"],
            pc.cast(batch["tile_row"], pa.string()),
            pc.cast(batch["tile_col"], pa.string()),
            "/",
        )
        return batch.filter(pc.is_in(tags, value_set=key_list))

    joined_tiles = tiles.map_batches(
        semi_filter, batch_format="pyarrow", zero_copy_batch=True
    )
    warped = warp_mod.reproject_stage(
        joined_tiles,
        dst_crs,
        resampling=resampling,
        concurrency=concurrency,
    )
    return warped, join_rows


def write_output(warped, out_dir: str):
    """Partitioned, resumable output layout: one dir per image-id prefix."""
    warped.write_parquet(out_dir)
    return out_dir
