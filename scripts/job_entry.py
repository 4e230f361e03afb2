"""Cluster job entrypoint: the resumable deep-fused flagship packaged as a
``ray job submit`` payload (BASELINE.json north_rule: "run via ray job
submit on a fixed-size multi-node Ray cluster ... resumable from checkpoint
with per-partition lineage + metrics").

On a real cluster the job supervisor sets RAY_ADDRESS and this attaches to
the running cluster::

    ray job submit --working-dir /root/repo -- \
        python scripts/job_entry.py --corpus-size 80000 \
        --out /mnt/shared/flagship_out

Locally the identical command line starts a one-node session (honoring
RAY_GRAFT_CPUS).  The script is a thin shell around
``rioxarray_ray.pipelines.resumable.run_resumable_fused`` — the library
function the tests exercise (tests/test_stages.py kill/resume cases and
tests/test_api.py::test_job_entry_run_job_resumes); all plan logic lives
there, none here.

Exit contract: exits 0 only when every input partition has a completion
marker in ``<out>/_manifest``.  Re-submitting the same command after a
kill resumes from the manifest — completed partitions are anti-joined out
BEFORE any decode work, so only unfinished shards are re-read.  Each run
appends a metrics record (wall clock, throughput, partition counts) to
``<out>/_metrics.jsonl``; per-partition lineage (rows/bytes/wall_ms per
partition) lives in the manifest markers themselves.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def run_job(
    corpus_size: int,
    out_root: str,
    dst_crs: str = "EPSG:3857",
    tile_size: int = 64,
    concurrency: int = 4,
    n_geoms: int = 64,
    override_num_blocks: int | None = None,
) -> dict:
    """The job body (Ray must already be initialised — the CLI main or the
    test fixture owns the session).  Runs the resumable fused flagship and
    appends one metrics record to ``<out>/_metrics.jsonl``."""
    from rioxarray_ray.pipelines import flagship, resumable
    from rioxarray_ray.state.manifest import PartitionManifest

    t0 = time.monotonic()
    read_kwargs = {}
    if override_num_blocks:
        read_kwargs["override_num_blocks"] = override_num_blocks
    ds = flagship.read_corpus(corpus_size, **read_kwargs)
    result = resumable.run_resumable_fused(
        ds,
        out_root,
        n_geoms=n_geoms,
        dst_crs=dst_crs,
        tile_size=tile_size,
        concurrency=concurrency,
    )
    wall_s = time.monotonic() - t0

    manifest = PartitionManifest(out_root)
    completed = manifest.completed_keys()
    expected = {
        str(k)
        for k in range(
            (corpus_size + resumable.PARTITION_SIZE - 1)
            // resumable.PARTITION_SIZE
        )
    }
    missing = sorted(expected - completed)
    n_new = len(result["written"])
    metrics = {
        "corpus_size": corpus_size,
        "partitions_expected": len(expected),
        "partitions_written_this_run": n_new,
        "partitions_skipped_resume": len(result["skipped"]),
        "partitions_missing": missing,
        "wall_s": round(wall_s, 3),
        "images_per_sec": round(
            n_new * resumable.PARTITION_SIZE / wall_s, 1
        )
        if wall_s > 0
        else None,
        "complete": not missing,
        "ts": time.time(),
    }
    metrics_path = os.path.join(out_root, "_metrics.jsonl")
    with open(metrics_path, "a") as f:
        f.write(json.dumps(metrics) + "\n")
    metrics["written"] = result["written"]
    metrics["skipped"] = result["skipped"]
    return metrics


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--corpus-size", type=int, default=2000)
    p.add_argument("--out", required=True)
    p.add_argument("--dst-crs", default="EPSG:3857")
    p.add_argument("--tile-size", type=int, default=64)
    p.add_argument(
        "--concurrency",
        type=int,
        default=0,
        help="fused actor-pool size; 0 = 3/4 of cluster CPUs",
    )
    p.add_argument("--n-geoms", type=int, default=64)
    args = p.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        # under `ray job submit` RAY_ADDRESS points at the cluster; the
        # default env here pins local mode, so both paths are one call
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "auto"),
            num_cpus=(
                int(os.environ["RAY_GRAFT_CPUS"])
                if "RAY_GRAFT_CPUS" in os.environ
                else None
            ),
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = args.concurrency or max(2, (ncpu * 3) // 4)
        metrics = run_job(
            args.corpus_size,
            args.out,
            dst_crs=args.dst_crs,
            tile_size=args.tile_size,
            concurrency=concurrency,
            n_geoms=args.n_geoms,
        )
    finally:
        if owns_session:
            ray.shutdown()
    print(json.dumps(metrics))
    return 0 if metrics["complete"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
