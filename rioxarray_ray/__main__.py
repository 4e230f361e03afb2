"""CLI front door (the xarray-backend-entrypoint analogue, SURVEY.md §2.1):

    python -m rioxarray_ray synth --n 1024 --out /tmp/corpus
    python -m rioxarray_ray flagship --n 1024 --out /tmp/warped [--resume]
    python -m rioxarray_ray info /tmp/warped

Owns its Ray session (guarded init per the driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    import logging

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    return ray


def main(argv=None):
    p = argparse.ArgumentParser(prog="rioxarray_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("synth", help="materialize the synthetic corpus")
    ps.add_argument("--n", type=int, default=1024)
    ps.add_argument("--out", default=None)

    pf = sub.add_parser("flagship", help="decode->tile->join->warp, write parquet")
    pf.add_argument("--n", type=int, default=1024)
    pf.add_argument("--out", required=True)
    pf.add_argument("--dst-crs", default="EPSG:3857")
    pf.add_argument("--resume", action="store_true",
                    help="resumable per-partition writes with manifests")

    pi = sub.add_parser("info", help="row count + schema of a parquet dir")
    pi.add_argument("path")

    args = p.parse_args(argv)

    if args.cmd == "synth":
        from .pipelines.flagship import corpus_parquet

        ray = _ray()
        path = corpus_parquet(args.n)
        if args.out is not None:
            import shutil

            shutil.copytree(path, args.out, dirs_exist_ok=True)
            path = args.out
        print(json.dumps({"corpus": path, "n_images": args.n}))
        ray.shutdown()
    elif args.cmd == "flagship":
        ray = _ray()
        if args.resume:
            from .pipelines import resumable
            from .pipelines.flagship import read_corpus

            out = resumable.run_resumable(
                read_corpus(args.n), args.out, dst_crs=args.dst_crs
            )
            print(json.dumps(out))
        else:
            from .pipelines import flagship as fpipe

            warped, join_rows = fpipe.flagship(
                n_images=args.n, dst_crs=args.dst_crs
            )
            warped.write_parquet(args.out)
            print(json.dumps({"out": args.out, "join_rows": join_rows.count()}))
        ray.shutdown()
    elif args.cmd == "info":
        ray = _ray()
        import ray.data as rd

        ds = rd.read_parquet(args.path)
        print(
            json.dumps(
                {"rows": ds.count(), "columns": ds.schema().names}
            )
        )
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
