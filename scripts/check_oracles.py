"""Local replica of the driver's correctness gate: run every queries() entry
and compare against oracle_sql() via DuckDB (row count + column names +
order-insensitive value comparison). Usage:

    python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import logging
import sys

import duckdb
import numpy as np
import pandas as pd


def to_pandas(result):
    import pyarrow as pa

    try:
        import ray.data as rd

        if isinstance(result, rd.Dataset):
            result = result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name, ray_df, sql_df) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows {len(ray_df)} vs {len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
                ok = np.array_equal(
                    a[c].to_numpy(), b[c].to_numpy(), equal_nan=True
                )
                if not ok:
                    close = np.allclose(a[c], b[c], rtol=1e-12, atol=1e-12, equal_nan=True)
                    problems.append(
                        f"col {c} float mismatch (allclose={close}); "
                        f"first diff: {_first_diff(a[c], b[c])}"
                    )
            else:
                if not a[c].equals(b[c]):
                    try:
                        if np.array_equal(a[c].to_numpy(), b[c].to_numpy()):
                            continue
                    except Exception:
                        pass
                    problems.append(f"col {c} mismatch; first diff: {_first_diff(a[c], b[c])}")
    return problems


def _first_diff(a: pd.Series, b: pd.Series):
    av, bv = a.to_numpy(), b.to_numpy()
    for i in range(len(av)):
        if av[i] != bv[i] and not (av[i] != av[i] and bv[i] != bv[i]):
            return i, av[i], bv[i]
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            import traceback

            traceback.print_exc()
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(ray_df)} rows  [{dt:.1f}s]")
            if len(ray_df) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            failures += 1
            print(f"FAIL {name} ({len(ray_df)} vs {len(sql_df)} rows) [{dt:.1f}s]")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name}: {len(ray_df)} rows  [{dt:.1f}s]")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
