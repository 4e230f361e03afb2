"""CI lock on the riskiest SQL-oracle float-parity contracts.

The driver gate compares every ``queries()`` entry against its
``oracle_sql()`` twin at sf0.01; these tests pin the four round-3 pixel
oracles (full 4-codec decode, area downsample, mosaic, polygon clip) at
sf0.001 so a parity break is caught by pytest before the gate runs.
The contracts mirror numpy float expressions term-by-term in DuckDB
(see sources/corpus.py docstring) — ANY change to the corpus spec, the
codec chain, the area kernel's box rule, or the merge plan must keep
these green or regenerate both sides together.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
REPO = Path(__file__).resolve().parent.parent


def _entry():
    sys.path.insert(0, str(REPO))
    import __ray_entry__ as e

    return e


def _oracle_df(sql: str) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(sql).fetchdf()


@pytest.mark.parametrize(
    "query",
    [
        "geo_pixel_checksum",
        "geo_downsample_avg",
        "geo_merge",
        "geo_clip_geometry",
        "geo_histogram",
        "geo_band_math",
        "geo_overviews",
    ],
)
def test_exact_oracle_parity(ray_session, query):
    e = _entry()
    res = e.queries()[query](SF)
    df = res.to_pandas()
    odf = _oracle_df(e.oracle_sql()[query])
    cols = sorted(df.columns)
    assert cols == sorted(odf.columns)
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
