"""Mini-driver: run every queries() entry and compare against its
oracle_sql() over DuckDB views at sf0.001/0.01 — the local mirror of the
driver's CORRECTNESS gate (row count + schema + order-insensitive values).
"""

import glob

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        df = result.to_pandas()
    elif isinstance(result, pa.Table):
        df = result.to_pandas()
    else:
        df = result
    return df


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)
    return df


ORACLE_CHECKED = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(con, name):
    q = entry_mod.queries()[name]
    got = canon(to_df(q(SF_DIR)))
    exp = canon(con.execute(entry_mod.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs oracle {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLE_CHECKED))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name):
    q = entry_mod.queries()[name]
    df = to_df(q(SF_DIR))
    assert len(df) >= 0
    assert len(df.columns) > 0


def test_entry_smoke():
    ds = entry_mod.entry()
    df = to_df(ds)
    assert len(df) > 0
    assert {"repo", "path", "content_sha256"} <= set(df.columns)
