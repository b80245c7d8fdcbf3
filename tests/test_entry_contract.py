"""Simulates the driver's correctness gate: run every queries() entry at
sf0.01 and compare against oracle_sql() via DuckDB (row count + schema +
order-insensitive values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result):
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def run_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    df = con.sql(sql).df()
    con.close()
    return df


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-style canonicalization: columns sorted by name, rows sorted
    by all columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


ORACLED = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(ray_session, name):
    got = canon(to_pandas(entrymod.queries()[name](SF_DIR)))
    expect = canon(run_oracle(entrymod.oracle_sql()[name]))
    assert len(got) == len(expect), f"{name}: row count {len(got)} != {len(expect)}"
    assert list(got.columns) == list(expect.columns), f"{name}: columns differ"
    for c in got.columns:
        g, e = got[c].to_numpy(), expect[c].to_numpy()
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            np.testing.assert_allclose(
                g.astype(float), e.astype(float), rtol=1e-9, equal_nan=True,
                err_msg=f"{name}.{c}",
            )
        else:
            np.testing.assert_array_equal(g, e, err_msg=f"{name}.{c}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    out = to_pandas(entrymod.queries()[name](SF_DIR))
    assert out is not None
    assert len(out) >= 0  # runs, returns a frame with a stable schema
    assert len(out.columns) > 0 or len(out) == 0


def test_entry_runs(ray_session):
    ds = entrymod.entry()
    df = to_pandas(ds)
    assert len(df) == 1000  # all sf0.001 events survive the chain
    assert {"value_woe", "value_bin", "purchase_value", "session_seq"} <= set(df.columns)
