"""Mirror of the driver's correctness gate: run every ``queries()`` entry at
sf0.001 and compare against ``oracle_sql()`` via DuckDB (row count + schema +
order-insensitive value comparison, columns sorted by name)."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(ray_session, con, name):
    got_raw = to_pandas(QUERIES[name](SF_DIR))
    want_raw = con.execute(ORACLES[name]).fetchdf()
    # The driver's value-hash is dtype-sensitive (int64 vs float64 of the
    # same number hash differently): assert RAW dtype parity per column
    # before normalizing (round-1 lesson: 3 dtype-only hash failures).
    for c in sorted(set(got_raw.columns) & set(want_raw.columns)):
        gk, wk = got_raw[c].dtype.kind, want_raw[c].dtype.kind
        assert gk == wk, f"{name}.{c}: raw dtype {got_raw[c].dtype} vs {want_raw[c].dtype}"
    got = normalize(got_raw)
    want = normalize(want_raw)
    assert list(got.columns) == list(want.columns), (
        f"columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            # exact: the driver hash-compares values, so ULPs matter
            ok = (a == b) | (np.isnan(a) & np.isnan(b))
        else:
            ok = (a == b) | (pd.isna(a) & pd.isna(b))
        assert ok.all(), f"{name}.{c}: first mismatch at {np.argmin(ok)}: " \
                         f"{a[np.argmin(ok)]!r} vs {b[np.argmin(ok)]!r}"


ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    got = to_pandas(QUERIES[name](SF_DIR))
    assert got.shape[1] > 0 or len(got) == 0
    if name in ("cdc_replay_mini", "multimodal_decode", "multimodal_frames"):
        assert len(got) > 0


def test_entry_smoke(ray_session):
    res = entrymod.entry()
    df = to_pandas(res)
    assert len(df) > 0
    assert "url" in df.columns and "text" in df.columns


def test_every_query_is_oracled_and_bench_names_resolve():
    """Invariants the round gate depends on: every queries() entry has an
    oracle_sql() string (zero no-oracle rows — a new query without an
    oracle would otherwise silently skip the parametrized gate above),
    and every bench.py QUERY_NAMES entry resolves to a real query."""
    import importlib.util
    import os

    assert set(QUERIES) == set(ORACLES), (
        set(QUERIES) ^ set(ORACLES)
    )
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    # bench resolves names as demo attributes (it deliberately times a
    # few full-table scale variants that the correctness surface covers
    # with planted fixtures instead)
    from gobblin_ray.pipelines import demo

    missing = [n for n in bench.QUERY_NAMES if not hasattr(demo, n)]
    assert not missing, missing
