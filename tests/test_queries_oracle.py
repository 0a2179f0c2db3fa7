"""Mirror of the driver's correctness gate: run every ``queries()`` entry
and compare row-count + schema + order-insensitive values against its
``oracle_sql()`` DuckDB mirror at sf0.001."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _oracle_con(sf_dir=SF_DIR):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _to_pandas(res):
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    # queries whose oracle embeds generation-time literals derived from
    # the driver-gate directory must be compared against that directory
    sf = (
        entrymod.ORACLE_SF_DIR
        if name in entrymod.ORACLE_SF_BOUND
        else SF_DIR
    )
    got = _normalize(_to_pandas(q(sf)))
    exp = _normalize(_oracle_con(sf).execute(sql).fetchdf())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    for c in got.columns:
        gv, ev = got[c].tolist(), exp[c].tolist()
        if got[c].dtype.kind == "f":
            assert all(
                (math.isnan(a) and math.isnan(b)) or abs(a - b) < 1e-9
                for a, b in zip(gv, ev)
            ), f"{name}.{c} float mismatch"
        else:
            assert gv == ev, (
                f"{name}.{c} mismatch; first diff: "
                + str(next(((a, b) for a, b in zip(gv, ev) if a != b), None))
            )


def test_all_queries_run_rows_only():
    """Queries without an oracle still must run and return a well-formed
    result."""
    qs = entrymod.queries()
    no_oracle = set(qs) - set(entrymod.oracle_sql())
    for name in sorted(no_oracle):
        res = _to_pandas(qs[name](SF_DIR))
        assert res is not None, name
        assert len(res) == 0 or len(res.columns) > 0, name


def test_entry_smoke():
    ds = entrymod.entry()
    df = _to_pandas(ds)
    assert len(df) == 500
    assert set(df.columns) == {
        "doc_id", "filename", "format", "spans", "markdown", "media", "error",
    }
