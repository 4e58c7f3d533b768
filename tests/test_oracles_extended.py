"""The extended query registry: the value-oracled queries beyond the
driver's 50-row contract budget (__spark_entry__._EXTENDED_NAMES).
They must stay green even though the driver never sees them — this
test replays the driver's compare (row count, column set, values) for
every extended query against its DuckDB oracle at sf0.001.

Also pins the registry invariants that caused the r3 gap: the driver
contract is AT MOST 50 queries, every contract query has an oracle,
and the two registries are disjoint.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_registry_fits_driver_budget():
    qs = entry_mod.queries()
    assert len(qs) <= 50, (
        f"driver records only the first 50 registry entries; {len(qs)} "
        "registered — move the overflow to extended_queries()"
    )
    assert set(entry_mod.oracle_sql()) == set(qs)
    ext = entry_mod.extended_queries()
    assert set(entry_mod.extended_oracle_sql()) == set(ext)
    assert not set(ext) & set(qs)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", list(entry_mod.extended_queries()))
def test_extended_query_matches_oracle(spark, duck, name):
    fn = entry_mod.extended_queries()[name]
    sql = entry_mod.extended_oracle_sql()[name]
    s = _normalize(fn(spark, SF_DIR).toPandas())
    o = _normalize(duck.execute(sql).fetchdf())
    assert len(s) == len(o), f"{name}: rows {len(s)} vs {len(o)}"
    assert list(s.columns) == list(o.columns)
    pd.testing.assert_frame_equal(
        s, o, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
    )
