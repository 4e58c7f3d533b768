"""Self-check harness replicating the driver's correctness gate:
run every queries()[name] on Spark and oracle_sql()[name] on DuckDB
over the same parquet tables; compare row count, schema width, and
order-insensitive values (columns sorted by name, rows sorted).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from advanced_data_profile_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # oracles that embed literals recomputed from the fixture
    # (pca_importance) must read the SAME sf as this check
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark(cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # The full surface: the driver's 50-query contract PLUS the
    # extended registry (value-oracled queries beyond the driver's
    # 50-row budget — still checked here and in pytest).
    qs = {**entry_mod.queries(), **entry_mod.extended_queries()}
    oracles = {**entry_mod.oracle_sql(), **entry_mod.extended_oracle_sql()}
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {e}")
            failures.append(name)
            continue
        s, o = normalize(sdf), normalize(odf)
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            failures.append(name)
            continue
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: cols {list(s.columns)} vs {list(o.columns)}")
            failures.append(name)
            continue
        # dtype-kind mismatch (e.g. DuckDB HUGEINT -> object/float vs Spark
        # bigint) is exactly what breaks the driver's exact value-hash even
        # when values agree numerically — flag it loudly.
        kind_mismatch = [
            c for c in s.columns if s[c].dtype.kind != o[c].dtype.kind
        ]
        try:
            pd.testing.assert_frame_equal(
                s, o, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
            )
            if kind_mismatch:
                print(
                    f"FAIL {name}: values OK but dtype-kind mismatch "
                    f"(driver hash would differ): "
                    + ", ".join(
                        f"{c}: spark {s[c].dtype} vs oracle {o[c].dtype}"
                        for c in kind_mismatch
                    )
                )
                failures.append(name)
            else:
                print(f"OK   {name}: {len(s)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{str(e)[:500]}")
            failures.append(name)
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
