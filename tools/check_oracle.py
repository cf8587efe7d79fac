#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Reads graft.Verify output (<out>/<name>/ parquet + <out>/oracle_sql.json),
runs each oracle in DuckDB over the same sf directory, and compares:
schema (sorted column names), row count, and cell-exact values after
sorting columns by name and rows by all columns. Reports per-query PASS /
FAIL with the first differing cells, so oracle drift is caught before the
driver runs.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOut>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    try:
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return a == b or str(a) == str(b)
    return str(a) == str(b)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failed = []
    for name in sorted(oracles):
        try:
            spark_df = canon(pd.read_parquet(f"{out_dir}/{name}"))
            duck_df = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            failed.append(name)
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            failed.append(name)
            continue
        bad = []
        for c in spark_df.columns:
            for i, (a, b) in enumerate(zip(spark_df[c], duck_df[c])):
                if not cells_equal(a, b):
                    bad.append((c, i, a, b))
                    if len(bad) >= 3:
                        break
            if len(bad) >= 3:
                break
        if bad:
            print(f"FAIL {name}: first diffs {bad}")
            failed.append(name)
        else:
            print(f"PASS {name} ({len(spark_df)} rows x {len(spark_df.columns)} cols)")
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
