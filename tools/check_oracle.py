#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate: run each oracle
SQL in DuckDB over the sf tables and compare against the Spark parquet dumps
produced by graft.Verify. Not part of the engine (driver-side python only).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [only1,only2,...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str, only: set | None = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            expect = con.execute(sql).df()
            got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        e, g = norm(expect), norm(got)
        if list(e.columns) != list(g.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
            failures += 1
        elif len(e) != len(g):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            failures += 1
        else:
            try:
                pd.testing.assert_frame_equal(e, g, check_dtype=False,
                                              check_exact=True)
                print(f"ok   {name} ({len(e)} rows)")
            except AssertionError as ex:
                print(f"FAIL {name}: {str(ex)[:500]}")
                failures += 1
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracle)} oracles)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None))
