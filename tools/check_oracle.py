#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's correctness gate: run each oracle
SQL in DuckDB over the sf tables and compare against the Spark parquet dumps
produced by graft.Verify. Not part of the engine (driver-side python only).

TYPE-STRICT (round 15): the driver's hash is type-sensitive — DuckDB
HUGEINT collapses to pandas float64 (renders `x.0` vs Spark BIGINT `x`)
and a DECIMAL dump column reads back as Decimal objects via pyarrow
(`123.450000` vs the oracle's float64 `123.45`). Three rounds of verdicts
(r12–r14) chased environment theories because this file compared with
check_dtype=False and read dumps through duckdb (which hides both
channels). The gate below therefore asserts, per query, BEFORE the value
compare:
  1. no oracle result column is HUGEINT            → would hash-red
  2. no dump parquet column is DECIMAL             → would hash-red
  3. oracle/dump dtype-FAMILY equality per column  (int vs float vs
     bool vs text vs time vs binary; list/struct recurse on element)
Tolerated (driver-green precedents, reported as `warn` so they can be
normalized opportunistically): int-width mismatch (BIGINT vs INTEGER),
DECIMAL-typed oracle vs DOUBLE dump, DATE vs TIMESTAMP.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [only1,only2,...]
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def family(t: str) -> str:
    """Collapse a DuckDB type string to the class the driver's
    pandas-hash actually distinguishes."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return f"list<{family(t[:-2])}>"
    if t in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in INT_TYPES:
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t in ("VARCHAR", "UUID", "ENUM"):
        return "text"
    if t.startswith(("DATE", "TIMESTAMP", "TIME", "INTERVAL")):
        return "time"
    if t in ("BLOB", "BYTEA", "BINARY", "VARBINARY"):
        return "binary"
    return t  # STRUCT/MAP/...: exact-string equality required


def type_gate(name: str, oracle_types: dict, dump_types: dict) -> list[str]:
    """Returns hard failures; prints warns for tolerated classes."""
    errs = []
    for c in sorted(set(oracle_types) | set(dump_types)):
        ot, dt = oracle_types.get(c), dump_types.get(c)
        if ot is None or dt is None:
            continue  # column-set mismatch is reported by the value gate
        of, df_ = family(ot), family(dt)
        if of == "hugeint" or "hugeint" in of:
            errs.append(f"{c}: oracle returns {ot} — pandas renders "
                        f"float64 (`x.0`) vs Spark int; CAST(... AS BIGINT)")
            continue
        if df_ == "decimal" or "decimal" in df_:
            errs.append(f"{c}: dump parquet is {dt} — pyarrow reads "
                        f"Decimal objects; cast('double') at the edge")
            continue
        if of == "decimal":
            of = "float"  # driver-green precedent (q118/q121/q164) …
            print(f"warn {name}.{c}: oracle DECIMAL vs dump {dt} "
                  f"(tolerated; CAST the oracle to DOUBLE to normalize)")
        if of == df_:
            if of == "int" and ot.upper() != dt.upper():
                print(f"warn {name}.{c}: int-width {ot} vs {dt} "
                      f"(tolerated; align widths to normalize)")
            elif of == "time" and ot.upper().split("(")[0] != \
                    dt.upper().split("(")[0]:
                print(f"warn {name}.{c}: {ot} vs {dt} "
                      f"(tolerated; align to normalize)")
            continue
        errs.append(f"{c}: type-family {ot}({of}) oracle vs {dt}({df_}) dump")
    return errs


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
            rel = con.sql(sql)
            oracle_types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
            expect = rel.df()
            dump_glob = f"{out_dir}/{name}/*.parquet"
            desc = duckdb.sql(f"DESCRIBE SELECT * FROM '{dump_glob}'").df()
            dump_types = dict(zip(desc["column_name"], desc["column_type"]))
            got = duckdb.sql(f"SELECT * FROM '{dump_glob}'").df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        terrs = type_gate(name, oracle_types, dump_types)
        if terrs:
            for te in terrs:
                print(f"FAIL {name} [type]: {te}")
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
