#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracleSql vs Verify output.

Replicates the driver's compare (sort columns by name, sort rows, hash
values) so oracle mismatches are caught before a round is graded.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: everything to string via repr with float rounding
    def cell(v):
        if isinstance(v, float):
            return f"{v:.10g}"
        if isinstance(v, bytes):
            return v.hex()
        return str(v)
    out = df.apply(lambda c: c.map(cell))
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as fh:
        oracles = json.load(fh)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            expected = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: missing spark output: {e}")
            failures += 1
            continue
        ce, cg = canon(expected), canon(got)
        if list(ce.columns) != list(cg.columns):
            print(f"FAIL {name}: columns {list(cg.columns)} != {list(ce.columns)}")
            failures += 1
            continue
        if len(ce) != len(cg):
            print(f"FAIL {name}: rows {len(cg)} != {len(ce)}")
            failures += 1
            continue
        if not ce.equals(cg):
            neq = (ce != cg).any(axis=1)
            print(f"FAIL {name}: {int(neq.sum())} differing rows; first:")
            idx = neq[neq].index[:3]
            for i in idx:
                print(f"  duckdb: {ce.loc[i].to_dict()}")
                print(f"  spark : {cg.loc[i].to_dict()}")
            failures += 1
            continue
        print(f"OK   {name}: {len(ce)} rows")
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
