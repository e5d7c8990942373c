#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
library itself is pure Scala). Runs each oracle SQL in DuckDB against the
same parquet tables, reads the Spark result parquet written by
graft.Verify, and compares cell-exact via EXCEPT ALL in both directions.

Usage: check.py [sfdir] [verify_outdir]
"""
import duckdb
import glob
import json
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            exp = con.sql(oracle[name])
            got = con.sql(f"SELECT * FROM '{files[0]}'")
            ecols, gcols = sorted(exp.columns), sorted(got.columns)
            if ecols != gcols:
                print(f"FAIL {name}: columns {gcols} != oracle {ecols}")
                n_fail += 1
                continue
            collist = ", ".join(f'"{c}"' for c in ecols)
            con.sql(f"CREATE OR REPLACE VIEW _exp AS SELECT {collist} FROM exp")
            con.sql(f"CREATE OR REPLACE VIEW _got AS SELECT {collist} FROM got")
            extra = con.sql("SELECT * FROM _got EXCEPT ALL SELECT * FROM _exp").fetchmany(3)
            missing = con.sql("SELECT * FROM _exp EXCEPT ALL SELECT * FROM _got").fetchmany(3)
            ne = con.sql("SELECT count(*) FROM _exp").fetchone()[0]
            ng = con.sql("SELECT count(*) FROM _got").fetchone()[0]
            if extra or missing or ne != ng:
                print(f"FAIL {name}: rows got={ng} exp={ne}")
                if extra:
                    print(f"  spark-only: {extra}")
                if missing:
                    print(f"  oracle-only: {missing}")
                n_fail += 1
            else:
                print(f"PASS {name} ({ng} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
