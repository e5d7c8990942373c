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
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def string_diff(con, ecols):
    """Driver-style string comparison: the driver hashes each cell's
    string form, so -0.0 vs 0.0 (equal under SQL `=`, hence invisible to
    EXCEPT ALL) still breaks its hash. Sort both frames by their VARCHAR
    tuple and report the first differing cell, or None if identical."""
    collist = ", ".join(f'CAST("{c}" AS VARCHAR)' for c in ecols)
    q = f"SELECT {collist} FROM {{v}} ORDER BY ALL"
    erows = con.sql(q.format(v="_exp")).fetchall()
    grows = con.sql(q.format(v="_got")).fetchall()
    for i, (er, gr) in enumerate(zip(erows, grows)):
        for c, ev, gv in zip(ecols, er, gr):
            if ev != gv:
                return {"row": i, "col": c, "spark": gv, "oracle": ev}
    return None


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    errors = {}
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
                errors[name] = {"rows_got": ng, "rows_exp": ne,
                                "spark_only": [list(map(str, r)) for r in extra],
                                "oracle_only": [list(map(str, r)) for r in missing]}
                n_fail += 1
            else:
                # Values match under SQL `=`; now match the driver's
                # stricter string hash (catches -0.0 vs 0.0 etc.).
                cell = string_diff(con, ecols)
                if cell is not None:
                    print(f"FAIL {name}: string-hash diff at row "
                          f"{cell['row']} col {cell['col']}: "
                          f"spark={cell['spark']!r} oracle={cell['oracle']!r}")
                    errors[name] = {"string_diff": cell}
                    n_fail += 1
                else:
                    print(f"PASS {name} ({ng} rows)")
                    n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            errors[name] = {"exception": f"{type(e).__name__}: {e}"}
            n_fail += 1
    with open(os.path.join(out, "errors.json"), "w") as f:
        json.dump(errors, f, indent=2)
    print(f"== {n_pass} pass, {n_fail} fail"
          + (f" (details: {out}/errors.json)" if errors else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
