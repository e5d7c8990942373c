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


LINT_TYPES = ("HUGEINT", "DECIMAL")  # UHUGEINT matches via substring


def type_lint(exp):
    """Reject oracle result schemas the driver stringifies differently
    from Spark's types: DuckDB sum(BIGINT) returns HUGEINT, which
    pandas renders '207618048.0' vs Spark BIGINT's '207618048' (r6's 7
    red rows). Every sum-derived integer must be CAST(... AS BIGINT)."""
    return [(c, str(t)) for c, t in zip(exp.columns, exp.types)
            if any(k in str(t).upper() for k in LINT_TYPES)]


def string_diff(con, ecols):
    """Driver-style string comparison: the driver stringifies cells in
    PYTHON (pandas), where HUGEINT becomes float64 ('….0') and -0.0
    keeps its sign — both invisible to comparisons done inside DuckDB,
    where HUGEINT casts to VARCHAR without the '.0' (the r5/r6 gate
    blind spots). Fetch both frames as pandas and compare str()."""
    collist = ", ".join(f'"{c}"' for c in ecols)
    q = f"SELECT {collist} FROM {{v}} ORDER BY ALL"
    edf = con.sql(q.format(v="_exp")).df()
    gdf = con.sql(q.format(v="_got")).df()
    for i in range(min(len(edf), len(gdf))):
        for c in ecols:
            ev, gv = str(edf[c].iloc[i]), str(gdf[c].iloc[i])
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
            bad = type_lint(exp)
            if bad:
                print(f"FAIL {name}: oracle type lint {bad} — cast "
                      f"sum()-derived integers to BIGINT, decimals to DOUBLE")
                errors[name] = {"type_lint": [list(b) for b in bad]}
                n_fail += 1
                continue
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
