#!/usr/bin/env python3
"""Driver-style correctness replay: compare graft.Verify parquet dumps
against the DuckDB oracle SQL over the same testdata tables.

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, normalize values, sort rows."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in idx], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
            gcols, grows = canon(got.fetchall(), [c for c in got.columns])
        except Exception as e:
            print(f"FAIL {name}: engine output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql)
            ecols, erows = canon(exp.fetchall(), [c for c in exp.columns])
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: schema {gcols} vs oracle {ecols}")
            n_fail += 1
        elif grows != erows:
            print(f"FAIL {name}: rows {len(grows)} vs {len(erows)}")
            only_g = [r for r in grows if r not in erows][:3]
            only_e = [r for r in erows if r not in grows][:3]
            print(f"  engine-only: {only_g}")
            print(f"  oracle-only: {only_e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
