#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: compare.py <sfDir> <verifyOutDir>

Reads oracle_sql.json from verifyOutDir, registers each parquet table in
DuckDB as a view, runs each oracle SQL, and compares against the Spark
result parquet (sorted rows, column order by name, float tolerance).
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            rr.append(repr(v))
        out.append(tuple(rr))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            o = con.execute(sql)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
            s = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in s.description]
            s_rows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(o_cols) != sorted(s_cols):
            print(f"FAIL {name}: cols oracle={sorted(o_cols)} spark={sorted(s_cols)}")
            n_fail += 1
            continue
        co, cs = canon(o_rows, o_cols), canon(s_rows, s_cols)
        if co == cs:
            print(f"PASS {name} ({len(cs)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows oracle={len(co)} spark={len(cs)}")
            for a, b in list(zip(co, cs))[:60]:
                if a != b:
                    print(f"   oracle: {a}\n   spark : {b}")
                    break
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
