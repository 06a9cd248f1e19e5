#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: compare.py <sfDir> <verifyOutDir>
       compare.py --lint-only <sfDir> <oracleSqlJsonPath>

Reads oracle_sql.json from verifyOutDir, registers each parquet table in
DuckDB as a view, runs each oracle SQL, and compares against the Spark
result parquet (sorted rows, column order by name, float tolerance).

Every oracle result is also TYPE-LINTED: DuckDB silently widens
sum(BIGINT) to HUGEINT (int128), avg(DECIMAL) to DECIMAL, etc. — types
Spark never emits, so the driver's hash of the two representations differs
even when every value is numerically equal (this broke q_bm25/q_rolling in
round 6). Any oracle column whose type falls outside the Spark-expressible
set below fails the gate loudly, before row comparison.
"""
import json
import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Types Spark parquet output can carry; anything else (HUGEINT, DECIMAL,
# FLOAT, UHUGEINT, TIME, INTERVAL, ...) means the oracle SQL needs a CAST.
ALLOWED_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "VARCHAR",
    "DATE", "TIMESTAMP", "BOOLEAN",
}


def lint_types(con, name, sql):
    """Return [] if every output column type is Spark-expressible, else
    the offending (column, type) pairs."""
    rel = con.sql(sql)
    return [
        (c, str(t)) for c, t in zip(rel.columns, rel.types)
        if str(t) not in ALLOWED_TYPES
    ]


def register_tables(con, sf_dir):
    """Driver fixtures are single parquet FILES; derived fixtures (e.g.
    testdata_sf1) are Spark output DIRECTORIES — glob those."""
    import os

    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")


def lint_only(sf_dir, oracle_json_path):
    con = duckdb.connect()
    register_tables(con, sf_dir)
    with open(oracle_json_path) as f:
        oracles = json.load(f)
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            bad = lint_types(con, name, sql)
        except Exception as e:
            print(f"LINT-ERROR {name}: {e}")
            n_bad += 1
            continue
        if bad:
            print(f"LINT-FAIL {name}: non-Spark oracle types {bad}")
            n_bad += 1
    print(f"== lint: {len(oracles) - n_bad} clean, {n_bad} flagged ==")
    sys.exit(1 if n_bad else 0)


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
    if sys.argv[1] == "--lint-only":
        lint_only(sys.argv[2], sys.argv[3])
        return
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # Oracle environment pin (ROADMAP #6): the gate's semantics depend on
    # the DuckDB dialect; record the version in every run's output so a
    # future engine bump is auditable against scripts/oracle_env.md.
    print(f"oracle engine: duckdb {duckdb.__version__}")
    con = duckdb.connect()
    # Bound DuckDB so a heavy oracle at a big fixture spills to disk (or
    # fails as a recorded FAIL) instead of OOM-killing the machine.
    import os

    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '32GB')}'")
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    register_tables(con, sf_dir)
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # GRAFT_COMPARE_SKIP: comma-separated entries to exclude, for fixtures
    # where an entry's OUTPUT is intractable to dump (sf1's q_join_nullsafe
    # null-block is ~4.6e9 rows) — checked separately by aggregate.
    import os

    skip = set(filter(None, os.environ.get("GRAFT_COMPARE_SKIP", "").split(",")))
    only = set(filter(None, os.environ.get("GRAFT_COMPARE_ONLY", "").split(",")))
    # GRAFT_COMPARE_AGG: entries whose Verify dump was produced with
    # SPARK_GRAFT_AGG=1 (row count + exact decimal sums of the integral
    # columns, as doubles). The oracle SQL is wrapped in the SAME
    # aggregates, with HUGEINT sums so DuckDB's arithmetic is exact too —
    # the aggregate-exact class of SF1_CORRECTNESS.md, now scripted.
    aggset = set(filter(None, os.environ.get("GRAFT_COMPARE_AGG", "").split(",")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if name in skip or (only and name not in only):
            print(f"SKIP {name}")
            continue
        if name in aggset:
            # derive the aggregate list from the Spark dump's own schema
            # (n plus sum_<col> for each integral column of the entry)
            try:
                dump_cols = [
                    d[0] for d in con.execute(
                        f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet') LIMIT 0"
                    ).description
                ]
                sums = ", ".join(
                    f'CAST(SUM(CAST("{c[4:]}" AS HUGEINT)) AS DOUBLE) AS "{c}"'
                    for c in dump_cols if c.startswith("sum_"))
                sql = (f"SELECT CAST(count(*) AS BIGINT) AS n"
                       f"{', ' + sums if sums else ''} FROM ({sql}) __agg_t")
            except Exception as e:
                print(f"FAIL {name}: agg dump unreadable {e}")
                n_fail += 1
                continue
        try:
            bad = lint_types(con, name, sql)
            if bad:
                print(f"FAIL {name}: oracle type lint {bad}")
                n_fail += 1
                continue
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
