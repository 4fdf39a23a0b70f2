#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, load the Spark parquet output, and compare
schema + rows (columns sorted by name, rows compared as sorted tuples).
Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        want = con.sql(sql)
        want_cols = sorted(want.columns)
        want_rows = con.sql(f"SELECT {', '.join(want_cols)} FROM want ORDER BY ALL").fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    got_rel = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
    got_cols = sorted(got_rel.columns)
    if got_cols != want_cols:
        print(f"FAIL {name}: columns {got_cols} != {want_cols}"); fails += 1; continue
    got_rows = con.sql(f"SELECT {', '.join(got_cols)} FROM got_rel ORDER BY ALL").fetchall()
    if len(got_rows) != len(want_rows):
        print(f"FAIL {name}: rows {len(got_rows)} != {len(want_rows)}"); fails += 1; continue
    bad = None
    for i, (g, w) in enumerate(zip(got_rows, want_rows)):
        for a, b in zip(g, w):
            eq = (a == b) or (isinstance(a, float) and isinstance(b, float)
                              and (a == b or (math.isnan(a) and math.isnan(b))))
            if not eq:
                bad = (i, g, w); break
        if bad: break
    if bad:
        print(f"FAIL {name}: first diff at row {bad[0]}:\n  got  {bad[1]}\n  want {bad[2]}")
        fails += 1
    else:
        # bitwise check on floats too
        exact = all(
            (a == b and (not isinstance(a, float) or a.hex() == b.hex()))
            or (isinstance(a, float) and math.isnan(a) and math.isnan(b))
            for g, w in zip(got_rows, want_rows) for a, b in zip(g, w))
        tag = "exact" if exact else "EQUAL-BUT-NOT-BITWISE"
        print(f"OK   {name}: {len(got_rows)} rows ({tag})")
print(f"{fails} failures / {len(oracle)} oracles")
sys.exit(1 if fails else 0)
