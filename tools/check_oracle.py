#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: run each oracle SQL
in DuckDB over the testdata parquet tables and compare (columns sorted
by name, rows sorted, exact values) with the parquet results Verify
wrote. Usage: check_oracle.py <sfDir> <outDir>
"""
import sys, json, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fails += 1
        continue
    try:
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}")
        fails += 1
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fails += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
        fails += 1
        continue
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    bad = None
    for c in exp.columns:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            eq = (a == b) or (a is None and b is None)
            if not eq and isinstance(a, float) and isinstance(b, float):
                eq = (math.isnan(a) and math.isnan(b)) or a == b
            if not eq:
                bad = (c, i, a, b)
                break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: col {c} row {i}: spark={b!r} oracle={a!r}")
        fails += 1
    else:
        print(f"PASS {name} ({len(exp)} rows)")

print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
