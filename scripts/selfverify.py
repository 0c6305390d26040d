#!/usr/bin/env python3
"""Self-run of the driver's correctness gate: compare each Verify parquet
dump against its DuckDB oracle (columns sorted by name, rows sorted,
values compared with float rounding already applied in both engines)."""
import json, sys, glob, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
con.sql("SET threads=16")
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = t.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# Verify emits each entry under BOTH `name` and `name.parquet` keys (the
# driver keys its report by dump file name); normalize to bare names here.
oracle = {k[:-8] if k.endswith(".parquet") else k: v for k, v in oracle.items()}
fail = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fail += 1
        continue
    try:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}.parquet/*.parquet'").df()
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}")
        fail += 1
        continue
    want = want[sorted(want.columns)]
    got = got[sorted(got.columns)]
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(want.columns)}")
        fail += 1
        continue
    ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    if len(ws) != len(gs):
        print(f"FAIL {name}: rows {len(gs)} vs oracle {len(ws)}")
        fail += 1
        continue
    diffs = []
    for c in ws.columns:
        for i in range(len(ws)):
            a, b = ws[c].iloc[i], gs[c].iloc[i]
            if isinstance(a, float) and isinstance(b, float):
                if (math.isnan(a) and math.isnan(b)) or a == b:
                    continue
                diffs.append((c, i, a, b))
            elif str(a) != str(b):
                diffs.append((c, i, a, b))
    if diffs:
        print(f"FAIL {name}: {len(diffs)} value diffs, first: {diffs[:3]}")
        fail += 1
    else:
        print(f"OK   {name}: {len(ws)} rows")

spark_only = [p.split('/')[-1].replace('.parquet','') for p in glob.glob(f"{out_dir}/*.parquet")
              if p.split('/')[-1].replace('.parquet','') not in oracle]
for name in sorted(spark_only):
    n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}.parquet/*.parquet'").fetchone()[0]
    print(f"{'OK  ' if n > 0 else 'WARN'} {name}: rows-only, {n} rows")
    if n == 0:
        fail += 1
print(f"\n{'ALL GREEN' if fail == 0 else f'{fail} FAILURES'}")
sys.exit(1 if fail else 0)
