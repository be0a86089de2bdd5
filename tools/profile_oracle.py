#!/usr/bin/env python3
"""Per-query DuckDB cost profile of the oracle SQL — the tool that keeps
the correctness sweep inside the driver's window. Runs each oracle SQL
twice (values + arrow), the same double execution check_oracle.py and the
driver's gate perform, and streams per-query wall time.

Usage: profile_oracle.py <sfDir> <oracle_sql.json>
(dump the json with: tools/run.sh graft.Verify <sfDir> <out> __dump_sql_only__)
"""
import json, time, os, sys
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v001/oracle_sql.json"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
oracle = json.load(open(oracle_path))
total = 0
times = {}
for name, sql in sorted(oracle.items()):
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"ERR {name}: {e}", flush=True)
        continue
    dt = time.time() - t0
    times[name] = dt
    total += dt
    print(f"{dt:8.2f}s  cum={total:7.1f}s  {name}", flush=True)
print(f"TOTAL {total:.1f}s over {len(times)} queries", flush=True)
print("slowest:", flush=True)
for n, d in sorted(times.items(), key=lambda x: -x[1])[:10]:
    print(f"  {d:7.2f}s  {n}", flush=True)
