#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
run DuckDB on each oracle_sql.json entry over the sf tables, load the
Spark parquet output, sort columns by name + rows by all values, compare.

Usage: check_oracle.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if v is None: return "NULL"
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out)

fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"MISS  {name}: no spark output"); fail += 1; continue
    try:
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}"); fail += 1; continue
    tbl = pq.read_table(spark_dir)
    # dtype parity: the driver compares schemas, not just values.
    # Normalize arrow list types: inner field NAME ('element' vs 'l') and
    # nullability are writer artifacts, not schema semantics.
    import re as _re
    def normtype(t):
        s = str(t).replace(" not null", "")
        return _re.sub(r"list<\w+: ", "list<", s)
    duck_arrow = con.execute(sql).fetch_arrow_table()
    dd = {f.name: normtype(f.type) for f in duck_arrow.schema}
    ss = {f.name: normtype(f.type) for f in tbl.schema}
    tdiffs = {k: (ss.get(k), dd.get(k)) for k in set(dd) | set(ss) if ss.get(k) != dd.get(k)}
    if tdiffs:
        print(f"TYPES {name}: {tdiffs}"); fail += 1; continue
    scols, srows = list(tbl.column_names), [tuple(r) for r in zip(*[c.to_pylist() for c in tbl.columns])] if tbl.num_rows else []
    if tbl.num_rows == 0: srows = []
    c1, r1 = canon(dcols, drows)
    c2, r2 = canon(scols, srows)
    if c1 != c2:
        print(f"COLS  {name}: duck={c1} spark={c2}"); fail += 1; continue
    if r1 != r2:
        n = min(len(r1), len(r2))
        diff = next((i for i in range(n) if r1[i] != r2[i]), n)
        print(f"ROWS  {name}: duck {len(r1)} rows vs spark {len(r2)}; first diff @{diff}:")
        print(f"   duck : {r1[diff] if diff < len(r1) else '<none>'}")
        print(f"   spark: {r2[diff] if diff < len(r2) else '<none>'}")
        fail += 1; continue
    print(f"OK    {name} ({len(r1)} rows)")
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
