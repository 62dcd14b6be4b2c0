#!/usr/bin/env python3
"""Time the DuckDB oracle queries on the same machine/data as the Spark
bench, so BENCH JSON ratios are evidenced rather than asserted.

Usage: python3 tools/bench_baseline.py [sfdir] [oracle_sql.json] [out.json]
Pinned-golden oracles (VALUES literals) are skipped — they measure
nothing. Prints one JSON line {"duckdb_total_sec", "queries", "sf"}.
"""
import sys, os, json, time
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/duckdb_baseline.json"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(oracle_path))
timings, total = {}, 0.0
for name in sorted(oracle):
    sql = oracle[name]
    if "VALUES" in sql and "AS t(" in sql:
        continue  # pinned golden, not a computation
    t0 = time.time()
    con.sql(sql).fetchall()
    dt = time.time() - t0
    timings[name] = round(dt, 3)
    total += dt

result = {"duckdb_total_sec": round(total, 3), "queries": timings, "sf": sfdir}
with open(out_path, "w") as f:
    json.dump(result, f)
print(json.dumps({"duckdb_total_sec": result["duckdb_total_sec"],
                  "n_queries": len(timings), "sf": sfdir}))
print("slowest:", sorted(timings.items(), key=lambda kv: -kv[1])[:8])
