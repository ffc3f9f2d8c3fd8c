#!/usr/bin/env python3
"""Measure missing oracle queries with duckdb_bench.py's exact
methodology (32 threads, warm-up + median of 3) and merge them into an
existing DUCKDB_BASELINE.json."""
import json, statistics, sys, time
import duckdb

sf_dir, oracle_path, base_path = sys.argv[1], sys.argv[2], sys.argv[3]
oracles = json.load(open(oracle_path))
base = json.load(open(base_path))
missing = [n for n in sorted(oracles) if not n.startswith("_") and n not in base["queries"]]
print("missing:", missing)
con = duckdb.connect()
con.sql("SET threads TO 32")
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
for name in missing:
    sql = oracles[name]
    con.sql(sql).fetchall()
    times = []
    for _ in range(3):
        t0 = time.perf_counter(); con.sql(sql).fetchall()
        times.append(time.perf_counter() - t0)
    base["queries"][name] = statistics.median(times)
    print(name, round(base["queries"][name], 3))
base["value"] = sum(v for v in base["queries"].values() if v >= 0)
json.dump(base, open(base_path, "w"), indent=1)
print("new total:", round(base["value"], 3), "n:", len(base["queries"]))
