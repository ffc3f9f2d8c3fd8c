#!/usr/bin/env python3
"""Measure DuckDB 1.0 executing every oracle SQL over the same parquet
tables the Spark bench uses — the self-reported baseline row that
BASELINE.md asks for (median of 3 runs per query, 32 threads).

Usage: python3 tools/duckdb_bench.py <sfDir> <oracle_sql.json> [out.json]
(the oracle_sql.json comes from a graft.Verify run)
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else "DUCKDB_BASELINE.json"
    oracles = json.load(open(oracle_path))
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    results, errors = {}, {}
    for name in sorted(oracles):
        if name.startswith("_"):  # metadata keys (e.g. "_filtered"), not SQL
            continue
        sql = oracles[name]
        try:
            con.sql(sql).fetchall()  # warm-up
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.sql(sql).fetchall()
                times.append(time.perf_counter() - t0)
            results[name] = statistics.median(times)
        except Exception as exc:  # noqa: BLE001
            errors[name] = str(exc).split("\n")[0][:160]
            results[name] = -1.0
    total = sum(v for v in results.values() if v >= 0)
    out = {"metric": "duckdb_total", "value": total, "unit": "sec",
           "queries": results, "sf": sf_dir, "errors": errors,
           "note": "DuckDB 1.0.0, 32 threads, median of 3 warm runs per oracle query"}
    json.dump(out, open(out_path, "w"), indent=1)
    print(json.dumps({"total": round(total, 3), "n": len(results),
                      "n_err": len(errors)}))
    for k, v in sorted(results.items(), key=lambda x: -x[1])[:10]:
        print(f"{k:24s} {v:8.3f}")


if __name__ == "__main__":
    main()
