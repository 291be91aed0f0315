#!/usr/bin/env python3
"""Same-window DuckDB baseline over the CURRENT oracle set.

Usage: bench_duckdb.py <sfDir> <oracle_sql.json> [threads]

Replays every oracle statement (the exact SQL the correctness gate runs)
over views on the sf parquet, median of 3 per statement, and prints one
JSON line {"total": secs, "n": count, "queries": {...}} — the DuckDB side
of the BASELINE.md same-window comparison (playbook discipline: measure
both engines in the same window before believing any ratio).
"""
import json
import statistics
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(oracle_path))
    results = {}
    for name in sorted(oracles):
        sql = oracles[name]
        samples = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            samples.append(time.time() - t0)
        results[name] = round(statistics.median(samples), 4)
    total = round(sum(results.values()), 3)
    print(json.dumps({"total": total, "n": len(results), "threads": threads,
                      "sf": sf_dir, "queries": results}))


if __name__ == "__main__":
    main()
