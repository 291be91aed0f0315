#!/usr/bin/env python3
"""Same-window DuckDB baseline over the CURRENT oracle set.

Usage: bench_duckdb.py <sfDir> <oracle_sql.json> [threads] [sparkFailedCsv|-]

Replays every oracle statement (the exact SQL the correctness gate runs)
over views on the sf parquet, median of 3 per statement, and prints one
JSON line {"total": secs, "n": count, "queries": {...}} — the DuckDB side
of the BASELINE.md same-window comparison (playbook discipline: measure
both engines in the same window before believing any ratio).

Honesty rules (r14 bench review):
- per-statement failures record -1 and are EXCLUDED from "total" (never
  abort the whole pairing — the Spark side prices its failures the same
  way);
- Spark-side failed query names (arg 4) are still replayed for the
  per-query split but excluded from "total", so the headline ratio
  always compares the SAME query set on both engines;
- timing is perf_counter (monotonic, like Spark's nanoTime) around an
  Arrow materialization (columnar, no per-row Python boxing — fetchall
  charged DuckDB for object conversion the Spark drain never pays).
"""
import json
import statistics
import sys
import time

import duckdb

from graft_tables import create_views


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark_failed = set()
    if len(sys.argv) > 4 and sys.argv[4] != "-":
        spark_failed = set(sys.argv[4].split(","))
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    create_views(con, sf_dir)
    oracles = json.load(open(oracle_path))
    results = {}
    failed = []
    for name in sorted(oracles):
        sql = oracles[name]
        samples = []
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).arrow()
                samples.append(time.perf_counter() - t0)
            results[name] = round(statistics.median(samples), 4)
        except Exception as e:
            print(f"[bench-duckdb] {name} failed: {e}", file=sys.stderr)
            results[name] = -1
            failed.append(name)
    counted = {k: v for k, v in results.items()
               if v >= 0 and k not in spark_failed}
    total = round(sum(counted.values()), 3)
    print(json.dumps({
        "total": total, "n": len(counted), "threads": threads,
        "failed": sorted(failed),
        "spark_failed_excluded": sorted(spark_failed & set(results)),
        "sf": sf_dir, "queries": results}))


if __name__ == "__main__":
    main()
