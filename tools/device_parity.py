#!/usr/bin/env python3
"""Dev-only adversarial device-parity checker (companion to
graft.DeviceParity; see its scaladoc).

Usage: python3 tools/device_parity.py <parityDir>

For each device in <parityDir>/device_sql.json: create a DuckDB view `t`
over in_<name>/*.parquet, run the twin SQL, read the Spark result from
dev_<name>/*.parquet, and demand bitwise equality with the same
normalize/compare discipline as check_oracle.py. Not part of the shipped
library.
"""
import sys, json, glob
import duckdb
import pandas as pd

from check_oracle import normalize, frames_equal


def main():
    out_dir = sys.argv[1]
    twins = json.load(open(f"{out_dir}/device_sql.json"))
    failures = 0
    for name, sql in sorted(twins.items()):
        con = duckdb.connect()
        in_files = sorted(glob.glob(f"{out_dir}/in_{name}/*.parquet"))
        dev_files = sorted(glob.glob(f"{out_dir}/dev_{name}/*.parquet"))
        if not in_files or not dev_files:
            print(f"FAIL {name}: missing parquet (in={len(in_files)} dev={len(dev_files)})")
            failures += 1
            continue
        quoted = ", ".join("'" + f.replace("'", "''") + "'" for f in in_files)
        con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet([{quoted}])")
        try:
            want = normalize(con.execute(sql).fetchdf())
        except Exception as e:  # a twin that errors is a divergence finding
            print(f"FAIL {name}: twin SQL raised {e}")
            failures += 1
            continue
        got = normalize(pd.concat(
            [pd.read_parquet(f) for f in dev_files], ignore_index=True))
        # the SAME compare (incl. the numeric dtype-kind check) as the
        # oracle gate — a twin drifting to HUGEINT->float vs int64 must
        # fail here exactly as it would in the driver's typed hash
        bad = frames_equal(want, got)
        if bad:
            print(f"FAIL {name}: {bad}")
            failures += 1
        else:
            print(f"ok   {name} ({len(want)} rows)")
    print(f"== {len(twins) - failures} pass, {failures} fail ==")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
