#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the oracle SQL in
DuckDB over views on <sfDir>/*.parquet, read the Spark result parquet,
sort columns by name, sort rows, compare values exactly.
Not part of the shipped library — mirrors the harness for fast iteration.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def normalize(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cells_equal(a, b):
    # both-missing first: None/NaN/NaT in any combination (NaT is an instance
    # of datetime but NaT == NaT is False — the date branch below would
    # spuriously fail nullable date columns without this)
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if a is None and b is None:
        return True
    # Timestamp vs datetime.date of the same instant: oracle DATE columns
    # fetch as datetime64 while Spark parquet DATE reads as object-of-date;
    # the driver hash-matched these in r1, so treat them equal here too.
    import datetime
    if isinstance(a, (datetime.date, datetime.datetime)) and \
       isinstance(b, (datetime.date, datetime.datetime)):
        return pd.Timestamp(a) == pd.Timestamp(b)
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return False
            if math.isnan(a) and math.isnan(b):
                return True
            return float(a) == float(b)
    except (TypeError, ValueError):
        pass
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            want = normalize(con.execute(oracle[name]).fetchdf())
            # Read the Spark side with pandas/pyarrow, NOT through DuckDB:
            # the driver hashes the pandas frames, so type divergences the
            # DuckDB round-trip would mask (e.g. oracle HUGEINT -> float vs
            # Spark BIGINT -> int64) must fail here too.
            got = normalize(pd.concat(
                [pd.read_parquet(f) for f in sorted(files)], ignore_index=True))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(want.columns) != list(got.columns):
            print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        # Numeric-kind divergence is the class that hash-fails in the driver
        # (e.g. HUGEINT -> float/object vs BIGINT -> int64). Date columns
        # legitimately differ in dtype (datetime64 vs object-of-date) yet
        # hash-match there, so only numeric kinds are checked.
        NUM = frozenset("iuf")
        kind_bad = [
            (c, want[c].dtype, got[c].dtype) for c in want.columns
            if want[c].dtype.kind != got[c].dtype.kind
            and (want[c].dtype.kind in NUM or got[c].dtype.kind in NUM)]
        if kind_bad:
            c, wd, gd = kind_bad[0]
            print(f"FAIL {name}: dtype kind col={c} oracle={wd} spark={gd} "
                  f"(driver hashes typed values — cast the oracle to match)")
            n_fail += 1
            continue
        if len(want) != len(got):
            print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
            n_fail += 1
            continue
        bad = None
        for c in want.columns:
            wv, gv = want[c].tolist(), got[c].tolist()
            for i, (a, b) in enumerate(zip(wv, gv)):
                if not cells_equal(a, b):
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} want={a!r} got={b!r}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(want)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
