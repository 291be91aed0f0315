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

from graft_tables import create_views

def normalize(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cells_equal(a, b):
    # both-missing first: None/NaN/NaT in any combination (NaT is an instance
    # of datetime but NaT == NaT is False — the date branch below would
    # spuriously fail nullable date columns without this)
    try:
        na, nb = pd.isna(a), pd.isna(b)
        if isinstance(na, bool) and isinstance(nb, bool):
            if na and nb:
                return True
            if na != nb:
                return False
    except (TypeError, ValueError):
        pass
    # array-likes element-wise: a bare a == b on numpy arrays yields an
    # array whose truth value RAISES, killing the whole checker from inside
    # the comparison loop (r14 bench review) — recurse instead
    import numpy as np
    arrayish = (list, tuple, np.ndarray)
    if isinstance(a, arrayish) or isinstance(b, arrayish):
        if not (isinstance(a, arrayish) and isinstance(b, arrayish)):
            return False
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(
            cells_equal(x, y) for x, y in zip(la, lb))
    # Timestamp vs datetime.date of the same instant: oracle DATE columns
    # fetch as datetime64 while Spark parquet DATE reads as object-of-date;
    # the driver hash-matched these in r1, so treat them equal here too.
    # pd.Timestamp can raise OutOfBoundsDatetime on sentinel dates
    # (9999-12-31) — fall through to plain equality there.
    import datetime
    if isinstance(a, (datetime.date, datetime.datetime)) and \
       isinstance(b, (datetime.date, datetime.datetime)):
        try:
            return pd.Timestamp(a) == pd.Timestamp(b)
        except (ValueError, OverflowError, pd.errors.OutOfBoundsDatetime):
            pass
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return False
            if math.isnan(a) and math.isnan(b):
                return True
            return float(a) == float(b)
    except (TypeError, ValueError):
        pass
    return bool(a == b)

def frames_equal(want, got):
    """The ONE compare discipline (columns, numeric dtype-kind, rows,
    cells), shared with tools/device_parity.py so the parity gate can
    never be silently weaker than this compare (r15 diff review).
    Returns None on equality, a failure message otherwise. Inputs must
    already be normalize()d."""
    if list(want.columns) != list(got.columns):
        return f"columns want={list(want.columns)} got={list(got.columns)}"
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
        return (f"dtype kind col={c} oracle={wd} spark={gd} "
                f"(driver hashes typed values — cast the oracle to match)")
    if len(want) != len(got):
        return f"rows want={len(want)} got={len(got)}"
    for c in want.columns:
        wv, gv = want[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(wv, gv)):
            if not cells_equal(a, b):
                return f"col={c} row={i} want={a!r} got={b!r}"
    return None


def check_one(con, oracle_sql, out_dir, name):
    """Returns (None, nrows) on pass, (failure message, 0) on fail. May
    raise — the caller prices an exception as a FAIL for this query only."""
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return "no spark result parquet", 0
    want = normalize(con.execute(oracle_sql).fetchdf())
    # Read the Spark side with pandas/pyarrow, NOT through DuckDB:
    # the driver hashes the pandas frames, so type divergences the
    # DuckDB round-trip would mask (e.g. oracle HUGEINT -> float vs
    # Spark BIGINT -> int64) must fail here too.
    got = normalize(pd.concat(
        [pd.read_parquet(f) for f in sorted(files)], ignore_index=True))
    msg = frames_equal(want, got)
    if msg is not None:
        return msg, 0
    return None, len(want)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    create_views(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        # the WHOLE per-query check sits under the try: an exotic cell that
        # makes the compare itself raise must fail THIS query, not kill the
        # checker and leave the rest unchecked (r14 bench review)
        try:
            msg, nrows = check_one(con, oracle[name], out_dir, name)
        except Exception as e:
            msg, nrows = str(e), 0
        if msg is None:
            print(f"ok   {name} ({nrows} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
