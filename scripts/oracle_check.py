#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Emulates the driver's comparator as closely as possible: the Spark result is
read with pandas.read_parquet (pyarrow types: parquet DECIMAL -> Decimal
objects, lists -> ndarray), the oracle SQL runs in DuckDB and is fetched with
.df() (DECIMAL -> float64), columns are sorted by name, rows are sorted by all
columns (pandas lexsort), and the canonical cell renderings are hashed.
A Decimal-vs-float64 or ndarray cell therefore fails HERE exactly like it
fails in the driver — which is why every query renders decimals/arrays as
strings (see graft.core.Tables.cstr/farrS).

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, os, hashlib, math
import duckdb
import pandas as pd
import numpy as np
import decimal, datetime


def canon(v):
    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return "NULL"
        return repr(float(v))
    if isinstance(v, decimal.Decimal):
        return f"DEC:{v}"
    if isinstance(v, (np.integer,)):
        return f"int:{int(v)}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, (np.bool_, bool)):
        return f"bool:{bool(v)}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        # pyarrow date32 cells come out as datetime.date while DuckDB's .df()
        # yields midnight datetime64 — the driver treats these as equal
        # (round-1 evidence: dte1/cst1 hash-matched), so render identically.
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "ARRAY[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, str):
        return f"str:{v}"
    return f"{type(v).__name__}:{v}"


def prep(df):
    cols = sorted(df.columns)
    df = df[cols]
    try:
        df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    except Exception as e:
        return None, cols, f"sort error (driver would also fail): {e}"
    return df, cols, None


def frame_rows(df):
    return [tuple(df.iloc[i]) for i in range(len(df))]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_dir = os.path.join(out_dir, name)
        try:
            s_df = pd.read_parquet(spark_dir)
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        try:
            d_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if sorted(s_df.columns) != sorted(d_df.columns):
            problems.append(f"cols spark={sorted(s_df.columns)} duck={sorted(d_df.columns)}")
        elif len(s_df) != len(d_df):
            problems.append(f"rows spark={len(s_df)} duck={len(d_df)}")
        else:
            s_df, cols, err_s = prep(s_df)
            d_df, _, err_d = prep(d_df)
            if err_s or err_d:
                problems.append(err_s or err_d)
            else:
                hs, hd = hashlib.sha256(), hashlib.sha256()
                s_rows, d_rows = frame_rows(s_df), frame_rows(d_df)
                for r in s_rows:
                    hs.update(("|".join(canon(v) for v in r) + "\n").encode())
                for r in d_rows:
                    hd.update(("|".join(canon(v) for v in r) + "\n").encode())
                if hs.hexdigest() != hd.hexdigest():
                    problems.append("hash mismatch")
                    shown = 0
                    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
                        sv = [canon(x) for x in sr]
                        dv = [canon(x) for x in dr]
                        if sv != dv:
                            diffs = [f"{cols[k]}: {sv[k]} != {dv[k]}"
                                     for k in range(len(sv)) if sv[k] != dv[k]]
                            problems.append(f"  row {i}: " + "; ".join(diffs[:4]))
                            shown += 1
                            if shown >= 3:
                                break
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems[:5]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
