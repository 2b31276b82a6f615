#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output dir (per-query parquet + oracle_sql.json), runs each
oracle SQL in DuckDB over the same sf tables, and compares: schema (column
names), row count, and a canonical value hash with columns sorted by name.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os, hashlib, math
import duckdb
import pyarrow.parquet as pq
import decimal, datetime


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return f"DEC:{v.normalize()}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):  # pyarrow may give dicts for structs
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return f"{type(v).__name__}:{v}"


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    for row in rows:
        h.update(("|".join(canon(row[i]) for i in order) + "\n").encode())
    return h.hexdigest()


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
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            tbl = pq.read_table(files[0])
            s_cols = tbl.column_names
            s_rows = [tuple(r[c] for c in s_cols) for r in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        try:
            res = con.execute(oracle[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            hs = table_hash(s_cols, s_rows)
            hd = table_hash(d_cols, d_rows)
            if hs != hd:
                problems.append("hash mismatch")
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                shown = 0
                for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
                    sv = [canon(sr[j]) for j in order_s]
                    dv = [canon(dr[j]) for j in order_d]
                    if sv != dv:
                        cols_sorted = sorted(s_cols)
                        diffs = [f"{cols_sorted[k]}: {sv[k]} != {dv[k]}"
                                 for k in range(len(sv)) if sv[k] != dv[k]]
                        problems.append(f"  row {i}: " + "; ".join(diffs[:4]))
                        shown += 1
                        if shown >= 3:
                            break
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems[:5]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
