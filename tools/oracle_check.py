#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify output vs DuckDB.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each <name> subdir in verifyOutDir (Spark parquet result), runs the
matching SQL from oracle_sql.json in DuckDB with views named after the
parquet tables in sfDir, sorts columns by name and rows by all columns,
and compares values exactly.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_skip = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        spark_df = pd.concat([pq.read_table(f).to_pandas() for f in files])
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only: {len(spark_df)} rows)")
            n_skip += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            n_fail += 1
            continue
        # exact compare, column by column (numeric dtypes may differ e.g.
        # int32 vs int64 — compare values, not dtypes)
        bad = None
        for c in s.columns:
            sv, dv = s[c].reset_index(drop=True), d[c].reset_index(drop=True)
            try:
                eq = (sv == dv) | (sv.isna() & dv.isna())
            except Exception:
                eq = sv.astype(str) == dv.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                bad = (c, i, sv[i], dv[i], int((~eq).sum()))
                break
        if bad:
            c, i, a, b, cnt = bad
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duck={b!r} ({cnt} diffs)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows, {len(s.columns)} cols)")
            n_pass += 1
    missing = sorted(set(oracle) - set(names))
    for m in missing:
        print(f"FAIL {m}: oracle declared but no spark output dir")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
