#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfdir> <voutdir>
For each <name>.parquet in voutdir with an oracle in oracle_sql.json:
load Spark result + run oracle SQL over views named after the sf tables,
sort columns by name, sort rows, hash values, report match.
"""
import sys, json, glob, os, hashlib
import duckdb

sfdir, vout = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")
oracles = json.load(open(f"{vout}/oracle_sql.json"))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(df.itertuples(index=False, name=None), key=lambda r: tuple(str(x) for x in r))
    h = hashlib.md5()
    for r in rows:
        for x in r:
            if isinstance(x, float):
                h.update(repr(round(x, 9)).encode())
            else:
                h.update(str(x).encode())
        h.update(b"|")
    return cols, len(rows), h.hexdigest(), rows

fails = 0
for d in sorted(glob.glob(f"{vout}/*.parquet")):
    key = os.path.basename(d)
    if key not in oracles:
        print(f"{key:32s} NO-ORACLE (rows-only)")
        continue
    spark_df = con.execute(f"SELECT * FROM '{d}/*.parquet'").df()
    try:
        ora_df = con.execute(oracles[key]).df()
    except Exception as e:
        print(f"{key:32s} ORACLE-ERR {e}")
        fails += 1
        continue
    sc, sn, sh, srows = canon(spark_df)
    oc, on, oh, orows = canon(ora_df)
    ok = (sc == oc, sn == on, sh == oh)
    status = "OK" if all(ok) else f"MISMATCH schema={ok[0]} rows={ok[1]}({sn}/{on}) hash={ok[2]}"
    if not all(ok):
        fails += 1
        # show first differing row
        for a, b in zip(srows, orows):
            if a != b:
                print(f"   spark : {a}\n   oracle: {b}")
                break
    print(f"{key:32s} {status}")
print(f"\n{'ALL OK' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
