#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: reads the parquet
results written by `graft.Verify`, runs each oracle SQL in DuckDB over the
same test tables, and compares rows/schema/values.

Dev tooling only (not part of the shipped Scala engine).

Usage: python3 dev/check_oracle.py <verifyOutDir> <sfDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

out_dir, sf_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.sql(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            s = s.astype("datetime64[us]")
        out[c] = s.reset_index(drop=True)
    return pd.DataFrame(out)

fails = []
for name in sorted(oracle):
    res_path = f"{out_dir}/{name}"
    if not os.path.isdir(res_path):
        print(f"FAIL {name}: no spark result written"); fails.append(name); continue
    spark_df = canon(pd.read_parquet(res_path))
    try:
        duck_df = canon(con.sql(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails.append(name); continue
    ok = True
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}"); ok = False
    elif len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}"); ok = False
    else:
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                eq = (a.isna() & b.isna()) | (a.astype(float).values == b.astype(float).values)
            else:
                eq = (a.isna() & b.isna()) | (a.values == b.values)
            if not np.all(eq):
                bad = np.where(~np.asarray(eq))[0][:3]
                print(f"FAIL {name}: col {c} differs at rows {bad.tolist()} "
                      f"spark={a.iloc[bad].tolist()} duck={b.iloc[bad].tolist()}")
                ok = False
    if ok:
        print(f"PASS {name} ({len(spark_df)} rows)")
    else:
        fails.append(name)

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
