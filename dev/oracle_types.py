#!/usr/bin/env python3
"""Sweep every oracle SQL's DuckDB output types for environment-sensitive
renderings that a value-hashing canonicalizer could see differently than
a float-coercing compare (the mix_corpus r6/r7 failure class).

Flags, per query:
  - HUGEINT / UHUGEINT output columns (pandas bridge maps int128 to
    float64 or object depending on version -> "123.0" vs "123")
  - DECIMAL output columns (pandas renders decimal.Decimal objects)
  - TIMESTAMP WITH TIME ZONE (tz-aware vs naive rendering)
  - int-vs-float dtype-family mismatch between the Spark parquet result
    and the DuckDB result for the same column (coerced green locally,
    hash-red under exact rendering)

Dev tooling only. Usage: python3 dev/oracle_types.py <verifyOutDir> <sfDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.sql(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{t}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

RISKY = ("HUGEINT", "UHUGEINT", "DECIMAL", "TIME ZONE")
INT_FAMS = ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64")

flagged = 0
for name in sorted(oracle):
    try:
        desc = con.sql(f"DESCRIBE ({oracle[name]})").df()
    except Exception as e:
        print(f"WARN {name}: DESCRIBE failed: {e}")
        flagged += 1
        continue
    types = dict(zip(desc["column_name"], desc["column_type"]))
    issues = [f"{c}:{t}" for c, t in types.items() if any(r in t.upper() for r in RISKY)]

    res_path = f"{out_dir}/{name}"
    if os.path.isdir(res_path):
        # Physical parquet types, not pandas dtypes: pandas promotes
        # nullable int64 to float64 on read, which is symmetric with
        # DuckDB's own bridge and therefore not a divergence.
        import pyarrow.parquet as pq
        part = sorted(glob.glob(f"{res_path}/*.parquet"))
        schema = pq.read_schema(part[0]) if part else None
        for c, t in types.items():
            if schema is None or c not in schema.names:
                continue
            s = str(schema.field(c).type)
            duck_is_int = t.upper() in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")
            duck_is_float = t.upper() in ("DOUBLE", "FLOAT", "REAL")
            spark_is_int = s in INT_FAMS
            spark_is_float = s.startswith("float") or s == "double"
            if (duck_is_int and spark_is_float) or (duck_is_float and spark_is_int):
                issues.append(f"{c}: spark={s} vs duck={t}")
    if issues:
        print(f"FLAG {name}: " + "; ".join(issues))
        flagged += 1

print(f"\n{flagged} flagged / {len(oracle)} oracles")
sys.exit(0)
