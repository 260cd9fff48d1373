#!/usr/bin/env python3
"""Scale the sf0.1 corpus ~100x (to sf~10) for the HEAVY-FAMILY scale
probe (dev tooling only — not part of the engine): the edit-distance
family (fuzzy/sorted-neighbor/JW/ER over customer names), the Apriori
family (lineitem baskets) and q21 (lineitem/orders/supplier/nation).
Only the tables those families read are generated — documents/events/
embeddings stay at their sf1 recipe (dev/gen_sf1.py) where the rest of
the registry is swept.

Usage: python3 dev/gen_sf10.py [outDir]   (default /tmp/graft_sf10)

Honest-work rules carried over from gen_sf1.py:
 - key columns shift by a per-copy offset: joins stay 1:1, FK structure
   preserved;
 - NAMES get a per-copy 4-letter tag "AABB" (A, B letter pairs from a
   10-letter alphabet indexed by copy//10 and copy%10): any two distinct
   tags differ in a whole 2-letter pair, so pairwise tag edit distance
   is >= 2 — above the fuzzy-join k=1 bound, so the within-copy fuzzy/ER
   pair structure replicates x100 instead of cross-copy cliques
   exploding the pair count;
 - copy 0 is byte-identical to sf0.1;
 - nation/region are spec-bounded dimensions, copied once.

Generation uses one CROSS JOIN against range(100) per table (not a
100-way UNION) so the 60M-row lineitem builds in one streaming pass.
"""
import os, shutil, sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10"
COPIES = 100
LETTERS = "bcdefghjkm"  # 10 letters -> 100 distinct AABB tags
OFF = dict(custkey=10**6, orderkey=10**8, partkey=10**7, suppkey=10**6)

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

# per-copy tag: AABB with A = LETTERS[i//10], B = LETTERS[i%10]; empty
# for copy 0 so the base slice stays byte-identical to sf0.1
TAG = (f"repeat(substring('{LETTERS}', (i // 10) + 1, 1), 2) || "
       f"repeat(substring('{LETTERS}', (i % 10) + 1, 1), 2)")
def sfx(namecol):
    return (f"CASE WHEN i = 0 THEN {namecol} "
            f"ELSE {namecol} || ' ' || {TAG} END AS {namecol}")

def write(table, sql):
    con.sql(f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows", flush=True)

for dim in ("region", "nation"):
    shutil.copyfile(f"{SRC}/{dim}.parquet", f"{OUT}/{dim}.parquet")
    print(f"{dim}: copied", flush=True)

write("customer", f"""
  SELECT c_custkey + i*{OFF['custkey']} AS c_custkey,
         {sfx('c_name')}, c_nationkey, c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet', (SELECT unnest(range({COPIES})) AS i)""")

write("supplier", f"""
  SELECT s_suppkey + i*{OFF['suppkey']} AS s_suppkey,
         {sfx('s_name')}, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet', (SELECT unnest(range({COPIES})) AS i)""")

write("part", f"""
  SELECT p_partkey + i*{OFF['partkey']} AS p_partkey,
         {sfx('p_name')}, p_brand, p_type, p_size, p_retailprice
  FROM '{SRC}/part.parquet', (SELECT unnest(range({COPIES})) AS i)""")

write("orders", f"""
  SELECT o_orderkey + i*{OFF['orderkey']} AS o_orderkey,
         o_custkey + i*{OFF['custkey']} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet', (SELECT unnest(range({COPIES})) AS i)""")

write("lineitem", f"""
  SELECT l_orderkey + i*{OFF['orderkey']} AS l_orderkey,
         l_partkey + i*{OFF['partkey']} AS l_partkey,
         l_suppkey + i*{OFF['suppkey']} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet', (SELECT unnest(range({COPIES})) AS i)""")

print(f"done -> {OUT}", flush=True)
