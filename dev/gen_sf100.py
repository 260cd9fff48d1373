#!/usr/bin/env python3
"""Third-decade (sf~100) corpus for the exp~0.75 families (dev tooling
only — not part of the engine): VERDICT r12 #5 asks whether
entity_resolution / frequent_triples / assoc_rules hold their measured
sf1→sf10 exponents one more decade out, so ONLY the tables those
queries read are generated — customer (ER names), part + lineitem
(the Apriori basket substrate), orders + supplier (q21, as a bonus
row). documents/events/embeddings are not scaled here; the rest of the
registry is swept at sf1/sf10.

Usage: python3 dev/gen_sf100.py [outDir] [threads]
       (default /tmp/graft_sf100, 8 threads)

Honest-work rules carried over from gen_sf1.py / gen_sf10.py:
 - key columns shift by a per-copy offset: joins stay 1:1, FK structure
   preserved (offsets sized so 1000 copies stay < int64);
 - NAMES get a per-copy 6-letter tag "AABBCC" (letter pairs from a
   10-letter alphabet indexed by i//100, (i//10)%10, i%10): distinct
   tags differ in a whole 2-letter pair, so pairwise tag edit distance
   is >= 2 — above the fuzzy-join k=1 bound; within-copy fuzzy/ER pair
   structure replicates x1000 instead of cross-copy cliques exploding
   the pair count;
 - copy 0 is byte-identical to sf0.1;
 - nation/region are spec-bounded dimensions, copied once.

One CROSS JOIN against range(1000) per table: lineitem's 600M rows
build in a single streaming pass.
"""
import os, shutil, sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf100"
THREADS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
COPIES = 1000
LETTERS = "bcdefghjkm"  # 10 letters -> 1000 distinct AABBCC tags
OFF = dict(custkey=10**6, orderkey=10**8, partkey=10**7, suppkey=10**6)

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.sql(f"SET threads = {THREADS}")

TAG = (f"repeat(substring('{LETTERS}', (i // 100) + 1, 1), 2) || "
       f"repeat(substring('{LETTERS}', ((i // 10) % 10) + 1, 1), 2) || "
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
