#!/usr/bin/env python3
"""Scale the sf0.1 corpus ~10x (to sf~1) by re-keyed duplication, for
local scale-evidence runs (dev tooling only — not part of the engine).

Usage: python3 dev/gen_sf1.py [outDir]   (default /tmp/graft_sf1)

Design notes — the copies must scale WORK honestly, not manufacture
quadratic blowups that real 10x data would not have:
 - every key column is shifted by a per-copy offset so joins stay 1:1
   and FK structure is preserved (orders->customer, lineitem->part etc.);
 - customer/supplier/part NAMES get a per-copy 2-letter suffix whose
   cross-copy edit distance is 2 (> the fuzzy-join k=1 bound), so the
   within-copy fuzzy/ER pair structure replicates x10 instead of every
   name matching its 9 clones (x100 pair explosion real data wouldn't
   have);
 - document TEXT gets the same 2-letter tag appended to EVERY token for
   copies 1..9, so shingle/minhash/containment dup structure replicates
   x10 within copies with no cross-copy near-dup cliques;
 - EMBEDDINGS get per-copy seeded Gaussian jitter (sigma 0.05), so LSH/
   IVF bucket occupancy grows x10 instead of stacking 10 identical
   vectors in every bucket (quadratic bucket joins);
 - nation/region are spec-bounded dimensions and are copied once;
 - copy 0 is byte-identical to sf0.1.
"""
import os, sys, shutil
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = 10
# per-copy 2-letter tags: pairwise edit distance 2
TAGS = ["", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "jj", "kk"]
# key offsets, comfortably above each key's sf0.1 max
OFF = dict(custkey=10**6, orderkey=10**8, partkey=10**7, suppkey=10**6,
           event=10**7, user=10**7, doc=10**6, vec=10**6)

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

def write(table, sql):
    con.sql(f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")

for dim in ("region", "nation"):
    shutil.copyfile(f"{SRC}/{dim}.parquet", f"{OUT}/{dim}.parquet")
    print(f"{dim}: copied")

def copies(body):
    return " UNION ALL ".join(
        body.format(i=i, tag=TAGS[i], sfx=f" || ' {TAGS[i]}'" if i else "")
        for i in range(COPIES))

write("customer", copies(f"""
  SELECT c_custkey + {{i}}*{OFF['custkey']} AS c_custkey,
         c_name{{sfx}} AS c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM '{SRC}/customer.parquet'"""))

write("supplier", copies(f"""
  SELECT s_suppkey + {{i}}*{OFF['suppkey']} AS s_suppkey,
         s_name{{sfx}} AS s_name, s_nationkey, s_acctbal
  FROM '{SRC}/supplier.parquet'"""))

write("part", copies(f"""
  SELECT p_partkey + {{i}}*{OFF['partkey']} AS p_partkey,
         p_name{{sfx}} AS p_name, p_brand, p_type, p_size, p_retailprice
  FROM '{SRC}/part.parquet'"""))

write("orders", copies(f"""
  SELECT o_orderkey + {{i}}*{OFF['orderkey']} AS o_orderkey,
         o_custkey + {{i}}*{OFF['custkey']} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{SRC}/orders.parquet'"""))

write("lineitem", copies(f"""
  SELECT l_orderkey + {{i}}*{OFF['orderkey']} AS l_orderkey,
         l_partkey + {{i}}*{OFF['partkey']} AS l_partkey,
         l_suppkey + {{i}}*{OFF['suppkey']} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM '{SRC}/lineitem.parquet'"""))

write("events", copies(f"""
  SELECT event_id + {{i}}*{OFF['event']} AS event_id, ts,
         user_id + {{i}}*{OFF['user']} AS user_id, event_type, value, props
  FROM '{SRC}/events.parquet'"""))

write("documents", copies(f"""
  SELECT doc_id + {{i}}*{OFF['doc']} AS doc_id,
         CASE WHEN {{i}} = 0 THEN text
              ELSE array_to_string(
                list_transform(string_split(text, ' '), w -> w || '{{tag}}'), ' ')
         END AS text,
         lang, source, n_chars
  FROM '{SRC}/documents.parquet'"""))

# embeddings: numpy jitter per copy (seeded, sigma 0.05)
emb = pq.read_table(f"{SRC}/embeddings.parquet")
vec = np.array([np.array(v, dtype=np.float32) for v in emb["embedding"].to_pylist()])
ids = np.array(emb["vec_id"].to_pylist(), dtype=np.int64)
labels = np.array(emb["label"].to_pylist(), dtype=np.int32)
parts = []
for i in range(COPIES):
    rng = np.random.default_rng(1234 + i)
    v = vec if i == 0 else vec + rng.normal(0.0, 0.05, vec.shape).astype(np.float32)
    parts.append(pa.table({
        "vec_id": pa.array(ids + i * OFF["vec"], type=pa.int64()),
        "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
        "label": pa.array(labels, type=pa.int32())}))
pq.write_table(pa.concat_tables(parts), f"{OUT}/embeddings.parquet")
print(f"embeddings: {COPIES * len(ids)} rows")
print(f"done -> {OUT}")
