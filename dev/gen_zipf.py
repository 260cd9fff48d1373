#!/usr/bin/env python3
"""Zipf-distributed basket corpus for the adaptive level-1 Apriori
prune probe (dev tooling only — not part of the engine; VERDICT r13 #1).

Every synthetic TPC-H-ish corpus the engine is swept on is
frequency-UNIFORM by construction (re-keyed copies), so the adaptive
item prune in Stats.frequentItemArrays has never fired outside unit
tests. Real item distributions are Zipf: a short head of items in
~every basket and a long tail of items too rare to ever reach support.
This generator plants exactly that shape, deterministically:

 - B baskets; basket b has width 4 + (hash64(b) % 5)  (4..8 items);
 - item of slot (b, j): u = hash64(b*16 + j + 1) / 2^64, mapped through
   the continuous inverse-CDF approximation of Zipf(s) over ranks
   1..V:  r = ((1 - u * (1 - V^(1-s)))^(1/(1-s))), clamped to [1, V].
   s = 1.2, V = 2,000,000 ranks.
 - hash64 is DuckDB's hash() — no random(): identical output on every
   run at a fixed DuckDB version, any thread count.

The long form (b BIGINT, i BIGINT) is what Stats.coOccurrence /
associationRules / frequentTriples consume directly.

Usage: python3 dev/gen_zipf.py [baskets] [outDir]
       default 10,000,000 baskets (~60M rows) -> /tmp/graft_zipf10
Examples:
  python3 dev/gen_zipf.py 10000000  /tmp/graft_zipf10    # sf~10 probe
  python3 dev/gen_zipf.py 100000000 /tmp/graft_zipf100   # sf~100 probe

Prints the tail statistics that set the prune's upside: for a given
minCount, the fraction of (b, i) rows held by items below it is the
mass the level-1 prune deletes before pair expansion.
"""
import os, sys

import duckdb

B = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_zipf10"
S = 1.2          # Zipf exponent
V = 2_000_000    # item vocabulary (ranks)

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.sql("SET threads=16")

# DuckDB's built-in hash() (UBIGINT, deterministic for a given version)
# stands in for splitmix64 — UBIGINT multiplication overflow-checks, so
# hand-rolling a mixer in SQL is not practical
con.sql("CREATE MACRO sm64(x) AS hash(CAST(x AS BIGINT))")

# one streaming pass: baskets x slots, width-filtered, rank via inverse CDF
ALPHA = 1.0 - S                      # 1-s  (negative)
TAILW = 1.0 - float(V) ** ALPHA      # 1 - V^(1-s)
sql = f"""
WITH slots AS (
  SELECT b.range AS b, j.range AS j,
         4 + (sm64(b.range) % 5) AS w
  FROM range({B}) b, range(8) j
), kept AS (
  SELECT b, j,
    CAST(sm64(b * 16 + j + 1) AS DOUBLE) / 18446744073709551616.0 AS u
  FROM slots WHERE j < w
)
SELECT CAST(b AS BIGINT) AS b,
  CAST(LEAST({V}, GREATEST(1,
    CAST(ceil(pow(1.0 - u * {TAILW}, 1.0 / ({ALPHA})) ) AS BIGINT))) AS BIGINT) AS i
FROM kept
"""
con.sql(f"COPY ({sql}) TO '{OUT}/baskets.parquet' "
        "(FORMAT PARQUET, ROW_GROUP_SIZE 1048576)")

n = con.sql(f"SELECT count(*) FROM '{OUT}/baskets.parquet'").fetchone()[0]
print(f"baskets.parquet: {n} rows, {B} baskets", flush=True)

# tail statistics: what share of rows does a minCount prune delete?
stats = con.sql(f"""
  WITH ic AS (SELECT i, count(*) AS n_i FROM '{OUT}/baskets.parquet' GROUP BY i)
  SELECT count(*) AS distinct_items,
    sum(CASE WHEN n_i < {max(1, B // 100_000)} THEN n_i ELSE 0 END)
      / CAST(sum(n_i) AS DOUBLE) AS tail_mass_b_over_1e5,
    sum(CASE WHEN n_i < {max(1, B // 10_000)} THEN n_i ELSE 0 END)
      / CAST(sum(n_i) AS DOUBLE) AS tail_mass_b_over_1e4,
    max(n_i) AS head_item_count
  FROM ic""").fetchone()
print(f"distinct items: {stats[0]}, head item count: {stats[3]}")
print(f"row mass on items < B/1e5 ({max(1, B//100_000)}): {stats[1]:.3f}")
print(f"row mass on items < B/1e4 ({max(1, B//10_000)}): {stats[2]:.3f}")
