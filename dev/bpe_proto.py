#!/usr/bin/env python3
"""Prototype the distributed-BPE oracle SQL (round 16): a pure-python
reference BPE (Sennrich-style most-frequent-adjacent-pair merges with
(count desc, pair asc) tie-breaks, greedy L2R pair rewrite) vs the
candidate DuckDB unrolled-CTE oracle, on the sf0.001 documents table."""
import sys, collections, duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 12
D = chr(1)

con = duckdb.connect()
docs = con.execute(f"SELECT text FROM '{SF}/documents.parquet' WHERE text IS NOT NULL").fetchall()

# ---------- python reference ----------
freq = collections.Counter()
for (t,) in docs:
    for w in t.split(" "):
        w = w.replace(D, "")
        if w:
            freq[w] += 1
# symbol sequences
syms = {w: list(w) for w in freq}
merges = []
for r in range(1, K + 1):
    pairs = collections.Counter()
    for w, s in syms.items():
        f = freq[w]
        for i in range(len(s) - 1):
            pairs[(s[i], s[i + 1])] += f
    if not pairs:
        break
    best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    (l, rr), cnt = best
    merges.append((r, l, rr, l + rr, cnt))
    for w, s in syms.items():
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == l and s[i + 1] == rr:
                out.append(l + rr); i += 2
            else:
                out.append(s[i]); i += 1
        syms[w] = out

# per-doc encode with the fitted merges
def encode_word(w):
    s = list(w.replace(D, ""))
    for (_, l, rr, m, _) in merges:
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == l and s[i + 1] == rr:
                out.append(m); i += 2
            else:
                out.append(s[i]); i += 1
        s = out
    return len(s)

# ---------- candidate DuckDB SQL ----------
def step(i):
    return f"""p{i} AS MATERIALIZED (
 SELECT z[1] AS lhs, z[2] AS rhs, CAST(sum(freq) AS BIGINT) AS cnt
 FROM (
   SELECT unnest(list_zip(syms, syms[2:])) AS z, freq
   FROM (SELECT string_split(trim(sym, chr(1)), chr(1)||chr(1)) AS syms, freq FROM s{i-1}))
 WHERE z[2] IS NOT NULL
 GROUP BY 1, 2),
m{i} AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p{i} ORDER BY cnt DESC, lhs, rhs LIMIT 1),
s{i} AS MATERIALIZED (
 SELECT replace(sym,
   chr(1)||(SELECT lhs FROM m{i})||chr(1)||chr(1)||(SELECT rhs FROM m{i})||chr(1),
   chr(1)||(SELECT lhs FROM m{i})||(SELECT rhs FROM m{i})||chr(1)) AS sym, freq
 FROM s{i-1})"""

prelude = f"""WITH w0 AS MATERIALIZED (
 SELECT replace(word, chr(1), '') AS word, count(*) AS freq
 FROM (SELECT unnest(string_split(text, ' ')) AS word
       FROM '{SF}/documents.parquet' WHERE text IS NOT NULL)
 WHERE word <> '' AND replace(word, chr(1), '') <> ''
 GROUP BY 1),
s0 AS MATERIALIZED (
 SELECT chr(1) || array_to_string(regexp_extract_all(word, '.'), chr(1)||chr(1)) || chr(1) AS sym,
        freq
 FROM w0),
STEPS"""
prelude = prelude.replace("STEPS", ",\n".join(step(i) for i in range(1, K + 1)))

fit_sql = prelude + f""",
fit AS ({" UNION ALL ".join(
    f"SELECT {i} AS rank, lhs, rhs, lhs||rhs AS merged, cnt FROM m{i}" for i in range(1, K+1))})
SELECT * FROM fit ORDER BY rank"""

got = con.execute(fit_sql).fetchall()
want = [(r, l, rr, m, c) for (r, l, rr, m, c) in merges]
ok = [tuple(g) for g in got] == want
print("fit match:", ok)
if not ok:
    for g, w in zip(got, want):
        if tuple(g) != w:
            print(" got", g, "\nwant", w)
    sys.exit(1)

# encode oracle: re-symbolize every word occurrence per doc, run the merge
# replace chain, count symbols = (len - len without chr(1)) / 2
chain = "sym"
for i in range(1, K + 1):
    chain = (f"replace({chain}, chr(1)||(SELECT lhs FROM m{i})||chr(1)||chr(1)||"
             f"(SELECT rhs FROM m{i})||chr(1), chr(1)||(SELECT lhs FROM m{i})||"
             f"(SELECT rhs FROM m{i})||chr(1))")
enc_sql = prelude + f""",
dw AS (
 SELECT doc_id, replace(word, chr(1), '') AS word
 FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
       FROM '{SF}/documents.parquet' WHERE text IS NOT NULL)
 WHERE word <> '' AND replace(word, chr(1), '') <> ''),
ds AS (
 SELECT doc_id,
   chr(1) || array_to_string(regexp_extract_all(word, '.'), chr(1)||chr(1)) || chr(1) AS sym
 FROM dw),
de AS (SELECT doc_id, {chain} AS esym FROM ds)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum((length(esym) - length(replace(esym, chr(1), ''))) // 2) AS BIGINT) AS n_tokens
FROM de GROUP BY 1 ORDER BY doc_id"""

got_enc = con.execute(enc_sql).fetchall()
# python reference per doc
ref = {}
docs2 = con.execute(f"SELECT doc_id, text FROM '{SF}/documents.parquet' WHERE text IS NOT NULL").fetchall()
for did, t in docs2:
    words = [w for w in t.split(" ") if w and w.replace(D, "")]
    ref[did] = (len(words), sum(encode_word(w) for w in words))
ok2 = all((d, ref[d][0], ref[d][1]) == tuple(g) for g, d in zip(got_enc, sorted(ref)))
print("encode match:", ok2, f"({len(got_enc)} docs)")
print("merges:", [(m[1], m[2], m[4]) for m in merges][:6], "...")
