import duckdb, sys
sys.path.insert(0, '/root/repo/scripts/proto')
from kernels import *
DOCS = "/root/testdata/sf0.01/documents.parquet"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{DOCS}')")
FNV = lambda tok: f"""list_reduce(
  list_prepend(CAST(14695981039346656037 AS HUGEINT),
    list_transform(string_split({tok}, ''), c -> CAST(unicode(c) AS HUGEINT))),
  (a, b) -> CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT) * 1099511628211 % 18446744073709551616)"""

q48_sql = f"""
WITH tok AS (
  SELECT doc_id,
    list_transform(regexp_split_to_array(lower(trim(text)), ' +'), t -> {FNV('t')}) AS th
  FROM documents),
sig AS (
  SELECT doc_id,
    list_aggregate(list_transform(generate_series(0, 63), b ->
      CASE WHEN 2 * len(list_filter(th, x -> x // (CAST(1 AS HUGEINT) << b) % 2 = 1)) - len(th) > 0
           THEN (CAST(1 AS HUGEINT) << b) ELSE CAST(0 AS HUGEINT) END), 'sum') AS u
  FROM tok),
chunked AS (
  SELECT doc_id, u, j.chunk_idx, u // (CAST(1 AS HUGEINT) << (j.chunk_idx * 8)) % 256 AS chunk
  FROM sig, (SELECT unnest(generate_series(0, 7)) AS chunk_idx) j),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.u AS u_a, b.u AS u_b
  FROM chunked a JOIN chunked b
    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
SELECT id_a, id_b,
  CAST(bit_count(xor(CAST(u_a AS UBIGINT), CAST(u_b AS UBIGINT))) AS INTEGER) AS hamming
FROM pairs
WHERE bit_count(xor(CAST(u_a AS UBIGINT), CAST(u_b AS UBIGINT))) <= 7
ORDER BY id_a, id_b
"""
try:
    got = con.execute(q48_sql).fetchall()
    print("q48 sql rows:", len(got), "(expect 461)")
    # python reference
    pydocs = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
    sigs = {d: simhash64(t) for d, t in pydocs}
    from collections import defaultdict
    buckets = defaultdict(list)
    for d, u in sigs.items():
        for j in range(8):
            buckets[(j, (u >> (8*j)) & 0xFF)].append(d)
    cand = set()
    for ids in buckets.values():
        for i in range(len(ids)):
            for k in range(i+1, len(ids)):
                a, b = sorted((ids[i], ids[k]))
                cand.add((a, b))
    exp = sorted((a, b, bin(sigs[a]^sigs[b]).count('1')) for a, b in cand
                 if bin(sigs[a]^sigs[b]).count('1') <= 7)
    print("py rows:", len(exp), "match:", [tuple(r) for r in got] == exp)
except Exception as e:
    print("ERR:", str(e)[:300])
