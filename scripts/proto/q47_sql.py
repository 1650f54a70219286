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

q47_sql = f"""
WITH tok AS (
  SELECT doc_id,
    list_transform(regexp_split_to_array(lower(trim(text)), ' +'), t -> {FNV('t')}) AS th
  FROM documents),
sig AS (
  SELECT doc_id,
    list_aggregate(list_transform(generate_series(0, 63), b ->
      CASE WHEN 2 * len(list_filter(th, x -> x // (CAST(1 AS HUGEINT) << b) % 2 = 1)) - len(th) > 0
           THEN (CAST(1 AS HUGEINT) << b) ELSE CAST(0 AS HUGEINT) END), 'sum') AS u
  FROM tok)
SELECT doc_id,
  CAST(CASE WHEN u >= 9223372036854775808 THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS simhash
FROM sig ORDER BY doc_id
"""
try:
    got = con.execute(q47_sql).fetchall()
    pydocs = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
    bad = 0
    for (d1, sg), (d2, text) in zip(got, pydocs):
        u = simhash64(text)
        signed = u - (1<<64) if u >= (1<<63) else u
        if sg != signed:
            bad += 1
            if bad <= 2: print("MISMATCH", d1, sg, signed)
    print(f"q47: {len(got)-bad}/{len(got)} match")
except Exception as e:
    print("ERR:", e)
