import duckdb, sys
M64 = (1<<64)-1
B = 0x100000001b3

def hash64(s):
    h = 0xcbf29ce484222325
    for c in s:
        h ^= ord(c); h = (h * B) & M64
    return h

def winnow(text, k=8, w=4):
    s = text.strip().lower()
    if len(s) < k: return [hash64(s)]
    m = len(s) - k + 1
    hs = []
    for g in range(m):
        h = 0
        for j in range(k):
            h = (h * B + ord(s[g+j])) & M64
        hs.append(h)
    nw = max(1, m - w + 1)
    mins = [min(hs[i:min(i+w, m)]) for i in range(nw)]
    d = sorted(set(mins))
    return d

con = duckdb.connect()
con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet('/root/testdata/sf0.01/documents.parquet')")

pows = [pow(B, 8-1-j, 1<<64) for j in range(8)]
terms = " + ".join(f"CAST(unicode(s[g+{j}]) AS HUGEINT) * {pows[j]}" for j in range(8))
FNV = """list_reduce(
  list_prepend(CAST(14695981039346656037 AS HUGEINT),
    list_transform(string_split(s, ''), c -> CAST(unicode(c) AS HUGEINT))),
  (a, b) -> CAST(xor(CAST(a AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT) * 1099511628211 % 18446744073709551616)"""
SQL = f"""
WITH t AS (SELECT doc_id, lower(trim(text)) AS s, length(lower(trim(text))) AS n FROM documents),
h AS (
  SELECT doc_id, n,
    CASE WHEN n < 8 THEN [{FNV}]
    ELSE list_transform(generate_series(1, n-7), g -> ({terms}) % 18446744073709551616)
    END AS hs
  FROM t),
wm AS (
  SELECT doc_id,
    list_sort(list_distinct(list_transform(
      generate_series(1, greatest(1, len(hs) - 3)),
      i -> list_aggregate(hs[i : least(i+3, len(hs))], 'min')))) AS fps
  FROM h)
SELECT doc_id,
  CAST(len(fps) AS INTEGER) AS n_fingerprints,
  CAST(CASE WHEN fps[1] >= 9223372036854775808 THEN fps[1] - 18446744073709551616 ELSE fps[1] END AS BIGINT) AS fp_min,
  CAST(CASE WHEN list_aggregate(fps, 'sum') % 18446744073709551616 >= 9223372036854775808
       THEN list_aggregate(fps, 'sum') % 18446744073709551616 - 18446744073709551616
       ELSE list_aggregate(fps, 'sum') % 18446744073709551616 END AS BIGINT) AS fp_checksum
FROM wm ORDER BY doc_id
"""
got = con.execute(SQL).fetchall()
docs = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
bad = 0
for (d1, nf, mn, ck), (d2, text) in zip(got, docs):
    fps = winnow(text)
    emn = fps[0] - (1<<64) if fps[0] >= (1<<63) else fps[0]
    s = sum(fps) & M64
    eck = s - (1<<64) if s >= (1<<63) else s
    if (nf, mn, ck) != (len(fps), emn, eck):
        bad += 1
        if bad <= 2: print("MISMATCH", d1, (nf, mn, ck), (len(fps), emn, eck))
print(f"q43: {len(got)-bad}/{len(got)} match")
