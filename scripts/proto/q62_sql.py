import duckdb, glob
import pandas as pd, numpy as np
con = duckdb.connect()
FIX = "/root/repo/target/telecom_fixture"

HAV = """(12742.0 * asin(sqrt(
      pow(sin(radians(lat - prev_lat) / 2), 2)
      + cos(radians(prev_lat)) * cos(radians(lat))
        * pow(sin(radians(lon - prev_lon) / 2), 2))))"""

Q62 = f"""
WITH bc AS (SELECT * FROM read_parquet('{FIX}/calls/*.parquet')),
calls AS (
  SELECT caller_customer_id AS customer_id, event_id,
    CAST(call_start_timestamp AS TIMESTAMP) AS ts,
    cell_lat AS lat, cell_lon AS lon, tower_id
  FROM bc),
enr AS (
  SELECT *,
    lag(ts) OVER w AS prev_ts,
    lag(lat) OVER w AS prev_lat,
    lag(lon) OVER w AS prev_lon,
    COUNT(*) OVER (PARTITION BY customer_id ORDER BY CAST(epoch(ts) AS BIGINT)
        RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)
      - (COUNT(*) OVER (PARTITION BY customer_id, CAST(epoch(ts) AS BIGINT))
         - row_number() OVER (PARTITION BY customer_id, CAST(epoch(ts) AS BIGINT)
             ORDER BY ts, event_id)) AS calls_30min
  FROM calls
  WINDOW w AS (PARTITION BY customer_id ORDER BY ts, event_id)),
sp AS (
  SELECT *,
    CAST(epoch(ts) AS BIGINT) - CAST(epoch(prev_ts) AS BIGINT) AS dt_sec,
    {HAV} AS dist_km
  FROM enr),
sp2 AS (
  SELECT *, CASE WHEN dt_sec > 0 THEN dist_km / (dt_sec / 3600.0) END AS speed_kmh
  FROM sp)
SELECT * FROM (
  SELECT 'travel_' || event_id AS alert_id,
    'IMPOSSIBLE_TRAVEL' AS alert_type,
    CASE WHEN speed_kmh > 2000.0 THEN 'HIGH' ELSE 'MEDIUM' END AS severity,
    customer_id, event_id,
    strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
    round(dist_km, 2) AS distance_km,
    round(speed_kmh, 2) AS implied_speed_kmh,
    CAST(0 AS INTEGER) AS window_call_count
  FROM sp2
  WHERE dt_sec > 0 AND dist_km >= 500.0 AND speed_kmh >= 600.0
  UNION ALL
  SELECT 'velocity_' || event_id, 'VELOCITY',
    CASE WHEN calls_30min > 50 THEN 'HIGH' ELSE 'MEDIUM' END,
    customer_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S'),
    0.0, 0.0, CAST(calls_30min AS INTEGER)
  FROM sp2 WHERE calls_30min > 25)
ORDER BY alert_id
"""

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object: df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"): df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

spark = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob("/tmp/verify_sf0.01/q62_fraud_alerts/*.parquet"))])
duck = con.execute(Q62).df()
a, b = canon(spark), canon(duck)
print("cols eq:", list(a.columns) == list(b.columns), "rows:", len(a), len(b))
if list(a.columns) != list(b.columns):
    print("spark:", list(a.columns)); print("duck:", list(b.columns))
elif len(a) == len(b):
    bad = False
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            ok = ((av.astype(float) == bv.astype(float)) | (av.isna() & bv.isna())).all()
        else:
            try: ok = ((av == bv) | (av.isna() & bv.isna())).all()
            except Exception: ok = (av.astype(str) == bv.astype(str)).all()
        if not ok:
            bad = True
            m = ~(av.astype(str) == bv.astype(str))
            i = int(np.argmax(m.values))
            print(f"MISMATCH {c} ({av.dtype}/{bv.dtype}): row{i} spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
    print("MATCH" if not bad else "FAIL")
