import duckdb, glob, sys
import pandas as pd, numpy as np
con = duckdb.connect()
FIX = "/root/repo/target/telecom_fixture"

Q60 = f"""
WITH bc AS (SELECT * FROM read_parquet('{FIX}/calls/*.parquet')),
bp AS (SELECT * FROM read_parquet('{FIX}/probes/*.parquet')),
sc AS (
  SELECT event_id AS call_id, tower_id,
    CAST(call_start_timestamp AS TIMESTAMP) AS call_start_ts,
    round(duration_seconds / 60.0, 2) AS duration_minutes,
    call_result_code = 'COMPLETED' AS is_successful,
    CAST(revenue_usd AS DECIMAL(12,4)) AS revenue_usd
  FROM (SELECT *, row_number() OVER (PARTITION BY event_id
          ORDER BY _bronze_ingested_at DESC, _kafka_offset DESC) AS _rn
        FROM bc
        WHERE event_id IS NOT NULL AND caller_msisdn IS NOT NULL
          AND tower_id IS NOT NULL AND duration_seconds >= 0)
  WHERE _rn = 1),
sp AS (
  SELECT probe_id, tower_id, region,
    date_trunc('hour', CAST(event_timestamp AS TIMESTAMP)) AS probe_hour,
    CAST(load_pct AS DECIMAL(6,2)) AS load_pct,
    CAST(avg_latency_ms AS DECIMAL(8,1)) AS avg_latency_ms,
    CAST(packet_loss_pct AS DECIMAL(6,3)) AS packet_loss_pct,
    CAST(connected_users AS INTEGER) AS connected_users,
    CAST(load_pct AS DECIMAL(6,2)) >= 90 AS alert_threshold_breached,
    CASE WHEN CAST(load_pct AS DECIMAL(6,2)) >= 90 THEN 'CRITICAL'
         WHEN CAST(load_pct AS DECIMAL(6,2)) >= 75 THEN 'DEGRADED'
         ELSE 'HEALTHY' END AS load_status
  FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
          ORDER BY _bronze_ingested_at DESC) AS _rn
        FROM bp WHERE probe_id IS NOT NULL AND tower_id IS NOT NULL)
  WHERE _rn = 1),
pa AS (
  SELECT tower_id, probe_hour AS hour, region,
    CAST(CAST(SUM(CAST(load_pct AS DECIMAL(18,2))) AS DOUBLE) / COUNT(load_pct) AS DOUBLE) AS avg_load_pct,
    CAST(MAX(load_pct) AS DOUBLE) AS max_load_pct,
    CAST(CAST(SUM(CAST(avg_latency_ms AS DECIMAL(18,1))) AS DOUBLE) / COUNT(avg_latency_ms) AS DOUBLE) AS avg_latency_ms,
    CAST(CAST(SUM(CAST(packet_loss_pct AS DECIMAL(18,3))) AS DOUBLE) / COUNT(packet_loss_pct) AS DOUBLE) AS avg_packet_loss_pct,
    CAST(CAST(SUM(CAST(connected_users AS DECIMAL(18,0))) AS DOUBLE) / COUNT(connected_users) AS DOUBLE) AS avg_connected_users,
    CAST(SUM(CASE WHEN alert_threshold_breached THEN 1 ELSE 0 END) AS BIGINT) AS alert_count,
    MAX(CASE WHEN load_status = 'CRITICAL' THEN 3
             WHEN load_status = 'DEGRADED' THEN 2 ELSE 1 END) AS worst_status_rank,
    CAST(COUNT(*) AS BIGINT) AS probe_count
  FROM sp GROUP BY 1, 2, 3),
ca AS (
  SELECT tower_id, date_trunc('hour', call_start_ts) AS hour,
    CAST(COUNT(*) AS BIGINT) AS call_count,
    CAST(SUM(CASE WHEN is_successful THEN 1 ELSE 0 END) AS BIGINT) AS successful_calls,
    CAST(SUM(CAST(duration_minutes AS DECIMAL(18,2))) AS DOUBLE) AS total_call_minutes,
    CAST(SUM(CAST(revenue_usd AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue_usd
  FROM sc GROUP BY 1, 2)
SELECT pa.tower_id AS tower_id, strftime(pa.hour, '%Y-%m-%d %H:%M:%S') AS hour, pa.region,
  pa.avg_load_pct, pa.max_load_pct, pa.avg_latency_ms, pa.avg_packet_loss_pct,
  pa.avg_connected_users, pa.alert_count,
  CASE WHEN worst_status_rank = 3 THEN 'CRITICAL'
       WHEN worst_status_rank = 2 THEN 'DEGRADED' ELSE 'HEALTHY' END AS worst_status,
  pa.probe_count,
  COALESCE(ca.call_count, 0) AS call_count,
  COALESCE(ca.successful_calls, 0) AS successful_calls,
  COALESCE(ca.total_call_minutes, 0.0) AS total_call_minutes,
  COALESCE(ca.total_revenue_usd, 0.0) AS total_revenue_usd,
  CASE WHEN COALESCE(ca.call_count, 0) > 0
    THEN round(CAST(ca.successful_calls AS DOUBLE) / ca.call_count * 100.0, 2)
    ELSE NULL END AS success_rate_pct
FROM pa LEFT JOIN ca ON pa.tower_id = ca.tower_id AND pa.hour = ca.hour
ORDER BY tower_id, hour
"""

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object: df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"): df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

spark = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob("/tmp/verify_sf0.01/q60_tower_hourly/*.parquet"))])
duck = con.execute(Q60).df()
a, b = canon(spark), canon(duck)
print("cols eq:", list(a.columns) == list(b.columns), "rows:", len(a), len(b))
if list(a.columns) != list(b.columns):
    print("spark:", list(a.columns)); print("duck:", list(b.columns))
else:
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            ok = ((av.astype(float) == bv.astype(float)) | (av.isna() & bv.isna())).all()
        else:
            try: ok = ((av == bv) | (av.isna() & bv.isna())).all()
            except Exception: ok = (av.astype(str) == bv.astype(str)).all()
        if not ok:
            m = ~((av.astype(str)) == (bv.astype(str)))
            i = int(np.argmax(m.values))
            print(f"MISMATCH {c} ({a[c].dtype}/{b[c].dtype}): row{i} spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
    print("done")
