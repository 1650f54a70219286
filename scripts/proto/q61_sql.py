import duckdb, glob
import pandas as pd, numpy as np
con = duckdb.connect()
FIX = "/root/repo/target/telecom_fixture"

Q61 = f"""
WITH bc AS (SELECT * FROM read_parquet('{FIX}/calls/*.parquet')),
bcu AS (SELECT * FROM read_parquet('{FIX}/customers/*.parquet')),
sc AS (
  SELECT event_id AS call_id, caller_customer_id AS customer_id, tower_id,
    CAST(CAST(call_start_timestamp AS TIMESTAMP) AS DATE) AS call_date,
    round(duration_seconds / 60.0, 2) AS duration_minutes,
    call_result_code = 'COMPLETED' AS is_successful,
    roaming,
    CAST(revenue_usd AS DECIMAL(12,4)) AS revenue_usd
  FROM (SELECT *, row_number() OVER (PARTITION BY event_id
          ORDER BY _bronze_ingested_at DESC, _kafka_offset DESC) AS _rn
        FROM bc
        WHERE event_id IS NOT NULL AND caller_msisdn IS NOT NULL
          AND tower_id IS NOT NULL AND duration_seconds >= 0)
  WHERE _rn = 1),
scu AS (
  SELECT customer_id,
    CAST(plan_monthly_fee AS DECIMAL(10,2)) AS plan_monthly_fee,
    CAST(activation_date AS DATE) AS activation_date
  FROM (SELECT *, row_number() OVER (PARTITION BY customer_id
          ORDER BY CAST(updated_at AS TIMESTAMP) DESC) AS _rn
        FROM bcu WHERE customer_id IS NOT NULL)
  WHERE _rn = 1),
dimc AS (
  SELECT md5(customer_id) AS customer_key, customer_id,
    CASE WHEN plan_monthly_fee >= 60 THEN 'HIGH_VALUE'
         WHEN plan_monthly_fee >= 25 THEN 'MID_VALUE'
         ELSE 'LOW_VALUE' END AS value_segment,
    CASE WHEN (2024 - year(activation_date))*12 + (1 - month(activation_date))
            + CASE WHEN day(activation_date) = 1 THEN 0
                   ELSE (1 - day(activation_date))/31.0 END >= 36 THEN 'VETERAN'
         WHEN (2024 - year(activation_date))*12 + (1 - month(activation_date))
            + CASE WHEN day(activation_date) = 1 THEN 0
                   ELSE (1 - day(activation_date))/31.0 END >= 12 THEN 'ESTABLISHED'
         ELSE 'NEW' END AS tenure_segment
  FROM scu),
fact AS (
  SELECT COALESCE(d.customer_key, 'UNKNOWN') AS customer_key,
    sc.call_date, sc.duration_minutes, sc.revenue_usd,
    CASE WHEN sc.is_successful THEN 1 ELSE 0 END AS successful_call_count,
    CASE WHEN sc.roaming THEN 1 ELSE 0 END AS roaming_call_count
  FROM sc LEFT JOIN dimc d ON sc.customer_id = d.customer_id),
monthly AS (
  SELECT customer_key, strftime(call_date, '%Y-%m') AS year_month,
    CAST(COUNT(*) AS BIGINT) AS call_count,
    CAST(SUM(CAST(duration_minutes AS DECIMAL(18,2))) AS DOUBLE) AS total_minutes,
    CAST(SUM(CAST(revenue_usd AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue_usd,
    CAST(SUM(CASE WHEN successful_call_count = 1 THEN 1 ELSE 0 END) AS BIGINT) AS successful_calls,
    CAST(SUM(CASE WHEN roaming_call_count = 1 THEN 1 ELSE 0 END) AS BIGINT) AS roaming_calls
  FROM fact GROUP BY 1, 2)
SELECT d.customer_key, d.customer_id, d.value_segment, d.tenure_segment,
  m.year_month, m.call_count, m.total_minutes, m.total_revenue_usd,
  m.successful_calls, m.roaming_calls,
  CASE WHEN m.total_minutes >= 300 THEN 'HEAVY'
       WHEN m.total_minutes >= 60 THEN 'REGULAR'
       ELSE 'LIGHT' END AS usage_segment
FROM dimc d LEFT JOIN monthly m ON d.customer_key = m.customer_key
WHERE m.year_month IS NOT NULL
ORDER BY d.customer_id, m.year_month
"""

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object: df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"): df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

spark = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob("/tmp/verify_sf0.01/q61_customer_monthly/*.parquet"))])
duck = con.execute(Q61).df()
a, b = canon(spark), canon(duck)
print("cols eq:", list(a.columns) == list(b.columns), "rows:", len(a), len(b))
if list(a.columns) != list(b.columns):
    print("spark:", list(a.columns)); print("duck:", list(b.columns))
else:
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
