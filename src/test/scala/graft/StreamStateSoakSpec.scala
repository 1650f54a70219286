package graft

/** The four-stream state soak behind the bench's `stream_state`
  * artifact (round-8 verdict item 4): each stateful stream's
  * rows-over-batches series must be BOUNDED — by expiry (dedup), key
  * cardinality (quota), in-flight windows (top-k), or watermark
  * horizons (stream-stream join) — not by stream lifetime. */
class StreamStateSoakSpec extends SparkSpec {

  test("quota admission state plateaus at |sources| counters") {
    val series = StreamBench.quotaStateSeries(spark, batches = 12, sources = 20)
    assert(series.last._1 === 20L,
      s"state rows should be one counter per source: ${series.map(_._1)}")
    assert(series.map(_._1).max === 20L, "state grew past the key universe")
  }

  test("windowed top-k state evicts finalized windows") {
    val batches = 16
    val series = StreamBench.topkStateSeries(spark, batches)
    val rows = series.map(_._1)
    // 30 s batches over 1-minute windows with a 10 s watermark: ≤ ~3
    // windows in flight × ≤ 1 sketch row each + slack; without
    // finalization the count would reach one window per 2 batches
    assert(rows.last < batches.toLong / 2,
      s"windows not finalizing: $rows")
    assert(rows.max > 0, "soak never built state — vacuous")
  }

  test("stream-stream join state evicts past the tolerance horizon") {
    val batches = 16
    val series = StreamBench.enrichStateSeries(spark, batches)
    val rows = series.map(_._1)
    val perBatch = 20L // 10 calls + 10 probes buffered per batch
    // 2-minute tolerance at 30 s batches keeps ~4-5 batches of rows
    // in state; unbounded buffering would hold all batches
    assert(rows.last < perBatch * batches / 2,
      s"join state not evicting: $rows")
    assert(rows.max > 0, "soak never built state — vacuous")
  }

  test("quality-gate rule counters bound at in-flight windows x rules") {
    val batches = 16
    val series = StreamBench.qualityGateStateSeries(spark, batches)
    val rows = series.map(_._1)
    // 30 s batches over 1-minute windows with a 10 s watermark keep
    // ~3 windows in flight; the rule vocabulary is FIXED (q212's
    // rules + _kept/_rejected ≤ 10), so state must stay under
    // windows × rules + slack regardless of fresh doc ids per batch.
    // Unbounded behavior would approach one (window, rule) set per 2
    // batches (~8 rows × batches/2).
    assert(rows.max <= 4L * 12L,
      s"rule-counter state exceeds in-flight windows x rules: $rows")
    assert(rows.last <= rows.max, s"state still climbing at soak end: $rows")
    assert(rows.max > 0, "soak never built state — vacuous")
  }

  test("pii-scrub window counters bound at in-flight windows") {
    val batches = 16
    val series = StreamBench.piiScrubStateSeries(spark, batches)
    val rows = series.map(_._1)
    // one aggregate row per in-flight window (~3 under the 1 min /
    // 10 s config) + slack; unbounded would hold one per 2 batches
    assert(rows.max <= 6L,
      s"pii window state exceeds in-flight windows: $rows")
    assert(rows.max > 0, "soak never built state — vacuous")
  }

  test("measureState emits one artifact with every stateful stream") {
    val line = StreamBench.measureState(spark, batches = 8)
    assert(line.contains("\"metric\":\"stream_state\""))
    assert(line.contains("\"plateau_ratio\":"))
    // r8 item 4's three + the r10 additions (windowed HLL cardinality
    // and HDR quantiles) + the r11 additions (quality-gate rule
    // counters and PII-scrub window counters) — the soak now covers
    // EVERY stateful stream, windowed-counter class included
    Seq("quota", "topk", "enrich", "cardinality", "hdr_quantile",
        "quality_gate", "pii_scrub").foreach { s =>
      assert(line.contains(s"\"$s\":{"), s"missing stream $s in: $line")
      assert(!line.contains(s"\"$s\":{\"error\""), s"stream $s errored: $line")
    }
    // parseable by the same stack the driver uses
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("streams").size() === 7)
  }
}
