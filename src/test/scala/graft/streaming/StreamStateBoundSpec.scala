package graft.streaming

import graft.{SparkSpec, StreamBench}

/** State-store boundedness of the at-ingest MinHash dedup
  * (StreamingDedup, SURVEY.md ST3/ST5 scale design): every batch of
  * StreamBench.stateSeries lands its documents in FRESH LSH buckets,
  * so the keyed state would grow linearly with stream lifetime if the
  * EventTimeTimeout expiry did not drop idle buckets. The series must
  * ramp while the first idle window fills, then plateau at the
  * trailing-window working set — the property the 100 TB design note
  * claims ("state bounded by expiry, not corpus").
  */
class StreamStateBoundSpec extends SparkSpec {

  test("state rows plateau under event-time expiry instead of growing with stream lifetime") {
    val batches = 40
    val series = StreamBench.stateSeries(spark, batches,
      docsPerBatch = 20, idleTimeout = "2 minutes")
    assert(series.size === batches)
    val rows = series.map(_._1)

    // the state path is exercised, not vacuous
    assert(rows.max > 0, "no state rows were ever created")

    // ramp-up: with 30 s event-time steps and a 2 min idle window the
    // working set fills over the first ~5 batches
    assert(rows(10) > rows(1),
      s"state never ramped: rows(1)=${rows(1)} rows(10)=${rows(10)}")

    // plateau: the last quarter's peak must not exceed the second
    // quarter's peak by more than slack — without expiry it would be
    // ~2x (cumulative buckets double between batch 20 and 40)
    val q2Max = rows.slice(batches / 4, batches / 2).max
    val q4Max = rows.slice(3 * batches / 4, batches).max
    assert(q4Max <= q2Max * 1.4,
      s"state kept growing: q2Max=$q2Max q4Max=$q4Max (series=$rows)")

    // and the plateau is far below the unbounded cumulative count:
    // every batch mints fresh buckets, so lifetime buckets ≈
    // batches/activeWindow × plateau; require at least 2x headroom
    val cumulativeLowerBound = rows.max.toDouble * batches / 10
    assert(q4Max < cumulativeLowerBound,
      "plateau is indistinguishable from unbounded growth")

    // bytes tracked too (the artifact reports both)
    assert(series.map(_._2).max > 0)
  }
}
