package graft.streaming

import graft.{SparkSpec, Tables}
import graft.queries.ScaleOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import EwmaStream.DayCount

/** Stream ≡ batch ≡ SQL-expression triangulation for the EWMA
  * monitor: the stateful streaming fold across micro-batches must
  * reproduce q106's aggregate-expression results bit-for-bit. */
class EwmaStreamSpec extends SparkSpec {
  import spark.implicits._

  private def dailyCounts = Tables.events(spark, sfDir)
    .groupBy(col("user_id"), to_date(col("ts")).as("day"))
    .agg(count(lit(1)).as("cnt"))
    .as[DayCount]

  test("streaming EWMA across two micro-batches equals the batch folds") {
    implicit val sqlCtx = spark.sqlContext
    val rows = dailyCounts.collect().sortBy(r => (r.user_id, r.day.getTime))
    // chronological split: earlier days arrive in batch 1, later in
    // batch 2 (the caller contract for cross-batch order)
    val cut = rows.map(_.day.getTime).sorted.apply(rows.length / 2)
    val (b1, b2) = rows.partition(_.day.getTime <= cut)
    val mem = MemoryStream[DayCount]
    val q = EwmaStream.detectStream(mem.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("update").start()
    try {
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    // final state per user = the update with the largest n_days
    // (strictly increasing per user — no reliance on sink row order)
    val streamed = spark.table("ewma_out")
      .groupBy("user_id")
      .agg(max_by(
        struct(col("n_days"), col("ewma_final"), col("spike_days")),
        col("n_days")).as("r"))
      .select(col("user_id"), col("r.n_days"), col("r.ewma_final"),
        col("r.spike_days"))
      .as[(Long, Int, Double, Int)].collect().toSet

    val typedBatch = EwmaStream.detectBatch(dailyCounts)
      .select("user_id", "n_days", "ewma_final", "spike_days")
      .as[(Long, Int, Double, Int)].collect().toSet
    assert(streamed == typedBatch, "stream must equal the typed batch fold")

    // and both must match the SQL-expression form behind q106
    val sqlForm = ScaleOps.q106EwmaSpikes(spark, sfDir)
      .select("user_id", "n_days", "ewma_final", "spike_days")
      .as[(Long, Int, Double, Int)].collect().toSet
    assert(typedBatch == sqlForm, "typed fold must equal the SQL expression fold")
  }

  test("out-of-order rows are dropped and flagged, never folded in the wrong order") {
    implicit val sqlCtx = spark.sqlContext
    def dc(d: String, c: Long) = DayCount(1L, java.sql.Date.valueOf(d), c)
    val mem = MemoryStream[DayCount]
    val q = EwmaStream.detectStream(mem.toDS())
      .writeStream.format("memory").queryName("ewma_ooo")
      .outputMode("update").start()
    try {
      mem.addData(Seq(dc("2026-01-02", 4), dc("2026-01-03", 8)))
      q.processAllAvailable()
      // an earlier day AND a same-day replay: both must be dropped
      mem.addData(Seq(dc("2026-01-01", 100), dc("2026-01-03", 9)))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("ewma_ooo")
      .orderBy(col("late_days").desc).limit(1)
      .select("n_days", "ewma_final", "spike_days", "late_days")
      .as[(Int, Double, Int, Int)].collect().head
    // state = the in-order fold only: e = ((0+4)/2 + 8)/2 = 5.0, one
    // spike (8 > 2*2), 2 days folded, 2 late rows flagged
    assert(last == ((2, 5.0, 1, 2)))
  }
}
