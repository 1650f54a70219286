package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.events(spark, sfDir)
    .select(col("event_id"), col("user_id"), col("ts"), col("value"))

  /** The oracle-checked two-window formulation (q34 semantics). */
  private def windowed = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000, 1L).otherwise(0L))
      .withColumn("session_seq", sum("is_new").over(run))
      .select("event_id", "session_seq")
  }

  test("custom Sessionize operator matches the window formulation row-for-row") {
    val native = SessionizeOp.sessionize(events, "user_id", "ts", gapSeconds = 1800)
      .select("event_id", "session_seq")
    val nRows = native.as[(Long, Long)].collect()
    val wRows = windowed.as[(Long, Long)].collect()
    // event_id must be unique or the map comparison could mask rows
    assert(nRows.map(_._1).distinct.length === nRows.length)
    assert(nRows.length === wRows.length)
    assert(nRows.toMap === wRows.toMap)
  }

  test("physical plan shows SessionizeExec with a single exchange") {
    val native = SessionizeOp.sessionize(events, "user_id", "ts", gapSeconds = 1800)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("Sessionize "), s"plan:\n${plan.take(1500)}")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1)
  }

  test("sessionize result is partition-count independent") {
    val a = SessionizeOp.sessionize(events.repartition(1), "user_id", "ts", 1800)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    val b = SessionizeOp.sessionize(events.repartition(13), "user_id", "ts", 1800)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}
