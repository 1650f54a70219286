package graft

import org.apache.spark.sql.functions._

class TaskMetricsProfilerSpec extends SparkSpec {

  test("captures shuffle + input bytes for a profiled window; reset re-arms") {
    val p = TaskMetricsProfiler.install(spark)

    // a groupBy over a parquet scan must report both input and
    // shuffle bytes (an exchange is in the plan by construction)
    p.reset()
    Tables.documents(spark, sfDir)
      .groupBy(col("lang")).agg(count(lit(1))).count()
    val s1 = p.snapshot(spark)
    assert(s1.tasks > 0)
    assert(s1.inputBytes > 0, "parquet scan bytes missing")
    assert(s1.shuffleWriteBytes > 0, "exchange bytes missing")
    assert(s1.shuffleReadBytes > 0)
    assert(s1.diskSpillBytes === 0L, "tiny aggregate must not spill")

    // reset: a fresh window sees none of the prior run's tasks
    p.reset()
    assert(p.snapshot(spark).tasks === 0L)

    // a scan-only plan (no exchange anywhere — count() itself would
    // add a 1-partition exchange for the final count) reports zero
    // shuffle: the property ScaleSweep's e_shuffle=null guard relies on
    p.reset()
    Tables.documents(spark, sfDir).filter(col("n_chars") > 0)
      .foreach(_ => ())
    val s2 = p.snapshot(spark)
    assert(s2.inputBytes > 0)
    assert(s2.shuffleWriteBytes === 0L,
      s"scan-only plan shuffled: ${s2.json}")

    // determinism: the same plan twice moves the same bytes — the
    // property that makes byte exponents a noise-free scale signal
    p.reset()
    Tables.documents(spark, sfDir)
      .groupBy(col("lang")).agg(count(lit(1))).count()
    val s3 = p.snapshot(spark)
    assert(s3.shuffleWriteBytes === s1.shuffleWriteBytes)
  }
}
