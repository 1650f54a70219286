package graft

import org.apache.spark.sql.SaveMode

/** The sizing-count memo (round-10 verdict item 1): every gram-family
  * query and the auto-ANN family paid an eager count() Spark job per
  * composition; Tables.rowCount amortizes that to one job per
  * (dir, table, file-stamp) per JVM. The memo must (a) return the
  * true count, (b) serve repeats without touching Spark's job
  * counter, and (c) MISS when the files under the same path change —
  * a stale bound from a regenerated dir could under-size a partition
  * gate, the exact spill the sizing exists to prevent. */
class RowCountMemoSpec extends SparkSpec {
  import spark.implicits._

  test("rowCount memoizes per (dir, stamp) and invalidates on file change") {
    val dir = java.nio.file.Files.createTempDirectory("rowcount").toString
    (1 to 100).toDF("v").write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")

    assert(Tables.rowCount(spark, dir, "documents") === 100L)
    assert(Tables.documentCount(spark, dir) === 100L)

    // repeat: served from the memo, no Spark job scheduled
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(Tables.documentCount(spark, dir) === 100L)
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(jobsAfter === jobsBefore,
      "a memo hit must not schedule a Spark job")

    // regenerate the same dir (different rows, different file stamp):
    // the memo must miss and re-count, never serve the stale bound
    Thread.sleep(5) // ensure a distinct mtime even on coarse clocks
    (1 to 37).toDF("v").repartition(2).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/documents.parquet")
    assert(Tables.documentCount(spark, dir) === 37L,
      "regenerated files under the same path must invalidate the memo")
  }
}
