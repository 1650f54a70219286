package graft.operators

import graft.SparkSpec
import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff labels insert/delete/update with before/after values") {
    val before = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
      .toDF("id", "x", "v")
    val after = Seq((2, "b", 25.0), (3, "c", 30.0), (4, "d", 40.0))
      .toDF("id", "x", "v")
    val diff = Cdc.snapshotDiff(before, after, Seq("id"))
      .select("id", "op", "v_before", "v_after")
      .as[(Int, String, Option[Double], Option[Double])].collect().toSet
    assert(diff === Set(
      (1, "delete", Some(10.0), None),
      (2, "update", Some(20.0), Some(25.0)),
      (4, "insert", None, Some(40.0))))
  }

  test("null-safe change detection: null -> value and value -> null are updates, null -> null is not") {
    val before = Seq((1, Option.empty[String]), (2, Some("x")), (3, Option.empty[String]))
      .toDF("id", "v")
    val after = Seq((1, Some("now")), (2, Option.empty[String]), (3, Option.empty[String]))
      .toDF("id", "v")
    val ops = Cdc.snapshotDiff(before, after, Seq("id"), keepUnchanged = true)
      .select("id", "op").as[(Int, String)].collect().toMap
    assert(ops === Map(1 -> "update", 2 -> "update", 3 -> "unchanged"))
  }

  test("null keys match null-safely: an unchanged null-key row is not a delete+insert") {
    val before = Seq((Option(1), 10.0), (Option.empty[Int], 20.0)).toDF("id", "v")
    val after = Seq((Option(1), 10.0), (Option.empty[Int], 25.0)).toDF("id", "v")
    val diff = Cdc.snapshotDiff(before, after, Seq("id"), keepUnchanged = true)
      .select("id", "op").as[(Option[Int], String)].collect().toSet
    assert(diff === Set((Some(1), "unchanged"), (None, "update")))
  }

  test("property: applying the diff to BEFORE reconstructs AFTER exactly") {
    // deterministic pseudo-random versions: overlapping key ranges,
    // value changes on a hash-selected subset
    val before = spark.range(0, 500)
      .select(col("id"), (col("id") % 97).as("v"), md5(col("id").cast("string")).as("x"))
      .filter(col("id") % 7 =!= 0)
    val after = spark.range(0, 520)
      .select(col("id"),
        when(col("id") % 3 === 0, col("id") % 89).otherwise(col("id") % 97).as("v"),
        md5(col("id").cast("string")).as("x"))
      .filter(col("id") % 5 =!= 0)
    val diff = Cdc.snapshotDiff(before, after, Seq("id")).cache()
    val deletesAndUpdates = diff
      .filter(col("op").isin("delete", "update")).select("id")
    val insertsAndUpdates = diff
      .filter(col("op").isin("insert", "update"))
      .select(col("id"), col("v_after").as("v"), col("x_after").as("x"))
    val reconstructed = before
      .join(deletesAndUpdates, Seq("id"), "left_anti")
      .unionByName(insertsAndUpdates)
    assert(reconstructed.exceptAll(after).isEmpty &&
      after.exceptAll(reconstructed).isEmpty)
    diff.unpersist()
  }

  test("snapshotDiff rejects missing keys, reserved 'op', and type mismatches loudly") {
    val ok = Seq((1, "a")).toDF("id", "v")
    // key column absent from `after`: a clear require, not an opaque
    // unresolved-column analysis error
    val noKey = Seq(("a", 1)).toDF("v", "other")
    val e1 = intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(ok, noKey, Seq("id"))
    }
    assert(e1.getMessage.contains("key columns"))
    // a column literally named `op` would collide with the label column
    val withOp = Seq((1, "a", "x")).toDF("id", "v", "op")
    val e2 = intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(withOp, withOp, Seq("id"))
    }
    assert(e2.getMessage.contains("op"))
    // per-column type mismatch between sides
    val typed = Seq((1, 2.5)).toDF("id", "v")
    val e3 = intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(ok, typed, Seq("id"))
    }
    assert(e3.getMessage.contains("types differ"))
  }

  test("diffing two SnapshotTable versions yields the committed change set") {
    val path = java.nio.file.Files.createTempDirectory("cdc").toString + "/t"
    SnapshotTable.commit(spark, Seq((1, "a"), (2, "b")).toDF("id", "x"), path, nowMs = 1000)
    SnapshotTable.commit(spark, Seq((2, "b2"), (3, "c")).toDF("id", "x"), path, nowMs = 2000)
    val diff = Cdc.snapshotDiff(
        SnapshotTable.readVersion(spark, path, 1),
        SnapshotTable.readVersion(spark, path, 2), Seq("id"))
      .select("id", "op").as[(Int, String)].collect().toSet
    assert(diff === Set((1, "delete"), (2, "update"), (3, "insert")))
  }
}
