package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

class JsonLinesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("doc_id", "long").add("lang", "string").add("text", "string")

  private def docs = Seq(
    (1L, "en", "alpha beta"),
    (2L, "de", "gamma"),
    (3L, "fr", "delta epsilon zeta")).toDF("doc_id", "lang", "text")

  test("sink -> strict source round-trips rows exactly") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    JsonLines.write(docs, s"$dir/out")
    val back = JsonLines.read(spark, s"$dir/out", schema)
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(back.toSeq === docs.as[(Long, String, String)].collect().sortBy(_._1).toSeq)
  }

  test("quarantining source splits corrupt lines from parsed rows losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val lines = JsonLines.toLines(docs)
      .unionAll(Seq("{broken", "plain text").toDS().toDF("line"))
    lines.write.mode("overwrite").text(s"$dir/mixed")
    val parsed = JsonLines.readQuarantined(spark, s"$dir/mixed", schema)
    val kept = parsed.filter(col(JsonLines.CorruptCol).isNull)
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(kept.toSeq === docs.as[(Long, String, String)].collect().sortBy(_._1).toSeq)
    val quarantined = parsed.filter(col(JsonLines.CorruptCol).isNotNull)
      .select(col("doc_id"), col(JsonLines.CorruptCol))
      .collect()
    assert(quarantined.length === 2)
    assert(quarantined.forall(_.isNullAt(0))) // nothing parsed leaks into the lane
    assert(quarantined.map(_.getString(1)).sorted === Array("plain text", "{broken"))
  }

  test("quarantine must key on the corrupt marker ALONE: JSON filter pushdown " +
    "evaluates data-column predicates against partial parses") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    JsonLines.toLines(docs)
      .unionAll(Seq("{\"doc_id\": 99, \"lang\":", "not json at all")
        .toDS().toDF("line"))
      .write.mode("overwrite").text(s"$dir/partial")
    val parsed = JsonLines.readQuarantined(spark, s"$dir/partial", schema)
    // marker-only laning (the q244 shape) sees both corrupt lines
    val lanes = parsed
      .groupBy(when(col(JsonLines.CorruptCol).isNotNull, lit("_corrupt"))
        .otherwise(col("lang")).as("lane"))
      .count().as[(String, Long)].collect().toMap
    assert(lanes("_corrupt") === 2L)
    assert(lanes.filter(_._1 != "_corrupt").values.sum === docs.count())
    // the hazard this spec exists to pin: conjoining a data-column
    // predicate (doc_id IS NULL "because corrupt rows are all-null")
    // SILENTLY LOSES the truncated line — filter pushdown
    // (spark.sql.json.filterPushdown.enabled, default true) evaluates
    // doc_id=99 from the partial parse and skips the row before the
    // corrupt marker is ever set
    val conjoined = parsed
      .filter(col(JsonLines.CorruptCol).isNotNull && col("doc_id").isNull)
      .select(col("doc_id"), col(JsonLines.CorruptCol)).collect()
    assert(conjoined.length === 1) // "not json at all" only — 99 is gone
  }

  test("strict source fails loudly on a corrupt line (FAILFAST contract)") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    JsonLines.toLines(docs).unionAll(Seq("{broken").toDS().toDF("line"))
      .write.mode("overwrite").text(s"$dir/bad")
    intercept[Exception] {
      JsonLines.read(spark, s"$dir/bad", schema).collect()
    }
  }
}
