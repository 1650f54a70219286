package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Curation must be idempotent: running the q105 pipeline on its own
  * output is a no-op — no exact or near dups remain, every survivor
  * already clears the quality gate, and no source exceeds its quota,
  * so pass 2 keeps exactly pass 1's documents (and, since the kept
  * set is identical, assigns identical shards). The reference leans
  * on the same property for its incremental reruns (ST5). */
class CurationIdempotenceSpec extends SparkSpec {
  import spark.implicits._

  test("curate(curate(docs)) keeps exactly curate(docs)") {
    val once = ScaleOps.curate(Tables.documents(spark, sfDir))
    val onceRows = once
      .select("doc_id", "source", "lang", "quality", "token_count", "shard_id")
      .as[(Long, String, String, Double, Long, Long)].collect().toSet
    // curate's output is text-free by design; re-attach text by id
    val curatedDocs = once.select("doc_id", "source", "lang")
      .join(Tables.documents(spark, sfDir).select("doc_id", "text"), "doc_id")
    val twiceRows = ScaleOps.curate(curatedDocs)
      .select("doc_id", "source", "lang", "quality", "token_count", "shard_id")
      .as[(Long, String, String, Double, Long, Long)].collect().toSet
    assert(twiceRows == onceRows,
      s"second pass changed the corpus: +${(twiceRows -- onceRows).size} " +
        s"-${(onceRows -- twiceRows).size} rows")
    assert(onceRows.nonEmpty)
  }
}
