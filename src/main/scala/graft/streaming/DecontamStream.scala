package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming decontamination flag: the eval-holdout 5-gram bloom
  * filter (q239's `graft_bloom_agg` image) probed at the ingest
  * edge. A document is flagged `maybe_contaminated` iff ANY of its
  * distinct 5-grams hits the filter — bloom construction makes false
  * negatives impossible, so the unflagged stream is CLEAN BY PROOF
  * and only the flagged slice (contamination rate + FP budget) needs
  * the exact batch confirm (q209/q241). That quarantine-then-confirm
  * split is the production architecture: the stream side is a
  * stateless scan-speed fold (the bloom bytes ride in the closure as
  * a literal, zero joins, zero state), and the expensive exact
  * semi-join runs in batch over a tiny suspect set instead of the
  * full firehose. */
object DecontamStream {

  /** Distinct word 5-grams of a text column — the LITERAL q209 gram
    * builder (kept in one place so stream and batch cannot drift). */
  def fiveGrams(text: Column): Column = {
    val toks = filter(split(lower(trim(text)), " +"), t => t =!= "")
    when(size(toks) >= 5,
      array_distinct(transform(sequence(lit(1), size(toks) - 4),
        i => concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2), element_at(toks, i + 3),
          element_at(toks, i + 4)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Annotate a document stream (doc_id, text, ...) with
    * `maybe_contaminated` — identical semantics on a streaming or
    * batch frame. `bloomBytes` is the serialized eval-gram filter
    * (built once in batch via `graft_bloom_agg`, redistributed on
    * retrain like any broadcast model). */
  def flag(docs: DataFrame, bloomBytes: Array[Byte]): DataFrame =
    docs.withColumn("maybe_contaminated",
      exists(fiveGrams(col("text")),
        g => call_function("graft_might_contain", lit(bloomBytes),
          xxhash64(g))))

  /** The stream split: (clean, quarantined). Clean needs no further
    * checking — bloom false negatives cannot exist; quarantined goes
    * to the exact batch confirm. */
  def gate(docs: DataFrame, bloomBytes: Array[Byte])
      : (DataFrame, DataFrame) = {
    val flagged = flag(docs, bloomBytes)
    (flagged.filter(!col("maybe_contaminated")),
      flagged.filter(col("maybe_contaminated")))
  }
}
