package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training on Spark (Sennrich, Haddow &
  * Birch, "Neural Machine Translation of Rare Words with Subword
  * Units", ACL 2016) — the vocabulary-learning half of a BPE
  * tokenizer, run as an iterative sequence of distributed jobs.
  *
  * Per round: (1) a distributed pair count — every adjacent symbol
  * pair across the word-frequency table, weighted by word count,
  * one shuffled aggregate; (2) a BOUNDED driver collect of exactly
  * ONE row (the argmax pair, ties broken lexicographically — the
  * same collect-a-bounded-model pattern as SemanticDedup's Lloyd
  * centroids); (3) a lazy column rewrite applying the merge to every
  * word. Nothing data-sized ever reaches the driver, and the
  * per-round shuffle carries (distinct adjacent pair) keys — vocab²
  * at worst, independent of corpus row count, because the pair count
  * runs over the word-FREQUENCY table, not the token stream. That is
  * the property that holds at 100 TB: the corpus is scanned once to
  * build word frequencies; all `rounds` iterations run over the
  * (small, persisted) vocabulary.
  *
  * Symbol-sequence representation: each symbol is wrapped as
  * `" x "`, so a word is `" h  e  y "` (double spaces BETWEEN
  * symbols, every symbol owning its own delimiters). A merge of
  * (s1, s2) is then the plain non-overlapping left-to-right
  * `replace(" s1  s2 " -> " s1s2 ")` — and because each occurrence
  * carries its own boundary spaces, consecutive overlapping runs
  * merge exactly like the reference fold: `a a a a -> aa aa`, NOT
  * the single-space encoding's under-merged `aa a a` (the shared-
  * delimiter bug; caught against DuckDB before it shipped). The
  * same rewrite in any SQL engine reproduces the grid bit-exactly,
  * which is what makes the merge table oracle-checkable.
  */
object Bpe {

  /** One learned merge: `s1 + s2 -> merged`, with the pair's
    * occurrence-weighted count at selection time. */
  final case class Merge(round: Int, s1: String, s2: String, merged: String,
      pair_count: Long)

  /** Wrap every character of `tok` as an " x " symbol (initial BPE
    * state). Column-level so it composes into the word-freq scan. */
  def initialSymbols(tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(tok, "(.)", " $1 ")

  /** Learn `rounds` merges from a word-frequency table
    * (columns: sym — the " a  b " symbol string; cnt — word count).
    * Stops early if no pair remains. `words` should be persisted by
    * the caller if the input lineage is expensive. */
  def trainMerges(words: DataFrame, rounds: Int): Seq[Merge] = {
    var cur = words
    val out = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val l = split(trim(col("sym")), "  ")
      val top = cur
        .select(col("cnt"), l.as("l"))
        .select(col("cnt"), explode(arrays_zip(
          slice(col("l"), lit(1), size(col("l")) - 1).as("s1"),
          slice(col("l"), lit(2), size(col("l")) - 1).as("s2"))).as("z"))
        .groupBy(col("z.s1").as("s1"), col("z.s2").as("s2"))
        .agg(sum("cnt").as("pc"))
        .orderBy(desc("pc"), col("s1"), col("s2"))
        .limit(1)
        .collect()
      top.headOption match {
        case Some(Row(s1: String, s2: String, pc: Long)) =>
          out += Merge(r, s1, s2, s1 + s2, pc)
          cur = cur.withColumn("sym",
            replace(col("sym"), lit(s" $s1  $s2 "), lit(s" $s1$s2 ")))
          r += 1
        case _ => exhausted = true
      }
    }
    out.result()
  }

  /** Merge table as a DataFrame (the query-shaped surface). */
  def mergesDf(s: SparkSession, merges: Seq[Merge]): DataFrame = {
    import s.implicits._
    merges.toDF("round", "s1", "s2", "merged", "pair_count")
  }

  /** Apply learned merges in training order to a word table's `sym`
    * column (the ENCODE half of BPE: the merge list is the trained
    * model, applied as a chain of literal rewrites — each one a
    * codegen'd StringReplace, so encoding runs at scan speed over any
    * corpus size). */
  def applyMerges(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(words) { (df, m) =>
      df.withColumn("sym",
        replace(col("sym"), lit(s" ${m.s1}  ${m.s2} "), lit(s" ${m.merged} ")))
    }
}
