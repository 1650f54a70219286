package graft.queries

import graft.Tables
import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for LLM training-data pipelines:
  * token-budget shard packing, train/test contamination detection,
  * PII scrubbing, repetition metrics. All oracle-checked.
  */
object CurationOps {

  type Q = (SparkSession, String) => DataFrame

  /** Sequential token-budget packing: assign documents (in stable
    * doc_id order) to training shards of ~2000 tokens via a running
    * cumulative sum. One global-ordered window over doc-level rows —
    * at corpus scale this runs per-partition-range with a manifest
    * (docs are pre-bucketed); here the doc table is manifest-sized. */
  def q59TokenPacking(s: SparkSession, dir: String): DataFrame = {
    val budget = 2000L
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).cast("bigint").as("token_count"))
      .withColumn("cum_tokens", sum(col("token_count")).over(w))
      .withColumn("shard_id",
        floor((col("cum_tokens") - col("token_count")) / budget).cast("bigint"))
      .orderBy("doc_id")
  }

  /** Train/test contamination: flag training documents whose unigram
    * Jaccard against ANY held-out doc (doc_id % 20 = 0) exceeds 0.9,
    * or whose canonical fingerprint matches exactly. The held-out set
    * is broadcast; the train side never shuffles. */
  def q63Contamination(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"),
        array_distinct(TextAnalysis.tokens(col("text"))).as("toks"))
    val test = d.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("test_doc_id"), col("fp").as("test_fp"),
        col("toks").as("test_toks"))
    val train = d.filter(col("doc_id") % 20 =!= 0)
    val scored = train.crossJoin(broadcast(test))
      .withColumn("inter", size(array_intersect(col("toks"), col("test_toks"))))
      .withColumn("jac",
        (col("inter").cast("double") /
          (size(col("toks")) + size(col("test_toks")) - col("inter"))).cast("double"))
      .withColumn("exact", col("fp") === col("test_fp"))
    scored.groupBy(col("doc_id"))
      .agg(
        max(col("jac")).as("max_test_jaccard"),
        max(when(col("exact"), 1L).otherwise(0L)).as("has_exact_match"))
      .withColumn("is_contaminated",
        col("has_exact_match") === 1 || col("max_test_jaccard") >= 0.9)
      .orderBy("doc_id")
  }

  /** PII scrubbing: mask emails and phone-shaped tokens in one pass
    * of codegen'd regexp_replace (PII synthesized deterministically
    * onto the docs so the scrubber has real targets). */
  def q64PiiScrub(s: SparkSession, dir: String): DataFrame = {
    val withPii = Tables.documents(s, dir)
      .withColumn("dirty",
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or +1-555-000"), col("doc_id"), lit(" now")))
    val scrubbed = regexp_replace(
      regexp_replace(col("dirty"), "[A-Za-z0-9._]+@[A-Za-z0-9.]+", "<EMAIL>"),
      "\\+[0-9][0-9-]{6,}", "<PHONE>")
    withPii.select(
        col("doc_id"),
        length(col("dirty")).as("dirty_len"),
        scrubbed.as("scrubbed"))
      .withColumn("scrubbed_len", length(col("scrubbed")))
      .withColumn("has_residual_email", col("scrubbed").rlike("@"))
      .select("doc_id", "dirty_len", "scrubbed_len", "has_residual_email", "scrubbed")
      .orderBy("doc_id")
  }

  /** Repetition metrics: distinct-token ratio and dominant token
    * share — the cheap repetitive-document filter. */
  def q65Repetition(s: SparkSession, dir: String): DataFrame = {
    val terms = Tables.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_toks"))
      .select(col("doc_id"), size(col("_toks")).cast("bigint").as("total_tokens"),
        explode(col("_toks")).as("term"))
    val tf = terms.groupBy("doc_id", "total_tokens", "term")
      .agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("doc_id").orderBy(col("tf").desc, col("term").asc)
    tf.withColumn("rank", row_number().over(w))
      .withColumn("distinct_tokens", count(lit(1)).over(Window.partitionBy("doc_id")))
      .filter(col("rank") === 1)
      .select(
        col("doc_id"), col("total_tokens"),
        col("distinct_tokens").cast("bigint").as("distinct_tokens"),
        (col("distinct_tokens").cast("double") / col("total_tokens")).cast("double")
          .as("distinct_ratio"),
        col("term").as("top_token"), col("tf").as("top_token_count"),
        (col("tf").cast("double") / col("total_tokens")).cast("double")
          .as("top_token_share"))
      .withColumn("is_repetitive",
        col("distinct_ratio") < 0.3 || col("top_token_share") > 0.2)
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q59_token_packing" -> q59TokenPacking _,
    "q63_contamination" -> q63Contamination _,
    "q64_pii_scrub" -> q64PiiScrub _,
    "q65_repetition" -> q65Repetition _,
  )

  private val tokensSql = "regexp_split_to_array(lower(trim(text)), ' +')"

  val oracles: Map[String, String] = Map(
    "q59_token_packing" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len($tokensSql) AS BIGINT) AS token_count
         |  FROM documents)
         |SELECT doc_id, token_count,
         |  CAST(SUM(token_count) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
         |  CAST(floor((SUM(token_count) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - token_count) / 2000)
         |    AS BIGINT) AS shard_id
         |FROM t ORDER BY doc_id""".stripMargin,
    "q63_contamination" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         |    list_distinct($tokensSql) AS toks
         |  FROM documents),
         |test AS (SELECT doc_id AS test_doc_id, fp AS test_fp, toks AS test_toks
         |         FROM d WHERE doc_id % 20 = 0),
         |train AS (SELECT * FROM d WHERE doc_id % 20 != 0),
         |scored AS (
         |  SELECT t.doc_id,
         |    CAST(len(list_filter(t.toks, x -> list_contains(s.test_toks, x))) AS DOUBLE)
         |      / (len(t.toks) + len(s.test_toks)
         |         - len(list_filter(t.toks, x -> list_contains(s.test_toks, x)))) AS jac,
         |    t.fp = s.test_fp AS exact
         |  FROM train t CROSS JOIN test s)
         |SELECT doc_id,
         |  MAX(jac) AS max_test_jaccard,
         |  CAST(MAX(CASE WHEN exact THEN 1 ELSE 0 END) AS BIGINT) AS has_exact_match,
         |  (MAX(CASE WHEN exact THEN 1 ELSE 0 END) = 1 OR MAX(jac) >= 0.9)
         |    AS is_contaminated
         |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q64_pii_scrub" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or +1-555-000'
        |      || doc_id || ' now' AS dirty
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CAST(length(dirty) AS INTEGER) AS dirty_len,
        |    regexp_replace(
        |      regexp_replace(dirty, '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
        |      '\+[0-9][0-9-]{6,}', '<PHONE>', 'g') AS scrubbed
        |  FROM w)
        |SELECT doc_id, dirty_len,
        |  CAST(length(scrubbed) AS INTEGER) AS scrubbed_len,
        |  regexp_matches(scrubbed, '@') AS has_residual_email,
        |  scrubbed
        |FROM s ORDER BY doc_id""".stripMargin,
    "q65_repetition" ->
      s"""WITH terms AS (
         |  SELECT doc_id, CAST(len($tokensSql) AS BIGINT) AS total_tokens,
         |    unnest($tokensSql) AS term
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, total_tokens, term, COUNT(*) AS tf
         |  FROM terms GROUP BY 1, 2, 3),
         |ranked AS (
         |  SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tf DESC, term ASC) AS rank,
         |    CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS distinct_tokens
         |  FROM tf)
         |SELECT doc_id, total_tokens, distinct_tokens,
         |  CAST(CAST(distinct_tokens AS DOUBLE) / total_tokens AS DOUBLE) AS distinct_ratio,
         |  term AS top_token, tf AS top_token_count,
         |  CAST(CAST(tf AS DOUBLE) / total_tokens AS DOUBLE) AS top_token_share,
         |  (CAST(distinct_tokens AS DOUBLE) / total_tokens < 0.3
         |   OR CAST(tf AS DOUBLE) / total_tokens > 0.2) AS is_repetitive
         |FROM ranked WHERE rank = 1 ORDER BY doc_id""".stripMargin,
  )
}
