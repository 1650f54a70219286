package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory is grouped by module under [[graft.queries]]; this
  * object only aggregates the maps. Every query takes (spark, sfDir)
  * and reads the driver's parquet tables (TESTDATA.md).
  */
object SparkEntry {

  private def queryModules: Seq[Map[String, (SparkSession, String) => DataFrame]] = Seq(
    q.Relational.queries,
    q.Temporal.queries,
    q.Scalar.queries,
    q.Quality.queries,
    q.TextOps.queries,
    q.DedupOps.queries,
    q.SimilarityOps.queries,
    q.TelecomOps.queries,
    q.MultimodalOps.queries,
    q.Extended.queries,
    q.CurationOps.queries,
    q.Breadth.queries,
    q.ScaleOps.queries,
  )
  private def oracleModules: Seq[Map[String, String]] = Seq(
    q.Relational.oracles,
    q.Temporal.oracles,
    q.Scalar.oracles,
    q.Quality.oracles,
    q.TextOps.oracles,
    q.DedupOps.oracles,
    q.SimilarityOps.oracles,
    q.TelecomOps.oracles,
    q.MultimodalOps.oracles,
    q.Extended.oracles,
    q.CurationOps.oracles,
    q.Breadth.oracles,
    q.ScaleOps.oracles,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Relational.q03StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queryModules.reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    oracleModules.reduce(_ ++ _)
}
