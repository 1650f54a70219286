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
    q.GraphOps.queries,
    q.MixOps.queries,
    q.CorpusStats.queries,
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
    q.GraphOps.oracles,
    q.MixOps.oracles,
    q.CorpusStats.oracles,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Relational.q03StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // a duplicate name across modules would silently SHADOW one query
    // in the ++ fold — the driver would verify the survivor twice and
    // the shadowed query never; fail loudly instead
    val names = queryModules.flatMap(_.keys)
    val dups = names.diff(names.distinct).distinct
    require(dups.isEmpty, s"duplicate query names across modules: $dups")
    queryModules.reduce(_ ++ _)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    val names = oracleModules.flatMap(_.keys)
    val dups = names.diff(names.distinct).distinct
    require(dups.isEmpty, s"duplicate oracle names across modules: $dups")
    val merged = oracleModules.reduce(_ ++ _)
    // an oracle keyed to a name with no registered query is dead SQL
    // the driver would never run — almost certainly a typo'd rename
    val orphans = merged.keySet -- queries.keySet
    require(orphans.isEmpty, s"oracles without a registered query: $orphans")
    merged
  }
}
