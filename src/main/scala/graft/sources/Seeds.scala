package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Seed-file sources (SURVEY.md S9: dbt seed CSV → table, reference
  * dbt_project/seeds/towers_seed.csv).
  *
  * Schemas are always EXPLICIT — inference is banned on production
  * paths (SURVEY.md §1.3): an inferred seed schema silently changes
  * when a value pattern changes, which is exactly the class of
  * nondeterminism the reference's dbt contracts exist to prevent.
  */
object Seeds {

  /** Headered CSV with a declared schema (no inference). */
  def loadCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "FAILFAST") // corrupt seed rows fail loudly
      .schema(schema)
      .csv(path)

  /** JSON-lines with a declared schema (bronze replays, fixtures). */
  def loadJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
