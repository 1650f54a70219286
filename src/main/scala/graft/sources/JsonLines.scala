package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSON-lines corpus source/sink — the interchange format LLM
  * training corpora actually ship in (one JSON object per line;
  * Dolma, RedPajama, FineWeb releases are all JSONL shards). The
  * reference's bronze layer lands Kafka JSON payloads the same way
  * (kafka_to_bronze.py:90-128 parses value JSON against an explicit
  * schema); this is that contract as a batch source.
  *
  * Contracts, both non-negotiable at 100 TB:
  *   - Schemas are EXPLICIT. Inference reads the whole input once
  *     before the real scan (2× the I/O bill) and silently changes
  *     type when a value pattern drifts — the nondeterminism class
  *     the reference's dbt contracts exist to prevent.
  *   - Corrupt lines are DATA, not exceptions. A 100 TB crawl dump
  *     always contains malformed lines; the P2 quarantine idiom
  *     (route, count, alert — never drop silently, never abort the
  *     job) applies at the parse edge exactly as it does in silver.
  *     `readQuarantined` surfaces them in a corrupt-record column;
  *     `read` (FAILFAST) is for curated inputs where a bad line
  *     means a broken producer.
  *
  * Scale shape: Spark's JSON reader is splittable on newline-delimited
  * input, so a shard directory parallelizes by file AND by block;
  * parsing is one codegen'd projection — no shuffle.
  */
object JsonLines {

  /** The quarantine column readQuarantined appends. */
  val CorruptCol = "_corrupt"

  /** Strict loader: declared schema, corrupt line = loud failure. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "FAILFAST")
      .schema(schema)
      .json(path)

  /** Quarantining loader: corrupt lines survive as rows with the
    * raw line in [[CorruptCol]] and nulls elsewhere — the caller
    * splits kept/quarantined exactly like silver's P2 filter. */
  def readQuarantined(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(CorruptCol, StringType, nullable = true))
      .json(path)

  /** JSONL sink (one object per line, field order = column order). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Round-trip helper for specs and fixtures: render rows to JSONL
    * strings without touching disk (to_json of the full struct). */
  def toLines(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("line"))
}
