package graft.sources

import graft.SparkSpec
import graft.telecom.Gold
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SeedsSpec extends SparkSpec {
  import spark.implicits._

  private val towerSchema = StructType(Seq(
    StructField("tower_id", StringType, nullable = false),
    StructField("tower_name", StringType),
    StructField("region", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("capacity_gbps", DoubleType),
    StructField("technology", StringType)))

  private def seedPath = getClass.getResource("/towers_seed.csv").getPath

  test("CSV seed loads with explicit schema (S9) and feeds dim_towers") {
    val towers = Seeds.loadCsv(spark, seedPath, towerSchema)
    assert(towers.count() === 4)
    assert(towers.schema("latitude").dataType === DoubleType)
    val dim = Gold.dimTowers(towers)
    val tiers = dim.select("tower_id", "capacity_tier")
      .as[(String, String)].collect().toMap
    assert(tiers("TWR000") === "STANDARD")
    assert(tiers("TWR001") === "MEDIUM")
    assert(tiers("TWR002") === "HIGH")
    // surrogate keys are dbt-macro parity (md5 of id)
    val key = dim.filter(col("tower_id") === "TWR000")
      .select("tower_key").as[String].head()
    assert(key === org.apache.commons.codec.digest.DigestUtils.md5Hex("TWR000"))
  }
}
