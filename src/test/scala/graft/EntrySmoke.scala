package graft
import org.apache.spark.sql.SparkSession
/** Simulates the driver's smoke: a BARE session (no graft configs),
  * then SparkEntry.entry(spark) must return rows. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    assert(n > 0)
    spark.stop()
  }
}
