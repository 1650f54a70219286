package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The gated two-sided exchange-sizing helper behind the round-10
  * gram-join sweep: the gate must be IDENTITY below the session
  * default (small-scale plans stay byte-identical — the measured
  * +5.3 MB cost of an unconditional repartition), engage above it
  * with co-partitioned children, and orderedSizer's sized branch must
  * produce the identical total order orderBy does. */
class ExplodedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("parts: ~8M rows per partition, floor 1, ceiling 4096") {
    assert(ExplodedJoin.parts(0L) === 1)
    assert(ExplodedJoin.parts(7999999L) === 1)
    assert(ExplodedJoin.parts(8000000L) === 2)
    assert(ExplodedJoin.parts(230000000L) === 29) // the sf100 gram frame
    assert(ExplodedJoin.parts(Long.MaxValue / 4) === 4096)
    // monotone in the estimate: overestimating only shrinks partitions
    val ps = Seq(1L, 8000000L, 80000000L, 800000000L).map(ExplodedJoin.parts(_))
    assert(ps === ps.sorted)
    // a caller whose Long product overflowed negative must degrade to
    // the closed gate (1 partition <= any session default), never to
    // a negative count repartition would throw on (round-10 advice)
    assert(ExplodedJoin.parts(-1L) === 1)
    assert(ExplodedJoin.parts(Long.MinValue) === 1)
    // and a saturated estimate opens the gate at the ceiling
    assert(ExplodedJoin.parts(Long.MaxValue) === 4096)
  }

  test("sizer is identity below the session gate, sized partitioning above it") {
    val df = (1 to 1000).map(i => (i.toLong, s"g${i % 97}")).toDF("id", "gram")
    // below: estimate -> 1 partition <= session default (4) -> same plan
    val below = ExplodedJoin.sizer(spark, 1000L, col("gram"))(df)
    assert(below.queryExecution.analyzed === df.queryExecution.analyzed,
      "gate must be identity (not even a no-op repartition node)")
    // above: estimate forces > session default -> RepartitionByExpression
    val p = ExplodedJoin.parts(80000000L)
    assert(p > spark.sessionState.conf.numShufflePartitions)
    val above = ExplodedJoin.sizer(spark, 80000000L, col("gram"))(df)
    assert(above.rdd.getNumPartitions === p,
      s"sized frame must carry parts($p) partitions")
    // rows unchanged either way
    assert(above.count() === 1000L)
  }

  test("orderedSizer's sized branch produces the identical total order") {
    val df = (1 to 500).map(i => ((i * 37 % 250).toLong, i.toLong))
      .toDF("a", "b")
    val plain = df.orderBy(col("a"), col("b")).collect().toSeq
    val sized = ExplodedJoin.orderedSizer(spark, 80000000L, col("a"), col("b"))(df)
    assert(sized.rdd.getNumPartitions === ExplodedJoin.parts(80000000L))
    assert(sized.collect().toSeq === plain,
      "range-repartition + in-partition sort must equal global orderBy")
    // below the gate the helper IS orderBy
    val belowGate = ExplodedJoin.orderedSizer(spark, 10L, col("a"), col("b"))(df)
    assert(belowGate.collect().toSeq === plain)
  }
}
