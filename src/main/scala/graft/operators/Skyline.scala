package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** 2-D Pareto frontier (skyline): the rows not dominated on
  * (minimize `ordCol`, maximize `valCol`) — "best value seen so far"
  * points, e.g. highest-quality earliest documents or cheapest
  * fastest suppliers.
  *
  * The textbook single-node algorithm is a sort + running max. The
  * scale problem is the running max: an unpartitioned window funnels
  * the corpus through one task. Both preference dimensions here are
  * unbounded-cardinality, so the bounded-alphabet shortcut (window
  * over a tiny distinct aggregate) doesn't apply either. Instead:
  *
  *   1. one keyed shuffle: per-`ordCol` max of `valCol` (|distinct
  *      ord| rows, still unbounded but grouped);
  *   2. the PrefixSum two-phase pattern on that aggregate:
  *      range-partition by ord, per-partition max → P driver-side
  *      subtotals → exclusive prefix max → broadcast offsets →
  *      one partition-local pass appends `_max_lt` = max value over
  *      all STRICTLY SMALLER ord keys;
  *   3. one keyed join back to the input: a row survives iff it is
  *      the max at its own ord (same-ord dominance is strict in
  *      value) AND beats `_max_lt` (smaller-ord dominance allows
  *      value ties).
  *
  * Duplicate (ord, value) pairs neither dominate the other — both
  * survive, matching the classical strict-dominance definition.
  * No global exchange anywhere; every stage is keyed or O(P).
  *
  * Values are compared as doubles (exact for integers up to 2^53 —
  * cents-scaled money and micros timestamps both fit; SkylineSpec
  * pins equivalence with the brute-force dominance definition).
  */
object Skyline {

  def paretoMinMax(df: DataFrame, ordCol: String, valCol: String,
                   numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val perOrd = df.groupBy(col(ordCol))
      .agg(max(col(valCol).cast("double")).as("_ord_max"))
    val sorted = perOrd
      .repartitionByRange(n, col(ordCol))
      .sortWithinPartitions(ordCol)
      .persist()
    // Phase 1: one max per partition (P numbers to the driver).
    val subMax = sorted.select(col("_ord_max"))
      .mapPartitions { it =>
        var m = Double.NegativeInfinity
        it.foreach(r => m = math.max(m, r.getDouble(0)))
        Iterator((TaskContext.getPartitionId(), m))
      }(Encoders.tuple(Encoders.scalaInt, Encoders.scalaDouble))
      .collect().toMap
    // offsets(p) = max over all partitions before p (-inf = none)
    val offsets = new Array[Double](n)
    var run = Double.NegativeInfinity
    var p = 0
    while (p < n) {
      offsets(p) = run
      run = math.max(run, subMax.getOrElse(p, Double.NegativeInfinity))
      p += 1
    }
    val bc = spark.sparkContext.broadcast(offsets)
    // Phase 2: partition-local running max, EXCLUSIVE of the current
    // ord key (emit before folding the row in).
    val mIdx = sorted.schema.fieldIndex("_ord_max")
    val outSchema = sorted.schema.add("_max_lt", DoubleType, nullable = false)
    val withLt = sorted.mapPartitions { it =>
      var seen = bc.value(TaskContext.getPartitionId())
      it.map { row =>
        val out = Row.fromSeq(row.toSeq :+ seen)
        seen = math.max(seen, row.getDouble(mIdx))
        out
      }
    }(Encoders.row(outSchema))
    df.join(withLt, Seq(ordCol))
      .filter(col(valCol).cast("double") === col("_ord_max") &&
        col(valCol).cast("double") > col("_max_lt"))
      .drop("_ord_max", "_max_lt")
  }
}
