package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Log-linear histogram quantile sketch as a native Catalyst
  * aggregate — the mergeable SCALE path for the exact-percentile
  * gates (q23/q85's `percentile()` legs merge every value at one
  * reducer; this merges bounded bucket maps), with a HARD relative
  * error guarantee instead of percentile_approx's rank guarantee.
  *
  * Bucket law (the HDR-histogram layout, Tene's public
  * HdrHistogram design; DDSketch [Masson et al., VLDB 2019] gives
  * the same guarantee with log_gamma buckets — log-linear is chosen
  * here because it is INTEGER-exact and therefore engine-portable,
  * while floor(log_gamma(x)) rounds differently across libm builds):
  * values below 2^b map to themselves (exact); for v >= 2^b with
  * e = floor(log2 v), the bucket keeps e and the top b mantissa bits:
  *
  *   idx(v) = ((e - b) << b) + (v >>> (e - b))
  *
  * Buckets are contiguous and monotone in v; bucket width is
  * 2^(e-b) <= lower/2^b, so the reported quantile (the bucket LOWER
  * bound) satisfies  lb <= Q_true < lb * (1 + 2^-b)  — a relative
  * error bound of 2^-b, exact below 2^b. Everything is integer
  * shifts and bit lengths, so DuckDB replays it bit-for-bit
  * (length(bin(v)) is the JVM's 64 - numberOfLeadingZeros).
  *
  * The evaluated result is the lower bound of the first bucket whose
  * cumulative count reaches ceil(n * pct / 100) — the standard
  * lower-quantile rank rule, again pure integers.
  *
  * Scale design: state is a sparse bucket->count map bounded by
  * (64 - b) * 2^b entries (b=5: <= 1888) independent of n; partial
  * aggregation works through the standard TypedImperativeAggregate
  * merge (counts add), so the shuffle carries at most that many
  * (int, long) pairs per group per task — never the value stream —
  * and sketches re-aggregate to rollup-level quantiles losslessly.
  * Mirrors the reference's percentile quality gates
  * (soda checks avg/median thresholds, dq_checks.py) at the
  * cardinality where exact percentile stops fitting one reducer.
  */
case class HdrQuantileAgg(
    child: Expression,
    b: Int,
    pct: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[Integer, java.lang.Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hdr"

  override def checkInputDataTypes(): TypeCheckResult =
    if (b < 1 || b > 8)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= b <= 8 sub-bucket bits, got $b")
    else if (pct < 1 || pct > 100)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= pct <= 100, got $pct")
    else if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT argument (cast counts/cents/" +
          s"latencies to long), got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeMap[Integer, java.lang.Long] =
    new java.util.TreeMap[Integer, java.lang.Long]()

  override def update(
      buf: java.util.TreeMap[Integer, java.lang.Long],
      input: InternalRow): java.util.TreeMap[Integer, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      // The analyzer can only check LongType; enforce the
      // non-negative-magnitude contract here with a named error
      // (negative values have no log-linear bucket).
      if (x < 0L)
        throw new IllegalArgumentException(
          s"$prettyName expects non-negative values (counts, cents, " +
            s"latencies); got $x. Shift or clamp the input — see the " +
            "graft_hdr contract.")
      buf.merge(HdrSketch.bucketOf(x, b), 1L, (a, c) => a + c)
    }
    buf
  }

  override def merge(
      b1: java.util.TreeMap[Integer, java.lang.Long],
      b2: java.util.TreeMap[Integer, java.lang.Long]): java.util.TreeMap[Integer, java.lang.Long] = {
    b2.forEach((k, c) => b1.merge(k, c, (a, x) => a + x))
    b1
  }

  override def eval(buf: java.util.TreeMap[Integer, java.lang.Long]): Any = {
    var n = 0L
    buf.forEach((_, c) => n += c)
    if (n == 0L) null
    else {
      // ceil(n * pct / 100) in overflow-safe integer arithmetic
      val threshold = (n / 100L) * pct + ((n % 100L) * pct + 99L) / 100L
      var cum = 0L
      var ans: Any = null
      val it = buf.entrySet().iterator()
      while (ans == null && it.hasNext) {
        val e = it.next()
        cum += e.getValue
        if (cum >= threshold) ans = HdrSketch.lowerBound(e.getKey, b)
      }
      ans
    }
  }

  override def serialize(buf: java.util.TreeMap[Integer, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (k, c) => out.writeInt(k); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[Integer, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val k = in.readInt()
      val c = in.readLong()
      buf.put(k, c)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HdrQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HdrQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HdrQuantileAgg =
    copy(child = newChild)
}

/** The bucket law, shared by the aggregate, its specs, and any
  * engine that wants to replay it (DuckDB: e = length(bin(v)) - 1).
  */
object HdrSketch {
  /** The bucket law as a SQL expression over a non-negative BIGINT
    * column — the compositional twin of [[bucketOf]] for places a
    * native aggregate can't go (streaming windowed counts keep
    * per-bucket rows; Spark's bin() strips leading zeros, so
    * length(bin(v)) - 1 is floor(log2 v), the same integers as
    * numberOfLeadingZeros). HdrSketchSpec asserts pointwise
    * agreement with [[bucketOf]]. */
  def bucketExpr(colName: String, b: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(
      s"""CAST(CASE WHEN $colName < ${1L << b} THEN $colName
         |  ELSE (length(bin($colName)) - 1 - $b) * ${1 << b}
         |       + shiftright($colName, length(bin($colName)) - 1 - $b)
         |END AS BIGINT)""".stripMargin)

  /** [[lowerBound]] as a SQL expression over a bucket-index column. */
  def lowerBoundExpr(colName: String, b: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(
      s"""CAST(CASE WHEN $colName < ${1 << b} THEN $colName
         |  ELSE shiftleft($colName - (($colName DIV ${1 << b} - 1) * ${1 << b}),
         |                 CAST($colName DIV ${1 << b} - 1 AS INT))
         |END AS BIGINT)""".stripMargin)

  /** Monotone log-linear bucket index: identity below 2^b, else
    * exponent and top b mantissa bits. */
  def bucketOf(v: Long, b: Int): Int = {
    require(v >= 0L, s"log-linear buckets need v >= 0, got $v")
    if (v < (1L << b)) v.toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      ((e - b) << b) + (v >>> (e - b)).toInt
    }
  }

  /** Smallest value mapping to bucket idx — the reported quantile. */
  def lowerBound(idx: Int, b: Int): Long = {
    require(idx >= 0, s"bucket index must be >= 0, got $idx")
    if (idx < (1 << b)) idx.toLong
    else {
      val t = idx >> b // = e - b + 1
      (idx - ((t - 1) << b)).toLong << (t - 1)
    }
  }
}
