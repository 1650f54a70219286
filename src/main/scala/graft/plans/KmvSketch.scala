package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate: keeps the k smallest DISTINCT hash strings of the input
  * (callers pass md5(value) hex — lexicographic order == numeric
  * order), evaluates to the ascending array of survivors. Ordering is
  * UTF-8 binary (UTF8String.compareTo) — identical to the engine's
  * string sort for the default binary collation — so arbitrary
  * strings, not just hex, order consistently with ORDER BY.
  *
  * Why this sketch and not HLL: KMV over a deterministic hash is
  * engine-portable — any SQL engine rebuilds the identical k-min set
  * with DISTINCT + ORDER BY + LIMIT k, so the estimate
  * (k-1)/frac(kth min) is exactly reproducible cross-engine, while
  * HLL register layouts never match between implementations. The
  * estimator itself is standard (Bar-Yossef et al., "Counting
  * distinct elements in a data stream", RANDOM 2002).
  *
  * Scale design: state is bounded at k strings per group per
  * partition; partial aggregation (map-side combine) works through
  * the standard TypedImperativeAggregate merge, so the shuffle
  * carries at most k hashes per group per task — never the row
  * stream. A set union estimate falls out of merging sketches; the
  * exact-mode branch (fewer than k values seen → the sketch IS the
  * distinct set) is the callers' contract for small groups.
  *
  * Mirrors the reference's cardinality-monitor intent
  * (soda checks / metrics cardinality drift) with a mergeable,
  * re-aggregatable sketch instead of a one-shot approx aggregate.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0, got $k")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  private def add(buf: java.util.TreeSet[UTF8String], s: UTF8String): Unit = {
    // insert-then-trim keeps the set at the k smallest distinct values
    buf.add(s)
    if (buf.size > k) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[UTF8String], input: InternalRow): java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    // copy(): the evaluated UTF8String may point into a reused row buffer
    if (v != null) add(buf, v.asInstanceOf[UTF8String].copy())
    buf
  }

  override def merge(b1: java.util.TreeSet[UTF8String], b2: java.util.TreeSet[UTF8String]): java.util.TreeSet[UTF8String] = {
    b2.forEach(s => add(b1, s))
    b1
  }

  override def eval(buf: java.util.TreeSet[UTF8String]): Any = {
    val arr = new Array[Any](buf.size)
    var i = 0
    buf.forEach { s => arr(i) = s; i += 1 }
    new GenericArrayData(arr)
  }

  // length-prefixed raw UTF-8 bytes: no 64 KiB writeUTF ceiling, and the
  // bytes round-trip the binary ordering exactly
  override def serialize(buf: java.util.TreeSet[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { s =>
      val b = s.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.add(UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}
