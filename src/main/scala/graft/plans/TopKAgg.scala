package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact per-group top-k as a native Catalyst aggregate
  * (`graft_topk(score, payload, k)`): a bounded heap of the k largest
  * (score, payload) pairs per group under the TOTAL order
  * (score DESC, payload ASC), mergeable through the standard
  * TypedImperativeAggregate partial-merge path, evaluating to a
  * rank-ordered `array<struct<score bigint, payload string>>`.
  *
  * Because the order is total (binary payload order breaks score
  * ties), the kept multiset is EXACTLY the k rank-smallest elements
  * for any partitioning and any merge order — unlike the MG sketch
  * (graft_mg_sketch), this aggregate is deterministic outright, and
  * the spec pins partition invariance.
  *
  * Scale shape vs the window-rank idiom (`row_number ... <= k`):
  * Spark's WindowGroupLimit already bounds the shuffle to k rows per
  * group per task, so bytes moved are comparable — what the AGGREGATE
  * form adds is (a) no sort at any stage (heap updates instead of a
  * per-partition sort), and (b) composability: it rides the same
  * `groupBy`/`ROLLUP`/streaming-window pass as other aggregates
  * (q249's one-pass panel idiom), where a window top-k forces a
  * separate sorted pass over the joined-back result.
  *
  * State is O(k) per group; update is O(log k) amortized via a
  * weakest-first binary heap (java.util.PriorityQueue, duplicates
  * kept — two identical rows both occupy top-k slots).
  */
case class TopKAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Long, UTF8String)]]
  with BinaryLike[Expression] {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("payload", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0, got $k")
    else if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT score, got ${left.dataType.sql}")
    else if (right.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING payload, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  private def weakestFirst = TopKAgg.WeakestFirst

  override def createAggregationBuffer(): java.util.PriorityQueue[(Long, UTF8String)] =
    new java.util.PriorityQueue[(Long, UTF8String)](k + 1, weakestFirst)

  private def offer(buf: java.util.PriorityQueue[(Long, UTF8String)],
                    e: (Long, UTF8String)): Unit = {
    if (buf.size < k) buf.offer(e)
    else if (weakestFirst.compare(e, buf.peek()) > 0) { buf.poll(); buf.offer(e) }
  }

  override def update(
      buf: java.util.PriorityQueue[(Long, UTF8String)],
      input: InternalRow): java.util.PriorityQueue[(Long, UTF8String)] = {
    val s = left.eval(input)
    val p = right.eval(input)
    if (s != null && p != null) {
      // copy(): the evaluated UTF8String may point into a reused row buffer
      offer(buf, (s.asInstanceOf[Long], p.asInstanceOf[UTF8String].copy()))
    }
    buf
  }

  override def merge(
      b1: java.util.PriorityQueue[(Long, UTF8String)],
      b2: java.util.PriorityQueue[(Long, UTF8String)]): java.util.PriorityQueue[(Long, UTF8String)] = {
    b2.forEach(e => offer(b1, e))
    b1
  }

  override def eval(buf: java.util.PriorityQueue[(Long, UTF8String)]): Any = {
    val entries = buf.toArray(new Array[(Long, UTF8String)](buf.size))
    // rank order (score DESC, payload ASC) = reverse of weakest-first
    java.util.Arrays.sort(entries, weakestFirst.reversed())
    new GenericArrayData(entries.map { case (score, payload) =>
      new GenericInternalRow(Array[Any](score, payload))
    })
  }

  override def serialize(buf: java.util.PriorityQueue[(Long, UTF8String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { case (s, p) =>
      out.writeLong(s)
      val b = p.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Long, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readLong()
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.offer((s, UTF8String.fromBytes(b)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}

object TopKAgg {
  /** Weakest element first: smaller score, then LARGER payload (rank
    * order is score DESC, payload ASC, so among equal scores the
    * binary-largest payload is ranked last and evicted first). A
    * named static so the expression stays serializable (an anonymous
    * comparator field would ride the task closure). */
  object WeakestFirst extends java.util.Comparator[(Long, UTF8String)] with Serializable {
    override def compare(a: (Long, UTF8String), b: (Long, UTF8String)): Int = {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else b._2.compareTo(a._2)
    }
  }
}
