package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a native Catalyst aggregate
  * (`graft_mg_sketch(value, capacity)`): bounded state of at most
  * `capacity` (item, counter) pairs per buffer, mergeable through the
  * standard TypedImperativeAggregate partial-merge path, evaluating
  * to an item-sorted `array<struct<item string, lb bigint>>`.
  *
  * Guarantees (Misra & Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): over a stream of n non-null
  * values, every stored counter `lb` satisfies
  * `true_count - n/(capacity+1) <= lb <= true_count`, and every item
  * with `true_count > n/(capacity+1)` IS stored. When the total
  * distinct count never exceeds `capacity`, no decrement ever fires
  * and the sketch is the exact frequency table.
  *
  * What is and is not deterministic: the guarantee set (all true
  * heavy items present, bounds honored) holds for ANY partitioning,
  * but the exact surviving (item, lb) pairs depend on merge order —
  * so downstream EXACT answers must re-count candidates (see
  * operators.HeavyHitters.frequentItems, the two-pass funnel) rather
  * than trust `lb`. The sketch alone is partition-invariant only in
  * the no-decrement exact regime.
  *
  * Scale design: the shuffle carries at most `capacity` pairs per
  * group per task — never the token stream — which is what makes
  * top-k-frequent feasible over a 100 TB token scan where the full
  * groupBy(token) would shuffle billions of distinct keys. Update
  * decrements are O(capacity) but amortized O(1) per input (each
  * decrement event consumes `capacity` prior increments).
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("lb", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_mg_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (capacity <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires capacity > 0, got $capacity")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING argument, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.HashMap[UTF8String, java.lang.Long] =
    new java.util.HashMap[UTF8String, java.lang.Long]()

  override def update(
      buf: java.util.HashMap[UTF8String, java.lang.Long],
      input: InternalRow): java.util.HashMap[UTF8String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val cur = buf.get(s)
      if (cur != null) buf.put(s, cur + 1L)
      // copy(): the evaluated UTF8String may point into a reused row buffer
      else if (buf.size < capacity) buf.put(s.copy(), 1L)
      else {
        // classic MG step: a new item with all slots full decrements
        // every counter by 1 (this unseen item's count and one unit of
        // each stored count cancel out); zeros free their slots
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      b1: java.util.HashMap[UTF8String, java.lang.Long],
      b2: java.util.HashMap[UTF8String, java.lang.Long]): java.util.HashMap[UTF8String, java.lang.Long] = {
    b2.forEach { (k, v) =>
      val cur = b1.get(k)
      b1.put(k, if (cur == null) v else cur + v)
    }
    if (b1.size > capacity) {
      // mergeable-summaries reduction: subtract the (capacity+1)-th
      // largest counter from every counter and drop the non-positive —
      // at most `capacity` counters can exceed it, and the subtraction
      // adds at most n2/(capacity+1) to the total undercount
      val counts = new Array[Long](b1.size)
      var i = 0
      b1.values().forEach { v => counts(i) = v; i += 1 }
      java.util.Arrays.sort(counts)
      val cstar = counts(counts.length - capacity - 1)
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - cstar
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[UTF8String, java.lang.Long]): Any = {
    // item-sorted output: binary item order is merge-order independent,
    // unlike count order (counts are only lower bounds)
    val entries = new Array[(UTF8String, Long)](buf.size)
    var i = 0
    buf.forEach { (k, v) => entries(i) = (k, v); i += 1 }
    java.util.Arrays.sort(entries, (a: (UTF8String, Long), b: (UTF8String, Long)) =>
      a._1.compareTo(b._1))
    new GenericArrayData(entries.map { case (item, lb) =>
      new GenericInternalRow(Array[Any](item, lb))
    })
  }

  override def serialize(buf: java.util.HashMap[UTF8String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach { (k, v) =>
      val b = k.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}
