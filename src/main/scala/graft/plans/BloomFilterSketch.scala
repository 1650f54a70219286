package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join reduction as native Catalyst pieces:
  * `graft_bloom_agg(hash, expectedItems)` builds a serialized bloom
  * filter over 64-bit key hashes, and `graft_might_contain(bloom,
  * hash)` probes it at scan speed (codegen'd, filter deserialized
  * once per task). The pattern: aggregate the SMALL (filtered dim)
  * side's keys into a ~KB filter, inline it as a literal, and prune
  * the 100 TB fact side BEFORE its shuffle — rows that cannot join
  * never leave the scan. False positives only cost work (they are
  * eliminated by the exact join that follows), so query results are
  * exactly those of the plain join. This is the user-drivable form of
  * Spark's own runtime-filter injection (useful where AQE cannot see
  * the opportunity, e.g. pruning feeds an aggregation or a sink
  * rather than the join itself).
  *
  * Scale design: the aggregate's state is one fixed-size bit array;
  * partial aggregation merges by bitwise OR, so the shuffle carries
  * one filter per task regardless of row count, and insertion order
  * never changes the resulting bytes (the build is deterministic).
  */
case class BloomFilterAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (expectedItems <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires expectedItems > 0, got $expectedItems")
    else if (fpp <= 0.0 || fpp >= 1.0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires 0 < fpp < 1, got $fpp")
    else if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT argument (e.g. xxhash64(key)), got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter = {
    b1.mergeInPlace(b2)
    b1
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
}

/** Probe side: `graft_might_contain(bloomBytes, hash)`. The bloom
  * argument must be foldable (a literal produced by collecting the
  * 1-row [[BloomFilterAgg]] result — the same ship-the-model-as-a-
  * literal pattern as the IVF codebook); it is deserialized once and
  * referenced from generated code, so the per-row cost is just the
  * hash probes and the expression stays inside whole-stage codegen.
  */
case class BloomMightContain(bloomExpr: Expression, valueExpr: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(bloomExpr, valueExpr)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (bloomExpr.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY bloom filter argument, got ${bloomExpr.dataType.sql}")
    else if (!bloomExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) bloom filter argument")
    else if (valueExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT probe argument, got ${valueExpr.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val bloom: BloomFilter = {
    val bytes = bloomExpr.eval(null)
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
  }

  override def eval(input: InternalRow): Any = {
    if (bloom == null) null
    else {
      val v = valueExpr.eval(input)
      if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (bloom == null) {
      ev.copy(isNull = TrueLiteral, value = JavaCode.defaultLiteral(dataType))
    } else {
      val bf = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
      val v = valueExpr.genCode(ctx)
      ev.copy(code =
        code"""
          ${v.code}
          boolean ${ev.isNull} = ${v.isNull};
          boolean ${ev.value} = false;
          if (!${ev.isNull}) {
            ${ev.value} = $bf.mightContainLong(${v.value});
          }""", isNull = ev.isNull, value = ev.value)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomMightContain =
    copy(bloomExpr = newChildren(0), valueExpr = newChildren(1))
}
