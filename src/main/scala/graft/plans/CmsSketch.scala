package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a native Catalyst aggregate
  * (`graft_cms(md5_hex, depth, width)`): a depth×width counter grid
  * over md5-derived row hashes, evaluating to the flat row-major
  * `array<bigint>` of counters (row i, bucket b at index i*width+b).
  * Point estimate for item x = min over rows i of
  * counter[i][h_i(x)] — never an underestimate, over by at most the
  * colliding mass (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 2005; ε=e/width, δ=e^-depth for the standard bounds).
  *
  * Row hashes are SLICES OF THE CALLER-SUPPLIED md5 HEX — h_i(x) =
  * int(hex[6i..6i+6)) mod width — rather than a private hash family,
  * which is what makes the whole sketch engine-portable: any SQL
  * engine rebuilds the identical grid with
  * `CAST('0x'||substr(md5(x),1+6*i,6) AS BIGINT)%width` (the same
  * portability contract as KmvSketchAgg). Six hex chars = 24 bits per
  * row, independent enough across rows for the CMS bound since md5
  * bits are pairwise-uniform; depth ≤ 5 fits the 32-char digest.
  *
  * Unlike MisraGriesAgg, the DETERMINISM is total: update is a
  * counter increment and merge is elementwise addition, so the
  * evaluated grid is identical for every partitioning and merge
  * order — the sketch itself is oracle-checkable, not just its
  * guarantee set.
  *
  * Scale design: state is a fixed depth×width Long array per group
  * per task (4×512 = 16 KiB default), merged map-side — the shuffle
  * carries one grid per group per task, never the token stream. This
  * is the complement to MG in the sketch suite: MG answers "which
  * items are heavy" in bounded space; CMS answers "how heavy is THIS
  * item" for items known up front (probe lists, blocklists, vocab
  * subsets) without a second scan.
  */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms"

  override def checkInputDataTypes(): TypeCheckResult =
    if (depth <= 0 || depth > 5)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= depth <= 5 (6 hex chars per row from a 32-char md5), got $depth")
    else if (width <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires width > 0, got $width")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING md5-hex argument, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hex = v.asInstanceOf[UTF8String].toString
      // The analyzer can only check StringType; enforce the md5-hex
      // contract here so a malformed input fails with a graft_cms
      // message instead of an opaque StringIndexOutOfBounds /
      // NumberFormatException deep in a task.
      if (hex.length < depth * 6 || !CmsSketchAgg.isHex(hex, depth * 6))
        throw new IllegalArgumentException(
          s"$prettyName expects a lowercase/uppercase hex digest of at least " +
            s"${depth * 6} chars (an md5 hex string); got '$hex' " +
            s"(len ${hex.length}). Pass md5(col) — see the graft_cms contract.")
      var i = 0
      while (i < depth) {
        buf(i * width + CmsSketchAgg.bucket(hex, i, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

object CmsSketchAgg {
  /** Row-i bucket of an md5 hex digest: int value of hex chars
    * [6i, 6i+6) mod width. Shared by the aggregate's update path and
    * by plan-build-time probe addressing (probe items are literals,
    * so their flat indices fold into the plan as constants).
    */
  def bucket(md5Hex: String, row: Int, width: Int): Int =
    (java.lang.Long.parseLong(md5Hex.substring(row * 6, row * 6 + 6), 16) % width).toInt

  /** True iff the first `n` chars of `s` are hex digits. */
  def isHex(s: String, n: Int): Boolean = {
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (!((c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))
        return false
      i += 1
    }
    true
  }

  /** Hex md5 of a UTF-8 string (driver-side, for literal probes). */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
