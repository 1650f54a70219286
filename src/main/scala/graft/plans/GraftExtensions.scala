package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions registering graft's native expressions
  * (activate with spark.sql.extensions=graft.plans.GraftExtensions).
  * The idiomatic plug-in point for custom Catalyst pieces — scalar
  * expressions today; Rules/Strategies would hook in the same way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot_long"),
      new ExpressionInfo(classOf[DotProductLong].getName, "graft_dot_long"),
      (children: Seq[Expression]) => DotProductLong(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_intersect_size"),
      new ExpressionInfo(classOf[IntersectSizeSorted].getName, "graft_intersect_size"),
      (children: Seq[Expression]) => IntersectSizeSorted(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_ivf_top"),
      new ExpressionInfo(classOf[IvfTopCentroids].getName, "graft_ivf_top"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          s"graft_ivf_top requires (vec, codebook, norms, p literal), got ${children.length}")
        val p = children(3) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
            require(v >= 1 && v <= Int.MaxValue,
              s"graft_ivf_top p must fit a positive Int, got $v")
            v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_ivf_top p must be an integer literal, got $other")
        }
        IvfTopCentroids(children.head, children(1), children(2), p)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_ivf_top_l2"),
      new ExpressionInfo(classOf[IvfTopCentroids].getName, "graft_ivf_top_l2"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          s"graft_ivf_top_l2 requires (vec, codebook, norms2, p literal), got ${children.length}")
        val p = children(3) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
            require(v >= 1 && v <= Int.MaxValue,
              s"graft_ivf_top_l2 p must fit a positive Int, got $v")
            v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_ivf_top_l2 p must be an integer literal, got $other")
        }
        IvfTopCentroids(children.head, children(1), children(2), p, l2 = true)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "graft_kmv"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_kmv requires exactly (value, k literal) arguments, got ${children.length}")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
            require(v >= 1 && v <= Int.MaxValue,
              s"graft_kmv k must fit a positive Int, got $v")
            v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_kmv k must be an integer literal, got $other")
        }
        KmvSketchAgg(children.head, k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_mg_sketch"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_mg_sketch"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_mg_sketch requires exactly (value, capacity literal) arguments, got ${children.length}")
        val cap = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
            require(v >= 1 && v <= Int.MaxValue,
              s"graft_mg_sketch capacity must fit a positive Int, got $v")
            v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_mg_sketch capacity must be an integer literal, got $other")
        }
        MisraGriesAgg(children.head, cap)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAgg].getName, "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        require(children.length == 2 || children.length == 3,
          s"graft_bloom_agg requires (hash, expectedItems[, fpp]), got ${children.length} args")
        import org.apache.spark.sql.catalyst.expressions.Literal
        val items = children(1) match {
          case Literal(v: Int, _) => v.toLong
          case Literal(v: Long, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_bloom_agg expectedItems must be an integer literal, got $other")
        }
        val fpp = if (children.length < 3) 0.03 else children(2) match {
          case Literal(v: Double, _) => v
          // SQL decimal literals (e.g. 0.01) wrap Spark's Decimal,
          // not java.math.BigDecimal
          case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"graft_bloom_agg fpp must be a numeric literal, got $other")
        }
        BloomFilterAgg(children.head, items, fpp)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_cms"),
      new ExpressionInfo(classOf[CmsSketchAgg].getName, "graft_cms"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"graft_cms requires (md5_hex, depth literal, width literal), got ${children.length} args")
        import org.apache.spark.sql.catalyst.expressions.Literal
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, _) => v
          case Literal(v: Long, _) =>
            require(v >= 1 && v <= Int.MaxValue, s"graft_cms $what must fit a positive Int, got $v")
            v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_cms $what must be an integer literal, got $other")
        }
        CmsSketchAgg(children.head, intLit(children(1), "depth"), intLit(children(2), "width"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hdr"),
      new ExpressionInfo(classOf[HdrQuantileAgg].getName, "graft_hdr"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"graft_hdr requires (value, b literal, pct literal), got ${children.length} args")
        import org.apache.spark.sql.catalyst.expressions.Literal
        def intLit(e: Expression, what: String): Int = e match {
          case Literal(v: Int, _) => v
          case Literal(v: Long, _) =>
            require(v >= 1 && v <= Int.MaxValue, s"graft_hdr $what must fit a positive Int, got $v")
            v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_hdr $what must be an integer literal, got $other")
        }
        HdrQuantileAgg(children.head, intLit(children(1), "b"), intLit(children(2), "pct"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_might_contain requires (bloom, hash), got ${children.length} args")
        BloomMightContain(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_hilbert"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "graft_hilbert"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"graft_hilbert requires (x, y, bits literal), got ${children.length} args")
        val bits = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
            require(v >= 1 && v <= 31, s"graft_hilbert bits out of range: $v")
            v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_hilbert bits must be an integer literal, got $other")
        }
        HilbertIndex(children.head, children(1), bits)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_lcp"),
      new ExpressionInfo(classOf[CommonPrefixLength].getName, "graft_lcp"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_lcp requires (string, string), got ${children.length} args")
        CommonPrefixLength(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          s"graft_topk requires (score, payload, k literal), got ${children.length} args")
        val k = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
            require(v >= 1 && v <= Int.MaxValue,
              s"graft_topk k must fit a positive Int, got $v")
            v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_topk k must be an integer literal, got $other")
        }
        TopKAgg(children.head, children(1), k)
      }))
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectOptimizerRule(_ => RewriteBoundedLevenshtein)
    ext.injectPlannerStrategy(_ => SessionizeStrategy)
  }
}
