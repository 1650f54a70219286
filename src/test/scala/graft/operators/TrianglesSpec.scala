package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degree-ordered triangle census: the oriented wedge-join must equal
  * the brute-force triple enumeration — that equality IS the claim
  * that orientation by (degree, id) counts every triangle exactly
  * once (each triangle has exactly one rank-minimal corner, which is
  * the only `u` that emits its wedge).
  */
class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  private def bruteForce(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val tris = for {
      Seq(x, y, z) <- nodes.combinations(3).toSeq
      if es((x, y)) && es((y, z)) && es((x, z))
    } yield Seq(x, y, z)
    val counts = tris.flatten.groupBy(identity).map { case (n, l) => n -> l.size.toLong }
    nodes.map(n => n -> counts.getOrElse(n, 0L)).toMap
  }

  private def census(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Triangles.census(edges.toDF("a", "b"))
      .as[(Long, Long, Long)].collect()
      .map { case (n, d, t) => n -> (d, t) }.toMap

  test("two adjacent triangles sharing an edge, plus a pendant chain") {
    // 1-2-3 and 2-3-4 share edge (2,3); 5-6-7 is a path (no triangle)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L))
    val got = census(edges)
    assert(got(1L) === ((2L, 1L)))
    assert(got(2L) === ((3L, 2L))) // in both triangles
    assert(got(3L) === ((3L, 2L)))
    assert(got(4L) === ((2L, 1L)))
    assert(got(5L) === ((1L, 0L)))
    assert(got(6L) === ((2L, 0L)))
    assert(got(7L) === ((1L, 0L)))
  }

  test("complete graph K5: every node in C(4,2) = 6 triangles") {
    val nodes = (1L to 5L)
    val edges = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val got = census(edges.toSeq)
    nodes.foreach { n => assert(got(n) === ((4L, 6L)), s"node $n") }
  }

  test("randomized: matches brute force on a 40-node md5 graph") {
    // deterministic pseudo-random sparse-ish graph: keep edge (a,b)
    // when md5("a|b") lands in a 1/4 slice — includes hub nodes and
    // many open wedges
    val all = for (a <- 1L to 40L; b <- (a + 1) to 40L) yield (a, b)
    val edges = all.filter { case (a, b) =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$a|$b".getBytes("UTF-8")).head % 4 == 0
    }
    assert(edges.size > 100, s"degenerate fixture: ${edges.size} edges")
    val expected = bruteForce(edges)
    val got = census(edges)
    assert(got.view.mapValues(_._2).toMap === expected)
    // degree column is the undirected degree
    val degs = edges.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, l) => n -> l.size.toLong }
    got.foreach { case (n, (d, _)) => assert(d === degs(n), s"degree of $n") }
  }

  test("partition-count invariance (1, 3, 8 partitions)") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (1L, 5L), (2L, 5L))
    val expected = census(edges)
    for (n <- Seq(1, 3, 8)) {
      val got = Triangles.census(edges.toDF("a", "b").repartition(n))
        .as[(Long, Long, Long)].collect()
        .map { case (m, d, t) => m -> (d, t) }.toMap
      assert(got === expected, s"numPartitions=$n")
    }
  }
}
