package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletion-neighborhood join is LOSSLESS at edit distance 2 (vs brute force)") {
    // seeded random vocabulary over a small alphabet: plenty of true
    // pairs at distances 0/1/2 plus plenty of negatives
    val rnd = new scala.util.Random(7)
    val words = (0 until 120).map { _ =>
      (0 until (4 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }.distinct
    val truth = (for {
      i <- words.indices; j <- words.indices if words(i) < words(j)
      if levenshtein(words(i), words(j)) <= 2
    } yield (words(i), words(j))).toSet
    assert(truth.nonEmpty, "fixture must contain true pairs")

    val names = words.toDF("n")
    val variants = names.select(col("n"),
      explode(FuzzyJoin.deletionNeighborhood(col("n"), 2)).as("v"))
    val found = variants.as("x").join(variants.as("y"), Seq("v"))
      .filter(col("x.n") < col("y.n"))
      .select(col("x.n"), col("y.n")).distinct()
      .withColumn("d", org.apache.spark.sql.functions.levenshtein(col("x.n"), col("y.n"), 2))
      .filter(col("d") >= 0)
      .select("x.n", "y.n").as[(String, String)].collect().toSet
    assert(found == truth,
      s"missed: ${(truth -- found).take(5)}; spurious: ${(found -- truth).take(5)}")
  }

  test("neighborhood contents: sizes, membership, and the empty-string guard") {
    val out = Seq("abc", "a", "").toDF("s")
      .select(col("s"), FuzzyJoin.deletionNeighborhood(col("s"), 2).as("nb"))
      .as[(String, Seq[String])].collect().toMap
    // "abc": itself + 3 single deletions + 3 distinct double deletions
    assert(out("abc").toSet == Set("abc", "ab", "ac", "bc", "a", "b", "c"))
    assert(out("a").toSet == Set("a", ""))
    assert(out("").toSet == Set(""))
    // maxDel=0 is the identity; >2 is refused (O(len^maxDel) blowup)
    val id = Seq("xy").toDF("s")
      .select(FuzzyJoin.deletionNeighborhood(col("s"), 0).as("nb"))
      .as[Seq[String]].head()
    assert(id == Seq("xy"))
    intercept[IllegalArgumentException] {
      FuzzyJoin.deletionNeighborhood(col("s"), 3)
    }
  }
}
