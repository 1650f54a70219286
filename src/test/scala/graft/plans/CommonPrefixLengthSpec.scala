package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native graft_lcp ≡ a plain-Scala character-level LCP reference —
  * including multi-byte UTF-8, where the common BYTE prefix can end
  * mid-character and must be trimmed back to a char boundary.
  */
class CommonPrefixLengthSpec extends SparkSpec {
  import spark.implicits._

  private def refLcp(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    // codePoint-aware walk: compare char-by-char (surrogate pairs
    // compare consistently because equal chars ⇒ equal code units)
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    // don't split a surrogate pair: if we stopped between a high
    // surrogate and its low surrogate, the full code point differs
    if (i > 0 && i < a.length && i < b.length &&
        Character.isHighSurrogate(a.charAt(i - 1))) i -= 1
    i
  }

  // graft_lcp counts CODE POINTS; the Scala reference above counts
  // UTF-16 code units — convert for comparison
  private def refLcpCodePoints(a: String, b: String): Int =
    a.codePointCount(0, refLcp(a, b))

  private def run(pairs: Seq[(String, String)]): Seq[Int] =
    pairs.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"), call_function("graft_lcp", col("a"), col("b")).as("l"))
      .as[(Int, Int)].collect().sortBy(_._1).map(_._2).toSeq

  test("fixed cases: ascii, prefix, empty, identical") {
    val pairs = Seq(
      ("abcdef", "abcxyz"),   // 3
      ("abc", "abcdef"),      // 3 (shorter is a full prefix)
      ("", "anything"),       // 0
      ("same", "same"),       // 4
      ("x", "y"),             // 0
      ("a b c", "a b d")      // 4
    )
    assert(run(pairs) === Seq(3, 3, 0, 4, 0, 4))
  }

  test("multi-byte: common byte prefix ending mid-character trims to boundary") {
    val pairs = Seq(
      ("héllo", "héllx"),       // 4 chars common (é is 2 bytes)
      ("日本語", "日本人"),       // 2 chars (3-byte chars)
      ("aé", "aè"),             // é=C3A9 è=C3A8 share first byte C3 → 1
      ("日", "旧"),              // E697A5 vs E697A7 share 2 bytes → 0
      ("€uro", "€ur"),          // 3
      ("a😀b", "a😀c") // 2 code points (emoji is 1)
    )
    assert(run(pairs) === Seq(4, 2, 1, 0, 3, 2))
  }

  test("randomized: ≡ Scala reference on 300 seeded pairs over a 6-symbol alphabet") {
    val alphabet = Array("a", "b", " ", "é", "日", "😀")
    val rnd = new scala.util.Random(42)
    def word(): Seq[String] =
      (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
    val pairs = (1 to 300).map { _ =>
      val a = word()
      // half the pairs share a forced common prefix to exercise deep
      // scans; the cut is SYMBOL-aligned (a code-unit `take` could
      // split a surrogate pair into invalid UTF-16)
      val b = if (rnd.nextBoolean()) a.take(rnd.nextInt(a.length + 1)) ++ word() else word()
      (a.mkString, b.mkString)
    }
    val expected = pairs.map { case (a, b) => refLcpCodePoints(a, b) }
    assert(run(pairs) === expected)
  }

  test("null in → null out") {
    val got = Seq((Option("abc"), Option.empty[String]))
      .toDF("a", "b")
      .select(call_function("graft_lcp", col("a"), col("b")).as("l"))
      .collect()
    assert(got.head.isNullAt(0))
  }
}
