package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class FuncsSpec extends SparkSpec {
  import spark.implicits._

  test("surrogateKey: null maps to UNKNOWN, matches md5 of joined string") {
    val df = Seq((Some(1), Some("a")), (Some(2), None))
      .toDF("id", "name")
      .select(Funcs.surrogateKey(col("id"), col("name")).as("k"))
    val keys = df.as[String].collect()
    assert(keys(0) == org.apache.commons.codec.digest.DigestUtils.md5Hex("1|a"))
    assert(keys(1) == org.apache.commons.codec.digest.DigestUtils.md5Hex("2|UNKNOWN"))
  }

  test("haversineKm: zero distance for identical points, bounded by half circumference") {
    val df = Seq((52.5, 13.4, 52.5, 13.4), (0.0, 0.0, 0.0, 180.0), (90.0, 0.0, -90.0, 0.0))
      .toDF("a", "b", "c", "d")
      .select(Funcs.haversineKm(col("a"), col("b"), col("c"), col("d")).as("km"))
    val km = df.as[Double].collect()
    assert(math.abs(km(0)) < 1e-9)
    assert(math.abs(km(1) - math.Pi * 6371.0) < 1.0) // antipodal ≈ half circumference
    assert(km.forall(d => d >= 0 && d <= math.Pi * 6371.0 + 1e-6))
  }

  test("maskEmail keeps 2-char prefix and domain only") {
    val out = Seq("johannes@example.com").toDF("e")
      .select(Funcs.maskEmail(col("e"))).as[String].collect().head
    assert(out == "jo***@example.com")
  }

  test("maskEmailStrict masks even 1-2 char local parts (no PII pass-through)") {
    val out = Seq("johannes@example.com", "ab@x.com", "a@x.com").toDF("e")
      .select(Funcs.maskEmailStrict(col("e"))).as[String].collect()
    assert(out.toSeq === Seq("jo***@example.com", "ab***@x.com", "a***@x.com"))
    // reference-parity variant leaves the short ones unmasked (documented flaw)
    val ref = Seq("ab@x.com").toDF("e")
      .select(Funcs.maskEmail(col("e"))).as[String].collect().head
    assert(ref == "ab@x.com")
  }

  test("dateDiffUnit year counts elapsed full years, not calendar-year difference") {
    val df = Seq(("2023-12-31", "2024-01-01"), ("2023-01-01", "2024-01-01"),
      ("2023-06-15", "2024-06-14")).toDF("a", "b")
      .select(Funcs.dateDiffUnit("year", col("a").cast("date"), col("b").cast("date")))
    assert(df.as[Long].collect().toSeq === Seq(0L, 1L, 0L))
    // negative direction truncates toward zero (Trino parity)
    val neg = Seq(("2024-06-15", "2023-06-14"), ("2024-06-15", "2024-01-01"))
      .toDF("a", "b")
      .select(Funcs.dateDiffUnit("year", col("a").cast("date"), col("b").cast("date")))
    assert(neg.as[Long].collect().toSeq === Seq(-1L, 0L))
  }

  test("dsum is exact and order-independent for money values") {
    val vals = (1 to 10000).map(i => (i % 7) + 0.01 * (i % 100))
    val total = BigDecimal(vals.map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
    val df1 = vals.toDF("v").repartition(13).agg(Funcs.dsum(col("v")).as("s"))
    assert(math.abs(df1.as[Double].collect().head - total.toDouble) < 1e-6)
  }

  test("detectLang prefers the language with most marker hits") {
    val df = Seq(
      "der hund und die katze ist da",
      "the cat and the dog is here",
      "el perro y la casa es grande"
    ).toDF("text").select(TextAnalysis.detectLang(col("text")).as("l"))
    assert(df.as[String].collect().sameElements(Array("de", "en", "es")))
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq("Hello   World", "hello world", "different").toDF("t")
      .select(TextAnalysis.fingerprint(col("t")).as("f"))
    val f = df.as[String].collect()
    assert(f(0) == f(1) && f(0) != f(2))
  }

  test("tokenChunks: spans tile the document with stride overlap; short docs get one chunk") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, (1 to 80).map(i => s"w$i").mkString(" ")),  // 80 tokens: starts 0,24,48,72
      (2L, "a b c")                                    // 3 tokens: one short chunk
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(
        TextAnalysis.tokenChunks(col("toks"), chunkLen = 32, stride = 24)).as("c"))
      .select(col("doc_id"), col("c.chunk_id"), col("c.token_start"),
        col("c.n_tokens"), col("c.chunk_text"))
    val long = df.filter(col("doc_id") === 1).orderBy("chunk_id").collect()
    assert(long.map(_.getInt(2)).toSeq == Seq(0, 24, 48, 72))
    assert(long.map(_.getInt(3)).toSeq == Seq(32, 32, 32, 8))
    // overlap: chunk k's last 8 tokens == chunk k+1's first 8
    val texts = long.map(_.getString(4).split(" ").toSeq)
    assert(texts(0).takeRight(8) == texts(1).take(8))
    val short = df.filter(col("doc_id") === 2).collect()
    assert(short.length == 1 && short.head.getInt(3) == 3 &&
      short.head.getString(4) == "a b c")
  }
}
