package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q236 PII scrub + q237 duplicate-span removal: planted-input laws
  * the synthetic corpus can't pin (organic PII, an exactly-shared
  * 8-token run), each cross-checked against an independent JVM
  * recomputation (java.util.regex / MessageDigest — not the Spark
  * expressions under test). */
class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String) =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("scrub").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("srcA"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- q236 ----

  private val EmailRe = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
  private val PhoneRe = "\\+1[0-9]{10}"
  private val IpRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** JVM replica of the q236 lacing + scrub (the query derives the
    * laced text from doc_id; this recomputes it independently). */
  private def lace(id: Long, text: String): String = {
    val email = if (id % 3 == 0) s" reach user$id@host${id % 7}.net" else ""
    val phone = if (id % 4 == 0)
      s" dial +1${"%010d".format((id * id) % 10000000000L)}" else ""
    val ip = if (id % 5 == 0)
      s" node 10.${id % 256}.${(id / 7) % 256}.${id % 254 + 1}" else ""
    text + email + phone + ip
  }
  private def mask(laced: String): String =
    laced.replaceAll(EmailRe, "<EMAIL>")
      .replaceAll(PhoneRe, "<PHONE>")
      .replaceAll(IpRe, "<IP>")

  test("q236: per-category counts, organic PII caught, masked text is PII-free") {
    // id 0: all three laced; id 7: nothing laced but ORGANIC email in
    // the text; id 9: email only; id 10: phone (10%4≠0 → no) + ip;
    // id 11: nothing — fully clean
    val docs = Seq(
      0L -> "clean words here",
      7L -> "mail bob@corp.io for details",
      9L -> "more plain text",
      10L -> "words and words",
      11L -> "nothing sensitive at all")
    val dir = writeDocs(docs)
    val got = TextOps.q236PiiScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    for ((id, text) <- docs) {
      val laced = lace(id, text)
      val masked = mask(laced)
      val r = got(id)
      assert(r.getAs[Long]("n_emails") ===
        EmailRe.r.findAllIn(laced).size.toLong, s"emails doc $id")
      assert(r.getAs[Long]("n_phones") ===
        PhoneRe.r.findAllIn(laced).size.toLong, s"phones doc $id")
      assert(r.getAs[Long]("n_ips") ===
        IpRe.r.findAllIn(laced).size.toLong, s"ips doc $id")
      assert(r.getAs[String]("masked_md5") === md5hex(masked), s"mask doc $id")
      assert(r.getAs[Long]("laced_len") === laced.length.toLong)
      assert(r.getAs[Long]("masked_len") === masked.length.toLong)
      // the masked text must carry no residual match of ANY category
      for (re <- Seq(EmailRe, PhoneRe, IpRe))
        assert(re.r.findAllIn(masked).isEmpty, s"residual PII doc $id")
    }
    assert(got(0L).getAs[Boolean]("pii_found"))
    assert(got(7L).getAs[Boolean]("pii_found")) // organic, not laced
    assert(got(7L).getAs[Long]("n_emails") === 1L)
    assert(!got(11L).getAs[Boolean]("pii_found"))
  }

  // ---- q237 ----

  test("q237: a shared 8-token run is cut from every carrier; unique docs untouched") {
    val run = (1 to 8).map(i => s"t$i").mkString(" ")
    val dir = writeDocs(Seq(
      0L -> s"$run tail0",     // run at positions 1..8
      1L -> s"head1 $run",     // run at positions 2..9
      2L -> (1 to 9).map(i => s"u$i").mkString(" "))) // no shared grams
    val got = ScaleOps.q237DupSpanRemoval(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(0L, 1L, 2L))
      assert(got(id).getAs[Long]("total_tokens") === 9L)
    assert(got(0L).getAs[Long]("removed_tokens") === 8L)
    assert(got(0L).getAs[String]("clean_md5") === md5hex("tail0"))
    assert(got(1L).getAs[Long]("removed_tokens") === 8L)
    assert(got(1L).getAs[String]("clean_md5") === md5hex("head1"))
    assert(got(2L).getAs[Long]("removed_tokens") === 0L)
    assert(got(2L).getAs[String]("clean_md5") ===
      md5hex((1 to 9).map(i => s"u$i").mkString(" ")))
  }

  test("q237: overlapping duplicated grams merge their coverage; full-doc removal yields empty text") {
    // 10-token docs sharing ALL tokens → every 8-gram (starts 1,2,3)
    // is duplicated; coverage merges to 1..10 → everything removed
    val full = (1 to 10).map(i => s"s$i").mkString(" ")
    val dir = writeDocs(Seq(0L -> full, 1L -> full))
    val got = ScaleOps.q237DupSpanRemoval(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(0L, 1L)) {
      assert(got(id).getAs[Long]("removed_tokens") === 10L)
      assert(got(id).getAs[Long]("kept_tokens") === 0L)
      assert(got(id).getAs[String]("clean_md5") === md5hex(""))
    }
  }

  test("q237 agrees with an independent JVM recomputation on the sf0.001 corpus") {
    val got = ScaleOps.q237DupSpanRemoval(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getAs[Long]("total_tokens"),
        r.getAs[Long]("removed_tokens"), r.getAs[String]("clean_md5")))).toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val toksOf: Map[Long, Array[String]] = docs.map { case (id, t) =>
      id -> java.util.regex.Pattern.compile(" +")
        .split(t.trim.toLowerCase, -1).filter(_.nonEmpty)
    }.toMap
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((id, tk) <- toksOf; i <- 0 to tk.length - 8)
      gramDocs.updateWith(tk.slice(i, i + 8).mkString(" ")) {
        prev => Some(prev.getOrElse(Set.empty) + id) }
    for ((id, tk) <- toksOf) {
      val covered = (for {
        i <- 0 to tk.length - 8
        if gramDocs(tk.slice(i, i + 8).mkString(" ")).size >= 2
        p <- i until i + 8
      } yield p).toSet
      val kept = tk.zipWithIndex.collect { case (t, p) if !covered(p) => t }
      val (tot, rem, cm) = got(id)
      assert(tot === tk.length.toLong, s"total doc $id")
      assert(rem === covered.size.toLong, s"removed doc $id")
      assert(cm === md5hex(kept.mkString(" ")), s"clean doc $id")
    }
  }

  // ---- q256 Gopher rule panel ----

  test("q256: each crafted defect trips exactly its Gopher rule") {
    // 8 stopwords + 52 filler words: 60 words, mean len 225/60=3.75,
    // all-alpha, no symbols -> passes every rule
    val base = "the and is of to a in it " + Seq.fill(52)("data").mkString(" ")
    val dir = writeDocs(Seq(
      1L -> base,                                        // healthy
      2L -> "the and is of to data data data data data", // 10 words: count rule only
      3L -> ("- " + base),                               // bullet start only
      4L -> (base + " data..."),                         // ellipsis end only
      5L -> (base + " " + Seq.fill(10)("#").mkString(" ")), // symbol ratio only
      6L -> Seq.fill(60)("1234").mkString(" ")))         // alpha + stopword rules
    val got = TextOps.q256GopherRules(spark, dir)
      .select("doc_id", "failed_rules", "gopher_pass")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert(got(1L) === ((0, true)))
    assert(got(2L) === ((1, false)))
    assert(got(3L) === ((1, false)))
    assert(got(4L) === ((1, false)))
    assert(got(5L) === ((1, false)))
    assert(got(6L) === ((2, false)))

    // feature spot checks on the healthy doc: the panel's numbers,
    // not just the flags
    val h = TextOps.q256GopherRules(spark, dir)
      .filter(col("doc_id") === 1L).head
    assert(h.getAs[Int]("n_words") === 60)
    assert(h.getAs[Double]("mean_word_len") === 225.0 / 60.0)
    assert(h.getAs[Int]("stop_hits") === 8)
    assert(h.getAs[Double]("alpha_ratio") === 1.0)
  }

  // ---- q258 blocklist filter ----

  test("q258: token-exact blocklist — hits counted, substring words NOT matched") {
    val dir = writeDocs(Seq(
      1L -> "fast table scan value",            // clean
      2L -> "fast slow table slow value",       // two hits, first at pos 2
      3L -> "slowly unsparkly corruption data", // substrings only: the clbuttic law
      4L -> "corrupt row"))                     // hit at pos 1
    val got = TextOps.q258BlocklistFilter(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("blocklist_hits"), Option(r.getAs[String]("first_hit")),
          Option(r.getAs[Any]("first_hit_pos")), r.getAs[Boolean]("kept")))).toMap
    assert(got(1L) === ((0, None, None, true)))
    assert(got(2L) === ((2, Some("slow"), Some(2L), false)))
    assert(got(3L) === ((0, None, None, true)),
      "substring containment must not trip a token blocklist")
    assert(got(4L) === ((1, Some("corrupt"), Some(1L), false)))
  }
}
