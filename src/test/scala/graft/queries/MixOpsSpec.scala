package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge-case + invariant coverage for the round-6 curation queries
  * (the DuckDB oracle certifies sf0.01 end to end; these pin the
  * degenerate shapes the fixture corpus doesn't contain, and cross-
  * check q209 against an algorithm-independent reformulation). */
class MixOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edgeDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("mixops").toString
    Seq(
      // (doc_id, text, lang, source): 1-token, all-same-token,
      // 4-token (no 5-grams), whitespace-heavy, normal
      (0L, "solo", "en", "srcA"),
      (1L, "a a a a", "en", "srcA"),
      (2L, "w x y z", "en", "srcB"),
      (3L, "  p   q  ", "en", "srcB"),
      (4L, "one two three four five six", "en", "srcB"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q208: degenerate docs get zero-trigram stats, repeated-word doc is flagged") {
    val rows = MixOps.q208RepetitionSignals(spark, edgeDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getAs[Int]("trigram_count") === 0)
    assert(rows(0L).getAs[Double]("dup_trigram_frac") === 0.0)
    assert(rows(1L).getAs[Double]("top_word_frac") === 1.0)
    // "a a a a" -> trigrams ["a a a","a a a"]: half are duplicates
    assert(rows(1L).getAs[Double]("dup_trigram_frac") === 0.5)
    assert(rows(1L).getAs[Boolean]("flagged_repetitive"))
    // multi-space split must not manufacture empty tokens
    assert(rows(3L).getAs[Int]("token_count") === 2)
    assert(!rows(4L).getAs[Boolean]("flagged_repetitive"))
  }

  test("q209 matches an algorithm-independent array-intersect reformulation") {
    val got = MixOps.q209Decontamination(spark, sfDir)
      .select("doc_id", "shared_ngrams").as[(Long, Long)].collect().toMap
    // brute force: per (train, test) doc pair, intersect 5-gram sets
    val d = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        filter(split(lower(trim(col("text"))), " +"), t => t =!= "").as("toks"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10)
          .cast("double") / lit(281474976710656.0)).as("frac"))
      .withColumn("grams", when(size(col("toks")) >= 5,
        array_distinct(transform(sequence(lit(1), size(col("toks")) - 4),
          i => concat_ws(" ", (0 to 4).map(o => element_at(col("toks"), i + o)): _*))))
        .otherwise(array().cast("array<string>")))
    val train = d.filter(col("frac") >= 0.1)
      .select(col("doc_id"), col("grams"))
    val test = d.filter(col("frac") < 0.1)
      .select(col("grams").as("tgrams"))
    val expected = train.crossJoin(
        test.agg(array_distinct(flatten(collect_list(col("tgrams")))).as("tg")))
      .select(col("doc_id"),
        size(array_intersect(col("grams"), col("tg"))).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
    assert(got.valuesIterator.exists(_ > 0), "fixture has no contamination to detect")
  }

  test("q210: five distinct picks, round 1 is the pure-relevance argmax") {
    val rows = MixOps.q210MmrSelect(spark, sfDir).collect()
    assert(rows.length === 5)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length === 5)
    assert(rows.head.getAs[Double]("max_sim_selected") === 0.0)
    // rank-1 = argmax relevance with vec_id tie-break
    val c = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), graft.operators.Similarity.quantize(col("embedding")).as("v"))
    val qv = c.filter(col("vec_id") === 0).head.getSeq[Long](1)
    val top = c.filter(col("vec_id") =!= 0)
      .withColumn("rel", graft.operators.Similarity.cosineQ(col("v"),
        array(qv.map(lit): _*)))
      .orderBy(col("rel").desc, col("vec_id")).select("vec_id").head.getLong(0)
    assert(rows.head.getAs[Long]("vec_id") === top)
  }

  test("q211: weights sum to 1 and temperature flattens the head/tail gap") {
    val rows = MixOps.q211MixtureWeights(spark, sfDir)
      .select("token_share", "mixture_weight").as[(Double, Double)].collect()
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9)
    val head = rows.maxBy(_._1)
    val tail = rows.minBy(_._1)
    assert(head._2 < head._1, "head source must be downweighted")
    assert(tail._2 > tail._1, "tail source must be upweighted")
  }

  test("q218 score matches an independent JVM recomputation; |feats| = 2t-1") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def w(f: String): Long = {
      val bucket = java.lang.Long.parseLong(md5hex(f).take(8), 16) % 1024L
      bucket * 2654435761L % 2001L - 1000L
    }
    val texts = Map(0L -> "solo", 1L -> "a a a a", 2L -> "w x y z",
      3L -> "  p   q  ", 4L -> "one two three four five six")
    val rows = MixOps.q218HashClassifier(spark, edgeDir).collect()
    assert(rows.length === texts.size)
    rows.foreach { r =>
      val toks = texts(r.getLong(0)).trim.toLowerCase
        .split(" +").filter(_.nonEmpty).toSeq
      val feats = toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString("_"))
      assert(r.getAs[Long]("n_features") === feats.size.toLong)
      val expected = feats.map(w).sum
      assert(r.getAs[Long]("score_fp") === expected)
      assert(r.getAs[Boolean]("quality_label") === (expected > 0))
    }
  }

  test("q221 datasheet metrics are internally consistent and match base facts") {
    val m = MixOps.q221CorpusDatasheet(spark, sfDir).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Double]("value")).toMap
    assert(m.keySet === Set("contamination_rate", "exact_dup_rate",
      "lang_en_share", "mean_quality", "mean_tokens_per_doc",
      "n_docs", "n_langs", "n_sources", "n_tokens"))
    val docs = graft.Tables.documents(spark, sfDir)
    assert(m("n_docs") === docs.count().toDouble)
    assert(m("n_sources") ===
      docs.select("source").distinct().count().toDouble)
    assert(m("mean_tokens_per_doc") === m("n_tokens") / m("n_docs"))
    Seq("contamination_rate", "exact_dup_rate", "lang_en_share").foreach { k =>
      assert(m(k) >= 0.0 && m(k) <= 1.0, s"$k out of [0,1]")
    }
    assert(m("mean_quality") > 0.0 && m("mean_quality") <= 1.0)
    // cross-check contamination against q209's per-doc output
    val q209 = MixOps.q209Decontamination(spark, sfDir).collect()
    val rate = q209.count(_.getAs[Boolean]("contaminated")).toDouble / q209.length
    assert(m("contamination_rate") === rate)
  }

  test("q224 finds shuffled-template mirrors across sources, not within one") {
    val dir = java.nio.file.Files.createTempDirectory("q224").toString
    Seq(
      (0L, "alpha beta gamma", "srcA"),       // mirrored by doc 1 (reordered,
      (1L, "gamma beta alpha gamma", "srcB"), //  duplicated token) -> syndicated
      (2L, "delta epsilon", "srcA"),          // same-bag copy within ONE source:
      (3L, "epsilon delta", "srcA"),          //  n_sources = 1, must NOT appear
      (4L, "zeta eta theta", "srcB"))         // unique
      .map { case (i, t, src) => (i, t, "en", src) }
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = MixOps.q224Syndication(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("n_copies") === 2L)
    assert(r.getAs[Long]("n_sources") === 2L)
    assert(r.getAs[Long]("canonical_doc_id") === 0L)
    assert(r.getAs[String]("sources") === "srcA,srcB")
  }

  test("q219 drops exactly floor(n/10) per source and never a singleton's doc") {
    // edge fixture: 2- and 3-doc sources -> floor(n/10) = 0, all kept
    val small = MixOps.q219AdaptiveThreshold(spark, edgeDir).collect()
    assert(small.forall(_.getAs[Boolean]("kept")))
    // 20-doc source: exactly the 2 lowest-quality docs dropped; quality
    // here is strictly increasing in length (no punct, no stopwords)
    val dir = java.nio.file.Files.createTempDirectory("q219").toString
    (0 until 20).map(i => (i.toLong, ("tok " * (i + 1)).trim, "en", "big"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val big = MixOps.q219AdaptiveThreshold(spark, dir).collect()
    assert(big.count(!_.getAs[Boolean]("kept")) === 2)
    assert(big.filter(!_.getAs[Boolean]("kept")).map(_.getLong(0)).toSet
      === Set(0L, 1L))
    assert(big.forall(r => r.getAs[Long]("n_src") === 20L))
  }

  test("q238 agrees with an independent JVM perceptron on the sf0.001 corpus") {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    // feature buckets: md5-hashed unigrams + '_'-bigrams, mod 1024
    def buckets(text: String): Seq[Long] = {
      val tk = java.util.regex.Pattern.compile(" +")
        .split(text.trim.toLowerCase, -1).filter(_.nonEmpty).toSeq
      val feats = tk ++ tk.sliding(2).withFilter(_.length == 2)
        .map(_.mkString("_")).toSeq
      feats.map(f => (BigInt(md5hex(f).take(8), 16) % 1024).toLong)
    }
    // teacher label: JVM replica of qualityScore at the 0.64 cut
    def label(text: String): Long = {
      def reCount(s: String, re: String) =
        re.r.findAllIn(s).size.toDouble
      val len = text.length.toDouble
      val toks = java.util.regex.Pattern.compile(" +")
        .split(text.trim.toLowerCase, -1).length.toDouble
      val q = (math.min(len / 500.0, 1.0) * 0.4) +
        ((1.0 - math.min(
          reCount(text, "[^A-Za-z0-9\\s]") / math.max(len, 1.0) * 10.0,
          1.0)) * 0.3) +
        (math.min(
          reCount(text.toLowerCase, "\\b(the|and|is|of|to|a|in|it)\\b") /
            math.max(toks, 1.0) * 5.0, 1.0) * 0.3)
      if (math.round(q * 1000000.0) >= 640000L) 1L else -1L
    }
    val bks = docs.map { case (id, t) => id -> buckets(t) }.toMap
    val ys = docs.map { case (id, t) => id -> label(t) }.toMap
    def round(w: Map[Long, Long], miscl: Set[Long]): Map[Long, Long] =
      docs.filter(d => miscl(d._1)).foldLeft(w) { case (acc, (id, _)) =>
        bks(id).foldLeft(acc)((a, b) =>
          a.updated(b, a.getOrElse(b, 0L) + ys(id)))
      }
    def score(w: Map[Long, Long], id: Long): Long =
      bks(id).map(b => w.getOrElse(b, 0L)).sum
    val w1 = round(Map.empty, docs.map(_._1).toSet)
    val m1 = docs.map(_._1).filter(id => ys(id) * score(w1, id) <= 0).toSet
    val w2 = round(w1, m1)
    val got = MixOps.q238TrainedClassifier(spark, sfDir).collect()
    assert(got.length === docs.length)
    for (r <- got) {
      val id = r.getLong(0)
      assert(r.getAs[Long]("label") === ys(id), s"label doc $id")
      assert(r.getAs[Long]("score1") === score(w1, id), s"score1 doc $id")
      assert(r.getAs[Long]("score2") === score(w2, id), s"score2 doc $id")
      assert(r.getAs[Boolean]("predicted") === (score(w2, id) > 0))
      assert(r.getAs[Boolean]("correct") ===
        ((score(w2, id) > 0) == (ys(id) > 0)))
    }
    // both teacher classes must actually be present for the round to
    // have trained anything
    assert(ys.values.toSet === Set(1L, -1L))
  }

  test("q241 attribution pairs project exactly onto q209's contaminated set") {
    val pairs = MixOps.q241ContaminationPairs(spark, sfDir).collect()
    val exact = MixOps.q209Decontamination(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("shared_ngrams")).toMap
    // the train docs carrying pairs are EXACTLY the contaminated docs
    val attributed = pairs.map(_.getAs[Long]("train_doc")).toSet
    assert(attributed === exact.filter(_._2 > 0).keySet)
    // every pair is a real collision, and a doc's pairwise gram counts
    // cover at least its distinct shared-gram count (a gram shared
    // with k eval docs appears in k pairs)
    assert(pairs.forall(_.getAs[Long]("shared_ngrams") >= 1L))
    val perTrain = pairs.groupBy(_.getAs[Long]("train_doc"))
      .view.mapValues(_.map(_.getAs[Long]("shared_ngrams")).sum).toMap
    for ((doc, n) <- perTrain) assert(n >= exact(doc), s"coverage doc $doc")
  }

  test("q238 converges on a separable teacher (disjoint-vocabulary corpus)") {
    // the fixture corpus's median-cut teacher is NOT separable in the
    // hashed count space (documented in the scaladoc); this corpus IS:
    // long vocab-A docs (quality >= 0.64 via the length term) share no
    // buckets with short vocab-B docs, so round 1's class-difference
    // weights already split them — the mechanics learn when the
    // signal exists in the features
    val dir = java.nio.file.Files.createTempDirectory("q238sep").toString
    val longText = Seq.fill(60)("alphaword").mkString(" ") // 599 chars
    val docs = (0 until 10).map(i => (i.toLong, longText)) ++
      (10 until 20).map(i => (i.toLong, s"betaword gammaword tok$i"))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("srcA"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = MixOps.q238TrainedClassifier(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (i <- 0L until 10L) assert(got(i).getAs[Long]("label") === 1L)
    for (i <- 10L until 20L) assert(got(i).getAs[Long]("label") === -1L)
    // perfect separation by round 2 (in fact already at round 1)
    assert(got.values.forall(_.getAs[Boolean]("correct")))
    for (i <- 0L until 10L) assert(got(i).getAs[Long]("score1") > 0)
    for (i <- 10L until 20L) assert(got(i).getAs[Long]("score1") < 0)
  }

  test("q252: water-filling fills ascending, caps small sources, conserves the budget") {
    val dir = java.nio.file.Files.createTempDirectory("unimax").toString
    // token counts by source: tiny=1, small=8, big=40 → total 49,
    // budget 49/3=16. Fill: tiny min(4·1, 16/3=5)=4 CAPPED → rem 12;
    // small min(32, 12/2=6)=6 → rem 6; big min(160, 6/1=6)=6.
    Seq(
      (0L, "t", "en", "srcTiny"),
      (1L, "a b c d e f g h", "en", "srcSmall"),
      (2L, (1 to 40).map(i => s"w$i").mkString(" "), "en", "srcBig"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = MixOps.q252UnimaxAlloc(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got("srcTiny") === ((1L, 4L, 4000000L, true)))
    assert(got("srcSmall") === ((8L, 6L, 750000L, false)))
    assert(got("srcBig") === ((40L, 6L, 150000L, false)))
    // laws: epoch cap respected everywhere; budget fully spent
    // whenever some source is uncapped
    got.values.foreach { case (n, alloc, _, _) => assert(alloc <= 4 * n) }
    assert(got.values.map(_._2).sum === 16L)
  }

  test("q239 (bloom-prefiltered) is row-identical to q209 (exact)") {
    val exact = MixOps.q209Decontamination(spark, sfDir).collect().toSeq
    val bloom = MixOps.q239BloomDecontam(spark, sfDir).collect().toSeq
    assert(bloom === exact)
    // the bloom path must really be active in this session
    assert(spark.catalog.functionExists("graft_might_contain"))
  }

  test("q267 nesting certificate: zero on the shared draw, LIGHTS UP on a fresh-coin sampler") {
    import org.apache.spark.sql.functions._
    val ladder = MixOps.q267ScalingLadder(spark, sfDir).collect()
    assert(ladder.length === 5)
    assert(ladder.forall(_.getAs[Long]("violations") === 0L),
      "shared-draw ladder must nest violation-free")
    // rung sizes roughly halve upward (hash uniformity, loose band)
    val sizes = ladder.sortBy(_.getAs[Int]("rung")).map(_.getAs[Long]("n_docs"))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a < b },
      s"rungs must strictly grow: ${sizes.toSeq}")
    // falsifiability: a BROKEN sampler drawing a fresh coin per rung
    // (md5(doc_id || rung)) violates nesting and the same violation
    // predicate catches it
    val full = 16777216L
    val thrL = array((4 to 0 by -1).map(m => lit(full >> m)): _*)
    def coin(rung: org.apache.spark.sql.Column) = conv(substring(
      md5(concat_ws("-", col("doc_id").cast("string"), rung.cast("string"))),
      1, 6), 16, 10).cast("long")
    val fresh = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(sequence(lit(0), lit(3))).as("rung"))
      .withColumn("hk", coin(col("rung")))
      .withColumn("hk1", coin(col("rung") + 1))
      // in rung k by k's coin, NOT in rung k+1 by k+1's coin → leak
      .filter(col("hk") < get(thrL, col("rung")) &&
        col("hk1") >= get(thrL, col("rung") + 1))
      .count()
    assert(fresh > 0L, "fresh-coin sampler must trip the certificate")
  }
}
