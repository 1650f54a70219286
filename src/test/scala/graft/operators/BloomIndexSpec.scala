package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** File-level bloom index: point lookups on a non-layout column are
  * bit-identical to the full-scan join (no bloom false negatives),
  * the data scan is partition-pruned to might-contain buckets, and
  * the build marker gates stale/aborted reuse. */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private val path =
    java.nio.file.Files.createTempDirectory("bloomidx").toString + "/idx"

  private lazy val docs = {
    // 120 docs over 16 buckets; doc 7 and 107 share text (dup pair)
    val rows = (0L until 120L).map { i =>
      val text = if (i == 107L) "shared dup text seven"
        else if (i == 7L) "shared dup text seven"
        else s"unique body ${i} of document"
      (i, text)
    }
    rows.toDF("doc_id", "text")
  }

  private def fpOf(texts: Seq[String]) = {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    texts.map(t => md5hex(t.trim.toLowerCase.replaceAll("\\s+", " ")))
  }

  test("lookup ≡ full-scan fingerprint join; absent probes return nothing") {
    BloomIndex.ensureBuilt(docs, 16, path)
    val probes = (fpOf(Seq("shared dup text seven", "unique body 42 of document"))
      :+ "0123456789abcdef0123456789abcdef") // absent
      .toDF("fp")
    val got = BloomIndex.lookup(spark, path, probes)
      .select("fp", "doc_id").as[(String, Long)].collect().toSet
    val full = docs.select(TextAnalysis.fingerprint(col("text")).as("fp"),
        col("doc_id"))
      .join(probes, "fp")
      .as[(String, Long)].collect().toSet
    assert(got === full)
    // the dup pair comes back under one fingerprint; every present
    // probe found (no false negatives), the absent one killed
    assert(got.map(_._2).intersect(Set(7L, 107L)) === Set(7L, 107L))
    assert(!got.exists(_._1 == "0123456789abcdef0123456789abcdef"))
  }

  test("data scan is partition-pruned to might-contain buckets") {
    BloomIndex.ensureBuilt(docs, 16, path)
    val one = fpOf(Seq("unique body 42 of document")).toDF("fp")
    val cand = BloomIndex.candidates(spark, path, one)
      .select("bucket").distinct().collect().map(_.getInt(0)).toSeq
    // bucket 42%16=10 must be a candidate; blooms keep the rest rare
    assert(cand.contains(10))
    assert(cand.length < 16, s"no skipping: all buckets candidates")
    val scan = BloomIndex.readData(spark, path, cand)
    val scans = scan.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty),
      "data scan carries no partition filter — the isin prune was lost")
  }

  test("append: new docs searchable, sidecar OR-merged, saturation monotone") {
    val path2 =
      java.nio.file.Files.createTempDirectory("bloomidx2").toString + "/idx"
    BloomIndex.build(docs, 16, path2)
    val sat0 = BloomIndex.saturation(spark, path2)
    val extra = (1000L until 1040L)
      .map(i => (i, s"appended body $i arrives later")).toDF("doc_id", "text")
    BloomIndex.append(extra, path2)
    // fingerprint refreshed: the index is valid for the GROWN corpus
    assert(BloomIndex.isValid(spark, path2, 160L, 16))
    // an appended doc's fingerprint is found through the merged sidecar
    val probe = fpOf(Seq("appended body 1007 arrives later")).toDF("fp")
    val hit = BloomIndex.lookup(spark, path2, probe)
      .select("doc_id").as[Long].collect().toSet
    assert(hit === Set(1007L))
    // pre-append content still found (the OR kept the old bits)
    val old = fpOf(Seq("unique body 42 of document")).toDF("fp")
    assert(BloomIndex.lookup(spark, path2, old)
      .select("doc_id").as[Long].collect().toSet === Set(42L))
    // appends only ever SET bits: saturation is monotone non-decreasing
    assert(BloomIndex.saturation(spark, path2) >= sat0)
  }

  test("append into a build-time-EMPTY bucket grows the sidecar (no false negatives)") {
    val path4 =
      java.nio.file.Files.createTempDirectory("bloomidx4").toString + "/idx"
    // build with bucket 9 empty: no doc_id ≡ 9 (mod 16) → no sidecar
    // row for bucket 9 at build time
    val sparse = (0L until 120L).filter(_ % 16 != 9)
      .map(i => (i, s"sparse body $i")).toDF("doc_id", "text")
    BloomIndex.build(sparse, 16, path4)
    val bloomBuckets0 = spark.read.parquet(s"$path4/bloom")
      .select("bucket").as[Int].collect().toSet
    assert(!bloomBuckets0.contains(9), "precondition: bucket 9 empty at build")
    // append docs that land ONLY in bucket 9
    val late = Seq(9L, 25L, 41L)
      .map(i => (i, s"late arrival $i")).toDF("doc_id", "text")
    BloomIndex.append(late, path4)
    // the delta's new bucket must be UNIONED into the sidecar, not
    // dropped — otherwise these docs are unfindable forever
    val bloomBuckets1 = spark.read.parquet(s"$path4/bloom")
      .select("bucket").as[Int].collect().toSet
    assert(bloomBuckets1.contains(9), "appended bucket missing from sidecar")
    val probe = fpOf(Seq("late arrival 25")).toDF("fp")
    assert(BloomIndex.lookup(spark, path4, probe)
      .select("doc_id").as[Long].collect().toSet === Set(25L))
  }

  test("regenerated corpus (same rows, different text) triggers rebuild") {
    val path5 =
      java.nio.file.Files.createTempDirectory("bloomidx5").toString + "/idx"
    val gen1 = (0L until 64L).map(i => (i, s"generation one $i")).toDF("doc_id", "text")
    BloomIndex.ensureBuilt(gen1, 16, path5)
    // same row count, same buckets, different content: row-count-only
    // validation would serve the stale index and return gen-1 matches
    val gen2 = (0L until 64L).map(i => (i, s"generation two $i")).toDF("doc_id", "text")
    BloomIndex.ensureBuilt(gen2, 16, path5)
    val probeNew = fpOf(Seq("generation two 13")).toDF("fp")
    assert(BloomIndex.lookup(spark, path5, probeNew)
      .select("doc_id").as[Long].collect().toSet === Set(13L),
      "stale index served after corpus regeneration")
    val probeOld = fpOf(Seq("generation one 13")).toDF("fp")
    assert(BloomIndex.lookup(spark, path5, probeOld).isEmpty,
      "pre-regeneration content still matches")
  }

  test("texts permuted across doc_ids (same fingerprint multiset) triggers rebuild") {
    val path6 =
      java.nio.file.Files.createTempDirectory("bloomidx6").toString + "/idx"
    val gen1 = (0L until 64L).map(i => (i, s"permuted body $i")).toDF("doc_id", "text")
    BloomIndex.ensureBuilt(gen1, 16, path6)
    // reverse the doc_id↔text assignment: the MULTISET of fingerprints
    // (and the row count) is unchanged, so a fingerprint-only content
    // stamp cannot see the change — but every per-bucket bloom now
    // holds different members, so serving the stale sidecar yields
    // bloom false negatives (the failure class the stamp exists to
    // prevent; round-8 advice)
    val gen2 = (0L until 64L).map(i => (i, s"permuted body ${63 - i}"))
      .toDF("doc_id", "text")
    BloomIndex.ensureBuilt(gen2, 16, path6)
    val probe = fpOf(Seq("permuted body 13")).toDF("fp")
    assert(BloomIndex.lookup(spark, path6, probe)
      .select("doc_id").as[Long].collect().toSet === Set(50L),
      "stale sidecar served after a doc_id-permuting regeneration")
  }

  test("property: random probe sets never miss a present fingerprint") {
    val path3 =
      java.nio.file.Files.createTempDirectory("bloomidx3").toString + "/idx"
    val rnd = new scala.util.Random(313)
    val texts = (0L until 200L).map(i => i -> s"prop body ${rnd.nextInt(150)} x$i")
    BloomIndex.build(texts.toDF("doc_id", "text"), 16, path3)
    // 5 random rounds: mixed present/absent probes, ground truth by
    // plain JVM fingerprint lookup — bloom skipping must be lossless
    val fpToIds = texts.groupBy { case (_, t) =>
      fpOf(Seq(t)).head
    }.view.mapValues(_.map(_._1).toSet).toMap
    (1 to 5).foreach { round =>
      val present = rnd.shuffle(texts).take(8).map(t => fpOf(Seq(t._2)).head)
      val absent = (1 to 4).map(i => f"${rnd.nextLong()}%016x" * 2)
      val probes = (present ++ absent).distinct.toDF("fp")
      val got = BloomIndex.lookup(spark, path3, probes)
        .select("fp", "doc_id").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      present.foreach { fp =>
        assert(got.getOrElse(fp, Set.empty) === fpToIds(fp),
          s"round $round: probe $fp missed ids")
      }
      absent.foreach { fp =>
        assert(!got.contains(fp), s"round $round: absent probe returned rows")
      }
    }
  }

  test("marker gates aborted and stale builds") {
    BloomIndex.ensureBuilt(docs, 16, path)
    assert(BloomIndex.isValid(spark, path, 120L, 16))
    assert(!BloomIndex.isValid(spark, path, 121L, 16), "stale row count accepted")
    assert(!BloomIndex.isValid(spark, path, 120L, 8), "bucket mismatch accepted")
    // simulate an aborted build: marker gone, dirs still present
    new java.io.File(s"$path/_GRAFT_BUILD_OK").delete()
    assert(!BloomIndex.isValid(spark, path, 120L, 16), "aborted build accepted")
    // ensureBuilt must rebuild and restore validity
    BloomIndex.ensureBuilt(docs, 16, path)
    assert(BloomIndex.isValid(spark, path, 120L, 16))
  }

  test("append crash between data files and sidecar: stale marker forces rebuild, no false negatives") {
    val path =
      java.nio.file.Files.createTempDirectory("bloomidx").toString + "/idx"
    BloomIndex.ensureBuilt(docs, 16, path)
    val batch = Seq((200L, "late arrival two hundred"),
      (201L, "late arrival two oh one")).toDF("doc_id", "text")
    // crash in the non-atomic window: data appended, sidecar/marker stale
    BloomIndex.failpointAfterDataAppend =
      () => throw new RuntimeException("injected crash")
    try intercept[RuntimeException](BloomIndex.append(batch, path))
    finally BloomIndex.failpointAfterDataAppend = () => ()
    // the window is live: data holds the batch the sidecar can't see
    assert(spark.read.parquet(s"$path/data").count() === 122)
    val all = docs.unionByName(batch)
    // the stale marker fails the stamp compare → ensureBuilt rebuilds
    BloomIndex.ensureBuilt(all, 16, path)
    // recovery restores the lookup ≡ full-scan contract for the batch
    val probes = fpOf(Seq("late arrival two hundred")).toDF("fp")
    val got = BloomIndex.lookup(spark, path, probes)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(200L), s"post-recovery lookup wrong: $got")
    assert(spark.read.parquet(s"$path/data").count() === 122)
  }
}
