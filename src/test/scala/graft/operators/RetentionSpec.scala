package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retention.sweep: every copy of a listed content erased, only
  * bloom-candidate bucket files rewritten, audit law holds against
  * the post-sweep files. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("sweep: all copies erased, untouched buckets' files not rewritten, audit law") {
    val path =
      java.nio.file.Files.createTempDirectory("retention").toString + "/idx"
    // ids 5 and 21 share content across ids (both land in bucket 5:
    // 21%16=5) — deleting doc 5's content must also erase doc 21;
    // ids 3 and 67 share an UNRELATED content and must both survive
    val docs = (0L until 80L).map { i =>
      val text = if (i == 67L || i == 3L) "carbon copy alpha"
        else if (i == 21L || i == 5L) "carbon copy beta"
        else s"unique content $i"
      (i, text)
    }.toDF("doc_id", "text")
    BloomIndex.build(docs, 16, path)

    // file fingerprint (name, length, modtime) per bucket dir
    def bucketFiles(b: Int): Set[(String, Long, Long)] = {
      val dir = new java.io.File(s"$path/data/bucket=$b")
      if (!dir.exists()) Set.empty
      else dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length(), f.lastModified())).toSet
    }
    val before = (0 until 16).map(b => b -> bucketFiles(b)).toMap

    val fps = Seq(md5hex("carbon copy beta")).toDF("fp")
    val audit = Retention.sweep(spark, path, fps)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    // all copies of the content gone — both doc 5 and doc 21
    val left = spark.read.parquet(s"$path/data")
      .select("doc_id").as[Long].collect().toSet
    assert(!left.contains(5L) && !left.contains(21L))
    assert(left.contains(3L) && left.contains(67L), "unrelated dup pair survived")
    assert(left.size === 78)
    assert(audit(5)._2 === 2L, "both copies counted in bucket 5's deletions")

    // audit law per bucket, and rows_after measured from disk
    val onDisk = spark.read.parquet(s"$path/data")
      .groupBy("bucket").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    audit.foreach { case (b, (nb, nd, na)) =>
      assert(na === nb - nd, s"audit law broken for bucket $b")
      assert(na === onDisk.getOrElse(b, 0L),
        s"rows_after != on-disk rows for bucket $b")
    }

    // file skipping: the deleting bucket was rewritten, most weren't
    val rewritten = (0 until 16).filter(b => bucketFiles(b) != before(b))
    assert(rewritten.contains(5), "the deleting bucket must be rewritten")
    assert(rewritten.size < 16,
      s"every bucket was rewritten — skipping lost: $rewritten")

    // idempotence: sweeping the same fingerprints again deletes
    // nothing and preserves every survivor
    val audit2 = Retention.sweep(spark, path, fps)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(audit2.values.forall(_ == 0L), s"second sweep deleted rows: $audit2")
    val left2 = spark.read.parquet(s"$path/data")
      .select("doc_id").as[Long].collect().toSet
    assert(left2 === left, "second sweep changed the survivor set")
  }

  test("sweep: a bucket whose EVERY row matches is physically emptied") {
    val path =
      java.nio.file.Files.createTempDirectory("retention").toString + "/idx"
    // bucket 7 = ids {7,23,39,55,71}; give ALL of them the doomed
    // content so dynamic overwrite has no kept rows to rewrite the
    // partition with — the silent-survival corner the takedown
    // contract forbids
    val doomedIds = Set(7L, 23L, 39L, 55L, 71L)
    val docs = (0L until 80L).map { i =>
      (i, if (doomedIds(i)) "erase all of bucket seven" else s"unique content $i")
    }.toDF("doc_id", "text")
    BloomIndex.build(docs, 16, path)
    val fps = Seq(md5hex("erase all of bucket seven")).toDF("fp")
    val audit = Retention.sweep(spark, path, fps)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    assert(audit(7) === ((5L, 5L, 0L)), s"bucket-7 audit: ${audit(7)}")
    // the on-disk partition must be GONE, not just absent from the plan
    val dir = new java.io.File(s"$path/data/bucket=7")
    assert(!dir.exists() ||
      dir.listFiles().forall(!_.getName.endsWith(".parquet")),
      "fully-swept bucket still has parquet files on disk")
    val left = spark.read.parquet(s"$path/data")
      .select("doc_id").as[Long].collect().toSet
    assert(left.intersect(doomedIds).isEmpty, "erased rows survived on disk")
    assert(left.size === 75)
  }

  test("crash between overwrite and bucket deletes is repaired by the next sweep") {
    val path =
      java.nio.file.Files.createTempDirectory("retention").toString + "/idx"
    val doomedIds = Set(7L, 23L, 39L, 55L, 71L) // all of bucket 7
    val docs = (0L until 80L).map { i =>
      (i, if (doomedIds(i)) "erase all of bucket seven" else s"unique content $i")
    }.toDF("doc_id", "text")
    BloomIndex.build(docs, 16, path)
    val fps = Seq(md5hex("erase all of bucket seven")).toDF("fp")

    // inject a crash in the non-atomic window: after the dynamic
    // partition overwrite, before the fully-swept-bucket deletes
    Retention.failpointAfterOverwrite =
      () => throw new RuntimeException("injected crash")
    try intercept[RuntimeException](Retention.sweep(spark, path, fps))
    finally Retention.failpointAfterOverwrite = () => ()

    // the crash resurrected the silent-survival case: bucket 7's old
    // files are still on disk, but the intent marker recorded them
    val dir = new java.io.File(s"$path/data/bucket=7")
    assert(dir.exists() && dir.listFiles().exists(_.getName.endsWith(".parquet")),
      "precondition: the crash left the fully-swept bucket's files behind")
    assert(new java.io.File(s"$path/_GRAFT_SWEEP_INTENT").exists(),
      "intent marker missing after the crash")

    // a re-run reconciles first, so the survivors are gone and the
    // audit/idempotence contract holds as if the crash never happened
    // reconcile runs before the audit's pre-state scan, so the
    // repaired bucket is already gone from the table: it either shows
    // rows_after = 0 or is absent from the audit entirely
    val audit = Retention.sweep(spark, path, fps)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(audit.getOrElse(7, 0L) === 0L)
    assert(!new java.io.File(s"$path/_GRAFT_SWEEP_INTENT").exists(),
      "intent marker not cleared by the repairing sweep")
    assert(!dir.exists() ||
      dir.listFiles().forall(!_.getName.endsWith(".parquet")),
      "crashed sweep's fully-swept bucket still has parquet files")
    val left = spark.read.parquet(s"$path/data")
      .select("doc_id").as[Long].collect().toSet
    assert(left.intersect(doomedIds).isEmpty, "erased rows survived the repair")
    assert(left.size === 75)

    // standalone reconcile on a clean table is a no-op
    assert(Retention.reconcile(spark, path).isEmpty)
  }

  test("torn intent marker is discarded, never parsed — kept buckets survive") {
    val path =
      java.nio.file.Files.createTempDirectory("retention").toString + "/idx"
    val docs = (0L until 80L).map(i => (i, s"unique content $i"))
      .toDF("doc_id", "text")
    BloomIndex.build(docs, 16, path)
    // simulate a marker write torn mid-body on a non-atomic-rename
    // filesystem: an intended "14" persisted as "1". Parsing it blind
    // would delete bucket 1 — a bucket holding only KEPT rows.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/_GRAFT_SWEEP_INTENT"), "1")
    assert(Retention.reconcile(spark, path).isEmpty,
      "torn marker must repair nothing")
    assert(!new java.io.File(s"$path/_GRAFT_SWEEP_INTENT").exists(),
      "torn marker must be discarded")
    assert(new java.io.File(s"$path/data/bucket=1").exists(),
      "bucket 1 (kept rows) deleted from a torn marker")
    val left = spark.read.parquet(s"$path/data")
      .select("doc_id").as[Long].collect().toSet
    assert(left.size === 80, "torn-marker reconcile lost rows")
    // non-numeric residue is equally discarded
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/_GRAFT_SWEEP_INTENT"), "7,x9\n#END")
    assert(Retention.reconcile(spark, path).isEmpty)
    assert(spark.read.parquet(s"$path/data").count() === 80)
  }
}
