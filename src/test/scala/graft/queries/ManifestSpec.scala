package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q222 shard-manifest invariants: agreement with q200's epoch-0
  * packing, corpus coverage, and hash verifiability by an
  * independent JVM md5 over the sorted member list. */
class ManifestSpec extends SparkSpec {

  test("q222 agrees with q200 epoch-0 shards and its hashes re-derive") {
    val manifest = CurationOps.q222ShardManifest(spark, sfDir).collect()
    val packed = CurationOps.q200EpochShards(spark, sfDir)
      .select(col("doc_id"), col("shard_epoch0")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // coverage: every doc in exactly one shard, counts agree
    assert(manifest.map(_.getAs[Long]("n_docs")).sum === packed.length.toLong)
    val byShard = packed.groupBy(_._2)
    assert(manifest.length === byShard.size)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    manifest.foreach { r =>
      val sid = r.getAs[Long]("shard_id")
      val members = byShard(sid).map(_._1).sorted
      assert(r.getAs[Long]("n_docs") === members.length.toLong)
      assert(r.getAs[Long]("min_doc_id") === members.head)
      assert(r.getAs[Long]("max_doc_id") === members.last)
      // the manifest hash is re-derivable from shard membership alone
      assert(r.getAs[String]("manifest_md5") === md5hex(members.mkString(",")))
    }
  }

  test("q223: the epoch shuffle moves most docs and breaks up co-shard pairs") {
    val r = CurationOps.q223ShuffleStability(spark, sfDir).collect()
    assert(r.length === 1)
    val row = r.head
    // independent recomputation from q200's per-doc output
    val packed = CurationOps.q200EpochShards(spark, sfDir)
      .select(col("doc_id"), col("shard_epoch0"), col("shard_epoch1"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(row.getAs[Long]("n_docs") === packed.length.toLong)
    assert(row.getAs[Long]("n_moved") ===
      packed.count(x => x._2 != x._3).toLong)
    val byShard = packed.groupBy(_._2).values
    val pairs = byShard.map(g => g.length.toLong * (g.length - 1) / 2).sum
    assert(row.getAs[Long]("n_pairs_e0") === pairs)
    val kept = byShard.flatMap(g =>
      for (i <- g.indices; j <- (i + 1) until g.length
           if g(i)._3 == g(j)._3) yield 1).size
    assert(row.getAs[Long]("n_pairs_kept") === kept.toLong)
    // shuffle quality: almost everything moves, pair stability near
    // the 1/#shards floor — a broken (constant) shuffle key would
    // score moved_frac ~0 and pair_stability ~1
    assert(row.getAs[Double]("moved_frac") > 0.8)
    assert(row.getAs[Double]("pair_stability") < 0.2)
  }

  test("q223 stability metrics are partition-invariant") {
    // The packing behind q223 runs a distributed prefix sum whose
    // correctness must not depend on how the scan or the shuffles
    // split the data. Re-run the whole audit under a deliberately
    // different execution geometry (tiny input splits, odd shuffle
    // fan-out) and require the exact same single row.
    def run() = CurationOps.q223ShuffleStability(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val baseline = run()
    val conf = spark.conf
    val savedShuffle = conf.get("spark.sql.shuffle.partitions")
    val savedSplit = conf.get("spark.sql.files.maxPartitionBytes")
    try {
      conf.set("spark.sql.shuffle.partitions", "7")
      conf.set("spark.sql.files.maxPartitionBytes", "65536")
      assert(run() === baseline)
    } finally {
      conf.set("spark.sql.shuffle.partitions", savedShuffle)
      conf.set("spark.sql.files.maxPartitionBytes", savedSplit)
    }
  }

  test("q240 context packing tiles the token stream and agrees with a JVM prefix sum") {
    val got = CurationOps.q240ContextPacking(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // independent JVM recomputation: md5-permute, cumsum, cut at 512
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counted = docs.map { case (id, t) =>
      (id, java.util.regex.Pattern.compile(" +")
        .split(t.trim.toLowerCase, -1).length.toLong, md5hex(s"ctx:$id"))
    }.sortBy(_._3)
    var cum = 0L
    for ((id, n, _) <- counted) {
      val r = got(id)
      assert(r.getAs[Long]("offset") === cum, s"offset doc $id")
      assert(r.getAs[Long]("token_count") === n)
      assert(r.getAs[Long]("ctx_start") === cum / 512L)
      assert(r.getAs[Long]("ctx_end") === (cum + n - 1) / 512L)
      assert(r.getAs[Boolean]("crosses") ===
        ((cum + n - 1) / 512L > cum / 512L))
      cum += n
    }
    // the packed stream is gap-free: offsets tile [0, total)
    assert(got.values.map(_.getAs[Long]("token_count")).sum === cum)
    assert(got.values.map(_.getAs[Long]("offset")).toSeq.sorted ===
      counted.scanLeft(0L)((a, d) => a + d._2).init.sorted.toSeq)
  }

  test("q245 release diff: statuses partition both releases, deltas are exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = CurationOps.q245ReleaseDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val tok = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokenCount(col("text")).cast("long").as("tc"))
      .as[(Long, Long)].collect().toMap
    val ids = tok.keySet
    val v1 = ids.filter(_ % 17 != 3)
    val v2 = ids.filter(_ % 23 != 5)
    val added = v2 -- v1
    val removed = v1 -- v2
    val both = v1 & v2
    val changed = both.filter(_ % 11 == 7) // ' rev2' always changes the fingerprint
    val unchanged = both -- changed
    def n(st: String) = got.get(st).map(_._1).getOrElse(0L)
    def delta(st: String) = got.get(st).map(_._2).getOrElse(0L)
    assert(n("added") === added.size.toLong)
    assert(n("removed") === removed.size.toLong)
    assert(n("changed") === changed.size.toLong)
    assert(n("unchanged") === unchanged.size.toLong)
    assert(n("added") + n("removed") + n("changed") + n("unchanged") ===
      (v1 ++ v2).size.toLong)
    // added docs enter at their v2 token count — which includes the
    // ' rev2' edit when the doc is also in the edited residue class
    assert(delta("added") ===
      added.toSeq.map(id => tok(id) + (if (id % 11 == 7) 1L else 0L)).sum)
    assert(delta("removed") === -removed.toSeq.map(tok).sum)
    assert(delta("changed") === changed.size.toLong) // exactly one appended token each
    assert(delta("unchanged") === 0L)
  }

  test("q242 release pipeline ≡ its certified stages composed independently") {
    import org.apache.spark.sql.functions._
    val got = CurationOps.q242ReleasePipeline(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // expected survivors: q212's kept set, masked, deduped by
    // fingerprint-of-masked with the min-doc_id survivor — each stage
    // via the standalone certified kernels, composed in the spec
    val kept = MixOps.q212FilterReport(spark, sfDir)
      .filter(col("kept")).select("doc_id")
    val expected = graft.Tables.documents(spark, sfDir)
      .join(kept, "doc_id")
      .select(col("doc_id"),
        graft.operators.TextAnalysis.piiMask(col("text")).as("masked"))
      .select(col("doc_id"),
        graft.operators.TextAnalysis.fingerprint(col("masked")).as("fp"),
        graft.operators.TextAnalysis.tokenCount(col("masked"))
          .cast("long").as("tc"))
      .collect().groupBy(_.getString(1))
      .map { case (_, rows) => rows.minBy(_.getLong(0)) }
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet === expected.keySet)
    for ((id, tc) <- expected)
      assert(got(id).getAs[Long]("token_count") === tc, s"tc doc $id")
    // offsets tile [0, total): the packing stage preserved q240's law
    val total = got.values.map(_.getAs[Long]("token_count")).sum
    val offs = got.values.map(_.getAs[Long]("offset")).toSeq.sorted
    val sums = got.values.toSeq
      .sortBy(_.getAs[Long]("offset")).map(_.getAs[Long]("token_count"))
      .scanLeft(0L)(_ + _).init
    assert(offs === sums)
    assert(got.values.forall(r =>
      r.getAs[Long]("ctx_end") >= r.getAs[Long]("ctx_start")))
    assert(total === sums.lastOption.getOrElse(0L) +
      got.values.toSeq.sortBy(_.getAs[Long]("offset")).last
        .getAs[Long]("token_count"))
  }
}
