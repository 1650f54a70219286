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
}
