package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState quota admission (the Spark 4 arbitrary-stateful
  * API): stream ≡ batch decisions, and the per-key counter must carry
  * across micro-batches (a key whose budget is spent in batch 1
  * rejects everything in batch 2).
  */
class QuotaAdmissionSpec extends SparkSpec {
  import spark.implicits._

  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def runStream(limit: Long, batches: Seq[Seq[AdmissionEvent]])
      : Seq[AdmissionDecision] = {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocksdb)
    try {
      val mem = MemoryStream[AdmissionEvent]
      val decisions = QuotaAdmission.admitStream(mem.toDS(), limit)
      val ckpt = java.nio.file.Files.createTempDirectory("quota-ckpt").toString
      val q = decisions.writeStream
        .format("memory").queryName("quota_out")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      spark.table("quota_out").as[AdmissionDecision].collect().toSeq
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def key(d: AdmissionDecision) = (d.source, d.doc_id)

  test("stream decisions equal the batch rank formulation") {
    val events = (1L to 12L).map { i =>
      AdmissionEvent(source = if (i % 3 == 0) "b" else "a", doc_id = i, seq = i)
    }
    val got = runStream(3, Seq(events.take(7), events.drop(7)))
      .sortBy(key)
    val expected = QuotaAdmission
      .admitBatch(events.toDF(), 3)
      .as[AdmissionDecision].collect().toSeq.sortBy(key)
    assert(got === expected)
    // sanity: each source admits exactly 3 of its events
    assert(got.count(d => d.source == "a" && d.admitted) === 3)
    assert(got.count(d => d.source == "b" && d.admitted) === 3)
  }

  test("budget spent in batch 1 rejects the whole of batch 2") {
    val b1 = (1L to 4L).map(i => AdmissionEvent("a", i, i))
    val b2 = (5L to 8L).map(i => AdmissionEvent("a", i, i))
    val got = runStream(2, Seq(b1, b2)).sortBy(_.doc_id)
    assert(got.map(_.admitted) === Seq(true, true, false, false,
      false, false, false, false))
    // the running counter saturates at the limit and stays there
    assert(got.map(_.admitted_so_far).toSet === Set(1L, 2L))
    assert(got.drop(2).forall(_.admitted_so_far == 2L))
  }

  test("in-batch admission order is seq, not arrival order") {
    // one batch delivered with seq out of order: the processor must
    // sort within the key before spending budget
    val batch = Seq(
      AdmissionEvent("a", 10L, seq = 4L),
      AdmissionEvent("a", 11L, seq = 1L),
      AdmissionEvent("a", 12L, seq = 3L),
      AdmissionEvent("a", 13L, seq = 2L))
    val got = runStream(2, Seq(batch))
    val admitted = got.filter(_.admitted).map(_.doc_id).toSet
    assert(admitted === Set(11L, 13L)) // the two lowest seq
  }
}
