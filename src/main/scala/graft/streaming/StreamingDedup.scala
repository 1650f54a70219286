package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Dedup

/** Streaming near-duplicate detection — MinHash-LSH dedup AT INGEST
  * (the streaming twin of the batch `Dedup.lshCandidatePairs` /
  * `lshCandidatePairsAcross` family): every arriving document is
  * signed with the SAME JVM MinHash kernel the batch path maps over
  * the corpus (`Dedup.signatureOf` — one kernel, which is what makes
  * stream ≡ batch candidate parity provable, the FraudDetection
  * `evalEvent` discipline), banded, and checked against the keyed
  * state of previously seen documents in each LSH bucket.
  *
  * Topology: the banding flatMap fans each doc into `bands` rows;
  * `groupByKey((band_idx, band_key))` shuffles each row to its
  * bucket's owning executor — the Flink-keyBy shape — and
  * `flatMapGroupsWithState` keeps a bounded FIFO of (doc_id,
  * signature) per bucket. A candidate is emitted the moment the
  * colliding document arrives, with the signature-estimated Jaccard
  * attached (exact verification stays a batch join downstream, as in
  * q46's verify stage).
  *
  * Scale/state design: state per bucket is ≤ `maxBucketDocs` entries
  * of k longs — bucket count grows with corpus diversity, entries do
  * NOT grow with corpus size. A doc colliding in m bands emits the
  * pair up to m times (same as the batch bucket join before its
  * distinct); the consumer dedups, keeping emission idempotent
  * per-band. Re-delivered doc_ids (micro-batch retries) are ignored
  * via the in-state id check.
  */
object StreamingDedup {

  case class DocEvent(doc_id: Long, text: String, ts: Timestamp)
  case class BandRow(band_idx: Int, band_key: String, doc_id: Long,
      sig: Array[Long], ts: Timestamp)
  case class BucketState(entries: List[(Long, Array[Long])])
  case class NearDupCandidate(band_idx: Int, doc_id: Long,
      prior_doc_id: Long, est_jaccard: Double)

  def detectStream(docs: Dataset[DocEvent], k: Int = 16, shingleN: Int = 3,
      bands: Int = 4, rowsPerBand: Int = 4, maxBucketDocs: Int = 64,
      watermarkDelay: String = "30 seconds"): Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    require(bands * rowsPerBand <= k,
      s"bands*rowsPerBand = ${bands * rowsPerBand} exceeds signature length $k")
    val banded = docs.flatMap { d =>
      val sig = Dedup.signatureOf(d.text, k, shingleN)
      (0 until bands).map { b =>
        val slice = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
        BandRow(b, slice.mkString(","), d.doc_id, sig, d.ts)
      }
    }
    banded.withWatermark("ts", watermarkDelay)
      .groupByKey(r => (r.band_idx, r.band_key))
      .flatMapGroupsWithState[BucketState, NearDupCandidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state: GroupState[BucketState]) =>
          var st = state.getOption.getOrElse(BucketState(Nil))
          val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).flatMap { r =>
            if (st.entries.exists(_._1 == r.doc_id)) Nil // retry re-delivery
            else {
              val cands = st.entries.map { case (pid, psig) =>
                var eq = 0
                var i = 0
                while (i < r.sig.length) {
                  if (psig(i) == r.sig(i)) eq += 1
                  i += 1
                }
                NearDupCandidate(r.band_idx, r.doc_id, pid,
                  eq.toDouble / r.sig.length)
              }
              st = BucketState(((r.doc_id, r.sig) :: st.entries)
                .take(maxBucketDocs))
              cands
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
