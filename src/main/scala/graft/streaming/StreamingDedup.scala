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
  * NOT grow with corpus size. Idle buckets are EXPIRED via
  * `EventTimeTimeout`: a bucket that sees no new document for
  * `idleTimeout` of event time is dropped when the watermark passes,
  * so total state is bounded by the number of buckets active in the
  * trailing idle window, not the stream's lifetime. A doc colliding
  * in m bands emits the pair up to m times (same as the batch bucket
  * join before its distinct); the consumer dedups, keeping emission
  * idempotent per-band. Re-delivered doc_ids (micro-batch retries)
  * are ignored via the in-state id check.
  *
  * Late-data caveat (stream ≡ batch parity window): the
  * `watermarkDelay` watermark drops rows arriving more than that far
  * behind max event time BEFORE the stateful operator — a document
  * later than the delay is never checked against any bucket, and a
  * document arriving after its bucket idled out past `idleTimeout`
  * restarts the bucket empty. Batch candidate parity therefore holds
  * exactly for streams whose disorder stays inside `watermarkDelay`
  * and whose near-dup pairs arrive within `idleTimeout` of each
  * other; outside those windows the stream under-reports candidates
  * (it never false-positives). Size both to the source's observed
  * disorder (parity is spec'd on an in-window fixture in
  * StreamingDedupSpec).
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
      watermarkDelay: String = "30 seconds",
      idleTimeout: String = "10 minutes"): Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    require(bands * rowsPerBand <= k,
      s"bands*rowsPerBand = ${bands * rowsPerBand} exceeds signature length $k")
    val idleMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(idleTimeout))
    require(idleMs.months == 0, s"idleTimeout must not use month units: $idleTimeout")
    val idleTimeoutMs =
      idleMs.days * 86400000L + idleMs.microseconds / 1000L
    require(idleTimeoutMs > 0, s"idleTimeout must be positive: $idleTimeout")
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
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // Bucket idle past `idleTimeout` of event time: drop its
            // state. A later arrival for this key restarts it empty.
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(BucketState(Nil))
            var maxTs = Long.MinValue
            val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).flatMap { r =>
              if (r.ts.getTime > maxTs) maxTs = r.ts.getTime
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
            // Expire this bucket once the watermark advances idleTimeout
            // past the newest document it has seen.
            if (maxTs != Long.MinValue)
              state.setTimeoutTimestamp(maxTs + idleTimeoutMs)
            out.iterator
          }
      }
  }
}
