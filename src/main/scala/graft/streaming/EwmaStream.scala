package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of the EWMA anomaly baseline (q106): the same
  * α = 1/2 smoothing fold, maintained as per-user state across
  * micro-batches with `flatMapGroupsWithState` — the second stateful
  * operator (after fraud detection) proving the stream ≡ batch
  * shared-kernel design rule. The fold step is written EXACTLY as the
  * batch SQL expression (`e * 0.5 + x * 0.5`, spike iff
  * `x > e * tau && e > 0`) so the doubles agree bit-for-bit: the spec
  * replays the batch fold over the same days and asserts equality.
  *
  * Scale: state is three scalars per user — O(1) per key, no window
  * buffers — and each micro-batch folds only its own rows.
  */
object EwmaStream {

  case class DayCount(user_id: Long, day: java.sql.Date, cnt: Long)
  /** `lastDayMs` makes the fold order-SAFE, not just order-assuming:
    * a row at or before the last folded day cannot silently fold in
    * the wrong order — it is dropped and counted in `late`. Dropping
    * (not reordering) is the only state-bounded option for an EWMA:
    * folding day t-1 after day t would need the pre-t state replayed,
    * i.e. unbounded history per key. Exact same-day replays are
    * dropped too — late-data idempotence, matching the merge path. */
  case class EwmaState(e: Double, spikes: Int, days: Int,
                       lastDayMs: Long, late: Int)
  case class EwmaOut(user_id: Long, n_days: Int, ewma_final: Double,
                     spike_days: Int, late_days: Int)

  val InitState: EwmaState = EwmaState(0.0, 0, 0, Long.MinValue, 0)

  /** One fold step — textually the batch expression's arithmetic. */
  def step(e: Double, spikes: Int, x: Double, tau: Double): (Double, Int) =
    (e * 0.5 + x * 0.5,
      spikes + (if (x > e * tau && e > 0.0) 1 else 0))

  /** Day-ordered fold — the ONE kernel both faces run (sort key, day
    * accounting, and the out-of-order guard included, so stream and
    * batch cannot drift). Input contract: rows are per-(key, day)
    * aggregates, i.e. at most one row per day per key — that is what
    * DayCount means, and what q106's SQL fold (which has no guard)
    * assumes for the three-way parity. If a caller violates it, the
    * (day, cnt) sort still makes the outcome DETERMINISTIC: the
    * smallest count of a duplicated day folds, the rest are flagged
    * late — same treatment as a cross-batch replay. */
  private def fold(s0: EwmaState, rows: Iterator[DayCount],
                   tau: Double): EwmaState =
    rows.toSeq.sortBy(r => (r.day.getTime, r.cnt)).foldLeft(s0) { (st, r) =>
      if (r.day.getTime <= st.lastDayMs)
        st.copy(late = st.late + 1)
      else {
        val (e2, sp2) = step(st.e, st.spikes, r.cnt.toDouble, tau)
        EwmaState(e2, sp2, st.days + 1, r.day.getTime, st.late)
      }
    }

  private def updateGroup(tau: Double)(
      user: Long, rows: Iterator[DayCount],
      state: GroupState[EwmaState]): Iterator[EwmaOut] = {
    // within a batch the fold sorts by day; across batches the guard
    // drops-and-flags anything at or before the last folded day
    val sN = fold(state.getOption.getOrElse(InitState), rows, tau)
    state.update(sN)
    Iterator(EwmaOut(user, sN.days, sN.e, sN.spikes, sN.late))
  }

  /** Streaming per-user EWMA: emits the running (n_days, ewma, spikes)
    * per user on every micro-batch that touches the user. */
  def detectStream(ds: Dataset[DayCount], tau: Double = 2.0): Dataset[EwmaOut] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        updateGroup(tau))
  }

  /** Batch form over the same typed rows and the same `step` kernel
    * (the SQL-expression form lives in q106; this one exists so the
    * spec can triangulate stream ≡ typed batch ≡ SQL expression). */
  def detectBatch(ds: Dataset[DayCount], tau: Double = 2.0): Dataset[EwmaOut] = {
    val sp = ds.sparkSession
    import sp.implicits._
    ds.groupByKey(_.user_id).mapGroups { (user, rows) =>
      val sN = fold(InitState, rows, tau)
      EwmaOut(user, sN.days, sN.e, sN.spikes, sN.late)
    }
  }
}
