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
  case class EwmaState(e: Double, spikes: Int, days: Int)
  case class EwmaOut(user_id: Long, n_days: Int, ewma_final: Double, spike_days: Int)

  /** One fold step — textually the batch expression's arithmetic. */
  def step(e: Double, spikes: Int, x: Double, tau: Double): (Double, Int) =
    (e * 0.5 + x * 0.5,
      spikes + (if (x > e * tau && e > 0.0) 1 else 0))

  /** Day-ordered fold — the ONE kernel both faces run (sort key and
    * day accounting included, so stream and batch cannot drift). */
  private def fold(s0: EwmaState, rows: Iterator[DayCount],
                   tau: Double): EwmaState =
    rows.toSeq.sortBy(_.day.getTime).foldLeft(s0) { (st, r) =>
      val (e2, sp2) = step(st.e, st.spikes, r.cnt.toDouble, tau)
      EwmaState(e2, sp2, st.days + 1)
    }

  private def updateGroup(tau: Double)(
      user: Long, rows: Iterator[DayCount],
      state: GroupState[EwmaState]): Iterator[EwmaOut] = {
    // cross-batch order is the caller's contract (feed batches
    // chronologically); within a batch the fold sorts by day
    val sN = fold(state.getOption.getOrElse(EwmaState(0.0, 0, 0)), rows, tau)
    state.update(sN)
    Iterator(EwmaOut(user, sN.days, sN.e, sN.spikes))
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
      val sN = fold(EwmaState(0.0, 0, 0), rows, tau)
      EwmaOut(user, sN.days, sN.e, sN.spikes)
    }
  }
}
