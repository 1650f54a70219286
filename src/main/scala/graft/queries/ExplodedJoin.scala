package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Gated two-sided exchange sizing for joins/aggregations over
  * corpus-DERIVED exploded frames (n-grams, (doc, pos) token maps) —
  * the round-9 q225 lesson generalized to the whole hazard class
  * (round-10 item 1).
  *
  * The hazard: an exploded frame's row count is DECOUPLED from the
  * input tables (a 5M-doc corpus yields ~230M 5-gram rows), but its
  * shuffle lands on `spark.sql.shuffle.partitions` sized for the
  * tables — and a sort-merge join SORTS each partition in full, so at
  * sf100 the 8-partition session put ~29M gram rows (~2.4 GB) through
  * every sort and spilled. Window sizing is ONE-sided (any partition
  * count satisfies a window's ClusteredDistribution), but a join
  * requires its two children co-partitioned with EQUAL counts: size
  * one side alone and EnsureRequirements silently re-exchanges BOTH
  * back to the session default (measured, round-9 SpillAudit). Hence:
  * every frame meeting at a gram-keyed join goes through the SAME
  * `sizer`, and downstream gram-keyed aggregates reuse the
  * partitioning (ClusteredDistribution is satisfied, no new
  * exchange — which is also why `sized(df).distinct()` keeps the
  * sizing).
  *
  * Gating: below the session default the planner's own choices
  * (broadcast of a small side, default sorts that measured zero
  * spill through sf10) are strictly better — an unconditional
  * repartition forces a full gram exchange exactly where the planner
  * had avoided one (measured +5.3 MB shuffle at sf0.1, round 9). So
  * the sizer is IDENTITY unless the estimate exceeds the session
  * default, keeping d1/d2 sweep and bench plans byte-identical.
  *
  * Estimates come from a parquet-metadata-cheap doc count times a
  * per-doc explosion overbound (×64 for ≤300-char docs' grams/tokens,
  * ×512 for 8-gram coverage explodes): overestimating only SHRINKS
  * partitions, and the 4096 cap bounds task-scheduling overhead at
  * any corpus size.
  */
private[graft] object ExplodedJoin {

  /** Partitions for an exploded frame of ~`estRows`, targeting ≤8M
    * rows (≈0.5-1 GB of gram/token rows) per sort. */
  def parts(estRows: Long, rowsPerPartition: Long = 8000000L): Int =
    // max(0, ·): a caller whose estimate product overflowed to a
    // negative Long must degrade to the session default (gate stays
    // closed), never to a negative partition count that would make
    // repartition throw — belt to candidateEstimate's braces.
    math.min(4096L, math.max(0L, estRows) / rowsPerPartition + 1L).toInt

  /** The ONE gate predicate behind every sizer in this object: open
    * iff the exploded-frame estimate wants more partitions than the
    * session default. Callers that pick a JOIN STRATEGY off the gate
    * (annTopK's broadcast-vs-co-partitioned bucket join, IvfIndex's
    * probe join) must use this same predicate — an inline
    * re-implementation would silently diverge from the sizers if
    * parts()/gating ever changes, leaving a sized side joined against
    * a broadcast and re-adding the exchanges the design avoids
    * (round-11 advice). */
  def gateOpen(s: SparkSession, estRows: Long): Boolean =
    parts(estRows) > s.sessionState.conf.numShufflePartitions

  /** A sizing function to apply to EVERY frame meeting at a join (or
    * feeding an aggregate) keyed on `keys`: repartitions to
    * [[parts]](estRows) when that exceeds the session default,
    * identity otherwise. */
  def sizer(s: SparkSession, estRows: Long, keys: Column*): DataFrame => DataFrame =
    if (gateOpen(s, estRows)) df => df.repartition(parts(estRows), keys: _*)
    else identity

  /** Sized TOTAL ORDER on `keys`: `orderBy`'s range exchange also
    * lands on the session default, so a corpus-exploded result (e.g.
    * a pair-shaped audit) puts its whole partition through one sort —
    * the same hazard with RangePartitioning in place of hash. Above
    * the gate this plans range-repartition + in-partition sort
    * (identical global order, sized sorts); below it, plain orderBy. */
  def orderedSizer(s: SparkSession, estRows: Long, keys: Column*): DataFrame => DataFrame =
    if (gateOpen(s, estRows))
      df => df.repartitionByRange(parts(estRows), keys: _*).sortWithinPartitions(keys: _*)
    else df => df.orderBy(keys: _*)
}
