package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** Distributed suffix ranking by prefix doubling — the exact
  * repeated-substring primitive behind suffix-array dedup
  * (Lee et al. 2022 "Deduplicating Training Data Makes Language
  * Models Better" builds the same structure with a single-machine
  * suffix array; reference `dbt_project` has no equivalent — this is
  * a scale-path extension).
  *
  * ranks(i) = lexicographic dense rank of the suffix text[pos..] of
  * each document, truncated to `maxLen` chars, among ALL suffixes of
  * all documents. Classic prefix doubling (Manber–Myers 1990): after
  * the round with shift k, ranks order suffixes by their first 2k
  * chars; O(log maxLen) rounds total.
  *
  * Spark shape per round — two exchanges, no global window, no join:
  *   1. `lead(rank, k)` over a PER-DOCUMENT window (partitions
  *      bounded by maxLen rows) pairs each suffix with the rank k
  *      positions ahead (sentinel -1 past the end, so a short suffix
  *      sorts before every extension — exactly string order);
  *   2. dense rank of the (rank, nextRank) pairs via range
  *      repartition + in-partition scan + a P-row driver collect of
  *      per-partition (count, changes, boundary pairs) — the
  *      PrefixSum two-phase pattern; a pair group spanning a
  *      partition boundary is stitched by comparing each partition's
  *      first pair with its predecessor's last.
  * Rounds early-stop when every rank is distinct (total order
  * reached), and each round cuts lineage ([[Lineage.cut]]) so the
  * logical plan stays O(1) across rounds.
  *
  * 100 TB notes: state per row is (docId, pos, rank) — 3 longs + an
  * int, independent of maxLen; the only driver state is P stats rows
  * per round. The truncation budget `maxLen` is the explicit knob: it
  * bounds per-doc window size, round count (log2 maxLen), and the
  * suffix-string bytes the downstream LCP panel touches.
  */
object SuffixRank {

  // (pid, rows, changes, (firstR1, firstR2), (lastR1, lastR2)) —
  // Encoders.tuple, not a nested case class: janino can't codegen
  // object-nested case-class constructors (falls back to interpreted)
  private type PairStats = (Int, Long, Long, (Long, Long), (Long, Long))
  private val pairStatsEnc = Encoders.tuple(
    Encoders.scalaInt, Encoders.scalaLong, Encoders.scalaLong,
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))

  private val frameSchema = new StructType()
    .add("_id", LongType, nullable = false)
    .add("_pos", IntegerType, nullable = false)
    .add("_r1", LongType, nullable = false)

  /** Per-round probe record for the growth-attribution harness
    * (graft.SuffixRankProbe): doubling shift k, distinct pair count
    * after the round, seconds in the dense-rank stats leg (range
    * exchange + in-partition sort + persist + P-row collect) and in
    * the rank-apply leg (offset map + lineage-cut materialization).
    * The callback costs nothing when unused (default no-op). */
  final case class RoundProbe(shift: Int, distinct: Long,
                              statsSecs: Double, applySecs: Double)

  /** Test hook: forces the two-column sort path that production only
    * takes past 2^31 suffix rows, so SuffixRankPropertySpec can pin
    * packed ≡ unpacked at testable sizes. */
  private[operators] var forceUnpacked: Boolean = false

  /** (doc_id, pos, rank) for every suffix of `textCol` truncated at
    * `maxLen` chars; `rank` is dense over the whole corpus and equal
    * ranks mean equal (truncated) suffix strings. */
  def ranks(docs: DataFrame, idCol: String, textCol: String,
            maxLen: Int,
            onRound: RoundProbe => Unit = _ => ()): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    // one row per character of the truncated text; initial rank =
    // code point (order-preserving; dense-ness is not required, only
    // the early-stop check needs true dense ranks and that uses the
    // per-round distinct count, not the initial one)
    var cur = Lineage.cut(docs
      .select(col(idCol).cast("long").as("_id"),
        substring(col(textCol), 1, maxLen).as("_t"))
      .select(col("_id"), posexplode(split(col("_t"), "")))
      .filter(length(col("col")) === 1) // split() may emit a trailing ""
      .select(col("_id"), col("pos").cast("int").as("_pos"),
        ascii(col("col")).cast("long").as("_r1")))
    // suffix count + max code point in ONE cache-scan job (the count
    // the old path already paid, now also feeding the seed-width gate)
    val st = cur.agg(
      count(lit(1)), coalesce(max(col("_r1")), lit(0L))).head()
    val total = st.getLong(0)
    val maxCode = st.getLong(1)
    // Packed multi-char SEED ROUND (round 12): the first dense-rank
    // round packs w chars per side of the pair via w-1 extra `lead`s
    // in the SAME per-doc window pass round 1 already pays, so one
    // round orders by the first 2w chars instead of 2 — removing
    // log2(w) full rounds (each a window pass + range sort + stats
    // collect + rank apply over the whole suffix frame, at any corpus
    // size; 8 → 6 rounds at the 240-char budget). Lane value =
    // code + 1 with 0 for past-end, so a short suffix sorts before
    // every extension (exactly string order); lanes pack big-endian,
    // an order-preserving injection. Width is gated by the OBSERVED
    // max code point so each packed side fits 28 bits (< 2^31, the
    // packed-pair sort-key bound): 4×7-bit lanes for codes ≤ 126
    // (ASCII), 3×8-bit lanes for ≤ 254 (Latin-1); higher code points
    // (incl. surrogate halves, where code-unit order diverges from
    // code-point order) keep the single-char round 1 unchanged.
    // (An explode-time seed carrying the text column was tried first
    // and measured SLOWER — the 240-byte string rode every exploded
    // row through the generator; the window already has the
    // neighboring chars for free.)
    val w =
      if (maxLen <= 1) 1
      else if (maxCode <= 126L) 4
      else if (maxCode <= 254L) 3
      else 1
    val laneBits = if (maxCode <= 126L) 7 else 8
    // Packed-pair sort (round-9, the q250 residual-time item): when
    // every rank fits in 31 bits — ranks are dense after round 1, so
    // bounded by the suffix-row count; round-0 values are code points
    // (≤ 0x10FFFF) — (_r1,_r2) packs ORDER-PRESERVINGLY into one long,
    // (_r1 << 32) + (_r2 + 2). A single long sort key keeps the whole
    // ordering inside the 8-byte sort prefix, so the in-partition
    // sorts run pure radix (the two-column sort falls back to the
    // record comparator on every prefix tie — and a dense-rank frame
    // is MOSTLY prefix ties), and the sorted frame ships 3 longs per
    // row instead of 4 through every range exchange. Corpora past
    // 2^31 suffix rows (≈150 TB of text at the 240-char budget) take
    // the unpacked path unchanged.
    val packable = !forceUnpacked && total < ((1L << 31) - 2L)
    // Partition count must track the SUFFIX ROW count, not the
    // session default: at sf10 the frame is ~1.4e9 rows, and 8
    // session partitions would put ~175M rows (≈5 GB) in every
    // in-partition sort — guaranteed external-sort spill (measured:
    // 19 GB spill, time exponent 1.21 vs shuffle exponent 0.98 in
    // the r8 sweep). ~8M rows (~250 MB) per partition sorts
    // in-memory; the two-phase stitch is P-row driver state, so the
    // 4096 cap keeps that bounded at any corpus size.
    val parts = math.max(
      docs.sparkSession.sessionState.conf.numShufflePartitions,
      math.min(4096L, total / 8000000L + 1L).toInt)
    val perDoc = Window.partitionBy("_id").orderBy("_pos")
    // maxLen == 1 never enters the doubling loop, which is the only
    // place ranks get DENSE-ranked — without this pass the output
    // would be raw code points (correct order, wrong contract; found
    // by SuffixRankPropertySpec's degenerate corpus)
    // NOTE (round 12, measured rejection): caching the windowed frame
    // across the range exchange's two passes (sampling + real) was
    // tried to kill the window recompute the sampler pays — and made
    // q250 ~50% SLOWER at sf0.1 (13.7 → 21.0 s, same-subset A/B):
    // DataFrame persist materializes a columnar InMemoryRelation, and
    // its per-round encode/decode costs more than the in-partition
    // re-sort it saves. The recompute stays.
    if (maxLen == 1) {
      val (ranked, sorted, _) =
        denseRankByPair(cur.withColumn("_r2", lit(-1L)), parts, packable)
      cur = Lineage.cut(ranked)
      sorted.unpersist(blocking = false)
    }
    // lane from a char code (a lead of _r1 in the seed round): real
    // char c → c+1, past-end sentinel -1 → 0
    def lv(c: org.apache.spark.sql.Column) =
      when(c >= 0L, c + 1L).otherwise(lit(0L))
    def packLanes(cs: Seq[org.apache.spark.sql.Column]) =
      cs.zipWithIndex.map { case (c, j) =>
        shiftleft(lv(c), (cs.size - 1 - j) * laneBits)
      }.reduce(_ + _)
    var k = 1
    var done = false
    var seedRound = true
    while (k < maxLen && !done) {
      // pre-hash to `parts` on _id: HashPartitioning(_id, parts)
      // satisfies the window's ClusteredDistribution, so the window
      // sort runs in the sized partitions instead of re-exchanging
      // to the session default (8 session partitions at sf10 put
      // ~175M rows in every window sort — the remaining spill source
      // after the dense-rank sorts were sized)
      val t0 = System.nanoTime()
      val rehashed = cur.repartition(parts, col("_id"))
      val paired =
        if (seedRound) {
          // seed round: pair = (pack of chars [i, i+w), pack of chars
          // [i+w, i+2w)) from 2w-1 leads in ONE window pass — orders
          // by the first 2w chars in a single dense-rank round
          val leads = (1 until 2 * w).map(j =>
            lead(col("_r1"), j, -1L).over(perDoc))
          rehashed.select(col("_id"), col("_pos"),
            packLanes(col("_r1") +: leads.take(w - 1)).as("_r1"),
            packLanes(leads.drop(w - 1)).as("_r2"))
        } else rehashed.withColumn("_r2",
          lead(col("_r1"), k, -1L).over(perDoc))
      val (ranked, sorted, distinctCnt) = denseRankByPair(paired, parts, packable)
      val t1 = System.nanoTime()
      cur = Lineage.cut(ranked) // eager: materializes before unpersist
      val t2 = System.nanoTime()
      sorted.unpersist(blocking = false)
      onRound(RoundProbe(k, distinctCnt, (t1 - t0) / 1e9, (t2 - t1) / 1e9))
      done = distinctCnt == total
      // after the seed round ranks order by 2w chars; classic doubling
      // from there
      k = if (seedRound) 2 * w else k * 2
      seedRound = false
    }
    cur.select(col("_id").as(idCol), col("_pos").as("pos"),
      col("_r1").as("rank"))
  }

  /** Dense rank of (_r1,_r2) pairs over a (_id,_pos,_r1,_r2) frame.
    * Returns (frame with _r1 := new rank and _r2 dropped, the
    * persisted sorted frame for the caller to unpersist AFTER
    * materializing, distinct pair count). `packed` routes through the
    * single-long sort key (see ranks() — radix sort + one fewer
    * column per sorted row); both paths produce identical ranks
    * because the packing is an order-preserving injection. */
  private def denseRankByPair(df: DataFrame, n: Int,
                              packed: Boolean): (DataFrame, DataFrame, Long) = {
    if (packed) return denseRankByPackedPair(df, n)
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(n, col("_r1"), col("_r2"))
      .sortWithinPartitions("_r1", "_r2")
      .persist()
    val stats = sorted.select("_r1", "_r2")
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          val f1 = first.getLong(0); val f2 = first.getLong(1)
          var l1 = f1; var l2 = f2
          var rows = 1L; var changes = 0L
          while (it.hasNext) {
            val r = it.next()
            val a = r.getLong(0); val b = r.getLong(1)
            if (a != l1 || b != l2) changes += 1
            l1 = a; l2 = b; rows += 1
          }
          Iterator((TaskContext.getPartitionId(), rows, changes,
            (f1, f2), (l1, l2)): PairStats)
        }
      }(pairStatsEnc)
      .collect()
      .sortBy(_._1)
    // driver stitch: offset per partition = distinct pairs before it,
    // minus 1 when its first pair continues the previous partition's
    // last group (equal pairs CAN span a range boundary)
    val offsets = new Array[Long](n)
    var off = 0L
    var prev: Option[(Long, Long)] = None
    stats.foreach { case (pid, _, changes, first, last) =>
      val continues = prev.contains(first)
      offsets(pid) = off - (if (continues) 1L else 0L)
      off += (changes + 1L) - (if (continues) 1L else 0L)
      prev = Some(last)
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val out = sorted.mapPartitions { it =>
      val base = bc.value(TaskContext.getPartitionId())
      var localDense = 0L
      var l1 = 0L; var l2 = 0L; var started = false
      it.map { row =>
        val a = row.getLong(2); val b = row.getLong(3)
        if (started && (a != l1 || b != l2)) localDense += 1
        started = true; l1 = a; l2 = b
        Row(row.getLong(0), row.getInt(1), base + localDense)
      }
    }(Encoders.row(frameSchema))
    (out, sorted, off)
  }

  // (pid, rows, changes, firstPk, lastPk) for the packed path
  private val packedStatsEnc = Encoders.tuple(
    Encoders.scalaInt, Encoders.scalaLong, Encoders.scalaLong,
    Encoders.scalaLong, Encoders.scalaLong)

  /** The packed-key twin of the two-column path above: sort, count
    * changes, and stitch on ONE long (_pk = (_r1 << 32) + _r2 + 2).
    * Same two-phase shape, same driver state (P stats rows), same
    * output schema. */
  private def denseRankByPackedPair(df: DataFrame,
                                    n: Int): (DataFrame, DataFrame, Long) = {
    val spark = df.sparkSession
    val sorted = df
      .select(col("_id"), col("_pos"),
        (shiftleft(col("_r1"), 32) + col("_r2") + lit(2L)).as("_pk"))
      .repartitionByRange(n, col("_pk"))
      .sortWithinPartitions("_pk")
      .persist()
    val stats = sorted.select("_pk")
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next().getLong(0)
          var last = first
          var rows = 1L; var changes = 0L
          while (it.hasNext) {
            val v = it.next().getLong(0)
            if (v != last) changes += 1
            last = v; rows += 1
          }
          Iterator((TaskContext.getPartitionId(), rows, changes, first, last))
        }
      }(packedStatsEnc)
      .collect()
      .sortBy(_._1)
    val offsets = new Array[Long](n)
    var off = 0L
    var prev = Long.MinValue // _pk is always ≥ 1, so MinValue never matches
    stats.foreach { case (pid, _, changes, first, last) =>
      val continues = prev == first
      offsets(pid) = off - (if (continues) 1L else 0L)
      off += (changes + 1L) - (if (continues) 1L else 0L)
      prev = last
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val out = sorted.mapPartitions { it =>
      val base = bc.value(TaskContext.getPartitionId())
      var localDense = 0L
      var lastPk = Long.MinValue
      it.map { row =>
        val pk = row.getLong(2)
        if (lastPk != Long.MinValue && pk != lastPk) localDense += 1
        lastPk = pk
        Row(row.getLong(0), row.getInt(1), base + localDense)
      }
    }(Encoders.row(frameSchema))
    (out, sorted, off)
  }

  /** Global sequential index (0-based) in `sortCols` order, appended
    * as `outCol` — the scale-safe stand-in for an unpartitioned
    * `row_number()` window (same two-phase shape as
    * [[PrefixSum.withRunningSum]]; `sortCols` must be a unique key).
    * Lineage is cut before returning, so the internal persist is
    * already released. */
  def zipWithIndex(df: DataFrame, sortCols: Seq[String],
                   outCol: String = "_gi", minPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    // callers indexing data-sized frames pass minPartitions derived
    // from a known row count so the in-partition sorts stay in memory
    // regardless of the session default (same rationale as ranks())
    val n = math.max(spark.sessionState.conf.numShufflePartitions,
      minPartitions)
    val sorted = df
      .repartitionByRange(n, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .persist()
    val counts = sorted
      .mapPartitions(it =>
        Iterator((TaskContext.getPartitionId(), it.size.toLong))
      )(Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong))
      .collect()
    val offsets = new Array[Long](n)
    counts.sortBy(_._1).foreach { case (pid, rows) =>
      if (pid + 1 < n) offsets(pid + 1) = rows
    }
    var i = 1
    while (i < n) { offsets(i) += offsets(i - 1); i += 1 }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = sorted.schema.add(outCol, LongType, nullable = false)
    val out = sorted.mapPartitions { it =>
      var idx = bc.value(TaskContext.getPartitionId())
      it.map { row =>
        val r = Row.fromSeq(row.toSeq :+ idx)
        idx += 1
        r
      }
    }(Encoders.row(outSchema))
    val res = Lineage.cut(out)
    sorted.unpersist(blocking = false)
    res
  }
}
