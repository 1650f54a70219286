package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level BLOOM-FILTER INDEX for point lookups on a non-layout
  * column — the lakehouse data-skipping feature (Delta's
  * `bloomfilter` index, Iceberg puffin blobs; the reference's bronze
  * tables expose only min/max zone pruning, reference
  * `bronze_compaction.py` sort-order rewrite): the table is laid out
  * by one key (here doc_id buckets), but lookups arrive on ANOTHER
  * key (content fingerprint) that min/max envelopes can't prune —
  * every bucket's [min,max] fingerprint range spans the hash space.
  * A per-bucket bloom sidecar (one `graft_bloom_agg` byte blob per
  * data file/bucket) restores skipping: a probe reads the sidecar
  * (buckets rows — bounded metadata, the codebook-collect idiom),
  * keeps only buckets whose bloom might contain it, and pushes the
  * surviving bucket ids as a STATIC partition filter so the data
  * scan prunes at file-listing time. Bloom false positives cost one
  * extra bucket read and die in the exact join; false negatives are
  * impossible, so the lookup is BIT-identical to a full-scan join —
  * which is exactly what q263's DuckDB oracle certifies.
  *
  * Layout: `$path/data` hive-partitioned by bucket (doc_id,
  * fingerprint per row), `$path/bloom` (bucket, bloom bytes), and
  * `$path/_GRAFT_BUILD_OK` written LAST carrying rows+buckets — the
  * IvfIndex completion discipline: an aborted build or a regenerated
  * corpus at the same path triggers a rebuild instead of silently
  * serving stale files.
  */
object BloomIndex {

  private val MarkerFile = "_GRAFT_BUILD_OK"

  /** Test failpoint: invoked in append's non-atomic window, after the
    * data files land but before the sidecar OR-merge and marker
    * refresh (BloomIndexSpec injects a crash here: the stale marker
    * fails the next ensureBuilt's stamp compare, forcing a rebuild
    * instead of serving bloom false negatives). No-op in production.
    * NOTE append is NOT retry-idempotent — re-running append with the
    * same batch after a crash duplicates its rows; the recovery path
    * is ensureBuilt/isValid + rebuild, as specced. */
  private[operators] var failpointAfterDataAppend: () => Unit = () => ()

  private def fs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
  }

  /** One corpus scan: bucket by doc_id, fingerprint the content,
    * persist the bucketed data and the per-bucket bloom sidecar
    * (sized at rows/buckets keys each), then stamp the marker. */
  def build(docs: DataFrame, buckets: Int, path: String): Unit = {
    val sp = docs.sparkSession
    val hfs = fs(sp, path)
    val marker = new org.apache.hadoop.fs.Path(s"$path/$MarkerFile")
    hfs.delete(marker, false)
    val keyed = docs.select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fingerprint"),
      pmod(col("doc_id"), lit(buckets)).cast("int").as("bucket"))
    // cluster by bucket before the partitioned write (r12, guide §6):
    // without it every INPUT partition writes its own file into every
    // bucket dir (p×buckets small files — measured 20×16 after the
    // fanned scan); one exchange keyed on the partition column keeps
    // it at ~one file per bucket at any input parallelism
    keyed.repartition(col("bucket"))
      .write.partitionBy("bucket").mode(SaveMode.Overwrite)
      .parquet(s"$path/data")
    val (rows, fpHash) = contentStamp(sp.read.parquet(s"$path/data"))
    val perBucket = math.max(rows / buckets + 1, 64L)
    sp.read.parquet(s"$path/data")
      .groupBy("bucket")
      .agg(call_function("graft_bloom_agg",
        xxhash64(col("fingerprint")), lit(perBucket)).as("bloom"))
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/bloom")
    val out = hfs.create(marker, true)
    // perbucket freezes the bloom sizing: append must build its delta
    // blooms with IDENTICAL parameters or the byte-wise OR is invalid
    out.write(
      s"rows=$rows\nbuckets=$buckets\nperbucket=$perBucket\nfphash=$fpHash\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** (rows, order-independent content fingerprint) in ONE pass: the
    * xor-fold of xxhash64(doc_id ‖ fingerprint) detects a regenerated
    * corpus with the SAME row count but different text (row count
    * alone would serve the stale index and return pre-regeneration
    * matches). Binding doc_id into the hashed pair matters twice
    * over: (a) a permutation of texts ACROSS doc_ids changes every
    * per-bucket bloom but leaves the multiset of fingerprints — and
    * so any fingerprint-only fold — unchanged; (b) xor cancels
    * duplicate inputs in pairs, and fingerprint-only inputs DO
    * duplicate (exact-dup texts), so even-multiplicity churn was
    * invisible. (doc_id, fingerprint) pairs are unique per row for
    * any sane corpus, so neither hole survives. Xor is commutative,
    * so partition order is irrelevant. */
  private[operators] def stampExpr =
    coalesce(bit_xor(xxhash64(
      concat_ws("|", col("doc_id"), col("fingerprint")))), lit(0L))

  private def contentStamp(data: DataFrame): (Long, Long) = {
    val r = data.agg(count(lit(1)).as("n"), stampExpr.as("h")).head()
    (r.getLong(0), r.getLong(1))
  }

  private def markerKv(spark: SparkSession, path: String): Map[String, String] = {
    val hfs = fs(spark, path)
    val marker = new org.apache.hadoop.fs.Path(s"$path/$MarkerFile")
    if (!hfs.exists(marker)) return Map.empty
    val in = hfs.open(marker)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.linesIterator.flatMap { l =>
      l.split("=", 2) match { case Array(k, v) => Some(k -> v.trim); case _ => None }
    }.toMap
  }

  /** Incremental APPEND under the frozen layout (the IvfIndex
    * `assignOnly` contract for the bloom index): new docs land in
    * their buckets with SaveMode.Append, and the sidecar is updated
    * by byte-wise OR of the delta blooms — valid because bloom
    * filters with identical (bits, hashes) parameters merge by OR
    * (Broder & Mitzenmacher 2004 §4), and `perbucket` was frozen in
    * the marker at build time exactly so deltas size identically.
    * The OR runs on the driver over `buckets` rows of sidecar bytes
    * (bounded index metadata). Appends SATURATE the blooms (set-bit
    * fraction rises, FP rate with it) — `saturation` is the monitor,
    * rebuild via `build` is the reset, mirroring IvfIndex.skewRatio/
    * rebuild. */
  def append(docs: DataFrame, path: String): Unit = {
    val sp = docs.sparkSession
    val kv = markerKv(sp, path)
    val buckets = kv("buckets").toInt
    val perBucket = kv("perbucket").toLong
    val keyed = docs.select(
      col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fingerprint"),
      pmod(col("doc_id"), lit(buckets)).cast("int").as("bucket"))
    keyed.write.partitionBy("bucket").mode(SaveMode.Append)
      .parquet(s"$path/data")
    failpointAfterDataAppend()
    val delta = keyed.groupBy("bucket")
      .agg(call_function("graft_bloom_agg",
        xxhash64(col("fingerprint")), lit(perBucket)).as("bloom"))
      .collect().map(r => r.getAs[Int]("bucket") -> r.getAs[Array[Byte]]("bloom"))
      .toMap
    val existing = sp.read.parquet(s"$path/bloom")
      .collect().map { r =>
        val b = r.getAs[Int]("bucket")
        val cur = r.getAs[Array[Byte]]("bloom")
        val out = delta.get(b) match {
          case Some(d) =>
            require(d.length == cur.length,
              s"bloom size drift on bucket $b: ${d.length} vs ${cur.length}")
            val m = new Array[Byte](cur.length)
            var i = 0
            while (i < m.length) { m(i) = (cur(i) | d(i)).toByte; i += 1 }
            m
          case None => cur
        }
        (b, out)
      }
    // buckets EMPTY at build time have no sidecar row yet — their
    // delta blooms must be APPENDED, not dropped, or docs landing in
    // them are invisible to candidates() (bloom false negatives,
    // breaking the full-scan-equivalence contract)
    val existingBuckets = existing.map(_._1).toSet
    val merged = existing ++
      delta.filter { case (b, _) => !existingBuckets(b) }
    import sp.implicits._
    merged.toSeq.toDF("bucket", "bloom")
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/bloom")
    // refresh the stamp so isValid reflects the appended corpus
    val (rows, fpHash) = contentStamp(sp.read.parquet(s"$path/data"))
    val hfs = fs(sp, path)
    val out = hfs.create(new org.apache.hadoop.fs.Path(s"$path/$MarkerFile"), true)
    out.write(
      s"rows=$rows\nbuckets=$buckets\nperbucket=$perBucket\nfphash=$fpHash\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** Max per-bucket set-bit fraction of the sidecar — the saturation
    * monitor (FP rate ≈ fraction^hashes): appends push it up, and
    * past ~0.5 the skipping power is gone and a rebuild resizes. */
  def saturation(spark: SparkSession, path: String): Double = {
    val rows = spark.read.parquet(s"$path/bloom")
      .collect().map(_.getAs[Array[Byte]]("bloom"))
    rows.map { b =>
      var set = 0L
      b.foreach(x => set += java.lang.Integer.bitCount(x & 0xFF))
      set.toDouble / (b.length * 8L)
    }.max
  }

  /** True iff a completed build exists whose stamp matches. Pass
    * `expectedFpHash` (the xor-fold of xxhash64(doc_id ‖ fingerprint)
    * over the corpus) to ALSO catch a regenerated corpus with the same row
    * count but different text — row count + bucket count alone would
    * serve the stale index. Markers from pre-fphash builds fail the
    * check (forcing one rebuild), which is the safe direction. */
  def isValid(spark: SparkSession, path: String, expectedRows: Long,
              buckets: Int, expectedFpHash: Option[Long] = None): Boolean = {
    val kv = markerKv(spark, path)
    kv.get("rows").contains(expectedRows.toString) &&
      kv.get("buckets").contains(buckets.toString) &&
      expectedFpHash.forall(h => kv.get("fphash").contains(h.toString))
  }

  def ensureBuilt(docs: DataFrame, buckets: Int, path: String): Unit = {
    val sp = docs.sparkSession
    // one pass over docs for (count, content hash) — same cost as the
    // old docs.count() gate, now stale-content-proof; MUST mirror
    // contentStamp's doc_id-bound pair or valid indexes re-build
    val r = docs
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .agg(count(lit(1)).as("n"), stampExpr.as("h")).head()
    if (!isValid(sp, path, r.getLong(0), buckets, Some(r.getLong(1))))
      build(docs, buckets, path)
  }

  /** (probe fp, bucket) candidate pairs. The sidecar is collected to
    * the driver first — `buckets` rows of bloom bytes, bounded index
    * metadata, never data (graft_might_contain requires the bloom as
    * a literal so the probe membership tests constant-fold into one
    * scan-speed projection over the probes: per probe, the array of
    * might-contain bucket ids, exploded). Zero data-file reads. */
  def candidates(spark: SparkSession, path: String, probes: DataFrame): DataFrame = {
    val sidecar = spark.read.parquet(s"$path/bloom")
      .collect().map(r => (r.getAs[Int]("bucket"), r.getAs[Array[Byte]]("bloom")))
    val hits = array(sidecar.map { case (b, bytes) =>
      when(call_function("graft_might_contain", lit(bytes), xxhash64(col("fp"))),
        lit(b)).otherwise(lit(null).cast("int"))
    }.toIndexedSeq: _*)
    probes.select(col("fp"),
        explode(filter(hits, x => x.isNotNull)).as("bucket"))
  }

  /** The data read, pruned to the candidate buckets via a static
    * isin filter — the file-skipping step (spec-asserted to carry
    * PartitionFilters). */
  def readData(spark: SparkSession, path: String, bucketIds: Seq[Int]): DataFrame =
    spark.read.parquet(s"$path/data")
      .filter(col("bucket").isin(bucketIds: _*))

  /** Point lookup: every probe's matching (doc_id, bucket) rows,
    * bit-identical to a full-scan fingerprint join (no bloom false
    * negatives; false positives die in the exact join). */
  def lookup(spark: SparkSession, path: String, probes: DataFrame): DataFrame = {
    val cand = candidates(spark, path, probes)
      .withColumnRenamed("bucket", "cand_bucket")
    // bounded collect: ≤ buckets small ints — the probe-set prune,
    // same idiom as IvfIndex's probed-cid partition filter
    val bucketIds = cand.select("cand_bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    val data = readData(spark, path, bucketIds)
    data.join(cand,
        data("fingerprint") === cand("fp") &&
          data("bucket") === cand("cand_bucket"))
      .select(col("fp"), col("doc_id"), data("bucket").as("bucket"))
  }
}
