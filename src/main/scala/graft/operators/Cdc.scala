package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture between two table states (the change-feed
  * face a snapshot-versioned lakehouse exposes — compare Delta CDF /
  * Iceberg changelog): a keyed full-outer diff labeling every row
  * insert / delete / update / unchanged, with before/after values.
  *
  * Scale design: ONE full-outer sort-merge join on the key — the same
  * cost as any keyed reconciliation; change detection is a null-safe
  * column comparison (no hashing, no serialization format to agree
  * on cross-engine). Pairs with sources.SnapshotTable.readVersion to
  * diff any two committed versions.
  */
object Cdc {

  /** Diff `after` against `before` on `keyCols`. Output: key columns,
    * `op`, and for every non-key column c both `c_before` and
    * `c_after` (delete rows carry only *_before, inserts only
    * *_after). Set keepUnchanged=true to emit unchanged rows too. */
  def snapshotDiff(before: DataFrame, after: DataFrame, keyCols: Seq[String],
                   keepUnchanged: Boolean = false): DataFrame = {
    val valueCols = before.columns.filterNot(keyCols.contains).toSeq
    require(keyCols.forall(before.columns.contains) && keyCols.forall(after.columns.contains),
      s"snapshotDiff key columns ${keyCols.mkString(",")} must exist in both sides " +
        s"(before: ${before.columns.mkString(",")}; after: ${after.columns.mkString(",")})")
    require(valueCols.toSet == after.columns.filterNot(keyCols.contains).toSet,
      s"snapshotDiff requires matching non-key columns, got " +
        s"${valueCols.mkString(",")} vs ${after.columns.filterNot(keyCols.contains).mkString(",")}")
    require(!before.columns.contains("op") && !after.columns.contains("op"),
      "snapshotDiff output reserves the column name 'op'; rename it on both sides first")
    val beforeTypes = before.schema.map(f => f.name -> f.dataType).toMap
    val afterTypes = after.schema.map(f => f.name -> f.dataType).toMap
    val mismatched = (keyCols ++ valueCols).filter(c => beforeTypes(c) != afterTypes(c))
    require(mismatched.isEmpty,
      s"snapshotDiff column types differ between sides: " +
        mismatched.map(c => s"$c (${beforeTypes(c).sql} vs ${afterTypes(c).sql})").mkString(", "))
    // keys are renamed per side and matched NULL-SAFELY (<=>): a
    // plain key-list join would never match null keys, reporting an
    // unchanged null-key row as a spurious delete + insert
    val b = before.select(
      (keyCols.map(k => col(k).as(s"_bk_$k")) :+ lit(true).as("_b_present")) ++
        valueCols.map(c => col(c).as(s"${c}_before")): _*)
    val a = after.select(
      (keyCols.map(k => col(k).as(s"_ak_$k")) :+ lit(true).as("_a_present")) ++
        valueCols.map(c => col(c).as(s"${c}_after")): _*)
    val keyMatch = keyCols
      .map(k => col(s"_bk_$k") <=> col(s"_ak_$k"))
      .reduce(_ && _)
    val changed: Column = valueCols
      .map(c => !(col(s"${c}_before") <=> col(s"${c}_after")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val diffed = b.join(a, keyMatch, "full_outer")
      .withColumn("op",
        when(col("_b_present").isNull, "insert")
          .when(col("_a_present").isNull, "delete")
          .when(changed, "update")
          .otherwise("unchanged"))
      .select(
        keyCols.map(k => coalesce(col(s"_bk_$k"), col(s"_ak_$k")).as(k)) ++
          Seq(col("op")) ++
          valueCols.flatMap(c => Seq(col(s"${c}_before"), col(s"${c}_after"))): _*)
    if (keepUnchanged) diffed else diffed.filter(col("op") =!= "unchanged")
  }
}
