package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks most recent right row at-or-before each left ts") {
    val left = Seq(
      (1L, "k1", 10L), (2L, "k1", 20L), (3L, "k1", 35L),
      (4L, "k2", 15L), (5L, "k3", 5L)
    ).toDF("id", "key", "t")
    val right = Seq(
      ("k1", 10L, "a"), ("k1", 30L, "b"), ("k2", 20L, "c")
    ).toDF("key", "t", "v")

    val out = AsofJoin.asofJoin(left, right, "key", "t", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[String])].collect().toMap

    assert(out(1L).contains("a")) // tie: left.t == right.t matches (>= inclusive)
    assert(out(2L).contains("a")) // 20 >= 10, < 30
    assert(out(3L).contains("b")) // most recent of {10,30}
    assert(out(4L).isEmpty)       // right k2 is at 20 > 15 → no match
    assert(out(5L).isEmpty)       // no right rows for k3
  }

  test("asofJoin carries values row-atomically: null in the latest right row stays null") {
    val left = Seq((1L, "k", 30L)).toDF("id", "key", "t")
    val right = Seq(
      ("k", 10L, Option("v1a"), Option("v2a")),
      ("k", 20L, Option.empty[String], Option("v2b")) // latest row: v1 is NULL
    ).toDF("key", "t", "v1", "v2")
    val out = AsofJoin.asofJoin(left, right, "key", "t", Seq("v1", "v2"))
      .select("asof_v1", "asof_v2")
      .as[(Option[String], Option[String])].collect().head
    assert(out === ((None, Some("v2b")))) // NOT (v1a, v2b) from mixed rows
  }

  test("asofJoin keeps every left row exactly once") {
    val left = Seq((1L, "k", 1L), (2L, "k", 2L), (3L, "k", 3L)).toDF("id", "key", "t")
    val right = Seq(("k", 1L, "x"), ("k", 2L, "y")).toDF("key", "t", "v")
    assert(AsofJoin.asofJoin(left, right, "key", "t", Seq("v")).count() === 3)
  }
}
