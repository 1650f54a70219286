package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract registry invariants, as a test: no module can
  * shadow another's query in the ++ fold, every oracle belongs to a
  * registered query, and every query has an oracle (this repo's
  * stronger-than-required invariant — the driver allows rows-only
  * checks, but an oracle-less query here would mean one slipped in
  * unverified). */
class RegistrySpec extends AnyFunSuite {

  test("query and oracle registries merge without shadowing or orphans") {
    val q = SparkEntry.queries   // throws on cross-module duplicates
    val o = SparkEntry.oracleSql // throws on duplicates and orphans
    assert(q.nonEmpty && o.nonEmpty)
    val unverified = q.keySet -- o.keySet
    assert(unverified.isEmpty,
      s"queries without a DuckDB oracle (would only get rows-only checks): $unverified")
  }

  test("query names follow the qNN_name convention with unique numbers") {
    val names = SparkEntry.queries.keySet
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")), "non-conforming name")
    val nums = names.map(_.takeWhile(_ != '_'))
    // Bench's short-key JSON mode relies on distinct qNN prefixes
    assert(nums.size == names.size, "duplicate qNN prefix would collide Bench short keys")
  }
}
