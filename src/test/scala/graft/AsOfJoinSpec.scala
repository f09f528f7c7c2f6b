package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

/** Edge-case behavior of the window-based as-of join:
  * equal-timestamp inclusion, no-match nulls, carry across many rights. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("asOf: matches latest <= ts, equal ts included, no match is null") {
    val right = Seq((1L, 5L, "a"), (1L, 10L, "b"), (2L, 100L, "z"))
      .toDF("k", "rts", "pay")
    val left = Seq((1L, 3L, "p0"), (1L, 5L, "p1"), (1L, 7L, "p2"),
        (1L, 12L, "p3"), (2L, 99L, "p4"), (3L, 50L, "p5"))
      .toDF("k", "lts", "tag")
    val out = AsOfJoin.asOf(left, right, "k", "lts", "rts", Seq("pay"))
      .select("tag", "pay").as[(String, String)].collect().toMap
    assert(out == Map(
      "p0" -> null, // before any right row
      "p1" -> "a",  // equal ts: right row at same instant is visible
      "p2" -> "a",
      "p3" -> "b",  // latest of two preceding rights
      "p4" -> null, // right exists for key but only later
      "p5" -> null)) // key absent on right side
  }

  test("asOf: single shuffle by key, no join node in the plan") {
    val right = Seq((1L, 5L, "a")).toDF("k", "rts", "pay")
    val left = Seq((1L, 7L, "p")).toDF("k", "lts", "tag")
    val plan = AsOfJoin.asOf(left, right, "k", "lts", "rts", Seq("pay"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in plan:\n$plan")
    assert(plan.contains("Window"))
  }
}
