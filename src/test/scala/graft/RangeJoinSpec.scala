package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.RangeJoin

/** The custom range-join physical operator must agree with Catalyst's
  * BroadcastNestedLoopJoin on every operator variant. */
class RangeJoinSpec extends AnyFunSuite {
  import TestSpark._

  lazy val cust = Tables.load(spark, sfDir, "customer")
    .select(col("c_custkey"), col("c_acctbal"))
  lazy val sup = Tables.load(spark, sfDir, "supplier")
    .select(col("s_suppkey"), col("s_acctbal"))

  private def viaBnlj(op: String): Long = {
    val cond = op match {
      case "<"  => col("c_acctbal") <  col("s_acctbal")
      case "<=" => col("c_acctbal") <= col("s_acctbal")
      case ">"  => col("c_acctbal") >  col("s_acctbal")
      case ">=" => col("c_acctbal") >= col("s_acctbal")
    }
    cust.join(sup, cond).count()
  }

  for (op <- Seq("<", "<=", ">", ">=")) {
    test(s"range join '$op' matches BroadcastNestedLoopJoin") {
      val rj = RangeJoin.join(cust, "c_acctbal", op, sup, "s_acctbal")
      assert(rj.count() == viaBnlj(op))
    }
  }

  test("range join output columns and values are usable downstream") {
    val rj = RangeJoin.join(cust, "c_acctbal", "<", sup, "s_acctbal")
      .groupBy("s_suppkey").agg(count(lit(1)).as("n"))
    val expect = cust.join(sup, col("c_acctbal") < col("s_acctbal"))
      .groupBy("s_suppkey").agg(count(lit(1)).as("n"))
    assert(rj.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      expect.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("plan actually uses RangeJoinExec") {
    val rj = RangeJoin.join(cust, "c_acctbal", "<", sup, "s_acctbal")
    assert(rj.queryExecution.executedPlan.toString.contains("RangeJoin"))
  }
}
