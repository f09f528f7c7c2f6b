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

  test("long keys beyond 2^53 compare exactly (no double coercion)") {
    val s = spark; import s.implicits._
    val big = 1L << 53
    // (big) < (big+1) is true on longs but false after double rounding,
    // since (big+1).toDouble == big.toDouble
    val l = Seq(big, big + 2).toDF("lk")
    val r = Seq(big + 1, big + 3).toDF("rk")
    val rj = RangeJoin.join(l, "lk", "<", r, "rk")
    val expect = l.join(r, col("lk") < col("rk")).count()
    assert(expect == 3L)
    assert(rj.count() == expect)
  }

  test("string keys order lexicographically") {
    val s = spark; import s.implicits._
    val l = Seq("b", "d").toDF("lk")
    val r = Seq("a", "c", "e").toDF("rk")
    val rj = RangeJoin.join(l, "lk", "<", r, "rk")
    assert(rj.count() == l.join(r, col("lk") < col("rk")).count())
  }

  test("date keys are supported") {
    val s = spark; import s.implicits._
    val l = Seq("2024-01-10", "2024-03-01").toDF("d").select(to_date(col("d")).as("lk"))
    val r = Seq("2024-01-01", "2024-02-01", "2024-04-01").toDF("d").select(to_date(col("d")).as("rk"))
    val rj = RangeJoin.join(l, "lk", "<=", r, "rk")
    assert(rj.count() == l.join(r, col("lk") <= col("rk")).count())
  }

  for (op <- Seq("<", "<=", ">", ">=")) {
    test(s"partitioned range join '$op' matches BroadcastNestedLoopJoin") {
      val rj = RangeJoin.joinPartitioned(cust, "c_acctbal", op, sup, "s_acctbal",
        numBuckets = 8)
      assert(rj.count() == viaBnlj(op))
    }
  }

  test("partitioned range join survives a constant-key build side") {
    val s = spark; import s.implicits._
    val l = Seq(0.5, 1.5).toDF("lk")
    val r = Seq(1.0, 1.0, 1.0).toDF("rk")
    val rj = RangeJoin.joinPartitioned(l, "lk", "<", r, "rk", numBuckets = 4)
    assert(rj.count() == 3) // only 0.5 < 1.0, three times
  }

  test("mismatched key types are rejected up front") {
    val s = spark; import s.implicits._
    val l = Seq(1L).toDF("lk")
    val r = Seq("a").toDF("rk")
    intercept[IllegalArgumentException] {
      RangeJoin.join(l, "lk", "<", r, "rk")
    }
  }
}
