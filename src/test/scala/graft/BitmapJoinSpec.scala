package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BitmapJoin
import graft.plans.BroadcastAdvisor.ColStats

class BitmapJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("buildFlagBitmaps sets exists/flag bits exactly for the input keys") {
    import spark.implicits._
    val df = Seq((3L, true), (64L, false), (700L, true), (0L, false))
      .toDF("k", "f")
    val (ex, fl) = BitmapJoin.buildFlagBitmaps(df, "k", "f")
    def bit(arr: Array[Long], k: Long): Boolean = {
      val w = (k >> 6).toInt
      w < arr.length && (arr(w) & (1L << (k & 63))) != 0
    }
    for (k <- Seq(0L, 3L, 64L, 700L)) assert(bit(ex, k), s"exists($k)")
    for (k <- Seq(1L, 2L, 63L, 65L, 699L, 701L, 10000L))
      assert(!bit(ex, k), s"!exists($k)")
    assert(bit(fl, 3L) && bit(fl, 700L))
    assert(!bit(fl, 64L) && !bit(fl, 0L))
  }

  test("NULL build keys are skipped — no phantom bit for key 0") {
    import spark.implicits._
    val df = Seq((java.lang.Long.valueOf(3L), java.lang.Boolean.TRUE),
      (null.asInstanceOf[java.lang.Long], java.lang.Boolean.TRUE))
      .toDF("k", "f")
    val (ex, fl) = BitmapJoin.buildFlagBitmaps(df, "k", "f")
    def bit(arr: Array[Long], k: Long): Boolean = {
      val w = (k >> 6).toInt
      w < arr.length && (arr(w) & (1L << (k & 63))) != 0
    }
    assert(bit(ex, 3L) && bit(fl, 3L))
    assert(!bit(ex, 0L), "NULL key must not set bit 0 (never equi-matches)")
    assert(!bit(fl, 0L))
  }

  test("flagProbe is tri-state: flag for present keys, NULL for absent") {
    import spark.implicits._
    val df = Seq((5L, true), (9L, false)).toDF("k", "f")
    val (ex, fl) = BitmapJoin.buildFlagBitmaps(df, "k", "f")
    val probe = BitmapJoin.flagProbe(spark, ex, fl)
    val out = Seq(5L, 9L, 7L).toDF("k")
      .select(col("k"), probe(col("k")).as("hi"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null
        else java.lang.Boolean.valueOf(r.getBoolean(1)))).toMap
    assert(out(5L) == java.lang.Boolean.TRUE)
    assert(out(9L) == java.lang.Boolean.FALSE)
    assert(out(7L) == null, "absent key probes NULL (inner-join drop)")
  }

  test("empty build side probes everything NULL") {
    import spark.implicits._
    val df = Seq.empty[(Long, Boolean)].toDF("k", "f")
    val (ex, fl) = BitmapJoin.buildFlagBitmaps(df, "k", "f")
    assert(ex.isEmpty && fl.isEmpty)
    val probe = BitmapJoin.flagProbe(spark, ex, fl)
    val out = Seq(1L, 100L).toDF("k").select(probe(col("k")).as("h"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("gate: fits-threshold and non-negative keys required") {
    val small = Some(ColStats(8.0, Some(1L), Some(6000000L)))
    val huge = Some(ColStats(8.0, Some(1L), Some(Long.MaxValue / 2)))
    val negative = Some(ColStats(8.0, Some(-5L), Some(100L)))
    assert(BitmapJoin.gate(spark, small), "6M keys = 2x750KB fits 64MB")
    assert(!BitmapJoin.gate(spark, huge), "past-threshold bitset falls back")
    assert(!BitmapJoin.gate(spark, negative), "negative keys fall back")
    assert(!BitmapJoin.gate(spark, None), "no stats falls back")
  }

  test("q12 bitmap plan equals the shuffle-join form at sf0.001") {
    val dir = sfDir
    val viaBitmap = SparkEntry.queries("q12_shipmode")(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    graft.queries.Q.fixtureViews(spark, dir)
    val viaJoin = spark.sql(
      """SELECT l_linestatus,
        |  sum(CASE WHEN os.hi THEN 1 ELSE 0 END) AS high_line_count,
        |  sum(CASE WHEN os.hi THEN 0 ELSE 1 END) AS low_line_count
        |FROM lineitem,
        |  (SELECT o_orderkey,
        |     o_orderpriority IN ('1-URGENT', '2-HIGH') AS hi FROM orders) os
        |WHERE l_orderkey = os.o_orderkey
        |  AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |GROUP BY l_linestatus""".stripMargin)
      .collect().map(_.toString).sorted.toSeq
    assert(viaBitmap == viaJoin)
  }
}
