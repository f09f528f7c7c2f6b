package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scale

class ScaleSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 10k rows, 90% on one hot key
    val left = spark.range(10000)
      .select((when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id"))).as("k"),
        col("id").as("v"))
    val right = (1L to 100L).toDF("rk").withColumn("payload", col("rk") * 10)
    val plain = left.join(right, col("k") === col("rk"))
      .agg(count(lit(1)), sum(col("v") + col("payload")).cast("long"))
      .collect().head
    val salted = Scale.saltedJoin(left, right, "k", "rk", 8)
      .agg(count(lit(1)), sum(col("v") + col("payload")).cast("long"))
      .collect().head
    assert(plain == salted)
  }

  test("bucketed join plans without a shuffle on the bucket key") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
    Scale.writeBucketed(li, "li_bucketed", "l_orderkey", 4)
    Scale.writeBucketed(o, "o_bucketed", "o_orderkey", 4)
    // force a non-broadcast join so the assertion actually exercises the
    // bucketed (pre-partitioned) layout rather than a broadcast shortcut
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it's still correct
      val expect = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
