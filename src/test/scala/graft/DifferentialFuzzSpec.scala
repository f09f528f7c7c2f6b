package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential properties ported from the reference's fuzz suites
  * (core/tests/fuzz_cases/: join_fuzz.rs cross-validates NLJ vs HJ vs SMJ;
  * window_fuzz.rs checks bounded vs unbounded window equivalence;
  * aggregate_fuzz.rs checks partial/final agg stability): the same query
  * must produce identical results under different physical strategies and
  * partitionings.
  */
class DifferentialFuzzSpec extends AnyFunSuite {
  import TestSpark._

  private def normalized(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  lazy val li = Tables.load(spark, sfDir, "lineitem").cache()
  lazy val orders = Tables.load(spark, sfDir, "orders").cache()

  test("join strategies agree: broadcast vs shuffle-hash vs sort-merge") {
    for (qty <- Seq(3, 11, 24, 37, 48)) {
      val l = li.filter(col("l_quantity") <= qty)
      def run(hinted: DataFrame): Set[String] = normalized(
        l.join(hinted, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("q")))
      val b = run(orders.hint("broadcast"))
      val sh = run(orders.hint("shuffle_hash"))
      val sm = run(orders.hint("merge"))
      assert(b == sh && sh == sm)
    }
  }

  test("aggregation invariant under repartitioning") {
    for (parts <- Seq(1, 3, 7, 16)) {
      val base = normalized(
        li.groupBy("l_returnflag").agg(count(lit(1)), sum(col("l_quantity")).cast("long")))
      val repart = normalized(
        li.repartition(parts, col("l_suppkey"))
          .groupBy("l_returnflag").agg(count(lit(1)), sum(col("l_quantity")).cast("long")))
      assert(base == repart)
    }
  }

  test("window full-frame aggregate equals groupBy join-back") {
    val w = Window.partitionBy(col("o_orderpriority"))
    val viaWindow = normalized(
      orders.select(col("o_orderkey"), max(col("o_totalprice")).over(w).as("mx")))
    val viaGroup = normalized(
      orders.join(
        orders.groupBy("o_orderpriority").agg(max(col("o_totalprice")).as("mx")),
        "o_orderpriority")
        .select(col("o_orderkey"), col("mx")))
    assert(viaWindow == viaGroup)
  }

  test("running window equals self-join formulation on unique keys") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val viaWindow = normalized(
      orders.filter(col("o_custkey") < 50)
        .select(col("o_orderkey"), count(lit(1)).over(w).as("k")))
    val a = orders.filter(col("o_custkey") < 50)
      .select(col("o_custkey").as("ck"), col("o_orderkey").as("k1"))
    val b = orders.filter(col("o_custkey") < 50)
      .select(col("o_custkey").as("ck"), col("o_orderkey").as("k2"))
    val viaJoin = normalized(
      a.join(b, "ck").where(col("k2") <= col("k1"))
        .groupBy(col("k1").as("o_orderkey")).agg(count(lit(1)).as("k"))
        .select(col("o_orderkey"), col("k")))
    assert(viaWindow == viaJoin)
  }

  test("intersect equals semi-join formulation") {
    val a = orders.filter(col("o_totalprice") < 100000).select("o_orderpriority", "o_orderstatus")
    val b = orders.filter(col("o_orderstatus") === "F").select("o_orderpriority", "o_orderstatus")
    val viaIntersect = normalized(a.intersect(b))
    val viaSemi = normalized(a.distinct().join(b, Seq("o_orderpriority", "o_orderstatus"), "left_semi"))
    assert(viaIntersect == viaSemi)
  }

  test("rollup equals union of group-bys") {
    val viaRollup = normalized(
      li.rollup("l_returnflag", "l_linestatus").agg(count(lit(1)).as("n")))
    val g2 = li.groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("n"))
    val g1 = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .withColumn("l_linestatus", lit(null: String))
      .select("l_returnflag", "l_linestatus", "n")
    val g0 = li.agg(count(lit(1)).as("n"))
      .withColumn("l_returnflag", lit(null: String))
      .withColumn("l_linestatus", lit(null: String))
      .select("l_returnflag", "l_linestatus", "n")
    assert(viaRollup == normalized(g2.unionByName(g1).unionByName(g0)))
  }

  test("distinct count equals exact groupBy count across partitionings") {
    for (parts <- Seq(1, 5, 12)) {
      val d = li.repartition(parts).select(countDistinct(col("l_suppkey"))).collect().head.getLong(0)
      val g = li.select(col("l_suppkey")).distinct().count()
      assert(d == g)
    }
  }

  test("pipeline ops are invariant under input partitioning") {
    // The property a 1000-executor run depends on: hash-split assignment,
    // sequence packing, and duplicate-cluster labels must not depend on how
    // the input happened to be partitioned.
    val names = Seq("sample_split", "pipeline_pack", "dedup_cluster")
    for (name <- names) {
      val base = normalized(SparkEntry.queries(name)(spark, sfDir))
      val conf = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        val alt = normalized(SparkEntry.queries(name)(spark, sfDir))
        assert(alt == base, s"$name changed under different partitioning")
      } finally spark.conf.set("spark.sql.shuffle.partitions", conf)
    }
  }
}
