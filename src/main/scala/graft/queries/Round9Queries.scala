package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.plans.DataFusionProto
import Q._

/** Round-9 additions: the datafusion-proto BINARY wire extended past the
  * single-input core — JoinNode(7), WindowNode(13), CrossJoinNode(15),
  * UnionNode(19), SubqueryAliasNode(21), DistinctNode(23) per
  * datafusion/proto-models/proto/datafusion.proto:37-57. Each entry emits
  * a plan to LogicalPlanNode bytes, consumes it back, EXECUTES the
  * consumed form, and checks the rows against the DuckDB oracle — a wrong
  * field number, join-key orientation, or frame bound breaks the hash.
  */
object Round9Queries {

  val queries: Map[String, QueryFn] = Map(
    // TPC-H q3-shaped multi-join over the wire: two JoinNodes (equi keys
    // split from the condition), filters, aggregate, sort, limit. Ordered
    // by the unique group key so the limit is deterministic on both sides.
    "dfproto_join_roundtrip" -> { (s, dir) =>
      val cut = java.sql.Timestamp.valueOf("1998-03-15 00:00:00")
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === lit("BUILDING"))
        .select(col("c_custkey"))
      val ords = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit(cut))
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_orderpriority"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit(cut))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val plan = li
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("l_orderkey"))
        .limit(100)
      val bytes = DataFusionProto.emit(plan)
      val back = DataFusionProto.consume(s, bytes, name =>
        if (Tables.names.contains(name)) Some(Tables.load(s, dir, name))
        else None)
      back.select(col("l_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"), r2(col("revenue")).as("revenue"))
    },

    // Window + union + distinct + subquery-alias over the wire: top-2
    // orders per customer via row_number (udwf, ROWS frame) plus a running
    // average (udaf over an explicit frame), the selection unioned with
    // itself and re-deduplicated (UnionNode + DistinctNode), under a
    // SubqueryAliasNode. (custkey, rk) is unique → deterministic limit.
    "dfproto_window_roundtrip" -> { (s, dir) =>
      val base = t(s, dir, "orders")
        .filter(col("o_totalprice") > lit(150000.0))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      val spec = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val win = base
        .withColumn("rk", row_number().over(spec))
        .withColumn("running", avg(col("o_totalprice")).over(
          spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val sel = win.alias("w")
        .filter(col("rk") <= lit(2))
        .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("running"))
      val plan = sel.union(sel).distinct()
        .orderBy(col("o_custkey"), col("rk"))
        .limit(200)
      val bytes = DataFusionProto.emit(plan)
      val back = DataFusionProto.consume(s, bytes, name =>
        if (Tables.names.contains(name)) Some(Tables.load(s, dir, name))
        else None)
      back.select(col("o_custkey"), col("rk").cast("long").as("rk"),
        col("o_orderkey"), r2(col("running")).as("running"))
    })

  val oracleSql: Map[String, String] = Map(
    "dfproto_join_roundtrip" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        | o_orderpriority,
        | floor((sum(l_extendedprice * (1.0 - l_discount)) + 1.37e-4) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem, orders, customer
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_orderkey = o_orderkey
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY l_orderkey LIMIT 100""".stripMargin,
    "dfproto_window_roundtrip" ->
      """WITH w AS (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk,
        |    avg(o_totalprice) OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |  FROM orders WHERE o_totalprice > 150000.0)
        |SELECT DISTINCT o_custkey, rk, o_orderkey,
        |  floor((running + 1.37e-4) * 100 + 0.5) / 100 AS running
        |FROM w WHERE rk <= 2
        |ORDER BY o_custkey, rk LIMIT 200""".stripMargin)
}
