package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.plans.{DataFusionProto, DataFusionProtoPhysical}
import Q._

/** Round-11 additions: the PhysicalPlanNode wire extended to joins,
  * unions and windows — HashJoinExecNode(9), WindowAggExecNode(15),
  * CrossJoinExecNode(16), UnionExecNode(19), NestedLoopJoinExecNode(22),
  * SortMergeJoinExecNode(34) (datafusion/proto-models/proto/
  * datafusion.proto:871-896), with JoinOn(:1394) /
  * JoinFilter+ColumnIndex(:1560-1569) / PhysicalWindowExprNode(:1101)
  * operands. Each entry serializes the Spark PHYSICAL plan, consumes the
  * bytes back on the session, executes the consumed form and compares
  * against the DuckDB oracle.
  */
object Round11Queries {

  private def tf(s: org.apache.spark.sql.SparkSession, dir: String)
      : String => Option[org.apache.spark.sql.DataFrame] =
    name => if (Tables.names.contains(name)) Some(Tables.load(s, dir, name))
    else None

  val queries: Map[String, QueryFn] = Map(
    // q3-shaped physical join plan across the wire: customer⨝orders⨝
    // lineitem with a broadcast build (HashJoinExecNode partition modes),
    // aggregated and TopK'd — the reference's "serialize a physical join
    // plan, re-plan on the receiving engine" contract.
    "dfproto_physical_join_roundtrip" -> { (s, dir) =>
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      val plan = l
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        // TopK on the unique group key: deterministic across engines (an
        // FP-revenue sort could tie-break differently in DuckDB)
        .orderBy(col("l_orderkey"))
        .limit(50)
      val bytes = DataFusionProtoPhysical.emit(plan)
      val back = DataFusionProtoPhysical.consume(s, bytes, tf(s, dir))
      back.select(col("l_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        r2(col("revenue")).as("revenue"))
    },

    // WindowAggExecNode + UnionExecNode over the wire: a framed running
    // sum and row_number per customer, unioned ALL with itself filtered —
    // exercises PhysicalWindowExprNode (udaf + udwf + ROWS frame) and the
    // n-ary union input list from BYTES.
    "dfproto_physical_window_roundtrip" -> { (s, dir) =>
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val spec = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderkey").asc_nulls_last)
      val win = o.select(col("o_orderkey"), col("o_custkey"),
        row_number().over(spec).as("rn"),
        sum(col("o_totalprice")).over(spec.rowsBetween(Window.unboundedPreceding, 0))
          .as("running"))
      val plan = win.filter(col("rn") <= 3)
      val bytes = DataFusionProtoPhysical.emit(plan)
      val back = DataFusionProtoPhysical.consume(s, bytes, tf(s, dir))
      back.select(col("o_orderkey"), col("o_custkey"),
        col("rn").cast("bigint").as("rn"),
        r2(col("running")).as("running"))
        .orderBy(col("o_custkey"), col("rn"), col("o_orderkey")).limit(1000)
    })

  val oracleSql: Map[String, String] = Map(
    "dfproto_physical_join_roundtrip" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        | floor((sum(l_extendedprice * (1 - l_discount)) + 1.37e-4) * 100 + 0.5) / 100 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY l_orderkey LIMIT 50""".stripMargin,
    "dfproto_physical_window_roundtrip" ->
      """SELECT o_orderkey, o_custkey, rn,
        | floor((running + 1.37e-4) * 100 + 0.5) / 100 AS running
        |FROM (SELECT o_orderkey, o_custkey,
        |        row_number() OVER w AS rn,
        |        sum(o_totalprice) OVER (PARTITION BY o_custkey
        |          ORDER BY o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |      FROM orders
        |      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey))
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn, o_orderkey LIMIT 1000""".stripMargin)
}
