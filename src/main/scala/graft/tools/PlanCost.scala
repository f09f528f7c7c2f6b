package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: DataFrame-DSL vs SQL-text construction+planning cost for the
  * q3 shape (same final plan either way). */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- Seq("lineitem", "orders", "customer"))
      graft.Tables.load(spark, sfDir, t).createOrReplaceTempView(t)

    // generic mode: PlanCost <sfDir> <queryName> — construction+planning
    // cost of any inventory query (executedPlan forced, nothing run)
    if (args.length > 1) {
      val name = args(1)
      def q() = graft.SparkEntry.queries(name)(spark, sfDir)
      q().queryExecution.executedPlan // warm
      val n = 10
      val t0 = System.nanoTime()
      for (_ <- 1 to n) q().queryExecution.executedPlan
      println(f"$name planning: ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms/plan")
      spark.stop(); return
    }

    def dslQ3() = graft.SparkEntry.queries("q3_join_topk")(spark, sfDir)
    def sqlQ3() = spark.sql(
      """SELECT /*+ BROADCAST(cmplx) */ l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  o_orderpriority,
        |  CAST(FLOOR((sum(l_extendedprice * (1 - l_discount)) + 1.37e-4) * 100 + 0.5) AS DOUBLE) / 100 AS revenue
        |FROM lineitem,
        |  (SELECT o_orderkey, o_orderdate, o_orderpriority
        |   FROM customer, orders
        |   WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |     AND o_orderdate < '1998-03-15') cmplx
        |WHERE l_orderkey = cmplx.o_orderkey AND l_shipdate > '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)

    def time(tag: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      // warm
      f().queryExecution.executedPlan
      val n = 10
      val t0 = System.nanoTime()
      for (_ <- 1 to n) f().queryExecution.executedPlan
      println(f"$tag: ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms/plan")
    }
    time("dsl", dslQ3)
    locally {
      val ss = graft.queries.Q.staticPlanSession(spark)
      graft.queries.Q.fixtureViews(ss, sfDir)
      def staticSql() = ss.sql(
        """SELECT /*+ BROADCAST(cmplx) */ l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
          |  o_orderpriority,
          |  CAST(FLOOR((sum(l_extendedprice * (1 - l_discount)) + 1.37e-4) * 100 + 0.5) AS DOUBLE) / 100 AS revenue
          |FROM lineitem,
          |  (SELECT o_orderkey, o_orderdate, o_orderpriority
          |   FROM customer, orders
          |   WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          |     AND o_orderdate < '1998-03-15') cmplx
          |WHERE l_orderkey = cmplx.o_orderkey AND l_shipdate > '1998-03-15'
          |GROUP BY l_orderkey, o_orderdate, o_orderpriority
          |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
      time("static-session sql", staticSql)
      time("dsl (after static warm)", dslQ3)
    }
    time("sql (AQE on: physical planning deferred)", sqlQ3)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("sql noAQE", sqlQ3)
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    time("sql noAQE noConstraintProp", sqlQ3)
    spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // execution sanity: same results
    val a = dslQ3().collect().map(_.toString).mkString("\n")
    val b = sqlQ3().collect().map(_.toString).mkString("\n")
    println("same results: " + (a == b))
    spark.stop()
  }
}
