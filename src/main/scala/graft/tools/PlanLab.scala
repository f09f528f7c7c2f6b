package graft.tools

/** Scratch probe for planning-cost experiments on the q22 shape (kept as a
  * tool so the numbers in BENCH_NOTES are reproducible). */
object PlanLab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val s = graft.queries.Q.tinyResultSession(spark)
    graft.queries.Q.fixtureViews(s, sfDir)

    def time(tag: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      f().queryExecution.executedPlan
      val n = 20
      val t0 = System.nanoTime()
      for (_ <- 1 to n) f().queryExecution.executedPlan
      println(f"$tag: ${(System.nanoTime() - t0) / 1e6 / n}%.1f ms/plan")
    }

    val withSubq =
      """SELECT /*+ BROADCAST(oh) */ c_mktsegment AS cntrycode, count(*) AS numcust,
        |       floor((sum(c_acctbal) + 1.37e-4) * 100 + 0.5) / 100 AS totacctbal
        |FROM customer ANTI JOIN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 200000) oh
        |  ON o_custkey = c_custkey
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
        |GROUP BY c_mktsegment""".stripMargin
    val litFilter = withSubq.replace(
      "(SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)", "4454.36")
    val noAnti =
      """SELECT c_mktsegment AS cntrycode, count(*) AS numcust
        |FROM customer WHERE c_acctbal > 4454.36
        |GROUP BY c_mktsegment""".stripMargin

    val crossAvg =
      """SELECT /*+ BROADCAST(oh), BROADCAST(av) */ c_mktsegment AS cntrycode,
        |       count(*) AS numcust,
        |       floor((sum(c_acctbal) + 1.37e-4) * 100 + 0.5) / 100 AS totacctbal
        |FROM customer
        |CROSS JOIN (SELECT avg(c_acctbal) AS gavg FROM customer
        |            WHERE c_acctbal > 0) av
        |ANTI JOIN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000) oh
        |  ON o_custkey = c_custkey
        |WHERE c_acctbal > gavg
        |GROUP BY c_mktsegment""".stripMargin
    time("q22 full (subq + anti)", () => s.sql(withSubq))
    time("q22 cross-join avg", () => s.sql(crossAvg))
    time("q22 literal avg (anti only)", () => s.sql(litFilter))
    time("q22 agg only", () => s.sql(noAnti))
    time("avg subquery alone", () => s.sql(
      "SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0"))
    spark.stop()
  }
}
