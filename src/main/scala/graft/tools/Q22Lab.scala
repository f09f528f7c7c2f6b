package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-10 experiment: the one untried q22 lever from the r9 verdict —
  * sharing a single customer scan between the global-average pre-pass and
  * the main anti-join pass (localCheckpoint the 3-column projection).
  * Measures end-to-end wall (noop write), min-of-N, vs the shipped shape.
  * Usage: runMain graft.tools.Q22Lab [sfDir] */
object Q22Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val s = graft.queries.Q.tinyResultSession(spark)
    graft.queries.Q.fixtureViews(s, sfDir)

    val shippedSql =
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

    def shipped(): DataFrame =
      s.sql(shippedSql).sortWithinPartitions("cntrycode")

    // B: one customer scan — localCheckpoint the projection, both passes
    // read the checkpointed blocks. The checkpoint job serializes BEFORE
    // the broadcast futures (which used to overlap), so this trades
    // overlap for a cheaper second read.
    def sharedScan(): DataFrame = {
      val cust = s.read.parquet(s"$sfDir/customer.parquet")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .localCheckpoint(true)
      cust.createOrReplaceTempView("cust_ck")
      s.sql(shippedSql.replace("FROM customer", "FROM cust_ck")
          .replace("FROM cust_ck\n", "FROM cust_ck\n") // keep both refs
          .replace("avg(c_acctbal) AS gavg FROM customer",
                   "avg(c_acctbal) AS gavg FROM cust_ck"))
        .sortWithinPartitions("cntrycode")
    }

    // F: eager scalar — run the avg as its own tiny job over the
    // checkpointed blocks and inline the literal; main pass has only the
    // oh broadcast left.
    def eagerScalar(): DataFrame = {
      val cust = s.read.parquet(s"$sfDir/customer.parquet")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .localCheckpoint(true)
      cust.createOrReplaceTempView("cust_ck2")
      val gavg = cust.where("c_acctbal > 0")
        .agg(org.apache.spark.sql.functions.avg("c_acctbal")).first().getDouble(0)
      s.sql(
        s"""SELECT /*+ BROADCAST(oh) */ c_mktsegment AS cntrycode,
           |       count(*) AS numcust,
           |       floor((sum(c_acctbal) + 1.37e-4) * 100 + 0.5) / 100 AS totacctbal
           |FROM cust_ck2
           |ANTI JOIN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000) oh
           |  ON o_custkey = c_custkey
           |WHERE c_acctbal > $gavg
           |GROUP BY c_mktsegment""".stripMargin)
        .sortWithinPartitions("cntrycode")
    }

    def bench(tag: String, f: () => DataFrame, n: Int = 8): Unit = {
      f().write.mode("overwrite").format("noop").save() // warm
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        f().write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-22s min=${ts.min}%.3f  med=${ts.sorted.apply(n / 2)}%.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // G: reduced optimizer rule set — plan-constant shaving: exclude
    // rules that cannot fire on this shape but still walk the tree.
    lazy val gSession = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      ss.conf.set("spark.sql.shuffle.partitions", "1")
      ss.conf.set("spark.sql.constraintPropagation.enabled", "false")
      ss.conf.set("spark.sql.optimizer.excludedRules", Seq(
        "org.apache.spark.sql.catalyst.optimizer.CostBasedJoinReorder",
        "org.apache.spark.sql.catalyst.optimizer.ReorderJoin",
        "org.apache.spark.sql.catalyst.optimizer.OptimizeCsvJsonExprs",
        "org.apache.spark.sql.catalyst.optimizer.DecimalAggregates",
        "org.apache.spark.sql.catalyst.optimizer.ObjectSerializerPruning",
        "org.apache.spark.sql.catalyst.optimizer.EliminateSerialization",
        "org.apache.spark.sql.catalyst.optimizer.CombineConcats",
        "org.apache.spark.sql.catalyst.optimizer.OptimizeRepartition",
        "org.apache.spark.sql.catalyst.optimizer.TransposeWindow",
        "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit").mkString(","))
      graft.queries.Q.fixtureViews(ss, sfDir)
      ss
    }
    def excludedRules(): DataFrame =
      gSession.sql(shippedSql).sortWithinPartitions("cntrycode")

    // H: plan reuse — analyze/optimize ONCE, execute many. Isolates the
    // per-run planning constant from execution proper.
    lazy val reused = shipped()
    def planReuse(): DataFrame = reused

    bench("A shipped", shipped)
    bench("B shared-scan ckpt", sharedScan)
    bench("F eager scalar", eagerScalar)
    bench("G excluded rules", excludedRules)
    bench("H plan reuse", planReuse)
    // verify identical results
    val a = shipped().collect().map(_.toString).sorted.mkString("|")
    val b = sharedScan().collect().map(_.toString).sorted.mkString("|")
    val fr = eagerScalar().collect().map(_.toString).sorted.mkString("|")
    println(s"results equal: B=${a == b} F=${a == fr}")
    spark.stop()
  }
}
