package graft.tools

import org.apache.spark.sql.DataFrame

/** r14 same-JVM interleaved A/B for q9 (cross-run box noise is ±25%, so
  * only same-run comparisons decide):
  *   A = r13 shape: folded fact SHUFFLE_HASH orders (both sides exchanged,
  *       1.5M-entry hash relation per partition);
  *   B = r14 shape: dense byte-map (o_orderkey → year-1900) probed in the
  *       scan, single final-agg exchange (shipped, via SparkEntry).
  * Usage: runMain graft.tools.Q9Lab [sfDir]
  */
object Q9Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Q.fixtureViews(spark, sfDir)

    // A: the r13 bc=true SQL (SHUFFLE_HASH ox, folded amount below the
    // fact exchange)
    def a(): DataFrame = spark.sql(
      """SELECT /*+ SHUFFLE_HASH(ox) */ n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(FLOOR((sum(amount) + 1.37e-4) * 100 + 0.5) AS DOUBLE) / 100 AS profit
        |FROM
        |  (SELECT /*+ BROADCAST(psx), BROADCAST(sn) */ l_orderkey, n_name,
        |     l_extendedprice * (1 - l_discount)
        |       - ps_supplycost * l_quantity AS amount
        |   FROM lineitem,
        |     (SELECT /*+ BROADCAST(pn) */ ps_partkey, ps_suppkey,
        |        CAST(ps_supplycost AS DOUBLE) AS ps_supplycost
        |      FROM partsupp,
        |        (SELECT p_partkey FROM part WHERE contains(p_name, 'red')) pn
        |      WHERE ps_partkey = pn.p_partkey) psx,
        |     (SELECT s_suppkey, n_name FROM supplier, nation
        |      WHERE s_nationkey = n_nationkey) sn
        |   WHERE l_partkey = psx.ps_partkey AND l_suppkey = psx.ps_suppkey
        |     AND l_suppkey = sn.s_suppkey) f,
        |  (SELECT o_orderkey, o_orderdate FROM orders) ox
        |WHERE f.l_orderkey = ox.o_orderkey
        |GROUP BY n_name, o_year""".stripMargin)

    // B: shipped r14 byte-map shape
    def b(): DataFrame = graft.SparkEntry.queries("q9_profit")(spark, sfDir)

    val variants = Seq("q9 A shuffle-hash" -> (a _), "q9 B bytemap" -> (b _))
    variants.foreach(_._2().write.mode("overwrite").format("noop").save())
    val times = collection.mutable.Map[String, Vector[Double]]()
    for (_ <- 1 to 8; (tag, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.mode("overwrite").format("noop").save()
      times(tag) = times.getOrElse(tag, Vector.empty) :+
        (System.nanoTime() - t0) / 1e9
    }
    variants.foreach { case (tag, _) =>
      val ts = times(tag)
      println(f"$tag%-18s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    println("q9 equal: " + (a().collect().map(_.toString).sorted.toSeq ==
      b().collect().map(_.toString).sorted.toSeq))
    spark.stop()
  }
}
