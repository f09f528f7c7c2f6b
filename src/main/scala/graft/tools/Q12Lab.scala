package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-11 re-profile (r10 verdict item 3): q12's static SHUFFLE_HASH
  * gate measured 1.88× on the judge's quiet run — re-measure the three
  * candidate shapes at SF1 and ship whichever wins today:
  *   A shipped: stats-gated SHUFFLE_HASH hint, static wide session (AQE
  *     off, 32 shuffle partitions), coalesce(1)+local sort final
  *   B plain AQE: same SQL, no hint, default session, ORDER BY
  *   C broadcast: BROADCAST(os) hint on the projected orders side
  * Interleaved min-of-N (each pass runs A,B,C back-to-back) so ambient
  * load hits all variants equally. Usage: runMain graft.tools.Q12Lab [sfDir]
  */
object Q12Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def body(hint: String) =
      s"""SELECT ${hint}l_linestatus,
        |  sum(CASE WHEN os.hi THEN 1 ELSE 0 END) AS high_line_count,
        |  sum(CASE WHEN os.hi THEN 0 ELSE 1 END) AS low_line_count
        |FROM lineitem,
        |  (SELECT o_orderkey,
        |     o_orderpriority IN ('1-URGENT', '2-HIGH') AS hi FROM orders) os
        |WHERE l_orderkey = os.o_orderkey
        |  AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |GROUP BY l_linestatus""".stripMargin

    val wide = graft.queries.Q.staticWideSession(spark)
    graft.queries.Q.fixtureViews(wide, sfDir)
    graft.queries.Q.fixtureViews(spark, sfDir)

    def shipped(): DataFrame =
      wide.sql(body("/*+ SHUFFLE_HASH(os) */ "))
        .coalesce(1).sortWithinPartitions("l_linestatus")
    def plainAqe(): DataFrame =
      spark.sql(body("") + "\nORDER BY l_linestatus")
    def bcast(): DataFrame =
      wide.sql(body("/*+ BROADCAST(os) */ "))
        .coalesce(1).sortWithinPartitions("l_linestatus")

    val variants = Seq(
      "A shipped SHUFFLE_HASH" -> (shipped _),
      "B plain AQE" -> (plainAqe _),
      "C broadcast os" -> (bcast _))

    // warm all three (codegen + page cache), then interleaved passes
    variants.foreach(_._2().write.mode("overwrite").format("noop").save())
    val n = 8
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
    for (_ <- 1 to n; (tag, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.mode("overwrite").format("noop").save()
      val t = (System.nanoTime() - t0) / 1e9
      times(tag) = times.getOrElse(tag, Vector.empty) :+ t
    }
    variants.foreach { case (tag, _) =>
      val ts = times(tag)
      println(f"$tag%-24s min=${ts.min}%.3f med=${ts.sorted.apply(n / 2)}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val ref = shipped().collect().map(_.toString).sorted.mkString("|")
    val eqB = plainAqe().collect().map(_.toString).sorted.mkString("|") == ref
    val eqC = bcast().collect().map(_.toString).sorted.mkString("|") == ref
    println(s"results equal: B=$eqB C=$eqC")
    spark.stop()
  }
}
