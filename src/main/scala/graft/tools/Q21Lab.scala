package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r13 same-JVM interleaved A/B (cross-run box noise is ±25%, so only
  * same-run comparisons decide):
  *   q21: A = prior broadcast-F-keys + two-level agg SQL chain;
  *        B = exists-bitmap probe + single-exchange two-level agg (shipped)
  *   unnest_words: U = plain explode (scan-parallelism inherited);
  *                 V = spread-by-id before the explode (shipped)
  * Usage: runMain graft.tools.Q21Lab [sfDir] [uwDir] */
object Q21Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val uwDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Q.fixtureViews(spark, sfDir)

    // A: the pre-r13 gated chain (broadcast F-order keys, two GROUP BYs)
    def a(): DataFrame = {
      val s = graft.queries.Q.staticPlanSession(spark)
      graft.queries.Q.fixtureViews(s, sfDir)
      s.sql(
        """SELECT /*+ BROADCAST(supplier) */ s_name, CAST(sum(nlines) AS BIGINT) AS numwait
          |FROM (
          |  SELECT max(CASE WHEN high_lines > 0 THEN l_suppkey END) AS high_supp,
          |         sum(high_lines) AS nlines
          |  FROM (SELECT /*+ BROADCAST(of) */ l_orderkey, l_suppkey,
          |               sum(CASE WHEN l_quantity > 30 THEN 1 ELSE 0 END) AS high_lines
          |        FROM lineitem,
          |          (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') of
          |        WHERE l_orderkey = of.o_orderkey
          |        GROUP BY l_orderkey, l_suppkey)
          |  GROUP BY l_orderkey
          |  HAVING count(*) >= 2
          |     AND sum(CASE WHEN high_lines > 0 THEN 1 ELSE 0 END) = 1) c
          |JOIN supplier ON c.high_supp = s_suppkey
          |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)
    }
    // B: shipped r13 shape
    def b(): DataFrame =
      graft.SparkEntry.queries("q21_waiting")(spark, sfDir)

    // U/V: unnest_words plain vs spread
    def uw(spread: Boolean): DataFrame = {
      val d0 = graft.Tables.load(spark, uwDir, "documents")
      val d = if (spread)
        d0.repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        else d0
      d.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n").desc, col("word")).limit(30)
    }

    // C: bitmap probe replaces the F-keys broadcast build, but the
    // two-level aggregate keeps the proven partial-agg cascade (no
    // explicit repartition) on the staticPlan session
    def c(): DataFrame = {
      val s = graft.queries.Q.staticPlanSession(spark)
      graft.queries.Q.fixtureViews(s, sfDir)
      val keys = s.table("orders")
        .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
      val bm = graft.operators.BitmapJoin.buildExistsBitmap(keys, "o_orderkey")
      val isF = graft.operators.BitmapJoin.existsProbe(s, bm)
      val l2 = s.table("lineitem")
        .filter(isF(col("l_orderkey").cast("long")))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(sum(when(col("l_quantity") > 30, 1).otherwise(0)).as("high_lines"))
        .groupBy("l_orderkey").agg(
          max(when(col("high_lines") > 0, col("l_suppkey"))).as("high_supp"),
          sum("high_lines").as("nlines"),
          count(lit(1)).as("n_supp"),
          sum(when(col("high_lines") > 0, 1).otherwise(0)).as("n_high"))
        .filter(col("n_supp") >= 2 && col("n_high") === 1)
      l2.join(s.table("supplier"), col("high_supp") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(sum("nlines").cast("bigint").as("numwait"))
        .orderBy(col("numwait").desc, col("s_name")).limit(20)
    }

    val variants = Seq(
      "q21 A prior chain" -> (a _), "q21 B bitmap" -> (b _),
      "q21 C bitmap+casc" -> (c _),
      "uw  U plain" -> (() => uw(false)), "uw  V spread" -> (() => uw(true)))
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
    println("q21 equal: B=" + (a().collect().map(_.toString).toSeq ==
      b().collect().map(_.toString).toSeq) + " C=" +
      (a().collect().map(_.toString).toSeq ==
        c().collect().map(_.toString).toSeq))
    spark.stop()
  }
}
