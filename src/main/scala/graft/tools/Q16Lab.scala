package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** r13 q16 A/B: the static-wide reshape regressed on the driver box
  * (0.353 → 0.600) — its two ~1 MB exchanges ran as 32+32 task launches
  * that AQE used to coalesce. Variants, interleaved in one JVM:
  *   A plain AQE reference text (shipped pre-r13)
  *   B AQE + BROADCAST(part) + coalesce(1)/sortWithinPartitions final
  *   C static wide session (the regressing r13 shape)
  * Usage: runMain graft.tools.Q16Lab [sfDir] */
object Q16Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.Q.fixtureViews(spark, sfDir)

    val groupedSql =
      """SELECT /*+ BROADCAST(part) */ p_brand, p_type, p_size,
        |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
        |FROM partsupp, part
        |WHERE p_partkey = ps_partkey
        |  AND p_brand <> 'Brand#3'
        |  AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
        |GROUP BY p_brand, p_type, p_size""".stripMargin

    def a(): DataFrame = spark.sql(graft.queries.TpchPartsuppSql.q16)
    def b(): DataFrame = spark.sql(groupedSql).coalesce(1)
      .sortWithinPartitions(col("supplier_cnt").desc, col("p_brand"),
        col("p_type"), col("p_size"))
    lazy val ws = {
      val s = graft.queries.Q.staticWideSession(spark)
      graft.queries.Q.fixtureViews(s, sfDir); s
    }
    def c(): DataFrame = ws.sql(groupedSql).coalesce(1)
      .sortWithinPartitions(col("supplier_cnt").desc, col("p_brand"),
        col("p_type"), col("p_size"))

    val variants = Seq("A plainAQE" -> (a _), "B aqe+coalesce" -> (b _),
      "C staticWide" -> (c _))
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
      println(f"$tag%-16s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f")
    }
    val ra = a().collect().map(_.toString).mkString("|")
    println(s"results equal: B=${ra == b().collect().map(_.toString).mkString("|")} C=${ra == c().collect().map(_.toString).mkString("|")}")
    spark.stop()
  }
}
