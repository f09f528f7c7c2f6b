package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r14 same-JVM interleaved A/B for q18 (cross-run box noise is ±25%):
  *   A = r13 shape: agg+HAVING joined to orders as a runtime shuffle join
  *       (AQE sees the 44 MB partial-agg exchange, not the ~6k survivors);
  *   B = r14 shape: survivors materialized, broadcast into the orders scan
  *       when their REAL count is broadcast-small (shipped, via SparkEntry).
  * Usage: runMain graft.tools.Q18Lab [sfDir]
  */
object Q18Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def r2c(c: org.apache.spark.sql.Column) =
      (floor((c + lit(1.37e-4)) * 100 + 0.5).cast("double") / 100)
    def a(): DataFrame = {
      val l = graft.Tables.load(spark, sfDir, "lineitem")
      val o = graft.Tables.load(spark, sfDir, "orders")
      val c = graft.Tables.load(spark, sfDir, "customer")
      val big = l.groupBy("l_orderkey")
        .agg(sum("l_quantity").as("tot_qty"))
        .filter(col("tot_qty") > 150)
      big.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          col("o_totalprice"), r2c(col("tot_qty")).as("tot_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
    }
    def b(): DataFrame = graft.SparkEntry.queries("q18_bigorders")(spark, sfDir)

    val variants = Seq("q18 A shuffle join" -> (a _), "q18 B ckpt+bcast" -> (b _))
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
      println(f"$tag%-20s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    println("q18 equal: " + (a().collect().map(_.toString).toSeq ==
      b().collect().map(_.toString).toSeq))
    spark.stop()
  }
}
