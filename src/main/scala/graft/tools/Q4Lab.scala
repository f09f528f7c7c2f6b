package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-12 re-profile (r11 verdict item 1): q4 measured 2.17× on the
  * judge's quiet run (0.312 s vs the 144 ms reference) — re-measure the
  * candidate shapes at SF1, interleaved min-of-N, and ship the winner:
  *   A shipped: stats-gated broadcast 3-month order window into lineitem,
  *     (orderkey, priority) dedup via partial agg below the exchange
  *   B plain AQE: the EXISTS text, default session
  *   C bitmap exists-set: EXISTS(σ lineitem) is a pure SET of l_orderkey —
  *     one dense bitset built by partition-OR over the filtered fact scan
  *     (l_orderkey + l_quantity columns only); the 3-month order window
  *     probes it with a bit test. No join, no shuffle but the ≤5-group agg.
  *   D broadcast semi: orders window LEFT SEMI lineitem keys, lineitem as
  *     the BROADCAST build (semi join dedups, no distinct needed)
  * q16/q21's shipped entries are timed in the same pass loop for the
  * verdict's quiet re-measure. Usage: runMain graft.tools.Q4Lab [sfDir]
  */
object Q4Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    graft.queries.Q.fixtureViews(spark, sfDir)
    val wide = graft.queries.Q.staticWideSession(spark)
    graft.queries.Q.fixtureViews(wide, sfDir)

    def shipped(): DataFrame =
      graft.queries.TpchQueries2.queries("q4_priority")(spark, sfDir)

    def plainAqe(): DataFrame = spark.sql("""
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
                    AND l_quantity > 45)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")

    // C: the EXISTS subquery carries no payload at all — it is a SET of
    // orderkeys. One partition-OR pass over the two-column filtered fact
    // scan builds a dense bitset (~maxKey/8 = 750 KB at SF1); the slim
    // order window probes it. Same kernel as q12's BitmapJoin but
    // exists-only (semi join ≡ one bitset, no flag plane).
    def bitmapExists(): DataFrame = {
      import org.apache.spark.sql.functions._
      val keys = wide.table("lineitem")
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey").cast("long").as("k"))
      val bm = keys.rdd.mapPartitions { it =>
        var arr = new Array[Long](1 << 10)
        var maxW = -1
        it.foreach { r =>
          val k = r.getLong(0)
          val w = (k >> 6).toInt
          if (w >= arr.length) {
            var n = arr.length
            while (n <= w) n <<= 1
            arr = java.util.Arrays.copyOf(arr, n)
          }
          arr(w) |= 1L << (k & 63)
          if (w > maxW) maxW = w
        }
        if (maxW < 0) Iterator.empty
        else Iterator.single(java.util.Arrays.copyOf(arr, maxW + 1))
      }.fold(Array.emptyLongArray) { (a, b) =>
        val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
        var i = 0
        while (i < small.length) { big(i) |= small(i); i += 1 }
        big
      }
      val bc = wide.sparkContext.broadcast(bm)
      val hasLine = udf { k: Long =>
        val arr = bc.value
        val w = (k >> 6).toInt
        k >= 0 && w < arr.length && (arr(w) & (1L << (k & 63))) != 0
      }
      wide.table("orders")
        .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        .filter(hasLine(col("o_orderkey").cast("long")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .coalesce(1).sortWithinPartitions("o_orderpriority")
    }

    // D: semi join with the fact side as broadcast build — Spark dedups
    // inside the semi-join hash relation, no distinct shuffle.
    def bcastSemi(): DataFrame =
      wide.sql("""
        SELECT /*+ BROADCAST(lk) */ o_orderpriority, count(*) AS order_count
        FROM orders LEFT SEMI JOIN
          (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45) lk
          ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        GROUP BY o_orderpriority""")
        .coalesce(1).sortWithinPartitions("o_orderpriority")

    def q16(): DataFrame =
      graft.queries.FunctionQueries3.queries("q16_suppcnt")(spark, sfDir)
    def q21(): DataFrame =
      graft.queries.TpchQueries2.queries("q21_waiting")(spark, sfDir)

    val variants = Seq(
      "A shipped bcast-window" -> (shipped _),
      "B plain AQE EXISTS" -> (plainAqe _),
      "C bitmap exists-set" -> (bitmapExists _),
      "D broadcast semi" -> (bcastSemi _),
      "ship q16_suppcnt" -> (q16 _),
      "ship q21_waiting" -> (q21 _))

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
    val eqC = bitmapExists().collect().map(_.toString).sorted.mkString("|") == ref
    val eqD = bcastSemi().collect().map(_.toString).sorted.mkString("|") == ref
    println(s"results equal: B=$eqB C=$eqC D=$eqD")
    spark.stop()
  }
}
