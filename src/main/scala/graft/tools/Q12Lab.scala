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

    // D: broadcast BITMAP semi-structure — the hi-orders set as a dense
    // bitset over o_orderkey (footer min/max sizes it). Replaces both the
    // orders shuffle AND the driver-built 1.5M-entry broadcast hash map
    // with a ~min(maxKey/8) byte array built by partition-OR; lineitem
    // probes it with a bit test. No shuffle anywhere but the ≤2-group agg.
    def bitmap(): DataFrame = {
      import org.apache.spark.sql.functions._
      val o = wide.table("orders")
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("hi"))
        .filter(col("hi"))
      val bm = o.select("k").rdd.mapPartitions { it =>
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
      }.reduce { (a, b) =>
        val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
        var i = 0
        while (i < small.length) { big(i) |= small(i); i += 1 }
        big
      }
      val bc = wide.sparkContext.broadcast(bm)
      val isHi = udf { k: Long =>
        val arr = bc.value
        val w = (k >> 6).toInt
        w < arr.length && (arr(w) & (1L << (k & 63))) != 0
      }
      wide.table("lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_linestatus"), isHi(col("l_orderkey").cast("long")).as("hi"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(col("hi"), 1).otherwise(0)).as("high_line_count"),
          sum(when(col("hi"), 0).otherwise(1)).as("low_line_count"))
        .coalesce(1).sortWithinPartitions("l_linestatus")
    }

    // E: exact inner-join semantics — TWO bitmaps (exists, hi) built in
    // one pass over all orders; a probe key absent from `exists` is
    // DROPPED (the inner join's semantics), not counted as low.
    def bitmapExact(): DataFrame = {
      import org.apache.spark.sql.functions._
      val o = wide.table("orders")
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("hi"))
      val (ex, hi) = o.rdd.mapPartitions { it =>
        var exists = new Array[Long](1 << 10)
        var hiArr = new Array[Long](1 << 10)
        var maxW = -1
        it.foreach { r =>
          val k = r.getLong(0)
          val w = (k >> 6).toInt
          if (w >= exists.length) {
            var n = exists.length
            while (n <= w) n <<= 1
            exists = java.util.Arrays.copyOf(exists, n)
            hiArr = java.util.Arrays.copyOf(hiArr, n)
          }
          exists(w) |= 1L << (k & 63)
          if (r.getBoolean(1)) hiArr(w) |= 1L << (k & 63)
          if (w > maxW) maxW = w
        }
        if (maxW < 0) Iterator.empty
        else Iterator.single((java.util.Arrays.copyOf(exists, maxW + 1),
          java.util.Arrays.copyOf(hiArr, maxW + 1)))
      }.reduce { (a, b) =>
        val ((ae, ah), (be, bh)) = if (a._1.length >= b._1.length) (a, b) else (b, a)
        var i = 0
        while (i < be.length) { ae(i) |= be(i); ah(i) |= bh(i); i += 1 }
        (ae, ah)
      }
      val bcEx = wide.sparkContext.broadcast(ex)
      val bcHi = wide.sparkContext.broadcast(hi)
      def test(arr: Array[Long], k: Long): Boolean = {
        val w = (k >> 6).toInt
        w < arr.length && (arr(w) & (1L << (k & 63))) != 0
      }
      val probe = udf { k: Long =>
        if (!test(bcEx.value, k)) null.asInstanceOf[java.lang.Boolean]
        else java.lang.Boolean.valueOf(test(bcHi.value, k))
      }
      wide.table("lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_linestatus"), probe(col("l_orderkey").cast("long")).as("hi"))
        .filter(col("hi").isNotNull)
        .groupBy(col("l_linestatus"))
        .agg(sum(when(col("hi"), 1).otherwise(0)).as("high_line_count"),
          sum(when(col("hi"), 0).otherwise(1)).as("low_line_count"))
        .coalesce(1).sortWithinPartitions("l_linestatus")
    }

    val variants = Seq(
      "A shipped SHUFFLE_HASH" -> (shipped _),
      "B plain AQE" -> (plainAqe _),
      "C broadcast os" -> (bcast _),
      "D bitmap broadcast" -> (bitmap _),
      "E bitmap exact" -> (bitmapExact _))

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
    val eqD = bitmap().collect().map(_.toString).sorted.mkString("|") == ref
    val eqE = bitmapExact().collect().map(_.toString).sorted.mkString("|") == ref
    println(s"results equal: B=$eqB C=$eqC D=$eqD E=$eqE")
    spark.stop()
  }
}
