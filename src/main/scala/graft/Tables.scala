package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog facade over the shared parquet fixtures.
  *
  * Plays the role of DataFusion's `ListingTable`/catalog registration
  * (reference: datafusion/catalog-listing/src/table.rs:180) — Spark's file
  * source already does partition discovery, predicate pushdown and column
  * pruning, so "registering" a table is just reading the path and exposing a
  * temp view for SQL access.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, dir, table): `spark.read.parquet` runs a footer/
  // schema-inference job every call, which showed up as ~30 ms × n_tables of
  // serial driver latency at the head of EVERY query. One footer read per
  // session is the catalog behavior a real engine has anyway. Keyed WEAKLY
  // by the session object (reference identity — SparkSession doesn't
  // override equals) so stopped sessions and their plans get collected and
  // distinct sessions can never collide.
  private val cache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      val existing = cache.get(spark)
      if (existing != null) existing
      else {
        val m = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
        cache.put(spark, m)
        m
      }
    }
    perSession.getOrElseUpdate((dir, name), doLoad(spark, dir, name))
  }

  private def doLoad(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's parquet reader
      // rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as raw nanos and
      // truncate to Spark's native µs timestamps. Integer division (`div`)
      // keeps full precision — a double roundtrip would lose sub-ms bits at
      // 2024-era epoch-nanos magnitudes (~1.7e18 > 2^53).
      // (GraftSession sets nanosAsLong at build time; this guard covers
      // sessions built elsewhere, e.g. bare test harnesses.)
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register every fixture table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
