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
      // events.ts encoding varies across fixture generations: parquet
      // TIMESTAMP(NANOS) (which Spark's reader rejects outright with
      // [PARQUET_TYPE_ILLEGAL] unless read as raw longs) or native µs.
      // Handle both by reading with nanosAsLong and dispatching on the
      // OBSERVED type rather than assuming one generation's encoding.
      // (GraftSession sets nanosAsLong at build time; this guard covers
      // sessions built elsewhere, e.g. bare test harnesses.)
      if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      normalizeEventsTs(raw)
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Normalize the events.ts column to session-tz µs TimestampType from
    * whatever the fixture stores: raw epoch-nanos longs (`div 1000` keeps
    * full integer precision — a double roundtrip would lose sub-ms bits at
    * 2024-era epoch-nanos magnitudes, ~1.7e18 > 2^53), TIMESTAMP_NTZ (µs
    * files; cast is value-preserving under the UTC session tz), or already
    * TimestampType (pass through). */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Register every fixture table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
