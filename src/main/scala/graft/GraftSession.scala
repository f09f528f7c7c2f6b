package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the role of DataFusion's `SessionContext`
  * (reference: datafusion/core/src/execution/context/mod.rs:611) but delegates
  * everything to Spark: one `SparkSession` configured for deterministic,
  * oracle-comparable execution (UTC session time zone) and for local[N]
  * throughput (shuffle partitions = cores, AQE on).
  *
  * At cluster scale the same settings hold: AQE handles runtime coalescing /
  * skew; shuffle partition count would be tuned to cluster cores instead.
  */
object GraftSession {

  def builder(cpus: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as long at the source
      // (Tables.doLoad converts to µs). Set here once, not per-read.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // Prefer shuffled-hash over sort-merge when no side broadcasts: a
      // hash join needs one build pass over the smaller side instead of
      // sorting both (the reference's partitioned hash join makes the same
      // choice — prefer_hash_join=true in its bench config). Spark's
      // shuffled-hash build spills, so it is cluster-safe.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      // Local-bench split sizing: the fixtures are one ~1-30 MB file per
      // table, so the 128 MB default would make every scan a single task.
      // 4 MB splits spread a sf0.1 lineitem scan over ~8 tasks; on a real
      // cluster with many files the default is the right choice and this
      // only lowers the per-file split threshold.
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
      .config("spark.ui.enabled", "false")

  /** Local session with sane defaults; idempotent via getOrCreate. */
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
