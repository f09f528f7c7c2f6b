package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: a multi-dimensional sort layout that
  * makes parquet row-group min/max statistics selective on EVERY clustered
  * column at once.
  *
  * The reference prunes row groups from min/max containment analysis
  * (datafusion/pruning/src/pruning_predicate.rs:365,
  * datasource-parquet/src/row_group_filter.rs) — but stats only prune when
  * the layout makes them narrow. A linear sort narrows the leading column
  * only; interleaving the bits of k rank-normalized columns into one sort
  * key bounds every dimension's spread within a contiguous run, so a
  * predicate on ANY clustered column skips most row groups. At 100 TB this
  * is the difference between "point query touches every file" and "point
  * query touches ~N^((k-1)/k) of them" — a one-time layout job (the same
  * class as `Compaction`/`Scale.writeBucketed`) that every later scan pays
  * nothing for.
  *
  * Everything is plain codegen column math: normalization is a broadcast of
  * one min/max row, the interleave is shift/and/or over longs, and the
  * global order comes from `repartitionByRange` (sampled boundaries — no
  * driver materialization, no full sort of the data on one node).
  */
object ZOrder {

  /** Interleave the low `bits` bits of k already-normalized long columns:
    * bit i of column j lands at output position i*k + j. All inputs must
    * be in [0, 2^bits); k*bits must fit a signed long. */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    // k == 1 degrades to a plain linear order (bit i stays at position i,
    // the OR reassembles the masked value) — matching delta's OPTIMIZE
    // ZORDER BY (single_col), which is a legal request.
    require(k >= 1, "z-order needs at least 1 column")
    require(k * bits <= 62, s"k*bits = ${k * bits} exceeds long range")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(c.bitwiseAND(lit(1L << i)), i * (k - 1) + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Normalize a numeric/date/timestamp column into [0, 2^bits) given its
    * min/max bounds (uniform binning; NULLs map to bucket 0 so they
    * cluster together at the curve origin). */
  private def normalize(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val span = when(hi > lo, hi - lo).otherwise(lit(1.0))
    val buckets = (1L << bits).toDouble
    coalesce(
      least(floor((c.cast("double") - lo) / span * buckets),
        lit((1L << bits) - 1.0)),
      lit(0.0)).cast("long")
  }

  /** Append a `__z` Morton key over `colNames`. Bounds come from one
    * broadcast min/max aggregation row (at lake scale the same numbers are
    * available from ANALYZE stats or parquet footers — one cheap
    * column-pruned pass here). */
  def withZValue(df: DataFrame, colNames: Seq[String], bits: Int = 16): DataFrame = {
    val aggs = colNames.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__zmin_$c"),
      max(col(c).cast("double")).as(s"__zmax_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val normalized = colNames.map(c =>
      normalize(col(c), col(s"__zmin_$c"), col(s"__zmax_$c"), bits))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", interleave(normalized, bits))
      .drop(colNames.flatMap(c => Seq(s"__zmin_$c", s"__zmax_$c")): _*)
  }

  /** Rewrite `df` as `numFiles` parquet files globally ordered on the
    * Morton key of `colNames`. Range shuffle on the key (sampled
    * boundaries), per-partition sort, key dropped before write — the
    * clustering survives only as physical row order + footer stats, the
    * schema is unchanged. */
  def writeClustered(df: DataFrame, path: String, colNames: Seq[String],
      numFiles: Int, bits: Int = 16, rowGroupBytes: Long = 128L * 1024 * 1024): Unit = {
    withZValue(df, colNames, bits)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(path)
  }

  /** Fraction of row groups a point/range predicate `lo <= c <= hi` could
    * skip from footer min/max stats alone — the measurable payoff of the
    * layout. Footers are read on executors (same pattern as
    * `graft.sources.ParquetMetadata`). */
  def skippableFraction(spark: org.apache.spark.sql.SparkSession, path: String,
      column: String, lo: Double, hi: Double): Double = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSeq.sorted
    val stats = spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            import scala.jdk.CollectionConverters._
            reader.getFooter.getBlocks.asScala.flatMap { block =>
              block.getColumns.asScala
                .find(_.getPath.toDotString == column)
                .flatMap { cc =>
                  val st = cc.getStatistics
                  if (st == null || !st.hasNonNullValue) None
                  else Some((st.genericGetMin match {
                    case n: Number => n.doubleValue()
                    case other => other.toString.toDouble
                  }, st.genericGetMax match {
                    case n: Number => n.doubleValue()
                    case other => other.toString.toDouble
                  }))
                }
            }.toSeq
          } finally reader.close()
        }
      }.toDF("g_min", "g_max")
    val total = stats.count()
    val overlapping = stats
      .filter(col("g_max") >= lo && col("g_min") <= hi).count()
    if (total == 0) 0.0 else (total - overlapping).toDouble / total
  }
}
