package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the post-ingest maintenance pass every
  * file-based 100 TB pipeline needs (streaming sinks and parallel writers
  * emit thousands of KB-scale files; scan cost then becomes file-open
  * bound, not byte bound).
  *
  * Reference analogue: none as an operator — DataFusion reads whatever
  * layout it is given; its benchmarks pre-compact with external scripts.
  * Here it is a first-class library call: rewrite a parquet directory
  * into ~`targetBytes` files, preserving hive partitioning when present,
  * atomically (write to a sibling tmp dir, then swap).
  *
  * Scale design: the rewrite is one distributed read + one write with NO
  * shuffle in the unpartitioned case (coalesce only merges splits);
  * partitioned rewrites repartition by the partition columns so each
  * output partition directory is written by as few tasks as its size
  * needs — the shuffle moves each row once, the unavoidable minimum for
  * a layout change.
  */
object Compaction {

  private[operators] def parquetFiles(d: java.io.File): Seq[java.io.File] = {
    val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
    kids.filter(_.isFile).filter(_.getName.endsWith(".parquet")) ++
      kids.filter(_.isDirectory).flatMap(parquetFiles)
  }

  /** Atomic-ish directory swap: rename old out of the way, tmp in, then
    * delete old (restores the original on failure). */
  private[operators] def swapInto(path: String, tmp: String): Unit = {
    val old = new java.io.File(path.stripSuffix("/") + ".__compact_old__")
    org.apache.commons.io.FileUtils.deleteQuietly(old)
    val target = new java.io.File(path)
    if (!target.renameTo(old))
      throw new java.io.IOException(s"compact: cannot move $path aside")
    if (!new java.io.File(tmp).renameTo(target)) {
      old.renameTo(target) // restore
      throw new java.io.IOException(s"compact: cannot move $tmp into place")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(old)
  }

  /** Rewrite `path` (parquet) into files of ~targetBytes. Returns
    * (filesBefore, filesAfter). */
  def compactParquet(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      partitionCols: Seq[String] = Nil): (Int, Int) = {
    val before = parquetFiles(new java.io.File(path))
    val totalBytes = before.map(_.length).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path)
    val tmp = path.stripSuffix("/") + ".__compact_tmp__"
    if (partitionCols.isEmpty)
      df.coalesce(nOut).write.mode("overwrite").parquet(tmp)
    else
      df.repartition(nOut, partitionCols.map(col): _*)
        .write.mode("overwrite").partitionBy(partitionCols: _*).parquet(tmp)
    swapInto(path, tmp)
    (before.size, parquetFiles(new java.io.File(path)).size)
  }
}

/** One-call layout maintenance — the nightly job a 100 TB lake runs:
  * compact small files to ~targetBytes and, when `zorderBy` is given,
  * rewrite in Z-order so row-group stats prune on every clustered column
  * (delta-lake-style `OPTIMIZE ... ZORDER BY`, built from this library's
  * own primitives). Same atomic tmp-dir swap as `Compaction`.
  */
object Maintenance {

  /** Returns (filesBefore, filesAfter). `rowGroupBytes` controls stat
    * granularity for the clustered rewrite (smaller groups → finer
    * pruning, more footer entries). */
  def optimize(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024,
      zorderBy: Seq[String] = Nil,
      rowGroupBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    if (zorderBy.isEmpty) Compaction.compactParquet(spark, path, targetBytes)
    else {
      val before = Compaction.parquetFiles(new java.io.File(path))
      val totalBytes = before.map(_.length).sum
      val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
      val tmp = path.stripSuffix("/") + ".__compact_tmp__"
      ZOrder.writeClustered(spark.read.parquet(path), tmp, zorderBy, nOut,
        rowGroupBytes = rowGroupBytes)
      Compaction.swapInto(path, tmp)
      (before.size, Compaction.parquetFiles(new java.io.File(path)).size)
    }
  }
}
