package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet footer inspection as a relation — the engine-side equivalent of
  * the reference's parquet metadata table functions
  * (sqllogictest/test_files/parquet_metadata_functions.slt;
  * datafusion/core/src/datasource/file_format/parquet.rs footer handling):
  * one row per row group with its row count, column-chunk count and
  * compressed size, straight from the footers.
  *
  * Scale design: footers are read ON EXECUTORS — the file list is
  * parallelized and each task opens only its own files' footers (a few KB
  * each), so inspecting a 100 TB lake's metadata never funnels byte one
  * through the driver. This is the fleet-wide "how is my data laid out"
  * primitive (row-group sizing audits like BENCH_NOTES' layout study).
  */
object ParquetMetadata {

  /** One row per (file, row group): file_name, row_group_id,
    * row_group_num_rows, n_columns, compressed_bytes. `path` may be a
    * single file or a directory of `*.parquet` files. */
  def forPath(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files: Seq[String] = {
      val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(path))
      if (st.isDirectory)
        fs.listStatus(new org.apache.hadoop.fs.Path(path))
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toString).toSeq.sorted
      else Seq(st.getPath.toString)
    }
    val parallelism =
      math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(files).repartition(parallelism)
      .mapPartitions { it =>
        // Hadoop Configuration is not serializable; rebuild per task. The
        // fixture/lake paths here are plain file:/ or the cluster default FS.
        val conf = new org.apache.hadoop.conf.Configuration()
        it.flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val name = f.substring(f.lastIndexOf('/') + 1)
            import scala.jdk.CollectionConverters._
            reader.getFooter.getBlocks.asScala.zipWithIndex.map {
              case (block, i) =>
                (name, i.toLong, block.getRowCount,
                  block.getColumns.size.toLong, block.getCompressedSize)
            }.toSeq
          } finally reader.close()
        }
      }
      .toDF("file_name", "row_group_id", "row_group_num_rows",
        "n_columns", "compressed_bytes")
  }
}
