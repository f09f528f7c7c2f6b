package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Compaction

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def files(path: String): Seq[java.io.File] = {
    def walk(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      kids.filter(f => f.isFile && f.getName.endsWith(".parquet")) ++
        kids.filter(_.isDirectory).flatMap(walk)
    }
    walk(new java.io.File(path))
  }

  test("compaction merges a many-small-files layout, content-identical") {
    val path = s"${System.getProperty("java.io.tmpdir")}/compact_spec_flat"
    import spark.implicits._
    val src = spark.range(0, 50000).select($"id", ($"id" % 97).as("k"))
    src.repartition(64).write.mode("overwrite").parquet(path)
    assert(files(path).size >= 32)
    val beforeRows = spark.read.parquet(path).collect().map(_.toString).sorted
    val (nBefore, nAfter) =
      Compaction.compactParquet(spark, path, targetBytes = 4L * 1024 * 1024)
    assert(nAfter < nBefore / 8, s"still $nAfter files (was $nBefore)")
    val afterRows = spark.read.parquet(path).collect().map(_.toString).sorted
    assert(afterRows.sameElements(beforeRows))
  }

  test("partitioned compaction preserves hive layout and partition pruning") {
    val path = s"${System.getProperty("java.io.tmpdir")}/compact_spec_part"
    import spark.implicits._
    val src = spark.range(0, 20000).select(($"id" % 4).as("p"), $"id".as("v"))
    // 4 partitions x 16 writers = tiny files in every partition dir
    src.repartition(16).write.mode("overwrite").partitionBy("p").parquet(path)
    val before = files(path).size
    val sumBefore = spark.read.parquet(path).agg(sum($"v")).first().getLong(0)
    val (_, nAfter) = Compaction.compactParquet(spark, path,
      targetBytes = 8L * 1024 * 1024, partitionCols = Seq("p"))
    assert(nAfter < before / 2)
    val re = spark.read.parquet(path)
    assert(re.agg(sum($"v")).first().getLong(0) == sumBefore)
    // hive layout survived: partition column readable and pruning applies
    val pruned = re.filter($"p" === 2)
    assert(pruned.count() == 5000)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), s"no partition filters:\n$scan")
  }
}
