package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ArrowIpcWriter

/** From-scratch Arrow IPC DSv2: roundtrip fidelity, column pruning, nulls,
  * multi-file directories. */
class ArrowIpcSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dir = Files.createTempDirectory("graft_arrow_spec")

  test("roundtrip preserves values and schema") {
    val src = Tables.load(spark, sfDir, "customer")
    val path = dir.resolve("cust.arrow").toString
    ArrowIpcWriter.write(src, path)
    val back = spark.read.format("graft.sources.ArrowIpcTableProvider").load(path)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    val a = back.orderBy("c_custkey").collect()
    val b = src.orderBy("c_custkey").collect()
    assert(a.sameElements(b))
  }

  test("column pruning reaches the scan") {
    val path = dir.resolve("cust.arrow").toString
    val back = spark.read.format("graft.sources.ArrowIpcTableProvider").load(path)
      .select("c_mktsegment")
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("ArrowIpcScan"))
    assert(scan.contains("c_mktsegment") && !scan.contains("c_acctbal"),
      s"pruning missing:\n$scan")
    assert(back.distinct().count() > 0)
  }

  test("distributed DSv2 write: one file per partition, roundtrip, overwrite truncates") {
    val src = Tables.load(spark, sfDir, "orders").repartition(3)
    val d = dir.resolve("dsv2_write").toString
    src.write.format("graft.sources.ArrowIpcTableProvider").mode("overwrite").save(d)
    val files = graft.sources.ArrowIpcSource.files(d)
    assert(files.size == 3, s"expected 3 part files, got $files")
    assert(files.forall(_._1.getFileName.toString.endsWith(".arrow")))
    val back = spark.read.format("graft.sources.ArrowIpcTableProvider").load(d)
    assert(back.count() == src.count())
    val (sa, sb) = (back.agg(sum("o_totalprice")).collect().head.getDouble(0),
      src.agg(sum("o_totalprice")).collect().head.getDouble(0))
    // FP sum order differs across partitionings; values must agree to 1e-12 rel
    assert(math.abs(sa - sb) / math.abs(sb) < 1e-12, s"$sa vs $sb")
    // overwrite with fewer partitions must truncate the old part files
    src.limit(10).repartition(1).write
      .format("graft.sources.ArrowIpcTableProvider").mode("overwrite").save(d)
    assert(graft.sources.ArrowIpcSource.files(d).size == 1)
    val back2 = spark.read.format("graft.sources.ArrowIpcTableProvider").load(d)
    assert(back2.count() == 10)
  }

  test("distributed DSv2 write: append adds files, nulls and timestamps survive") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some("a"), Some(1.5)), (2L, None, None), (3L, Some("c"), Some(-2.0)))
      .toDF("id", "name", "x")
      .withColumn("ts", to_timestamp(lit("2024-03-01 12:00:00.000001")))
      .withColumn("d", to_date(lit("2024-03-01")))
      .repartition(1)
    val d = dir.resolve("dsv2_append").toString
    df.write.format("graft.sources.ArrowIpcTableProvider").mode("overwrite").save(d)
    df.write.format("graft.sources.ArrowIpcTableProvider").mode("append").save(d)
    val back = spark.read.format("graft.sources.ArrowIpcTableProvider").load(d)
    assert(back.count() == 6)
    assert(back.where(col("name").isNull).count() == 2)
    assert(back.select("ts").distinct().collect().head.getTimestamp(0).getNanos == 1000)
    assert(back.select("d").distinct().count() == 1)
  }

  test("nulls and a directory of files") {
    val s = spark; import s.implicits._
    val df = Seq((1L, Some("a"), Some(1.5)), (2L, None, None), (3L, Some("c"), Some(-2.0)))
      .toDF("id", "name", "x")
    val d = dir.resolve("multi")
    ArrowIpcWriter.write(df.where(col("id") <= 2), d.resolve("part0.arrow").toString)
    ArrowIpcWriter.write(df.where(col("id") > 2), d.resolve("part1.arrow").toString)
    val back = spark.read.format("graft.sources.ArrowIpcTableProvider").load(d.toString)
    assert(back.count() == 3)
    assert(back.where(col("name").isNull).count() == 1)
    assert(back.agg(sum("x")).collect().head.getDouble(0) == -0.5)
  }
}
