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
