package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Statistics-answered aggregates (the reference's aggregate_statistics
  * optimizer rule): with the DSv2 parquet reader, COUNT/MIN/MAX push into
  * the scan and are answered from row-group metadata — the executed plan
  * must carry PushedAggregation and produce correct values.
  */
class AggPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("count/min/max push into the parquet scan as PushedAggregation") {
    val ss = graft.queries.Round5bQueries.aggPushdownSession(spark)
    val df = Tables.load(ss, dir, "lineitem")
      .agg(count(lit(1)).as("n"),
        min(col("l_orderkey")).as("min_ok"),
        max(col("l_orderkey")).as("max_ok"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [COUNT(*)"),
      s"aggregation not pushed to the scan:\n${plan.take(2000)}")
    val row = df.collect()(0)
    val exact = Tables.load(spark, dir, "lineitem")
      .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_orderkey")))
      .collect()(0)
    assert(row.getLong(0) == exact.getLong(0))
    assert(row.getLong(1) == exact.getLong(1))
    assert(row.getLong(2) == exact.getLong(2))
  }
}
