package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavior asserts for the round-4 slt-gap batch (Round4cQueries): plan
  * shape for dynamic partition pruning, catalog-stats truth, SQL UDF
  * semantics, truncate, union-by-name null fill, footer-reader consistency.
  */
class Round4cSpec extends AnyFunSuite {
  import TestSpark._
  import graft.queries.Round4cQueries

  test("scan_dpp plans a dynamic-partition-pruning subquery on the fact scan") {
    // child session: force the DPP heuristic path (useStats declines at toy
    // row counts); the partitioned-scan + filtered-broadcast shape is what's
    // under test, not the cost model
    val ss = spark.newSession()
    ss.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    val df = Round4cQueries.queries("scan_dpp")(ss, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning in plan:\n$plan")
    // and the pruning actually works: 5 ASIA nations at any SF
    assert(df.count() == 5)
  }

  test("catalog_analyze stats equal recomputed ground truth") {
    val row = Round4cQueries.queries("catalog_analyze")(spark, sfDir).collect().head
    val truth = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .agg(count(lit(1)), min(col("o_totalprice")), max(col("o_totalprice")))
      .collect().head
    assert(row.getLong(row.fieldIndex("row_count")) == truth.getLong(0))
    assert(row.getDouble(row.fieldIndex("min_price")) == truth.getDouble(1))
    assert(row.getDouble(row.fieldIndex("max_price")) == truth.getDouble(2))
  }

  test("SQL scalar UDF and table-valued UDF compose") {
    val df = Round4cQueries.queries("fn_sql_udf")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val price = r.getDouble(r.fieldIndex("price"))
      assert(price > 915.0)
      assert(r.getDouble(r.fieldIndex("discounted")) == price * 0.75)
    }
  }

  test("truncate keeps schema, drops all rows") {
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val tr = graft.operators.SessionTables.truncate(region)
    assert(tr.schema == region.schema)
    assert(tr.count() == 0)
  }

  test("union-by-name fills missing columns with nulls") {
    val df = Round4cQueries.queries("set_union_by_name")(spark, sfDir)
    val n = spark.read.parquet(s"$sfDir/nation.parquet").count()
    assert(df.count() == 2 * n)
    assert(df.filter(col("n_regionkey").isNull).count() == n)
    assert(df.columns.sorted.toSeq == Seq("n_name", "n_nationkey", "n_regionkey"))
  }

  test("parquet footer reader agrees with the scan") {
    val meta = graft.sources.ParquetMetadata
      .forPath(spark, Round4cQueries.metaDemoDir)
    val perFile = meta.groupBy("file_name")
      .agg(sum("row_group_num_rows").as("rows"), count(lit(1)).as("groups"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val scanned = spark.read.parquet(Round4cQueries.metaDemoDir)
      .groupBy(expr("_metadata.file_name").as("f")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perFile.view.mapValues(_._1).toMap == scanned)
    assert(perFile("f0.parquet")._2 == 2) // the multi-row-group file
  }
}
