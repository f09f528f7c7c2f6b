package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality assertions for the round-5 workload suites — the 100 TB
  * questions asked of each shape: does the filter reach the scan, is the
  * aggregation partial before the exchange, does the window top-k prune
  * pre-shuffle, is the sort a top-k operator, do the star joins broadcast
  * the dimensions instead of exchanging the fact?
  */
class WorkloadPlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark.newSession(), dir)
      .queryExecution.executedPlan.toString

  test("cb_props_search pushes the value predicate to the parquet scan") {
    val p = plan("cb_props_search")
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThan(value,25.0)"),
      s"value>25 not pushed:\n$p")
  }

  test("high-cardinality aggregations are two-phase (partial before exchange)") {
    for (q <- Seq("h2o_g5_sum_hicard", "external_aggr_hicard",
        "cb_user_minute_matrix")) {
      val p = plan(q)
      assert(p.contains("partial_sum") || p.contains("partial_count"),
        s"$q lacks map-side partial aggregation:\n$p")
    }
  }

  test("h2o_g8 top-2-per-group prunes with WindowGroupLimit before the shuffle") {
    val p = plan("h2o_g8_top2_per_group")
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$p")
  }

  test("sort_tpch_wide plans as top-k, not a global sort") {
    val p = plan("sort_tpch_wide")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("job_min_star broadcasts every dimension (fact never exchanged pre-agg)") {
    val p = plan("job_min_star")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"dimension join fell back to sort-merge at fixture scale:\n$p")
  }

  test("h2o groupby shapes scan only the referenced columns") {
    // column pruning: g4 touches 4 lineitem columns; the scan must not
    // read the full 11-column schema
    // the scan may be a FileScan or (when another suite cached lineitem)
    // an InMemoryTableScan — both must project only the 4 referenced
    // columns, so assert on the scan line rather than a fixed schema text
    val p = plan("h2o_g4_mean_by_key")
    val scanLine = p.linesIterator
      .find(l => l.contains("FileScan parquet") || l.contains("InMemoryTableScan"))
      .getOrElse(fail(s"no scan in plan:\n$p"))
    for (c <- Seq("l_partkey", "l_quantity", "l_extendedprice", "l_discount"))
      assert(scanLine.contains(c), s"pruned scan lost $c:\n$scanLine")
    for (c <- Seq("l_tax", "l_returnflag", "l_shipdate", "l_orderkey"))
      assert(!scanLine.contains(c), s"scan not pruned ($c still read):\n$scanLine")
  }
}
