package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality assertions for the TPC-DS tranche-5 shapes — the same
  * 100 TB questions WorkloadPlanSpec asks of the workload suites: partial
  * aggregation below every exchange, dimensions broadcast instead of the
  * fact being exchanged, selective predicates pushed to the parquet scan,
  * and rollup/rank pipelines staying in the native Expand + Window path.
  */
class Tpcds5PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark.newSession(), dir)
      .queryExecution.executedPlan.toString

  test("share-of-parent windows aggregate partially before the exchange") {
    for (q <- Seq("tpcds_q20_class_share", "tpcds_q98_share_report")) {
      val p = plan(q)
      assert(p.contains("partial_sum"), s"$q lacks map-side partial agg:\n$p")
      assert(p.contains("Window"), s"$q lost the share window:\n$p")
    }
  }

  test("latency-band reports reduce map-side (one keyed exchange of the fact)") {
    for (q <- Seq("tpcds_q50_latency_bands", "tpcds_q62_latency_by_channel")) {
      val p = plan(q)
      assert(p.contains("partial_sum"), s"$q lacks partial CASE sums:\n$p")
    }
  }

  test("rollup ranking stays on the native Expand + Window path") {
    for (q <- Seq("tpcds_q67_rollup_rank", "tpcds_q86_hierarchy_rank")) {
      val p = plan(q)
      assert(p.contains("Expand"), s"$q rollup not via Expand:\n$p")
      assert(p.contains("Window"), s"$q rank not a Window op:\n$p")
    }
  }

  test("dimension joins broadcast — the part/nation side, never the fact") {
    for (q <- Seq("tpcds_q42_month_category", "tpcds_q52_month_brand",
        "tpcds_q91_cc_losses")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q has no broadcast join:\n$p")
    }
  }

  test("price-band part predicates are pushed to the parquet scan") {
    val p = plan("tpcds_q37_price_band_activity")
    assert(p.contains("PushedFilters:") && p.contains("p_retailprice"),
      s"p_retailprice band not pushed:\n$p")
  }

  test("self-joined per-pair aggregates are two-phase on both sides") {
    val p = plan("tpcds_q64_repeat_pairs")
    assert(p.contains("partial_sum"), s"pair aggregates not partial:\n$p")
  }
}
