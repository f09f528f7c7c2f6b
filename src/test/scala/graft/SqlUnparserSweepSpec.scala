package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SqlUnparser

/** Inventory-wide unparser sweep (complements SqlUnparserSpec's curated
  * list): every SQL-shaped inventory entry — the TPC-H/TPC-DS/workload
  * suites — is unparsed from its ANALYZED plan and re-executed, and the
  * result multiset must match exactly. Entries whose plans contain shapes
  * the unparser declares unsupported are counted and printed, never
  * silently dropped; a floor on the roundtripped count keeps the sweep
  * from rotting into skips.
  */
class SqlUnparserSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val already = Set(
    // covered one-by-one in SqlUnparserSpec
    "q1_agg", "q6_filter", "q3_join_topk", "q5_multijoin", "q10_returns",
    "q18_bigorders", "tpcds_q2_yoy_priority", "tpcds_q44_best_worst",
    "tpcds_q69_exists_notexists", "tpcds_q88_bucket_grid",
    "tpcds_q90_half_ratio", "tpcds_q54_segment_histogram",
    "cb_topk_users", "h2o_g6_median_sd")

  private def sweep(prefixes: Seq[String], minRoundtripped: Int): Unit = {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
      .filterNot(already)
    var ok = 0
    val skipped = scala.collection.mutable.ListBuffer[String]()
    val failures = scala.collection.mutable.ListBuffer[String]()
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      val sqlOpt =
        try Some(SqlUnparser.unparse(df))
        catch { case e: UnsupportedOperationException =>
          skipped += s"$name: ${e.getMessage}"; None }
      sqlOpt.foreach { sql =>
        val re = df.sparkSession.sql(sql)
        if (rows(re) == rows(df)) ok += 1
        else failures += s"$name:\n$sql"
      }
    }
    info(s"${names.size} entries: $ok roundtripped, ${skipped.size} unsupported")
    skipped.foreach(s => info(s"  skipped $s"))
    failures.foreach(f => info(s"  MISMATCH $f"))
    assert(failures.isEmpty, s"${failures.size} roundtrip mismatches")
    assert(ok >= minRoundtripped,
      s"only $ok roundtripped (floor $minRoundtripped) — unsupported list grew")
  }

  test("TPC-DS inventory roundtrips through the unparser") {
    sweep(Seq("tpcds_"), minRoundtripped = 75)
  }

  test("TPC-H + workload suites roundtrip through the unparser") {
    sweep(Seq("q1", "q2", "q3", "q4", "q5", "q6", "q7", "q8", "q9",
      "h2o_", "cb_", "job_", "sort_tpch_", "external_aggr_"),
      minRoundtripped = 30)
  }

  test("relational families roundtrip through the unparser") {
    sweep(Seq("win_", "agg_", "set_", "subq_", "sort_", "limit_",
      "distinct_", "unnest_", "join_inner", "join_left", "join_right",
      "join_full", "join_semi", "join_anti", "join_cross", "join_theta",
      "values_", "pivot_", "unpivot_"),
      minRoundtripped = 45)
  }
}
