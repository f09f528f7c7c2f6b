package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsyncBatch
import graft.plans.UnionsToFilter

class ExtensionsSpec extends AnyFunSuite {

  // `withExtensions` only applies to a freshly built session; the suites
  // share one, so install the rule at runtime — the equivalent public API.
  lazy val extSpark: SparkSession = {
    val s = TestSpark.spark
    if (!s.experimental.extraOptimizations.contains(UnionsToFilter))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ UnionsToFilter
    s
  }

  test("UnionsToFilter collapses same-source DISTINCT union branches into one scan") {
    val li = Tables.load(extSpark, TestSpark.sfDir, "lineitem")
    val a = li.filter(col("l_quantity") < 5)
    val b = li.filter(col("l_quantity") > 45)
    val unioned = a.unionAll(b).distinct()
    val optimized = unioned.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("Union"), s"distinct union not collapsed:\n$optimized")
    // correctness: equals the OR-filter formulation
    val expect = li.filter(col("l_quantity") < 5 || col("l_quantity") > 45).distinct().count()
    assert(unioned.count() == expect)
  }

  test("UnionsToFilter preserves UNION ALL duplicates (overlapping predicates)") {
    val li = Tables.load(extSpark, TestSpark.sfDir, "lineitem")
    // overlap: rows with 5 < l_quantity < 10 satisfy BOTH branches and must
    // be emitted twice by UNION ALL — the rule must not fire on a bare union
    val a = li.filter(col("l_quantity") < 10)
    val b = li.filter(col("l_quantity") > 5)
    val unioned = a.unionAll(b)
    assert(unioned.queryExecution.optimizedPlan.toString.contains("Union"),
      "bare UNION ALL must not be collapsed")
    assert(unioned.count() == a.count() + b.count())
  }

  test("UnionsToFilter skips non-deterministic predicates") {
    val li = Tables.load(extSpark, TestSpark.sfDir, "lineitem")
    val a = li.filter(rand(1) < 0.5)
    val b = li.filter(rand(2) < 0.5)
    val unioned = a.unionAll(b).distinct()
    assert(unioned.queryExecution.optimizedPlan.toString.contains("Union"),
      "non-deterministic branch predicates must not be OR-merged")
  }

  test("rule leaves different-source unions alone") {
    val li = Tables.load(extSpark, TestSpark.sfDir, "lineitem")
    val o = Tables.load(extSpark, TestSpark.sfDir, "orders")
    val u = li.select(col("l_orderkey").as("k")).filter(col("k") < 100)
      .unionAll(o.select(col("o_orderkey").as("k")).filter(col("k") > 200))
    assert(u.queryExecution.optimizedPlan.toString.contains("Union"))
    assert(u.count() > 0)
  }

  test("AsyncBatch.mapAsync preserves order and values") {
    val s = extSpark
    import s.implicits._
    val ds = s.range(0, 1000).as[Long]
    val out = AsyncBatch.mapAsync(ds, concurrency = 8) { x =>
      // simulate a slow external call
      if (x % 100 == 0) Thread.sleep(1)
      x * 2
    }.collect()
    assert(out.sorted.sameElements((0L until 1000L).map(_ * 2)))
  }
}
