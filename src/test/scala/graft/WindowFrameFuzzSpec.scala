package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for bounded window frames — the port of the
  * reference's core/tests/fuzz_cases/window_fuzz.rs idea: the windowed
  * aggregate over a random ROWS/RANGE frame must equal the brute-force
  * self-join formulation, for random bounds (including empty frames and
  * unbounded edges), random aggregates, and nullable values.
  *
  * Order keys are unique within a group but NON-dense (random gaps), so
  * ROWS and RANGE genuinely differ and each brute-force formulation is
  * exercised on its own semantics.
  */
class WindowFrameFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("random ROWS/RANGE frames agree with self-join brute force (24 cases)") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(20260814)
    // 40 groups x 50 rows; order keys strictly increasing with random gaps
    val rows = (0 until 40).flatMap { g =>
      var o = 0L
      (0 until 50).map { _ =>
        o += 1 + r.nextInt(4)
        val x: java.lang.Double =
          if (r.nextInt(10) == 0) null
          else java.lang.Double.valueOf(r.nextInt(100).toDouble)
        (g, o, x)
      }
    }
    rows.toDF("g", "o", "x").createOrReplaceTempView("wf_fuzz")
    s.sql("""SELECT g, o, x, ROW_NUMBER() OVER (PARTITION BY g ORDER BY o) AS rn
            |FROM wf_fuzz""".stripMargin).createOrReplaceTempView("wf_rn")

    val aggs = Seq("SUM", "COUNT", "MIN", "MAX", "AVG")
    def bound(): Int = r.nextInt(5) match {
      case 0 => Int.MinValue // UNBOUNDED PRECEDING
      case 1 => Int.MaxValue // UNBOUNDED FOLLOWING
      case _ => r.nextInt(11) - 5
    }
    for (i <- 1 to 24) {
      val isRows = r.nextBoolean()
      val agg = aggs(r.nextInt(aggs.size))
      var (lo, hi) = (bound(), bound())
      if (lo == Int.MaxValue) lo = 0
      if (hi == Int.MinValue) hi = 0
      // frames where start > end are legal only when both are bounded on
      // the same side (e.g. 5 PRECEDING AND 2 PRECEDING); normalize the
      // rest so the SQL parses
      if (lo != Int.MinValue && hi != Int.MaxValue && lo > hi) {
        val t = lo; lo = hi; hi = t
      }
      def renderBound(b: Int, isStart: Boolean): String = b match {
        case Int.MinValue => "UNBOUNDED PRECEDING"
        case Int.MaxValue => "UNBOUNDED FOLLOWING"
        case 0            => "CURRENT ROW"
        case n if n < 0   => s"${-n} PRECEDING"
        case n            => s"$n FOLLOWING"
      }
      val kind = if (isRows) "ROWS" else "RANGE"
      val frame =
        s"$kind BETWEEN ${renderBound(lo, true)} AND ${renderBound(hi, false)}"
      val win = s.sql(
        s"""SELECT g, o, $agg(x) OVER (PARTITION BY g ORDER BY o $frame) AS v
           |FROM wf_fuzz""".stripMargin)
      val key = if (isRows) "rn" else "o"
      val loPred =
        if (lo == Int.MinValue) "TRUE" else s"b.$key >= a.$key + ($lo)"
      val hiPred =
        if (hi == Int.MaxValue) "TRUE" else s"b.$key <= a.$key + ($hi)"
      val aggExpr = if (agg == "COUNT") "COUNT(b.x)" else s"$agg(b.x)"
      val brute = s.sql(
        s"""SELECT a.g, a.o, $aggExpr AS v
           |FROM wf_rn a LEFT JOIN wf_rn b
           |  ON a.g = b.g AND $loPred AND $hiPred
           |GROUP BY a.g, a.o""".stripMargin)
      val wv = win.collect().map(r0 => (r0.getInt(0), r0.getLong(1),
        Option(r0.get(2)).map(_.toString).getOrElse("∅"))).sortBy(t => (t._1, t._2))
      val bv = brute.collect().map(r0 => (r0.getInt(0), r0.getLong(1),
        Option(r0.get(2)).map(_.toString).getOrElse("∅"))).sortBy(t => (t._1, t._2))
      // COUNT over an empty frame: window yields 0, brute LEFT JOIN yields
      // 0 too (COUNT of all-null b.x) — representations already agree;
      // doubles render identically from identical arithmetic
      assert(wv.length == bv.length, s"case $i ($agg, $frame): row counts differ")
      val bad = wv.zip(bv).filter { case (wr, br) => wr != br }
      assert(bad.isEmpty,
        s"case $i ($agg, $frame): ${bad.take(3).mkString("; ")}")
    }
  }
}
