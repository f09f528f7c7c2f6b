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

  /** knownDivergent: (category/file.slt, line) -> documented reason. */
  private def runCategory(cat: String, minPassed: Int,
      knownDivergent: Map[(String, Int), String] = Map.empty): Unit = {
    assume(available, s"$base not present")
    var passed, skipped = 0
    val failures = scala.collection.mutable.ListBuffer[String]()
    val skipReasons = scala.collection.mutable.Map[String, Int]()
    for (f <- files(cat)) {
      val key = s"$cat/$f"
      val known = knownDivergent.collect { case ((k, l), why) if k == key => l -> why }
      val r = SltRunner.runFile(spark.newSession(), s"$base/$cat/$f", known)
      passed += r.passed
      skipped += r.skipped.size
      r.skipped.foreach { case (_, why) =>
        skipReasons(why) = skipReasons.getOrElse(why, 0) + 1 }
      r.failures.foreach(x =>
        failures += s"$key l${x.line}: ${x.sql.take(120).replace('\n', ' ')} -> ${x.detail.take(160).replace('\n', ' ')}")
    }
    info(s"$cat: ${files(cat).size} files, $passed passed, $skipped skipped")
    skipReasons.toSeq.sortBy(-_._2).foreach { case (why, n) =>
      info(s"  skipped x$n: $why") }
    failures.foreach(f => info(s"  FAILED $f"))
    assert(failures.isEmpty, s"${failures.size} slt failures in spark/$cat")
    assert(passed >= minPassed, s"only $passed passed in spark/$cat")
  }

  test("spark/aggregate")   { runCategory("aggregate", 1) }
  test("spark/array")       { runCategory("array", 1) }
  test("spark/bitmap")      { runCategory("bitmap", 1) }
  test("spark/bitwise")     { runCategory("bitwise", 1) }
  test("spark/collection")  { runCategory("collection", 1) }
  test("spark/conditional") { runCategory("conditional", 1) }
  test("spark/conversion")  { runCategory("conversion", 1) }
  test("spark/csv")         { runCategory("csv", 1) }
  test("spark/datetime")    { runCategory("datetime", 1) }
  test("spark/hash")        { runCategory("hash", 1) }
  test("spark/json")        { runCategory("json", 1) }
  test("spark/map")         { runCategory("map", 1) }
  test("spark/math")        { runCategory("math", 1) }
  test("spark/misc")        { runCategory("misc", 1) }
  test("spark/predicate")   { runCategory("predicate", 1) }
  test("spark/string")      { runCategory("string", 1) }
  test("spark/struct")      { runCategory("struct", 1) }
  test("spark/url")         { runCategory("url", 1) }
  test("spark/xml")         { runCategory("xml", 1) }
}
