package graft

import org.scalatest.funsuite.AnyFunSuite

class DFContextSpec extends AnyFunSuite {
  import TestSpark._

  lazy val ctx: DFContext = { val c = DFContext(spark); c.registerAll(sfDir); c }

  test("register + sql end to end") {
    ctx.register("nation2", s"$sfDir/nation.parquet")
    assert(ctx.sql("SELECT count(*) AS n FROM nation2").collect().head.getLong(0) == 25)
  }

  test("QUALIFY rewrite") {
    val rows = ctx.sql("""
      SELECT s_nationkey, s_suppkey,
             row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rn
      FROM supplier
      QUALIFY rn = 1""").collect()
    val perNation = ctx.sql(
      "SELECT count(DISTINCT s_nationkey) AS n FROM supplier").collect().head.getLong(0)
    assert(rows.length == perNation)
    assert(rows.forall(_.getInt(2) == 1))
  }

  test("DISTINCT ON rewrite picks first row per key by order") {
    val rows = ctx.sql("""SELECT DISTINCT ON (c_nationkey) c_nationkey, c_custkey, c_acctbal
      FROM customer ORDER BY c_nationkey, c_acctbal DESC""").collect()
    val nations = ctx.sql(
      "SELECT count(DISTINCT c_nationkey) AS n FROM customer").collect().head.getLong(0)
    assert(rows.length == nations)
    // each returned row carries its nation's max acctbal
    val maxes = ctx.sql(
      "SELECT c_nationkey, max(c_acctbal) AS m FROM customer GROUP BY c_nationkey")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    rows.foreach(r => assert(r.getDouble(2) == maxes(r.getInt(0))))
  }

  test("QUALIFY followed by ORDER BY and LIMIT keeps the tail outside the predicate") {
    val rows = ctx.sql("""
      SELECT s_nationkey, s_suppkey,
             row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rn
      FROM supplier
      QUALIFY rn = 1
      ORDER BY s_nationkey
      LIMIT 5""").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getInt(2) == 1))
    // ordered output: nation keys ascending
    assert(rows.map(_.getInt(0)).toSeq == rows.map(_.getInt(0)).toSeq.sorted)
  }

  test("QUALIFY predicate containing an inline window spec is not split") {
    // the predicate's window sees the select-list columns (documented
    // limitation of the textual rewrite: reference QUALIFY may also see
    // non-selected base columns)
    val rows = ctx.sql("""
      SELECT s_nationkey, s_suppkey, s_acctbal FROM supplier
      QUALIFY row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) = 1
      LIMIT 3""").collect()
    assert(rows.length == 3)
  }

  test("DISTINCT ON with parenthesized key expressions") {
    val rows = ctx.sql("""SELECT DISTINCT ON (abs(c_nationkey), c_mktsegment)
        c_nationkey, c_mktsegment, c_acctbal
      FROM customer ORDER BY abs(c_nationkey), c_mktsegment, c_acctbal DESC""").collect()
    val groups = ctx.sql(
      """SELECT count(*) AS n FROM (
        |  SELECT DISTINCT abs(c_nationkey), c_mktsegment FROM customer)""".stripMargin)
      .collect().head.getLong(0)
    assert(rows.length == groups)
  }

  test("QUALIFY predicate with keywords inside string literals is not split") {
    val rows = ctx.sql("""
      SELECT s_nationkey, s_name,
             row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC) AS rn
      FROM supplier
      QUALIFY rn = 1 AND s_name <> 'ORDER BY (LIMIT'
      LIMIT 4""").collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getInt(2) == 1))
  }

  test("DISTINCT ON key list containing a quoted paren parses") {
    val rows = ctx.sql("""SELECT DISTINCT ON (concat(c_mktsegment, '(x')) c_mktsegment, c_acctbal
      FROM customer ORDER BY concat(c_mktsegment, '(x'), c_acctbal DESC""").collect()
    val segs = ctx.sql("SELECT count(DISTINCT c_mktsegment) AS n FROM customer")
      .collect().head.getLong(0)
    assert(rows.length == segs)
  }

  test("DISTINCT ON with trailing LIMIT") {
    val rows = ctx.sql("""SELECT DISTINCT ON (c_nationkey) c_nationkey, c_acctbal
      FROM customer ORDER BY c_nationkey, c_acctbal DESC LIMIT 4""").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getInt(0)).toSeq == rows.map(_.getInt(0)).toSeq.sorted)
  }

  test("sqlWithParams binds named placeholders") {
    val n = ctx.sqlWithParams(
      "SELECT count(*) AS n FROM customer WHERE c_acctbal > :minBal AND c_mktsegment = :seg",
      Map("minBal" -> 5000.0, "seg" -> "BUILDING")).collect().head.getLong(0)
    val direct = ctx.sql(
      "SELECT count(*) AS n FROM customer WHERE c_acctbal > 5000.0 AND c_mktsegment = 'BUILDING'")
      .collect().head.getLong(0)
    assert(n == direct && n > 0)
  }

  test("information_schema surfaces") {
    val tables = ctx.informationSchemaTables().collect().map(_.getString(0))
    assert(tables.contains("customer") && tables.contains("lineitem"))
    val cols = ctx.informationSchemaColumns("nation").collect().map(_.getString(0))
    assert(cols.sameElements(Array("n_nationkey", "n_name", "n_regionkey")))
  }

  test("explainAnalyze reports per-operator runtime metrics") {
    ctx.register("li_ea", s"$sfDir/lineitem.parquet")
    val out = ctx.explainAnalyze(
      "SELECT l_returnflag, count(*) AS n FROM li_ea WHERE l_quantity < 10 GROUP BY 1")
    assert(out.contains("HashAggregate"))
    assert(out.contains("numOutputRows="))
    // the scan's row counter must reflect actual execution, not zero
    val rowCounts = "numOutputRows=(\\d+)".r.findAllMatchIn(out).map(_.group(1).toLong).toSeq
    assert(rowCounts.exists(_ > 0), s"all-zero metrics:\n$out")
  }

  test("explain returns a physical plan") {
    ctx.register("nation_explain", s"$sfDir/nation.parquet")
    val plan = ctx.explain("SELECT count(*) FROM nation_explain WHERE n_regionkey = 1")
    assert(plan.contains("Physical Plan"))
    // another suite may have cached the underlying relation, in which case
    // the scan is served from memory instead of parquet pushdown
    assert(plan.contains("PushedFilters") || plan.contains("InMemoryTableScan"))
  }
}
