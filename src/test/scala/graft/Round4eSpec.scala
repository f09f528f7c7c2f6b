package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Front-door statements (set_variable.slt, describe.slt, ddl.slt SHOW)
  * and optimizer-parity checks (eliminate_outer_join.slt,
  * propagate_empty_relation_outer_join.slt).
  */
class Round4eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ctx = DFContext(spark)

  test("SET / SET -v / RESET flow through the SQL front-door") {
    Tables.registerAll(spark, TestSpark.sfDir)
    ctx.sql("SET spark.sql.shuffle.partitions=7")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "7")
    val shown = ctx.sql("SET spark.sql.shuffle.partitions").collect()
    assert(shown.head.getString(0) == "spark.sql.shuffle.partitions")
    assert(shown.head.getString(1) == "7")
    ctx.sql("RESET spark.sql.shuffle.partitions")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4") // TestSpark default
  }

  test("DESCRIBE TABLE lists columns and types") {
    Tables.registerAll(spark, TestSpark.sfDir)
    val rows = ctx.sql("DESCRIBE TABLE nation").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(rows("n_nationkey") == "int" || rows("n_nationkey") == "bigint")
    assert(rows("n_name") == "string")
  }

  test("SHOW TABLES and SHOW DATABASES work") {
    Tables.registerAll(spark, TestSpark.sfDir)
    val tables = ctx.sql("SHOW TABLES").collect().map(_.getString(1))
    assert(tables.contains("nation") && tables.contains("lineitem"))
    val dbs = ctx.sql("SHOW DATABASES").collect().map(_.getString(0))
    assert(dbs.contains("default"))
  }

  test("identifier resolution is case-insensitive by default (ident_normalization)") {
    Tables.registerAll(spark, TestSpark.sfDir)
    val df = ctx.sql("SELECT N_NAME FROM NATION WHERE n_NationKey = 0")
    assert(df.columns.toSeq == Seq("N_NAME"))
    assert(df.count() == 1)
  }

  test("null-rejecting predicate downgrades a left join to inner (eliminate_outer_join)") {
    Tables.registerAll(spark, TestSpark.sfDir)
    val plan = spark.sql(
      """SELECT o_orderkey, c_name FROM orders LEFT JOIN customer
        |ON o_custkey = c_custkey WHERE c_acctbal > 0""".stripMargin)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Inner") && !plan.contains("LeftOuter"), plan)
  }

  test("empty relation propagates through an inner join (propagate_empty_relation)") {
    Tables.registerAll(spark, TestSpark.sfDir)
    val plan = spark.sql(
      """SELECT o_orderkey, n_name FROM orders
        |JOIN (SELECT * FROM nation WHERE 1 = 0) ON o_custkey = n_nationkey""".stripMargin)
      .queryExecution.optimizedPlan
    assert(plan.getClass.getSimpleName.contains("LocalRelation"), plan.toString)
  }

  test("from_utc_timestamp covers the DST spring-forward hour") {
    // 2024-03-10 06:59 UTC = 01:59 EST; 07:00 UTC = 03:00 EDT (02:xx skipped)
    val out = spark.sql(
      """SELECT date_format(from_utc_timestamp(timestamp'2024-03-10 06:59:00', 'America/New_York'),
        |                   'HH:mm') AS before,
        |       date_format(from_utc_timestamp(timestamp'2024-03-10 07:00:00', 'America/New_York'),
        |                   'HH:mm') AS after""".stripMargin).collect().head
    assert(out.getString(0) == "01:59" && out.getString(1) == "03:00")
  }
}
