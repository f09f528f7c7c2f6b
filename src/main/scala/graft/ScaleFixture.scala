package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scala mirror of tools/gen_sf1.py: build an SF-N fixture from the sf0.1
  * star by replicating each table N times with per-copy key-space shifts so
  * pk/fk relationships stay consistent (copy i shifts orderkey by i*OK,
  * custkey by i*CK, partkey by i*PK, suppkey by i*SK — offsets = max+1 of
  * the source key). Dates/prices/dimension text are unchanged, so per-row
  * selectivities match the originals and aggregates scale ~N x.
  *
  * Used by Bench's `tpch22_sf1` section so the matched-scale run is
  * self-contained: per-table existence checks mean a fixture already built
  * by gen_sf1.py (or a partial one) is completed, never clobbered. Values
  * agree with gen_sf1.py by construction (same shifts, same formulas);
  * partsupp is written FROM the Tables.partsupp derivation, which is
  * spec-equal to the generator's SQL (verified bit-identical at SF1).
  */
object ScaleFixture {

  /** Big tables get ~32 files so a local[32] scan parallelizes; row groups
    * stay at one-per-file (~190k rows at SF1) near the measured optimum. */
  private val Files = 32

  def ensure(spark: SparkSession, src: String, out: String, n: Int = 10): Unit = {
    new java.io.File(out).mkdirs()
    def missing(t: String) = !new java.io.File(s"$out/$t.parquet").exists()
    def mx(t: String, c: String): Long =
      Tables.load(spark, src, t).agg(max(col(c))).collect()(0).getLong(0) + 1
    lazy val ok = mx("orders", "o_orderkey")
    lazy val ck = mx("customer", "c_custkey")
    lazy val pk = mx("part", "p_partkey")
    lazy val sk = mx("supplier", "s_suppkey")

    def copies(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(n).select(col("id").as("__i")))

    def write(t: String, df: DataFrame): Unit = {
      df.repartition(Files).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
    }

    if (missing("lineitem"))
      write("lineitem", copies(Tables.load(spark, src, "lineitem")).select(
        (col("l_orderkey") + col("__i") * ok).as("l_orderkey"),
        (col("l_partkey") + col("__i") * pk).as("l_partkey"),
        (col("l_suppkey") + col("__i") * sk).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")))
    if (missing("orders"))
      write("orders", copies(Tables.load(spark, src, "orders")).select(
        (col("o_orderkey") + col("__i") * ok).as("o_orderkey"),
        (col("o_custkey") + col("__i") * ck).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")))
    if (missing("customer"))
      write("customer", copies(Tables.load(spark, src, "customer")).select(
        (col("c_custkey") + col("__i") * ck).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment")))
    if (missing("supplier"))
      write("supplier", copies(Tables.load(spark, src, "supplier")).select(
        (col("s_suppkey") + col("__i") * sk).as("s_suppkey"),
        col("s_name"), col("s_nationkey"), col("s_acctbal")))
    if (missing("part"))
      write("part", copies(Tables.load(spark, src, "part")).select(
        (col("p_partkey") + col("__i") * pk).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice")))
    for (small <- Seq("nation", "region") if missing(small))
      Tables.load(spark, src, small).coalesce(1).write
        .mode("overwrite").parquet(s"$out/$small.parquet")
    // partsupp: written from the derivation over the GENERATED tables, so
    // file mode == derived mode by construction (4 suppliers/part — the
    // reference's real 800k-row volume at SF1)
    if (missing("partsupp"))
      Tables.partsupp(spark, out).repartition(8)
        .write.mode("overwrite").parquet(s"$out/partsupp.parquet")
  }
}
