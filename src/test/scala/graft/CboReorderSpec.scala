package graft

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based join reorder driven by catalog statistics (the r4 ANALYZE
  * surface feeding Catalyst's CBO): with rowCount + column stats in the
  * catalog, a syntactically bad join order (fact ⋈ big dim first, tiny
  * selective dim last) is re-associated so the cheap selective join
  * happens early. The reference reorders from its own statistics
  * estimates; on the Spark side this is CostBasedJoinReorder, which only
  * fires when every input carries stats — exactly what ANALYZE provides.
  */
class CboReorderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("ANALYZE stats flip the join order under CBO") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    ss.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.sql("CREATE DATABASE IF NOT EXISTS cbo_spec")
    for (t <- Seq("lineitem", "orders", "nation", "customer")) {
      graft.Tables.load(ss, dir, t).createOrReplaceTempView(s"src_$t")
      ss.sql(s"DROP TABLE IF EXISTS cbo_spec.$t")
      ss.sql(s"CREATE TABLE cbo_spec.$t USING parquet AS SELECT * FROM src_$t")
      ss.sql(s"ANALYZE TABLE cbo_spec.$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    // syntactic order: fact ⋈ orders (big) ⋈ customer ⋈ nation (tiny,
    // selective filter) — a cost-oblivious planner joins left-deep as
    // written, carrying the full fact through every step
    val q =
      """SELECT n_name, count(*) AS n
        |FROM cbo_spec.lineitem
        |JOIN cbo_spec.orders ON l_orderkey = o_orderkey
        |JOIN cbo_spec.customer ON o_custkey = c_custkey
        |JOIN cbo_spec.nation ON c_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3'
        |GROUP BY n_name""".stripMargin
    val withCbo = ss.sql(q)
    def joinOrder(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
      joins.map(_.right.collectLeaves().flatMap(_.output.map(_.name))
        .find(n => Seq("o_orderkey", "c_custkey", "n_nationkey", "l_orderkey")
          .contains(n)).getOrElse("?")).toSeq
    }
    val off = ss.newSession()
    off.conf.set("spark.sql.cbo.enabled", "false")
    off.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val withoutCbo = off.sql(q)
    info(s"cbo order:    ${joinOrder(withCbo).mkString(" <- ")}")
    info(s"no-cbo order: ${joinOrder(withoutCbo).mkString(" <- ")}")
    assert(joinOrder(withCbo) != joinOrder(withoutCbo),
      "CBO with full stats left the syntactic join order unchanged")
    // reorder must not change the answer
    assert(withCbo.collect().map(_.toString).sorted.toSeq ==
      withoutCbo.collect().map(_.toString).sorted.toSeq)
    ss.sql("DROP DATABASE cbo_spec CASCADE")
  }

  test("BroadcastAdvisor prefers catalog stats; footers never touched") {
    import graft.plans.BroadcastAdvisor
    val ss = spark.newSession()
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_scratch/adv_catstats"
    graft.Tables.load(ss, dir, "orders").write.mode("overwrite").parquet(path)
    ss.sql("DROP TABLE IF EXISTS adv_orders")
    ss.sql(s"CREATE TABLE adv_orders USING parquet LOCATION '$path'")
    ss.sql("ANALYZE TABLE adv_orders COMPUTE STATISTICS FOR ALL COLUMNS")
    val expectRows = ss.table("adv_orders").count()

    // delete the files: any footer read now throws, so a passing lookup
    // PROVES the advisor served the metastore numbers (the cluster path —
    // stats without touching storage)
    val d = new java.io.File(path)
    d.listFiles().foreach(_.delete())

    val st = BroadcastAdvisor.catalogStats(ss, path)
      .getOrElse(fail("catalogStats found no ANALYZEd table for the path"))
    assert(st.rows == expectRows, s"rows ${st.rows} != $expectRows")
    val ok = st.cols.get("o_orderkey")
      .getOrElse(fail("no o_orderkey column stats"))
    assert(ok.minLong.isDefined && ok.maxLong.isDefined)
    assert(ok.maxLong.get > ok.minLong.get)
    // temporal columns carry stored-unit bounds like the footer path does
    st.cols.get("o_orderdate").foreach { odc =>
      assert(odc.microsPerUnit.isDefined,
        "o_orderdate catalog stats missing unit annotation")
    }
    // and the public entry point resolves through the catalog too
    val viaEntry = BroadcastAdvisor.tableStats(ss, path)
    assert(viaEntry.rows == expectRows)
    ss.sql("DROP TABLE adv_orders")
  }
}
