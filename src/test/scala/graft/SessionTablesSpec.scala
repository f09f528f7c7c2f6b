package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SessionTables

class SessionTablesSpec extends AnyFunSuite {
  import TestSpark._

  test("merge passes null-key target rows through unchanged") {
    val s = spark; import s.implicits._
    val target = Seq((Option(1L), "t1"), (None: Option[Long], "tnull"), (Option(3L), "t3"))
      .toDF("k", "v")
    val source = Seq((Option(1L), "s1"), (Option(9L), "s9")).toDF("k", "v")
    val out = SessionTables.merge(target, source, "k", Map("v" -> col("s_v")))
      .orderBy(col("k").asc_nulls_first)
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]), r.getString(1)))
    // matched row updated, null-key target row untouched, unmatched target
    // untouched, source-only row inserted
    assert(out.toSeq == Seq(
      (None, "tnull"), (Some(1L), "s1"), (Some(3L), "t3"), (Some(9L), "s9")))
  }

  test("merge with no matches is insert-all plus passthrough") {
    val s = spark; import s.implicits._
    val target = Seq((1L, "a")).toDF("k", "v")
    val source = Seq((2L, "b")).toDF("k", "v")
    val out = SessionTables.merge(target, source, "k", Map("v" -> col("s_v")))
    assert(out.count() == 2)
    assert(out.where(col("v").isNull).count() == 0)
  }
}
