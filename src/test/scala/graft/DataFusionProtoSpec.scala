package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.DataFusionProto
import graft.plans.DataFusionProto.{PBytes, PVarint}

class DataFusionProtoSpec extends AnyFunSuite {
  import TestSpark._

  test("varint wire roundtrip across the magnitude range") {
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, 1L << 21, 1L << 35, Long.MaxValue)) {
      val w = new DataFusionProto.W
      w.int64(1, v)
      val fs = DataFusionProto.fields(w.bytes)
      assert(fs == Seq(1 -> PVarint(v)), s"v=$v")
    }
  }

  test("golden bytes: Column expr node matches the hand-computed encoding") {
    // LogicalExprNode{ column=1 { name="x" } } (datafusion.proto:462,
    // datafusion_common.proto:27): tag(1,LEN)=0x0A len=3,
    // inner tag(1,LEN)=0x0A len=1 'x'
    val w = new DataFusionProto.W
    w.msg(1)(_.str(1, "x"))
    assert(w.bytes.toSeq == Seq(0x0A, 0x03, 0x0A, 0x01, 0x78).map(_.toByte))
  }

  test("nested message fields parse back with numbers and payloads intact") {
    val w = new DataFusionProto.W
    w.msg(4) { be =>
      be.msg(1)(_.msg(1)(_.str(1, "a")))
      be.msg(1)(_.msg(3)(_.int64(7, 42L)))
      be.str(3, "Plus")
    }
    val Seq((4, PBytes(be))) = DataFusionProto.fields(w.bytes): @unchecked
    val ops = DataFusionProto.fields(be).collect { case (1, PBytes(v)) => v }
    assert(ops.size == 2)
    val op = DataFusionProto.fields(be).collectFirst {
      case (3, PBytes(v)) => new String(v, "UTF-8") }
    assert(op.contains("Plus"))
  }

  test("emit → bytes → consume executes the same rows (binary wire roundtrip)") {
    import org.apache.spark.sql.functions._
    val src = Tables.load(spark, sfDir, "orders")
      .filter(col("o_totalprice") > lit(1000.0))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("o_totalprice")).as("total"),
        count(lit(1L)).as("n"))
      .orderBy(col("o_orderpriority"))
    val bytes = DataFusionProto.emit(src)
    assert(bytes.length > 50)
    val back = DataFusionProto.consume(spark, bytes,
      n => Some(Tables.load(spark, sfDir, n)))
    val a = src.collect().map(_.toSeq).toSeq
    val b = back.collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("literals of every supported type survive the wire") {
    import org.apache.spark.sql.functions._
    val src = Tables.load(spark, sfDir, "region")
      .select(col("r_regionkey"),
        lit(true).as("b"), lit("s").as("s"), lit(7).as("i"),
        lit(8L).as("l"), lit(1.5).as("d"),
        lit(java.sql.Date.valueOf("2020-01-02")).as("dt"))
    val back = DataFusionProto.consume(spark, DataFusionProto.emit(src),
      n => Some(Tables.load(spark, sfDir, n)))
    assert(src.collect().map(_.toSeq).toSeq == back.collect().map(_.toSeq).toSeq)
  }
}
