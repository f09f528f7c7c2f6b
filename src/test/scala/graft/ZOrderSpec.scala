package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ZOrder

/** Z-order clustering: the interleave is bit-exact, and the layout makes
  * row-group min/max stats selective on BOTH clustered dimensions — where
  * a linear sort only ever narrows its leading column. The measured
  * skippable fraction IS the 100 TB payoff (scan cost scales with the row
  * groups a predicate cannot skip).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_scratch/$name"

  test("interleave is bit-exact on known values") {
    val df = spark.range(1).select(
      ZOrder.interleave(Seq(lit(3L), lit(1L)), 2).as("z2"),
      // x=0b101 (bits at out 0,4), y=0b011 (bits at out 1,3) -> 0b11011 = 27
      ZOrder.interleave(Seq(lit(5L), lit(3L)), 3).as("z3"))
    val row = df.collect()(0)
    // x=3: bits 0,1 -> out 0,2 ; y=1: bit 0 -> out 1 => 0b111 = 7
    assert(row.getLong(0) == 7L)
    assert(row.getLong(1) == 27L)
  }

  test("interleave matches a reference implementation on random inputs") {
    val r = new scala.util.Random(7)
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((x >> i) & 1L) << (2 * i)      // x bits at even positions
        z |= ((y >> i) & 1L) << (2 * i + 1)  // y bits at odd positions
      }
      z
    }
    val cases = Seq.fill(64)((r.nextInt(65536).toLong, r.nextInt(65536).toLong))
    val s = spark
    import s.implicits._
    val got = cases.toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), 16).as("z"))
      .collect().map(_.getLong(0))
    assert(got.sameElements(cases.map { case (x, y) => ref(x, y) }))
  }

  test("z-values of nearby points share prefixes (locality)") {
    // points in the same quadrant must sort together: all of quadrant
    // (x<2^15, y<2^15) precedes any point with both coords >= 2^15
    val df = spark.range(1).select(
      ZOrder.interleave(Seq(lit(100L), lit(200L)), 16).as("lo"),
      ZOrder.interleave(Seq(lit(40000L), lit(50000L)), 16).as("hi"))
    val r = df.collect()(0)
    assert(r.getLong(0) < r.getLong(1))
  }

  test("clustered layout prunes row groups on both dimensions") {
    val s = spark
    // two independent uniform dimensions, decorrelated by hashing
    val data = s.range(300000).select(
      pmod(xxhash64(col("id")), lit(1000)).as("x"),
      pmod(xxhash64(col("id"), lit(7)), lit(1000)).as("y"),
      col("id").as("payload"))
    val zPath = tmp("zorder_xy")
    val linPath = tmp("linear_x")
    // ~64 KB row groups -> dozens of groups across 4 files
    ZOrder.writeClustered(data, zPath, Seq("x", "y"), numFiles = 4,
      rowGroupBytes = 64 * 1024)
    data.repartitionByRange(4, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite")
      .option("parquet.block.size", (64 * 1024).toString).parquet(linPath)

    // content preserved through the rewrite
    val (n0, s0) = (data.count(),
      data.agg(sum("payload")).collect()(0).getLong(0))
    val back = s.read.parquet(zPath)
    assert(back.count() == n0)
    assert(back.agg(sum("payload")).collect()(0).getLong(0) == s0)

    // a 5%-band predicate on EACH dimension
    val zx = ZOrder.skippableFraction(s, zPath, "x", 500, 550)
    val zy = ZOrder.skippableFraction(s, zPath, "y", 500, 550)
    val lx = ZOrder.skippableFraction(s, linPath, "x", 500, 550)
    val ly = ZOrder.skippableFraction(s, linPath, "y", 500, 550)
    info(f"z-order skip: x=$zx%.2f y=$zy%.2f ; linear skip: x=$lx%.2f y=$ly%.2f")
    // linear layout: excellent on the sort column, blind on the other
    assert(lx > 0.8, f"linear leading-column skip only $lx%.2f")
    assert(ly < 0.2, f"linear non-sort column unexpectedly skips $ly%.2f")
    // z-order: substantial skipping on BOTH dimensions
    assert(zx > 0.4, f"z-order x skip only $zx%.2f")
    assert(zy > 0.4, f"z-order y skip only $zy%.2f")
    // and its worst dimension beats the linear layout's worst dimension
    assert(math.min(zx, zy) > math.min(lx, ly) + 0.3)
  }
}
