package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream join state must be EVICTED by the watermark — the
  * property the reference's SymmetricHashJoinExec gets from interval-based
  * range pruning (joins/symmetric_hash_join.rs:100-160: buffered rows
  * outside the provable match range are dropped). On an unbounded 100 TB/
  * day stream, an engine that only ever ADDS join state dies of state
  * growth no matter how correct its results are; this pins the eviction
  * behavior observable through the state-store metrics.
  */
class StreamStateEvictionSpec extends AnyFunSuite {

  test("watermark evicts range-join state as event time advances") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val left = MemoryStream[(Long, Long)]
    val right = MemoryStream[(Long, Long)]
    val l = left.toDF().toDF("k", "t")
      .withColumn("lt", timestamp_seconds(col("t")))
      .withWatermark("lt", "10 seconds")
    val r = right.toDF().toDF("k2", "t2")
      .withColumn("rt", timestamp_seconds(col("t2")))
      .withWatermark("rt", "10 seconds")
    val joined = l.join(r, expr(
      "k = k2 AND rt BETWEEN lt - INTERVAL 5 SECONDS AND lt + INTERVAL 5 SECONDS"))

    val q = joined.writeStream.format("memory")
      .queryName("evict_spec").outputMode("append").start()
    try {
      // batch 1: both sides near t=10 -> 1 match, 2 state rows
      left.addData((1L, 10L)); right.addData((1L, 12L))
      q.processAllAvailable()
      // batches 2..3: event time leaps forward; the watermark follows and
      // the t=10 state becomes provably unmatchable -> evicted
      left.addData((2L, 1000L)); right.addData((2L, 1001L))
      q.processAllAvailable()
      left.addData((3L, 2000L)); right.addData((3L, 2002L))
      q.processAllAvailable()
      left.addData((4L, 3000L)); right.addData((4L, 3001L))
      q.processAllAvailable()

      val stateProgress = q.recentProgress.toSeq
        .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      val removed = stateProgress.map(_.numRowsRemoved).sum
      val finalTotal = stateProgress.last.numRowsTotal
      info(s"state rows removed=$removed, final total=$finalTotal")
      assert(removed > 0, "watermark never evicted any join state")
      assert(finalTotal < 8,
        s"state still holds $finalTotal rows — eviction not keeping up")
      // every in-range pair actually joined
      assert(spark.table("evict_spec").count() == 4)
    } finally q.stop()
  }
}
