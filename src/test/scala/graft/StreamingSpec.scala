package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streaming

/** Streaming results must agree with their batch equivalents over the same
  * bounded input — the micro-batch engine is just another executor of the
  * same relational semantics. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("tumbling window agg equals batch groupBy") {
    val streamed = Streaming.runTumblingAgg(spark, sfDir, "t_agg_spec")
      .select("bucket", "event_type", "n")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream range join equals batch join") {
    val streamed = Streaming.runStreamStreamJoin(spark, sfDir, "t_join_spec")
    val events = Tables.load(spark, sfDir, "events")
    val v = events.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val p = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val batchCount = v.join(p,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES")).count()
    assert(streamed.count() == batchCount)
    assert(batchCount > 0)
  }

  test("flatMapGroupsWithState stats equal batch aggregation") {
    val streamed = Streaming.runStatefulUserStats(spark, sfDir, "t_state_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
