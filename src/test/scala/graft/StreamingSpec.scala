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

  test("transformWithState profile survives state across micro-batches") {
    // split the events fixture into two files and feed them one per
    // trigger: the second batch's profiles must CONTINUE the first batch's
    // RocksDB state, so the final result still equals one batch GROUP BY
    import java.nio.file.{Files, Paths}
    val src = Tables.load(spark, sfDir, "events")
    val twoDir = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stream_src_two")
    org.apache.commons.io.FileUtils.deleteQuietly(twoDir.toFile)
    Files.createDirectories(twoDir)
    src.where(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("overwrite").parquet(twoDir.resolve("a").toString)
    src.where(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("overwrite").parquet(twoDir.resolve("b").toString)
    val stageDir = twoDir.resolve("staged")
    Files.createDirectories(stageDir)
    var i = 0
    for (sub <- Seq("a", "b"); f <- new java.io.File(twoDir.resolve(sub).toString)
        .listFiles() if f.getName.endsWith(".parquet")) {
      Files.copy(f.toPath, stageDir.resolve(s"part$i.parquet")); i += 1
    }
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val schema = src.schema
    val stream = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stageDir.toString)
    // reuse the profile processor via the public runner's building blocks:
    // count per user through two triggers, emitting updates per batch
    val out = stream.select(col("user_id")).as[Long]
      .groupByKey(identity)
      .transformWithState(new graft.streaming.CountProcessor,
        TimeMode.None(), OutputMode.Update())
    val q = out.toDF("user_id", "n").writeStream.outputMode("update")
      .format("memory").queryName("t_tws_two").start()
    q.processAllAvailable()
    q.stop()
    val finalCounts = ss.table("t_tws_two").groupBy("user_id")
      .agg(max("n").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = src.groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(finalCounts == batch)
    // at least one user must have been updated in BOTH batches (proof the
    // state crossed the trigger boundary)
    val emissions = ss.table("t_tws_two").groupBy("user_id").count()
      .collect().map(r => r.getLong(1))
    assert(emissions.exists(_ >= 2), "no user spanned two micro-batches")
  }
}
