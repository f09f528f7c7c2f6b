package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Q._

/** Round-6 additions: the TIME-of-day / timestamp-precision convention
  * layer (SURVEY §1.2) as first-class oracle-checked surface.
  *
  * Reference: functions/src/datetime/{to_timestamp.rs, to_local_time.rs,
  * make_time.rs, to_unixtime.rs}; common/src/scalar/mod.rs:358-475
  * (Time64/Timestamp units). The engine convention: TIME-of-day is a
  * µs-of-day LongType; sub-µs inputs truncate to µs (Spark's timestamp
  * precision). All functions are pure catalyst trees registered via the
  * session extension (graft.functions.TimeFunctions), callable from SQL.
  */
object Round6Queries {

  val queries: Map[String, QueryFn] = Map(
    // TIME-of-day + timestamp-precision family. Sub-day values render as
    // strings on both sides (Q.scala parity rules); the ns entry proves
    // the declared truncate-to-µs convention against DuckDB's integer
    // division to µs.
    "fn_time" -> { (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderkey") <= 500)
        .select(
          col("o_orderkey"),
          expr("time_format(make_time(CAST(o_orderkey % 24 AS INT), " +
            "CAST(o_orderkey % 60 AS INT), CAST(o_orderkey % 60 AS DOUBLE) + 0.5))")
            .as("tstr"),
          expr("time_part('hour', make_time(CAST(o_orderkey % 24 AS INT), " +
            "CAST(o_orderkey % 60 AS INT), 0.0))").cast("long").as("hh"),
          expr("time_part('minute', make_time(CAST(o_orderkey % 24 AS INT), " +
            "CAST(o_orderkey % 60 AS INT), 0.0))").cast("long").as("mm"),
          floor(expr("time_part('second', make_time(0, 0, " +
            "CAST(o_orderkey % 60 AS DOUBLE) + 0.5))")).cast("long").as("ss"),
          date_format(expr("to_timestamp_micros(o_orderkey * 86400000000 + 123456)"),
            "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_us"),
          date_format(expr("to_timestamp_nanos(o_orderkey * 1000000000000 + 123456789)"),
            "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_ns_trunc"),
          expr("to_unixtime(o_orderdate)").cast("long").as("epoch_s"),
          date_format(expr("to_local_time(o_orderdate)"),
            "yyyy-MM-dd HH:mm:ss").as("local_ts"),
          expr("time_format(to_time(to_timestamp_micros(o_orderkey * 86400000000 + 45296500000)))")
            .as("tod"))
    })

  val oracleSql: Map[String, String] = Map(
    "fn_time" ->
      """SELECT o_orderkey,
        | CAST(make_time(CAST(o_orderkey % 24 AS BIGINT), CAST(o_orderkey % 60 AS BIGINT),
        |   CAST(o_orderkey % 60 AS DOUBLE) + 0.5) AS VARCHAR) AS tstr,
        | CAST(extract(hour FROM make_time(CAST(o_orderkey % 24 AS BIGINT),
        |   CAST(o_orderkey % 60 AS BIGINT), 0.0)) AS BIGINT) AS hh,
        | CAST(extract(minute FROM make_time(CAST(o_orderkey % 24 AS BIGINT),
        |   CAST(o_orderkey % 60 AS BIGINT), 0.0)) AS BIGINT) AS mm,
        | CAST(extract(second FROM make_time(0, 0,
        |   CAST(o_orderkey % 60 AS DOUBLE) + 0.5)) AS BIGINT) AS ss,
        | strftime(make_timestamp(o_orderkey * 86400000000 + 123456),
        |   '%Y-%m-%d %H:%M:%S.%f') AS ts_us,
        | strftime(make_timestamp((o_orderkey * 1000000000000 + 123456789) // 1000),
        |   '%Y-%m-%d %H:%M:%S.%f') AS ts_ns_trunc,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS local_ts,
        | CAST(CAST(make_timestamp(o_orderkey * 86400000000 + 45296500000) AS TIME)
        |   AS VARCHAR) AS tod
        |FROM orders WHERE o_orderkey <= 500""".stripMargin)
}
