package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The TIME-of-day / timestamp-precision convention layer (SURVEY §1.2:
  * TIME is a µs-of-day long; sub-µs truncates). Property-style checks run
  * the catalyst trees distributed over a generated frame — the same code
  * path the fn_time oracle entry exercises, here at randomized breadth. */
class TimeFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def frame(n: Int) = {
    graft.functions.TimeFunctions.register(spark)
    spark.range(n).selectExpr(
      "cast(id % 24 as int) as h",
      "cast((id * 7) % 60 as int) as m",
      "cast((id * 13) % 60 as double) + cast((id * 131071) % 1000000 as double) / 1e6 as s")
  }

  test("make_time / time_format / to_time round-trip on 10k random times") {
    val df = frame(10000).selectExpr(
      "make_time(h, m, s) as us",
      "to_time(time_format(make_time(h, m, s))) as us2")
    val bad = df.filter(col("us") =!= col("us2")).count()
    assert(bad == 0, s"$bad round-trip mismatches")
  }

  test("time_part components reassemble the µs value") {
    val df = frame(10000).selectExpr(
      "make_time(h, m, s) as us", "h", "m", "s").selectExpr(
      "us",
      """cast(time_part('hour', us) * 3600000000 +
             time_part('minute', us) * 60000000 +
             round(time_part('second', us) * 1e6) as bigint) as re""")
    val bad = df.filter(col("us") =!= col("re")).count()
    assert(bad == 0, s"$bad component mismatches")
  }

  test("to_timestamp_nanos truncates to the µs convention") {
    val df = spark.range(5000).selectExpr(
      "id * 1000000007 + 999 as ns").selectExpr(
      "unix_micros(to_timestamp_nanos(ns)) as got",
      "cast(ns / 1000 as bigint) - cast((ns % 1000 != 0 and ns < 0) as int) as want0",
      "ns div 1000 as want")
    val bad = df.filter(col("got") =!= col("want")).count()
    assert(bad == 0, s"$bad truncation mismatches")
  }

  test("to_time rejects out-of-range components; keeps labeled walls") {
    graft.functions.TimeFunctions.register(spark)
    val r = spark.sql(
      """SELECT to_time('24:01:02') a, to_time('12:99:00') b,
          to_time('2024-03-20T09:15:30-07:00') c,
          time_format(to_time('2024-03-20T09:15:30-07:00')) cs""").head
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getString(3) == "09:15:30") // the LABELED wall, never converted
  }

  test("to_local_time strips the zone label, keeps the wall") {
    graft.functions.TimeFunctions.register(spark)
    val r = spark.sql(
      """SELECT cast(to_local_time('2024-04-01T00:00:20+05:00') as string) a,
                cast(to_local_time(timestamp'2024-04-01 07:08:09') as string) b""").head
    assert(r.getString(0) == "2024-04-01 00:00:20")
    assert(r.getString(1) == "2024-04-01 07:08:09")
  }
}
