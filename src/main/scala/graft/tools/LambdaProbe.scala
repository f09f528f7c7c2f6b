package graft
object LambdaProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW t AS SELECT * FROM VALUES (1),(3),(2),(NULL) AS v(a)")
    def go(q: String): Unit =
      try println(q.take(60) + " => " + spark.sql(q).collect().mkString("|"))
      catch { case e: Exception => println(q.take(60) + " => ERR " + e.getMessage.take(300)) }
    go("SELECT array_sort(collect_list(a), (l, r) -> CASE WHEN l < r THEN -1 WHEN l > r THEN 1 ELSE 0 END) FROM t")
    go("SELECT array_sort(collect_list(named_struct('__v', a)), (__l, __r) -> CASE WHEN __l.__v < __r.__v THEN -1 WHEN __l.__v > __r.__v THEN 1 ELSE 0 END) FROM t")
    go("SELECT transform(collect_list(a), x -> x + 1) FROM t")
    go("SELECT sort_array(collect_list(named_struct('__v', a))) FROM t")
    spark.stop()
  }
}
