package graft.slt
object TransProbe {
  def main(args: Array[String]): Unit = {
    val qs = Seq(
      "select [{r: 'a', c: 1}, {r: 'b', c: 2}];",
      "select [1,2,3]",
      "SELECT t1_id FROM t2 RIGHT SEMI JOIN t1 on (t2.t2_id = t1.t1_id and t2.t2_name <> t1.t1_name) ORDER BY t1_id",
      "SELECT * FROM (SELECT 1 AS a WHERE 1=0) AS a RIGHT SEMI JOIN (SELECT 1 AS a) AS b ON a.a=b.a",
      "SELECT * FROM annotated_data as l_table RIGHT ANTI JOIN (SELECT *, ROW_NUMBER() OVER() as rn1 FROM annotated_data) as r_table ON l_table.a = r_table.a ORDER BY r_table.rn1",
      "SELECT x FROM right_t t2 RIGHT SEMI JOIN left_t t1 on t2.id = t1.id")
    qs.foreach { q =>
      println(q + "\n  => " + SltRunner.translate(q))
    }
  }
}
// appended probes run via main args
