package graft.queries

import org.apache.spark.sql.functions._
import Q._

/** Elementwise array/vector arithmetic from the reference's nested-functions
  * crate (SURVEY §2.8: array_add/subtract/sum/avg/scale/normalize —
  * functions-nested arithmetic + distance.rs) expressed entirely with
  * Spark's higher-order builtins (`transform`, `zip_with`, `aggregate`) —
  * codegen'd lambdas, no UDFs, no custom expressions needed.
  */
object ArrayMathQueries {

  val queries: Map[String, QueryFn] = Map(
    "fn_array_math" -> { (s, dir) =>
      val e = col("embedding")
      val sumv = aggregate(e, lit(0.0), (a, x) => a + x)
      val l1 = aggregate(e, lit(0.0), (a, x) => a + abs(x))
      val norm2 = sqrt(aggregate(e, lit(0.0), (a, x) => a + x * x))
      t(s, dir, "embeddings")
        .filter(col("vec_id") < 100)
        .select(
          col("vec_id"),
          r6(sumv).as("vsum"),
          r6(sumv / size(e)).as("vavg"),
          r6(l1).as("l1_norm"),
          r6(norm2).as("l2_norm"),
          r6(element_at(transform(e, x => x * 2.5), 1)).as("scaled_head"),
          r6(element_at(zip_with(e, reverse(e), (x, y) => x.cast("double") + y.cast("double")), 1)).as("add_head"),
          r6(element_at(zip_with(e, reverse(e), (x, y) => x.cast("double") - y.cast("double")), 2)).as("sub_head2"),
          r6(element_at(e, 1) / norm2).as("normalized_head"))
    })

  val oracleSql: Map[String, String] = Map(
    "fn_array_math" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS de FROM embeddings
        |           WHERE vec_id < 100),
        |c AS (SELECT vec_id, de,
        |  list_sum(de) AS vsum,
        |  list_sum(list_transform(de, x -> abs(x))) AS l1,
        |  sqrt(list_sum(list_transform(de, x -> x * x))) AS norm2
        | FROM e)
        |SELECT vec_id,
        | floor((vsum + 1.37e-8) * 1000000 + 0.5) / 1000000 AS vsum,
        | floor((vsum / len(de) + 1.37e-8) * 1000000 + 0.5) / 1000000 AS vavg,
        | floor((l1 + 1.37e-8) * 1000000 + 0.5) / 1000000 AS l1_norm,
        | floor((norm2 + 1.37e-8) * 1000000 + 0.5) / 1000000 AS l2_norm,
        | floor((de[1] * 2.5 + 1.37e-8) * 1000000 + 0.5) / 1000000 AS scaled_head,
        | floor((de[1] + de[-1] + 1.37e-8) * 1000000 + 0.5) / 1000000 AS add_head,
        | floor((de[2] - de[-2] + 1.37e-8) * 1000000 + 0.5) / 1000000 AS sub_head2,
        | floor((de[1] / norm2 + 1.37e-8) * 1000000 + 0.5) / 1000000 AS normalized_head
        |FROM c""".stripMargin)
}
