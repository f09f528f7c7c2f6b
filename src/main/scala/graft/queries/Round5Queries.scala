package graft.queries

import Q._
import graft.plans.SqlUnparser

/** Round-5 additions exercised through the driver's oracle gate. */
object Round5Queries {

  /** The unparser surface (reference: datafusion/sql/src/unparser/ —
    * plan_to_sql) proven end-to-end under the DuckDB differential: build
    * q10's DataFrame plan, unparse the ANALYZED plan back to SQL text,
    * re-execute that text, and hand THAT result to the driver. Any
    * unparser bug (mis-scoped column, lost DISTINCT, reordered LIMIT)
    * surfaces as a hash mismatch against q10's own oracle. */
  val queries: Map[String, QueryFn] = Map(
    "unparse_roundtrip" -> ((s, dir) => {
      val df = TpchQueries.queries("q10_returns")(s, dir)
      df.sparkSession.sql(SqlUnparser.unparse(df))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "unparse_roundtrip" -> TpchQueries.oracleSql("q10_returns")
  )
}
