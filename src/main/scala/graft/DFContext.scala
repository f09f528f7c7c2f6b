package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Engine facade — the Spark-native equivalent of the reference's
  * `SessionContext` (datafusion/core/src/execution/context/mod.rs:611):
  * table registration, SQL entry point, prepared-statement parameters, an
  * information_schema surface and EXPLAIN.
  *
  * SQL goes through a light pre-rewriter (`DFContext.rewrite`) that adds the
  * two reference SQL forms Spark's parser lacks — `QUALIFY`
  * (sqllogictest/test_files/qualify.slt) and `DISTINCT ON`
  * (DataFrame distinct_on, dataframe/mod.rs:963) — by textual rewrite into
  * window-function subqueries, exactly the rewrite the reference's planner
  * performs. Everything else is passed to Catalyst untouched.
  */
class DFContext(val spark: SparkSession) {

  // engine function-gap layer available from SQL immediately
  graft.functions.VectorFunctions.register(spark)

  /** Register a file-backed table; format inferred from the extension
    * (parquet/csv/json), mirroring CREATE EXTERNAL TABLE
    * (reference: sql/src/parser.rs:245). */
  def register(name: String, path: String): Unit = {
    val df =
      if (path.endsWith(".csv")) spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      else if (path.endsWith(".json")) spark.read.json(path)
      else spark.read.parquet(path)
    df.createOrReplaceTempView(name)
  }

  def registerTable(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** Register every fixture table from a scale-factor directory. */
  def registerAll(dir: String): Unit = Tables.registerAll(spark, dir)

  def table(name: String): DataFrame = spark.table(name)

  def sql(query: String): DataFrame =
    if (DFContext.usesExclude(query)) {
      // Analysis happens eagerly inside spark.sql, so scoping the parser
      // flag around the call is race-free for this session.
      val key = "spark.sql.parser.quotedRegexColumnNames"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try spark.sql(DFContext.rewrite(query))
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    } else spark.sql(DFContext.rewrite(query))

  /** Prepared-statement surface (reference: Expr::Placeholder,
    * dataframe with_param_values — dataframe/mod.rs:2384): named `:name`
    * placeholders bound via Spark's parameterized SQL (literal-safe). */
  def sqlWithParams(query: String, params: Map[String, Any]): DataFrame =
    spark.sql(DFContext.rewrite(query), params.view.mapValues(lit).toMap)

  /** information_schema.tables equivalent
    * (reference: catalog/src/information_schema.rs:77). Pass a database
    * name to list that schema's persistent tables/views. */
  def informationSchemaTables(db: String = null): DataFrame = {
    import spark.implicits._
    val listed = if (db == null) spark.catalog.listTables()
    else spark.catalog.listTables(db)
    listed.select($"name".as("table_name"), $"tableType".as("table_type"),
      $"isTemporary".as("is_temporary"))
  }

  /** information_schema.schemata equivalent — the catalog→schema level of
    * the reference's catalog hierarchy (catalog/src/catalog.rs,
    * catalog/src/memory/). */
  def informationSchemaSchemata(): DataFrame = {
    import spark.implicits._
    spark.catalog.listDatabases().select($"name".as("schema_name"))
  }

  /** information_schema.columns for one table. */
  def informationSchemaColumns(tableName: String): DataFrame = {
    import spark.implicits._
    spark.catalog.listColumns(tableName)
      .select($"name".as("column_name"), $"dataType".as("data_type"),
        $"nullable".as("is_nullable"))
  }

  /** EXPLAIN surface (reference: ExplainExec — physical-plan/src/explain.rs:39). */
  def explain(query: String, mode: String = "formatted"): String =
    sql(query).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(mode))

  /** EXPLAIN ANALYZE: execute the query and render the FINAL physical plan
    * (post-AQE) with each operator's runtime SQL metrics — rows produced,
    * spill/shuffle bytes, timings — the reference's AnalyzeExec surface
    * (physical-plan/src/analyze.rs:46). Execution runs distributed
    * (`toRdd.foreach`); only metric values come back to the driver. */
  def explainAnalyze(query: String): String = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = sql(query)
    val qe = df.queryExecution
    qe.toRdd.foreach(_ => ())
    val sb = new StringBuilder
    def walk(p: SparkPlan, depth: Int): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth)
      case q: QueryStageExec =>
        walk(q.plan, depth)
      case _ =>
        val ms = p.metrics.toSeq.sortBy(_._1)
          .map { case (k, m) => s"$k=${m.value}" }.mkString(", ")
        sb.append("  " * depth).append(p.nodeName)
        if (ms.nonEmpty) sb.append(s" [$ms]")
        sb.append('\n')
        p.children.foreach(walk(_, depth + 1))
    }
    walk(qe.executedPlan, 0)
    sb.toString
  }
}

object DFContext {

  def apply(spark: SparkSession): DFContext = new DFContext(spark)

  private val QualifyRe =
    """(?is)^(.*?)\s+QUALIFY\s+(.+?)\s*$""".r
  private val DistinctOnHeadRe =
    """(?is)^\s*SELECT\s+DISTINCT\s+ON\s*\(""".r
  private val FromSplitRe =
    """(?is)^\s*(.*?)\s+FROM\s+(.*)$""".r

  /** True iff `kw` occurs at position `i` of (uppercased) `u` as a whole
    * word. */
  private def wordAt(u: String, i: Int, kw: String): Boolean =
    u.startsWith(kw, i) &&
      (i == 0 || { val c = u(i - 1); !c.isLetterOrDigit && c != '_' }) &&
      (i + kw.length >= u.length || { val c = u(i + kw.length); !c.isLetterOrDigit && c != '_' })

  /** Split a trailing top-level `ORDER BY … [LIMIT n] [OFFSET n]` off a
    * clause. Paren depth is tracked so an `ORDER BY` inside a window spec
    * (`row_number() OVER (ORDER BY x)`) is never mistaken for the tail —
    * the exact case a naive regex gets wrong in `QUALIFY p ORDER BY x`.
    * Single-quoted string literals ('' escapes) are skipped entirely, so
    * neither keywords nor parens inside them shift the cut point. */
  private def splitTopLevelTail(s: String): (String, String) = {
    val u = s.toUpperCase
    var depth = 0
    var i = 0
    var cut = -1
    while (i < s.length && cut < 0) {
      s(i) match {
        case '\'' =>
          i += 1
          while (i < s.length && !(s(i) == '\'' && (i + 1 >= s.length || s(i + 1) != '\''))) {
            if (s(i) == '\'' && i + 1 < s.length && s(i + 1) == '\'') i += 1
            i += 1
          }
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 =>
          val isOrderBy = wordAt(u, i, "ORDER") &&
            u.drop(i + 5).dropWhile(_.isWhitespace).startsWith("BY")
          if (isOrderBy || wordAt(u, i, "LIMIT") || wordAt(u, i, "OFFSET")) cut = i
        case _ =>
      }
      i += 1
    }
    if (cut < 0) (s.trim, "") else (s.substring(0, cut).trim, s.substring(cut).trim)
  }

  /** Parse `SELECT DISTINCT ON ( <keys> ) <rest>` with balanced parens in
    * the key list (e.g. `DISTINCT ON (abs(x), y)`); quoted literals in the
    * key list are skipped like in splitTopLevelTail. */
  private def parseDistinctOn(q: String): Option[(String, String)] =
    DistinctOnHeadRe.findFirstMatchIn(q).flatMap { m =>
      var depth = 1
      var i = m.end
      while (i < q.length && depth > 0) {
        q(i) match {
          case '\'' =>
            i += 1
            while (i < q.length && !(q(i) == '\'' && (i + 1 >= q.length || q(i + 1) != '\''))) {
              if (q(i) == '\'' && i + 1 < q.length && q(i + 1) == '\'') i += 1
              i += 1
            }
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      if (depth != 0) None
      else Some((q.substring(m.end, i - 1).trim, q.substring(i)))
    }

  /** Split `s` on every top-level occurrence of the token `sep` (outside
    * parens and single-quoted literals). */
  private def splitTopLevel(s: String, sep: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0
    var i = 0
    var start = 0
    while (i < s.length) {
      s(i) match {
        case '\'' =>
          i += 1
          while (i < s.length && !(s(i) == '\'' && (i + 1 >= s.length || s(i + 1) != '\''))) {
            if (s(i) == '\'' && i + 1 < s.length && s(i + 1) == '\'') i += 1
            i += 1
          }
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 && s.startsWith(sep, i) =>
          out += s.substring(start, i)
          start = i + sep.length
          i += sep.length - 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** Index of the first top-level `GROUP BY` in `s`, or -1. */
  private def findTopLevelGroupBy(s: String): Int = {
    val u = s.toUpperCase
    var depth = 0
    var i = 0
    while (i < s.length) {
      s(i) match {
        case '\'' =>
          i += 1
          while (i < s.length && !(s(i) == '\'' && (i + 1 >= s.length || s(i + 1) != '\''))) {
            if (s(i) == '\'' && i + 1 < s.length && s(i + 1) == '\'') i += 1
            i += 1
          }
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 && wordAt(u, i, "GROUP") &&
          u.drop(i + 5).dropWhile(_.isWhitespace).startsWith("BY") => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Pipe-operator SQL (reference: sqllogictest/test_files/pipe_operator.slt,
    * the ZetaSQL-style `|>` dialect DataFusion adopted). A pipeline
    * `base |> op1 |> op2 …` is folded left into nested standard SQL:
    *
    *   - `WHERE p`            → `SELECT * FROM (cur) __p WHERE p`
    *   - `ORDER BY o`         → `SELECT * FROM (cur) __p ORDER BY o`
    *   - `LIMIT n` (after ORDER BY: appended so the sort survives)
    *   - `SELECT list`        → `SELECT list FROM (cur) __p`
    *   - `EXTEND e AS a`      → `SELECT *, e AS a FROM (cur) __p`
    *   - `AS name`            → names the current relation for later ops
    *   - `AGGREGATE aggs [GROUP BY keys]` → keyed/global aggregation
    *   - `<kind> JOIN rel ON cond` → kept as a FROM fragment so the next
    *     `SELECT` can still use both sides' qualifiers
    *   - `UNION/INTERSECT/EXCEPT …` → `(cur) <setop> …`
    */
  private[graft] def rewritePipes(query: String): String = {
    val parts = splitTopLevel(query, "|>")
    if (parts.length < 2) return query
    var cur = parts.head.trim
    var alias: Option[String] = None
    var pendingFrom: Option[String] = None
    var lastWasOrder = false
    for (seg0 <- parts.tail) {
      val seg = seg0.trim
      val u = seg.toUpperCase
      // the current pipeline value as a FROM-able relation
      val rel = pendingFrom.getOrElse(s"($cur) ${alias.getOrElse("__p")}")
      def consume(): Unit = { pendingFrom = None; alias = None; lastWasOrder = false }
      if (u.startsWith("WHERE")) {
        cur = s"SELECT * FROM $rel WHERE ${seg.drop(5).trim}"; consume()
      } else if (u.startsWith("ORDER")) {
        val by = seg.drop(5).trim.drop(2).trim // past ORDER, past BY
        cur = s"SELECT * FROM $rel ORDER BY $by"; consume(); lastWasOrder = true
      } else if (u.startsWith("LIMIT") || u.startsWith("OFFSET")) {
        if (lastWasOrder) { cur = s"$cur $seg"; lastWasOrder = true }
        else { cur = s"SELECT * FROM $rel $seg"; consume() }
        pendingFrom = None; alias = None
      } else if (u.startsWith("SELECT")) {
        cur = s"SELECT ${seg.drop(6).trim} FROM $rel"; consume()
      } else if (u.startsWith("EXTEND")) {
        cur = s"SELECT *, ${seg.drop(6).trim} FROM $rel"; consume()
      } else if (u.startsWith("AS")) {
        alias = Some(seg.drop(2).trim)
      } else if (u.startsWith("AGGREGATE")) {
        val body = seg.drop(9).trim
        val g = findTopLevelGroupBy(body)
        cur =
          if (g < 0) s"SELECT $body FROM $rel"
          else {
            val aggs = body.substring(0, g).trim
            val keys = body.substring(g).trim.drop(5).trim.drop(2).trim
            s"SELECT $keys, $aggs FROM $rel GROUP BY $keys"
          }
        consume()
      } else if (u.startsWith("UNION") || u.startsWith("INTERSECT") || u.startsWith("EXCEPT")) {
        cur = s"($cur) $seg"; consume()
      } else if (u.startsWith("JOIN") || u.startsWith("LEFT") || u.startsWith("RIGHT") ||
        u.startsWith("FULL") || u.startsWith("INNER") || u.startsWith("CROSS")) {
        pendingFrom = Some(s"$rel $seg")
        cur = s"SELECT * FROM $rel $seg"
        lastWasOrder = false
      } else {
        // unknown operator: pass through untouched and let the parser report
        cur = s"$cur |> $seg"
      }
    }
    cur
  }

  /** Light SQL pre-rewrite for QUALIFY and DISTINCT ON.
    *
    * - `... QUALIFY <pred> [ORDER BY …] [LIMIT …]` → the predicate is
    *   projected as a boolean column over the base subquery (window
    *   functions are legal there, unlike WHERE) and filtered on; trailing
    *   clauses stay OUTSIDE the predicate — QUALIFY precedes ORDER BY/LIMIT
    *   in the reference dialect (qualify.slt). Limitation of the textual
    *   rewrite: the predicate sees the base's select-list columns, not
    *   unselected table columns.
    * - `SELECT DISTINCT ON (k…) cols FROM rel [ORDER BY o…] [LIMIT …]` →
    *   row_number() OVER (PARTITION BY k ORDER BY o…) = 1, preserving the
    *   reference's first-row-per-key semantics (deterministic only with an
    *   ORDER BY, as in the reference); key expressions may contain parens.
    */
  def rewrite(query: String): String = rewriteStd(rewriteExclude(rewritePipes(query)))

  /** Wildcard modifiers (reference: `wildcard.slt`, sqlparser's
    * `SELECT * EXCLUDE/EXCEPT (cols)`): rewritten onto Spark's
    * regex-quoted-column feature — `* EXCLUDE (a, b)` becomes the quoted
    * regex `` `^(?!(?:a|b)$).+` ``, which the parser expands to every
    * column NOT in the list. Works at any query depth (subqueries too);
    * requires `spark.sql.parser.quotedRegexColumnNames=true`, which
    * [[DFContext.sql]] enables for the duration of the statement iff this
    * rewrite fired. */
  private val ExcludeRe =
    """(?is)\*\s+(?:EXCLUDE|EXCEPT)\s*\(([^()]*)\)""".r

  private[graft] def usesExclude(query: String): Boolean =
    ExcludeRe.findFirstIn(query).isDefined

  private[graft] def rewriteExclude(query: String): String =
    ExcludeRe.replaceAllIn(query, m => {
      val cols = m.group(1).split(",").iterator.map(_.trim.stripPrefix("`").stripSuffix("`"))
        .filter(_.nonEmpty).map(java.util.regex.Pattern.quote).toSeq
      scala.util.matching.Regex.quoteReplacement(
        "`^(?!(?:" + cols.mkString("|") + ")$).+`")
    })

  private def rewriteStd(query: String): String = parseDistinctOn(query) match {
    case Some((keys, rest)) =>
      rest match {
        case FromSplitRe(selectList, relAndTail) =>
          val (rel, tail) = splitTopLevelTail(relAndTail)
          val orderBy = {
            val t = tail.toUpperCase
            if (t.startsWith("ORDER")) {
              // window order = the ORDER BY clause, minus LIMIT/OFFSET
              val afterBy = tail.drop(5).dropWhile(_.isWhitespace).drop(2)
              val (o, _) = splitTopLevelTail(afterBy)
              o
            } else ""
          }
          val order = if (orderBy.nonEmpty) orderBy else keys
          val outerTail = if (tail.isEmpty) "" else s"\n$tail"
          s"""SELECT $selectList FROM (
             |  SELECT *, row_number() OVER (PARTITION BY $keys ORDER BY $order) AS __rn
             |  FROM $rel) __don
             |WHERE __rn = 1$outerTail""".stripMargin
        case _ => query
      }
    case None => query match {
      case QualifyRe(base, predAndTail) if !base.toUpperCase.contains("QUALIFY") =>
        val (pred, tail) = splitTopLevelTail(predAndTail)
        val outerTail = if (tail.isEmpty) "" else s"\n$tail"
        // the predicate is projected as a column, not put in WHERE: QUALIFY
        // allows window functions directly in the predicate, which Spark
        // rejects inside WHERE but accepts in a select list
        s"""SELECT * EXCEPT (__qual) FROM (
           |  SELECT *, ($pred) AS __qual FROM (
           |$base
           |) __qi) __q
           |WHERE __qual$outerTail""".stripMargin
      case _ => query
    }
  }
}
