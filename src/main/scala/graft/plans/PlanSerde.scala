package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.expr
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Logical-plan serialization: the Spark-side analog of the reference's
  * plan-exchange modules — `datafusion-proto` (logical/physical plan
  * round-trip, `proto/src/logical_plan/mod.rs`) and `datafusion-substrait`
  * (producer/consumer pair, `substrait/src/logical_plan/`). Those exist so a
  * plan built in one process can be shipped to and executed by another;
  * this module does the same for the Spark engine.
  *
  * Design: a small relational IR (scan / project / filter / aggregate /
  * join / sort / limit / distinct / union) with expressions carried as
  * Spark-SQL strings produced by Catalyst's own `Expression.sql`. The
  * producer walks the ANALYZED logical plan (so names are resolved and
  * star-expansion, implicit casts etc. are already applied); the consumer
  * rebuilds DataFrame operations against the target session's catalog —
  * it never replays SQL text of the whole query, each IR node becomes the
  * corresponding Dataset transformation, so the receiving side re-plans
  * and re-optimizes for ITS data layout (exactly the substrait contract).
  *
  * Like the reference's substrait consumer, coverage is the relational
  * core, and unsupported constructs fail loudly at serialize time rather
  * than producing a wrong plan.
  */
object PlanSerde {

  sealed trait GPlan
  /** Leaf: a named table/view in the receiving session's catalog. */
  case class GScan(table: String) extends GPlan
  case class GProject(exprs: Seq[String], child: GPlan) extends GPlan
  case class GFilter(condition: String, child: GPlan) extends GPlan
  /** `output` preserves the Aggregate's column order (group keys and
    * aggregates interleave freely in SQL select lists). */
  case class GAggregate(groupBy: Seq[String], aggs: Seq[String],
                        output: Seq[String], child: GPlan) extends GPlan
  case class GJoin(joinType: String, condition: Option[String],
                   left: GPlan, right: GPlan) extends GPlan
  /** keys are `<expr> ASC|DESC NULLS FIRST|LAST` as printed by
    * `SortOrder.sql`. */
  case class GSort(keys: Seq[String], child: GPlan) extends GPlan
  case class GLimit(n: Int, child: GPlan) extends GPlan
  case class GDistinct(child: GPlan) extends GPlan
  case class GUnion(byName: Boolean, children: Seq[GPlan]) extends GPlan
  case class GAlias(name: String, child: GPlan) extends GPlan

  // ---------------------------------------------------------------- produce

  /** Serialize a DataFrame's analyzed plan to the IR. Throws
    * IllegalArgumentException on nodes outside the supported core. */
  def toPlan(df: DataFrame): GPlan = fromCatalyst(df.queryExecution.analyzed)

  def toJson(df: DataFrame): String =
    JsonMethods.compact(JsonMethods.render(jvalue(toPlan(df))))

  def toJsonPretty(df: DataFrame): String =
    JsonMethods.pretty(JsonMethods.render(jvalue(toPlan(df))))

  private def fromCatalyst(plan: LogicalPlan): GPlan = plan match {
    // A SubqueryAlias over a leaf relation is a catalog scan (temp views
    // analyze to SubqueryAlias(name, viewPlan)); over anything else it is
    // just a name scope.
    case SubqueryAlias(ident, child) if isRelationLeaf(child) =>
      // keep the full identifier (db.table) — ident.name alone would make
      // the consumer resolve a same-named table in the default schema
      GScan((ident.qualifier :+ ident.name).mkString("."))
    case SubqueryAlias(ident, child) => GAlias(ident.name, fromCatalyst(child))
    case Project(projectList, child) =>
      GProject(projectList.map(exprSql), fromCatalyst(child))
    case Filter(condition, child) =>
      GFilter(exprSql(condition), fromCatalyst(child))
    case Aggregate(groupingExpressions, aggregateExpressions, child, _) =>
      val groups = groupingExpressions.map(exprSql)
      // aggregateExpressions is the full output list (group keys + computed
      // aggregates); keep only the computed side for `.agg(...)` and record
      // the full ordered output so the consumer can restore column order.
      val aggOnly = aggregateExpressions.filterNot {
        case a: Attribute => groupingExpressions.exists(_.semanticEquals(a))
        case _            => false
      }
      GAggregate(groups, aggOnly.map(exprSql),
        aggregateExpressions.map(outputName), fromCatalyst(child))
    case Join(left, right, joinType, condition, _) =>
      // Fail-loudly contract: a column name present on BOTH sides that the
      // serialized condition references UNQUALIFIED would re-resolve
      // arbitrarily on the consumer — reject at serialize time.
      val condSql = condition.map(exprSql)
      val dups = left.output.map(_.name).toSet
        .intersect(right.output.map(_.name).toSet)
      condSql.foreach { c =>
        dups.foreach { d =>
          val bare = ("(?<!`\\.)" + java.util.regex.Pattern.quote(quote(d)) +
            "(?!\\.`)").r
          val unqualified = bare.findAllMatchIn(c).exists(m =>
            m.start == 0 || c.charAt(m.start - 1) != '.')
          if (unqualified) throw new IllegalArgumentException(
            s"PlanSerde: join condition references '$d' unqualified but both " +
              "sides output that name — alias the inputs so the reference is unambiguous")
        }
      }
      GJoin(joinType.sql, condSql, fromCatalyst(left), fromCatalyst(right))
    case Sort(order, true, child, _) =>
      GSort(order.map(_.sql), fromCatalyst(child))
    case GlobalLimit(limitExpr, LocalLimit(_, child)) =>
      GLimit(limitExpr.eval().asInstanceOf[Number].intValue(), fromCatalyst(child))
    case Distinct(child) => GDistinct(fromCatalyst(child))
    // Dataset.distinct()/dropDuplicates() analyze to Deduplicate; the
    // all-columns form is DISTINCT.
    case Deduplicate(keys, child) if keys.size == child.output.size &&
        keys.forall(k => child.output.exists(_.semanticEquals(k))) =>
      GDistinct(fromCatalyst(child))
    case Union(children, byName, _) =>
      GUnion(byName, children.map(fromCatalyst))
    case other if isRelationLeaf(other) =>
      throw new IllegalArgumentException(
        s"PlanSerde: leaf relation has no catalog name — read it via a temp view: ${other.nodeName}")
    case other =>
      throw new IllegalArgumentException(
        s"PlanSerde: unsupported node ${other.nodeName} — supported core is " +
          "scan/project/filter/aggregate/join/sort/limit/distinct/union")
  }

  private def isRelationLeaf(plan: LogicalPlan): Boolean = plan match {
    case _: LeafNode            => true
    case View(_, _, child, _)   => isRelationLeaf(child)
    case SubqueryAlias(_, c)    => isRelationLeaf(c)
    case Project(_, c)          => false
    case _                      => false
  }

  private def exprSql(e: Expression): String = e match {
    // Alias.sql quotes the name; emit `expr AS name` with the child's sql so
    // the consumer can re-parse it (Spark's parser accepts backticks).
    case a: Alias => s"${a.child.sql} AS ${quote(a.name)}"
    case other    => other.sql
  }

  private def outputName(e: Expression): String = e match {
    case a: Alias     => a.name
    case a: Attribute => a.name
    case other        => other.sql
  }

  private def quote(name: String): String = "`" + name.replace("`", "``") + "`"

  // ---------------------------------------------------------------- consume

  /** Rebuild a DataFrame from the IR against `spark`'s catalog. */
  def fromPlan(spark: SparkSession, plan: GPlan): DataFrame = plan match {
    case GScan(table)          => spark.table(table)
    case GAlias(name, child)   => fromPlan(spark, child).alias(name)
    case GProject(exprs, child) => fromPlan(spark, child).selectExpr(exprs: _*)
    case GFilter(cond, child)  => fromPlan(spark, child).where(expr(cond))
    case GAggregate(groupBy, aggs, output, child) =>
      val df = fromPlan(spark, child)
      val grouped =
        if (aggs.isEmpty) df.groupBy(groupBy.map(expr): _*).agg(Map.empty[String, String])
        else df.groupBy(groupBy.map(expr): _*)
          .agg(expr(aggs.head), aggs.tail.map(expr): _*)
      // groupBy().agg puts grouping keys first; restore the recorded order.
      grouped.select(output.map(n => new Column(quote(n))): _*)
    case GJoin(joinType, cond, left, right) =>
      val l = fromPlan(spark, left)
      val r = fromPlan(spark, right)
      // JoinType.sql prints "LEFT OUTER"; Dataset.join wants "left_outer".
      val jt = joinType.trim.toLowerCase.replace(' ', '_')
      cond match {
        case Some(c) => l.join(r, expr(c), jt)
        case None    => l.crossJoin(r)
      }
    case GSort(keys, child)    => fromPlan(spark, child).orderBy(keys.map(sortCol): _*)
    case GLimit(n, child)      => fromPlan(spark, child).limit(n)
    case GDistinct(child)      => fromPlan(spark, child).distinct()
    case GUnion(byName, children) =>
      val dfs = children.map(fromPlan(spark, _))
      if (byName) dfs.reduce(_.unionByName(_)) else dfs.reduce(_.union(_))
  }

  def fromJson(spark: SparkSession, json: String): DataFrame =
    fromPlan(spark, plan(JsonMethods.parse(json)))

  /** Parse `SortOrder.sql` output: `<expr> ASC|DESC NULLS FIRST|LAST`. */
  private def sortCol(key: String): Column = {
    val upper = key.toUpperCase
    def strip(suffix: String): String = key.substring(0, key.length - suffix.length).trim
    if (upper.endsWith(" ASC NULLS FIRST")) expr(strip(" ASC NULLS FIRST")).asc_nulls_first
    else if (upper.endsWith(" ASC NULLS LAST")) expr(strip(" ASC NULLS LAST")).asc_nulls_last
    else if (upper.endsWith(" DESC NULLS FIRST")) expr(strip(" DESC NULLS FIRST")).desc_nulls_first
    else if (upper.endsWith(" DESC NULLS LAST")) expr(strip(" DESC NULLS LAST")).desc_nulls_last
    else if (upper.endsWith(" ASC")) expr(strip(" ASC")).asc
    else if (upper.endsWith(" DESC")) expr(strip(" DESC")).desc
    else expr(key)
  }

  // ------------------------------------------------------------------ json

  private def jvalue(p: GPlan): JValue = p match {
    case GScan(t) => JObject("op" -> JString("scan"), "table" -> JString(t))
    case GAlias(n, c) =>
      JObject("op" -> JString("alias"), "name" -> JString(n), "child" -> jvalue(c))
    case GProject(es, c) =>
      JObject("op" -> JString("project"), "exprs" -> JArray(es.map(JString(_)).toList),
        "child" -> jvalue(c))
    case GFilter(cond, c) =>
      JObject("op" -> JString("filter"), "condition" -> JString(cond), "child" -> jvalue(c))
    case GAggregate(g, a, o, c) =>
      JObject("op" -> JString("aggregate"),
        "groupBy" -> JArray(g.map(JString(_)).toList),
        "aggs" -> JArray(a.map(JString(_)).toList),
        "output" -> JArray(o.map(JString(_)).toList),
        "child" -> jvalue(c))
    case GJoin(jt, cond, l, r) =>
      JObject("op" -> JString("join"), "joinType" -> JString(jt),
        "condition" -> cond.map(JString(_)).getOrElse(JNull),
        "left" -> jvalue(l), "right" -> jvalue(r))
    case GSort(keys, c) =>
      JObject("op" -> JString("sort"), "keys" -> JArray(keys.map(JString(_)).toList),
        "child" -> jvalue(c))
    case GLimit(n, c) =>
      JObject("op" -> JString("limit"), "n" -> JInt(n), "child" -> jvalue(c))
    case GDistinct(c) => JObject("op" -> JString("distinct"), "child" -> jvalue(c))
    case GUnion(byName, cs) =>
      JObject("op" -> JString("union"), "byName" -> JBool(byName),
        "children" -> JArray(cs.map(jvalue).toList))
  }

  private def plan(j: JValue): GPlan = {
    def str(field: String): String = (j \ field) match {
      case JString(s) => s
      case other => throw new IllegalArgumentException(s"PlanSerde: bad $field: $other")
    }
    def strs(field: String): Seq[String] = (j \ field) match {
      case JArray(xs) => xs.map { case JString(s) => s; case o =>
        throw new IllegalArgumentException(s"PlanSerde: bad $field element: $o") }
      case other => throw new IllegalArgumentException(s"PlanSerde: bad $field: $other")
    }
    def child: GPlan = plan(j \ "child")
    str("op") match {
      case "scan"    => GScan(str("table"))
      case "alias"   => GAlias(str("name"), child)
      case "project" => GProject(strs("exprs"), child)
      case "filter"  => GFilter(str("condition"), child)
      case "aggregate" => GAggregate(strs("groupBy"), strs("aggs"), strs("output"), child)
      case "join" =>
        val cond = (j \ "condition") match {
          case JString(s) => Some(s)
          case _          => None
        }
        GJoin(str("joinType"), cond, plan(j \ "left"), plan(j \ "right"))
      case "sort"     => GSort(strs("keys"), child)
      case "limit"    => GLimit((j \ "n") match {
        case JInt(n) => n.toInt
        case o => throw new IllegalArgumentException(s"PlanSerde: bad n: $o")
      }, child)
      case "distinct" => GDistinct(child)
      case "union"    => (j \ "children") match {
        case JArray(cs) => GUnion((j \ "byName") == JBool(true), cs.map(plan))
        case o => throw new IllegalArgumentException(s"PlanSerde: bad children: $o")
      }
      case other => throw new IllegalArgumentException(s"PlanSerde: unknown op $other")
    }
  }
}
