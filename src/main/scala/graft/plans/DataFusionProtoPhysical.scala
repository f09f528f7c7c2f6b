package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And => CAnd, Attribute, AttributeReference, BinaryOperator, Cast => CCast, Expression => CExpr, In, IsNotNull, IsNull, Literal => CLiteral, NamedExpression, Not, SortOrder}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, GlobalLimitExec, LocalLimitExec, ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** datafusion-proto PHYSICAL plan exchange: the reference's
  * `PhysicalPlanNode` wire (datafusion.proto:862-902), emitted from a
  * Spark PHYSICAL plan (`queryExecution.sparkPlan` — post-strategy,
  * pre-exchange) and consumed by re-planning on the receiving session.
  *
  * Covered subset — mirroring what the logical wire started with:
  * ParquetScanExecNode(1) / ProjectionExecNode(4) / GlobalLimitExecNode(6)
  * / LocalLimitExecNode(7) / AggregateExecNode(8) / SortExecNode(10) /
  * FilterExecNode(12), with PhysicalExprNode variants column(1) literal(2)
  * binary(3) aggregate(4) is_null(5) is_not_null(6) not(7) cast(9)
  * sort(10) in_list(12) (datafusion.proto:998-1030).
  *
  * Columns ride the reference's (name, index) convention
  * (PhysicalColumn, datafusion.proto:1385) — the index is the position in
  * the child's output, which the consumer resolves positionally, so the
  * bytes are self-contained. Spark's partial/final aggregate PAIR is
  * emitted as the reference's PARTIAL and FINAL AggregateExecNodes
  * (AggregateMode, datafusion.proto:1420-1427); consume collapses the
  * pair back into one logical aggregation (the re-plan contract: the
  * receiving engine picks its own partials).
  */
object DataFusionProtoPhysical {
  import DataFusionProto.{W, PBytes, PVarint, fields}

  private def sub(b: Array[Byte], field: Int): Option[Array[Byte]] =
    fields(b).collectFirst { case (`field`, PBytes(v)) => v }
  private def subs(b: Array[Byte], field: Int): Seq[Array[Byte]] =
    fields(b).collect { case (`field`, PBytes(v)) => v }
  private def vint(b: Array[Byte], field: Int): Option[Long] =
    fields(b).collectFirst { case (`field`, PVarint(v)) => v }
  private def strOf(b: Array[Byte]): String = new String(b, "UTF-8")

  // ------------------------------------------------------------------ emit

  /** DataFrame → PhysicalPlanNode bytes (from the pre-exchange physical
    * plan, so the wire carries the operator tree, not Spark's shuffles). */
  def emit(df: DataFrame): Array[Byte] = {
    val w = new W
    emitPlan(df.queryExecution.sparkPlan, w)
    w.bytes
  }

  private def emitPlan(plan: SparkPlan, w: W): Unit = plan match {
    case scan: FileSourceScanExec =>
      w.msg(1) { p => // ParquetScanExecNode (datafusion.proto:1258)
        p.msg(1) { conf => // FileScanExecConf (:1235)
          scan.relation.location.inputFiles.foreach { f =>
            conf.msg(1)(fg => fg.msg(1)(_.str(1, f))) // FileGroup/PartitionedFile
          }
          conf.msg(2) { schema => // full relation schema
            scan.relation.schema.fields.foreach { f =>
              schema.msg(1) { fld =>
                fld.str(1, f.name)
                fld.msg(2)(arrowType(f.dataType, _))
                fld.bool(3, f.nullable)
              }
            }
          }
          // projection = indices of the scan output in the relation schema
          scan.output.foreach { a =>
            val idx = scan.relation.schema.fieldIndex(a.name)
            conf.int64(4, idx.toLong)
          }
          conf.str(8, "file://")
        }
      }
    case f: FilterExec =>
      w.msg(12) { fn => // FilterExecNode (:1204)
        fn.msg(1)(emitPlan(f.child, _))
        fn.msg(2)(emitExpr(f.condition, f.child.output, _))
      }
    case p: ProjectExec =>
      w.msg(4) { pn => // ProjectionExecNode (:1413)
        pn.msg(1)(emitPlan(p.child, _))
        p.projectList.foreach { e =>
          pn.msg(2)(emitExpr(stripAlias(e), p.child.output, _))
          pn.str(3, e.name)
        }
      }
    case agg: HashAggregateExec => emitAgg(agg.groupingExpressions,
      agg.aggregateExpressions, agg.resultExpressions, agg.child, w)
    case agg: ObjectHashAggregateExec => emitAgg(agg.groupingExpressions,
      agg.aggregateExpressions, agg.resultExpressions, agg.child, w)
    case agg: SortAggregateExec => emitAgg(agg.groupingExpressions,
      agg.aggregateExpressions, agg.resultExpressions, agg.child, w)
    case s: SortExec =>
      w.msg(10) { sn => // SortExecNode (:1490)
        sn.msg(1)(emitPlan(s.child, _))
        s.sortOrder.foreach(so => sn.msg(2)(emitSortAsExpr(so, s.child.output, _)))
        sn.int64(3, -1L)
      }
    case l: GlobalLimitExec =>
      w.msg(6) { ln => // GlobalLimitExecNode (:1477)
        ln.msg(1)(emitPlan(l.child, _))
        ln.int64(2, 0L)
        ln.int64(3, l.limit.toLong)
      }
    case l: LocalLimitExec =>
      w.msg(7) { ln => // LocalLimitExecNode (:1485)
        ln.msg(1)(emitPlan(l.child, _))
        ln.int64(2, l.limit.toLong)
      }
    case topk: org.apache.spark.sql.execution.TakeOrderedAndProjectExec =>
      // Spark's fused TopK = the reference's SortExec with a fetch
      // (SortExecNode.fetch, datafusion.proto:1493), plus a projection
      // when the select list narrows
      def sortNode(w2: W): Unit = w2.msg(10) { sn =>
        sn.msg(1)(emitPlan(topk.child, _))
        topk.sortOrder.foreach(so =>
          sn.msg(2)(emitSortAsExpr(so, topk.child.output, _)))
        sn.int64(3, topk.limit.toLong)
      }
      if (topk.projectList.map(_.exprId) == topk.child.output.map(_.exprId))
        sortNode(w)
      else w.msg(4) { pn =>
        pn.msg(1)(sortNode(_))
        topk.projectList.foreach { e =>
          pn.msg(2)(emitExpr(stripAlias(e), topk.child.output, _))
          pn.str(3, e.name)
        }
      }
    case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      // a cached relation is session-local state — serialize the plan that
      // was cached (the original scan chain), projecting down to the
      // scan's pruned output when the cache kept more columns
      val src = im.relation.cachedPlan
      if (im.output.map(_.exprId) == src.output.map(_.exprId)) emitPlan(src, w)
      else w.msg(4) { pn =>
        pn.msg(1)(emitPlan(src, _))
        im.output.foreach { a =>
          pn.msg(2)(emitExpr(a, src.output, _))
          pn.str(3, a.name)
        }
      }
    case other =>
      // transparent wrappers (InputAdapter etc.) expose a single child
      if (other.children.size == 1) emitPlan(other.children.head, w)
      else throw new IllegalArgumentException(
        s"dfproto physical emit: unsupported node ${other.nodeName}")
  }

  /** Output names for the non-key aggregates: the FINAL/SINGLE stage's
    * resultExpressions carry the user-facing aliases. */
  private def aggOutputNames(groups: Seq[NamedExpression],
      aggs: Seq[AggregateExpression],
      results: Seq[NamedExpression]): Seq[String] = {
    val keyIds = groups.map(_.exprId).toSet
    val nonKey = results.filterNot(r => keyIds.contains(r.exprId))
    if (nonKey.size == aggs.size) nonKey.map(_.name)
    else aggs.map(_.aggregateFunction.toString)
  }

  private def emitAgg(groups: Seq[NamedExpression],
      aggs: Seq[AggregateExpression], results: Seq[NamedExpression],
      child: SparkPlan, w: W): Unit = {
    // Spark's partial/final pair: the FINAL's child is the PARTIAL
    // aggregate — the wire mirrors the two AggregateExecNodes with their
    // modes (PARTIAL=0/FINAL=1); a single-stage agg is SINGLE=3
    val mode = aggs.headOption.map(_.mode) match {
      case Some(org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => 0L
      case Some(org.apache.spark.sql.catalyst.expressions.aggregate.Final) => 1L
      case _ => 3L
    }
    w.msg(8) { an => // AggregateExecNode (:1459)
      groups.foreach(g => an.msg(1)(emitExpr(stripAlias(g), child.output, _)))
      aggs.foreach { ae =>
        // the FINAL stage's inputs are partial buffers — serialize the
        // ORIGINAL aggregate over the partial's own input columns instead
        val anchor = child match {
          case inner: HashAggregateExec if mode == 1L => inner.child.output
          case inner: ObjectHashAggregateExec if mode == 1L => inner.child.output
          case inner: SortAggregateExec if mode == 1L => inner.child.output
          case _ => child.output
        }
        an.msg(2)(emitAggExpr(ae, anchor, _))
      }
      an.int64(3, mode)
      an.msg(4)(emitPlan(child, _))
      groups.foreach(g => an.str(5, g.name))
      aggOutputNames(groups, aggs, results).foreach(n => an.str(6, n))
      an.msg(7) { schema => // input_schema (:1466)
        child.output.foreach { a =>
          schema.msg(1) { fld =>
            fld.str(1, a.name)
            fld.msg(2)(arrowType(a.dataType, _))
            fld.bool(3, a.nullable)
          }
        }
      }
    }
  }

  private def stripAlias(e: CExpr): CExpr = e match {
    case Alias(c, _) => c; case x => x
  }

  /** PhysicalExprNode (datafusion.proto:998). */
  private def emitExpr(e: CExpr, anchor: Seq[Attribute], w: W): Unit = e match {
    case a: AttributeReference =>
      val idx = anchor.indexWhere(_.exprId == a.exprId) match {
        case -1 => anchor.indexWhere(_.name == a.name)
        case i => i
      }
      require(idx >= 0, s"dfproto physical emit: unbound column ${a.name}")
      w.msg(1) { c => // PhysicalColumn (:1385): name=1, index=2
        c.str(1, a.name); c.int64(2, idx.toLong)
      }
    case l: CLiteral => w.msg(2)(DataFusionProto.scalarValue(l, _))
    case b: BinaryOperator =>
      w.msg(3) { be => // PhysicalBinaryExprNode (:1134): l=1 r=2 op=3
        be.msg(1)(emitExpr(b.left, anchor, _))
        be.msg(2)(emitExpr(b.right, anchor, _))
        be.str(3, DataFusionProto.opName(b))
      }
    case IsNull(c) => w.msg(5)(m => m.msg(1)(emitExpr(c, anchor, _)))
    case IsNotNull(c) => w.msg(6)(m => m.msg(1)(emitExpr(c, anchor, _)))
    case Not(c) => w.msg(7)(m => m.msg(1)(emitExpr(c, anchor, _)))
    case CCast(c, t, _, _) =>
      w.msg(9) { cn => // PhysicalCastNode (:1184)
        cn.msg(1)(emitExpr(c, anchor, _)); cn.msg(2)(arrowType(t, _))
      }
    case In(v, list) if list.forall(_.isInstanceOf[CLiteral]) =>
      w.msg(12) { il => // PhysicalInListNode (:1167)
        il.msg(1)(emitExpr(v, anchor, _))
        list.foreach(x => il.msg(2)(emitExpr(x, anchor, _)))
        il.bool(3, false)
      }
    case other => throw new IllegalArgumentException(
      s"dfproto physical emit: unsupported expression ${other.nodeName}")
  }

  private def emitAggExpr(ae: AggregateExpression, anchor: Seq[Attribute],
      w: W): Unit = {
    val (name, args) = ae.aggregateFunction match {
      case Sum(c, _) => ("sum", Seq(c))
      case Count(cs) if cs.isEmpty ||
        cs == Seq(CLiteral(1, IntegerType)) => ("count", Seq(CLiteral(1L, LongType)))
      case Count(cs) => ("count", cs)
      case Min(c) => ("min", Seq(c))
      case Max(c) => ("max", Seq(c))
      case Average(c, _) => ("avg", Seq(c))
      case other => throw new IllegalArgumentException(
        s"dfproto physical emit: unsupported aggregate ${other.nodeName}")
    }
    w.msg(4) { an => // PhysicalAggregateExprNode (:1089): udaf=4 expr=2 distinct=3
      an.str(4, name)
      args.foreach(a => an.msg(2)(emitExpr(a, anchor, _)))
      if (ae.isDistinct) an.bool(3, true)
    }
  }

  /** A sort key as PhysicalExprNode{sort=10{expr,asc,nulls_first}}. */
  private def emitSortAsExpr(so: SortOrder, anchor: Seq[Attribute], w: W): Unit =
    w.msg(10) { sn => // PhysicalSortExprNode (:1156)
      sn.msg(1)(emitExpr(so.child, anchor, _))
      sn.bool(2, so.direction == org.apache.spark.sql.catalyst.expressions.Ascending)
      sn.bool(3, so.nullOrdering == org.apache.spark.sql.catalyst.expressions.NullsFirst)
    }

  private def arrowType(t: DataType, w: W): Unit =
    DataFusionProto.arrowType(t, w)

  // --------------------------------------------------------------- consume

  /** PhysicalPlanNode bytes → executable DataFrame. Scans resolve by
    * their file paths (falling back to `tableFor` on the path basename),
    * and the reference's PARTIAL/FINAL aggregate pair collapses into one
    * logical aggregation — the re-plan contract. */
  def consume(spark: SparkSession, bytes: Array[Byte],
      tableFor: String => Option[DataFrame]): DataFrame = {
    val fs = fields(bytes)
    require(fs.size == 1, s"dfproto physical: expected one variant, got ${fs.size}")
    val (field, PBytes(node)) = (fs.head._1, fs.head._2): @unchecked
    field match {
      case 1 => // ParquetScanExecNode
        val conf = sub(node, 1).getOrElse(throw new IllegalArgumentException(
          "dfproto physical: scan without base_conf"))
        val files = subs(conf, 1).flatMap(fg => subs(fg, 1))
          .flatMap(pf => sub(pf, 1)).map(strOf)
        require(files.nonEmpty, "dfproto physical: scan without files")
        // table name = the shared parent directory/file basename sans ext
        val base = {
          val p = files.head
          val parent = p.substring(0, p.lastIndexOf('/'))
          val leaf = if (p.endsWith(".parquet") && !parent.endsWith(".parquet"))
            p.substring(p.lastIndexOf('/') + 1) else parent.substring(parent.lastIndexOf('/') + 1)
          if (leaf.contains('.')) leaf.substring(0, leaf.lastIndexOf('.')) else leaf
        }
        val df = tableFor(base.toLowerCase).getOrElse {
          val parents = files.map(f => f.substring(0, f.lastIndexOf('/'))).distinct
          spark.read.parquet(parents: _*)
        }
        // apply the projection indices against the declared schema order
        val schemaNames = sub(conf, 2).toSeq.flatMap(s => subs(s, 1))
          .flatMap(f => sub(f, 1)).map(strOf)
        val proj = fields(conf).collect { case (4, PVarint(i)) => i.toInt }
        if (proj.nonEmpty && schemaNames.nonEmpty)
          df.select(proj.map(i => col(schemaNames(i))): _*)
        else df
      case 12 => // FilterExecNode
        val input = consume(spark, sub(node, 1).get, tableFor)
        input.filter(consumeExpr(sub(node, 2).get, input))
      case 4 => // ProjectionExecNode
        val input = consume(spark, sub(node, 1).get, tableFor)
        val exprs = subs(node, 2).map(e => consumeExpr(e, input))
        val names = fields(node).collect { case (3, PBytes(v)) => strOf(v) }
        val named = if (names.size == exprs.size)
          exprs.zip(names).map { case (c, n) => c.as(n) } else exprs
        input.select(named: _*)
      case 8 => // AggregateExecNode
        val mode = vint(node, 3).getOrElse(3L)
        // FINAL over PARTIAL collapses: descend to the partial's input
        val inner = sub(node, 4).get
        val innerFields = fields(inner)
        val (srcBytes, aggSource) = innerFields.headOption match {
          case Some((8, PBytes(pnode))) if mode == 1L || mode == 2L =>
            (sub(pnode, 4).get, pnode)
          case _ => (sub(node, 4).get, node)
        }
        val input = consume(spark, srcBytes, tableFor)
        val keys = subs(aggSource, 1).map(e => consumeExpr(e, input))
        val aggs0 = subs(aggSource, 2).map(e => consumeAggExpr(e, input))
        // aggr_expr_name (field 6) of the OUTER (final/single) node names
        // the non-key outputs
        val names = fields(node).collect { case (6, PBytes(v)) => strOf(v) }
        val aggs = if (names.size == aggs0.size)
          aggs0.zip(names).map { case (c, n) => c.as(n) } else aggs0
        if (keys.isEmpty) input.agg(aggs.head, aggs.tail: _*)
        else input.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      case 10 => // SortExecNode
        val input = consume(spark, sub(node, 1).get, tableFor)
        val orders = subs(node, 2).map { se =>
          // each entry is PhysicalExprNode{sort=10}
          val sn = sub(se, 10).getOrElse(se)
          val c = consumeExpr(sub(sn, 1).get, input)
          val asc = vint(sn, 2).contains(1L)
          val nf = vint(sn, 3).contains(1L)
          (asc, nf) match {
            case (true, true) => c.asc_nulls_first
            case (true, false) => c.asc_nulls_last
            case (false, true) => c.desc_nulls_first
            case (false, false) => c.desc_nulls_last
          }
        }
        val sorted = input.orderBy(orders: _*)
        // fetch ≥ 0 = the reference's TopK sort
        vint(node, 3).map(_.toInt).filter(_ >= 0)
          .map(sorted.limit).getOrElse(sorted)
      case 6 => // GlobalLimitExecNode
        val input = consume(spark, sub(node, 1).get, tableFor)
        val skip = vint(node, 2).getOrElse(0L)
        val fetch = vint(node, 3).getOrElse(-1L)
        val after = if (skip > 0) input.offset(skip.toInt) else input
        if (fetch >= 0) after.limit(fetch.toInt) else after
      case 7 => // LocalLimitExecNode — re-planned as a plain limit
        val input = consume(spark, sub(node, 1).get, tableFor)
        input.limit(vint(node, 2).getOrElse(0L).toInt)
      case other => throw new IllegalArgumentException(
        s"dfproto physical consume: unsupported variant $other")
    }
  }

  private def consumeExpr(b: Array[Byte], input: DataFrame): Column = {
    val fs = fields(b)
    require(fs.nonEmpty, "dfproto physical: empty expr")
    val (field, PBytes(node)) = (fs.head._1, fs.head._2): @unchecked
    field match {
      case 1 => // PhysicalColumn: resolve positionally, name as fallback
        val idx = vint(node, 2).map(_.toInt)
        idx.filter(i => i >= 0 && i < input.columns.length)
          .map(i => col(input.columns(i)))
          .getOrElse(col(sub(node, 1).map(strOf).getOrElse(
            throw new IllegalArgumentException("dfproto physical: column"))))
      case 2 => DataFusionProto.consumeLiteral(node)
      case 3 =>
        val l = consumeExpr(sub(node, 1).get, input)
        val r = consumeExpr(sub(node, 2).get, input)
        sub(node, 3).map(strOf).getOrElse("") match {
          case "Eq" => l === r
          case "NotEq" => l =!= r
          case "Lt" => l < r
          case "LtEq" => l <= r
          case "Gt" => l > r
          case "GtEq" => l >= r
          case "And" => l && r
          case "Or" => l || r
          case "Plus" => l + r
          case "Minus" => l - r
          case "Multiply" => l * r
          case "Divide" => l / r
          case other => throw new IllegalArgumentException(
            s"dfproto physical consume: unsupported op $other")
        }
      case 5 => consumeExpr(sub(node, 1).get, input).isNull
      case 6 => consumeExpr(sub(node, 1).get, input).isNotNull
      case 7 => !consumeExpr(sub(node, 1).get, input)
      case 9 => consumeExpr(sub(node, 1).get, input)
        .cast(DataFusionProto.consumeType(sub(node, 2).get))
      case 12 =>
        val v = consumeExpr(sub(node, 1).get, input)
        val list = subs(node, 2).map(e => consumeExpr(e, input))
        val in = v.isin(list: _*)
        if (vint(node, 3).contains(1L)) !in else in
      case other => throw new IllegalArgumentException(
        s"dfproto physical consume: unsupported expr variant $other")
    }
  }

  private def consumeAggExpr(b: Array[Byte], input: DataFrame): Column = {
    val node = sub(b, 4).getOrElse(throw new IllegalArgumentException(
      "dfproto physical consume: expected aggregate_expr"))
    val name = sub(node, 4).map(strOf).getOrElse("")
    val args = subs(node, 2).map(e => consumeExpr(e, input))
    val distinct = vint(node, 3).contains(1L)
    (name, distinct) match {
      case ("sum", false) => sum(args.head)
      case ("sum", true) => sum_distinct(args.head)
      case ("count", false) => count(args.head)
      case ("count", true) => countDistinct(args.head, args.tail: _*)
      case ("min", _) => min(args.head)
      case ("max", _) => max(args.head)
      case ("avg", false) => avg(args.head)
      case (other, d) => throw new IllegalArgumentException(
        s"dfproto physical consume: unsupported aggregate $other (distinct=$d)")
    }
  }
}
