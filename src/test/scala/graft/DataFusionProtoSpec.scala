package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.DataFusionProto
import graft.plans.DataFusionProto.{PBytes, PVarint}

class DataFusionProtoSpec extends AnyFunSuite {
  import TestSpark._

  test("varint wire roundtrip across the magnitude range") {
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, 1L << 21, 1L << 35, Long.MaxValue)) {
      val w = new DataFusionProto.W
      w.int64(1, v)
      val fs = DataFusionProto.fields(w.bytes)
      assert(fs == Seq(1 -> PVarint(v)), s"v=$v")
    }
  }

  test("golden bytes: Column expr node matches the hand-computed encoding") {
    // LogicalExprNode{ column=1 { name="x" } } (datafusion.proto:462,
    // datafusion_common.proto:27): tag(1,LEN)=0x0A len=3,
    // inner tag(1,LEN)=0x0A len=1 'x'
    val w = new DataFusionProto.W
    w.msg(1)(_.str(1, "x"))
    assert(w.bytes.toSeq == Seq(0x0A, 0x03, 0x0A, 0x01, 0x78).map(_.toByte))
  }

  test("nested message fields parse back with numbers and payloads intact") {
    val w = new DataFusionProto.W
    w.msg(4) { be =>
      be.msg(1)(_.msg(1)(_.str(1, "a")))
      be.msg(1)(_.msg(3)(_.int64(7, 42L)))
      be.str(3, "Plus")
    }
    val Seq((4, PBytes(be))) = DataFusionProto.fields(w.bytes): @unchecked
    val ops = DataFusionProto.fields(be).collect { case (1, PBytes(v)) => v }
    assert(ops.size == 2)
    val op = DataFusionProto.fields(be).collectFirst {
      case (3, PBytes(v)) => new String(v, "UTF-8") }
    assert(op.contains("Plus"))
  }

  test("emit → bytes → consume executes the same rows (binary wire roundtrip)") {
    import org.apache.spark.sql.functions._
    val src = Tables.load(spark, sfDir, "orders")
      .filter(col("o_totalprice") > lit(1000.0))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("o_totalprice")).as("total"),
        count(lit(1L)).as("n"))
      .orderBy(col("o_orderpriority"))
    val bytes = DataFusionProto.emit(src)
    assert(bytes.length > 50)
    val back = DataFusionProto.consume(spark, bytes,
      n => Some(Tables.load(spark, sfDir, n)))
    val a = src.collect().map(_.toSeq).toSeq
    val b = back.collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("golden bytes: JoinNode carries type/constraint/keys at the proto field numbers") {
    import org.apache.spark.sql.functions._
    val n = Tables.load(spark, sfDir, "nation")
    val r = Tables.load(spark, sfDir, "region")
    val joined = n.join(r, col("n_regionkey") === col("r_regionkey"), "left")
    val bytes = DataFusionProto.emit(joined)
    // top level: oneof variant join=7 (datafusion.proto:37)
    val Seq((7, PBytes(j))) = DataFusionProto.fields(bytes): @unchecked
    val fs = DataFusionProto.fields(j)
    assert(fs.exists { case (1, PBytes(_)) => true; case _ => false }, "left=1")
    assert(fs.exists { case (2, PBytes(_)) => true; case _ => false }, "right=2")
    // join_type=3 LEFT=1 (datafusion_common.proto:82)
    assert(fs.contains(3 -> PVarint(1L)))
    // one equi key each side at left_join_key=5 / right_join_key=6
    assert(fs.count { case (5, PBytes(_)) => true; case _ => false } == 1)
    assert(fs.count { case (6, PBytes(_)) => true; case _ => false } == 1)
    // left key decodes as Column{name=n_regionkey}
    val lk = fs.collectFirst { case (5, PBytes(v)) => v }.get
    val Seq((1, PBytes(colNode))) = DataFusionProto.fields(lk): @unchecked
    val name = DataFusionProto.fields(colNode).collectFirst {
      case (1, PBytes(v)) => new String(v, "UTF-8") }
    assert(name.contains("n_regionkey"))
    // and the consumed plan returns the join rows
    val back = DataFusionProto.consume(spark, bytes,
      t => Some(Tables.load(spark, sfDir, t)))
    assert(back.count() == joined.count())
  }

  test("join filter residual + semi/anti types survive the wire") {
    import org.apache.spark.sql.functions._
    val n = Tables.load(spark, sfDir, "nation")
    val r = Tables.load(spark, sfDir, "region")
    for (jt <- Seq("inner", "left_semi", "left_anti")) {
      val joined = n.join(r,
        col("n_regionkey") === col("r_regionkey") && col("n_nationkey") > lit(2),
        jt)
      val back = DataFusionProto.consume(spark, DataFusionProto.emit(joined),
        t => Some(Tables.load(spark, sfDir, t)))
      assert(back.count() == joined.count(), s"type=$jt")
    }
  }

  test("union + distinct + subquery alias nodes roundtrip (fields 19/23/21)") {
    import org.apache.spark.sql.functions._
    val n = Tables.load(spark, sfDir, "nation").select(col("n_regionkey"))
    val u = n.union(n).distinct().alias("u").filter(col("n_regionkey") >= lit(0))
    val bytes = DataFusionProto.emit(u)
    // outermost is the filter (selection=4); walk down to find union=19
    def variants(b: Array[Byte]): Seq[Int] = {
      val fs = DataFusionProto.fields(b)
      fs.headOption match {
        case Some((v, PBytes(node))) =>
          v +: DataFusionProto.fields(node).collect {
            case (1, PBytes(c)) => variants(c) }.flatten
        case _ => Seq.empty
      }
    }
    val vs = variants(bytes)
    assert(vs.contains(19), s"union node present: $vs")
    assert(vs.contains(23), s"distinct node present: $vs")
    assert(vs.contains(21), s"subquery alias node present: $vs")
    val back = DataFusionProto.consume(spark, bytes,
      t => Some(Tables.load(spark, sfDir, t)))
    assert(back.collect().map(_.getInt(0)).sorted.toSeq ==
      u.collect().map(_.getInt(0)).sorted.toSeq)
  }

  test("window node: row_number + framed avg roundtrip (field 13/18)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val spec = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val w = o.withColumn("rk", row_number().over(spec))
      .withColumn("run", sum(col("o_totalprice")).over(
        spec.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bytes = DataFusionProto.emit(w)
    // withColumn tops the plan with a Project; the Window node (oneof
    // variant 13) sits below it
    def hasVariant(b: Array[Byte], v: Int): Boolean =
      DataFusionProto.fields(b).headOption match {
        case Some((`v`, PBytes(_))) => true
        case Some((_, PBytes(node))) =>
          DataFusionProto.fields(node).exists {
            case (1, PBytes(c)) => hasVariant(c, v)
            case _ => false
          }
        case _ => false
      }
    assert(hasVariant(bytes, 13), "WindowNode present on the wire")
    val back = DataFusionProto.consume(spark, bytes,
      t => Some(Tables.load(spark, sfDir, t)))
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(1), r.getInt(3))
    assert(back.collect().map(key).sorted.toSeq ==
      w.collect().map(key).sorted.toSeq)
  }

  test("distinct aggregates are honored after the roundtrip") {
    import org.apache.spark.sql.functions._
    val o = Tables.load(spark, sfDir, "orders")
    val src = o.groupBy(col("o_orderpriority"))
      .agg(sum_distinct(col("o_custkey")).as("sd"),
        countDistinct(col("o_custkey")).as("cd"))
      .orderBy(col("o_orderpriority"))
    val back = DataFusionProto.consume(spark, DataFusionProto.emit(src),
      t => Some(Tables.load(spark, sfDir, t)))
    assert(back.collect().map(_.toSeq).toSeq == src.collect().map(_.toSeq).toSeq)
  }

  test("group-only aggregate (empty aggr_expr) consumes as distinct keys") {
    import org.apache.spark.sql.functions._
    val o = Tables.load(spark, sfDir, "orders")
    val src = o.groupBy(col("o_orderpriority")).agg(Map.empty[String, String])
    // analyzed form: Aggregate(groups=[p], output=[p]) → aggr_expr empty
    val back = DataFusionProto.consume(spark, DataFusionProto.emit(src),
      t => Some(Tables.load(spark, sfDir, t)))
    assert(back.collect().map(_.getString(0)).sorted.toSeq ==
      src.collect().map(_.getString(0)).sorted.toSeq)
  }

  test("decimal literal is emitted as exactly 16 sign-extended bytes") {
    import org.apache.spark.sql.functions._
    for (v <- Seq("12345.67", "-12345.67", "0.01", "-0.01")) {
      val src = Tables.load(spark, sfDir, "region")
        .select(lit(new java.math.BigDecimal(v)).as("d"))
      val bytes = DataFusionProto.emit(src)
      // walk: projection=3 → expr=2 (alias) → expr=1 → literal=3 → decimal=20
      def find(b: Array[Byte], path: List[Int]): Array[Byte] = path match {
        case Nil => b
        case f :: rest =>
          find(DataFusionProto.fields(b).collectFirst {
            case (`f`, PBytes(x)) => x }.get, rest)
      }
      val dec = find(bytes, List(3, 2, 2, 1, 3, 20))
      val raw = DataFusionProto.fields(dec).collectFirst {
        case (1, PBytes(x)) => x }.get
      assert(raw.length == 16, s"v=$v len=${raw.length}")
      // i128::from_be_bytes view equals the BigDecimal's unscaled value
      assert(new java.math.BigInteger(raw) ==
        new java.math.BigDecimal(v).unscaledValue())
      val back = DataFusionProto.consume(spark, bytes,
        t => Some(Tables.load(spark, sfDir, t)))
      assert(back.head().getDecimal(0).compareTo(new java.math.BigDecimal(v)) == 0)
    }
  }

  test("frame bound offsets ride ScalarValue::UInt64 (field 11) like the reference") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val spec = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val w = o.withColumn("mv",
      avg(col("o_totalprice")).over(spec.rowsBetween(-2, Window.currentRow)))
    val bytes = DataFusionProto.emit(w)
    // find every WindowFrameBound-shaped message: type=1 (PRECEDING) with a
    // bound_value=2 ScalarValue — the 2-row offset must sit at
    // uint64_value = field 11, the reference's convention
    def bounds(b: Array[Byte]): Seq[Seq[(Int, Any)]] =
      scala.util.Try(DataFusionProto.fields(b)).toOption.toSeq.flatMap { fs =>
        val here =
          if (fs.contains(1 -> PVarint(1L)) &&
            fs.exists { case (2, PBytes(_)) => true; case _ => false })
            Seq(fs.map { case (f, v) => (f, v: Any) })
          else Seq.empty
        here ++ fs.flatMap { case (_, PBytes(x)) => bounds(x); case _ => Seq.empty }
      }
    val preceding2 = bounds(bytes).exists(_.exists {
      case (2, PBytes(sv)) =>
        DataFusionProto.fields(sv).contains(11 -> PVarint(2L))
      case _ => false
    })
    assert(preceding2, "bound offset at ScalarValue.uint64_value (field 11)")
    val back = DataFusionProto.consume(spark, bytes,
      t => Some(Tables.load(spark, sfDir, t)))
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(1), r.getDouble(3))
    assert(back.collect().map(key).sorted.toSeq ==
      w.collect().map(key).sorted.toSeq)
  }

  test("qualified self-join residual filter resolves via Column.relation") {
    import org.apache.spark.sql.functions._
    val n = Tables.load(spark, sfDir, "nation")
    val j = n.alias("a").join(n.alias("b"),
      col("a.n_regionkey") === col("b.n_regionkey") &&
        col("a.n_nationkey") < col("b.n_nationkey"))
    val bytes = DataFusionProto.emit(j)
    // the residual filter's columns carry Column.relation (common:28)
    val Seq((7, PBytes(join))) = DataFusionProto.fields(bytes): @unchecked
    val filt = DataFusionProto.fields(join).collectFirst {
      case (8, PBytes(f)) => f }.get
    // gather ColumnRelation strings from every Column node in the tree;
    // leaf strings are not valid messages, so guard the descent with Try
    def rels(b: Array[Byte]): Seq[String] =
      scala.util.Try(DataFusionProto.fields(b)).toOption.toSeq.flatMap { fs =>
        fs.flatMap {
          case (1, PBytes(colNode)) =>
            val rel = scala.util.Try(DataFusionProto.fields(colNode)).toOption
              .flatMap(_.collectFirst { case (2, PBytes(r)) =>
                DataFusionProto.fields(r).collectFirst {
                  case (1, PBytes(s)) => new String(s, "UTF-8") } }.flatten)
            rel.toSeq ++ rels(colNode)
          case (_, PBytes(x)) => rels(x)
          case _ => Seq.empty
        }
      }
    assert(rels(filt).toSet == Set("a", "b"), s"qualifiers on the wire: ${rels(filt)}")
    val back = DataFusionProto.consume(spark, bytes,
      t => Some(Tables.load(spark, sfDir, t)))
    assert(back.count() == j.count())
  }

  test("inner theta join (no equi conjunct) emits empty keys + filter") {
    import org.apache.spark.sql.functions._
    val n = Tables.load(spark, sfDir, "nation")
    val r = Tables.load(spark, sfDir, "region")
    val j = n.join(r, col("n_regionkey") < col("r_regionkey"))
    val bytes = DataFusionProto.emit(j)
    val Seq((7, PBytes(join))) = DataFusionProto.fields(bytes): @unchecked
    val fs = DataFusionProto.fields(join)
    assert(!fs.exists { case (5, _) => true; case _ => false }, "no left keys")
    assert(fs.exists { case (8, PBytes(_)) => true; case _ => false }, "filter present")
    val back = DataFusionProto.consume(spark, bytes,
      t => Some(Tables.load(spark, sfDir, t)))
    assert(back.count() == j.count())
  }

  test("aggregate output order (aggs before keys) survives via projection wrap") {
    import org.apache.spark.sql.functions._
    Tables.load(spark, sfDir, "orders").createOrReplaceTempView("orders_dfp")
    val src = spark.sql(
      "SELECT sum(o_totalprice) AS s, o_orderpriority FROM orders_dfp " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority")
    val bytes = DataFusionProto.emit(src)
    val back = DataFusionProto.consume(spark, bytes,
      t => if (t == "orders_dfp") Some(Tables.load(spark, sfDir, "orders"))
           else Some(Tables.load(spark, sfDir, t)))
    assert(back.columns.toSeq == Seq("s", "o_orderpriority"), "column order restored")
    assert(back.collect().map(_.toSeq).toSeq == src.collect().map(_.toSeq).toSeq)
  }

  test("avg(DISTINCT) keeps decimal semantics after the roundtrip") {
    import org.apache.spark.sql.functions._
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderpriority"),
        col("o_totalprice").cast("decimal(12,2)").as("p"))
      .groupBy(col("o_orderpriority"))
      .agg(expr("avg(DISTINCT p)").as("ad"))
      .orderBy(col("o_orderpriority"))
    val back = DataFusionProto.consume(spark, DataFusionProto.emit(o),
      t => Some(Tables.load(spark, sfDir, t)))
    assert(back.schema("ad").dataType.isInstanceOf[
      org.apache.spark.sql.types.DecimalType], "decimal type preserved")
    val a = o.collect().map(r => (r.getString(0), r.getDecimal(1)))
    val b = back.collect().map(r => (r.getString(0), r.getDecimal(1)))
    assert(a.length == b.length)
    a.zip(b).foreach { case ((k1, v1), (k2, v2)) =>
      assert(k1 == k2); assert(v1.compareTo(v2) == 0, s"$k1: $v1 vs $v2")
    }
  }

  test("ValuesNode (16): flattened n_cols wire form roundtrips") {
    // Spark names plain VALUES col1/col2 — the wire carries no names, so
    // emit wraps a renaming ProjectionNode over the canonical
    // column1..columnN values output
    val src = spark.sql("VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    val bytes = DataFusionProto.emit(src)
    val Seq((3, PBytes(proj))) = DataFusionProto.fields(bytes): @unchecked
    val Seq((16, PBytes(v))) = DataFusionProto.fields(
      DataFusionProto.fields(proj).collectFirst {
        case (1, PBytes(c)) => c }.get): @unchecked
    assert(DataFusionProto.fields(v).contains(1 -> PVarint(2L)), "n_cols=2")
    assert(DataFusionProto.fields(v)
      .count { case (2, PBytes(_)) => true; case _ => false } == 6,
      "3 rows × 2 cols flattened")
    val back = DataFusionProto.consume(spark, bytes, _ => None)
    assert(back.columns.toSeq == Seq("col1", "col2"))
    assert(back.collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("RepartitionNode (9): round-robin and hash forms roundtrip") {
    import org.apache.spark.sql.functions._
    val n = Tables.load(spark, sfDir, "nation")
    val rr = DataFusionProto.emit(n.repartition(4))
    val Seq((9, PBytes(rnode))) = DataFusionProto.fields(rr): @unchecked
    assert(DataFusionProto.fields(rnode).contains(2 -> PVarint(4L)), "round_robin=4")
    val hs = DataFusionProto.emit(n.repartition(8, col("n_regionkey")))
    val Seq((9, PBytes(hnode))) = DataFusionProto.fields(hs): @unchecked
    val hash = DataFusionProto.fields(hnode).collectFirst {
      case (3, PBytes(h)) => h }.get
    assert(DataFusionProto.fields(hash).contains(2 -> PVarint(8L)),
      "partition_count=8")
    for (bytes <- Seq(rr, hs)) {
      val back = DataFusionProto.consume(spark, bytes,
        t => Some(Tables.load(spark, sfDir, t)))
      assert(back.count() == n.count())
    }
    assert(DataFusionProto.consume(spark, hs,
      t => Some(Tables.load(spark, sfDir, t))).rdd.getNumPartitions == 8)
  }

  test("DistinctOnNode (28): reference-shaped bytes execute first-per-key") {
    import org.apache.spark.sql.functions._
    // hand-assemble DistinctOnNode{on=[n_regionkey], select=[n_regionkey,
    // n_name], sort=[n_name ASC], input=scan(nation)} — the reference's
    // DISTINCT ON (k) ... ORDER BY shape
    val scan = DataFusionProto.emit(Tables.load(spark, sfDir, "nation"))
    val w = new DataFusionProto.W
    w.msg(28) { d =>
      d.msg(1)(_.msg(1)(_.str(1, "n_regionkey")))
      d.msg(2)(_.msg(1)(_.str(1, "n_regionkey")))
      d.msg(2)(_.msg(1)(_.str(1, "n_name")))
      d.msg(3) { se =>
        se.msg(1)(_.msg(1)(_.str(1, "n_name")))
        se.bool(2, true); se.bool(3, false)
      }
      d.raw(4, scan)
    }
    val back = DataFusionProto.consume(spark, w.bytes,
      t => Some(Tables.load(spark, sfDir, t)))
    val expected = Tables.load(spark, sfDir, "nation")
      .groupBy(col("n_regionkey")).agg(min(col("n_name")).as("n_name"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(back.collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
      == expected)
  }

  test("physical wire: scan/filter/project/agg pair/sort/limit roundtrip") {
    import org.apache.spark.sql.functions._
    import graft.plans.DataFusionProtoPhysical
    val src = Tables.load(spark, sfDir, "orders")
      .filter(col("o_totalprice") > lit(1000.0))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1L)).as("n"), sum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderpriority"))
      .limit(5)
    val bytes = DataFusionProtoPhysical.emit(src)
    // golden shape: the outer nodes wrap a FINAL(mode=1) aggregate over a
    // PARTIAL(mode=0) aggregate over filter(12) over parquet scan(1)
    def descend(b: Array[Byte], acc: List[(Int, Array[Byte])])
        : List[(Int, Array[Byte])] =
      DataFusionProto.fields(b).headOption match {
        case Some((1, PBytes(node))) => acc :+ (1, node) // scan — leaf
        case Some((v, PBytes(node))) =>
          val childField = v match { case 8 => 4; case _ => 1 }
          DataFusionProto.fields(node).collectFirst {
            case (`childField`, PBytes(c)) => c } match {
            case Some(c) => descend(c, acc :+ (v, node))
            case None => acc :+ (v, node)
          }
        case _ => acc
      }
    val chain = descend(bytes, Nil)
    val variants = chain.map(_._1)
    assert(variants.head == 10, s"TopK sort on top: $variants")
    // a column-pruning Projection may sit between filter and scan when a
    // sibling suite cached the relation — require the spine, not adjacency
    assert(variants.containsSlice(Seq(8, 8)) && variants.contains(12) &&
      variants.last == 1,
      s"agg pair and filter/scan chain on the wire: $variants")
    val aggModes = chain.filter(_._1 == 8).map { case (_, node) =>
      DataFusionProto.fields(node).collectFirst {
        case (3, PVarint(m)) => m }.getOrElse(-1L)
    }
    assert(aggModes == List(1L, 0L), s"FINAL over PARTIAL: $aggModes")
    val back = DataFusionProtoPhysical.consume(spark, bytes,
      t => Some(Tables.load(spark, sfDir, t)))
    assert(back.collect().map(_.toSeq).toSeq ==
      src.collect().map(_.toSeq).toSeq)
  }

  test("physical wire: broadcast hash join emits HashJoinExecNode(9) " +
      "with JoinOn/type/mode at the proto field numbers") {
    import org.apache.spark.sql.functions._
    import graft.plans.DataFusionProtoPhysical
    val n = Tables.load(spark, sfDir, "nation")
    val r = Tables.load(spark, sfDir, "region")
    val src = n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), col("r_name"))
    val bytes = DataFusionProtoPhysical.emit(src)
    // spine: a Projection(4) over the HashJoin(9)
    val proj = DataFusionProto.fields(bytes).collectFirst {
      case (4, PBytes(v)) => v }.get
    val join = DataFusionProto.fields(
      DataFusionProto.fields(proj).collectFirst {
        case (1, PBytes(v)) => v }.get).collectFirst {
      case (9, PBytes(v)) => v }.get
    val fs = DataFusionProto.fields(join)
    assert(fs.exists(_._1 == 3), "JoinOn (field 3) present")
    assert(fs.collectFirst { case (4, PVarint(v)) => v }.getOrElse(-1L) == 0L,
      "join_type INNER")
    // Spark broadcasts the RIGHT side here — no CollectRight on the wire,
    // so partition_mode rides AUTO(2)
    assert(fs.collectFirst { case (6, PVarint(v)) => v }.getOrElse(-1L) == 2L,
      "partition_mode AUTO for a broadcast-right build")
    val on = fs.collectFirst { case (3, PBytes(v)) => v }.get
    val lk = DataFusionProto.fields(
      DataFusionProto.fields(on).collectFirst { case (1, PBytes(v)) => v }.get)
    assert(lk.head._1 == 1, "left key is a PhysicalColumn (variant 1)")
    val back = DataFusionProtoPhysical.consume(spark, bytes,
      t => Some(Tables.load(spark, sfDir, t)))
    assert(back.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq ==
      src.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq)
  }

  test("physical wire: sort-merge join + residual filter ride " +
      "SortMergeJoinExecNode(34) with JoinFilter sides") {
    import org.apache.spark.sql.functions._
    import graft.plans.DataFusionProtoPhysical
    val c = Tables.load(spark, sfDir, "customer")
    val o = Tables.load(spark, sfDir, "orders")
    val src = c.hint("merge")
      .join(o, col("c_custkey") === col("o_custkey") &&
        col("o_totalprice") > col("c_acctbal"))
      .select(col("c_name"), col("o_orderkey"))
    val bytes = DataFusionProtoPhysical.emit(src)
    val proj = DataFusionProto.fields(bytes).collectFirst {
      case (4, PBytes(v)) => v }.get
    val smj = DataFusionProto.fields(
      DataFusionProto.fields(proj).collectFirst {
        case (1, PBytes(v)) => v }.get).collectFirst {
      case (34, PBytes(v)) => v }.get
    val fs = DataFusionProto.fields(smj)
    assert(fs.exists(_._1 == 3) && fs.exists(_._1 == 5),
      "JoinOn (3) and JoinFilter (5) present")
    val filter = fs.collectFirst { case (5, PBytes(v)) => v }.get
    val sides = DataFusionProto.fields(filter).collect {
      case (2, PBytes(ci)) => DataFusionProto.fields(ci).collectFirst {
        case (2, PVarint(s)) => s }.getOrElse(0L)
    }
    assert(sides.toSet == Set(0L, 1L),
      s"ColumnIndex maps one column per side: $sides")
    val back = DataFusionProtoPhysical.consume(spark, bytes,
      t => Some(Tables.load(spark, sfDir, t)))
    assert(back.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq ==
      src.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq)
  }

  test("physical wire: cross join (16), theta join (22) and union (19)") {
    import org.apache.spark.sql.functions._
    import graft.plans.DataFusionProtoPhysical
    val r = Tables.load(spark, sfDir, "region")
    val n = Tables.load(spark, sfDir, "nation")
    // cross
    val cross = r.crossJoin(r.select(col("r_regionkey").as("k2")))
    val cb = DataFusionProtoPhysical.emit(cross)
    assert(DataFusionProto.fields(cb).head._1 == 16, "CrossJoinExecNode(16)")
    val crossBack = DataFusionProtoPhysical.consume(spark, cb,
      t => Some(Tables.load(spark, sfDir, t)))
    assert(crossBack.count() == cross.count())
    // theta: non-equi condition plans as a nested-loop join
    val theta = r.select(col("r_regionkey").as("a"))
      .join(n.select(col("n_regionkey").as("b")), col("a") < col("b"))
    val tb = DataFusionProtoPhysical.emit(theta)
    assert(DataFusionProto.fields(tb).head._1 == 22,
      "NestedLoopJoinExecNode(22)")
    val thetaBack = DataFusionProtoPhysical.consume(spark, tb,
      t => Some(Tables.load(spark, sfDir, t)))
    assert(thetaBack.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq ==
      theta.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq)
    // union ALL
    val u = r.select(col("r_regionkey")).union(n.select(col("n_regionkey")))
    val ub = DataFusionProtoPhysical.emit(u)
    assert(DataFusionProto.fields(ub).head._1 == 19, "UnionExecNode(19)")
    val inputs = DataFusionProto.fields(ub).collectFirst {
      case (19, PBytes(v)) => DataFusionProto.fields(v).count(_._1 == 1) }.get
    assert(inputs == 2, "two union inputs")
    val uBack = DataFusionProtoPhysical.consume(spark, ub,
      t => Some(Tables.load(spark, sfDir, t)))
    assert(uBack.collect().map(_.getInt(0)).sorted.toSeq ==
      u.collect().map(_.getInt(0)).sorted.toSeq)
  }

  test("physical wire: WindowAggExecNode(15) carries " +
      "PhysicalWindowExprNode udwf/udaf + frame") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.plans.DataFusionProtoPhysical
    val o = Tables.load(spark, sfDir, "orders").limit(200)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val spec = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderkey").asc_nulls_last)
    val src = o.select(col("o_orderkey"), col("o_custkey"),
      row_number().over(spec).as("rn"),
      sum(col("o_totalprice")).over(spec.rowsBetween(-2, 0)).as("run3"))
    val bytes = DataFusionProtoPhysical.emit(src)
    def findWindow(b: Array[Byte]): Option[Array[Byte]] =
      DataFusionProto.fields(b).headOption.flatMap {
        case (15, PBytes(v)) => Some(v)
        case (v, PBytes(node)) =>
          val childField = v match { case 8 => 4; case _ => 1 }
          DataFusionProto.fields(node).collectFirst {
            case (`childField`, PBytes(c)) => c }.flatMap(findWindow)
        case _ => None
      }
    val wn = findWindow(bytes).getOrElse(fail("no WindowAggExecNode(15)"))
    val wes = DataFusionProto.fields(wn).collect { case (2, PBytes(v)) => v }
    assert(wes.size == 2, "two window expressions")
    val names = wes.flatMap(we => DataFusionProto.fields(we).collectFirst {
      case (3, PBytes(s)) => new String(s, "UTF-8")
      case (10, PBytes(s)) => new String(s, "UTF-8")
    })
    assert(names.toSet == Set("row_number", "sum"), s"functions: $names")
    val framed = wes.find(we => DataFusionProto.fields(we)
      .exists(_._1 == 7)).getOrElse(fail("no framed window expr"))
    val fr = DataFusionProto.fields(framed).collectFirst {
      case (7, PBytes(v)) => v }.get
    assert(DataFusionProto.fields(fr).collectFirst {
      case (1, PVarint(u)) => u }.getOrElse(-1L) == 0L, "ROWS units")
    val back = DataFusionProtoPhysical.consume(spark, bytes,
      t => Some(Tables.load(spark, sfDir, t)))
    assert(back.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq ==
      src.collect().map(_.toSeq.toList).sortBy(_.toString).toSeq)
  }

  test("physical wire: range (33), repartition (14), coalesce (13), empty (3)") {
    import org.apache.spark.sql.functions._
    import graft.plans.DataFusionProtoPhysical
    // GenerateSeriesNode: spark.range is the exclusive-end GS_RANGE form
    // (.toDF() only converts — a rename would add a ProjectionNode on top)
    val r = spark.range(5, 20, 3).toDF()
    val rb = DataFusionProtoPhysical.emit(r)
    assert(DataFusionProto.fields(rb).head._1 == 33, "GenerateSeriesNode(33)")
    val args = DataFusionProto.fields(rb).collectFirst {
      case (33, PBytes(v)) => v }.flatMap(n =>
      DataFusionProto.fields(n).collectFirst { case (4, PBytes(a)) => a }).get
    assert(DataFusionProto.fields(args).collectFirst {
      case (1, PVarint(v)) => v }.contains(5L))
    assert(DataFusionProto.fields(args).collectFirst {
      case (5, PVarint(v)) => v }.contains(1L), "GS_RANGE name")
    val rBack = DataFusionProtoPhysical.consume(spark, rb, _ => None)
    assert(rBack.collect().map(_.getLong(0)).sorted.toSeq == Seq(5L, 8L, 11L, 14L, 17L))
    // RepartitionExecNode: hash partitioning survives the wire
    val rep = Tables.load(spark, sfDir, "nation").repartition(4, col("n_regionkey"))
    val repB = DataFusionProtoPhysical.emit(rep)
    assert(DataFusionProto.fields(repB).head._1 == 14, "RepartitionExecNode(14)")
    val part = DataFusionProto.fields(repB).collectFirst {
      case (14, PBytes(v)) => v }.flatMap(n =>
      DataFusionProto.fields(n).collectFirst { case (5, PBytes(p)) => p }).get
    assert(DataFusionProto.fields(part).head._1 == 2, "hash partitioning")
    val repBack = DataFusionProtoPhysical.consume(spark, repB,
      t => Some(Tables.load(spark, sfDir, t)))
    assert(repBack.rdd.getNumPartitions == 4)
    assert(repBack.count() == rep.count())
    // CoalescePartitionsExecNode
    val co = Tables.load(spark, sfDir, "region").coalesce(1)
    val coB = DataFusionProtoPhysical.emit(co)
    assert(DataFusionProto.fields(coB).head._1 == 13)
    assert(DataFusionProtoPhysical.consume(spark, coB,
      t => Some(Tables.load(spark, sfDir, t))).rdd.getNumPartitions == 1)
    // EmptyExecNode: an empty local relation carries only its schema
    import spark.implicits._
    val empty = Seq.empty[(Int, String)].toDF("a", "b")
    val eb = DataFusionProtoPhysical.emit(empty)
    assert(DataFusionProto.fields(eb).head._1 == 3, "EmptyExecNode(3)")
    val eBack = DataFusionProtoPhysical.consume(spark, eb, _ => None)
    assert(eBack.columns.toSeq == Seq("a", "b") && eBack.count() == 0)
  }

  test("physical wire: CSV scan rides CsvScanExecNode(2) with header/delimiter") {
    import org.apache.spark.sql.functions._
    import graft.plans.DataFusionProtoPhysical
    val path = "/root/repo/src/test/resources/fixtures/aggregate_test_100.csv"
    val src = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(path).select(col("c1"), col("c2")).filter(col("c2") > 2)
    val bytes = DataFusionProtoPhysical.emit(src)
    def findScan(b: Array[Byte]): Option[(Int, Array[Byte])] =
      DataFusionProto.fields(b).headOption.flatMap {
        case (f @ (1 | 2 | 31 | 17), PBytes(v)) => Some((f, v))
        case (_, PBytes(node)) => DataFusionProto.fields(node).collectFirst {
          case (1, PBytes(c)) => c }.flatMap(findScan)
        case _ => None
      }
    val (variant, scanNode) = findScan(bytes).getOrElse(fail("no scan"))
    assert(variant == 2, "CsvScanExecNode(2)")
    assert(DataFusionProto.fields(scanNode).collectFirst {
      case (2, PVarint(v)) => v }.contains(1L), "has_header")
    val back = DataFusionProtoPhysical.consume(spark, bytes, _ => None)
    assert(back.collect().map(_.toSeq).toSeq.sortBy(_.toString) ==
      src.collect().map(_.toSeq).toSeq.sortBy(_.toString))
  }

  test("UnnestNode (30): explode rides the in-place unnest + rename wire") {
    import org.apache.spark.sql.functions._
    val src = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), explode(col("embedding")).as("e"))
    val bytes = DataFusionProto.emit(src)
    // spine: ProjectionNode(3) over UnnestNode(30)
    val proj = DataFusionProto.fields(bytes).collectFirst {
      case (3, PBytes(v)) => v }.getOrElse(fail("no ProjectionNode"))
    val un = DataFusionProto.fields(
      DataFusionProto.fields(proj).collectFirst {
        case (1, PBytes(v)) => v }.get).collectFirst {
      case (30, PBytes(v)) => v }.getOrElse(fail("no UnnestNode(30)"))
    val fs = DataFusionProto.fields(un)
    val execCol = fs.collectFirst { case (2, PBytes(v)) =>
      DataFusionProto.fields(v).collectFirst {
        case (1, PBytes(n)) => new String(n, "UTF-8") }.get }
    assert(execCol.contains("embedding"))
    // options.null_handling = DROP(1) for a plain (non-outer) explode
    val nh = fs.collectFirst { case (7, PBytes(o)) =>
      DataFusionProto.fields(o).collectFirst {
        case (3, PVarint(v)) => v }.getOrElse(0L) }
    assert(nh.contains(1L))
    val back = DataFusionProto.consume(spark, bytes,
      n => Some(Tables.load(spark, sfDir, n)))
    assert(back.columns.toSeq == Seq("vec_id", "e"))
    assert(back.collect().map(r => (r.getLong(0), r.getFloat(1)))
      .sortBy(_.toString).toSeq ==
      src.collect().map(r => (r.getLong(0), r.getFloat(1)))
        .sortBy(_.toString).toSeq)
  }

  test("ViewTableScanNode (24): a temp view scan carries name + plan") {
    import org.apache.spark.sql.functions._
    Tables.load(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"))
      .createOrReplaceTempView("dfp_view_nations")
    val src = spark.table("dfp_view_nations").filter(col("n_nationkey") < 10)
    val bytes = DataFusionProto.emit(src)
    def findView(b: Array[Byte]): Option[Array[Byte]] =
      DataFusionProto.fields(b).headOption.flatMap {
        case (24, PBytes(v)) => Some(v)
        case (_, PBytes(node)) => DataFusionProto.fields(node).collectFirst {
          case (1, PBytes(c)) => c }.flatMap(findView)
        case _ => None
      }
    val vn = findView(bytes).getOrElse(fail("no ViewTableScanNode(24)"))
    val nm = DataFusionProto.fields(vn).collectFirst { case (6, PBytes(tr)) =>
      DataFusionProto.fields(tr).collectFirst { case (1, PBytes(b2)) =>
        DataFusionProto.fields(b2).collectFirst {
          case (1, PBytes(s)) => new String(s, "UTF-8") }.get }.get }
    assert(nm.contains("dfp_view_nations"))
    val back = DataFusionProto.consume(spark, bytes,
      n => Some(Tables.load(spark, sfDir, n)))
    assert(back.collect().map(_.toSeq).toSeq.sortBy(_.toString) ==
      src.collect().map(_.toSeq).toSeq.sortBy(_.toString))
  }

  test("RecursiveQueryNode (31) + CteWorkTableScanNode (32): series fixpoint") {
    import org.apache.spark.sql.functions._
    // VALUES-shaped base/marker (the logical wire has no Range node)
    val base = { import spark.implicits._; Seq(1L).toDF("n") }
    // the work-table marker: any temp view with the CTE's schema
    { import spark.implicits._
      Seq.empty[Long].toDF("n").createOrReplaceTempView("dfp_series") }
    val step = spark.table("dfp_series")
      .filter(col("n") < 10).select((col("n") + 1).as("n"))
    val bytes = DataFusionProto.emitRecursiveQuery(
      "dfp_series", base, step, "dfp_series")
    val node = DataFusionProto.fields(bytes).collectFirst {
      case (31, PBytes(v)) => v }.getOrElse(fail("no RecursiveQueryNode(31)"))
    // the recursive term must contain a CteWorkTableScanNode(32)
    def has32(b: Array[Byte]): Boolean =
      DataFusionProto.fields(b).exists {
        case (32, PBytes(_)) => true
        case (_, PBytes(inner)) => DataFusionProto.fields(inner).exists {
          case (f, PBytes(c)) if f <= 4 => has32(c)
          case _ => false
        }
        case _ => false
      }
    val recTerm = DataFusionProto.fields(node).collect {
      case (3, PBytes(v)) => v }.head
    assert(has32(recTerm), "CteWorkTableScanNode in the recursive term")
    val back = DataFusionProto.consume(spark, bytes, _ => None)
    assert(back.collect().map(_.getLong(0)).sorted.toSeq == (1L to 10L).toSeq)
  }

  test("CopyToNode (29): consume writes files and reports the COPY count") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("dfp_copy").toString
    val src = Tables.load(spark, sfDir, "region")
      .select(col("r_regionkey"), col("r_name"))
    val bytes = DataFusionProto.emitCopyTo(src, s"$dir/out", "parquet")
    assert(DataFusionProto.fields(bytes).head._1 == 29)
    val res = DataFusionProto.consume(spark, bytes,
      n => Some(Tables.load(spark, sfDir, n)))
    assert(res.collect().head.getLong(0) == src.count())
    val written = spark.read.parquet(s"$dir/out")
    assert(written.collect().map(_.toSeq).toSeq.sortBy(_.toString) ==
      src.collect().map(_.toSeq).toSeq.sortBy(_.toString))
  }

  test("DmlNode (33): CTAS, INSERT_APPEND and TRUNCATE against session tables") {
    import org.apache.spark.sql.functions._
    val src = Tables.load(spark, sfDir, "region")
      .select(col("r_regionkey").cast("long").as("k"), col("r_name").as("v"))
    val tf = (n: String) => Some(Tables.load(spark, sfDir, n))
    val ctas = DataFusionProto.emitDml("ctas", "dfp_dml_t", Some(src))
    assert(DataFusionProto.consume(spark, ctas, tf)
      .collect().head.getLong(0) == src.count())
    val extra = { import spark.implicits._
      Seq((100L, "extra"), (101L, "extra"), (102L, "extra")).toDF("k", "v") }
    val ins = DataFusionProto.emitDml("insert_append", "dfp_dml_t", Some(extra))
    assert(DataFusionProto.consume(spark, ins, tf)
      .collect().head.getLong(0) == 3L)
    assert(spark.table("dfp_dml_t").count() == src.count() + 3)
    val tr = DataFusionProto.emitDml("truncate", "dfp_dml_t", None)
    assert(DataFusionProto.consume(spark, tr, _ => None)
      .collect().head.getLong(0) == 0L)
    assert(spark.table("dfp_dml_t").count() == 0L)
  }

  test("packed repeated uint32 projection decodes (proto3 default wire)") {
    import graft.plans.DataFusionProtoPhysical
    // Hand-crafted ParquetScanExecNode whose conf.projection (field 4)
    // rides the PACKED encoding prost emits by default: one
    // length-delimited blob of varints, not per-entry varints.
    val w = new DataFusionProto.W
    w.msg(1) { p =>
      p.msg(1) { c =>
        c.msg(1)(fg => fg.msg(1)(_.str(1, s"$sfDir/nation.parquet")))
        c.msg(2) { s =>
          Seq("n_nationkey", "n_name", "n_regionkey", "n_comment")
            .foreach(n => s.msg(1)(_.str(1, n)))
        }
        val pk = new DataFusionProto.W
        pk.varint(1L); pk.varint(2L)
        c.raw(4, pk.bytes)
      }
    }
    val back = DataFusionProtoPhysical.consume(spark, w.bytes, _ => None)
    assert(back.columns.toSeq == Seq("n_name", "n_regionkey"),
      s"packed projection applied: ${back.columns.toSeq}")
    assert(back.count() == Tables.load(spark, sfDir, "nation").count())
  }

  test("GenerateSeriesNode: inclusive end at Long.MaxValue does not overflow") {
    import graft.plans.DataFusionProtoPhysical
    val w = new DataFusionProto.W
    w.msg(33) { g =>
      g.msg(1)(s => s.msg(1)(_.str(1, "v")))
      g.msg(4) { a =>
        a.int64(1, Long.MaxValue - 4)
        a.int64(2, Long.MaxValue)
        a.int64(3, 2L)
        a.bool(4, true)
      }
    }
    val back = DataFusionProtoPhysical.consume(spark, w.bytes, _ => None)
    assert(back.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(Long.MaxValue - 4, Long.MaxValue - 2, Long.MaxValue))
    // negative-step mirror at Long.MinValue
    val w2 = new DataFusionProto.W
    w2.msg(33) { g =>
      g.msg(1)(s => s.msg(1)(_.str(1, "v")))
      g.msg(4) { a =>
        a.int64(1, Long.MinValue + 2)
        a.int64(2, Long.MinValue)
        a.int64(3, -1L)
        a.bool(4, true)
      }
    }
    val back2 = DataFusionProtoPhysical.consume(spark, w2.bytes, _ => None)
    assert(back2.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(Long.MinValue, Long.MinValue + 1, Long.MinValue + 2))
  }

  test("UnnestNode PRESERVE(0): null lists keep one row, empty lists drop") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dfp_unnest").toString
    Seq((1, Some(Seq(10, 20))), (2, None), (3, Some(Seq.empty[Int])))
      .toDF("id", "xs").write.mode("overwrite").parquet(s"$dir/t")
    val src = spark.read.parquet(s"$dir/t")
    val inner = DataFusionProto.emit(src)
    val w = new DataFusionProto.W
    w.msg(30) { un =>
      un.raw(1, inner)
      un.msg(2)(_.str(1, "xs"))
      // options (field 7) absent → null_handling = PRESERVE(0), the
      // proto3 default the reference never writes on the wire
    }
    val back = DataFusionProto.consume(spark, w.bytes,
      n => if (n == "t") Some(src) else None)
    val rows = back.collect().map(r => (r.getInt(0),
      if (r.isNullAt(1)) null else Integer.valueOf(r.getInt(1))))
      .sortBy(t => (t._1, if (t._2 == null) -1 else t._2.intValue))
    assert(rows.toSeq == Seq((1, Integer.valueOf(10)),
      (1, Integer.valueOf(20)), (2, null)),
      s"PRESERVE: null list → one NULL row, empty list → dropped; got ${rows.toSeq}")
  }

  test("physical UnnestExecNode (30): explode roundtrips as in-place unnest") {
    import org.apache.spark.sql.functions._
    import graft.plans.DataFusionProtoPhysical
    val src = Tables.load(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), explode(col("embedding")).as("e"))
    val bytes = DataFusionProtoPhysical.emit(src)
    // spine: ProjectionExecNode(4) over UnnestExecNode(30)
    def findUnnest(b: Array[Byte]): Option[Array[Byte]] =
      DataFusionProto.fields(b).headOption.flatMap {
        case (30, PBytes(v)) => Some(v)
        case (_, PBytes(node)) => DataFusionProto.fields(node).collectFirst {
          case (1, PBytes(c)) => c }.flatMap(findUnnest)
        case _ => None
      }
    val un = findUnnest(bytes).getOrElse(fail("no UnnestExecNode(30)"))
    val lu = DataFusionProto.fields(un).collectFirst {
      case (3, PBytes(v)) => v }.getOrElse(fail("no ListUnnest"))
    assert(DataFusionProto.fields(lu).collectFirst {
      case (2, PVarint(d)) => d }.contains(1L), "depth 1")
    assert(DataFusionProto.fields(un).collectFirst {
      case (5, PBytes(o)) => DataFusionProto.fields(o).collectFirst {
        case (3, PVarint(nh)) => nh } }.flatten.contains(1L),
      "explode → DROP(1)")
    val back = DataFusionProtoPhysical.consume(spark, bytes,
      t => Some(Tables.load(spark, sfDir, t)))
    assert(back.columns.toSeq == src.columns.toSeq)
    assert(back.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      src.collect().map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("physical MemoryScanExecNode (35): local relation rides Arrow IPC blobs") {
    import spark.implicits._
    import graft.plans.DataFusionProtoPhysical
    val src = Seq((1L, "a", 1.5), (2L, "b", -2.5), (3L, null, 0.0))
      .toDF("k", "s", "x")
    val bytes = DataFusionProtoPhysical.emit(src)
    assert(DataFusionProto.fields(bytes).head._1 == 35, "MemoryScanExecNode(35)")
    val node = DataFusionProto.fields(bytes).collectFirst {
      case (35, PBytes(v)) => v }.get
    assert(DataFusionProto.fields(node).exists(_._1 == 1), "partition blob")
    val back = DataFusionProtoPhysical.consume(spark, bytes, _ => None)
    assert(back.columns.toSeq == Seq("k", "s", "x"))
    assert(back.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      src.collect().map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("physical sink nodes (24/28/29): write executed from bytes") {
    import org.apache.spark.sql.functions._
    import graft.plans.DataFusionProtoPhysical
    val src = Tables.load(spark, sfDir, "region")
      .select(col("r_regionkey"), col("r_name"))
    val dir = java.nio.file.Files.createTempDirectory("dfp_sink").toString
    for ((fmt, variant) <- Seq("parquet" -> 29, "csv" -> 28, "json" -> 24)) {
      val bytes = DataFusionProtoPhysical.emitFileSink(
        src, s"$dir/$fmt", fmt)
      assert(DataFusionProto.fields(bytes).head._1 == variant, s"$fmt variant")
      val res = DataFusionProtoPhysical.consume(spark, bytes,
        t => Some(Tables.load(spark, sfDir, t)))
      assert(res.collect().head.getLong(0) == src.count(), s"$fmt count")
      val rd = fmt match {
        case "parquet" => spark.read.parquet(s"$dir/$fmt")
        case "csv" => spark.read.option("header", "true")
          .option("inferSchema", "true").csv(s"$dir/$fmt")
        case "json" => spark.read.json(s"$dir/$fmt")
      }
      assert(rd.count() == src.count(), s"$fmt rows on disk")
    }
  }

  test("physical PlaceholderRow (27), SPM (21), pass-throughs (11/26/32/37)") {
    import graft.plans.DataFusionProtoPhysical
    // PlaceholderRowExecNode: 2 partitions × one all-NULL row
    val w = new DataFusionProto.W
    w.msg(27) { p =>
      p.msg(1)(s => s.msg(1) { f =>
        f.str(1, "c"); f.msg(2)(_.msg(14)(_ => ())); f.bool(3, true)
      })
      p.int64(2, 2L)
    }
    val ph = DataFusionProtoPhysical.consume(spark, w.bytes, _ => None)
    assert(ph.columns.toSeq == Seq("c"))
    assert(ph.count() == 2 && ph.collect().forall(_.isNullAt(0)))

    // SortPreservingMergeExecNode over a nation scan: order + fetch
    val scan = DataFusionProtoPhysical.emit(
      Tables.load(spark, sfDir, "nation"))
    val w2 = new DataFusionProto.W
    w2.msg(21) { m =>
      m.raw(1, scan)
      m.msg(2)(_.msg(10) { sn => // PhysicalExprNode{sort=10}
        sn.msg(1)(_.msg(1) { c => c.str(1, "n_nationkey"); c.int64(2, 0L) })
        sn.bool(2, false) // desc
        sn.bool(3, false)
      })
      m.int64(3, 3L)
    }
    val spm = DataFusionProtoPhysical.consume(spark, w2.bytes, _ => None)
    val keys = spm.collect().map(_.getAs[Number](0).longValue).toSeq
    assert(keys == keys.sorted.reverse && keys.size == 3, s"SPM topk: $keys")

    // CoalesceBatches(11)/Cooperative(32)/Buffer(37) are identity wrappers
    for (variant <- Seq(11, 32, 37)) {
      val w3 = new DataFusionProto.W
      w3.msg(variant)(_.raw(1, scan))
      assert(DataFusionProtoPhysical.consume(spark, w3.bytes, _ => None)
        .count() == Tables.load(spark, sfDir, "nation").count(), s"v$variant")
    }
    // InterleaveExecNode(26): union of inputs
    val w4 = new DataFusionProto.W
    w4.msg(26) { i => i.raw(1, scan); i.raw(1, scan) }
    assert(DataFusionProtoPhysical.consume(spark, w4.bytes, _ => None)
      .count() == 2 * Tables.load(spark, sfDir, "nation").count())
  }

  test("physical SymmetricHashJoin (25) consumes as the bounded join") {
    import org.apache.spark.sql.functions._
    import graft.plans.DataFusionProtoPhysical
    val nation = Tables.load(spark, sfDir, "nation")
    val region = Tables.load(spark, sfDir, "region")
    val w = new DataFusionProto.W
    w.msg(25) { j =>
      j.raw(1, DataFusionProtoPhysical.emit(nation))
      j.raw(2, DataFusionProtoPhysical.emit(region))
      j.msg(3) { on => // JoinOn{left=1, right=2}
        on.msg(1)(_.msg(1) { c => c.str(1, "n_regionkey"); c.int64(2, 2L) })
        on.msg(2)(_.msg(1) { c => c.str(1, "r_regionkey"); c.int64(2, 0L) })
      }
      j.int64(4, 0L) // inner
    }
    val back = DataFusionProtoPhysical.consume(spark, w.bytes, _ => None)
    val expect = nation.join(region,
      col("n_regionkey") === col("r_regionkey"))
    assert(back.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      expect.collect().map(_.toSeq).sortBy(_.toString).toSeq)
  }

  test("physical ScalarSubqueryExecNode (39): subquery evaluated and bound") {
    import org.apache.spark.sql.functions._
    import graft.plans.DataFusionProtoPhysical
    val supplier = Tables.load(spark, sfDir, "supplier")
    // subquery: avg(s_acctbal); input: filter s_acctbal > <scalar>
    val sq = supplier.agg(avg(col("s_acctbal")).as("a"))
    val w = new DataFusionProto.W
    w.msg(39) { n =>
      n.msg(1) { filt => // input: FilterExecNode over the scan
        filt.msg(12) { f =>
          f.raw(1, DataFusionProtoPhysical.emit(supplier))
          f.msg(2)(_.msg(3) { be =>
            be.msg(1)(_.msg(1) { c =>
              c.str(1, "s_acctbal")
              c.int64(2, supplier.columns.indexOf("s_acctbal").toLong)
            })
            be.msg(2)(_.msg(22) { ss => // PhysicalScalarSubqueryExprNode
              ss.msg(1)(_.msg(13)(_ => ())) // Float64
              ss.bool(2, true)
              ss.int64(3, 0L)
            })
            be.str(3, "Gt")
          })
        }
      }
      n.raw(2, DataFusionProtoPhysical.emit(sq))
    }
    val back = DataFusionProtoPhysical.consume(spark, w.bytes, _ => None)
    val avgVal = sq.collect().head.getDouble(0)
    val expect = supplier.filter(col("s_acctbal") > avgVal)
    assert(back.count() == expect.count() && back.count() > 0)
  }

  test("physical ArrowScanExecNode (38) roundtrips through the DSv2 source") {
    import org.apache.spark.sql.functions._
    import graft.plans.DataFusionProtoPhysical
    val dir = java.nio.file.Files.createTempDirectory("dfp_arrow").toString
    val src = Tables.load(spark, sfDir, "region")
      .select(col("r_regionkey").cast("long").as("k"), col("r_name").as("v"))
    graft.sources.ArrowIpcWriter.write(src, s"$dir/data.arrow")
    val scanned = spark.read
      .format(classOf[graft.sources.ArrowIpcTableProvider].getName)
      .load(dir).select(col("k"))
    val bytes = DataFusionProtoPhysical.emit(scanned)
    def findNode(b: Array[Byte], v: Int): Option[Array[Byte]] =
      DataFusionProto.fields(b).headOption.flatMap {
        case (`v`, PBytes(n)) => Some(n)
        case (_, PBytes(node)) => DataFusionProto.fields(node).collectFirst {
          case (1, PBytes(c)) => c }.flatMap(findNode(_, v))
        case _ => None
      }
    assert(findNode(bytes, 38).isDefined, "ArrowScanExecNode(38)")
    val back = DataFusionProtoPhysical.consume(spark, bytes, _ => None)
    assert(back.columns.toSeq == Seq("k"))
    assert(back.collect().map(_.getLong(0)).sorted.toSeq ==
      src.collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("physical Explain (20) and Analyze (23) consume to (plan_type, plan)") {
    import graft.plans.DataFusionProtoPhysical
    val w = new DataFusionProto.W
    w.msg(20) { e =>
      e.msg(2) { sp => sp.msg(1)(_.msg(3)(_ => ())); sp.str(2, "plan text") }
      e.bool(3, false)
    }
    val ex = DataFusionProtoPhysical.consume(spark, w.bytes, _ => None)
    assert(ex.columns.toSeq == Seq("plan_type", "plan"))
    assert(ex.collect().head.getString(1) == "plan text")

    val scan = DataFusionProtoPhysical.emit(Tables.load(spark, sfDir, "region"))
    val w2 = new DataFusionProto.W
    w2.msg(23)(a => a.raw(3, scan))
    val an = DataFusionProtoPhysical.consume(spark, w2.bytes, _ => None)
    assert(an.columns.toSeq == Seq("plan_type", "plan"))
    assert(an.collect().head.getString(0) == "Plan with Metrics")
  }

  test("DDL tail: CreateExternalTable (11) registers the location") {
    import org.apache.spark.sql.functions._
    val bytes = DataFusionProto.emitCreateExternalTable(
      "dfp_ext_nation", s"$sfDir/nation.parquet", "parquet",
      Tables.load(spark, sfDir, "nation").schema)
    assert(DataFusionProto.fields(bytes).head._1 == 11)
    val node = DataFusionProto.fields(bytes).collectFirst {
      case (11, PBytes(v)) => v }.get
    // name rides TableReference at field 9 (field 1 reserved)
    val nm = DataFusionProto.fields(node).collectFirst {
      case (9, PBytes(tr)) => DataFusionProto.fields(tr).collectFirst {
        case (1, PBytes(b)) => DataFusionProto.fields(b).collectFirst {
          case (1, PBytes(t)) => new String(t, "UTF-8") } } }
      .flatten.flatten
    assert(nm.contains("dfp_ext_nation"))
    val res = DataFusionProto.consume(spark, bytes, _ => None)
    assert(res.count() == 0, "DDL returns an empty result set")
    assert(spark.table("dfp_ext_nation").count() ==
      Tables.load(spark, sfDir, "nation").count())
    spark.catalog.dropTempView("dfp_ext_nation")
  }

  test("DDL tail: CreateView (22) + DropView (27) against the session") {
    import org.apache.spark.sql.functions._
    val src = Tables.load(spark, sfDir, "region").select(col("r_name"))
    DataFusionProto.consume(spark,
      DataFusionProto.emitCreateView("dfp_v_tail", src),
      n => Some(Tables.load(spark, sfDir, n)))
    assert(spark.table("dfp_v_tail").count() == src.count())
    DataFusionProto.consume(spark,
      DataFusionProto.emitDropView("dfp_v_tail"), _ => None)
    assert(!spark.catalog.tableExists("dfp_v_tail"))
    // if_exists=false on a missing view is an error
    intercept[IllegalArgumentException] {
      DataFusionProto.consume(spark,
        DataFusionProto.emitDropView("dfp_v_tail", ifExists = false),
        _ => None)
    }
  }

  test("DDL tail: Prepare (26) binds, Explain (12)/Analyze (14) report") {
    import org.apache.spark.sql.functions._
    val src = Tables.load(spark, sfDir, "nation")
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
    DataFusionProto.consume(spark,
      DataFusionProto.emitPrepare("dfp_stmt", src),
      n => Some(Tables.load(spark, sfDir, n)))
    val executed = DataFusionProto.executePrepared("dfp_stmt")
    assert(executed.collect().map(_.toSeq).sortBy(_.toString).toSeq ==
      src.collect().map(_.toSeq).sortBy(_.toString).toSeq)

    val ex = DataFusionProto.consume(spark,
      DataFusionProto.emitExplain(src),
      n => Some(Tables.load(spark, sfDir, n)))
    assert(ex.columns.toSeq == Seq("plan_type", "plan"))
    assert(ex.collect().map(_.getString(0)).toSet ==
      Set("logical_plan", "physical_plan"))

    val an = DataFusionProto.consume(spark,
      DataFusionProto.emitAnalyze(src),
      n => Some(Tables.load(spark, sfDir, n)))
    assert(an.collect().head.getString(0) == "Plan with Metrics")
  }

  test("DDL tail: CreateCatalogSchema (18) / CreateCatalog (20) / EmptyTableScan (34)") {
    DataFusionProto.consume(spark,
      DataFusionProto.emitCreateCatalogSchema("dfp_schema_tail"), _ => None)
    assert(spark.catalog.databaseExists("dfp_schema_tail"))
    spark.sql("DROP DATABASE dfp_schema_tail")
    DataFusionProto.consume(spark,
      DataFusionProto.emitCreateCatalog("dfp_cat_tail"), _ => None)
    assert(spark.catalog.databaseExists("dfp_cat_tail"))
    spark.sql("DROP DATABASE dfp_cat_tail")
    // EmptyTableScanNode: zero rows of the declared schema
    val w = new DataFusionProto.W
    w.msg(34) { n =>
      n.msg(1)(tr => tr.msg(1)(_.str(1, "t")))
      n.msg(2)(s => s.msg(1) { f =>
        f.str(1, "a"); f.msg(2)(_.msg(10)(_ => ())); f.bool(3, true)
      })
    }
    val ets = DataFusionProto.consume(spark, w.bytes, _ => None)
    assert(ets.columns.toSeq == Seq("a") && ets.count() == 0)
  }

  test("ListingTableScanNode: paths + format on the wire resolve without a binding") {
    // hand-crafted reference-shaped node: table_name(14) the receiver
    // does NOT know, paths(2) + ParquetFormat(11) carried on the wire
    val w = new DataFusionProto.W
    w.msg(1) { n =>
      n.str(2, s"$sfDir/region.parquet")
      n.msg(11)(_ => ()) // ParquetFormat
      n.msg(14)(tr => tr.msg(1)(_.str(1, "totally_unknown_table")))
    }
    val back = DataFusionProto.consume(spark, w.bytes, _ => None)
    assert(back.count() == Tables.load(spark, sfDir, "region").count())
  }

  test("EmptyRelationNode (10) and CustomTableScanNode (25) consume") {
    // EmptyRelation: produce_one_row drives 1-vs-0 rows
    val w = new DataFusionProto.W
    w.msg(10)(_.bool(1, true))
    assert(DataFusionProto.consume(spark, w.bytes, _ => None).count() == 1)
    val w0 = new DataFusionProto.W
    w0.msg(10)(_ => ())
    assert(DataFusionProto.consume(spark, w0.bytes, _ => None).count() == 0)
    // CustomTableScan resolves by name; filters + projection apply
    val w2 = new DataFusionProto.W
    w2.msg(25) { n =>
      n.msg(2)(pc => { pc.str(1, "n_name"); pc.str(1, "n_regionkey") })
      n.msg(6)(tr => tr.msg(1)(_.str(1, "nation")))
    }
    val back = DataFusionProto.consume(spark, w2.bytes,
      t => Some(Tables.load(spark, sfDir, t)))
    assert(back.columns.toSeq == Seq("n_name", "n_regionkey"))
    assert(back.count() == Tables.load(spark, sfDir, "nation").count())
  }

  test("literals of every supported type survive the wire") {
    import org.apache.spark.sql.functions._
    val src = Tables.load(spark, sfDir, "region")
      .select(col("r_regionkey"),
        lit(true).as("b"), lit("s").as("s"), lit(7).as("i"),
        lit(8L).as("l"), lit(1.5).as("d"),
        lit(java.sql.Date.valueOf("2020-01-02")).as("dt"))
    val back = DataFusionProto.consume(spark, DataFusionProto.emit(src),
      n => Some(Tables.load(spark, sfDir, n)))
    assert(src.collect().map(_.toSeq).toSeq == back.collect().map(_.toSeq).toSeq)
  }

  // ------------------------------------------------- r13: unnest generality

  private def parquetOf(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("dfp_unnest13").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/t")
    spark.read.parquet(s"$dir/t")
  }

  test("physical UnnestExecNode (30): multi-column zip pads shorter lists") {
    import spark.implicits._
    import graft.plans.DataFusionProtoPhysical
    val src = parquetOf(Seq(
      (1, Seq(1, 2), Seq("x"), (10, "p")),
      (2, Seq(3), Seq.empty[String], (20, "q")),
      (3, Seq(4, 5, 6), Seq("y", "z"), (30, "r"))
    ).toDF("id", "a", "b", "st"))
    val w = new DataFusionProto.W
    w.msg(30) { un =>
      un.raw(1, DataFusionProtoPhysical.emit(src))
      un.msg(3) { lu => lu.int64(1, 1L); lu.int64(2, 1L) }
      un.msg(3) { lu => lu.int64(1, 2L); lu.int64(2, 1L) }
      un.int64(4, 3L) // struct col st → (_1, _2)
      un.msg(5)(_.int64(3, 1L)) // DROP
    }
    val back = DataFusionProtoPhysical.consume(spark, w.bytes, _ => None)
    val got = back.collect().map(r => (r.getInt(0),
      if (r.isNullAt(1)) null else r.get(1),
      if (r.isNullAt(2)) null else r.get(2),
      r.get(3), r.get(4))).sortBy(_.toString)
    assert(got.toSeq == Seq(
      (1, 1, "x", 10, "p"), (1, 2, null, 10, "p"),
      (2, 3, null, 20, "q"),
      (3, 4, "y", 30, "r"), (3, 5, "z", 30, "r"), (3, 6, null, 30, "r")
    ).map(t => (t._1, t._2, t._3, t._4, t._5)).sortBy(_.toString),
      s"zip-to-longest with NULL pad; got ${got.toSeq}")
  }

  test("physical UnnestExecNode (30): depth-2 column zips at level 1") {
    import spark.implicits._
    import graft.plans.DataFusionProtoPhysical
    val src = parquetOf(Seq(
      (1, Seq(Seq(1, 2), Seq(3)), Seq(7, 8))
    ).toDF("id", "c", "d"))
    val w = new DataFusionProto.W
    w.msg(30) { un =>
      un.raw(1, DataFusionProtoPhysical.emit(src))
      un.msg(3) { lu => lu.int64(1, 1L); lu.int64(2, 2L) } // c depth 2
      un.msg(3) { lu => lu.int64(1, 2L); lu.int64(2, 1L) } // d depth 1
      un.msg(5)(_.int64(3, 1L)) // DROP
    }
    val back = DataFusionProtoPhysical.consume(spark, w.bytes, _ => None)
    val got = back.collect().map(r => (r.getInt(0),
      if (r.isNullAt(1)) null else r.get(1),
      if (r.isNullAt(2)) null else r.get(2))).sortBy(_.toString)
    // level 2: ([1,2],[7,8]), ([3],[7,8]); level 1 zip:
    //   [1,2]×[7,8] → (1,7),(2,8); [3]×[7,8] → (3,7),(NULL,8)
    assert(got.toSeq == Seq((1, 1, 7), (1, 2, 8), (1, 3, 7), (1, null, 8))
      .map(t => (t._1, t._2, t._3)).sortBy(_.toString),
      s"depth-2 then zip; got ${got.toSeq}")
  }

  test("physical UnnestExecNode (30): NullHandling variants on one column") {
    import spark.implicits._
    import graft.plans.DataFusionProtoPhysical
    val src = parquetOf(Seq(
      (1, Some(Seq(10))), (2, None), (3, Some(Seq.empty[Int]))
    ).toDF("id", "xs"))
    def run(nh: Long): Seq[(Int, Any)] = {
      val w = new DataFusionProto.W
      w.msg(30) { un =>
        un.raw(1, DataFusionProtoPhysical.emit(src))
        un.msg(3) { lu => lu.int64(1, 1L); lu.int64(2, 1L) }
        if (nh >= 0) un.msg(5)(_.int64(3, nh))
      }
      DataFusionProtoPhysical.consume(spark, w.bytes, _ => None)
        .collect().map(r => (r.getInt(0),
          if (r.isNullAt(1)) null else r.get(1))).toSeq.sortBy(_.toString)
    }
    assert(run(-1L) == Seq((1, 10), (2, null)), "absent options = PRESERVE(0)")
    assert(run(0L) == Seq((1, 10), (2, null)), "PRESERVE: null→1 row, empty drops")
    assert(run(1L) == Seq((1, 10)), "DROP: null and empty both drop")
    assert(run(2L) == Seq((1, 10), (2, null), (3, null)),
      "PRESERVE_AND_EXPAND_EMPTY: empty → one NULL row")
  }

  test("logical UnnestNode (30): multi-column + struct consume from bytes") {
    import spark.implicits._
    val src = parquetOf(Seq(
      (1, Seq(1, 2), Seq("x"), (10, "p")),
      (3, Seq(4, 5, 6), Seq("y", "z"), (30, "r"))
    ).toDF("id", "a", "b", "st"))
    val w = new DataFusionProto.W
    w.msg(30) { un =>
      un.raw(1, DataFusionProto.emit(src))
      un.msg(3) { it => it.int64(1, 1L)
        it.msg(2) { rc => rc.msg(1)(_.str(1, "a")); rc.int64(2, 1L) } }
      un.msg(3) { it => it.int64(1, 2L)
        it.msg(2) { rc => rc.msg(1)(_.str(1, "b")); rc.int64(2, 1L) } }
      un.int64(4, 3L)
      un.msg(7)(_.int64(3, 1L)) // DROP
    }
    val back = DataFusionProto.consume(spark, w.bytes,
      n => if (n == "t") Some(src) else None)
    val got = back.collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == Seq(
      Seq(1, 1, "x", 10, "p"), Seq(1, 2, null, 10, "p"),
      Seq(3, 4, "y", 30, "r"), Seq(3, 5, "z", 30, "r"),
      Seq(3, 6, null, 30, "r")).sortBy(_.toString),
      s"logical multi-unnest; got ${got.toSeq}")
  }

  test("arrow type codec: struct and map roundtrip") {
    import org.apache.spark.sql.types._
    for (t <- Seq(
      StructType(Seq(StructField("x", LongType, true),
        StructField("y", StringType, false))),
      MapType(StringType, IntegerType, true),
      ArrayType(StructType(Seq(StructField("k", IntegerType, true))), true))) {
      val w = new DataFusionProto.W
      DataFusionProto.arrowType(t, w)
      assert(DataFusionProto.consumeType(w.bytes) == t, s"type $t")
    }
  }
}
