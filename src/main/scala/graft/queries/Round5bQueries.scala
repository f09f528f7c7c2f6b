package graft.queries

import org.apache.spark.sql.functions._

import Q._

/** Round-5 continuation: multi-dimensional clustering layout and mergeable
  * sketch aggregates, all under the driver's DuckDB differential.
  */
object Round5bQueries {

  private def scratch(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_scratch/$name"

  val queries: Map[String, QueryFn] = Map(
    // Z-order clustered rewrite under the oracle gate: lineitem re-laid
    // out on the Morton key of (l_partkey, l_suppkey), read back through
    // the clustered files — the aggregate must be byte-identical to the
    // original table's. ZOrderSpec asserts the layout's payoff (row-group
    // skipping on BOTH dimensions); this entry pins that the rewrite
    // loses nothing. Reference analog: the row-group pruning machinery
    // (pruning/src/pruning_predicate.rs) that such a layout feeds.
    "layout_zorder" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
          col("l_extendedprice"))
      val path = scratch("lineitem_zorder")
      graft.operators.ZOrder.writeClustered(li, path,
        Seq("l_partkey", "l_suppkey"), numFiles = 4)
      s.read.parquet(path)
        .groupBy((col("l_partkey") % 10).cast("long").as("pk_mod"))
        .agg(count(lit(1)).as("n"),
          r2(sum(col("l_extendedprice"))).as("amt"),
          sum(col("l_quantity")).cast("long").as("qty"))
        .orderBy("pk_mod")
    },

    // Mergeable HLL sketches (Spark's Apache DataSketches HllSketch
    // surface; the reference's approx_distinct is its own HyperLogLog —
    // functions-aggregate/src/approx_distinct.rs, hyperloglog.rs). The
    // 100 TB pattern under test: per-group sketches built in one partial
    // pass, then UNIONED across groups — a re-aggregation that never
    // touches the raw data again. Contract oracle: the merged estimate
    // must agree with the exact global distinct within the published
    // bound (~1.04/sqrt(2^12) per-sketch, 5% with slack), emitted as an
    // in-query boolean next to the exact count.
    "agg_hll_merge" -> { (s, dir) =>
      val od = t(s, dir, "orders")
      val perGroup = od.groupBy("o_orderpriority")
        .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
      val merged = perGroup
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      val exact = od.agg(countDistinct(col("o_custkey")).as("n_exact"))
      merged.crossJoin(exact)
        .select(col("n_exact").cast("long").as("n_exact"),
          (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("within_bound"))
    },

    // Count-min sketch frequency estimation (Spark's builtin
    // count_min_sketch aggregate; no reference equivalent — the
    // Misra-Gries freqItems entry covers the heavy-hitter side). The
    // sketch's one-sided guarantee IS the oracle contract: for every
    // probed key, estimate >= exact, and estimate <= exact + eps*N.
    // Both checks evaluate in-plan against exact per-key counts; the
    // exact counts are the engine-comparable output.
    "agg_countmin" -> { (s, dir) =>
      // registered by name (not an anonymous UDF object) so the plan
      // survives the unparser sweep: `cms_estimate(...)` re-resolves when
      // the unparsed SQL re-executes on the session
      s.udf.register("cms_estimate", (b: Array[Byte], key: String) =>
        org.apache.spark.util.sketch.CountMinSketch.readFrom(b)
          .estimateCount(key))
      val od = t(s, dir, "orders")
      val sk = od.agg(
        expr("count_min_sketch(o_orderpriority, 0.001d, 0.99d, 42)").as("cms"),
        count(lit(1)).as("n"))
      val exact = od.groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      exact.crossJoin(sk)
        .select(col("o_orderpriority"), col("cnt"),
          (expr("cms_estimate(cms, o_orderpriority)") >= col("cnt"))
            .as("no_undercount"),
          (expr("cms_estimate(cms, o_orderpriority)") <=
            col("cnt") + ceil(col("n") * 0.001)).as("within_eps"))
        .orderBy("o_orderpriority")
    },

    // Cross-document repeated n-gram detection (exact substring-level
    // dedup — the class document-level dedup misses; see
    // Dedup.ngramWindows). Exact-string windows here so the DuckDB
    // differential is collision-free; the operator's hashed mode is the
    // 100 TB path (8-byte shuffle keys).
    "text_repeated_ngrams" -> { (s, dir) =>
      // SINGLE shingling pass (r8): the old two-consumer shape (repeated-
      // set aggregate + affected-docs join over the same wd) never
      // actually reused one exchange — column pruning made the two
      // exchange children differ (partial_count vs distinct), so the
      // explode ran twice. A window count of distinct docs per win plus
      // ONE conditional aggregation computes all three outputs from one
      // pass: Generate → (win,doc_id) agg → win-partitioned window →
      // global agg. Measured sf0.1 min: 1.39 → 0.97 s.
      import org.apache.spark.sql.expressions.Window
      val wd = graft.operators.Dedup.ngramWindows(
          t(s, dir, "documents"), "doc_id", "text", n = 20)
        .groupBy("win", "doc_id").agg(count(lit(1)).as("occ"))
      val wd2 = wd.withColumn("nd",
        count(lit(1)).over(Window.partitionBy("win")))
      wd2.agg(
        countDistinct(when(col("nd") > 1, col("win"))).as("n_rep_windows"),
        coalesce(sum(when(col("nd") > 1, col("occ"))), lit(0L))
          .cast("long").as("n_hits"),
        countDistinct(when(col("nd") > 1, col("doc_id"))).as("n_docs_affected"))
    },

    // The production (100 TB) mode of the same detection: 8-byte hashed
    // window keys in the shuffle instead of n-token strings. Contract
    // oracle (VERDICT r5 next-step #7): all three counts must equal the
    // exact-string mode's — the DuckDB oracle is the exact-mode SQL, so a
    // hash collision or a hashed-path bug breaks the differential.
    "text_repeated_ngrams_hashed" -> { (s, dir) =>
      // same one-pass shape as the exact mode; the shuffle carries 8-byte
      // hashed window keys (the 100 TB path)
      import org.apache.spark.sql.expressions.Window
      val wd = graft.operators.Dedup.ngramWindows(
          t(s, dir, "documents"), "doc_id", "text", n = 20, hashed = true)
        .groupBy("win", "doc_id").agg(count(lit(1)).as("occ"))
      val wd2 = wd.withColumn("nd",
        count(lit(1)).over(Window.partitionBy("win")))
      wd2.agg(
        countDistinct(when(col("nd") > 1, col("win"))).as("n_rep_windows"),
        coalesce(sum(when(col("nd") > 1, col("occ"))), lit(0L))
          .cast("long").as("n_hits"),
        countDistinct(when(col("nd") > 1, col("doc_id"))).as("n_docs_affected"))
    },

    // The span-removal transform completing the substring-dedup story
    // (all-but-one cut, Lee et al.): contract oracle — every doc survives,
    // token totals are exact on both engines, some tokens were actually
    // removed, and re-running detection on the CLEANED corpus finds no
    // cross-document repeated window left.
    "text_cut_spans" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      // localCheckpoint: BOTH consumers below (the totals aggregate and
      // the re-detection sweep) need the full cleaned corpus; without the
      // checkpoint the whole cut pipeline (two shingling passes + island
      // merge) executes twice — measured 3.4 -> 2.3 s at sf0.1. Executor-
      // stored, driver never holds rows; the same pattern the label-
      // propagation loop uses.
      val cleaned = graft.operators.Dedup
        .cutRepeatedSpans(docs, "doc_id", "text", 20)
        .localCheckpoint()
      val still = graft.operators.Dedup
        .ngramWindows(cleaned, "doc_id", "text", 20)
        .groupBy("win").agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1)
      cleaned.agg(count(lit(1)).as("n_docs"),
          sum("n_tokens_before").as("tokens_before"),
          (sum("n_tokens_before") > sum("n_tokens_after")).as("some_removed"))
        .crossJoin(still.agg((count(lit(1)) === 0).as("no_crossdup_left")))
    },

    // Int8-quantized KNN (Similarity.quantizeInt8): the whole ranking runs
    // in the quantized domain; contract oracle — recall@5 vs the exact
    // float cosine top-5 must clear 0.8 (measured headroom: max-abs int8
    // keeps cosine within ~1e-2, recall is typically 1.0).
    "embed_knn_quantized" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 10)
      val exact = graft.operators.Similarity.bruteForceKnn(e, q, 5)
        .select(col("qid"), col("nid"))
      val approx = graft.operators.Similarity.quantizedKnn(e, q, 5)
        .select(col("qid").as("aqid"), col("nid").as("anid"))
      val hits = exact.join(approx,
        col("qid") === col("aqid") && col("nid") === col("anid"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      exact.agg(count(lit(1)).as("n_exact")).crossJoin(hits)
        .select(col("n_exact"),
          (col("n_hit").cast("double") / col("n_exact") >= 0.8).as("recall_ok"))
    },

    // The text-pipeline surface through pure SQL (TextFunctions.register
    // on DFContext): a SQL-only user runs the corpus operators with no
    // Column API — the registered names resolve to the same codegen
    // expressions the Column path uses, proven by the shared oracle.
    "text_sql_surface" -> { (s, dir) =>
      fixtureViews(s, dir)
      val ctx = graft.DFContext(s)
      ctx.sql(
        """SELECT lang_id(text) AS lang, count(*) AS n,
          |  CAST(SUM(token_count(text)) AS BIGINT) AS toks
          |FROM documents GROUP BY lang_id(text) ORDER BY lang""".stripMargin)
    },

    // Statistics-answered aggregates (reference: optimizer/src/
    // aggregate_statistics.rs — COUNT/MIN/MAX read from stats, zero data
    // pages): Spark's DSv2 parquet reader pushes the whole aggregation
    // into the scan (PushedAggregation in the plan — asserted by
    // AggPushdownSpec); at 100 TB this answers from footers alone. The
    // oracle pins the values through that path.
    "agg_pushdown_stats" -> { (s, dir) =>
      val ss = aggPushdownSession(s)
      graft.Tables.load(ss, dir, "lineitem")
        .agg(count(lit(1)).as("n"),
          min(col("l_orderkey")).as("min_ok"),
          max(col("l_orderkey")).as("max_ok"),
          min(col("l_shipdate")).cast("date").cast("string").as("min_ship"),
          max(col("l_shipdate")).cast("date").cast("string").as("max_ship"))
    }
  )

  /** Child session with the DSv2 parquet path + aggregate pushdown on
    * (v1 FileFormat has no aggregate-pushdown hook). */
  private val apSessions = new java.util.WeakHashMap[
    org.apache.spark.sql.SparkSession, org.apache.spark.sql.SparkSession]()
  def aggPushdownSession(s: org.apache.spark.sql.SparkSession): org.apache.spark.sql.SparkSession =
    apSessions.synchronized {
      val existing = apSessions.get(s)
      if (existing != null) existing
      else {
        val ss = s.newSession()
        ss.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        ss.conf.set("spark.sql.sources.useV1SourceList", "")
        apSessions.put(s, ss)
        ss
      }
    }

  val oracleSql: Map[String, String] = Map(
    "text_sql_surface" ->
      """WITH b AS (SELECT doc_id, text,
        |   list_filter(string_split(lower(text), ' '), w -> w != '') AS ws FROM documents),
        |c AS (SELECT doc_id, text,
        |  len(list_filter(ws, w -> list_contains(['the','and','of','is','a','to','in'], w))) AS en,
        |  len(list_filter(ws, w -> list_contains(['der','die','und','das','ist','ein'], w))) AS de,
        |  len(list_filter(ws, w -> list_contains(['le','la','et','les','des','un'], w))) AS fr,
        |  len(list_filter(ws, w -> list_contains(['el','los','y','una','que','en'], w))) AS es
        | FROM b),
        |p AS (SELECT CASE
        |    WHEN greatest(en, de, fr, es) = 0 THEN 'und'
        |    WHEN en = greatest(en, de, fr, es) THEN 'en'
        |    WHEN de = greatest(en, de, fr, es) THEN 'de'
        |    WHEN fr = greatest(en, de, fr, es) THEN 'fr'
        |    ELSE 'es' END AS lang,
        |  len(list_filter(string_split(text, ' '), w -> w != '')) AS tc
        | FROM c)
        |SELECT lang, count(*) AS n, CAST(SUM(tc) AS BIGINT) AS toks
        |FROM p GROUP BY lang ORDER BY lang""".stripMargin,

    "agg_pushdown_stats" ->
      """SELECT count(*) AS n,
        |  min(l_orderkey) AS min_ok, max(l_orderkey) AS max_ok,
        |  CAST(CAST(min(l_shipdate) AS DATE) AS VARCHAR) AS min_ship,
        |  CAST(CAST(max(l_shipdate) AS DATE) AS VARCHAR) AS max_ship
        |FROM lineitem""".stripMargin,

    "embed_knn_quantized" ->
      """SELECT CAST(5 * count(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "text_cut_spans" ->
      """WITH toks AS (
        |  SELECT list_filter(string_split(text, ' '), x -> x != '') AS a
        |  FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(len(a)) AS BIGINT) AS tokens_before,
        |       TRUE AS some_removed, TRUE AS no_crossdup_left
        |FROM toks""".stripMargin,

    "text_repeated_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS a
        |  FROM documents),
        |w AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(a) - 20 + 2),
        |                          i -> array_to_string(a[i : i + 19], ' '))) AS win
        |  FROM toks WHERE len(a) >= 20),
        |rep AS (SELECT win FROM w GROUP BY win HAVING count(DISTINCT doc_id) > 1)
        |SELECT (SELECT count(*) FROM rep) AS n_rep_windows,
        |       (SELECT count(DISTINCT doc_id) FROM w JOIN rep USING (win)) AS n_docs_affected,
        |       (SELECT count(*) FROM w JOIN rep USING (win)) AS n_hits""".stripMargin,

    // hashed production mode must reproduce the exact-mode counts
    "text_repeated_ngrams_hashed" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS a
        |  FROM documents),
        |w AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(a) - 20 + 2),
        |                          i -> array_to_string(a[i : i + 19], ' '))) AS win
        |  FROM toks WHERE len(a) >= 20),
        |rep AS (SELECT win FROM w GROUP BY win HAVING count(DISTINCT doc_id) > 1)
        |SELECT (SELECT count(*) FROM rep) AS n_rep_windows,
        |       (SELECT count(DISTINCT doc_id) FROM w JOIN rep USING (win)) AS n_docs_affected,
        |       (SELECT count(*) FROM w JOIN rep USING (win)) AS n_hits""".stripMargin,

    "layout_zorder" ->
      """SELECT CAST(l_partkey % 10 AS BIGINT) AS pk_mod, count(*) AS n,
        |  CAST(FLOOR((SUM(l_extendedprice) + 1.37e-4) * 100 + 0.5) AS DOUBLE) / 100 AS amt,
        |  CAST(SUM(l_quantity) AS BIGINT) AS qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "agg_hll_merge" ->
      """SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact,
        |  TRUE AS within_bound FROM orders""".stripMargin,

    "agg_countmin" ->
      """SELECT o_orderpriority, COUNT(*) AS cnt,
        |  TRUE AS no_undercount, TRUE AS within_eps
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
