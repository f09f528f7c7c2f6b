package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.queries.Q.r6

/** Similarity search over embedding columns (`array<float>`).
  *
  * Brute-force top-k is the exact baseline: a broadcast of the (small) query
  * set against the full corpus — one scan, no shuffle of the corpus, the
  * cosine kernel fused into codegen (graft.functions.CosineDistance). At
  * 100 TB the corpus side stays partition-parallel; only the query set is
  * broadcast.
  *
  * The LSH path (random-hyperplane signatures) is the scale route: bucket
  * both sides by signature and search within buckets only — candidate
  * generation is a hash join, never all-pairs.
  */
object Similarity {

  /** Per-partition top-k pre-reduction: local sort (no shuffle), then a
    * streaming pass keeping the first k rows per key — so the global rank's
    * shuffle carries ≤ k×partitions rows per key instead of every scored
    * candidate. Any global top-k under the same total order is a subset of
    * the union of per-partition top-k's, so results are unchanged.
    * Consecutive rows equal on (key, dedupCols) are skipped so duplicated
    * candidates (IVF/LSH multi-probe) cannot crowd distinct ones out of the
    * local k. */
  private[graft] def localTopKPerKey(df: DataFrame, key: String,
      orderBy: Seq[org.apache.spark.sql.Column], k: Int,
      dedupCols: Seq[String] = Nil): DataFrame = {
    val sortCols = col(key) +: (orderBy ++ dedupCols.map(col))
    val sorted = df.sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema
    val keyIdx = schema.fieldIndex(key)
    val dedupIdx = dedupCols.map(schema.fieldIndex)
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(schema)
    sorted.mapPartitions { it =>
      var curKey: Any = null
      var prevDedup: Seq[Any] = null
      var started = false
      var n = 0
      it.filter { r =>
        val kv = r.get(keyIdx)
        if (!started || kv != curKey) { started = true; curKey = kv; n = 0; prevDedup = null }
        val dd = if (dedupIdx.isEmpty) null else dedupIdx.map(r.get)
        val isDup = dd != null && dd == prevDedup
        prevDedup = dd
        if (isDup) false
        else { n += 1; n <= k }
      }
    }
  }

  /** Exact top-k cosine neighbors for each query row.
    * Ties are broken deterministically on (rounded sim desc, neighbor id).
    *
    * The rank-filter form is written so Spark's own WindowGroupLimit
    * pushdown plans it: a PARTIAL WindowGroupLimit(k) runs on each scan
    * partition BEFORE the exchange, so the shuffle carries at most
    * k×partitions rows per query — the same pre-reduction the custom
    * `localTopKPerKey` does, but as a native physical operator in the
    * codegen pipeline. `localTopKPerKey` remains for the multi-probe
    * callers that additionally need consecutive-duplicate suppression
    * (IVF/LSH), which WindowGroupLimit has no hook for. */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("nemb"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val sim = (lit(1.0) - cosine_distance(col("qemb"), col("nemb"))).as("sim")
    val ord = Seq(r6(col("sim")).desc, col("nid").asc)
    val w = Window.partitionBy(col("qid")).orderBy(ord: _*)
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), sim)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Scalar int8 quantization — the 4× memory/IO lever for a 100 TB
    * embedding store (a 1536-dim float corpus drops from 6 KB to 1.5 KB
    * per row; scan, shuffle and cache all shrink with it). Per-vector
    * max-abs symmetric grid: q = round(127·x/s). Everything is plain
    * codegen column math (transform / zip_with / aggregate — no UDF). */
  def quantizeInt8(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val s = greatest(array_max(transform(emb, x => abs(x))), lit(1e-12f))
    struct(
      transform(emb, x => round(x / s * 127).cast("tinyint")).as("q"),
      s.cast("float").as("scale"))
  }

  /** Dot product over two quantized vectors: int32 accumulation, one
    * rescale at the end. */
  def int8Dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(
      zip_with(a.getField("q"), b.getField("q"),
        (x, y) => x.cast("int") * y.cast("int")),
      lit(0), (acc, x) => acc + x).cast("double") *
      a.getField("scale") * b.getField("scale") / lit(127.0 * 127.0)

  /** L2 norm of a quantized vector (for cosine from int8 dot). */
  def int8Norm(a: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sqrt(aggregate(
      transform(a.getField("q"), x => x.cast("int") * x.cast("int")),
      lit(0), (acc, x) => acc + x).cast("double")) *
      a.getField("scale") / lit(127.0)

  /** Top-k cosine neighbors computed ENTIRELY in the quantized domain —
    * same plan shape as [[bruteForceKnn]] (query broadcast, corpus never
    * shuffled, partial WindowGroupLimit), but the corpus side carries
    * int8 payloads. */
  def quantizedKnn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("nid"),
      quantizeInt8(col("embedding")).as("nq"))
    val q = queries.select(col("vec_id").as("qid"),
      quantizeInt8(col("embedding")).as("qq"))
    val sim = (int8Dot(col("qq"), col("nq")) /
      (int8Norm(col("qq")) * int8Norm(col("nq")))).as("sim")
    val w = Window.partitionBy(col("qid"))
      .orderBy(r6(col("sim")).desc, col("nid").asc)
    c.join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), sim)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplanes (seeded), as literal arrays —
    * broadcast to every task, no shuffle. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)((rnd.nextGaussian()).toFloat))
  }

  /** Random-hyperplane LSH signature: one sign bit per plane. */
  def lshSignature(emb: org.apache.spark.sql.Column, planes: Seq[Array[Float]]): org.apache.spark.sql.Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(inner_product(emb, typedlit(p.toSeq)) >= 0, 1L << i).otherwise(0L)
    }.reduce(_ + _)

  /** IVF-style approximate top-k: the first `nCentroids` corpus vectors act
    * as deterministic coarse centroids (at scale these would come from a
    * k-means job); every corpus vector is assigned to its nearest centroid
    * (one broadcast join — the corpus is never shuffled), queries probe the
    * `nProbe` nearest centroid buckets, and exact cosine ranks within the
    * probed buckets. Fully deterministic, so the DuckDB oracle reproduces
    * it end-to-end. */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int, nProbe: Int): DataFrame =
    ivfKnnWith(corpus, queries, k, nProbe,
      corpus.filter(col("vec_id") < nCentroids)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb")))

  /** IVF search against an externally supplied centroid table
    * (cid, cemb: array<float|double>) — e.g. from [[kmeansCentroids]]. */
  def ivfKnnWith(corpus: DataFrame, queries: DataFrame, k: Int,
      nProbe: Int, cents: DataFrame): DataFrame = {
    // The broadcast join expands each (unique-id) row against all centroids
    // IN PLACE, so every id's candidate rows live in one partition and the
    // per-partition top-k is already exact — no shuffle, where a window
    // rank would shuffle |corpus|×|centroids| rows.
    def assign(df: DataFrame, idCol: String, embCol: String, keep: Int) = {
      val ord = Seq(
        r6(lit(1.0) - cosine_distance(col(embCol), col("cemb"))).desc, col("cid").asc)
      localTopKPerKey(df.join(broadcast(cents), col(idCol).isNotNull), idCol, ord, keep)
        .select(col(idCol), col(embCol), col("cid"))
    }
    val corpusB = assign(corpus.select(col("vec_id").as("nid"), col("embedding").as("nemb")),
      "nid", "nemb", 1)
    val queryB = assign(queries.select(col("vec_id").as("qid"), col("embedding").as("qemb")),
      "qid", "qemb", nProbe)
    val sim = (lit(1.0) - cosine_distance(col("qemb"), col("nemb"))).as("sim")
    val ord = Seq(r6(col("sim")).desc, col("nid").asc)
    val w = Window.partitionBy(col("qid")).orderBy(ord: _*)
    val scored = corpusB.join(broadcast(queryB), Seq("cid")).where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), sim)
    localTopKPerKey(scored, "qid", ord, k, dedupCols = Seq("nid"))
      .dropDuplicates("qid", "nid")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Distributed Lloyd k-means for IVF coarse centroids, cosine-assigned
    * ("spherical": cosine is scale-invariant, so the unnormalized cluster
    * mean serves as the direction estimate).
    *
    * Each round is two bounded shuffles: (1) assignment — centroids broadcast
    * against the corpus, nearest-by-cosine picked per-partition with no
    * shuffle of the corpus; (2) update — posexplode to (cluster, dim) cells
    * and a map-side-combined avg, so the shuffle carries ≤ k×dim×partitions
    * rows regardless of corpus size. At 100 TB this is the canonical
    * broadcast-model/aggregate-update iteration loop.
    *
    * Every updated component is rounded with the ε-shifted r6 (Q.rnd), which
    * makes the whole refinement reproducible bit-for-bit in the DuckDB
    * oracle: rounding absorbs the engines' summation-order drift, and all
    * downstream distances are pure IEEE arithmetic on equal inputs.
    * Deterministic seeding: the first k corpus vectors (a k-means++ sweep is
    * a sampling detail, not a structural one). Empty clusters drop out, same
    * on both engines. */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int): DataFrame = {
    val e = corpus.select(col("vec_id").as("nid"),
      col("embedding").cast("array<double>").as("nemb"))
    var cents = e.filter(col("nid") < k).select(col("nid").as("cid"), col("nemb").as("cemb"))
    for (_ <- 0 until iters) {
      val ord = Seq(r6(lit(1.0) - cosine_distance(col("nemb"), col("cemb"))).desc, col("cid").asc)
      val assigned = localTopKPerKey(e.join(broadcast(cents), col("nid").isNotNull), "nid", ord, 1)
      cents = assigned
        .select(col("cid"), posexplode(col("nemb")).as(Seq("i", "v")))
        .groupBy("cid", "i").agg(r6(avg(col("v"))).as("m"))
        .groupBy("cid")
        .agg(sort_array(collect_list(struct(col("i"), col("m")))).as("pairs"))
        .select(col("cid"), expr("transform(pairs, p -> p.m)").as("cemb"))
    }
    cents
  }

  /** Approximate top-k with OR-amplification: `nTables` independent
    * hyperplane signatures; candidates = union of same-bucket matches across
    * tables (a hash join per table, exploded into one join), then exact
    * cosine ranking within the candidate set. More tables → higher recall,
    * linearly more candidate-generation work — never all-pairs. */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int, dim: Int,
      nTables: Int = 4): DataFrame = {
    val tables = (0 until nTables).map(t => hyperplanes(nPlanes, dim, seed = 42L + 1000 * t))
    def sigs(emb: org.apache.spark.sql.Column) =
      array(tables.map(p => lshSignature(emb, p)): _*)
    val c = corpus.select(col("vec_id").as("nid"), col("embedding").as("nemb"),
      posexplode(sigs(col("embedding"))).as(Seq("tbl", "sig")))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qemb"),
      posexplode(sigs(col("embedding"))).as(Seq("tbl", "sig")))
    val sim = (lit(1.0) - cosine_distance(col("qemb"), col("nemb"))).as("sim")
    val ord = Seq(r6(col("sim")).desc, col("nid").asc)
    val w = Window.partitionBy(col("qid")).orderBy(ord: _*)
    val scored = c.join(broadcast(q), Seq("tbl", "sig"))
      .where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), sim)
    localTopKPerKey(scored, "qid", ord, k, dedupCols = Seq("nid"))
      .dropDuplicates("qid", "nid")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Semantic deduplication, SemDeDup-style (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space coarsely, then within
    * each cluster drop every vector whose cosine similarity to a
    * LOWER-vec_id cluster member reaches `tau` (min-id member of each
    * near-dup group is the canonical survivor — same convention as
    * [[graft.operators.Dedup]]).
    *
    * Scale shape: centroid assignment is a broadcast against the corpus
    * (the corpus is never shuffled for it — same kernel as [[ivfKnnWith]]);
    * the pairwise cosine step is an equi-join on cluster id, quadratic only
    * WITHIN a cluster. That quadratic is the SemDeDup design point: k is
    * chosen so clusters stay small (the paper uses k≈11k for 100M docs —
    * cluster size tracks N/k, so cost is N²/k and k scales with N).
    *
    * Deterministic end-to-end (first-n centroids, ε-rounded tie-broken
    * assignment, ε-rounded similarities), so a SQL oracle replays it. */
  def semanticDedup(corpus: DataFrame, nCentroids: Int, tau: Double): DataFrame = {
    val cents = corpus.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val e = corpus.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val ord = Seq(r6(lit(1.0) - cosine_distance(col("emb"), col("cemb"))).desc, col("cid").asc)
    val assigned = localTopKPerKey(e.join(broadcast(cents), col("id").isNotNull), "id", ord, 1)
      .select(col("cid"), col("id"), col("emb"))
    val lower = assigned.select(col("cid"), col("id").as("lid"), col("emb").as("lemb"))
    val maxSim = assigned.join(lower, Seq("cid")).where(col("lid") < col("id"))
      .groupBy(col("cid"), col("id"))
      .agg(max(r6(lit(1.0) - cosine_distance(col("emb"), col("lemb")))).as("max_sim_lower"))
    assigned.join(maxSim, Seq("cid", "id"), "left")
      .select(col("cid"), col("id"),
        coalesce(col("max_sim_lower"), lit(-1.0)).as("max_sim_lower"),
        (coalesce(col("max_sim_lower"), lit(-1.0)) >= tau).as("dropped"))
  }
}
