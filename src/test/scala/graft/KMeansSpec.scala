package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.functions.VectorFunctions._

/** Distributed Lloyd k-means (Similarity.kmeansCentroids) invariants. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val emb = Tables.load(spark, TestSpark.sfDir, "embeddings").cache()

  /** Mean cosine similarity of every vector to its nearest centroid —
    * the (scale-invariant) spherical k-means objective. */
  private def objective(cents: org.apache.spark.sql.DataFrame): Double = {
    val e = emb.select(col("vec_id").as("nid"),
      col("embedding").cast("array<double>").as("nemb"))
    e.join(broadcast(cents), lit(true))
      .select(col("nid"), (lit(1.0) - cosine_distance(col("nemb"), col("cemb"))).as("sim"))
      .groupBy("nid").agg(max("sim").as("best"))
      .agg(avg("best")).head.getDouble(0)
  }

  test("centroid table has k or fewer rows, full dimensionality") {
    val cents = Similarity.kmeansCentroids(emb, 8, 2)
    val rows = cents.collect()
    assert(rows.length <= 8 && rows.length > 0)
    assert(rows.forall(_.getSeq[Double](1).length == 64))
  }

  test("Lloyd refinement improves the spherical objective over seed centroids") {
    val seed = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").cast("array<double>").as("cemb"))
    val refined = Similarity.kmeansCentroids(emb, 8, 2)
    val before = objective(seed)
    val after = objective(refined)
    assert(after >= before,
      s"k-means objective regressed: seed=$before refined=$after")
  }

  test("iterations are deterministic (same input, same centroids)") {
    val a = Similarity.kmeansCentroids(emb, 4, 2).orderBy("cid").collect().toSeq
    val b = Similarity.kmeansCentroids(emb, 4, 2).orderBy("cid").collect().toSeq
    assert(a == b)
  }

  test("kmeans-backed IVF returns k neighbors per query with sane sims") {
    val cents = Similarity.kmeansCentroids(emb, 8, 2)
    val res = Similarity.ivfKnnWith(emb, emb.filter(col("vec_id") < 5), 3, 2, cents)
      .collect()
    assert(res.length == 15)
    assert(res.forall(r => math.abs(r.getAs[Double]("sim")) <= 1.0 + 1e-9))
  }
}
