package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** r14 same-JVM interleaved A/B for dedup_ngram_topk's pair kernel:
  *   A = r13 shape: round-robin spread, shingle pipeline computed on BOTH
  *       self-join sides (no materialization), single-cell join;
  *   B = shipped r14 shape (SparkEntry): one eager localCheckpoint of the
  *       shingled rows + count-gated triangle split;
  *   C = B with a LAZY localCheckpoint (first consumer job materializes);
  *   D = eager checkpoint, NO triangle split (isolates the salting cost).
  * Usage: runMain graft.tools.NgramLab [docsDir]
  */
object NgramLab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def docs: DataFrame = graft.Tables.load(spark, dir, "documents")
    def band: Column = concat_ws("|", col("source"), col("lang"),
      graft.operators.Dedup.lengthBand(col("text")))
    def topk(pairs: DataFrame): DataFrame = {
      def r4(c: Column) = (floor((c + lit(1.37e-6)) * 10000 + 0.5).cast("double") / 10000)
      def r6(c: Column) = (floor((c + lit(1.37e-8)) * 1000000 + 0.5).cast("double") / 1000000)
      pairs.select(col("ida"), col("idb"), r4(col("jaccard")).as("jaccard"))
        .orderBy(r6(col("jaccard")).desc, col("ida"), col("idb")).limit(20)
    }
    def shingled(d: DataFrame): DataFrame =
      d.select(col("doc_id"), band.as("bucket"), col("text"))
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), col("bucket"),
          array_distinct(transform(TextFunctions.shingles3(col("text")), xxhash64(_))).as("sh"))

    // A: r13 shape — both sides recompute the pipeline
    def a(): DataFrame = {
      val prepped = docs.repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), band.as("bucket"),
          array_distinct(transform(TextFunctions.shingles3(col("text")), xxhash64(_))).as("sh"))
      val l = prepped.select(col("bucket"), col("doc_id").as("ida"), col("sh").as("sha"))
      val r = prepped.select(col("bucket"), col("doc_id").as("idb"), col("sh").as("shb"))
      val inter = size(array_intersect(col("sha"), col("shb"))).cast("double")
      topk(l.join(r, Seq("bucket")).where(col("ida") < col("idb"))
        .select(col("ida"), col("idb"),
          (inter / (size(col("sha")) + size(col("shb")) - inter)).as("jaccard")))
    }
    // B: shipped r14 shape
    def b(): DataFrame =
      graft.SparkEntry.queries("dedup_ngram_topk")(spark, dir)
    // C/D: checkpoint-variant forms
    def cd(eager: Boolean, salt: Boolean): DataFrame = {
      val prepped = shingled(docs).localCheckpoint(eager)
      val (l, r) =
        if (!salt) (prepped.select(col("bucket"), col("doc_id").as("ida"), col("sh").as("sha")),
                    prepped.select(col("bucket"), col("doc_id").as("idb"), col("sh").as("shb")))
        else {
          val counts = prepped.groupBy("bucket").agg(count(lit(1)).as("_bn"))
          val cells = prepped.join(broadcast(counts), "bucket")
            .withColumn("_k", least(ceil(col("_bn").cast("double") / 4096), lit(64L)).cast("int"))
            .withColumn("_s", pmod(xxhash64(col("doc_id")), col("_k")).cast("int"))
            .select(col("doc_id"), col("bucket"), col("sh"), col("_s"),
              explode(expr("transform(sequence(0, _k - 1), " +
                "j -> named_struct('ci', least(_s, j), 'cj', greatest(_s, j)))")).as("_cell"))
          (cells.select(col("bucket"), col("_cell"), col("doc_id").as("ida"), col("_s").as("_sa"), col("sh").as("sha")),
           cells.select(col("bucket"), col("_cell"), col("doc_id").as("idb"), col("_s").as("_sb"), col("sh").as("shb")))
        }
      val inter = size(array_intersect(col("sha"), col("shb"))).cast("double")
      val joined =
        if (!salt) l.join(r, Seq("bucket")).where(col("ida") < col("idb"))
        else l.join(r, Seq("bucket", "_cell")).where(col("ida") < col("idb") &&
          least(col("_sa"), col("_sb")) === col("_cell.ci") &&
          greatest(col("_sa"), col("_sb")) === col("_cell.cj"))
      topk(joined.select(col("ida"), col("idb"),
        (inter / (size(col("sha")) + size(col("shb")) - inter)).as("jaccard")))
    }

    val variants = Seq(
      "A r13 two-pass" -> (a _),
      "B shipped ckpt+salt" -> (b _),
      "C lazy-ckpt+salt" -> (() => cd(eager = false, salt = true)),
      "D eager-ckpt nosalt" -> (() => cd(eager = true, salt = false)),
      "E lazy-ckpt nosalt" -> (() => cd(eager = false, salt = false)))
    variants.foreach(_._2().write.mode("overwrite").format("noop").save())
    val times = collection.mutable.Map[String, Vector[Double]]()
    for (_ <- 1 to 8; (tag, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.mode("overwrite").format("noop").save()
      times(tag) = times.getOrElse(tag, Vector.empty) :+
        (System.nanoTime() - t0) / 1e9
    }
    variants.foreach { case (tag, _) =>
      val ts = times(tag)
      println(f"$tag%-20s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val ref = a().collect().map(_.toString).toSeq
    Seq("B" -> (b _), "C" -> (() => cd(false, true)), "D" -> (() => cd(true, false))).foreach {
      case (t, f) => println(s"equal $t=" + (f().collect().map(_.toString).toSeq == ref))
    }
    spark.stop()
  }
}
