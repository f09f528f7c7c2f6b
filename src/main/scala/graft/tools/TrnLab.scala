package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** r14 same-JVM interleaved A/B for text_repeated_ngrams' window build:
  *   A = r13 form: transform(sequence, i -> concat_ws(' ', slice(a,i+1,n)));
  *   B = r14 form: NgramWindows zero-copy kernel (shipped, via SparkEntry).
  * Usage: runMain graft.tools.TrnLab [docsDir]
  */
object TrnLab {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val n = 20

    def a(): DataFrame = {
      val docs = graft.Tables.load(spark, dir, "documents")
      val target = spark.sparkContext.defaultParallelism
      val spread = if (docs.rdd.getNumPartitions >= target) docs
        else docs.repartition(target, col("doc_id"))
      val toks = spread.select(col("doc_id"),
        graft.functions.TextFunctions.words(col("text")).as("a"))
        .filter(size(col("a")) >= n)
      val wd = toks.select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, size(a) - $n), i -> concat_ws(' ', slice(a, i + 1, $n)))"))
          .as(Seq("pos", "win")))
        .groupBy("win", "doc_id").agg(count(lit(1)).as("occ"))
      val wd2 = wd.withColumn("nd", count(lit(1)).over(Window.partitionBy("win")))
      wd2.agg(
        countDistinct(when(col("nd") > 1, col("win"))).as("n_rep_windows"),
        coalesce(sum(when(col("nd") > 1, col("occ"))), lit(0L))
          .cast("long").as("n_hits"),
        countDistinct(when(col("nd") > 1, col("doc_id"))).as("n_docs_affected"))
    }
    def b(): DataFrame =
      graft.SparkEntry.queries("text_repeated_ngrams")(spark, dir)

    val variants = Seq("trn A slice-concat" -> (a _), "trn B kernel" -> (b _))
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
    println("trn equal: " + (a().collect().map(_.toString).toSeq ==
      b().collect().map(_.toString).toSeq))
    spark.stop()
  }
}
