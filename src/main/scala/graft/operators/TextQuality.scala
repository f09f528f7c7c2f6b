package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Repetition-based document quality signals — the Gopher-rules family
  * (Rae et al. 2021, "Scaling Language Models", Table A1): fraction of
  * tokens in the most frequent word, fraction of bigrams in the most
  * frequent bigram, distinct-word ratio. High values mark boilerplate and
  * degenerate generations; standard cut lines for corpus filtering.
  *
  * Shape at scale: two explode → map-side-combined count aggregations, one
  * shuffle each, keyed by (doc, term) — never a per-document quadratic
  * in-row scan, so a pathological 1 GB document costs O(tokens), and the
  * per-doc reduction output is 4 numbers. No UDFs; everything stays in
  * codegen until the final join of two tiny per-doc aggregates.
  */
object TextQuality {

  /** Per-doc: token count, top-word fraction, distinct-word ratio,
    * top-bigram fraction. Docs with <2 tokens have no bigrams and drop out
    * (inner join), mirroring the SQL oracle. */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = docs.select(col(idCol), TextFunctions.words(col(textCol)).as("ws"))
    val wordStats = ws
      .select(col(idCol), explode(col("ws")).as("w"))
      .groupBy(idCol, "w").agg(count(lit(1)).as("c"))
      .groupBy(idCol)
      .agg(sum("c").as("n_words"), max("c").as("top_w"),
        count(lit(1)).as("distinct_w"))
    // sequence(1, n-1) flips descending for n<2 and element_at(_, 0) throws,
    // so single-token docs get an explicit empty bigram list (explode drops
    // them — same as the oracle's empty range()).
    val bigrams = when(size(col("ws")) < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(col("ws")) - 1),
        i => concat(element_at(col("ws"), i), lit("_"),
          element_at(col("ws"), i + 1))))
    val bigramStats = ws
      .select(col(idCol), explode(bigrams).as("b"))
      .groupBy(idCol, "b").agg(count(lit(1)).as("c"))
      .groupBy(idCol)
      .agg(sum("c").as("n_bigrams"), max("c").as("top_b"))
    wordStats.join(bigramStats, idCol)
  }
}
