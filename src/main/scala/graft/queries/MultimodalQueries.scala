package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import Q._

/** Multimodal pipeline queries: binary payload + typed metadata through
  * decode / feature-extract / resize / frame-sample stages (stub codec,
  * real plumbing — graft.operators.Multimodal).
  *
  * The fake decode is arithmetic on the payload bytes, so the DuckDB oracle
  * reproduces it exactly with ascii()/prefix-sum algebra — the differential
  * check covers the full mapPartitions path, not just the schema.
  */
object MultimodalQueries {

  val queries: Map[String, QueryFn] = Map(
    // decode + feature extraction (mean pixel over a w×h cyclic plane)
    "multimodal_features" -> { (s, dir) =>
      val media = Multimodal.mediaTable(s, dir)
      Multimodal.extractFeatures(media)
        .select(col("media_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"), r6(col("mean_px")).as("mean_px"))
    },

    // resize: fixed-geometry re-decode
    "multimodal_resize" -> { (s, dir) =>
      val media = Multimodal.mediaTable(s, dir)
      Multimodal.resize(media, 16, 16)
        .select(col("media_id"), r6(col("mean_px")).as("mean_px"))
    },

    // video-style frame sampling (4 frames, stride 2) — flatMap shape
    "multimodal_frames" -> { (s, dir) =>
      val media = Multimodal.mediaTable(s, dir)
      Multimodal.sampleFrames(media, 4, 2)
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          r6(col("frame_mean")).as("frame_mean"))
    })

  private val BytesCte =
    """b AS (SELECT doc_id AS media_id, text, length(text) AS len,
      |        (doc_id % 16 + 8) AS w, (doc_id % 8 + 4) AS h FROM documents),
      |bb AS (SELECT media_id, len, w, h,
      |        list_transform(range(1, len + 1), i -> ascii(substr(text, i, 1))) AS bytes
      |       FROM b)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "multimodal_features" ->
      s"""WITH $BytesCte,
         |c AS (SELECT media_id, w, h, w * h AS n, len,
         |   CAST(list_sum(bytes) AS BIGINT) AS total,
         |   CASE WHEN n % len = 0 THEN 0
         |        ELSE CAST(list_sum(bytes[1:(n % len)]) AS BIGINT) END AS prefix
         |  FROM (SELECT media_id, w, h, w * h AS n, len, bytes FROM bb))
         |SELECT media_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         | floor((((n // len) * total + prefix) * 1.0 / n + 1.37e-8) * 1000000 + 0.5) / 1000000 AS mean_px
         |FROM c""".stripMargin,

    "multimodal_resize" ->
      s"""WITH $BytesCte,
         |c AS (SELECT media_id, 256 AS n, len,
         |   CAST(list_sum(bytes) AS BIGINT) AS total,
         |   CASE WHEN 256 % len = 0 THEN 0
         |        ELSE CAST(list_sum(bytes[1:(256 % len)]) AS BIGINT) END AS prefix
         |  FROM bb)
         |SELECT media_id,
         | floor((((n // len) * total + prefix) * 1.0 / n + 1.37e-8) * 1000000 + 0.5) / 1000000 AS mean_px
         |FROM c""".stripMargin,

    "multimodal_frames" ->
      s"""WITH $BytesCte,
         |f AS (SELECT media_id, len, greatest(len // 4, 1) AS chunk, bytes,
         |        unnest([0, 2]) AS frame_idx FROM bb),
         |c AS (SELECT media_id, frame_idx,
         |        least(len, frame_idx * chunk + chunk) - frame_idx * chunk AS m,
         |        frame_idx * chunk AS off, bytes FROM f)
         |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
         | floor((CASE WHEN m <= 0 THEN 0.0
         |   ELSE CAST(list_sum(bytes[(off + 1):(off + m)]) AS BIGINT) * 1.0 / m
         |   END + 1.37e-8) * 1000000 + 0.5) / 1000000 AS frame_mean
         |FROM c""".stripMargin)
}
