package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns plus a typed metadata struct, with decode /
  * feature-extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing — schema, partition-parallel batched iteration
  * (`mapPartitions`, the Scala analogue of `mapInPandas`), output shapes —
  * is real and tested. The actual codec calls are STUBBED with a
  * deterministic fake (this container has no image/audio libraries): decode
  * derives pseudo-pixels from the bytes themselves, so every downstream
  * stage is reproducible and assertable. Swapping `FakeCodec` for a real
  * JNI/library decoder changes no plumbing.
  */
object Multimodal {

  /** Typed metadata carried alongside the payload. */
  case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)
  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(media_id: Long, width: Int, height: Int,
      mean_px: Double, histogram: Array[Long])
  case class FrameSample(media_id: Long, frame_idx: Int, frame_mean: Double)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("nBytes", LongType, nullable = false))), nullable = false)))

  /** ??? in spirit — the deterministic stand-in for the real codec. */
  object FakeCodec {
    /** "Decode" bytes into a width×height pseudo-pixel plane. */
    def decode(payload: Array[Byte], width: Int, height: Int): Array[Int] = {
      val out = new Array[Int](width * height)
      var i = 0
      while (i < out.length) {
        out(i) = java.lang.Byte.toUnsignedInt(payload(i % payload.length))
        i += 1
      }
      out
    }
  }

  /** Build a deterministic media table from the documents fixture: payload =
    * utf-8 bytes of the text (an opaque blob as far as the pipeline cares),
    * metadata derived from doc stats. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.load(spark, dir, "documents")
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("fake/raw").as("format"),
        (pmod(col("doc_id"), lit(16)) + 8).cast("int").as("width"),
        (pmod(col("doc_id"), lit(8)) + 4).cast("int").as("height"),
        length(col("text")).cast("long").as("nBytes")).as("meta"))
  }

  /** Feature extraction: partition-parallel batched decode → per-media mean
    * pixel + 4-bin histogram. Runs as mapPartitions so one task amortizes
    * codec setup over its whole batch (the mapInPandas batching pattern). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real codecs would initialize once per partition here
      rows.map { r =>
        val px = FakeCodec.decode(r.payload, r.meta.width, r.meta.height)
        val hist = new Array[Long](4)
        var sum = 0L
        px.foreach { v => sum += v; hist(v / 64) += 1 }
        MediaFeatures(r.media_id, r.meta.width, r.meta.height,
          sum.toDouble / px.length, hist)
      }
    }
  }

  /** Resize: re-decode at a new geometry (stub keeps determinism). */
  def resize(media: DataFrame, newW: Int, newH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val px = FakeCodec.decode(r.payload, newW, newH)
        (r.media_id, newW, newH, px.map(_.toLong).sum.toDouble / px.length)
      }
    }.toDF("media_id", "width", "height", "mean_px")
  }

  /** Frame sampling: treat the payload as `nFrames` equal chunks (video
    * stand-in), emit every `stride`-th frame's mean — a flatMap shape. */
  def sampleFrames(media: DataFrame, nFrames: Int, stride: Int): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val chunk = math.max(1, r.payload.length / nFrames)
      (0 until nFrames by stride).map { f =>
        val from = f * chunk
        val until = math.min(r.payload.length, from + chunk)
        val slice = r.payload.slice(from, until)
        val mean =
          if (slice.isEmpty) 0.0
          else slice.map(java.lang.Byte.toUnsignedInt(_).toLong).sum.toDouble / slice.length
        FrameSample(r.media_id, f, mean)
      }
    }
  }
}
