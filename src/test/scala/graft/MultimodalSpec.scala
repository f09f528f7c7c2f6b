package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  lazy val media = Multimodal.mediaTable(spark, sfDir).cache()

  test("media table schema: binary payload + typed metadata") {
    assert(media.schema("payload").dataType.typeName == "binary")
    val meta = media.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.sameElements(Array("format", "width", "height", "nBytes")))
  }

  test("feature extraction: histogram sums to pixel count") {
    val r = Multimodal.extractFeatures(media).collect()
    assert(r.nonEmpty)
    r.foreach { f =>
      assert(f.histogram.sum == f.width.toLong * f.height)
      assert(f.mean_px >= 0 && f.mean_px <= 255)
    }
  }

  test("resize changes geometry deterministically") {
    val a = Multimodal.resize(media, 16, 16).orderBy("media_id").collect()
    val b = Multimodal.resize(media, 16, 16).orderBy("media_id").collect()
    assert(a.sameElements(b))
    assert(a.forall(_.getInt(1) == 16))
  }

  test("frame sampling emits stride-selected frames per media") {
    val frames = Multimodal.sampleFrames(media, 4, 2)
    val perMedia = frames.groupBy("media_id").count().collect()
    assert(perMedia.forall(_.getLong(1) == 2)) // frames 0 and 2
  }
}
