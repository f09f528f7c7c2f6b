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

  test("RIFF parser skips unknown chunks and survives padding (real decode)") {
    import graft.operators.Multimodal.RealCodecs
    import java.nio.{ByteBuffer, ByteOrder}
    // take a canonical file and splice a LIST chunk between fmt and data —
    // players emit these; a parser that assumes fmt+data adjacency misreads
    val base = RealCodecs.synthesizeWav(16000, 1200, 800)
    val listChunk = {
      val b = ByteBuffer.allocate(8 + 6).order(ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("ASCII")); b.putInt(6); b.put("INFOab".getBytes("ASCII"))
      b.array()
    }
    val spliced = base.slice(0, 36) ++ listChunk ++ base.slice(36, base.length)
    // fix the RIFF size field for the inserted bytes
    val bb = ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val info = RealCodecs.parseWav(spliced)
    assert(info.sampleRate == 16000 && info.channels == 1 && info.bits == 16)
    assert(info.nSamples == 800)
    assert(math.abs(info.rms - 1200.0) < 1e-9)
  }

  test("RIFF parser honors 2-byte chunk alignment for odd-length chunks") {
    import graft.operators.Multimodal.RealCodecs
    import java.nio.{ByteBuffer, ByteOrder}
    // splice an ODD-length LIST chunk (len=7, so a pad byte follows per the
    // RIFF spec) — a parser that skips exactly `len` bytes misreads every
    // later tag by one byte
    val base = RealCodecs.synthesizeWav(8000, 900, 400)
    val oddChunk = {
      val b = ByteBuffer.allocate(8 + 7 + 1).order(ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("ASCII")); b.putInt(7)
      b.put("INFOabc".getBytes("ASCII")); b.put(0.toByte) // pad to even
      b.array()
    }
    val spliced = base.slice(0, 36) ++ oddChunk ++ base.slice(36, base.length)
    val bb = ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val info = RealCodecs.parseWav(spliced)
    assert(info.sampleRate == 8000 && info.nSamples == 400)
    assert(math.abs(info.rms - 900.0) < 1e-9)
  }

  test("BMP parser honors the 4-byte row stride") {
    import graft.operators.Multimodal.RealCodecs
    // width 5 -> 15 data bytes/row, stride 16: one padding byte per row
    // that must NOT enter the mean
    val bmp = RealCodecs.synthesizeBmp(5, 3, 200)
    val info = RealCodecs.parseBmp(bmp)
    assert(info.width == 5 && info.height == 3 && info.bpp == 24)
    assert(math.abs(info.meanPx - 200.0) < 1e-9)
  }

  test("JPEG roundtrip is a real codec and rounds back exactly (all 256 lums)") {
    import graft.operators.Multimodal.RealCodecs
    // the payload must be genuine JFIF — SOI marker + huffman-coded scan,
    // not a FakeCodec byte echo
    val bytes = RealCodecs.synthesizeJpeg(32, 16, 40, 200)
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "missing SOI")
    // quantization moves the stored DC coefficients: a compressed JPEG of a
    // two-tone 32x16 plane is far smaller than the raw pixels
    assert(bytes.length < 32 * 16 * 3)
    val info = RealCodecs.parseJpeg(bytes)
    assert(info.width == 32 && info.height == 16)
    assert(math.round(info.meanLeft) == 40L && math.round(info.meanRight) == 200L)
    // exhaustive DC-accuracy sweep: every luminance rounds back exactly
    (0 until 256).foreach { lum =>
      val i = RealCodecs.parseJpeg(RealCodecs.synthesizeJpeg(16, 8, lum, lum))
      assert(math.round(i.meanLeft) == lum.toLong && math.round(i.meanRight) == lum.toLong,
        s"lum=$lum decoded to ${i.meanLeft}/${i.meanRight}")
    }
  }
}
