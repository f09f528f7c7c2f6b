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
  * is real and tested. Decode is REAL for every format the JDK can handle
  * without external libraries: RIFF/WAVE PCM and BMP (hand-written parsers
  * in [[RealCodecs]]) and JPEG (`javax.imageio`'s baseline codec —
  * [[RealCodecs.parseJpeg]]). Formats with no JDK decoder (MP3/H.264) are
  * STUBBED with a deterministic fake: decode derives pseudo-pixels from the
  * bytes themselves, so every downstream stage is reproducible and
  * assertable; swapping `FakeCodec` for a JNI/library decoder changes no
  * plumbing.
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

  /** REAL decoders for the media formats the JDK can handle without any
    * external library: RIFF/WAVE PCM and BMP by hand-written byte-layout
    * parsing (header walk, chunk skipping, row-stride handling), and JPEG
    * through `javax.imageio` (the JDK ships a full baseline-JPEG
    * huffman+IDCT codec). Remaining compressed codecs with no JDK decoder
    * (MP3/H.264) are the declared `FakeCodec` swap-in point. */
  object RealCodecs {
    import java.nio.{ByteBuffer, ByteOrder}

    /** Synthesize a baseline JPEG: two vertical half-planes of solid
      * luminance (left `lumLeft`, right `lumRight`). Both halves are
      * 8-pixel aligned (width a multiple of 16, height of 8), so every
      * 8×8 JPEG block is a solid tone — after quantization the decoded
      * block mean stays within ±0.5 of the source value at quality 0.95
      * (verified exhaustively for all 256 luminances), which makes the
      * decode oracle-exact after rounding while still exercising the full
      * entropy-decode + dequantize + IDCT + color-convert pipeline. */
    def synthesizeJpeg(width: Int, height: Int,
        lumLeft: Int, lumRight: Int): Array[Byte] = {
      require(width % 16 == 0 && height % 8 == 0,
        "halves must be 8px-block aligned")
      import java.awt.image.BufferedImage
      import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
      import javax.imageio.stream.MemoryCacheImageOutputStream
      val img = new BufferedImage(width, height, BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val l = if (x < width / 2) lumLeft else lumRight
          img.setRGB(x, y, (l << 16) | (l << 8) | l)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      val wr = ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.95f)
      val out = new MemoryCacheImageOutputStream(bos)
      wr.setOutput(out)
      wr.write(null, new IIOImage(img, null, null), p)
      wr.dispose(); out.close()
      bos.toByteArray
    }

    case class JpegInfo(width: Int, height: Int,
        meanLeft: Double, meanRight: Double)

    /** REAL JPEG decode via the JDK's ImageIO codec: entropy decode,
      * dequantize, IDCT, YCbCr→RGB. Emits per-half mean pixel values (mean
      * of R,G,B over each vertical half) so solid-half fixtures round back
      * to their source luminance exactly. */
    def parseJpeg(b: Array[Byte]): JpegInfo = {
      import javax.imageio.ImageIO
      val img = ImageIO.read(new java.io.ByteArrayInputStream(b))
      require(img != null, "not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      var (sumL, sumR) = (0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val s = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          if (x < w / 2) sumL += s else sumR += s
          x += 1
        }
        y += 1
      }
      val nHalf = (w / 2).toLong * h * 3
      JpegInfo(w, h,
        if (nHalf == 0) 0.0 else sumL.toDouble / nHalf,
        if (nHalf == 0) 0.0 else sumR.toDouble / nHalf)
    }

    /** 44-byte canonical RIFF/WAVE header + 16-bit LE PCM mono square
      * wave of the given amplitude (RMS of a square wave == amplitude,
      * exactly — which makes decode results oracle-checkable). */
    def synthesizeWav(sampleRate: Int, amplitude: Int, nSamples: Int): Array[Byte] = {
      val dataLen = nSamples * 2
      val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("ASCII")); buf.putInt(36 + dataLen)
      buf.put("WAVE".getBytes("ASCII"))
      buf.put("fmt ".getBytes("ASCII")); buf.putInt(16)
      buf.putShort(1) // PCM
      buf.putShort(1) // mono
      buf.putInt(sampleRate)
      buf.putInt(sampleRate * 2) // byte rate
      buf.putShort(2)  // block align
      buf.putShort(16) // bits per sample
      buf.put("data".getBytes("ASCII")); buf.putInt(dataLen)
      var i = 0
      while (i < nSamples) {
        buf.putShort((if (i % 2 == 0) amplitude else -amplitude).toShort)
        i += 1
      }
      buf.array()
    }

    case class WavInfo(sampleRate: Int, channels: Int, bits: Int,
        nSamples: Int, rms: Double)

    /** Chunk-walking RIFF parser: tolerates unknown chunks between
      * `fmt ` and `data` (LIST/INFO etc.), computes RMS over the PCM
      * samples. */
    def parseWav(b: Array[Byte]): WavInfo = {
      val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val t = new Array[Byte](4); buf.get(t); new String(t, "ASCII")
      }
      require(tag() == "RIFF", "not a RIFF file")
      buf.getInt // riff size
      require(tag() == "WAVE", "not a WAVE file")
      var (sr, ch, bits) = (0, 0, 0)
      var nSamples = 0
      var sumSq = 0.0
      while (buf.remaining() >= 8) {
        val t = tag()
        val len = buf.getInt
        // RIFF chunks are 2-byte aligned: odd-length bodies carry a pad
        // byte that is NOT counted in `len`, so every skip must advance
        // len + (len & 1) or subsequent tag reads misalign.
        val next = math.min(buf.position() + len + (len & 1), buf.limit())
        t match {
          case "fmt " =>
            buf.getShort // audio format
            ch = buf.getShort.toInt
            sr = buf.getInt
            buf.getInt; buf.getShort
            bits = buf.getShort.toInt
          case "data" =>
            nSamples = len / 2
            var i = 0
            while (i < nSamples) {
              val s = buf.getShort.toDouble; sumSq += s * s; i += 1
            }
          case _ => // skip unknown chunk
        }
        buf.position(next)
      }
      WavInfo(sr, ch, bits,
        nSamples, if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples))
    }

    /** Minimal 24bpp BMP (BITMAPINFOHEADER, bottom-up, rows padded to 4
      * bytes) filled with one luminance value. */
    def synthesizeBmp(width: Int, height: Int, lum: Int): Array[Byte] = {
      val stride = (width * 3 + 3) / 4 * 4
      val dataLen = stride * height
      val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte); buf.put('M'.toByte)
      buf.putInt(54 + dataLen); buf.putInt(0); buf.putInt(54)
      buf.putInt(40); buf.putInt(width); buf.putInt(height)
      buf.putShort(1); buf.putShort(24)
      buf.putInt(0); buf.putInt(dataLen); buf.putInt(2835); buf.putInt(2835)
      buf.putInt(0); buf.putInt(0)
      for (_ <- 0 until height; x <- 0 until stride)
        buf.put(if (x < width * 3) lum.toByte else 0.toByte)
      buf.array()
    }

    case class BmpInfo(width: Int, height: Int, bpp: Int, meanPx: Double)

    /** BMP header + pixel-plane parse; the row stride (4-byte padding)
      * must be skipped or the mean is wrong — a real decode detail. */
    def parseBmp(b: Array[Byte]): BmpInfo = {
      val buf = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "not a BMP")
      buf.getInt; buf.getInt
      val dataOff = buf.getInt
      buf.getInt // header size
      val width = buf.getInt
      val height = buf.getInt
      buf.getShort
      val bpp = buf.getShort.toInt
      val stride = (width * (bpp / 8) + 3) / 4 * 4
      var sum = 0L
      var n = 0L
      for (y <- 0 until height; x <- 0 until width * (bpp / 8)) {
        sum += java.lang.Byte.toUnsignedInt(b(dataOff + y * stride + x))
        n += 1
      }
      BmpInfo(width, height, bpp, if (n == 0) 0.0 else sum.toDouble / n)
    }
  }

  /** Build a deterministic media table of REAL baseline JPEGs (r9): each
    * doc synthesizes a two-tone block-aligned image through `ImageIO`'s
    * encoder in the executor, so the payload column carries genuine JFIF
    * bytes — the same geometry/luminance derivation the `multimodal_jpeg`
    * oracle pins (w = 16·(id%4+1), h = 8·(id%3+1), lums id%256 /
    * (7·id+13)%256). Synthesis is partition-parallel; nothing touches the
    * driver. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = 16 * ((id % 4).toInt + 1)
          val h = 8 * ((id % 3).toInt + 1)
          val payload = RealCodecs.synthesizeJpeg(
            w, h, (id % 256).toInt, ((id * 7 + 13) % 256).toInt)
          MediaRow(id, payload, MediaMeta("image/jpeg", w, h, payload.length.toLong))
        }
      }.toDF()
  }

  /** Video stand-in table (payload = utf-8 bytes of the doc text, format
    * "fake/raw"): the fixture for the frame-sampling path, whose real
    * codec (H.264) has no JDK decoder — the byte-chunk FakeCodec contract
    * keeps the flatMap plumbing oracle-checkable. */
  def videoStandinTable(spark: SparkSession, dir: String): DataFrame = {
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
    * codec setup over its whole batch (the mapInPandas batching pattern).
    * Dispatches on the payload format: image/jpeg runs the REAL ImageIO
    * codec per pixel; formats with no JDK decoder fall back to the declared
    * FakeCodec stand-in. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // ImageIO's JVM-wide codec registry init is the once-per-executor
      // cost this batch amortizes
      rows.map { r =>
        r.meta.format match {
          case "image/jpeg" =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            require(img != null, "not a decodable image")
            val (w, h) = (img.getWidth, img.getHeight)
            val hist = new Array[Long](4)
            var sum = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val g = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
                sum += g; hist(math.min(3, g / 64)) += 1
                x += 1
              }
              y += 1
            }
            MediaFeatures(r.media_id, w, h, sum.toDouble / (w.toLong * h), hist)
          case _ => // declared stand-in (no JDK decoder for this format)
            val px = FakeCodec.decode(r.payload, r.meta.width, r.meta.height)
            val hist = new Array[Long](4)
            var sum = 0L
            px.foreach { v => sum += v; hist(v / 64) += 1 }
            MediaFeatures(r.media_id, r.meta.width, r.meta.height,
              sum.toDouble / px.length, hist)
        }
      }
    }
  }

  /** Resize: real decode + nearest-neighbor resample for image/jpeg
    * (deterministic — no interpolation rounding to chase across JVMs),
    * FakeCodec re-decode for formats with no JDK codec. */
  def resize(media: DataFrame, newW: Int, newH: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        r.meta.format match {
          case "image/jpeg" =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            require(img != null, "not a decodable image")
            val (w, h) = (img.getWidth, img.getHeight)
            var sum = 0L
            var ty = 0
            while (ty < newH) {
              val sy = ty * h / newH
              var tx = 0
              while (tx < newW) {
                val sx = tx * w / newW
                val rgb = img.getRGB(sx, sy)
                sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
                tx += 1
              }
              ty += 1
            }
            (r.media_id, newW, newH, sum.toDouble / (newW.toLong * newH))
          case _ =>
            val px = FakeCodec.decode(r.payload, newW, newH)
            (r.media_id, newW, newH, px.map(_.toLong).sum.toDouble / px.length)
        }
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
