package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** FLOAT16 parquet ingestion (reference: `float16.slt` — the reference's
  * Arrow engine has a native half type; Spark has none and its parquet
  * reader rejects the FLOAT16 logical type outright). The widening
  * CONVENTION here: half → FloatType on read, decoded losslessly (every
  * f16 value is exactly representable as f32).
  *
  * Implementation reads pages with parquet-column's low-level API — the
  * same executor-side pattern as [[ParquetMetadata]]: the file list is
  * parallelized, each task decodes only its own files, nothing funnels
  * through the driver.
  */
object Float16Source {

  /** Decode IEEE 754 binary16 bits to a float (Java 17 has no
    * Float.float16ToFloat yet). */
  def halfToFloat(bits: Int): Float = {
    val sign = (bits & 0x8000) << 16
    val exp = (bits >>> 10) & 0x1f
    val mant = bits & 0x3ff
    val f32bits =
      if (exp == 0) {
        if (mant == 0) sign // signed zero
        else { // subnormal: value = mant * 2^-24; renormalize
          var e = -1; var m = mant
          while ((m & 0x400) == 0) { m <<= 1; e += 1 }
          sign | ((127 - 15 - e) << 23) | ((m & 0x3ff) << 13)
        }
      } else if (exp == 0x1f) sign | 0x7f800000 | (mant << 13) // inf / nan
      else sign | ((exp - 15 + 127) << 23) | (mant << 13)
    java.lang.Float.intBitsToFloat(f32bits)
  }

  /** Quantize a float to the nearest IEEE 754 binary16 value
    * (round-to-nearest-even), returned widened back to float — the exact
    * effect of the reference's `arrow_cast(x, 'Float16')` on the VALUE
    * (every binary16 is exactly representable in binary32, so downstream
    * math and display agree whenever the quantized values agree).
    * Overflow past the f16 max (65504; ≥65520 rounds up) yields ±Inf;
    * NaN/Inf/±0 pass through; |x| below 2^-14 lands on the 2^-24
    * subnormal grid. Exposed as the slt dialect's `graft_f16`. */
  def quantize(f: Float): Float = {
    if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f) || f == 0f) f
    else {
      val a = math.abs(f.toDouble)
      // exact unbiased exponent (no log round-off at power-of-2 bounds);
      // clamp to the subnormal regime's fixed 2^-24 quantum
      val q = math.pow(2, math.max(math.getExponent(a), -14) - 10)
      val r = math.rint(a / q) * q // rint = round-half-even, IEEE default
      val out = if (r > 65504.0) Double.PositiveInfinity else r
      (math.signum(f.toDouble) * out).toFloat
    }
  }

  /** Read a parquet file/directory, widening every FLOAT16 column to
    * float and every integer column to long; other types are skipped.
    * Output: (file_name, row_index within file, column name, value as
    * double) — long form so arbitrary half-typed files can be inspected
    * without a fixed schema. */
  def readWidened(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = listFiles(spark, path)
    val parallelism = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    spark.createDataset(files).repartition(parallelism)
      .mapPartitions { it =>
        val conf = new org.apache.hadoop.conf.Configuration()
        it.flatMap { f => decodeFile(f, conf) }
      }
      .toDF("file_name", "row_index", "col_name", "value")
  }

  private def listFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString).toSeq.sorted
    else Seq(st.getPath.toString)
  }

  private def decodeFile(file: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[(String, Long, String, Double)] = {
    import org.apache.parquet.column.impl.ColumnReadStoreImpl
    import org.apache.parquet.io.api.{Binary, Converter, GroupConverter, PrimitiveConverter}
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import scala.jdk.CollectionConverters._

    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(file), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val footer = reader.getFooter
      val schema = footer.getFileMetaData.getSchema
      val createdBy = footer.getFileMetaData.getCreatedBy
      val name = file.substring(file.lastIndexOf('/') + 1)
      val noop = new PrimitiveConverter {}
      val root: GroupConverter = new GroupConverter {
        override def getConverter(i: Int): Converter = noop
        override def start(): Unit = ()
        override def end(): Unit = ()
      }
      val out = Seq.newBuilder[(String, Long, String, Double)]
      var rowBase = 0L
      var store = reader.readNextRowGroup()
      while (store != null) {
        val crs = new ColumnReadStoreImpl(store, root, schema, createdBy)
        for (cd <- schema.getColumns.asScala) {
          val pt = cd.getPrimitiveType
          val colName = cd.getPath.mkString(".")
          val isHalf = pt.getPrimitiveTypeName == FIXED_LEN_BYTE_ARRAY &&
            pt.getLogicalTypeAnnotation ==
              LogicalTypeAnnotation.float16Type()
          val extract: Option[org.apache.parquet.column.ColumnReader => Double] =
            if (isHalf) Some { cr =>
              val b: Binary = cr.getBinary
              val bytes = b.getBytes
              halfToFloat((bytes(0) & 0xff) | ((bytes(1) & 0xff) << 8)).toDouble
            }
            else pt.getPrimitiveTypeName match {
              case INT32  => Some(_.getInteger.toDouble)
              case INT64  => Some(_.getLong.toDouble)
              case FLOAT  => Some(_.getFloat.toDouble)
              case DOUBLE => Some(_.getDouble)
              case _      => None
            }
          extract.foreach { get =>
            val cr = crs.getColumnReader(cd)
            val n = cr.getTotalValueCount
            var i = 0L
            while (i < n) {
              // definition level below max = null at this position; emit NaN
              val v = if (cr.getCurrentDefinitionLevel == cd.getMaxDefinitionLevel)
                get(cr) else Double.NaN
              out += ((name, rowBase + i, colName, v))
              cr.consume()
              i += 1
            }
          }
        }
        rowBase += store.getRowCount
        store = reader.readNextRowGroup()
      }
      out.result()
    } finally reader.close()
  }
}
