package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileWriter
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, Row}
import org.apache.spark.sql.types._

/** Single-FILE Arrow IPC writer, TEST-FIXTURE-ONLY by contract: collects
  * the DataFrame to the driver (size-guarded) so a spec can author one
  * exact .arrow file. The production write path is the DSv2
  * `SupportsWrite` in ArrowIpcWrite.scala (`df.write.format(...)
  * .save(dir)`) — executor-side, one file per partition, no collect.
  */
object ArrowIpcWriter {

  def write(df: DataFrame, path: String, batchSize: Int = 4096,
      maxRows: Int = 1 << 22): Unit = {
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows, s"ArrowIpcWriter.write is driver-side; >$maxRows rows")
    val schema = df.schema
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(GraftSqlBridge.schemaToArrow(schema), alloc)
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.WRITE,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    val writer = new ArrowFileWriter(root, null, ch)
    try {
      writer.start()
      rows.grouped(batchSize).foreach { batch =>
        root.allocateNew()
        batch.zipWithIndex.foreach { case (row, i) =>
          schema.fields.zipWithIndex.foreach { case (f, c) =>
            fill(root.getVector(c), f.dataType, row, c, i)
          }
        }
        root.setRowCount(batch.length)
        writer.writeBatch()
      }
      writer.end()
    } finally { writer.close(); ch.close(); root.close(); alloc.close() }
  }

  /** Arrow IPC STREAM framing to an in-memory byte array — the encoding
    * the reference uses for MemoryScanExecNode.partitions (one blob per
    * partition, parsed back by `StreamReader`). Driver-side by nature:
    * the rows ARE a local relation already. */
  def streamBytes(schema: StructType, rows: Seq[Row], batchSize: Int = 4096)
      : Array[Byte] = {
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(GraftSqlBridge.schemaToArrow(schema), alloc)
    val out = new java.io.ByteArrayOutputStream()
    val writer = new org.apache.arrow.vector.ipc.ArrowStreamWriter(
      root, null, java.nio.channels.Channels.newChannel(out))
    try {
      writer.start()
      rows.grouped(batchSize).foreach { batch =>
        root.allocateNew()
        batch.zipWithIndex.foreach { case (row, i) =>
          schema.fields.zipWithIndex.foreach { case (f, c) =>
            fill(root.getVector(c), f.dataType, row, c, i)
          }
        }
        root.setRowCount(batch.length)
        writer.writeBatch()
      }
      writer.end()
    } finally { writer.close(); root.close(); alloc.close() }
    out.toByteArray
  }

  private def fill(v: FieldVector, dt: DataType, row: Row, c: Int, i: Int): Unit =
    if (row.isNullAt(c)) v.asInstanceOf[BaseValueVector] match {
      case x: BaseFixedWidthVector    => x.setNull(i)
      case x: BaseVariableWidthVector => x.setNull(i)
      case other => throw new UnsupportedOperationException(s"null into ${other.getClass}")
    } else (v, dt) match {
      case (x: BigIntVector, LongType)     => x.setSafe(i, row.getLong(c))
      case (x: IntVector, IntegerType)     => x.setSafe(i, row.getInt(c))
      case (x: Float8Vector, DoubleType)   => x.setSafe(i, row.getDouble(c))
      case (x: Float4Vector, FloatType)    => x.setSafe(i, row.getFloat(c))
      case (x: BitVector, BooleanType)     => x.setSafe(i, if (row.getBoolean(c)) 1 else 0)
      case (x: VarCharVector, StringType)  =>
        x.setSafe(i, row.getString(c).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (x: TimeStampMicroTZVector, TimestampType) =>
        val ts = row.getAs[java.sql.Timestamp](c)
        x.setSafe(i, ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L)
      case (x: DateDayVector, DateType) =>
        x.setSafe(i, row.getAs[java.sql.Date](c).toLocalDate.toEpochDay.toInt)
      case (other, t) =>
        throw new UnsupportedOperationException(s"ArrowIpcWriter: $t into ${other.getClass}")
    }
}
