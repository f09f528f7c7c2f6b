package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import java.util.UUID

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ArrowFileWriter
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** Executor-side Arrow IPC write path (DSv2 `SupportsWrite`), mirroring the
  * read provider: `df.write.format("graft.sources.ArrowIpcTableProvider")
  * .mode("overwrite"|"append").save(dir)` writes one `.arrow` file per
  * partition, in parallel, on the executors — no driver collect anywhere.
  *
  * Scale design: each task streams its partition into 4096-row record
  * batches (bounded memory), writes to a `.tmp` staging name and renames on
  * task commit, so failed/speculative tasks never leave a readable file
  * behind. Overwrite maps to DSv2 truncate: existing `.arrow` files are
  * removed once, on the driver, before tasks launch.
  * (Reference: datasource-arrow/src/source.rs is read-only; the write
  * contract here follows the reference's COPY TO file sinks,
  * datasource/src/file_format/arrow.rs.)
  */
class ArrowIpcWriteBuilder(info: LogicalWriteInfo, dir: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ArrowIpcBatchWrite(info.schema(), dir, doTruncate)
  }
}

class ArrowIpcBatchWrite(schema: StructType, dir: String, truncate: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    if (truncate) {
      val it = Files.list(p).iterator()
      while (it.hasNext) {
        val f = it.next()
        if (f.toString.endsWith(".arrow") || f.toString.endsWith(".tmp"))
          Files.delete(f)
      }
    }
    new ArrowIpcWriterFactory(schema, dir)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class ArrowIpcCommit(file: String) extends WriterCommitMessage

class ArrowIpcWriterFactory(schema: StructType, dir: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ArrowIpcDataWriter(schema, dir, partitionId, taskId)
}

class ArrowIpcDataWriter(schema: StructType, dir: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val batchSize = 4096
  private val finalPath = Paths.get(dir, f"part-$partitionId%05d-$taskId.arrow")
  private val tmpPath = Paths.get(dir, f".part-$partitionId%05d-$taskId-${UUID.randomUUID()}.tmp")
  private val alloc = new RootAllocator()
  private val root = VectorSchemaRoot.create(GraftSqlBridge.schemaToArrow(schema), alloc)
  private val ch = FileChannel.open(tmpPath, StandardOpenOption.WRITE,
    StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  private val writer = new ArrowFileWriter(root, null, ch)
  writer.start()
  private var n = 0

  // one setter per column, bound once — no per-row type dispatch
  private val setters: Array[(InternalRow, Int) => Unit] =
    schema.fields.zipWithIndex.map { case (f, c) =>
      val set = ArrowIpcDataWriter.setter(root.getVector(c), f.dataType, c)
      (row: InternalRow, i: Int) =>
        if (row.isNullAt(c)) ArrowIpcDataWriter.setNull(root.getVector(c), i)
        else set(row, i)
    }

  override def write(row: InternalRow): Unit = {
    if (n == 0) root.allocateNew()
    var c = 0
    while (c < setters.length) { setters(c)(row, n); c += 1 }
    n += 1
    if (n == batchSize) flush()
  }

  private def flush(): Unit = if (n > 0) {
    root.setRowCount(n)
    writer.writeBatch()
    n = 0
  }

  override def commit(): WriterCommitMessage = {
    flush()
    writer.end()
    close()
    Files.move(tmpPath, finalPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ArrowIpcCommit(finalPath.toString)
  }

  override def abort(): Unit = { close(); Files.deleteIfExists(tmpPath) }

  override def close(): Unit = { writer.close(); ch.close(); root.close(); alloc.close() }
}

object ArrowIpcDataWriter {
  private[sources] def setNull(v: FieldVector, i: Int): Unit = v match {
    case x: BaseFixedWidthVector    => x.setNull(i)
    case x: BaseVariableWidthVector => x.setNull(i)
    case other => throw new UnsupportedOperationException(s"null into ${other.getClass}")
  }

  /** InternalRow accessor per Spark type — timestamps are already µs longs
    * and dates day-ints internally, so no java.time conversion is needed. */
  private[sources] def setter(v: FieldVector, dt: DataType, c: Int): (InternalRow, Int) => Unit =
    (v, dt) match {
      case (x: BigIntVector, LongType)      => (r, i) => x.setSafe(i, r.getLong(c))
      case (x: IntVector, IntegerType)      => (r, i) => x.setSafe(i, r.getInt(c))
      case (x: Float8Vector, DoubleType)    => (r, i) => x.setSafe(i, r.getDouble(c))
      case (x: Float4Vector, FloatType)     => (r, i) => x.setSafe(i, r.getFloat(c))
      case (x: BitVector, BooleanType)      => (r, i) => x.setSafe(i, if (r.getBoolean(c)) 1 else 0)
      case (x: VarCharVector, StringType)   => (r, i) => x.setSafe(i, r.getUTF8String(c).getBytes)
      case (x: TimeStampMicroTZVector, TimestampType) => (r, i) => x.setSafe(i, r.getLong(c))
      case (x: TimeStampMicroVector, TimestampNTZType) => (r, i) => x.setSafe(i, r.getLong(c))
      case (x: DateDayVector, DateType)     => (r, i) => x.setSafe(i, r.getInt(c))
      case (x: SmallIntVector, ShortType)   => (r, i) => x.setSafe(i, r.getShort(c))
      case (x: TinyIntVector, ByteType)     => (r, i) => x.setSafe(i, r.getByte(c))
      case (x: VarBinaryVector, BinaryType) => (r, i) => x.setSafe(i, r.getBinary(c))
      case (x: DecimalVector, d: DecimalType) =>
        (r, i) => x.setSafe(i, r.getDecimal(c, d.precision, d.scale).toJavaBigDecimal)
      case (other, t) =>
        throw new UnsupportedOperationException(s"ArrowIpcDataWriter: $t into ${other.getClass}")
    }
}
