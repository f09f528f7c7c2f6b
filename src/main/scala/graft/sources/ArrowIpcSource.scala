package graft.sources

import java.nio.channels.FileChannel
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util
import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ArrowColumnVector, ColumnarBatch}

/** Arrow IPC *file format* reader as a from-scratch DataSource V2 — the
  * custom `TableProvider` demonstration (SURVEY §2.10), mirroring the
  * reference's Arrow datasource (datasource-arrow/src/source.rs).
  *
  * Usage: `spark.read.format("graft.sources.ArrowIpcTableProvider")
  * .load(pathOrDir)` where the path is one `.arrow` file or a directory of
  * them.
  *
  * Scale design: one input partition per (file, record-batch-range) unit —
  * here per file, the IPC footer gives batch counts so a finer split is a
  * local change; batches are served ZERO-COPY as Spark `ColumnarBatch`es
  * wrapping `ArrowColumnVector`s (no row materialization; Spark's own
  * columnar-to-row boundary handles the rest). Column pruning is pushed
  * into the reader: only requested vectors are wrapped.
  */
object ArrowIpcSource {
  def files(path: String): Seq[Path] = {
    val p = Paths.get(path)
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.filter(_.toString.endsWith(".arrow")).toSeq.sortBy(_.toString)
    else Seq(p)
  }

  def readSchema(path: String): StructType = {
    // a write target may not exist yet: report an empty schema and let the
    // write path take its real schema from LogicalWriteInfo (the table
    // declares ACCEPT_ANY_SCHEMA so append validation doesn't compare)
    val first = files(path).headOption.getOrElse(return new StructType())
    val alloc = new RootAllocator()
    val ch = FileChannel.open(first, StandardOpenOption.READ)
    try {
      val reader = new ArrowFileReader(ch, alloc)
      try GraftSqlBridge.schemaFromArrow(reader.getVectorSchemaRoot.getSchema)
      finally reader.close()
    } finally { ch.close(); alloc.close() }
  }
}

class ArrowIpcTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArrowIpcSource.readSchema(options.get("path"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ArrowIpcTable(schema, properties.get("path"))

  override def supportsExternalMetadata(): Boolean = true
}

class ArrowIpcTable(schema: StructType, path: String)
    extends Table with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"arrow_ipc($path)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowIpcScanBuilder(schema, path)
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new ArrowIpcWriteBuilder(info, path)
}

class ArrowIpcScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new ArrowIpcScan(required, path)
}

class ArrowIpcScan(required: StructType, path: String) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"ArrowIpcScan($path, ${required.fieldNames.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] =
    ArrowIpcSource.files(path).map(p => ArrowFilePartition(p.toString)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowIpcReaderFactory(required)
}

case class ArrowFilePartition(file: String) extends InputPartition

class ArrowIpcReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = true

  override def createReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.catalyst.InternalRow] =
    throw new UnsupportedOperationException("columnar-only source")

  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val file = partition.asInstanceOf[ArrowFilePartition].file
    new PartitionReader[ColumnarBatch] {
      private val alloc = new RootAllocator()
      private val ch = FileChannel.open(Paths.get(file), StandardOpenOption.READ)
      private val reader = new ArrowFileReader(ch, alloc)
      private val root = reader.getVectorSchemaRoot

      override def next(): Boolean = reader.loadNextBatch()

      override def get(): ColumnarBatch = {
        val vectors = required.fieldNames.map { n =>
          new ArrowColumnVector(root.getVector(n))
        }
        new ColumnarBatch(vectors.toArray[org.apache.spark.sql.vectorized.ColumnVector],
          root.getRowCount)
      }

      override def close(): Unit = { reader.close(); ch.close(); alloc.close() }
    }
  }
}
