package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.formats.{Schemas, SoABin}

/** DataSource V2 reader for the engine's SoA snapshot format (SURVEY §4
  * item 3: "a custom DSv2 source for the SoA .bin" — the optional upgrade
  * over the `binaryFile`+decode path in [[graft.formats.SoABin]]):
  *
  * {{{ spark.read.format("graft.sources.SoABinSource").load(".../MLSOut*.bin") }}}
  *
  * - one InputPartition per snapshot file (ingest parallelism = file count,
  *   each file is the engine's bounded working set);
  * - REAL projection pushdown (`SupportsPushDownRequiredColumns`): the
  *   reader materializes only the requested columns, and column-pruned
  *   reads skip whole float arrays of the file — the same 28→4 item-mask
  *   idea as the reference's `PosItem.ini`, now driven by the query.
  */
class SoABinSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Schemas.snapshot
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SoABinTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("path option required")))
  override def supportsExternalMetadata(): Boolean = false
}

private[sources] class SoABinTable(pathGlob: String) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"soabin(`$pathGlob`)"
  override def schema(): StructType = Schemas.snapshot
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SoABinScanBuilder(pathGlob)
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new SoABinWriteBuilder(pathGlob, info)
}

private[sources] class SoABinScanBuilder(pathGlob: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = Schemas.snapshot
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SoABinScan(pathGlob, required)
}

private[sources] class SoABinScan(pathGlob: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SoABinScan(${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new Configuration()
    val p = new Path(pathGlob)
    val fs = p.getFileSystem(conf)
    val statuses = Option(fs.globStatus(p)).getOrElse(Array.empty)
    statuses.filter(_.isFile).map(s =>
      SoABinInputPartition(s.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(new Configuration())
    SoABinReaderFactory(required.fieldNames.toIndexedSeq, conf)
  }
}

private[sources] final case class SoABinInputPartition(path: String)
    extends InputPartition

private[sources] final case class SoABinReaderFactory(
    columns: Seq[String], conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SoABinPartitionReader(
      partition.asInstanceOf[SoABinInputPartition].path, columns, conf.value)
}

/** Decodes one snapshot file, materializing only the pruned columns. */
private[sources] class SoABinPartitionReader(path: String, columns: Seq[String],
    conf: Configuration) extends PartitionReader[InternalRow] {

  private val bytes: Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    buf
  }
  private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
  private val n = bb.getInt(0)
  private val step = SoABin.stepOf(path)
  // column k's base offset in the SoA layout (4 float32 arrays after count)
  private def base(k: Int) = 4 + 4 * n * k
  private val colIdx = Map("ux" -> 0, "uy" -> 1, "uz" -> 2, "flag" -> 3)

  private var i = -1
  private val row = new GenericInternalRow(columns.length)

  override def next(): Boolean = { i += 1; i < n }

  override def get(): InternalRow = {
    var c = 0
    while (c < columns.length) {
      columns(c) match {
        case "step" => row.setLong(c, step)
        case "particle_id" => row.setLong(c, i.toLong)
        case name => row.setFloat(c, bb.getFloat(base(colIdx(name)) + 4 * i))
      }
      c += 1
    }
    row
  }

  override def close(): Unit = ()
}
