package graft.avro

import java.util
import scala.jdk.CollectionConverters._
import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 Avro reader (SURVEY §4 source family; the row-format
  * interchange sibling of the ORC gate).
  *
  * Parallelism: Avro container files are block-splittable on their
  * 16-byte sync markers, so the InputPartition is a BYTE RANGE, not a
  * file — `maxSplitBytes` (default 32 MB) ranges per file, each reader
  * seeking to the first sync ≥ its range start and draining blocks
  * until `pastSync(end)` (the classic split contract: every block is
  * owned by exactly the split containing its starting sync). A single
  * 100 GB landing file therefore fans out across the cluster instead
  * of pinning one task — the property that distinguishes this from
  * the file-per-task XML/XLSX sources, whose formats cannot split.
  *
  * Column pruning reaches the DECODER, not just the row builder:
  * the pruned Spark schema is re-projected onto the file's own writer
  * schema and installed as the GenericDatumReader's expected schema,
  * so Avro schema resolution skips non-required fields during decode
  * (`.explain` shows the pruned ReadSchema). Predicates are not pushed
  * — Avro blocks carry no min/max statistics to prune with, so a
  * post-scan filter costs the same either way. */
class AvroDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Avro.sparkSchema(Avro.fileSchema(
      AvroDataSource.listFiles(options.get("path")).head._1))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(schema, new CaseInsensitiveStringMap(properties))
}

object AvroDataSource {
  /** (path, length) for each non-empty file under `path`. */
  private[avro] def listFiles(path: String): Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val st = fs.getFileStatus(p)
    if (st.isDirectory)
      fs.listStatus(p).filter(s => s.isFile && s.getLen > 0)
        .map(s => (s.getPath.toString, s.getLen)).sortBy(_._1).toSeq
    else Seq((path, st.getLen))
  }
}

private[avro] class AvroTable(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-avro:${options.get("path")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(tableSchema, options)
}

private[avro] class AvroScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {
  private var required: StructType = full
  private var limit: Int = -1
  override def pruneColumns(r: StructType): Unit = required = r
  /** Per-SPLIT cap: each byte-range reader stops decoding after `l`
    * records; Spark keeps the global Limit (hence false). */
  override def pushLimit(l: Int): Boolean = { limit = l; false }
  override def build(): Scan = new AvroScan(required, limit, options)
}

private[avro] class AvroScan(required: StructType, limit: Int,
    options: CaseInsensitiveStringMap) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro ${options.get("path")} " +
      (if (limit >= 0) s"PushedLimit: $limit, " else "") +
      s"ReadSchema: ${required.catalogString}"
  override def planInputPartitions(): Array[InputPartition] = {
    val splitBytes = options.getLong("maxSplitBytes", 32L << 20)
    AvroDataSource.listFiles(options.get("path")).flatMap { case (f, len) =>
      (0L until len by splitBytes).map(start =>
        AvroSplitPartition(f, start, math.min(splitBytes, len - start)))
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required, limit)
}

private[avro] case class AvroSplitPartition(file: String, start: Long, length: Long)
    extends InputPartition

private[avro] class AvroReaderFactory(required: StructType, limit: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[AvroSplitPartition]
    new PartitionReader[InternalRow] {
      private val datumReader = new GenericDatumReader[GenericRecord]()
      private val reader = DataFileReader.openReader(
        new FsInput(new Path(part.file), new Configuration()), datumReader)
      // Project the pruned Spark schema onto the FILE's writer schema
      // (not a re-derived one) so resolution stays correct even if the
      // file carries extra fields or a different field order.
      private val projected: Schema = {
        val fileSchema = reader.getSchema
        val byName = fileSchema.getFields.asScala.map(f => f.name -> f).toMap
        val fields = required.fieldNames.toSeq.map { n =>
          val f = byName.getOrElse(n, throw new IllegalArgumentException(
            s"graft-avro: column '$n' absent from ${part.file}"))
          new Schema.Field(f.name, f.schema(), null, null)
        }
        Schema.createRecord(fileSchema.getName, null,
          fileSchema.getNamespace, false, fields.asJava)
      }
      datumReader.setExpected(projected)
      reader.sync(part.start) // first sync point at/after range start
      private val converters: Array[AnyRef => Any] =
        required.fields.map(f => converter(f.dataType))
      private var cur: GenericRecord = _
      private var emitted = 0
      override def next(): Boolean =
        if ((limit < 0 || emitted < limit) && reader.hasNext &&
            !reader.pastSync(part.start + part.length)) {
          cur = reader.next(); emitted += 1; true
        } else false
      override def get(): InternalRow = {
        val vals = new Array[Any](required.length)
        var i = 0
        while (i < vals.length) {
          val v = cur.get(i)
          vals(i) = if (v == null) null else converters(i)(v)
          i += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = reader.close()
    }
  }

  private def converter(dt: DataType): AnyRef => Any = dt match {
    case StringType => v => UTF8String.fromString(v.toString) // Utf8 or String
    case BinaryType => v => {
      val bb = v.asInstanceOf[java.nio.ByteBuffer]
      val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
    }
    case _ => identity // int/long/float/double/boolean box straight through
  }
}
