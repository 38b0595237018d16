package graft.sources.v2

import java.util
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** K1/K2 as a DataSource V2 WRITE path with a staged-commit protocol —
  * the mechanism that makes a distributed sink exactly-once under task
  * retries and speculative execution (the reference gets the same
  * guarantee from BigQuery load jobs; see the staging + MERGE helper
  * `core/extract/helpers/extractor_bq_helpers.py:40-125`):
  *
  *  1. every task attempt writes its rows to
  *     `<path>/_staging_<jobId>/part-<partition>-<task>.parquet`;
  *  2. only attempts that reach `DataWriter.commit` report their file in
  *     a commit message;
  *  3. `BatchWrite.commit` moves exactly the reported files into the
  *     table directory (truncating first for overwrite mode) and deletes
  *     the staging dir — orphan files from failed/duplicate attempts
  *     vanish with it;
  *  4. `BatchWrite.abort` deletes staging wholesale, leaving the table
  *     untouched.
  *
  * Task files are real parquet (Spark's own ParquetWriteSupport over
  * InternalRow), so `spark.read.parquet` reads the table back with full
  * fidelity. Usage:
  * {{{
  *   df.write.format("graft.sources.v2.GraftParquetSinkProvider")
  *     .option("path", dir).mode(SaveMode.Append).save()
  * }}}
  */
class GraftParquetSinkProvider extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only source: schema always comes from the frame
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftSinkTable(schema, properties.asScala.toMap)
}

class GraftSinkTable(writeSchema: StructType, props: Map[String, String])
    extends Table with SupportsWrite {
  override def name(): String = s"graft-sink:${props.getOrElse("path", "?")}"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftSinkWriteBuilder(
      props.getOrElse("path", sys.error("graft-sink: 'path' option required")),
      info.schema(), truncate = false)
}

class GraftSinkWriteBuilder(path: String, schema: StructType, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new GraftSinkWriteBuilder(path, schema, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftSinkBatchWrite(path, schema, truncate)
  }
}

class GraftSinkBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {
  private val jobId = UUID.randomUUID().toString
  private def stagingDir = new Path(path, s"_staging_$jobId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // runs on the driver: capture the parquet conf keys
    // ParquetWriteSupport/SchemaConverter assert on (ParquetFileFormat
    // normally injects these). RuntimeConfig.get resolves registered
    // defaults, so unset entries still yield their effective value.
    val sessionConf = org.apache.spark.sql.SparkSession.active.conf
    val parquetConf = Seq(
      "spark.sql.parquet.writeLegacyFormat",
      "spark.sql.parquet.outputTimestampType",
      "spark.sql.parquet.fieldId.write.enabled",
      "spark.sql.parquet.variant.annotateLogicalType.enabled",
      "spark.sql.parquet.inferTimestampNTZ.enabled",
      "spark.sql.parquet.datetimeRebaseModeInWrite",
      "spark.sql.parquet.int96RebaseModeInWrite"
    ).flatMap(k => scala.util.Try(sessionConf.get(k)).toOption.map(k -> _)).toMap
    new GraftSinkWriterFactory(path, jobId, schema, parquetConf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    val dest = new Path(path)
    fs.mkdirs(dest)
    if (truncate) {
      fs.listStatus(dest).filterNot(_.getPath.getName.startsWith("_staging_"))
        .foreach(st => fs.delete(st.getPath, true))
    }
    // move exactly the files committed tasks reported; stragglers die
    // with the staging dir below
    messages.foreach { case GraftCommitMessage(file) =>
      fs.rename(new Path(stagingDir, file), new Path(dest, file))
    }
    fs.delete(stagingDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    fs.delete(stagingDir, true)
  }
}

final case class GraftCommitMessage(file: String) extends WriterCommitMessage

class GraftSinkWriterFactory(path: String, jobId: String, schema: StructType,
                             parquetConf: Map[String, String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftSinkDataWriter(path, jobId, schema, parquetConf, partitionId, taskId)
}

class GraftSinkDataWriter(path: String, jobId: String, schema: StructType,
                          parquetConf: Map[String, String],
                          partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val fileName = f"part-$partitionId%05d-$taskId.parquet"
  private val filePath = new Path(new Path(path, s"_staging_$jobId"), fileName)

  private val writer: ParquetWriter[InternalRow] = {
    val conf = new Configuration()
    parquetConf.foreach { case (k, v) => conf.set(k, v) }
    ParquetWriteSupport.setSchema(schema, conf)
    new InternalRowParquetBuilder(filePath)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  override def write(record: InternalRow): Unit = writer.write(record)

  override def commit(): WriterCommitMessage = {
    writer.close()
    GraftCommitMessage(fileName)
  }

  override def abort(): Unit = {
    // a writer that already failed mid-write may throw on close; abort
    // must not mask the original task failure
    try writer.close() catch { case _: Throwable => }
    val fs = filePath.getFileSystem(new Configuration())
    fs.delete(filePath, false) // best-effort; staging cleanup is the backstop
  }

  override def close(): Unit = ()
}

private class InternalRowParquetBuilder(path: Path)
    extends ParquetWriter.Builder[InternalRow, InternalRowParquetBuilder](path) {
  override def self(): InternalRowParquetBuilder = this
  override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
    new ParquetWriteSupport
}
