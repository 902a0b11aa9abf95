package graft.sources.kinesis

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.CustomMetric
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.streaming.{BatchWriter, FileTransport, InMemoryTransport, KinesisTransport, RetryingTransport}

/** Kinesis-format DSv2 streaming sink:
  * `df.writeStream.format("kinesis-graft").option("stream", …)
  * .option("transport", "file"|"memory").option("dir", …)`.
  *
  * Expects `body BINARY` + `partition_key STRING` (the output of
  * StreamPipeline.transform). Each partition's DataWriter folds rows
  * through [[BatchWriter]] — KPL packing + the 500-record/4.9 MB request
  * bounds — and pushes requests through a retrying transport on commit.
  * The transport seam is where a real AWS SDK client plugs in; the wire
  * format (framed KPL aggregates + partition keys) is already exact.
  *
  * Delivery: writers send on task commit; a failed/retried task re-sends
  * its partition ⇒ at-least-once, same contract as the reference
  * (kinesis_writer.go:114-127 requeue semantics).
  */
class KinesisSinkProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kinesis-graft"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = KinesisSink.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KinesisSinkTable(new CaseInsensitiveStringMap(properties))
}

object KinesisSink {
  val schema: StructType = StructType(Seq(
    StructField("body", BinaryType),
    StructField("partition_key", StringType)))

  def transportFor(options: CaseInsensitiveStringMap): KinesisTransport =
    Option(options.get("transport")).getOrElse("memory") match {
      case "file" => new FileTransport(Option(options.get("dir"))
        .getOrElse(sys.error("kinesis-graft: option 'dir' required for file transport")))
      case "memory" => new InMemoryTransport
      case other => sys.error(s"kinesis-graft: unknown transport '$other'")
    }
}

class KinesisSinkTable(options: CaseInsensitiveStringMap) extends Table with SupportsWrite {
  override def name(): String = s"kinesis:${Option(options.get("stream")).getOrElse("graft")}"
  override def schema(): StructType = KinesisSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = new WriteBuilder {
    override def build(): Write = new Write {
      override def toStreaming: StreamingWrite =
        new KinesisStreamingWrite(
          Option(options.get("stream")).getOrElse("graft"),
          KinesisSink.transportFor(options),
          info.schema())
    }
  }
}

class KinesisStreamingWrite(stream: String, transport: KinesisTransport, schema: StructType)
    extends StreamingWrite with Serializable {

  private val bodyIdx = schema.fieldIndex("body")
  private val keyIdx = schema.fieldIndex("partition_key")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
        new KinesisDataWriter(stream, transport, bodyIdx, keyIdx)
    }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

final case class KinesisCommit(requests: Int, entries: Int) extends WriterCommitMessage

class KinesisDataWriter(
    stream: String, transport: KinesisTransport, bodyIdx: Int, keyIdx: Int)
    extends DataWriter[InternalRow] {

  private val writer = new BatchWriter()
  private val retrying = transport match {
    case rt: RetryingTransport => rt
    case other => new RetryingTransport(other)
  }
  private var n = 0L

  override def write(row: InternalRow): Unit = {
    val key = if (row.isNullAt(keyIdx)) "" else row.getUTF8String(keyIdx).toString
    writer.add(n, row.getBinary(bodyIdx), key)
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    val reqs = writer.flush()
    var entries = 0
    reqs.foreach { req =>
      val oks = retrying.putRecords(stream, req.entries)
      entries += req.entries.size
      if (oks.contains(false))
        throw new java.io.IOException(s"putRecords failed after retries (epoch partition)")
    }
    KinesisCommit(reqs.size, entries)
  }

  override def abort(): Unit = ()
  override def close(): Unit = ()
}
