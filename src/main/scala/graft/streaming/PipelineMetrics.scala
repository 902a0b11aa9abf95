package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Pipeline observability — the Spark-native home for the reference's
  * Size()/Count()/Recs() stats and shutdown log lines (aggregator.go:185-205,
  * kinesis_writer.go:155-158): per-batch progress from the engine's own
  * listener bus, no instrumentation inside operators.
  */
final class PipelineMetrics extends StreamingQueryListener {

  final case class BatchStats(
      queryName: String, batchId: Long, numInputRows: Long,
      inputRowsPerSecond: Double, processedRowsPerSecond: Double,
      stateRows: Long)

  val batches = new ConcurrentLinkedQueue[BatchStats]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val stateRows = Option(p.stateOperators).map(_.map(_.numRowsTotal).sum).getOrElse(0L)
    batches.add(BatchStats(
      Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
      p.inputRowsPerSecond, p.processedRowsPerSecond, stateRows))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  def totalInputRows: Long = {
    var sum = 0L
    batches.forEach(b => sum += b.numInputRows)
    sum
  }
}

object PipelineMetrics {
  /** Attach a fresh metrics listener to the session. */
  def attach(spark: SparkSession): PipelineMetrics = {
    val m = new PipelineMetrics
    spark.streams.addListener(m)
    m
  }
}
