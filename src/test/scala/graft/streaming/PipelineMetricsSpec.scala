package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

class PipelineMetricsSpec extends SparkSuite {

  test("listener reports per-batch input rows and dedup state size") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    InMemoryTransport.clear()
    val metrics = PipelineMetrics.attach(spark)
    val input = MemoryStream[Msg]
    input.addData((0 until 40).map(i =>
      Msg(f"$i%016d", new Timestamp(1000000000L + i), 1, s"m-$i".getBytes)))
    val q = StreamPipeline.build(input.toDF(), new InMemoryTransport,
      StreamPipeline.Options(streamName = "metrics",
        checkpoint = java.nio.file.Files.createTempDirectory("m-ckpt").toString))
      .start()
    try { q.processAllAvailable() } finally q.stop()
    spark.streams.removeListener(metrics)
    // listener events are async; drain with a deadline
    val deadline = System.currentTimeMillis() + 10000
    while (metrics.totalInputRows < 40 && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    assert(metrics.totalInputRows >= 40)
    assert(metrics.batches.stream().anyMatch(b => b.stateRows > 0)) // dedup state visible
  }
}
