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

    // X-Ray-style per-stage attribution (round 14): the engine's own
    // segment durations must be captured and roll up into the
    // where-does-the-time-go table — addBatch (the sink work) must be
    // attributed, and every share must be a sane millis value
    assert(metrics.batches.stream().anyMatch(b => b.segments.contains("addBatch")),
      "per-batch segment durations must be captured from the progress event")
    assert(metrics.batches.stream().anyMatch(b => b.stateSegments.contains("stateCommit")),
      "state-store segments must be captured for the stateful dedup")
    val attr = metrics.attribution
    assert(attr.contains("addBatch"))
    assert(attr.contains("stateCommit"))
    attr.foreach { case (k, (ms, share)) =>
      assert(ms >= 0L && share >= 0L, s"segment $k has negative attribution")
    }
    // engine segments partition the trigger wall: no single segment can be
    // attributed more than the whole (shares are ‰ of total trigger time)
    val engineOnly = attr -- Seq("stateUpdate", "stateRemove", "stateCommit")
    engineOnly.foreach { case (k, (_, share)) =>
      assert(share <= 1000L, s"engine segment $k claims ${share}‰ > 1000‰ of the trigger wall")
    }
    assert(metrics.traceLine.startsWith("trigger="), metrics.traceLine)
  }
}
