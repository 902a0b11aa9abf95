package graft.sources.kinesis

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.kernel.KplProtobuf
import graft.streaming.{InMemoryTransport, Msg, StreamPipeline}

class KinesisSinkSpec extends SparkSuite {

  test("writeStream.format(kinesis-graft) packs and delivers through the DSv2 sink") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    InMemoryTransport.clear()
    val input = MemoryStream[Msg]
    input.addData((0 until 120).map(i =>
      Msg(f"$i%016d", new Timestamp(1000000000L + i), 1, s"rec-$i".getBytes)))

    val q = StreamPipeline.transform(input.toDF())
      .selectExpr("body", "partition_key")
      .writeStream
      .format("kinesis-graft")
      .option("stream", "dsv2")
      .option("transport", "memory")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ksink").toString)
      .start()
    try q.processAllAvailable() finally q.stop()

    val delivered = InMemoryTransport.drain()
    assert(delivered.forall(_._1 == "dsv2"))
    val user = delivered.flatMap { case (_, e) =>
      if (KplProtobuf.isAggregated(e.data)) KplProtobuf.deframe(e.data).records.map(_.data)
      else Vector(e.data)
    }
    assert(user.map(new String(_)).toSet === (0 until 120).map(i => s"rec-$i").toSet)
  }

  test("file transport writes framed entries to disk") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("kfile").toString
    val input = MemoryStream[Msg]
    input.addData((0 until 10).map(i =>
      Msg(f"$i%016d", new Timestamp(1000000000L + i), 1, s"file-$i".getBytes)))
    val q = StreamPipeline.transform(input.toDF())
      .selectExpr("body", "partition_key")
      .writeStream.format("kinesis-graft")
      .option("stream", "fstream").option("transport", "file").option("dir", dir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("kfile-ckpt").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val files = new java.io.File(dir).listFiles()
    assert(files != null && files.nonEmpty)
    assert(files.forall(_.getName.startsWith("fstream-p")))
    assert(files.map(_.length()).sum > 0)
  }

  test("unknown transport option fails with a named error") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[Msg]
    input.addData(Seq(Msg("0000000000000000", new Timestamp(0), 1, "x".getBytes)))
    val ex = intercept[Exception] {
      val q = StreamPipeline.transform(input.toDF())
        .selectExpr("body", "partition_key")
        .writeStream.format("kinesis-graft")
        .option("transport", "carrier-pigeon")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("kbad").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(ex.getMessage.contains("carrier-pigeon") ||
      Option(ex.getCause).exists(_.getMessage.contains("carrier-pigeon")))
  }
}
