package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.{SparkSpec, SparkSuite, Tables}
import graft.operators.{Checkpoints, TrainingOps}

/** The tenth twin's contract: the streaming prefix-filter join emits
  * EXACTLY the batch `h_simjoin_prefix` pair set — same pairs, same exact
  * `jac_milli` — regardless of micro-batch chunking, arrival order, or a
  * stop → restart from the same RocksDB checkpoint in the middle of the
  * corpus. The batch arm supplies truth; the restart makes this twin's
  * standing-inverted-index claim a tested property, not prose. */
class StreamingSimJoinSpec extends SparkSuite {

  private def await(cond: () => Boolean, what: String, timeoutMs: Long = 90000L): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline && !cond()) Thread.sleep(250)
    assert(cond(), s"timed out waiting for $what")
  }

  test("streamed corpus emits exactly the batch pair set, across a mid-corpus restart") {
    import spark.implicits._
    implicit val sql = spark.sqlContext

    // truth: the batch AllPairs join over the same corpus
    val batch = TrainingOps.hSimjoinPrefix(spark, SparkSpec.sf0001)
      .select("a_id", "b_id", "jac_milli").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    Checkpoints.releaseAll()
    assert(batch.nonEmpty, "sf0.001 must contain J >= 0.6 pairs for this test to bite")

    val docs = Tables.load(spark, SparkSpec.sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (wave1, wave2) = docs.splitAt(docs.length * 3 / 5)

    val input = MemoryStream[(Long, String)]
    val captured = new ConcurrentHashMap[Long, Array[StreamingSimJoin.SimPair]]()
    val ckpt = java.nio.file.Files.createTempDirectory("simjoin-ckpt").toString
    def start() = StreamingSimJoin(input.toDF().toDF("doc_id", "text"))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamingSimJoin.SimPair], id: Long) =>
        val rows = df.collect()
        if (rows.nonEmpty) captured.put(id, rows)
        ()
      }
      .outputMode(OutputMode.Append())
      .trigger(Trigger.ProcessingTime(200L))
      .option("checkpointLocation", ckpt)
      .start()

    def pairs(): Set[(Long, Long, Long)] =
      captured.asScala.values.flatten.map(p => (p.a_id, p.b_id, p.jac_milli)).toSet

    val q1 = start()
    try {
      input.addData(wave1)
      // within-wave pairs must land before the restart proves anything
      await(() => pairs().nonEmpty, "first-wave pairs")
      Thread.sleep(1500L) // let the enrollment commits land
    } finally q1.stop()

    // restart from the SAME checkpoint: the standing inverted index must
    // still hold wave 1's prefixes, or cross-wave pairs silently vanish
    val q2 = start()
    try {
      input.addData(wave2)
      await(() => pairs() == batch,
        s"stream set (${pairs().size}) to equal batch set (${batch.size})")
    } finally q2.stop()

    assert(pairs() == batch,
      s"missing: ${(batch -- pairs()).take(5)}; extra: ${(pairs() -- batch).take(5)}")
  }
}
