package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with late-data handling — the streaming
  * analytics face of the engine (the reference has no event time at all;
  * this is the Spark-native upgrade SURVEY §2.1 notes as absent).
  *
  * Tumbling windows on the message timestamp with a watermark: late rows
  * inside the allowed lateness still update their window; rows older than
  * the watermark are dropped and their window finalizes. Append mode emits
  * a window only once it is final — the semantics downstream warehouses
  * want from a feed like this.
  */
object WindowedStats {

  /** Per-window, per-key message stats: count, bytes, distinct bodies. */
  def tumbling(stream: DataFrame, windowDur: String = "10 seconds",
               lateness: String = "5 seconds"): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowDur), col("attempts"))
      .agg(
        count(lit(1)).as("n"),
        sum(octet_length(col("body"))).as("total_bytes"),
        approx_count_distinct(col("body")).as("approx_distinct"))
      .select(
        col("window.start").as("w_start"),
        col("window.end").as("w_end"),
        col("attempts"), col("n"), col("total_bytes"), col("approx_distinct"))
}
