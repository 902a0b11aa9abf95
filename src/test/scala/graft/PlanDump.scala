package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` physical plans for selected
  * declared queries (default: a representative heavy set) so plan quality
  * is reviewable as text (PLANS.md) without re-running anything.
  *
  * Run: `sbt "Test/runMain graft.PlanDump /root/testdata/sf0.001 /tmp/plans.txt [name ...]"`
  */
object PlanDump {
  private val defaults = Seq(
    "c_join_inner", "c_join_bloom", "c_join_bucketed", "c_join_asof",
    "h_neardup_minhash", "h_dedup_spans", "h_decontaminate",
    "h_ann_ivf", "g_session_window", "d_agg_approx")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/tmp/plans.txt")
    val names = if (args.length > 2) args.drop(2).toSeq else defaults
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    names.foreach { name =>
      val df =
        try SparkEntry.queries(name)(spark, sfDir)
        finally graft.operators.Checkpoints.releaseAll()
      sb.append(s"==== $name ====\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"[plandump] wrote ${names.size} plans to $out")
    spark.stop()
  }
}
