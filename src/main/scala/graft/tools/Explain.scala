package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspector: `sbt "runMain graft.tools.Explain <query|ALL> [sfDir]"`
  * prints explain("formatted") for SparkEntry queries — the loop used to
  * iterate on physical plans (broadcasts, pushed filters, codegen spans)
  * before accepting an operator as scale-ready.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("ALL")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (name == "ALL") graft.SparkEntry.queries
             else { // comma-separated names also accepted
               val want = name.split(',').toSet
               graft.SparkEntry.queries.filter(kv => want.contains(kv._1))
             }
    qs.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      println(s"\n===== $n =====")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
      // queries that localCheckpoint intermediates materialize them EAGERLY
      // at build time — release per query or an ALL sweep hoards storage
      finally graft.operators.Checkpoints.releaseAll()
    }
    spark.stop()
  }
}
