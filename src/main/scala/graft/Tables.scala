package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every table is registered as a temp view so queries can be expressed
  * either through the DataFrame API or `spark.sql`. Reads are plain
  * parquet scans — Catalyst handles column pruning / predicate pushdown,
  * and at 100 TB the same code path picks up partition pruning for
  * directory-partitioned layouts with zero changes here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register all tables of a scale-factor directory as temp views. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
