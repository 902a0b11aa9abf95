package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** The canonical event-time column: `tus`, epoch-micros BIGINT.
    *
    * `events.ts` is a LOGICAL instant whose PHYSICAL parquet encoding has
    * drifted across data generations — INT64 TIMESTAMP(NANOS) (surfaced as
    * BIGINT nanos under `nanosAsLong`), TIMESTAMP_MICROS adjusted-to-UTC
    * (Spark TIMESTAMP), and TIMESTAMP_MICROS isAdjustedToUTC=0 (Spark
    * TIMESTAMP_NTZ). Round 10 hard-coded one encoding in eleven call sites
    * and a regeneration broke all eleven at once; this helper is the single
    * place that knows the encoding, so every event-time query binds to
    * `tus` and survives the next drift. The NTZ branch relies on the
    * session running in UTC (all graft entrypoints set
    * `spark.sql.session.timeZone=UTC`), making the naive-wall-time →
    * instant reinterpretation exact and matching DuckDB's `epoch_us(ts)`
    * on the same file. Purely a projection: pushdown/pruning on the scan
    * are unaffected, and the derived column codegens as one long op.
    */
  def tusColumn(df: DataFrame, tsCol: String = "ts"): Column =
    df.schema(tsCol).dataType match {
      case LongType         => expr(s"$tsCol div 1000")   // INT64 nanos
      case TimestampType    => unix_micros(col(tsCol))
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType))
      case other => throw new IllegalStateException(
        s"unsupported physical type for events.$tsCol: $other")
    }

  /** Events with the canonical `tus` (epoch-micros BIGINT) appended. */
  def eventsCanonical(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.withColumn("tus", tusColumn(raw).cast(LongType))
  }

  /** Register the canonical events view (raw columns + `tus`). */
  def registerEvents(spark: SparkSession, sfDir: String): Unit =
    eventsCanonical(spark, sfDir).createOrReplaceTempView("events")

  /** Register all tables of a scale-factor directory as temp views. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
