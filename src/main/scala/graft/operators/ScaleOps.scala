package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scale techniques as first-class, verified operators: bucketed co-located
  * joins (shuffle elimination), salted joins (skew mitigation), and
  * event-time bucketing over the nanosecond stream table. Each produces the
  * same answer as its naive formulation — the oracle proves semantics, the
  * plan/spec proves the physical property.
  */
object ScaleOps {

  // ---------------------------------------------------------------- bucketed join

  /** Write lineitem+orders bucketed by the join key, then join the bucketed
    * tables: both sides pre-partitioned ⇒ SortMergeJoin with NO Exchange —
    * at 100 TB this is the difference between a full-fabric shuffle and a
    * local merge per bucket. Oracle: identical aggregate over a plain join. */
  /** One-time per-session setup: (re)create the bucketed copies as
    * EXTERNAL tables (explicit `path`). The in-memory catalog forgets
    * tables across JVMs while warehouse dirs persist; managed-table CTAS
    * refuses a pre-existing location, but overwriting an external location
    * is the supported lifecycle — no hand-rolled directory deletion
    * (round-4 review: filesystem surgery inside a query is a path bug away
    * from disaster). */
  private def ensureBucketedTables(s: SparkSession, dir: String, li: String, ord: String): Unit =
    if (!s.catalog.tableExists(li)) {
      val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      s.sql(s"DROP TABLE IF EXISTS $li")
      s.sql(s"DROP TABLE IF EXISTS $ord")
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
        .write.mode("overwrite").option("path", s"$wh/$li")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(li)
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .write.mode("overwrite").option("path", s"$wh/$ord")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ord)
    }

  def cJoinBucketed(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val li = "graft_bl_" + tag
    val ord = "graft_bo_" + tag
    ensureBucketedTables(s, dir, li, ord)
    s.table(li).join(s.table(ord), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

  val cJoinBucketedSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- salted join

  /** Salted equi-join for skewed keys: the fact side explodes each row's key
    * into (key, salt), the dimension side replicates per salt, the join runs
    * on (key, salt) so one hot key spreads over `salts` reducers. Answer is
    * identical to the naive join — verified by oracle. (AQE's skew-join
    * handles sort-merge skew automatically; explicit salting remains the
    * tool when AQE can't, e.g. aggregations keyed on the hot column.) */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val salted = fact.withColumn("_salt", (rand(42) * salts).cast("int"))
    val replicated = dim.crossJoin(
      fact.sparkSession.range(salts.toLong).select(col("id").cast("int").as("_salt")))
    salted.join(replicated,
      salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
  }

  /** Revenue per order-status via a salted join on o_orderkey (lineitem is
    * the "skewed" fact here; semantics must equal the plain join). */
  def cJoinSalted(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice"))
    val ord = Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"))
    saltedJoin(li.withColumnRenamed("l_orderkey", "k"), ord.withColumnRenamed("o_orderkey", "k"), "k", 8)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy(col("o_orderstatus"))
  }

  val cJoinSaltedSql: String =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- event-time over ns stream

  /** Per-minute event rates over the nanosecond-timestamped events table
    * (ts is BIGINT nanos on the Spark side — see the nanosAsLong session
    * conf; DuckDB reads the same column as TIMESTAMP_NS natively). */
  def gEventRate(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(
        date_trunc("minute", expr("timestamp_micros(ts div 1000)")).as("minute"),
        col("event_type"), col("value"))
      .groupBy(col("minute"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("total_value"))
      .orderBy(col("minute"), col("event_type"))

  val gEventRateSql: String =
    """SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute, event_type,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY minute, event_type""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c_join_bucketed" -> (cJoinBucketed _),
    "c_join_salted" -> (cJoinSalted _),
    "g_event_rate" -> (gEventRate _)
  )

  def oracle: Map[String, String] = Map(
    "c_join_bucketed" -> cJoinBucketedSql,
    "c_join_salted" -> cJoinSaltedSql,
    "g_event_rate" -> gEventRateSql
  )
}
