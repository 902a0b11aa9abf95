package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge, Fnv64aExpr}

/** Column-API facade + SQL registration for the engine's custom functions.
  *
  * Scala callers use the typed functions; SQL callers get the same names via
  * [[registerAll]] (idempotent, safe to call per-session).
  */
object GraftFunctions {

  /** FNV-64a of a binary/string column, as BIGINT (native codegen expr). */
  def fnv64a(c: Column): Column = Bridge.column(Fnv64aExpr(Bridge.expression(c)))

  /** The reference's partition-key rendering of the hash: lowercase hex,
    * no leading zeros (Go `%x`, aggregator.go:30). `hex()` on BIGINT gives
    * uppercase-no-padding, so `lower` completes the match. */
  def fnv64aHex(c: Column): Column = lower(hex(fnv64a(c)))

  /** Reference partition-key rule (aggregator.go:124-130): caller key when
    * 1–255 chars, else body-hash hex. */
  def partitionKey(body: Column, key: Column): Column =
    when(key.isNotNull && length(key).between(1, 255), key).otherwise(fnv64aHex(body))

  def registerAll(spark: SparkSession): Unit = {
    // fnv64a as a real catalyst expression in SQL too
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv64a", exprs => Fnv64aExpr(exprs.head), "scala_udf")
    spark.udf.register("kpl_aggregate", udaf(KplFunctions.KplAggregateAgg))
    spark.udf.register("kpl_pack_ordered",
      udf((rows: Seq[KplIn]) => KplFunctions.packOrdered(rows)))
    spark.udf.register("kpl_deaggregate",
      udf((data: Array[Byte]) => KplFunctions.deaggregate(data)))
    spark.udf.register("kpl_is_aggregated",
      udf((data: Array[Byte]) => data != null && graft.kernel.KplProtobuf.isAggregated(data)))
    spark.udf.register("simhash64",
      udf((tokens: Seq[String]) => graft.kernel.SimHash.simhash64(tokens)))
    spark.udf.register("hamming64",
      udf((a: Long, b: Long) => graft.kernel.SimHash.hamming(a, b)))
  }
}
