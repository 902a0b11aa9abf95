package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ArrayDotProduct, Bridge, Fnv64aExpr, MinhashSignatureExpr}

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

  /** dot(a, b) over double arrays — codegen'd native expression. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(ArrayDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** k-permutation MinHash signature over pre-hashed shingles. */
  def minhashSignature(hashes: Column, k: Int): Column =
    Bridge.column(MinhashSignatureExpr(Bridge.expression(hashes), k))

  /** Cosine similarity over double arrays, composed from the codegen'd
    * dot product (the SURVEY §7 `cosine_sim` surface). */
  def cosineSim(a: Column, b: Column): Column =
    dotProduct(a, b) / (sqrt(dotProduct(a, a)) * sqrt(dotProduct(b, b)))

  /** Sessions already registered — re-registration is correct but spams
    * "replaced a previously registered function" warnings from every query
    * helper, so guard once per session instance. Weak keys: the guard must
    * not pin stopped sessions in memory. */
  private val registered =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]))

  def registerAll(spark: SparkSession): Unit = {
    if (!registered.add(spark)) return
    // native expressions: same builders the GraftExtensions entry point uses
    org.apache.spark.sql.graft.GraftBuilders.all.foreach { case (name, builder, _) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
    spark.udf.register("kpl_aggregate", udaf(KplFunctions.KplAggregateAgg))
    // simhash64 / hamming64 were Scala UDFs through round 16; they are
    // native codegen expressions now (SimHashExprs.scala) and register
    // through GraftBuilders.all above like every other expression.
    // The kpl_pack_ordered / kpl_deaggregate / kpl_is_aggregated scalar
    // udfs were retired in round 18: every SQL path packs through the
    // kpl_aggregate UDAF and unpacks through the native
    // kpl_deaggregate_rows Generator; the Scala-level codecs remain on
    // [[KplFunctions]] for direct callers.
  }
}
