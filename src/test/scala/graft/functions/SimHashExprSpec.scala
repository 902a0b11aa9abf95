package graft.functions

import org.apache.spark.sql.graft.{Hamming64Expr, SimHash64Expr}

import graft.{SparkSpec, SparkSuite}
import graft.kernel.SimHash
import graft.operators.LlmOps

/** The round-17 UDF→expression promotion contract: `simhash64` /
  * `hamming64` as native codegen expressions must be BYTE-IDENTICAL to
  * the Spark-free kernel the UDFs wrapped — and the declared query that
  * rides them must no longer carry a UDF boundary in its plan. */
class SimHashExprSpec extends SparkSuite {

  test("simhash64/hamming64 expressions match the kernel byte-for-byte") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    val rnd = new scala.util.Random(7)
    val arrays: Seq[Seq[String]] = (1 to 200).map { _ =>
      (0 to rnd.nextInt(30)).map(_ => s"tok${rnd.nextInt(50)} ${rnd.nextPrintableChar()}")
    } :+ Seq.empty[String] // empty token array: all counts 0, fingerprint 0
    val got = arrays.toDF("toks").selectExpr("simhash64(toks) AS fp")
      .collect().map(_.getLong(0)).toSeq
    val want = arrays.map(a => SimHash.simhash64(a))
    assert(got == want, "expression diverged from graft.kernel.SimHash.simhash64")

    val pairs = (1 to 100).map(_ => (rnd.nextLong(), rnd.nextLong()))
    val gh = pairs.toDF("a", "b").selectExpr("hamming64(a, b) AS d")
      .collect().map(_.getInt(0)).toSeq
    assert(gh == pairs.map(p => SimHash.hamming(p._1, p._2)),
      "hamming64 diverged from the kernel popcount")
  }

  test("null handling: null array -> null; null token abstains instead of NPE-ing the scan") {
    GraftFunctions.registerAll(spark)
    val rows = spark.sql(
      """SELECT simhash64(CAST(NULL AS ARRAY<STRING>)) AS null_arr,
        |  simhash64(array('alpha', CAST(NULL AS STRING), 'beta')) AS null_tok,
        |  simhash64(array('alpha', 'beta')) AS no_null,
        |  hamming64(CAST(NULL AS BIGINT), 5) AS null_ham""".stripMargin).collect()
    val r = rows.head
    assert(r.isNullAt(0), "null array must yield null")
    assert(r.getLong(1) == r.getLong(2), "a null token must abstain from the vote")
    assert(r.isNullAt(3), "null input must yield null distance")
  }

  test("interpreted eval agrees with codegen (the fallback path some operators take)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val toks = Seq("one", "two", "two", "three")
    val arr = ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray)
    val lit = Literal.create(arr,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
    assert(SimHash64Expr(lit).eval(null) == SimHash.simhash64(toks))
    assert(Hamming64Expr(Literal(0xF0L), Literal(0x0FL)).eval(null) == 8)
  }

  test("h_simhash_dedup rides the native expression: no UDF boundary in the plan") {
    val plan = LlmOps.hSimhashDedup(spark, SparkSpec.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("simhash64"), s"expected the fingerprint expression:\n$plan")
    assert(!plan.contains("UDF"),
      s"simhash64 must be the native codegen expression, not a Scala UDF:\n$plan")
  }
}
