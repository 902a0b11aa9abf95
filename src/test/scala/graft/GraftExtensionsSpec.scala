package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves the cluster-wide injection path: a session built with ONLY
  * `spark.sql.extensions=graft.GraftExtensions` (no registerAll call)
  * resolves every native function by name — the spark-submit deployment
  * mode the README documents.
  *
  * Isolation: the builder must create a NEW session (the suite-shared one
  * has registerAll applied, which would make this pass vacuously), so the
  * default/active session is cleared first and restored after; the session
  * is NOT stopped (it shares the JVM-wide SparkContext). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions-only session resolves the native function surface") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // withExtensions = the same injection hook spark.sql.extensions
      // resolves to; the config form only applies at SparkContext creation
      // (it is a static conf), which a shared-JVM test can't control.
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-spec")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", 2)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      prevDefault.foreach(p => assert(spark ne p, "builder reused the registerAll'd session"))
      val row = spark.sql(
        """SELECT
          |  fnv64a('hello') AS h,
          |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
          |  round(cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)), 6) AS cs,
          |  size(minhash_signature(array(1L, 2L, 3L), 8)) AS sig_len,
          |  size(hyperplane_bands(array(1.0d, -1.0d), 4, 4)) AS n_bands,
          |  size(hyperplane_probes(array(1.0d, -1.0d), 8, 3)) AS n_probes
          |""".stripMargin).head()
      assert(row.getLong(0) === graft.kernel.Fnv64a.hash("hello"))
      assert(row.getDouble(1) === 11.0)
      assert(row.getDouble(2) === 1.0)
      assert(row.getInt(3) === 8)
      assert(row.getInt(4) === 4)
      assert(row.getInt(5) === 3)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
