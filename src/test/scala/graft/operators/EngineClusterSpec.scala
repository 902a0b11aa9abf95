package graft.operators

import java.io.File

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Multi-process proof for the QUERY engine (complement of
  * `NsqClusterSpec`, which proves the streaming source): the same
  * declared queries must produce identical results when tasks execute in
  * separate executor JVMs — real serialization of custom Catalyst
  * expressions (fnv64a, minhash_signature, int8_quant_stats), real
  * shuffle exchanges over the wire, broadcast of dimension tables to
  * remote processes — as they do on local[4] threads. A custom
  * expression that accidentally closed over driver state, or a codec
  * that only works in-process, fails here and nowhere else in the suite.
  *
  * Runs in the same forked "cluster" JVM group as NsqClusterSpec
  * (build.sbt testGrouping): cluster masters cannot share a process with
  * the suite-wide local[4] session. Suites in the group run sequentially,
  * each owning its SparkContext for its lifetime.
  */
class EngineClusterSpec extends AnyFunSuite {

  private val probes = Seq(
    "q1_pricing",       // decimal aggregation + sort
    "c_join_inner",     // broadcast dims to remote executors
    "h_dedup_exact",    // custom Fnv64aExpr serialized to executor codegen
    "h_neardup_minhash",// MinhashSignatureExpr + LSH banding + checkpoint
    "h_embed_quantize", // Int8QuantStatsExpr over array columns
    "h_ivfpq_search",   // two checkpointed collects + broadcast LUT join
    "a_dpp_prune",      // dynamic partition-pruning subquery cross-process
    "h_dedup_incremental", // checkpointed band index consumed by remote executors
    "h_semdedup",       // broadcast centroid collect + c_id self-join cross-process
    "d_recursive_cte",  // recursive-CTE frontier loop across processes
    "d_heavy_hitters",  // count-min partials merged across executors, driver probe
    "h_supplier_rank",  // iterative rank loop over a cross-process checkpointed edge list
    "h_source_overlap", // collect_set partials + checkpointed pair table cross-process
    "h_ann_recall")     // broadcast query panel + centroid chain to remote executors

  test("declared queries return identical results under multi-process execution") {
    assume(new File("/opt/spark/jars").isDirectory, "needs a Spark distribution")
    sys.props("spark.test.home") = "/opt/spark"
    val addOpens = graft.ClusterLaunch.addOpens
    val classesDir = new File("target/scala-2.13/classes").getAbsolutePath

    def run(master: String): Map[String, Seq[String]] = {
      val spark = SparkSession.builder()
        .master(master)
        .appName(s"graft-engine-$master")
        .config("spark.executor.memory", "768m")
        .config("spark.executor.extraClassPath", classesDir)
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      try {
        spark.sparkContext.setLogLevel("WARN")
        probes.map { name =>
          val rows =
            try graft.SparkEntry.queries(name)(spark, graft.SparkSpec.sf0001)
              .collect().map(_.toString).toSeq
            finally Checkpoints.releaseAll()
          name -> rows
        }.toMap
      } finally spark.stop()
    }

    val clustered = run("local-cluster[2,1,1024]")
    val local = run("local[4]")
    probes.foreach { name =>
      assert(clustered(name) == local(name),
        s"$name diverged between local threads and separate executor JVMs")
      assert(local(name).nonEmpty, s"$name returned no rows")
    }
  }

  /** The ten heaviest declared shapes (by the round-18 sf0.1 bench) under
    * the RELIABLE materialization discipline on multi-process executors —
    * the 100 TB deployment posture (round-18 verdict item 1). `local` mode
    * pins executor-local, unreplicated blocks that a lost executor makes
    * unrecoverable; `reliable` checkpoints to shared storage, so this test
    * proves every heavy pipeline (iterative label propagation, 8-superstep
    * rank loops, shared label/vocab tables, LSH shingle checkpoints)
    * produces identical results when its materialization points are
    * reliable files read back across executor JVMs. The full sf0.01
    * ten-heaviest DuckDB-oracle run on local-cluster[2,8,6144] is recorded
    * in BASELINE.md (round 19); this in-suite twin keeps the posture
    * regression-gated at sf0.001. */
  test("ten heaviest shapes: reliable checkpoints on local-cluster match local results") {
    assume(new File("/opt/spark/jars").isDirectory, "needs a Spark distribution")
    sys.props("spark.test.home") = "/opt/spark"
    val heavies = Seq(
      "h_simjoin_prefix", "h_rank_convergence", "h_doc_repetition",
      "h_minhash_calibration", "h_dup_ngrams", "h_pq_recall",
      "h_split_leakage", "a_column_stats", "h_ivfpq_search", "h_dedup_spans")
    val addOpens = graft.ClusterLaunch.addOpens
    val classesDir = new File("target/scala-2.13/classes").getAbsolutePath

    def run(master: String, mode: Option[String]): Map[String, Seq[String]] = {
      val spark = SparkSession.builder()
        .master(master)
        .appName(s"graft-heavy-$master")
        .config("spark.executor.memory", "768m")
        .config("spark.executor.extraClassPath", classesDir)
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      Checkpoints.modeOverride = mode
      try {
        spark.sparkContext.setLogLevel("WARN")
        heavies.map { name =>
          val rows =
            try graft.SparkEntry.queries(name)(spark, graft.SparkSpec.sf0001)
              .collect().map(_.toString).toSeq
            finally Checkpoints.releaseAll()
          name -> rows
        }.toMap
      } finally {
        Checkpoints.modeOverride = None
        Checkpoints.releaseShared()
        spark.stop()
      }
    }

    val clustered = run("local-cluster[2,1,1024]", Some("reliable"))
    val local = run("local[4]", None)
    heavies.foreach { name =>
      assert(clustered(name) == local(name),
        s"$name diverged between reliable-checkpoint cluster execution and local threads")
      assert(local(name).nonEmpty, s"$name returned no rows")
    }
  }
}
