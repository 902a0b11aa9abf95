package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase-level profile of `h_minhash_band_design` (round-17 continuation:
  * the query benches ~6.3–6.8 s at sf0.1 — the suite's heaviest — while
  * the same-shape `h_minhash_calibration` sits at ~3.0 s; find the term
  * that differs or pin a measured explanation).
  *
  *   A  sig     corpus double + shingles + 4 md5/gram + 8-way min
  *              aggregate + localCheckpoint (the build the query pays)
  *   B  census  15 band projections off the checkpoint + bucket census
  *              + candidate rollup
  *   C  probe   the +10⁶-offset planted self-join + rung verdicts
  *   D  full    the declared query end to end
  *
  * Usage: sbt "runMain graft.tools.BandDesignProfile [sfDir]" —
  * prints one JSON line with per-phase seconds (median of 3).
  */
object BandDesignProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med3(f: => Unit): Double = {
      f // warm-up
      Seq.fill(3)(timed(f)).sorted.apply(1)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // A: the signature build exactly as the query runs it (checkpoint incl.)
    val a = med3 {
      try noop(graft.operators.TrainingOps.bandSignatures(spark, sfDir))
      finally graft.operators.Checkpoints.releaseAll()
    }
    // B/C: downstream stages off a standing checkpoint
    val sig = graft.operators.TrainingOps.bandSignatures(spark, sfDir)
    System.err.println(s"[profile] band_sig partitions = ${sig.rdd.getNumPartitions}")
    if (sys.env.contains("SPARK_GRAFT_PROFILE_SUM")) {
      val r = sig.selectExpr("count(*)", "sum(h0 % 1000003)", "sum(h7 % 1000003)",
        "count(DISTINCT doc_id)").head()
      System.err.println(s"[profile] sig rows=${r.getLong(0)} h0mod=${r.get(1)} h7mod=${r.get(2)} docs=${r.getLong(3)}")
    }
    if (sys.env.contains("SPARK_GRAFT_PROFILE_PLAN"))
      spark.sql(graft.operators.TrainingOps.bandSignaturesSql("band_sh"))
        .explain(true)
    val b = med3(noop(spark.sql(
      graft.operators.TrainingOps.bandDesignCensusSql("band_sig"))))
    val c = med3(noop(spark.sql(
      graft.operators.TrainingOps.bandDesignProbeSql("band_sig"))))
    graft.operators.Checkpoints.releaseAll()
    // D: the declared query end to end
    val d = med3 {
      try noop(graft.operators.TrainingOps.hMinhashBandDesign(spark, sfDir))
      finally graft.operators.Checkpoints.releaseAll()
    }
    println(f"""{"bench":"band_design_profile","sf":"$sfDir","sig_s":$a%.3f,"census_s":$b%.3f,"probe_s":$c%.3f,"full_s":$d%.3f}""")
    spark.stop()
  }
}
