package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at the driver-provided
  * scale factor and prints ONE JSON line. A full warm-up pass absorbs
  * JVM/codegen/first-scan costs so per-query numbers reflect steady state;
  * queries run in name order for run-to-run comparability.
  *
  * Each query is materialized through a `noop`-format write, not `count()`:
  * under a count Catalyst prunes every unreferenced projection and sort, so
  * scalar-heavy queries would time scan+filter instead of the declared work.
  * The noop sink consumes every row of every column with zero sink cost —
  * the closest local analogue to "produce the full result".
  *
  * A query that throws is reported in a `failed` list (and its timing is
  * excluded from the total) instead of being silently swallowed.
  *
  * Spike self-adjudication: any query whose timed-pass wall exceeds
  * [[Bench.SpikeThresholdSec]] is re-run once at the end of the sequence
  * (same JVM, caches warm) and both numbers are recorded under `"spikes"`
  * as {"spike": first, "floor": rerun}. Host co-tenant load produces
  * phantom 2-10x outliers in single-run artifacts (two rounds of manual
  * quiesced adjudication, e.g. q1_pricing 11.6s vs 0.73s floor); a floor
  * near the recorded baseline proves load, a floor near the spike proves a
  * plan regression — the artifact now carries the evidence itself. The
  * 1-minute /proc/loadavg is snapshotted before and after the timed pass
  * for the same reason.
  */
object Bench {
  /** Above this single-run wall time a query is re-run for a floor. */
  val SpikeThresholdSec = 5.5

  private def loadavg1m(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.split(' ')(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default = all cores (the target config is local[32]); round-3 driver
    // runs were ~2× the recorded baseline largely because the unset env var
    // fell back to local[4]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // SPARK_GRAFT_MASTER: run the SAME bench on local-cluster[n,c,mem]
    // (multi-JVM executors) — with SPARK_GRAFT_MATERIALIZE=reliable this
    // times the 100 TB deployment shape, not just its correctness
    // (round-19 verdict item 3). Same wiring recipe as graft.Verify.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = ClusterLaunch.wire(SparkSession.builder().master(master), master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop-write the full result, then release any localCheckpoint blocks
    // the query registered — without this, a 78-query session accumulates
    // leaked storage blocks (shingle tables, label-propagation rounds) for
    // the JVM's lifetime and starves execution memory for later queries
    def materialize(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      finally graft.operators.Checkpoints.releaseAll()

    // optional comma-separated filter for focused perf iteration
    // (SPARK_GRAFT_QUERIES=h_neardup_minhash,...); the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(',').toSet)
    // a misspelled name would otherwise silently select zero queries and
    // produce an empty-but-successful bench run
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(
          s"[bench] WARNING: unknown query names in SPARK_GRAFT_QUERIES: ${unknown.toSeq.sorted.mkString(",")}")
    }
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }

    // warm-up: one full pass absorbs JVM/codegen/footer costs and one-time
    // side effects (bucketed-table writes, roundtrip dirs) so the timed pass
    // measures steady state
    // a warm-up failure is logged (not fatal): a query that fails only once
    // would otherwise silently shift its one-time cost into the timed pass
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try materialize(fn) catch {
        case e: Throwable =>
          System.err.println(s"[bench] warm-up $name threw: ${e.getMessage}")
      }
    }

    val loadBefore = loadavg1m()
    var failed = List.empty[String]
    val results = selected.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        materialize(fn)
        Some(name -> (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name
          None
      }
    }
    val loadAfter = loadavg1m()

    // spike adjudication: one same-JVM rerun per outlier, after the full
    // sequence (so the rerun competes with nothing else in this process).
    // A rerun that throws is recorded with floor=null (and the name appended
    // to `failed`) — a query that succeeded timed but fails on rerun is
    // flaky evidence the artifact must carry, not silently drop.
    val spikes = results.filter(_._2 > SpikeThresholdSec).map { case (name, spike) =>
      val t0 = System.nanoTime()
      try {
        materialize(selected(name))
        val floor = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] spike $name: $spike%.2fs -> floor $floor%.2fs")
        name -> (spike, Some(floor))
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] spike rerun $name THREW: ${e.getMessage}")
          failed ::= name
          name -> (spike, None)
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sp = spikes.map { case (k, (s, f)) =>
      "\"" + k + "\":{\"spike\":" + s + ",\"floor\":" + f.map(_.toString).getOrElse("null") + "}"
    }.mkString("{", ",", "}")
    val fs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spikes":$sp,"loadavg":{"before":$loadBefore,"after":$loadAfter},"failed":$fs,"sf":"$sfDir"}"""
    println(json)
    // the driver tails sbt stdout, where the JSON line drowns in log noise
    // (BENCH_r13.json came back "parsed": null); also write it to a file so
    // the artifact carries structured data
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    // The driver's artifact keeps only the LAST 2000 chars of stdout and
    // tries to parse a JSON line out of that window (every prior round's
    // BENCH_r*.json shows "parsed": null: the full line above is ~9 KB, so
    // the window starts mid-line and no complete JSON line survives next to
    // sbt's trailing "[success]" banner). Emit a second, compact line —
    // same schema, `queries` trimmed to the slowest entries and values
    // rounded to ms — sized to fit the window whole. Full per-query data
    // stays in the long line and in the $out file.
    val slowest = results.sortBy(-_._2).take(15)
      .map { case (k, v) => "\"" + k + "\":" + (math.rint(v * 1000) / 1000) }
      .mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${math.rint(total * 1000) / 1000},"unit":"sec","n_queries":${results.size},"queries":$slowest,"queries_note":"slowest 15 of ${results.size}; full set in $out","failed":$fs,"loadavg":{"before":$loadBefore,"after":$loadAfter},"sf":"$sfDir"}"""
    graft.operators.Checkpoints.releaseShared() // shared tables only release explicitly
    spark.stop() // stop first: any stop-time WARN lines must not land after the compact line
    println(compact)
    if (failed.nonEmpty) sys.exit(1)
  }
}
