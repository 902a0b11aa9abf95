package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names, for fast iteration
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    // SPARK_GRAFT_MASTER lets the cluster-posture audit run the same dump
    // on local-cluster[n,c,mem] (multi-JVM executors) — combined with
    // SPARK_GRAFT_MATERIALIZE=reliable this is the 100 TB deployment shape;
    // results feed the identical DuckDB hash-compare (BASELINE.md r19).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder0 = SparkSession.builder()
      .master(master)
    // standalone/local-cluster executors default to 1 GiB and launch in
    // FRESH JVMs that know nothing of sbt's classpath or the JDK-17
    // add-opens — size and wire them (memory must stay <= the worker
    // memory in the master string). Same recipe EngineClusterSpec uses.
    val builder =
      if (master.startsWith("local-cluster")) {
        val addOpens = Seq(
          "java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio",
          "java.base/java.util", "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs",
          "java.base/sun.security.action", "java.base/sun.util.calendar",
        ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
        builder0
          .config("spark.executor.memory",
            sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "4g"))
          .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
          .config("spark.executor.extraJavaOptions", addOpens)
      } else builder0
    val spark = builder
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet's physical ts encoding has drifted across data
      // generations (INT64 nanos / TIMESTAMP_MICROS / TIMESTAMP_NTZ);
      // nanosAsLong keeps the nanos generation readable, and
      // Tables.eventsCanonical normalizes whatever arrives to `tus`
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a misspelled filter name would otherwise silently select zero queries
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(
          s"[verify] WARNING: unknown query names in filter: ${unknown.toSeq.sorted.mkString(",")}")
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release any localCheckpoint blocks the query registered
      finally graft.operators.Checkpoints.releaseAll()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.operators.Checkpoints.releaseShared() // shared tables only release explicitly
    spark.stop()
  }
}
