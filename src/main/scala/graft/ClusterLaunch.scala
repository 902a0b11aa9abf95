package graft

import org.apache.spark.sql.SparkSession

/** Shared `local-cluster[…]` launch wiring. Standalone/local-cluster
  * executors start in FRESH JVMs that know nothing of sbt's classpath or
  * the JDK-17 module opens spark-submit normally injects — every main and
  * spec that talks to a multi-JVM master needs the same three configs,
  * and six hand-copied lists had already accumulated by round 20 (a
  * missed copy fails only at executor launch). One definition here. */
object ClusterLaunch {

  /** The JDK-17 `--add-opens` set Spark 4 executors need when launched
    * outside spark-submit (mirrors
    * `org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions`,
    * same list as build.sbt's forked-test javaOptions). */
  val addOpens: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")

  /** Wire a session builder for a local-cluster master: executor memory
    * (`SPARK_GRAFT_EXECUTOR_MEM`, default 4g — keep it ≤ the worker
    * memory in the master string), the launching JVM's full classpath,
    * and [[addOpens]]. A non-cluster master passes through untouched. */
  def wire(builder: SparkSession.Builder, master: String): SparkSession.Builder = {
    val b =
      if (master.startsWith("local-cluster"))
        builder
          .config("spark.executor.memory",
            sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "4g"))
          .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
          .config("spark.executor.extraJavaOptions", addOpens)
      else builder
    // SPARK_GRAFT_CONF="k=v;k2=v2" — generic session-conf pass-through so
    // deployment-dependent settings (shuffle codec, join-strategy
    // preferences, AQE sizing) stay parameterised per environment instead
    // of hard-coded for local[32]; also how conf A/Bs are driven without
    // code edits (round 20). Applied last, so it can override defaults.
    sys.env.get("SPARK_GRAFT_CONF").fold(b) { kvs =>
      kvs.split(';').filter(_.contains('=')).foldLeft(b) { (acc, kv) =>
        val Array(k, v) = kv.split("=", 2)
        acc.config(k.trim, v.trim)
      }
    }
  }
}
