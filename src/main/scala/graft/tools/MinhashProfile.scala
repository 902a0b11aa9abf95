package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase-level profile of `h_minhash_calibration` (round-13 verdict item
  * 3: the K=40 stress ratio measured 5.31× solo against a ≤~4× target —
  * find the residual super-linear term or pin a measured explanation).
  * Mirrors the phase SQL of `TrainingOps.hMinhashCalibration`
  * (TrainingOps.scala, MinHash calibration audit) so each term's wall can
  * be read separately at K=1 vs K=40:
  *
  *   A  cal_sh   corpus double + shingle arrays + localCheckpoint
  *   B  sig      explode grams -> 4 md5/doc-gram -> 8-way min aggregate
  *   C  inter    gram co-occurrence equi-join + (a,b) count aggregate
  *   D  full     everything incl. the (lang, blk) pair join + final rollup
  *
  * Usage: SPARK_GRAFT_MINHASH_DIRS=/tmp/graft-scale/k1,/tmp/graft-scale/k40
  *        sbt "runMain graft.tools.MinhashProfile"
  * Prints one JSON line per dir with per-phase seconds (median of 3).
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_MINHASH_DIRS",
      "/tmp/graft-scale/k1,/tmp/graft-scale/k40").split(',').toSeq
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
    spark.sparkContext.setLogLevel("WARN")

    val calShSql =
      """WITH corpus AS (
        |  SELECT doc_id, lang, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang, regexp_replace(text, '^\\S+\\s+', '')
        |  FROM documents),
        |mod AS (
        |  SELECT least(1000000L, greatest(100L,
        |    CASE WHEN q <= p THEN p WHEN q <= 2 * p THEN 2 * p
        |         WHEN q <= 5 * p THEN 5 * p ELSE 10 * p END)) AS m
        |  FROM (SELECT q, CAST(power(10, length(CAST(q AS STRING)) - 1) AS BIGINT) AS p
        |        FROM (SELECT (count(*) + 49) DIV 50 AS q FROM documents))),
        |tok AS (SELECT doc_id, lang, split(text, ' ') AS tokens FROM corpus)
        |SELECT doc_id, lang, doc_id % (SELECT m FROM mod) AS blk,
        |  array_distinct(transform(sequence(1, size(tokens) - 2),
        |    i -> concat(element_at(tokens, i), '|', element_at(tokens, i + 1),
        |                '|', element_at(tokens, i + 2)))) AS shingles
        |FROM tok WHERE size(tokens) >= 3""".stripMargin
    val sigSql =
      """WITH g AS (
        |  SELECT doc_id,
        |    md5(concat('0|', s)) AS m0, md5(concat('1|', s)) AS m1,
        |    md5(concat('2|', s)) AS m2, md5(concat('3|', s)) AS m3
        |  FROM cal_sh LATERAL VIEW explode(shingles) t AS s)
        |SELECT doc_id,
        |  min(CAST(conv(substring(m0, 1, 15), 16, 10) AS BIGINT)) AS h0,
        |  min(CAST(conv(substring(m0, 17, 15), 16, 10) AS BIGINT)) AS h1,
        |  min(CAST(conv(substring(m1, 1, 15), 16, 10) AS BIGINT)) AS h2,
        |  min(CAST(conv(substring(m1, 17, 15), 16, 10) AS BIGINT)) AS h3,
        |  min(CAST(conv(substring(m2, 1, 15), 16, 10) AS BIGINT)) AS h4,
        |  min(CAST(conv(substring(m2, 17, 15), 16, 10) AS BIGINT)) AS h5,
        |  min(CAST(conv(substring(m3, 1, 15), 16, 10) AS BIGINT)) AS h6,
        |  min(CAST(conv(substring(m3, 17, 15), 16, 10) AS BIGINT)) AS h7
        |FROM g GROUP BY doc_id""".stripMargin
    val interSql =
      """WITH g2 AS (
        |  SELECT doc_id, lang, blk, s
        |  FROM cal_sh LATERAL VIEW explode(shingles) t AS s)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS ni
        |FROM g2 a JOIN g2 b
        |  ON a.lang = b.lang AND a.blk = b.blk AND a.s = b.s
        |  AND a.doc_id < b.doc_id
        |GROUP BY a.doc_id, b.doc_id""".stripMargin

    dirs.foreach { dir =>
      spark.read.parquet(s"$dir/documents.parquet").createOrReplaceTempView("documents")
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      def timed(body: => Unit): Double = {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        runs.sorted.apply(1)
      }
      // warm-up scan
      spark.table("documents").write.format("noop").mode("overwrite").save()

      val tCal = timed {
        val cp = spark.sql(calShSql).localCheckpoint()
        cp.createOrReplaceTempView("cal_sh")
        noop(cp)
        // release this rep's checkpoint blocks so reps don't accumulate
        // (Dataset.unpersist only consults the CacheManager, which never
        // saw a localCheckpoint — walk the LogicalRDD leaves instead)
        graft.operators.Checkpoints.release(cp)
      }
      // keep ONE checkpointed cal_sh live for the downstream phases
      val calSh = spark.sql(calShSql).localCheckpoint()
      calSh.createOrReplaceTempView("cal_sh")
      val tSig = timed { noop(spark.sql(sigSql)) }
      val tInter = timed { noop(spark.sql(interSql)) }
      // variant: shuffled-hash-join hint (skip the sort-merge sorts)
      val tInterShj = timed { noop(spark.sql(interSql.replace(
        "SELECT a.doc_id AS a_id", "SELECT /*+ SHUFFLE_HASH(b) */ a.doc_id AS a_id"))) }
      // variant: ONE shuffle — group docs per (lang, blk, gram), emit sorted
      // in-group pairs, then count shared grams per pair
      val tInterAgg = timed { noop(spark.sql(
        """WITH g2 AS (
          |  SELECT doc_id, lang, blk, s
          |  FROM cal_sh LATERAL VIEW explode(shingles) t AS s),
          |grp AS (
          |  SELECT array_sort(collect_list(doc_id)) AS ds
          |  FROM g2 GROUP BY lang, blk, s
          |  HAVING count(*) > 1)
          |SELECT a_id, b_id, count(*) AS ni FROM (
          |  SELECT pa.a_id, pb.b_id
          |  FROM grp
          |  LATERAL VIEW posexplode(ds) pa AS i, a_id
          |  LATERAL VIEW posexplode(ds) pb AS j, b_id
          |  WHERE i < j)
          |GROUP BY a_id, b_id""".stripMargin)) }
      val tFull = timed {
        noop(graft.operators.TrainingOps.hMinhashCalibration(spark, dir))
        graft.operators.Checkpoints.releaseAll()
      }
      graft.operators.Checkpoints.release(calSh)
      val nDocs = spark.table("documents").count()
      println(s"""{"bench":"minhash_profile","dir":"$dir","docs":$nDocs,"cal_sh":${f"$tCal%.3f"},"sig":${f"$tSig%.3f"},"inter":${f"$tInter%.3f"},"inter_shj":${f"$tInterShj%.3f"},"inter_agg":${f"$tInterAgg%.3f"},"full":${f"$tFull%.3f"}}""")
    }
    spark.stop()
  }
}
