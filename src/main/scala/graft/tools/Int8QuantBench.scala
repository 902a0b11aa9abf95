package graft.tools

import graft.kernel.Int8Quant

/** Kernel-level A/B for the round-8 NaN guard in [[Int8Quant.stats]]
  * (the `isFinite` branch added per component of the scale scan).
  * BENCH_r08 showed `h_embed_quantize` 4-6.5x over its addendum number,
  * and the guard was the only code change on that path — this isolates
  * it from Spark, scheduler, and ambient-load noise.
  *
  * `sbt "runMain graft.tools.Int8QuantBench"`: times the shipped guarded
  * kernel against a local unguarded replica of the pre-round-8 loop over
  * the same 2M × 64-dim deterministic vectors (xorshift64, seed fixed),
  * alternating A/B/A/B across 6 rounds so JIT and GC drift hit both arms.
  */
object Int8QuantBench {

  /** The pre-round-8 loop, replicated for the A/B only: no finiteness
    * check, NaN floors to 0 — never call this on real data. */
  private def statsUnguarded(xs: Array[Double]): Array[Long] = {
    var scale = 0.0
    var i = 0
    while (i < xs.length) {
      val a = math.abs(xs(i))
      if (a > scale) scale = a
      i += 1
    }
    if (!(scale > 0)) return null
    var sumQ = 0L; var sumAbsQ = 0L; var nSat = 0L
    i = 0
    while (i < xs.length) {
      val q = math.floor(xs(i) * 127.0 / scale + 0.5).toLong
      sumQ += q
      sumAbsQ += math.abs(q)
      if (math.abs(q) == 127L) nSat += 1
      i += 1
    }
    Array(sumQ, sumAbsQ, nSat)
  }

  def main(args: Array[String]): Unit = {
    val nVec = args.headOption.map(_.toInt).getOrElse(2_000_000)
    val dim = 64
    // deterministic xorshift64 doubles in [-1, 1)
    var s = 0x9E3779B97F4A7C15L
    def next(): Double = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s >>> 11).toDouble / (1L << 52).toDouble - 1.0
    }
    val vecs = Array.fill(nVec) { Array.fill(dim)(next()) }

    def time(f: Array[Double] => Array[Long]): (Double, Long) = {
      val t0 = System.nanoTime()
      var acc = 0L
      var i = 0
      while (i < vecs.length) {
        val r = f(vecs(i))
        if (r != null) acc += r(1)
        i += 1
      }
      ((System.nanoTime() - t0) / 1e9, acc)
    }

    // warm both arms, then alternate 6 timed rounds
    time(Int8Quant.stats); time(statsUnguarded)
    val rounds = (1 to 6).map { r =>
      if (r % 2 == 1) ("guarded", time(Int8Quant.stats))
      else ("unguarded", time(statsUnguarded))
    }
    val g = rounds.filter(_._1 == "guarded").map(_._2._1)
    val u = rounds.filter(_._1 == "unguarded").map(_._2._1)
    require(rounds.map(_._2._2).distinct.size == 1, "checksum mismatch between arms")
    println(f"""{"bench":"int8_quant_nan_guard","n_vec":$nVec,"dim":$dim,""" +
      f""""guarded_sec":[${g.map(x => f"$x%.3f").mkString(",")}],""" +
      f""""unguarded_sec":[${u.map(x => f"$x%.3f").mkString(",")}],""" +
      f""""guarded_min":${g.min}%.3f,"unguarded_min":${u.min}%.3f,""" +
      f""""ratio_min":${g.min / u.min}%.3f}""")
  }
}
