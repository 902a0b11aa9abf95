package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** STREAMING token-budget admission — the ingest-time form of the batch
  * `h_token_budget_mix` prefix cut. Each language holds a fixed token
  * budget (control-plane input: derived from a prior batch pass's
  * √-scaled shares, or a quota policy); documents are admitted iff they
  * sit inside the budgeted prefix of the deterministic content-hash
  * order — the SAME selection the batch query makes, maintained
  * incrementally while documents arrive in any order.
  *
  * The state invariant that makes this exact under out-of-order arrival:
  * per language keep (a) the currently-admitted set and (b) the
  * smallest (draw, doc_id) key ever evicted for budget — the CUT
  * BOUNDARY. Every seen document ordering below the boundary is in the
  * admitted set (eviction only happens at or above it), so prefix sums
  * below the boundary are computed over ALL seen mass — exact; and any
  * document ordering at or above the boundary can NEVER be admitted (its
  * cumulative sum dominates the boundary's, which already exceeded the
  * budget), so dropping evicted mass loses nothing. Hence after any
  * stream prefix the admitted set equals the batch query's kept set over
  * exactly the rows seen (StreamingTokenBudgetSpec proves it against
  * `TrainingOps.hTokenBudgetMix`), and two shards' ledgers merge exactly
  * (union + min boundary + re-cut) — the same mergeable-sketch algebra
  * as [[StreamingStratifiedSampler]]'s bottom-k, with a weighted-prefix
  * cut in place of fixed k.
  *
  * Scale posture: state is O(budget / mean-doc-tokens) entries + one
  * boundary key per language, hash-partitioned by language across
  * executors; per-row work is an O(admitted) in-memory re-cut per
  * micro-batch. Like the sampler, admission is redelivery-stable (the
  * re-cut dedups on (draw, doc_id)) while the `n_seen` counter counts
  * deliveries — exact only under exactly-once delivery.
  */
object StreamingTokenBudget {

  final case class DocTok(lang: String, doc_id: Long, toks: Long, draw: Long)
  final case class Adm(draw: Long, doc_id: Long, toks: Long)
  /** Admitted prefix + cut boundary (MaxValue sentinel = no eviction yet). */
  final case class Ledger(admitted: Vector[Adm], cutDraw: Long, cutId: Long)

  val emptyLedger: Ledger = Ledger(Vector.empty, Long.MaxValue, Long.MaxValue)

  private def beforeCut(e: Adm, l: Ledger): Boolean =
    e.draw < l.cutDraw || (e.draw == l.cutDraw && e.doc_id < l.cutId)

  /** The whole algebra in one function: dedup, drop everything at/above
    * the cut, sort to draw order, keep the budgeted prefix, and tighten
    * the cut to the first doc the budget excluded. `insert` and shard
    * `merge` are both instances of this, which is what makes the ledger
    * commutative, associative, and idempotent (property-tested). */
  def recut(entries: Vector[Adm], cutDraw: Long, cutId: Long, budget: Long): Ledger = {
    val bound = Ledger(Vector.empty, cutDraw, cutId)
    val sorted = entries.distinct.filter(beforeCut(_, bound))
      .sortBy(e => (e.draw, e.doc_id))
    var cum = 0L
    var i = 0
    while (i < sorted.size && cum + sorted(i).toks <= budget) {
      cum += sorted(i).toks; i += 1
    }
    if (i < sorted.size)
      Ledger(sorted.take(i), sorted(i).draw, sorted(i).doc_id)
    else Ledger(sorted, cutDraw, cutId)
  }

  def insert(l: Ledger, incoming: Seq[Adm], budget: Long): Ledger =
    recut(l.admitted ++ incoming, l.cutDraw, l.cutId, budget)

  def merge(a: Ledger, b: Ledger, budget: Long): Ledger = {
    val (cd, ci) =
      if (a.cutDraw < b.cutDraw || (a.cutDraw == b.cutDraw && a.cutId <= b.cutId))
        (a.cutDraw, a.cutId)
      else (b.cutDraw, b.cutId)
    recut(a.admitted ++ b.admitted, cd, ci, budget)
  }

  /** Matches the batch query's per-lang report columns, plus the
    * monotone `n_seen` delivery counter (ops/recency ordinal — NOT a
    * batch column, and like the sampler's n_stratum it is exact only
    * under exactly-once delivery). */
  final case class LangBudget(
      lang: String, n_seen: Long, budget_tokens: Long, n_kept: Long,
      kept_tokens: Long, utilization_millis: Long)

  class Processor(budgets: Map[String, Long])
      extends StatefulProcessor[String, DocTok, LangBudget] {

    @transient private var admitted: ListState[Adm] = _
    @transient private var cut: ValueState[(Long, Long)] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      admitted = getHandle.getListState[Adm](
        "admitted", Encoders.product[Adm], TTLConfig.NONE)
      cut = getHandle.getValueState[(Long, Long)](
        "cut", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String, rows: Iterator[DocTok],
        timerValues: TimerValues): Iterator[LangBudget] = {
      val incoming = rows.map(d => Adm(d.draw, d.doc_id, d.toks)).toVector
      if (incoming.isEmpty) return Iterator.empty
      val budget = budgets.getOrElse(key, 0L)
      val current = {
        val it = admitted.get()
        val b = Vector.newBuilder[Adm]
        while (it.hasNext) b += it.next()
        b.result()
      }
      val (cd, ci) = if (cut.exists()) cut.get() else (Long.MaxValue, Long.MaxValue)
      val next = insert(Ledger(current, cd, ci), incoming, budget)
      if (next.admitted != current) {
        admitted.clear()
        admitted.appendList(next.admitted.toArray)
      }
      cut.update((next.cutDraw, next.cutId))
      val n = (if (seen.exists()) seen.get() else 0L) + incoming.size
      seen.update(n)
      val kept = next.admitted.iterator.map(_.toks).sum
      Iterator.single(LangBudget(
        key, n, budget, next.admitted.size.toLong, kept,
        if (budget > 0) kept * 1000L / budget else 0L))
    }
  }

  /** Wire the admission ledger onto a stream of documents
    * (doc_id LONG, text STRING, lang STRING). Emits an updated
    * [[LangBudget]] per touched language per micro-batch. */
  def apply(stream: DataFrame, budgets: Map[String, Long]): Dataset[LangBudget] = {
    val spark = stream.sparkSession
    import spark.implicits._
    // session-wide provider switch — see StreamingState.requireRocksDB
    StreamingState.requireRocksDB(spark)
    stream
      // toks and draw use the EXACT batch expressions — batch equivalence
      // depends on both
      .withColumn("toks", size(split(col("text"), " ")).cast("long"))
      .withColumn("draw",
        expr("CAST(conv(substring(md5(text), 1, 6), 16, 10) AS BIGINT)"))
      .select(col("lang"), col("doc_id"), col("toks"), col("draw"))
      .as[DocTok]
      .groupByKey(_.lang)
      .transformWithState(new Processor(budgets), TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
