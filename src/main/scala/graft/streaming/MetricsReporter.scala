package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets

/** Pluggable metric EXPORT for [[PipelineMetrics]] — the reference's
  * open "Metrics (statsd or cloudwatch?)" item (TODO.md:8), answered the
  * way a Spark deployment wants it: the listener already computes every
  * number per micro-batch; a reporter is a dumb fan-out of typed metric
  * lines to wherever operations aggregates them. Reporters must never
  * throw into the listener bus (a metrics outage must not wedge the
  * pipeline), so [[PipelineMetrics]] wraps every call defensively.
  *
  * Metric typing follows the statsd convention the whole ecosystem
  * understands: monotone per-batch work is a COUNTER (`c`), wall/cpu
  * segments are TIMERS in ms (`ms`), instantaneous levels are GAUGES
  * (`g`).
  */
trait MetricsReporter extends AutoCloseable {

  /** One micro-batch's metrics for one query, already flattened to
    * (name, value, statsdType) — names are dot-separated suffixes under
    * the query scope, e.g. `segment.addBatch`. */
  def report(query: String, batchId: Long, metrics: Seq[(String, Long, String)]): Unit

  override def close(): Unit = ()
}

object MetricsReporter {

  /** statsd name segments allow [a-zA-Z0-9_.-]; anything else folds to
    * `_` so a query named "my query!" can't corrupt the wire line. */
  def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit || c == '_' || c == '-' || c == '.') c else '_')
}

/** Line-per-metric log sink — the default that costs nothing to adopt:
  * `metric graft.<query>.<name>=<value>|<type> batch=<id>`. The `sink`
  * indirection keeps the spec able to capture lines; production leaves
  * the default (stderr via println is deliberate — executors/driver logs
  * are where a no-infra deployment reads metrics). */
final class LogReporter(
    prefix: String = "graft",
    sink: String => Unit = line => Console.err.println(line))
    extends MetricsReporter {

  override def report(
      query: String, batchId: Long, metrics: Seq[(String, Long, String)]): Unit = {
    val q = MetricsReporter.sanitize(query)
    metrics.foreach { case (name, value, typ) =>
      sink(s"metric $prefix.$q.$name=$value|$typ batch=$batchId")
    }
  }
}

/** statsd wire sink: one UDP datagram per batch carrying
  * newline-separated `<prefix>.<query>.<name>:<value>|<type>` lines —
  * the multi-metric packet form every statsd server (and DogStatsD)
  * accepts. UDP is the protocol's own fire-and-forget posture: a dead
  * statsd daemon costs nothing but the syscall. */
final class StatsdReporter(
    host: String, port: Int, prefix: String = "graft")
    extends MetricsReporter {

  private val socket = new DatagramSocket()
  private val addr = InetAddress.getByName(host)

  override def report(
      query: String, batchId: Long, metrics: Seq[(String, Long, String)]): Unit = {
    if (metrics.isEmpty) return
    val q = MetricsReporter.sanitize(query)
    val payload = metrics
      .map { case (name, value, typ) => s"$prefix.$q.$name:$value|$typ" }
      .mkString("\n")
      .getBytes(StandardCharsets.UTF_8)
    socket.send(new DatagramPacket(payload, payload.length, addr, port))
  }

  override def close(): Unit = socket.close()
}
