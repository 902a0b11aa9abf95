package graft.sources.nsq

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.util.concurrent.atomic.AtomicBoolean

import NsqProtocol._

/** Minimal blocking NSQ consumer: connect, IDENTIFY, SUB, RDY; a reader
  * thread dispatches messages to `onMessage` and answers heartbeats with
  * NOP. `fin`/`requeue` provide the per-message ack surface the pipeline's
  * commit path uses (reference semantics: handler.go:19, kinesis_writer.go:
  * 114-127). Tuning mirrors main.go:62-68 (maxInFlight etc.).
  */
final class NsqClient(
    host: String,
    port: Int,
    topic: String,
    channel: String,
    maxInFlight: Int = 1000,
    msgTimeoutMs: Long = 10000,
    outputBufferTimeoutMs: Long = 50,
    onMessage: NsqMessage => Unit) {

  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  private val out = new DataOutputStream(socket.getOutputStream)
  private val in = new DataInputStream(socket.getInputStream)
  private val running = new AtomicBoolean(true)
  private val writeLock = new Object
  // set when the reader thread dies or a write fails: the session is broken
  // and the owner must rebuild the connection (round-6 advice: a dead client
  // must not sit in the registry returning empty takes forever)
  @volatile private var failed = false

  /** Liveness of the standing session: reader thread healthy, socket open.
    * False ⇒ nsqd has (or will, on socket close) requeued everything
    * un-FINned here, so the safe recovery is simply a new connection. */
  def isAlive: Boolean = running.get() && !failed && !socket.isClosed

  writeMagic(out)
  // client_id carries the JVM pid (real NSQ clients send hostname/short-id):
  // on a cluster it tells the broker operator WHICH executor JVM holds each
  // connection, and the multi-JVM spec asserts distributed ingest from it
  writeIdentify(out,
    s"""{"client_id":"graft-${ProcessHandle.current().pid()}","msg_timeout":$msgTimeoutMs,"output_buffer_timeout":$outputBufferTimeoutMs}""")
  writeCommand(out, s"SUB $topic $channel")
  writeCommand(out, s"RDY $maxInFlight")

  private val reader = new Thread(() => {
    try {
      while (running.get()) {
        val frame = readFrame(in)
        frame.frameType match {
          case FrameResponse =>
            if (new String(frame.data, "UTF-8") == "_heartbeat_")
              writeLock.synchronized(writeCommand(out, "NOP"))
          case FrameMessage =>
            onMessage(decodeMessage(frame.data))
          case FrameError =>
            // Error frames are mostly non-fatal per the NSQ protocol
            // (E_FIN_FAILED, E_REQ_FAILED, ...): log and keep consuming.
            // Only E_INVALID/E_BAD_* indicate a broken session worth dying on.
            val msg = new String(frame.data, "UTF-8")
            if (msg.startsWith("E_INVALID") || msg.startsWith("E_BAD"))
              throw new java.io.IOException(s"nsq fatal error: $msg")
            else System.err.println(s"[nsq] non-fatal error frame: $msg")
          case other =>
            throw new java.io.IOException(s"unknown frame type $other")
        }
      }
    } catch {
      case _: Throwable if !running.get() => // closed
      case e: Throwable =>
        failed = true
        if (running.get()) System.err.println(s"[nsq] reader for $host:$port died: $e")
        // close the socket NOW so nsqd requeues this connection's un-FINned
        // in-flight immediately instead of waiting out msg_timeout
        try socket.close() catch { case _: Throwable => () }
    }
  }, s"nsq-reader-$topic")
  reader.setDaemon(true)
  reader.start()

  def fin(messageId: String): Unit = ackWrite(s"FIN $messageId")

  def requeue(messageId: String, delayMs: Long = 1000): Unit =
    ackWrite(s"REQ $messageId $delayMs")

  // a failed ack write means the socket is gone: mark dead (the owner will
  // rebuild) and let nsqd's requeue-on-disconnect redeliver — duplicates,
  // never loss, per the at-least-once contract
  private def ackWrite(cmd: String): Unit =
    try writeLock.synchronized(writeCommand(out, cmd))
    catch {
      case e: java.io.IOException =>
        failed = true
        System.err.println(s"[nsq] ack write '$cmd' to $host:$port failed: $e")
        try socket.close() catch { case _: Throwable => () }
    }

  def close(): Unit = {
    running.set(false)
    try writeLock.synchronized(writeCommand(out, "CLS")) catch { case _: Throwable => () }
    try socket.close() catch { case _: Throwable => () }
  }
}
