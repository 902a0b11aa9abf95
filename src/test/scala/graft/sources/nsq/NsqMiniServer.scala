package graft.sources.nsq

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}
import java.util.concurrent.atomic.AtomicBoolean
import scala.collection.mutable

import NsqProtocol._

/** In-process fake nsqd speaking just enough protocol v2 for the connector:
  * accepts one consumer, parses IDENTIFY/SUB/RDY/FIN/REQ/NOP/CLS, delivers
  * queued messages once RDY > 0, records FINs, sends heartbeats on demand.
  */
final class NsqMiniServer {
  private val server = new ServerSocket(0)
  val port: Int = server.getLocalPort

  private val pending = new ConcurrentLinkedQueue[NsqMessage]()
  val finned = new ConcurrentLinkedQueue[String]()
  val requeued = new ConcurrentLinkedQueue[String]()
  private val running = new AtomicBoolean(true)
  private val subscribed = new CountDownLatch(1)
  @volatile private var ready = 0L
  @volatile private var conn: Socket = _
  @volatile private var out: DataOutputStream = _
  private val writeLock = new Object

  def publish(id: String, body: Array[Byte], attempts: Int = 1): Unit = {
    pending.add(NsqMessage(id, System.nanoTime(), attempts, body))
    maybeDeliver()
  }

  def sendHeartbeat(): Unit = writeLock.synchronized {
    if (out != null) writeFrame(out, FrameResponse, "_heartbeat_".getBytes("UTF-8"))
  }

  def sendError(msg: String): Unit = writeLock.synchronized {
    if (out != null) writeFrame(out, FrameError, msg.getBytes("UTF-8"))
  }

  private def maybeDeliver(): Unit = writeLock.synchronized {
    if (out == null) return
    while (ready > 0 && !pending.isEmpty) {
      val m = pending.poll()
      writeFrame(out, FrameMessage, encodeMessage(m))
      ready -= 1
    }
  }

  def awaitSubscribe(): Unit = subscribed.await()

  private val acceptor = new Thread(() => {
    try {
      while (running.get()) {
        val s = server.accept()
        conn = s
        handle(s)
      }
    } catch { case _: Throwable if !running.get() => () }
  }, "nsq-mini-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(s: Socket): Unit = {
    val in = new DataInputStream(s.getInputStream)
    writeLock.synchronized { out = new DataOutputStream(s.getOutputStream) }
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(new String(magic, "UTF-8") == "  V2", "bad magic")
    val lineBuf = new mutable.ArrayBuffer[Byte]()
    try {
      while (running.get()) {
        val b = in.read()
        if (b < 0) return
        if (b == '\n') {
          val line = new String(lineBuf.toArray, "UTF-8")
          lineBuf.clear()
          val parts = line.split(" ")
          parts(0) match {
            case "IDENTIFY" =>
              val size = in.readInt()
              val body = new Array[Byte](size)
              in.readFully(body)
              writeLock.synchronized(writeFrame(out, FrameResponse, "OK".getBytes("UTF-8")))
            case "SUB" =>
              writeLock.synchronized(writeFrame(out, FrameResponse, "OK".getBytes("UTF-8")))
              subscribed.countDown()
            case "RDY" =>
              ready = parts(1).toLong
              maybeDeliver()
            case "FIN" => finned.add(parts(1))
            case "REQ" => requeued.add(parts(1))
            case "NOP" => ()
            case "CLS" =>
              writeLock.synchronized(writeFrame(out, FrameResponse, "CLOSE_WAIT".getBytes("UTF-8")))
            case _ => ()
          }
        } else lineBuf += b.toByte
      }
    } catch { case _: Throwable if !running.get() => () }
  }

  def close(): Unit = {
    running.set(false)
    try server.close() catch { case _: Throwable => () }
    if (conn != null) { try conn.close() catch { case _: Throwable => () } }
  }
}
