package graft.sources.nsq

import java.io.{DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** NSQ wire protocol v2 essentials (public protocol spec; behavior mirrored
  * from the reference's use of go-nsq in main.go:61-73 / handler.go:18-26).
  *
  * Client → server: 4-byte magic "  V2", then newline commands (`SUB`,
  * `RDY`, `FIN`, `REQ`, `NOP`), `IDENTIFY` carrying a size-prefixed JSON
  * body. Server → client frames: [int32 size][int32 frameType][data] with
  * frameType 0=response, 1=error, 2=message; a message payload is
  * [int64 ns-timestamp][int16 attempts][16-byte id][body].
  */
object NsqProtocol {

  val Magic: Array[Byte] = "  V2".getBytes(UTF_8)

  val FrameResponse = 0
  val FrameError = 1
  val FrameMessage = 2

  final case class NsqMessage(id: String, timestampNs: Long, attempts: Int, body: Array[Byte])

  final case class Frame(frameType: Int, data: Array[Byte])

  def writeMagic(out: DataOutputStream): Unit = { out.write(Magic); out.flush() }

  def writeCommand(out: DataOutputStream, cmd: String): Unit = {
    out.write((cmd + "\n").getBytes(UTF_8)); out.flush()
  }

  def writeIdentify(out: DataOutputStream, json: String): Unit = {
    out.write("IDENTIFY\n".getBytes(UTF_8))
    val body = json.getBytes(UTF_8)
    out.writeInt(body.length)
    out.write(body)
    out.flush()
  }

  def readFrame(in: DataInputStream): Frame = {
    val size = in.readInt()
    val frameType = in.readInt()
    val data = new Array[Byte](size - 4)
    in.readFully(data)
    Frame(frameType, data)
  }

  def writeFrame(out: DataOutputStream, frameType: Int, data: Array[Byte]): Unit = {
    out.writeInt(data.length + 4)
    out.writeInt(frameType)
    out.write(data)
    out.flush()
  }

  def decodeMessage(data: Array[Byte]): NsqMessage = {
    val buf = java.nio.ByteBuffer.wrap(data)
    val ts = buf.getLong()
    val attempts = buf.getShort() & 0xffff
    val idBytes = new Array[Byte](16)
    buf.get(idBytes)
    val body = new Array[Byte](buf.remaining())
    buf.get(body)
    NsqMessage(new String(idBytes, UTF_8), ts, attempts, body)
  }

  def encodeMessage(m: NsqMessage): Array[Byte] = {
    val id = m.id.getBytes(UTF_8)
    require(id.length == 16, s"NSQ message id must be 16 bytes, got ${id.length}")
    val buf = java.nio.ByteBuffer.allocate(8 + 2 + 16 + m.body.length)
    buf.putLong(m.timestampNs)
    buf.putShort(m.attempts.toShort)
    buf.put(id)
    buf.put(m.body)
    buf.array()
  }
}
