package graft

import org.scalatest.funsuite.AnyFunSuite

class MainSpec extends AnyFunSuite {

  test("CLI flags parse like the reference's (main.go:27-34)") {
    val opts = Main.parse(List(
      "--topic", "events",
      "--channel", "ch",
      "--nsqd-tcp-address", "a:4150,b:4150",
      "--stream", "s",
      "--kinesis-endpoint", "http://localhost:4567/",
      "--test"), Map.empty)
    assert(opts("topic") === "events")
    assert(opts("channel") === "ch")
    assert(opts("nsqd-tcp-address") === "a:4150,b:4150")
    assert(opts("stream") === "s")
    assert(opts("kinesis-endpoint") === "http://localhost:4567/")
    assert(opts.contains("test"))
  }

  test("bare trailing flag parses as boolean") {
    val opts = Main.parse(List("--topic", "t", "--test", "--stream", "s"), Map.empty)
    assert(opts.contains("test") && opts("stream") === "s")
  }
}
