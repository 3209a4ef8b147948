package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Robustness property for the PROTOCOL packet decodes — the
  * [[graft.sources.BinlogFormatSpec]] fuzz discipline applied one
  * layer down: a replication client reads whatever a (possibly
  * desynced, possibly hostile) peer writes, so for ANY truncation and
  * ANY single-byte corruption of a valid packet every decode must
  * TERMINATE with a bounded, classifiable exception — never hang,
  * never allocate unbounded memory, never return a value parsed past
  * the payload's end.
  *
  * Accepted failure classes and why each is safe here: the decoders'
  * own `require` diagnostics (IllegalArgument/IllegalState); buffer
  * exhaustion (BufferUnderflow / IndexOutOfBounds — every array
  * allocation in these paths is bounded by a length read from at most
  * 2 bytes or by `b.remaining()`, so exhaustion surfaces BEFORE any
  * oversized allocation). NegativeArraySizeException and
  * OutOfMemoryError are deliberately NOT caught: either would be a
  * real framing bug and must fail the property. */
class MysqlProtocolFuzzSpec extends AnyFunSuite {
  import MysqlProtocol._

  private val scramble20 = Array.tabulate[Byte](20)(i => (i + 1).toByte)

  private def outcome[A](f: => A): Either[Throwable, A] =
    try Right(f) catch {
      case e @ (_: IllegalArgumentException | _: IllegalStateException |
                _: java.nio.BufferUnderflowException |
                _: IndexOutOfBoundsException) => Left(e)
    }

  /** truncation + single-byte-flip properties over one valid encode. */
  private def fuzz[A](bytes: Array[Byte])(decode: Array[Byte] => A): Unit = {
    val truncate = Prop.forAll(Gen.choose(0, bytes.length - 1)) { k =>
      outcome(decode(bytes.take(k))); true
    }
    val flip = Prop.forAll(
      Gen.choose(0, bytes.length - 1), Gen.choose(1, 255)) { (i, x) =>
      val c = bytes.clone(); c(i) = (c(i) ^ x).toByte
      outcome(decode(c)); true
    }
    Seq(truncate, flip).foreach { p =>
      val r = SCTest.check(
        SCTest.Parameters.default.withMinSuccessfulTests(300), p)
      assert(r.passed, r.status.toString)
    }
  }

  test("handshake v10 decode survives truncation and corruption") {
    val valid = encodeHandshake(Handshake(
      "8.0.39", 7L, scramble20, ClientCapabilities, NativePasswordPlugin))
    assert(decodeHandshake(valid).serverVersion == "8.0.39") // baseline
    fuzz(valid)(decodeHandshake)
  }

  test("handshake RESPONSE decode (the server's half) survives " +
      "truncation and corruption") {
    val valid = encodeHandshakeResponse(HandshakeResponse(
      ClientCapabilities, "repl",
      nativePasswordToken("graft-secret", scramble20),
      NativePasswordPlugin))
    assert(decodeHandshakeResponse(valid).user == "repl") // baseline
    fuzz(valid)(decodeHandshakeResponse)
  }

  test("text resultset row decode survives truncation and corruption") {
    // two columns incl. a 0xfc two-byte length (a 300-char value)
    val long = "x" * 300
    val row = {
      val a = "sock-bin.000001".getBytes("UTF-8")
      val b = long.getBytes("UTF-8")
      Array[Byte](a.length.toByte) ++ a ++
        Array[Byte](0xfc.toByte, (b.length & 0xff).toByte,
          ((b.length >> 8) & 0xff).toByte) ++ b
    }
    assert(parseTextRow(row, 2) == Seq("sock-bin.000001", long)) // baseline
    fuzz(row)(parseTextRow(_, 2))
  }

  test("auth-switch decode survives truncation and corruption") {
    val valid = authSwitchPacket(CachingSha2Plugin, scramble20)
    assert(decodeAuthSwitch(valid)._1 == CachingSha2Plugin) // baseline
    fuzz(valid)(decodeAuthSwitch)
  }

  test("ERR packet message decode survives truncation and corruption") {
    val valid = errPacket(1236, "Could not find first log file name")
    assert(errMessage(valid).contains("1236")) // baseline
    fuzz(valid)(errMessage)
  }
}
