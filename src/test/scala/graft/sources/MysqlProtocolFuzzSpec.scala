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

  /** Truncation + single-byte-flip properties over one valid encode.
    * `sane(result, input)` verifies the no-phantom-bytes half of the
    * contract on every SUCCESSFUL parse of a mangled input: whatever
    * the decode returns must be expressible within the bytes it was
    * given (a parse that "succeeds" with more content than the payload
    * holds is a framing bug, not a lucky decode). */
  private def fuzz[A](bytes: Array[Byte], decode: Array[Byte] => A,
                      sane: (A, Array[Byte]) => Boolean): Unit = {
    def holds(input: Array[Byte]): Boolean = outcome(decode(input)) match {
      case Right(a) => sane(a, input)
      case Left(_)  => true
    }
    val truncate = Prop.forAll(Gen.choose(0, bytes.length - 1)) { k =>
      holds(bytes.take(k))
    }
    val flip = Prop.forAll(
      Gen.choose(0, bytes.length - 1), Gen.choose(1, 255)) { (i, x) =>
      val c = bytes.clone(); c(i) = (c(i) ^ x).toByte
      holds(c)
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
    fuzz(valid, decodeHandshake, (h: Handshake, in: Array[Byte]) =>
      h.scramble.length == 20 &&
        h.serverVersion.length + h.authPlugin.length <= in.length)
  }

  test("handshake RESPONSE decode (the server's half) survives " +
      "truncation and corruption") {
    val valid = encodeHandshakeResponse(HandshakeResponse(
      ClientCapabilities, "repl",
      nativePasswordToken("graft-secret", scramble20),
      NativePasswordPlugin))
    assert(decodeHandshakeResponse(valid).user == "repl") // baseline
    fuzz(valid, decodeHandshakeResponse,
      (r: HandshakeResponse, in: Array[Byte]) =>
        r.user.length + r.token.length + r.authPlugin.length <= in.length)
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
    fuzz(row, parseTextRow(_, 2), (r: Seq[String], in: Array[Byte]) =>
      r.size == 2 && r.filter(_ != null).map(_.length).sum <= in.length)
  }

  test("auth-switch decode survives truncation and corruption") {
    val valid = authSwitchPacket(CachingSha2Plugin, scramble20)
    assert(decodeAuthSwitch(valid)._1 == CachingSha2Plugin) // baseline
    fuzz(valid, decodeAuthSwitch,
      (r: (String, Array[Byte]), in: Array[Byte]) =>
        r._1.length + r._2.length <= in.length)
  }

  test("ERR packet message decode survives truncation and corruption") {
    val valid = errPacket(1236, "Could not find first log file name")
    assert(errMessage(valid).contains("1236")) // baseline
    // "MySQL error NNNNN: " prefix adds at most 20 chars over the payload
    fuzz(valid, errMessage, (m: String, in: Array[Byte]) =>
      m.length <= in.length + 20)
  }
}
