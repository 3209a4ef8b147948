package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JsonBinary._

/** [[JsonBinary]] against the public binary-JSON layout (WL#8132).
  * The first test decodes a HAND-WRITTEN golden byte vector composed
  * field-by-field from the format description — independent of the
  * encoder, so a mirrored encode/decode bug pair cannot cancel out;
  * the rest of the surface is pinned through encoder roundtrips and
  * malformed-input properties. */
class JsonBinarySpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.split("\\s+").filter(_.nonEmpty).map(Integer.parseInt(_, 16).toByte)

  test("golden hand-written vector: {\"a\":1,\"b\":[true,\"x\"]}") {
    // small object: count=2, size=32; key entries (off 18 len 1,
    // off 19 len 1); value entries (int16 inlined 1, small-array at 20);
    // keys "a","b"; array: count=2, size=12, (literal true inlined,
    // string at 10), varlen-1 "x". Every offset hand-computed.
    val doc = hex("""
      00
      02 00 20 00
      12 00 01 00
      13 00 01 00
      05 01 00
      02 14 00
      61 62
      02 00 0C 00
      04 01 00
      0C 0A 00
      01 78
    """)
    assert(render(doc) == """{"a":1,"b":[true,"x"]}""")
  }

  private def rt(j: J): String = render(encode(j))

  test("scalar roundtrips: literals, integer widths, double, string") {
    assert(rt(JNull) == "null")
    assert(rt(JBool(true)) == "true")
    assert(rt(JBool(false)) == "false")
    assert(rt(JInt(0)) == "0")
    assert(rt(JInt(-1)) == "-1")
    assert(rt(JInt(32767)) == "32767")
    assert(rt(JInt(-40000)) == "-40000")          // int32 path
    assert(rt(JInt(5000000000L)) == "5000000000") // int64 path
    assert(rt(JDouble(2.5)) == "2.5")
    assert(rt(JDouble(3.0)) == "3.0")             // integral keeps .0
    assert(rt(JStr("plain")) == "\"plain\"")
    assert(rt(JStr("q\"b\\n\nué")) == "\"q\\\"b\\\\n\\nué\"")
  }

  test("containers: nesting, key sort by (length, bytes), empty shapes") {
    assert(rt(JArr(IndexedSeq())) == "[]")
    assert(rt(JObj(IndexedSeq())) == "{}")
    assert(rt(JArr(IndexedSeq(JInt(1), JArr(IndexedSeq(JInt(2))),
      JObj(IndexedSeq("k" -> JNull))))) == """[1,[2],{"k":null}]""")
    // MySQL's stored key order: length first, then bytes — "id" < "tag"
    // < "flag" regardless of insertion order
    val o = JObj(IndexedSeq("flag" -> JBool(true), "tag" -> JStr("t"),
      "id" -> JInt(7)))
    assert(rt(o) == """{"id":7,"tag":"t","flag":true}""")
  }

  test("deep and wide: 3-level document with every type") {
    val doc = JObj(IndexedSeq(
      "arr" -> JArr(IndexedSeq(JInt(70000), JDouble(-0.25), JNull,
        JStr(""), JBool(false))),
      "o" -> JObj(IndexedSeq("x" -> JArr(IndexedSeq(JStr("y")))))))
    assert(rt(doc) == """{"o":{"x":["y"]},"arr":[70000,-0.25,null,"",false]}""")
  }

  test("malformed bytes fail diagnosably, never hang") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val good = encode(JObj(IndexedSeq("a" -> JInt(1),
      "b" -> JArr(IndexedSeq(JStr("xyz"), JBool(true))))))
    def outcome(d: Array[Byte]): Unit =
      try { render(d); () } catch {
        case _: IllegalArgumentException | _: StringIndexOutOfBoundsException => ()
      }
    val p = Prop.forAll(Gen.choose(0, good.length - 1),
      Gen.choose(1, 255)) { (i, x) =>
      val c = good.clone(); c(i) = (c(i) ^ x).toByte
      outcome(c); true
    }
    val r = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
    intercept[IllegalArgumentException](render(Array.empty[Byte]))
  }

  test("paths: parse grammar and error shapes") {
    assert(parsePath("$.a") == Seq(Key("a")))
    assert(parsePath("$.a.b[2].c") == Seq(Key("a"), Key("b"), Idx(2), Key("c")))
    assert(parsePath("$[0][12]") == Seq(Idx(0), Idx(12)))
    assert(parsePath("$.\"key with space\"[1]") ==
      Seq(Key("key with space"), Idx(1)))
    // escaped quotes/backslashes inside quoted keys (the server's
    // Json_path_leg::to_string emission for non-identifier keys)
    assert(parsePath("$.\"a\\\"b\"") == Seq(Key("a\"b")))
    assert(parsePath("$.\"a\\\\b\".c") == Seq(Key("a\\b"), Key("c")))
    intercept[IllegalArgumentException](parsePath("a.b"))
    intercept[IllegalArgumentException](parsePath("$."))
    intercept[IllegalArgumentException](parsePath("$[]"))
    intercept[IllegalArgumentException](parsePath("$.\"unterminated"))
  }

  test("diffs: replace/insert/remove on objects and arrays, nested") {
    val doc = JObj(IndexedSeq(
      "id" -> JInt(1),
      "tags" -> JArr(IndexedSeq(JStr("a"), JStr("b"))),
      "o" -> JObj(IndexedSeq("x" -> JInt(10)))))
    def ap(d: J, diffs: Diff*): String =
      renderAst(diffs.foldLeft(d)(applyDiff))
    assert(ap(doc, Diff(DiffReplace, "$.id", Some(JInt(9)))) ==
      """{"o":{"x":10},"id":9,"tags":["a","b"]}""")
    assert(ap(doc, Diff(DiffReplace, "$.tags[1]", Some(JStr("z")))) ==
      """{"o":{"x":10},"id":1,"tags":["a","z"]}""")
    assert(ap(doc, Diff(DiffInsert, "$.tags[1]", Some(JStr("m")))) ==
      """{"o":{"x":10},"id":1,"tags":["a","m","b"]}""")
    assert(ap(doc, Diff(DiffInsert, "$.tags[99]", Some(JStr("e")))) ==
      """{"o":{"x":10},"id":1,"tags":["a","b","e"]}""") // append past end
    assert(ap(doc, Diff(DiffInsert, "$.vip", Some(JBool(true)))) ==
      """{"o":{"x":10},"id":1,"vip":true,"tags":["a","b"]}""")
    assert(ap(doc, Diff(DiffRemove, "$.tags[0]", None)) ==
      """{"o":{"x":10},"id":1,"tags":["b"]}""")
    assert(ap(doc, Diff(DiffRemove, "$.o.x", None)) ==
      """{"o":{},"id":1,"tags":["a","b"]}""")
    assert(ap(doc, Diff(DiffReplace, "$.o.x", Some(JArr(IndexedSeq(JNull))))) ==
      """{"o":{"x":[null]},"id":1,"tags":["a","b"]}""")
    // strict apply: unresolvable paths and wrong shapes fail loudly
    intercept[IllegalArgumentException](
      applyDiff(doc, Diff(DiffReplace, "$.nope", Some(JNull))))
    intercept[IllegalArgumentException](
      applyDiff(doc, Diff(DiffInsert, "$.id", Some(JNull))))
    intercept[IllegalArgumentException](
      applyDiff(doc, Diff(DiffRemove, "$.tags[7]", None)))
    intercept[IllegalArgumentException](
      applyDiff(doc, Diff(DiffReplace, "$", Some(JNull))))
  }

  test("diff wire roundtrip: encodeDiffs ≡ parseDiffs") {
    val diffs = Seq(
      Diff(DiffReplace, "$.score", Some(JInt(42))),
      Diff(DiffInsert, "$.tags[0]", Some(JObj(IndexedSeq("k" -> JNull)))),
      Diff(DiffRemove, "$.old", None))
    assert(parseDiffs(encodeDiffs(diffs)) == diffs)
    intercept[IllegalArgumentException](
      parseDiffs(Array[Byte](9, 1, '$'.toByte))) // unknown op
  }

  test("partial update through the binlog: diffs apply to the before-image") {
    import BinlogFormat._
    import BinlogFixture.{Change, Partial}
    val cols = IndexedSeq(ColumnDef(TypeLongLong, 0), ColumnDef(TypeJson, 4))
    val before = JObj(IndexedSeq("id" -> JInt(9),
      "tags" -> JArr(IndexedSeq(JStr("a"))), "score" -> JInt(5)))
    val p = parse(BinlogFixture.encode("d", "t", cols, txns = Seq(Seq(
      Change.insert(IndexedSeq(9L, before)),
      Change.partialUpdate(
        IndexedSeq(9L, before),
        IndexedSeq(9L, Partial(Seq(
          Diff(DiffReplace, "$.score", Some(JInt(55))),
          Diff(DiffInsert, "$.tags[1]", Some(JStr("b"))),
          Diff(DiffInsert, "$.vip", Some(JBool(true)))))))))))
    assert(p.changes.map(_.op) == Vector("I", "U"))
    val u = p.changes(1)
    assert(u.before.get ==
      IndexedSeq(9L, """{"id":9,"tags":["a"],"score":5}"""))
    assert(u.after.get ==
      IndexedSeq(9L, """{"id":9,"vip":true,"tags":["a","b"],"score":55}"""))
    // a partial update with the bit OFF ships the full document instead
    val full = parse(BinlogFixture.encode("d", "t", cols, txns = Seq(Seq(
      Change.partialUpdate(IndexedSeq(9L, before),
        IndexedSeq(9L, JObj(IndexedSeq("id" -> JInt(9)))))))))
    assert(full.changes.head.after.get(1) == """{"id":9}""")
  }

  test("doubles render MySQL-style: plain decimal, .0 marker, e-notation tail") {
    // inside the %g window the text is PLAIN decimal (Java's own
    // Double.toString would print 1.23E8), integral doubles keep the
    // .0 marker, and beyond the window MySQL's e-notation applies
    // (lowercase e, no +, no leading exponent zeros)
    val cases = Seq(
      1.23e8 -> "123000000.0",
      0.5 -> "0.5",
      123.456 -> "123.456",
      -2.5 -> "-2.5",
      0.0 -> "0.0",
      1e-4 -> "0.0001",
      1.5e-4 -> "0.00015",
      999999999999999.0 -> "999999999999999.0", // decpt 15: last plain form
      1e15 -> "1e15", // decpt 16: %g's switch point, like %.15g
      1e20 -> "1e20",
      1.5e20 -> "1.5e20",
      1e-5 -> "1e-5",
      -2.5e-7 -> "-2.5e-7")
    cases.foreach { case (x, want) =>
      assert(JsonBinary.renderDouble(x) == want, s"for $x")
      // plain forms must round-trip (shortest-correct contract)
      assert(java.lang.Double.parseDouble(JsonBinary.renderDouble(x)) == x)
    }
    assert(renderAst(JDouble(1.23e8)) == "123000000.0")
  }

  test("through the binlog: a JSON column decodes to its text") {
    import BinlogFormat._
    import BinlogFixture.Change
    val cols = IndexedSeq(ColumnDef(TypeLongLong, 0), ColumnDef(TypeJson, 4))
    val j = JObj(IndexedSeq("id" -> JInt(9),
      "tags" -> JArr(IndexedSeq(JStr("a"), JStr("b")))))
    val p = parse(BinlogFixture.encode("d", "t", cols,
      txns = Seq(Seq(Change.insert(IndexedSeq(9L, j))))))
    assert(p.changes.head.after.get ==
      IndexedSeq(9L, """{"id":9,"tags":["a","b"]}"""))
  }
}
