package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.TestSpark
import graft.sources.{BinlogFixture, BinlogFormat, BinlogSource}
import BinlogFormat.ColumnDef
import BinlogFixture.{Absent, Change}

/** Pins the MINIMAL row-image surface end to end: the fixture's
  * columns-present encoding, the decode's `_present` bitmap, and the
  * [[MinimalImage.coalesce]] semantics — in particular the distinction
  * the whole feature hinges on: an ABSENT column keeps its prior value,
  * an explicit SQL NULL (present bit set, null bitmap set) overwrites. */
class MinimalImageSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark

  private val cols = IndexedSeq(
    ColumnDef(BinlogFormat.TypeLongLong, 0),   // id (PK)
    ColumnDef(BinlogFormat.TypeVarchar, 40),   // name
    ColumnDef(BinlogFormat.TypeDouble, 8))     // bal
  private val schema = StructType.fromDDL(
    "id BIGINT, name STRING, bal DOUBLE")

  test("wire roundtrip: absent columns clear the present bit, nulls set it") {
    val bytes = BinlogFixture.encode("d", "t", cols, txns = Seq(Seq(
      Change.insert(IndexedSeq(1L, "a", 10.0)),
      // minimal update: PK + bal only (name ABSENT)
      Change.update(IndexedSeq(1L, Absent, Absent),
        IndexedSeq(1L, Absent, 20.0)),
      // explicit null: name PRESENT and NULL
      Change.update(IndexedSeq(1L, Absent, Absent),
        IndexedSeq(1L, null, Absent)))))
    val p = BinlogFormat.parse(bytes)
    assert(p.changes.map(_.op) == Vector("I", "U", "U"))
    assert(p.changes(0).present == IndexedSeq(true, true, true))
    val u1 = p.changes(1)
    assert(u1.present == IndexedSeq(true, false, true))
    assert(u1.after.get == IndexedSeq(1L, null, 20.0)) // absent reads null…
    val u2 = p.changes(2)
    assert(u2.present == IndexedSeq(true, true, false))
    assert(u2.after.get == IndexedSeq(1L, null, null)) // …so does real null
    // only the bitmaps tell them apart — which is the operator's input
  }

  test("coalesce: absent keeps the prior value, explicit null overwrites, " +
      "deletes fence and inserts resurrect") {
    val landing = graft.GateCache.tempDir("graft_minimg_spec").toString
    val txn = Seq(
      Change.insert(IndexedSeq(1L, "a", 10.0)),
      Change.update(IndexedSeq(1L, Absent, Absent),
        IndexedSeq(1L, Absent, 20.0)),   // bal → 20, name stays "a"
      Change.update(IndexedSeq(1L, Absent, Absent),
        IndexedSeq(1L, null, Absent)),   // name → NULL explicitly
      Change.insert(IndexedSeq(2L, "b", 1.0)),
      Change.delete(IndexedSeq(2L, Absent, Absent)), // minimal delete: PK only
      Change.insert(IndexedSeq(3L, "c", 3.0)),
      Change.update(IndexedSeq(3L, Absent, Absent),
        IndexedSeq(3L, "c2", Absent)),
      Change.delete(IndexedSeq(3L, Absent, Absent)),
      Change.insert(IndexedSeq(3L, "c3", 33.0))) // resurrected fresh
    java.nio.file.Files.write(
      java.nio.file.Paths.get(landing, "min-bin.000001"),
      BinlogFixture.encode("d", "t", cols, txns = Seq(txn)))
    val decoded = BinlogSource.changes(spark, landing, "t", schema,
      presentCol = true)
    val live = MinimalImage.coalesce(decoded, pks = Seq("id"))
      .orderBy("id").collect()
    assert(live.length == 2)
    assert(live(0).getLong(0) == 1L && live(0).isNullAt(1) &&
      live(0).getDouble(2) == 20.0,
      s"key 1: ${live(0)} — explicit null must overwrite, absent must not")
    // key 3's pre-delete update ("c2") must NOT resurrect
    assert(live(1).getLong(0) == 3L && live(1).getString(1) == "c3" &&
      live(1).getDouble(2) == 33.0, s"key 3: ${live(1)}")
  }
}
