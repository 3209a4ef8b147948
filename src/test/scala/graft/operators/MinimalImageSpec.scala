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

  test("partial/merge: a batch carrying only a key's partial update " +
      "does not erase columns landed earlier") {
    // batch 1: the insert (full row). batch 2: bal-only update — its
    // partial has null markers for name; the merge must keep batch 1's
    val landing = graft.GateCache.tempDir("graft_minimg_pm").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(landing, "pm-bin.000001"),
      BinlogFixture.encode("d", "t", cols, txns = Seq(Seq(
        Change.insert(IndexedSeq(1L, "a", 10.0)),
        Change.insert(IndexedSeq(2L, "b", 5.0))))))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(landing, "pm-bin.000002"),
      BinlogFixture.encode("d", "t", cols, txns = Seq(Seq(
        Change.update(IndexedSeq(1L, Absent, Absent),
          IndexedSeq(1L, Absent, 20.0)),      // bal only
        Change.update(IndexedSeq(2L, Absent, Absent),
          IndexedSeq(2L, null, Absent))))))   // explicit-NULL name only
    def fileChanges(name: String) = {
      val one = graft.GateCache.tempDir(s"graft_minimg_pm_$name").toString
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(landing, name),
        java.nio.file.Paths.get(one, name))
      BinlogSource.changes(spark, one, "t", schema, presentCol = true)
    }
    val p1 = MinimalImage.partial(fileChanges("pm-bin.000001"), Seq("id"))
    val p2 = MinimalImage.partial(fileChanges("pm-bin.000002"), Seq("id"))
    // batch 2's partial really is blind to name for key 1…
    val p2k1 = p2.filter(col("id") === 1L).collect().head
    assert(p2k1.isNullAt(p2.columns.indexOf("_seq_name")),
      "bal-only update must land a NULL name seq marker")
    val merged = MinimalImage.merge(p1.unionByName(p2), Seq("id"))
      .orderBy("id").collect()
    // …and the merge keeps batch 1's name while taking batch 2's bal
    assert(merged(0).getString(1) == "a" && merged(0).getDouble(2) == 20.0,
      s"key 1: ${merged(0)} — the partial batch erased an earlier column")
    // the explicit NULL (a real include) DOES overwrite across batches
    assert(merged(1).isNullAt(1) && merged(1).getDouble(2) == 5.0,
      s"key 2: ${merged(1)}")
  }

  test("merge payloadOrder restores TABLE_MAP order when the pk is not " +
      "the first payload column") {
    // a table whose wire order is (name, id, bal) with pk=id: coalesce
    // keeps that order; merge's partials lose it (groupBy puts pks
    // first), so positional consumers need payloadOrder to realign
    val cols2 = IndexedSeq(
      ColumnDef(BinlogFormat.TypeVarchar, 40),   // name
      ColumnDef(BinlogFormat.TypeLongLong, 0),   // id (PK, mid-frame)
      ColumnDef(BinlogFormat.TypeDouble, 8))     // bal
    val schema2 = StructType.fromDDL("name STRING, id BIGINT, bal DOUBLE")
    val landing = graft.GateCache.tempDir("graft_minimg_ord").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(landing, "ord-bin.000001"),
      BinlogFixture.encode("d", "t", cols2, txns = Seq(Seq(
        Change.insert(IndexedSeq("a", 1L, 10.0)),
        Change.update(IndexedSeq(Absent, 1L, Absent),
          IndexedSeq(Absent, 1L, 20.0))))))
    val decoded = graft.GateCache.cache(
      BinlogSource.changes(spark, landing, "t", schema2, presentCol = true))
    val whole = MinimalImage.coalesce(decoded, pks = Seq("id"))
    assert(whole.columns.toSeq == Seq("name", "id", "bal"))
    val partials = MinimalImage.partial(decoded, Seq("id"))
    // default: pks lead — POSITIONALLY INCOMPATIBLE with coalesce
    assert(MinimalImage.merge(partials, Seq("id"))
      .columns.toSeq == Seq("id", "name", "bal"))
    // payloadOrder restores interchangeability
    val merged = MinimalImage.merge(partials, Seq("id"),
      payloadOrder = schema2.fieldNames.toIndexedSeq)
    assert(merged.columns.toSeq == Seq("name", "id", "bal"))
    assert(merged.exceptAll(whole).count() == 0 &&
      whole.exceptAll(merged).count() == 0)
    // a non-permutation order fails loudly, never silently drops a column
    assertThrows[IllegalArgumentException] {
      MinimalImage.merge(partials, Seq("id"),
        payloadOrder = Seq("name", "id"))
    }
  }

  test("partial/merge over any batch split equals the single-pass coalesce") {
    // the associative-fold property the streaming apply rests on:
    // split the change frame at arbitrary seq boundaries, partial each
    // slice, merge the partials — identical to coalescing the whole
    val landing = graft.GateCache.tempDir("graft_minimg_assoc").toString
    val txn = (1L to 30L).flatMap { k =>
      Seq(Change.insert(IndexedSeq(k, s"n$k", k.toDouble))) ++
        (if (k % 2 == 0) Seq(Change.update(
          IndexedSeq(k, Absent, Absent),
          IndexedSeq(k, Absent, k.toDouble + 100))) else Nil) ++
        (if (k % 3 == 0) Seq(Change.update(
          IndexedSeq(k, Absent, Absent),
          IndexedSeq[Any](k, null, Absent))) else Nil) ++
        (if (k % 7 == 0) Seq(Change.delete(
          IndexedSeq(k, Absent, Absent))) else Nil)
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(landing, "assoc-bin.000001"),
      BinlogFixture.encode("d", "t", cols, txns = Seq(txn)))
    val decoded = graft.GateCache.cache(
      BinlogSource.changes(spark, landing, "t", schema, presentCol = true))
    val whole = MinimalImage.coalesce(decoded, pks = Seq("id"))
    for (cut <- Seq(1L, 17L, 43L)) {
      val merged = MinimalImage.merge(
        MinimalImage.partial(decoded.filter(col("_seq") < cut), Seq("id"))
          .unionByName(MinimalImage.partial(
            decoded.filter(col("_seq") >= cut), Seq("id"))),
        Seq("id"))
      assert(merged.exceptAll(whole).count() == 0 &&
        whole.exceptAll(merged).count() == 0,
        s"split at seq $cut diverges from the single-pass coalesce")
    }
  }
}
