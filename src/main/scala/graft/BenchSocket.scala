package graft

import graft.sources.{BinlogFixture, BinlogFixtureServer, BinlogSocketClient}
import graft.sources.BinlogFormat.{ColumnDef, TypeDouble, TypeLongLong, TypeVarchar}
import graft.sources.BinlogFixture.Change

/** Socket-family scaling record: events/sec through the live
  * replication tail (loopback TCP → [[graft.sources.MysqlProtocol]]
  * framing + checksum negotiation → event decode → commit-boundary
  * drain), at 1 k / 10 k / 100 k change rows — directly comparable to
  * the reference's one published engine-component number: ~1,000–5,000
  * events/sec single-threaded CDC processing
  * (`/root/reference/README.md:462`). The tail is measured alone (the
  * protocol + decode edge; the reference's figure likewise excludes
  * the initial snapshot), min of 3 runs after a JIT warmup. Rows match
  * the reference's benchmark shape: a PK, a 40-char name, a double —
  * batched 100 rows/transaction like a busy OLTP commit stream.
  * Usage: `tools/run_main.sh BenchSocket`. */
object BenchSocket {
  def main(args: Array[String]): Unit = {
    val cols = IndexedSeq(
      ColumnDef(TypeLongLong, 0),
      ColumnDef(TypeVarchar, 40),
      ColumnDef(TypeDouble, 8))
    def file(n: Int): Array[Byte] = BinlogFixture.encode(
      "bench", "t", cols,
      (1 to n).map(k => Change.insert(
        IndexedSeq[Any](k.toLong, s"name-$k", (k % 1000).toDouble)))
        .grouped(100).map(_.toSeq).toSeq,
      gtidFrom = Some(1L))
    val sizes = Seq(1000, 10000, 100000)
    val results = sizes.map { n =>
      val srv = new BinlogFixtureServer(
        IndexedSeq("bench-bin.000001" -> file(n)), "repl", "graft-secret")
      try {
        val cli = new BinlogSocketClient("127.0.0.1", srv.port,
          "repl", "graft-secret")
        def once(): Double = {
          val t0 = System.nanoTime()
          val r = cli.tail("bench-bin.000001")
          val dt = (System.nanoTime() - t0) / 1e9
          require(r.changes.size == n, s"tailed ${r.changes.size} != $n")
          dt
        }
        once() // JIT + class-load warmup
        val best = (1 to 3).map(_ => once()).min
        val eps = n / best
        println(f"n=$n%6d  min=$best%.3f s  events/s=$eps%.0f")
        (n, best, eps)
      } finally srv.close()
    }
    val top = results.last
    println(s"""{"metric":"socket_tail_events_per_sec","value":${top._3.round},""" +
      s""""unit":"events/sec","sizes":{${results.map(r =>
        s""""${r._1}":${r._3.round}""").mkString(",")}},""" +
      s""""reference_estimate":"1000-5000 events/sec (README.md:462)"}""")
  }
}
