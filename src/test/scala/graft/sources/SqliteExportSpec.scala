package graft.sources

import java.nio.file.{Files, Paths}
import scala.sys.process._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The SQLite export validated by a REAL SQLite (python stdlib sqlite3 via
  * tools/check_sqlite.py): integrity_check walks every b-tree page, cell,
  * overflow chain and cross-checks idx_ts against the table, so a single
  * byte wrong in the hand-written format fails loudly here.
  */
class SqliteExportSpec extends SparkSpec {

  private def haveSqlite: Boolean =
    try Process(Seq("python3", "-c", "import sqlite3")).! == 0
    catch { case _: Throwable => false }

  /** md5 over "<rowid>,<ts>," + message bytes in rowid order — mirrors
    * tools/check_sqlite.py.
    */
  private def digest(rows: Seq[(Long, Array[Byte])]): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
    rows.zipWithIndex.foreach { case ((ts, msg), i) =>
      h.update(s"${i + 1},$ts,".getBytes("UTF-8"))
      h.update(msg)
    }
    h.digest().map("%02x".format(_)).mkString
  }

  private def check(db: String, rows: Seq[(Long, Array[Byte])]): Unit = {
    val out = new StringBuilder
    val rc = Process(Seq("python3", "tools/check_sqlite.py", db,
      rows.length.toString, digest(rows))).!(ProcessLogger(out ++= _))
    assert(rc == 0 && out.toString.contains("OK"), s"check_sqlite: $out")
  }

  test("writeDb round-trips through a real SQLite at varied shapes") {
    assume(haveSqlite, "python3+sqlite3 unavailable")
    val dir = Files.createTempDirectory("graft-sqlite").toString
    val rnd = new scala.util.Random(42)
    // shapes: empty, single row, leaf boundary-ish counts, multi-level
    // trees, huge blobs (> page local max → overflow chains), duplicate
    // ts keys, negative + zero + huge ts values
    val shapes = Seq(0, 1, 2, 17, 450, 451, 452, 1201, 5000)
    shapes.foreach { n =>
      val rows = (1 to n).map { i =>
        val ts =
          if (i % 7 == 0) 0L // the reference's zero-time sentinel rows
          else if (i % 11 == 0) -62135596800000000L
          else if (i % 13 == 0) 1700000000000000000L + (i % 5) // dup keys
          else rnd.between(-1000000L, 1000000L)
        val msg =
          if (i % 97 == 0) Array.fill[Byte](rnd.between(5000, 20000))(
            (i % 251).toByte) // spills into overflow pages
          else s"line $i ${"x" * rnd.between(0, 120)}".getBytes("UTF-8")
        (ts, msg)
      }
      val db = s"$dir/db_$n"
      val (got, xor, pages) = SqliteLogExport.writeDb(db, rows.iterator)
      assert(got === n.toLong && pages > 0)
      assert(xor === rows.map(_._1).foldLeft(0L)(_ ^ _))
      check(db, rows)
    }
  }

  test("reader recovers exactly what a REAL SQLite wrote (migration path)") {
    assume(haveSqlite, "python3+sqlite3 unavailable")
    val dir = Files.createTempDirectory("graft-sqlite-in").toString
    val db = s"$dir/c_real"
    // deterministic rows generated identically here and in python:
    // ts = (i*2654435761) % 1000000007 - 500000000 (negatives included),
    // message = ("m<i>." * k) bytes with one overflow-sized blob at i=500
    val script =
      s"""import sqlite3
         |con = sqlite3.connect("$db")
         |con.execute("CREATE TABLE logs (ts NUMBER, message BLOB)")
         |con.execute("CREATE INDEX idx_ts ON logs(ts)")
         |for i in range(1, 1201):
         |    ts = (i * 2654435761) % 1000000007 - 500000000
         |    k = 1000 if i == 500 else (i % 7) + 1
         |    msg = ("m%d." % i) * k
         |    con.execute("INSERT INTO logs VALUES (?, ?)", (ts, msg.encode()))
         |con.commit(); con.close()
         |""".stripMargin
    val rc = Process(Seq("python3", "-c", script)).!
    assert(rc == 0, "python writer failed")
    val got = SqliteLogImport.readDb(db)
    assert(got.length === 1200)
    got.zipWithIndex.foreach { case (r, j) =>
      val i = j + 1
      assert(r.rowid === i.toLong)
      assert(r.ts === (i.toLong * 2654435761L) % 1000000007L - 500000000L)
      val k = if (i == 500) 1000 else (i % 7) + 1
      assert(new String(r.message, "UTF-8") === s"m$i." * k, s"row $i")
    }
  }

  test("writer→reader round trip without any real SQLite in the loop") {
    val dir = Files.createTempDirectory("graft-sqlite-rt").toString
    val rows = (1 to 777).map(i =>
      (i * 31L % 997L - 500L, s"payload $i ${"y" * (i % 90)}".getBytes("UTF-8")))
    SqliteLogExport.writeDb(s"$dir/db", rows.iterator)
    val back = SqliteLogImport.readDb(s"$dir/db")
    assert(back.length === 777)
    back.zipWithIndex.foreach { case (r, j) =>
      assert(r.rowid === j + 1L && r.ts === rows(j)._1)
      assert(java.util.Arrays.equals(r.message, rows(j)._2))
    }
  }

  test("corrupt and live-WAL databases fail loudly, never decode garbage") {
    val dir = Files.createTempDirectory("graft-sqlite-bad").toString
    val rows = (1 to 400).map(i =>
      (i.toLong, s"row $i ${"z" * (i % 50)}".getBytes("UTF-8")))
    SqliteLogExport.writeDb(s"$dir/good", rows.iterator)
    val good = Files.readAllBytes(Paths.get(s"$dir/good"))

    // truncated mid-page (a torn copy of a live file): the b-tree points
    // past EOF — must say so, not throw a bare EOFException
    Files.write(Paths.get(s"$dir/trunc"),
      java.util.Arrays.copyOf(good, good.length - good.length / 3))
    val te = intercept[IllegalStateException] {
      SqliteLogImport.readDb(s"$dir/trunc")
    }
    assert(te.getMessage.contains("truncated"), te.getMessage)

    // bad cell pointer on the sqlite_master page (bit rot): page 1 is a
    // leaf, its cell pointer array starts at offset 108 — point the first
    // cell beyond the page
    val bad = good.clone()
    bad(108) = 0xff.toByte; bad(109) = 0xff.toByte
    Files.write(Paths.get(s"$dir/badptr"), bad)
    val pe = intercept[IllegalStateException] {
      SqliteLogImport.readDb(s"$dir/badptr")
    }
    assert(pe.getMessage.contains("corrupt cell pointer"), pe.getMessage)

    // WAL gating (ADVICE r12): the reference's sqlx driver defaults to
    // WAL, and header bytes 18/19 stay 2 even after a clean close — so a
    // WAL-version header with NO pending frames must import fine, and the
    // refusal must key on a -wal sidecar that actually holds frames
    // (committed rows the main-file walk would drop).
    val wal = good.clone()
    wal(18) = 2; wal(19) = 2
    Files.write(Paths.get(s"$dir/wal"), wal)
    // 1) no sidecar (clean close deleted it): importable
    assert(SqliteLogImport.readDb(s"$dir/wal").length === 400)
    // 2) sidecar with header only, no frames (post wal_checkpoint before
    //    TRUNCATE shrank it / fresh connection): importable
    Files.write(Paths.get(s"$dir/wal-wal"), new Array[Byte](32))
    assert(SqliteLogImport.readDb(s"$dir/wal").length === 400)
    // 3) sidecar with at least one frame: refuse with checkpoint guidance
    Files.write(Paths.get(s"$dir/wal-wal"), new Array[Byte](32 + 24 + 512))
    val we = intercept[IllegalArgumentException] {
      SqliteLogImport.readDb(s"$dir/wal")
    }
    assert(we.getMessage.contains("wal_checkpoint"), we.getMessage)

    // corrupt varint payload length ABOVE Int.MaxValue (ADVICE r12): must
    // fail as "corrupt cell", not wrap negative under toInt (4294967295
    // .toInt == -1) and reach tableLocal/payloadOf as garbage. Overwrite
    // the first leaf cell's payload-length varint with the 5-byte varint
    // for 2^32-1 (0x8F 0xFF 0xFF 0xFF 0x7F).
    val pgSize = ((good(16) & 0xff) << 8) | (good(17) & 0xff)
    val leafPage = (1 until good.length / pgSize)
      .find(p => (good(p * pgSize) & 0xff) == 0x0d)
    leafPage.foreach { p =>
      val base = p * pgSize
      val cellAt = base + (((good(base + 8) & 0xff) << 8) | (good(base + 9) & 0xff))
      val huge = good.clone()
      Seq(0x8f, 0xff, 0xff, 0xff, 0x7f).zipWithIndex.foreach {
        case (b, i) => huge(cellAt + i) = b.toByte
      }
      Files.write(Paths.get(s"$dir/hugelen"), huge)
      val he = intercept[IllegalStateException] {
        SqliteLogImport.readDb(s"$dir/hugelen")
      }
      assert(he.getMessage.contains("corrupt cell"), he.getMessage)
    }
    assert(leafPage.nonEmpty, "fixture db has no table leaf page?")

    // the pristine twin still reads fine (the mutations above are the
    // only difference)
    assert(SqliteLogImport.readDb(s"$dir/good").length === 400)
  }

  test("export writes one valid db per container with ingest-order rowids") {
    assume(haveSqlite, "python3+sqlite3 unavailable")
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sqlite-exp").toString
    // two containers, deliberately interleaved and unsorted in the input;
    // seq defines ingest order (= ROWID)
    val rows = ((1 to 300).map(i => ("c/alpha", i.toLong, i * 1000L,
        s"alpha $i".getBytes("UTF-8"))) ++
      (1 to 7).map(i => ("c2", i.toLong, 7000L - i, s"beta $i".getBytes("UTF-8"))))
    val df = new scala.util.Random(7).shuffle(rows)
      .toDF("container_id", "seq", "ts_nano", "message")
    val summary = SqliteLogExport.export(df, dir)
      .collect().map(s => s.container_id -> s).toMap
    assert(summary.keySet === Set("c/alpha", "c2"))
    assert(summary("c/alpha").n_rows === 300L)
    assert(summary("c2").n_rows === 7L)
    // path is sanitized for the filesystem
    assert(summary("c/alpha").path.endsWith("/c_alpha"))
    check(summary("c/alpha").path,
      (1 to 300).map(i => (i * 1000L, s"alpha $i".getBytes("UTF-8"))))
    check(summary("c2").path,
      (1 to 7).map(i => (7000L - i, s"beta $i".getBytes("UTF-8"))))
  }
}
