package graft.sources

import java.io.RandomAccessFile

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pure-Scala SQLite 3 database READER for the reference's log dbs — the
  * MIGRATION path: a logsqlite deployment holds one SQLite db per
  * container (`logs (ts NUMBER, message BLOB)`, rowid = insertion order,
  * logsqlite src/logger.rs:146-147); [[read]] walks those files directly
  * in executor tasks and lands them in a DataFrame, so "switch engines"
  * is one import job, no sqlite3 CLI round-trip, no JDBC driver.
  *
  * Scope: read-only walk of the `logs` table b-tree of a CHECKPOINTED
  * database. The reference's sqlx connections default to WAL journal mode,
  * and a WAL database's header read/write-version bytes stay 2 forever —
  * even after a clean close (which checkpoints and DELETES the -wal
  * sidecar) — so the header alone says nothing about safety. What matters
  * is pending frames: committed rows this reader would silently drop live
  * only in a `<path>-wal` sidecar with at least one frame. [[readDb]]
  * therefore refuses exactly that case (run `PRAGMA
  * wal_checkpoint(TRUNCATE)` or stop the writer first) and accepts
  * WAL-version headers otherwise. Freelist/pointer-map pages are skipped
  * naturally (the walk starts at the root). Cross-validated against
  * databases written by a REAL SQLite in `SqliteExportSpec` — the inverse
  * of the writer's check (writer → real reader, real writer → this
  * reader).
  */
object SqliteLogImport {

  /** Decoded `logs` row: insertion-order rowid, the indexed ts, payload. */
  final case class LogRow(rowid: Long, ts: Long, message: Array[Byte])

  private final class Db(path: String) {
    private val raf = new RandomAccessFile(path, "r")
    private val h = new Array[Byte](100)
    raf.seek(0); raf.readFully(h)
    require(new String(h, 0, 15, "ISO-8859-1") == "SQLite format 3",
      s"$path: not an SQLite database")
    // live logsqlite dbs can be mid-write; committed rows this reader
    // would silently DROP live only in a `-wal` sidecar holding at least
    // one frame (32-byte header alone = no frames). Gate on THAT, not on
    // the header version bytes: sqlx (the reference's driver) defaults to
    // WAL mode and the version bytes stay 2 even after clean close — a
    // header gate would reject every real logsqlite db, importable or not
    // (ADVICE r12).
    locally {
      val wal = new java.io.File(path + "-wal")
      require(!wal.isFile || wal.length() <= 32L,
        s"$path: a non-empty -wal sidecar (${wal.length()} bytes) may hold " +
          "committed rows this reader would miss; run PRAGMA " +
          "wal_checkpoint(TRUNCATE) (or stop the writer, which checkpoints " +
          "and deletes it) before importing")
    }
    val pageSize: Int = {
      val v = ((h(16) & 0xff) << 8) | (h(17) & 0xff)
      if (v == 1) 65536 else v
    }
    val usable: Int = pageSize - (h(20) & 0xff)
    val fileLen: Long = raf.length()

    def page(no: Int): Array[Byte] = {
      // explicit bounds → "corrupt/truncated" instead of a raw EOFException
      // from a b-tree pointer past the end of a cut-short file
      if (no < 1 || no.toLong * pageSize > fileLen)
        throw new IllegalStateException(
          s"$path: corrupt or truncated database — page $no is beyond " +
            s"EOF ($fileLen bytes at page size $pageSize)")
      val out = new Array[Byte](pageSize)
      raf.seek((no - 1).toLong * pageSize)
      raf.readFully(out)
      out
    }

    def close(): Unit = raf.close()
  }

  private def u16(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)
  private def u32(b: Array[Byte], at: Int): Long =
    ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
      ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)

  /** (value, bytes consumed) */
  private def readVarint(b: Array[Byte], at: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(at + i)
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(at + 8) & 0xff), 9)
  }

  private def serialLen(t: Long): Int = t match {
    case 0 | 8 | 9 => 0
    case 1 => 1
    case 2 => 2
    case 3 => 3
    case 4 => 4
    case 5 => 6
    case 6 | 7 => 8
    case n if n >= 12 => ((n - 12) / 2).toInt
    case n => throw new IllegalStateException(s"reserved serial type $n")
  }

  private def readInt(b: Array[Byte], at: Int, t: Long): Long = t match {
    case 0 => 0L
    case 8 => 0L
    case 9 => 1L
    case 7 => // REAL — the reference declares ts NUMBER; tolerate floats
      java.lang.Double.longBitsToDouble(
        (0 until 8).foldLeft(0L)((acc, i) => (acc << 8) | (b(at + i) & 0xffL))).toLong
    case n =>
      val len = serialLen(n)
      var v = if ((b(at) & 0x80) != 0) -1L else 0L // sign-extend
      var i = 0
      while (i < len) { v = (v << 8) | (b(at + i) & 0xffL); i += 1 }
      v
  }

  /** Reassemble a cell payload that may spill into an overflow chain.
    * `local` bytes start at `at`; total payload is `payloadLen`.
    */
  private def payloadOf(db: Db, page: Array[Byte], at: Int, local: Int,
      payloadLen: Int): Array[Byte] = {
    if (local >= payloadLen) {
      val out = new Array[Byte](payloadLen)
      System.arraycopy(page, at, out, 0, payloadLen)
      return out
    }
    val out = new Array[Byte](payloadLen)
    System.arraycopy(page, at, out, 0, local)
    var got = local
    var next = u32(page, at + local).toInt
    while (next != 0 && got < payloadLen) {
      val op = db.page(next)
      val take = math.min(db.usable - 4, payloadLen - got)
      System.arraycopy(op, 4, out, got, take)
      got += take
      next = u32(op, 0).toInt
    }
    require(got == payloadLen, s"truncated overflow chain ($got/$payloadLen)")
    out
  }

  /** Local-payload size for a table leaf cell (the spill rule inverse). */
  private def tableLocal(db: Db, payloadLen: Int): Int = {
    val maxLocal = db.usable - 35
    if (payloadLen <= maxLocal) payloadLen
    else {
      val minLocal = (db.usable - 12) * 32 / 255 - 23
      val k = minLocal + (payloadLen - minLocal) % (db.usable - 4)
      if (k <= maxLocal) k else minLocal
    }
  }

  /** Depth-first in-order walk of a table b-tree; `onRow` receives
    * (rowid, record payload).
    */
  private def walkTable(db: Db, pageNo: Int)(onRow: (Long, Array[Byte]) => Unit): Unit = {
    val pg = db.page(pageNo)
    val hdr = if (pageNo == 1) 100 else 0
    val typ = pg(hdr) & 0xff
    val nCells = u16(pg, hdr + 3)
    // bad cell pointers (bit rot, torn writes) must fail as "corrupt", not
    // as an ArrayIndexOutOfBounds from deep inside varint decoding
    def cellPtr(at: Int): Int = {
      val p = u16(pg, at)
      if (p < hdr + 8 || p >= pg.length)
        throw new IllegalStateException(
          s"page $pageNo: corrupt cell pointer $p (page size ${pg.length})")
      p
    }
    typ match {
      case 0x05 =>
        var i = 0
        while (i < nCells) {
          val cellAt = cellPtr(hdr + 12 + 2 * i)
          walkTable(db, u32(pg, cellAt).toInt)(onRow)
          i += 1
        }
        walkTable(db, u32(pg, hdr + 8).toInt)(onRow)
      case 0x0d =>
        var i = 0
        while (i < nCells) {
          var at = cellPtr(hdr + 8 + 2 * i)
          val (pLen, c1) = readVarint(pg, at); at += c1
          val (rowid, c2) = readVarint(pg, at); at += c2
          // bound pLen as a LONG before any toInt: a corrupt varint above
          // Int.MaxValue wraps negative under toInt and would reach
          // tableLocal/payloadOf as garbage (ADVICE r12) — no real payload
          // can exceed the file itself
          if (pLen < 0L || pLen > math.min(db.fileLen, 1000000000L))
            throw new IllegalStateException(
              s"page $pageNo: corrupt cell — payload length $pLen exceeds " +
                s"the ${db.fileLen}-byte file (or SQLITE_MAX_LENGTH)")
          if (at + math.min(tableLocal(db, pLen.toInt), pLen) > pg.length)
            throw new IllegalStateException(
              s"page $pageNo: corrupt cell — payload length $pLen overruns the page")
          val local = tableLocal(db, pLen.toInt)
          onRow(rowid, payloadOf(db, pg, at, local, pLen.toInt))
          i += 1
        }
      case other =>
        throw new IllegalStateException(s"page $pageNo: not a table page ($other)")
    }
  }

  /** Decode the first two record columns as (int, bytes) — the reference's
    * `(ts, message)` shape. TEXT message columns decode as their UTF-8
    * bytes; NULL as empty.
    */
  private def decodeRow(rec: Array[Byte]): (Long, Array[Byte]) = {
    val (hdrLen, c0) = readVarint(rec, 0)
    var tAt = c0
    val (t1, c1) = readVarint(rec, tAt); tAt += c1
    val (t2, _) = readVarint(rec, tAt)
    var body = hdrLen.toInt
    val ts = readInt(rec, body, t1)
    body += serialLen(t1)
    val msg = new Array[Byte](serialLen(t2))
    if (msg.length > 0) System.arraycopy(rec, body, msg, 0, msg.length)
    (ts, msg)
  }

  /** Find a root page in sqlite_master by (type, name). */
  private def rootOf(db: Db, typ: String, name: String): Int = {
    var found = 0
    walkTable(db, 1) { (_, rec) =>
      // sqlite_master: (type TEXT, name TEXT, tbl_name TEXT, rootpage INT, sql TEXT)
      val (h, c0) = readVarint(rec, 0)
      var at = c0
      val serials = new scala.collection.mutable.ArrayBuffer[Long](5)
      while (at < h) {
        val (s, c) = readVarint(rec, at); serials += s; at += c
      }
      var body = h.toInt
      def text(i: Int): String = {
        var b = body
        (0 until i).foreach(j => b += serialLen(serials(j)))
        new String(rec, b, serialLen(serials(i)), "UTF-8")
      }
      if (serials.length >= 4 && text(0) == typ && text(1) == name) {
        var b = body
        (0 until 3).foreach(j => b += serialLen(serials(j)))
        found = readInt(rec, b, serials(3)).toInt
      }
    }
    require(found > 0, s"no $typ named $name in sqlite_master")
    found
  }

  /** Stream every `logs` row of one db file (rowid order). */
  def readDb(path: String): Seq[LogRow] = {
    val db = new Db(path)
    try {
      val root = rootOf(db, "table", "logs")
      val out = new scala.collection.mutable.ArrayBuffer[LogRow]()
      walkTable(db, root) { (rowid, rec) =>
        val (ts, msg) = decodeRow(rec)
        out += LogRow(rowid, ts, msg)
      }
      out.toSeq
    } finally db.close()
  }

  /** Import a directory of per-container dbs (file name = container id,
    * the reference's layout) into a DataFrame
    * `(container_id, rowid, ts_nano, message)` — one task per db.
    */
  def read(spark: SparkSession, dbDir: String): DataFrame = {
    import spark.implicits._
    val files = new java.io.File(dbDir).listFiles()
    require(files != null, s"$dbDir: not a directory")
    val paths = files.filter(_.isFile).map(_.getPath).sorted.toSeq
    spark.sparkContext
      .parallelize(paths, math.max(1, paths.length))
      .flatMap { p =>
        val c = new java.io.File(p).getName
        readDb(p).map(r => (c, r.rowid, r.ts, r.message))
      }
      .toDF("container_id", "rowid", "ts_nano", "message")
  }
}
