package graft.sources

import java.io.RandomAccessFile
import scala.collection.mutable.ArrayBuffer

/** Minimal single-pass SQLite 3 database WRITER — pure Scala, no JDBC.
  *
  * Why this exists: the reference engine's on-disk artifact is one SQLite
  * db per container (`logs (ts NUMBER, message BLOB)` + `idx_ts ON
  * logs(ts)`, logsqlite src/logger.rs:146-147, path src/logger.rs:250-251);
  * [[SqliteLogExport]] reproduces that artifact from the parquet log table
  * so a reference deployment can consume graft's output byte-compatibly
  * (`sqlite3 <db> 'SELECT …'`, docker-side tooling).
  *
  * Scope: write-once bulk load of PRE-SORTED rows — exactly what an export
  * needs. Table b-trees build bottom-up from rowid-ordered rows, index
  * b-trees from key-ordered entries (interior pages hold each promoted key
  * exactly once, per the format). Overflow chains are supported for large
  * blobs (dockerd splits lines at 16 KB — above a 4 KB page's local
  * maximum). No freelist, no WAL, no vacuum; UTF-8 text encoding.
  *
  * Format: the public SQLite file-format documentation
  * (sqlite.org/fileformat2). Every db written here is validated in tests
  * by a real SQLite (`PRAGMA integrity_check`, content + index-plan
  * queries through the stdlib sqlite3).
  */
object SqliteFormat {

  val PageSize = 4096

  // ---- varints & record (serial-type) encoding ---------------------------

  /** SQLite varint: big-endian base-128, 1–9 bytes (9th byte carries a
    * full 8 bits, covering all 64).
    */
  def varint(v: Long): Array[Byte] = {
    if ((v >>> 56) != 0) {
      val out = new Array[Byte](9)
      out(8) = (v & 0xff).toByte
      var x = v >>> 8
      var i = 7
      while (i >= 0) { out(i) = ((x & 0x7f) | 0x80).toByte; x = x >>> 7; i -= 1 }
      out
    } else {
      var n = 1
      var x = v >>> 7
      while (x != 0) { n += 1; x = x >>> 7 }
      val out = new Array[Byte](n)
      var y = v
      var i = n - 1
      while (i >= 0) {
        out(i) = ((y & 0x7f) | (if (i == n - 1) 0 else 0x80)).toByte
        y = y >>> 7
        i -= 1
      }
      out
    }
  }

  sealed trait SqlVal
  case object SqlNull extends SqlVal
  final case class SqlInt(v: Long) extends SqlVal
  final case class SqlText(v: String) extends SqlVal
  final case class SqlBlob(v: Array[Byte]) extends SqlVal

  /** Smallest integer serial type: 1/2/3/4-byte, 6-byte (serial 5), or
    * 8-byte (serial 6). Serials 8/9 (constant 0/1) need schema format ≥ 4
    * and save little — not used.
    */
  private def intSerial(v: Long): (Long, Array[Byte]) = {
    def be(n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) { out(i) = (v >>> (8 * (n - 1 - i))).toByte; i += 1 }
      out
    }
    if (v >= -128 && v <= 127) (1L, be(1))
    else if (v >= -32768 && v <= 32767) (2L, be(2))
    else if (v >= -8388608 && v <= 8388607) (3L, be(3))
    else if (v >= Int.MinValue && v <= Int.MaxValue) (4L, be(4))
    else if (v >= -140737488355328L && v <= 140737488355327L) (5L, be(6))
    else (6L, be(8))
  }

  /** Encode one row as an SQLite record (serial-type header + body). */
  def record(vals: Seq[SqlVal]): Array[Byte] = {
    val parts: Seq[(Long, Array[Byte])] = vals.map {
      case SqlNull => (0L, Array.emptyByteArray)
      case SqlInt(v) => intSerial(v)
      case SqlText(s) =>
        val b = s.getBytes("UTF-8"); (13L + 2L * b.length, b)
      case SqlBlob(b) => (12L + 2L * b.length, b)
    }
    val typesLen = parts.map(p => varint(p._1).length).sum
    // the header-size varint includes itself — iterate to the fixpoint
    var hdrLen = typesLen + 1
    while (varint(hdrLen.toLong).length + typesLen != hdrLen)
      hdrLen = varint(hdrLen.toLong).length + typesLen
    val out = new java.io.ByteArrayOutputStream()
    out.write(varint(hdrLen.toLong))
    parts.foreach(p => out.write(varint(p._1)))
    parts.foreach(p => out.write(p._2))
    out.toByteArray
  }

  // ---- paged file ----------------------------------------------------------

  /** Append-allocated page file; page 1 is reserved for the header +
    * sqlite_master and written last (root page numbers are only known once
    * the b-trees are built).
    */
  final class PageFile(path: String) {
    private val raf = new RandomAccessFile(path, "rw")
    raf.setLength(0)
    raf.setLength(PageSize.toLong) // reserve page 1
    private var pages = 1

    def nPages: Int = pages

    /** Append `data` (≤ PageSize, zero-padded) as the next page; returns
      * its 1-based page number.
      */
    def alloc(data: Array[Byte]): Int = {
      require(data.length <= PageSize, s"page overflow: ${data.length}")
      pages += 1
      raf.seek((pages - 1).toLong * PageSize)
      raf.write(data)
      if (data.length < PageSize) raf.write(new Array[Byte](PageSize - data.length))
      pages
    }

    def writePage1(data: Array[Byte]): Unit = {
      require(data.length == PageSize)
      raf.seek(0)
      raf.write(data)
    }

    def close(): Unit = raf.close()
  }

  // ---- b-tree page assembly -------------------------------------------------

  private[sources] final class PageAccum(interior: Boolean, page1: Boolean = false) {
    private val headerAt: Int = if (page1) 100 else 0
    private val headerSize: Int = if (interior) 12 else 8
    private val cells = new ArrayBuffer[Array[Byte]]()
    private var contentBytes = 0

    def isEmpty: Boolean = cells.isEmpty
    def nCells: Int = cells.length

    def fits(cell: Array[Byte]): Boolean =
      headerAt + headerSize + 2 * (cells.length + 1) +
        contentBytes + cell.length <= PageSize

    def add(cell: Array[Byte]): Unit = { cells += cell; contentBytes += cell.length }

    def removeLast(): Array[Byte] = {
      val c = cells.remove(cells.length - 1)
      contentBytes -= c.length
      c
    }

    def reset(): Unit = { cells.clear(); contentBytes = 0 }

    /** Assemble the raw page bytes. `pageType`: 0x0d table leaf, 0x05
      * table interior, 0x0a index leaf, 0x02 index interior.
      */
    def build(pageType: Int, rightMost: Int = 0): Array[Byte] = {
      val out = new Array[Byte](PageSize)
      val p = headerAt
      out(p) = pageType.toByte
      out(p + 3) = ((cells.length >> 8) & 0xff).toByte
      out(p + 4) = (cells.length & 0xff).toByte
      var contentStart = PageSize
      cells.foreach(c => contentStart -= c.length)
      out(p + 5) = ((contentStart >> 8) & 0xff).toByte
      out(p + 6) = (contentStart & 0xff).toByte
      if (interior) {
        out(p + 8) = ((rightMost >> 24) & 0xff).toByte
        out(p + 9) = ((rightMost >> 16) & 0xff).toByte
        out(p + 10) = ((rightMost >> 8) & 0xff).toByte
        out(p + 11) = (rightMost & 0xff).toByte
      }
      var ptr = p + headerSize
      var off = PageSize
      cells.foreach { c =>
        off -= c.length
        out(ptr) = ((off >> 8) & 0xff).toByte
        out(ptr + 1) = (off & 0xff).toByte
        ptr += 2
        System.arraycopy(c, 0, out, off, c.length)
      }
      out
    }
  }

  // ---- payload spill ---------------------------------------------------------

  /** Split `payload` into (local prefix, overflow head page or 0) per the
    * leaf spill rules, writing the overflow chain tail-first.
    */
  private def spill(pf: PageFile, payload: Array[Byte], maxLocal: Int,
      minLocal: Int): (Array[Byte], Int) = {
    val p = payload.length
    if (p <= maxLocal) return (payload, 0)
    val k = minLocal + (p - minLocal) % (PageSize - 4)
    val local = if (k <= maxLocal) k else minLocal
    val rest = payload.drop(local)
    val chunks = rest.grouped(PageSize - 4).toArray
    var next = 0
    for (i <- chunks.indices.reverse) {
      val page = new Array[Byte](4 + chunks(i).length)
      page(0) = ((next >> 24) & 0xff).toByte
      page(1) = ((next >> 16) & 0xff).toByte
      page(2) = ((next >> 8) & 0xff).toByte
      page(3) = (next & 0xff).toByte
      System.arraycopy(chunks(i), 0, page, 4, chunks(i).length)
      next = pf.alloc(page)
    }
    (payload.take(local), next)
  }

  private def be4(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def tableLeafCell(pf: PageFile, rowid: Long,
      payload: Array[Byte]): Array[Byte] = {
    val maxLocal = PageSize - 35
    val minLocal = (PageSize - 12) * 32 / 255 - 23
    val (local, ovfl) = spill(pf, payload, maxLocal, minLocal)
    val out = new java.io.ByteArrayOutputStream()
    out.write(varint(payload.length.toLong))
    out.write(varint(rowid))
    out.write(local)
    if (ovfl != 0) out.write(be4(ovfl))
    out.toByteArray
  }

  private def indexCell(pf: PageFile, payload: Array[Byte],
      leftChild: Int): Array[Byte] = {
    val maxLocal = (PageSize - 12) * 64 / 255 - 23
    val minLocal = (PageSize - 12) * 32 / 255 - 23
    val (local, ovfl) = spill(pf, payload, maxLocal, minLocal)
    val out = new java.io.ByteArrayOutputStream()
    if (leftChild != 0) out.write(be4(leftChild))
    out.write(varint(payload.length.toLong))
    out.write(local)
    if (ovfl != 0) out.write(be4(ovfl))
    out.toByteArray
  }

  private def tableInteriorCell(child: Int, key: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(be4(child))
    out.write(varint(key))
    out.toByteArray
  }

  // ---- bottom-up table b-tree --------------------------------------------------

  /** Streaming bulk loader for a table b-tree: rows must arrive in rowid
    * order. Leaves are written as they fill; interior levels build at
    * finish from (childPage, maxRowid) lists — memory is O(leaves).
    */
  final class TableBtreeWriter(pf: PageFile) {
    private val leaf = new PageAccum(interior = false)
    private val children = new ArrayBuffer[(Int, Long)]()
    private var lastRowid = 0L

    def add(rowid: Long, payload: Array[Byte]): Unit = {
      val cell = tableLeafCell(pf, rowid, payload)
      if (!leaf.fits(cell) && !leaf.isEmpty) flushLeaf()
      require(leaf.fits(cell), "cell exceeds page capacity")
      leaf.add(cell)
      lastRowid = rowid
    }

    private def flushLeaf(): Unit = {
      children += ((pf.alloc(leaf.build(0x0d)), lastRowid))
      leaf.reset()
    }

    def finish(): Int = {
      flushLeaf() // an empty leaf is the valid root of an empty table
      var level: IndexedSeq[(Int, Long)] = children.toIndexedSeq
      while (level.length > 1) {
        val up = new ArrayBuffer[(Int, Long)]()
        var i = 0
        while (i < level.length) {
          val acc = new PageAccum(interior = true)
          val taken = new ArrayBuffer[(Int, Long)]()
          // take cells while they fit, keeping one entry for the
          // right-most pointer
          var open = true
          while (open && i < level.length - 1) {
            val c = tableInteriorCell(level(i)._1, level(i)._2)
            if (acc.fits(c)) { acc.add(c); taken += level(i); i += 1 }
            else open = false
          }
          // if consuming the next entry as right-most would strand exactly
          // one final entry with no cells, demote this page's last cell to
          // right-most instead (its entry re-queues nothing: the child
          // becomes the pointer, its max-key labels this page upward)
          if (i == level.length - 2 && taken.length >= 2) {
            acc.removeLast()
            val demoted = taken.remove(taken.length - 1)
            up += ((pf.alloc(acc.build(0x05, demoted._1)), demoted._2))
          } else {
            val (rmChild, rmKey) = level(i)
            i += 1
            up += ((pf.alloc(acc.build(0x05, rmChild)), rmKey))
          }
        }
        level = up.toIndexedSeq
      }
      level.head._1
    }
  }

  // ---- bottom-up index b-tree ---------------------------------------------------

  /** Streaming bulk loader for an index b-tree: key records must arrive in
    * index order. Interior pages hold each promoted key exactly once (the
    * SQLite index layout); memory is O(leaves) promoted keys.
    */
  final class IndexBtreeWriter(pf: PageFile) {
    private val leaf = new PageAccum(interior = false)
    private val level0 = new ArrayBuffer[(Int, Array[Byte])]()

    def add(keyRecord: Array[Byte]): Unit = {
      val cell = indexCell(pf, keyRecord, leftChild = 0)
      if (!leaf.fits(cell) && !leaf.isEmpty) {
        // leaf is full: flush it and promote THIS key to the interior
        // level; the next key starts the new leaf
        val pno = pf.alloc(leaf.build(0x0a))
        leaf.reset()
        level0 += ((pno, keyRecord))
      } else {
        require(leaf.fits(cell), "index cell exceeds page capacity")
        leaf.add(cell)
      }
    }

    def finish(): Int = {
      var rightMost = pf.alloc(leaf.build(0x0a))
      if (level0.isEmpty) return rightMost
      var entries: IndexedSeq[(Int, Array[Byte])] = level0.toIndexedSeq
      while (true) {
        val up = new ArrayBuffer[(Int, Array[Byte])]()
        val acc = new PageAccum(interior = true)
        var i = 0
        while (i < entries.length) {
          val (child, key) = entries(i)
          val cell = indexCell(pf, key, leftChild = child)
          if (!acc.fits(cell) && !acc.isEmpty) {
            // `child` becomes this page's right-most; `key` promotes up
            val pno = pf.alloc(acc.build(0x02, child))
            acc.reset()
            up += ((pno, key))
          } else {
            require(acc.fits(cell), "interior index cell exceeds page")
            acc.add(cell)
          }
          i += 1
        }
        val pno = pf.alloc(acc.build(0x02, rightMost))
        if (up.isEmpty) return pno
        entries = up.toIndexedSeq
        rightMost = pno
      }
      0 // unreachable
    }
  }

  // ---- database assembly -----------------------------------------------------------

  /** Write page 1: the 100-byte header + the sqlite_master table leaf.
    * `master` rows: (type, name, tbl_name, rootpage, sql).
    */
  def finalizeDb(pf: PageFile,
      master: Seq[(String, String, String, Int, String)]): Unit = {
    val acc = new PageAccum(interior = false, page1 = true)
    master.zipWithIndex.foreach { case ((typ, name, tbl, root, sql), i) =>
      val rec = record(Seq(SqlText(typ), SqlText(name), SqlText(tbl),
        SqlInt(root.toLong), SqlText(sql)))
      val cell = tableLeafCell(pf, i + 1L, rec)
      require(acc.fits(cell), "sqlite_master page overflow")
      acc.add(cell)
    }
    val page1 = acc.build(0x0d)
    // 16-byte magic: "SQLite format 3" + NUL (byte 15 is already zero)
    val magic = "SQLite format 3".getBytes("ISO-8859-1")
    System.arraycopy(magic, 0, page1, 0, 15)
    page1(16) = ((PageSize >> 8) & 0xff).toByte
    page1(17) = (PageSize & 0xff).toByte
    page1(18) = 1 // write version: legacy (no WAL)
    page1(19) = 1 // read version
    page1(21) = 64; page1(22) = 32; page1(23) = 32
    def putInt(at: Int, v: Int): Unit = {
      page1(at) = ((v >> 24) & 0xff).toByte
      page1(at + 1) = ((v >> 16) & 0xff).toByte
      page1(at + 2) = ((v >> 8) & 0xff).toByte
      page1(at + 3) = (v & 0xff).toByte
    }
    putInt(24, 1) // change counter
    putInt(28, pf.nPages)
    putInt(40, 1) // schema cookie
    putInt(44, 1) // schema format 1 (no descending indexes, no serial 8/9)
    putInt(56, 1) // UTF-8
    putInt(92, 1) // version-valid-for = change counter
    putInt(96, 3040001) // library version stamp
    pf.writePage1(page1)
  }
}
