package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.sources.SqliteFormat._

/** One summary row per exported container database. Public top-level case
  * class: `Encoders.product` on a private nested class silently falls back
  * to interpreted serde (Janino can't reach the accessors).
  */
final case class SqliteExportSummary(
    container_id: String, n_rows: Long, ts_xor: Long,
    n_pages: Long, path: String)

/** Parquet log table → the reference's on-disk artifact: one SQLite
  * database per container, `logs (ts NUMBER, message BLOB)` with
  * `idx_ts ON logs(ts)` and ROWID = ingest order — byte-compatible with
  * what logsqlite writes (src/logger.rs:146-147, one db per container at
  * databases_dir/<container_id>, src/logger.rs:250-251). A reference
  * deployment can point its tooling (sqlite3, the docker log-driver's own
  * read path) at graft's export for drop-in compatibility testing.
  *
  * Distribution: one exporter TASK per container (repartition on the
  * container key, sort within partitions by (container, seq)), each
  * streaming its rows through [[SqliteFormat.TableBtreeWriter]] — table
  * pages are written as they fill, so task memory is O(tree depth), not
  * O(rows); only the ts-index entries (16 B/row) buffer for the in-task
  * sort. At 100 TB the per-container dbs are the SMALL artifacts (a
  * container's log history, not the corpus) — the parquet table remains
  * the analytical store; this is the egress face. Exports land on the
  * task's local filesystem under `outDir` (local mode: shared; on a
  * cluster, point outDir at a shared mount or fan the files up afterward).
  */
object SqliteLogExport {

  /** Write one container's db from rows already sorted by ingest order.
    * Returns (rows, xor of ts, pages).
    */
  def writeDb(path: String, rows: Iterator[(Long, Array[Byte])]): (Long, Long, Long) = {
    val pf = new PageFile(path)
    try {
      val tb = new TableBtreeWriter(pf)
      val idx = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var n = 0L
      var xor = 0L
      rows.foreach { case (ts, msg) =>
        n += 1
        xor ^= ts
        val m = if (msg == null) Array.emptyByteArray else msg
        tb.add(n, record(Seq(SqlInt(ts), SqlBlob(m))))
        idx += ((ts, n))
      }
      val tableRoot = tb.finish()
      val ib = new IndexBtreeWriter(pf)
      idx.sortInPlace()
      idx.foreach { case (ts, rowid) =>
        ib.add(record(Seq(SqlInt(ts), SqlInt(rowid))))
      }
      val indexRoot = ib.finish()
      finalizeDb(pf, Seq(
        ("table", "logs", "logs", tableRoot,
          "CREATE TABLE logs (ts NUMBER, message BLOB)"),
        ("index", "idx_ts", "logs", indexRoot,
          "CREATE INDEX idx_ts ON logs(ts)")))
      (n, xor, pf.nPages.toLong)
    } finally pf.close()
  }

  private def safeName(c: String): String =
    c.map(ch => if (ch.isLetterOrDigit || ch == '.' || ch == '-' || ch == '_') ch else '_')

  /** Export every container of `logs` to `outDir/<container_id>`; returns
    * the per-container summary (row count, xor-of-ts write receipt, pages,
    * path), which is what the oracle twin checks.
    */
  def export(
      logs: DataFrame,
      outDir: String,
      containerCol: String = "container_id",
      seqCol: String = "seq",
      tsCol: String = "ts_nano",
      msgCol: String = "message"): Dataset[SqliteExportSummary] = {
    val spark = logs.sparkSession
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    logs
      .select(col(containerCol).cast("string").as("c"),
        col(seqCol).cast("long").as("q"),
        col(tsCol).cast("long").as("t"),
        col(msgCol).cast("binary").as("m"))
      .repartition(col("c"))
      .sortWithinPartitions(col("c"), col("q"))
      .as[(String, Long, Long, Array[Byte])]
      .mapPartitions((it: Iterator[(String, Long, Long, Array[Byte])]) =>
        exportPartition(it, outDir))
  }

  private def exportPartition(
      it: Iterator[(String, Long, Long, Array[Byte])],
      outDir: String): Iterator[SqliteExportSummary] = {
    val in = it.buffered
    new Iterator[SqliteExportSummary] {
      override def hasNext: Boolean = in.hasNext
      override def next(): SqliteExportSummary = {
        val c = in.head._1
        val path = s"$outDir/${safeName(c)}"
        val rows: Iterator[(Long, Array[Byte])] =
          new Iterator[(Long, Array[Byte])] {
            override def hasNext: Boolean =
              in.hasNext && in.head._1 == c
            override def next(): (Long, Array[Byte]) = {
              val r = in.next()
              (r._3, r._4)
            }
          }
        val (n, xor, pages) = writeDb(path, rows)
        SqliteExportSummary(c, n, xor, pages, path)
      }
    }
  }
}
