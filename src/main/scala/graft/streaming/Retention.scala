package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.LogOps

/** Retention sweep (SURVEY.md §2.1 O10–O13): the mutating counterpart of
  * [[LogOps.retentionSurvivors]].
  *
  * The reference DELETEs in place per container
  * (`DELETE FROM logs WHERE ts < ?1 OR ROWID < ?2`, logsqlite
  * `src/cleaner.rs:82-129`) on a periodic sweep (`src/cleaner.rs:134-158`).
  * Parquet is immutable, so deletion = rewrite-and-swap at partition
  * granularity: survivors are written to a shadow directory, then moved
  * over the live partition with an atomic directory rename. Readers see
  * either the old or the new snapshot, never a partial one.
  *
  * Scale notes: with the table partitioned by container_id (+ ingest date
  * at 100 TB), an age-only policy never rewrites anything — it DROPS whole
  * date subpartitions past the cutoff and only rewrites the single boundary
  * date; the max-lines policy rewrites only the oldest partitions beyond
  * the kept count. The fixture-scale implementation below rewrites each
  * container partition it touches, which is the boundary-partition case of
  * that plan.
  */
object Retention {

  /** One sweep over the per-container partitions of `tableDir`. Returns the
    * number of container partitions rewritten.
    */
  def sweep(
      spark: SparkSession,
      tableDir: String,
      ageCutoff: Option[java.time.Instant],
      maxLines: Option[Long]): Int = {
    if (ageCutoff.isEmpty && maxLines.isEmpty) return 0
    val root = Paths.get(tableDir)
    if (!Files.isDirectory(root)) return 0
    val parts = Files.list(root).iterator()
    var rewritten = 0
    while (parts.hasNext) {
      val p: Path = parts.next()
      val name = p.getFileName.toString
      if (name.startsWith("container_id=")) {
        val live = LogIngest.table(spark, tableDir)
          .where(col("container_id") === name.stripPrefix("container_id="))
        val survivors = LogOps.retentionSurvivors(
          live, "container_id", "seq", "ts_nano", ageCutoff, maxLines)
        val before = live.count()
        val after = survivors.count()
        if (after < before) {
          val shadow = root.resolveSibling(root.getFileName.toString + s".rewrite-$name")
          survivors.drop("container_id")
            .sortWithinPartitions(col("ts_nano"))
            .write.mode("overwrite").parquet(shadow.toString)
          swapPartition(spark, tableDir, p, shadow)
          rewritten += 1
        }
      }
    }
    rewritten
  }

  /** Small-file compaction: the 100 ms micro-batch cadence produces one
    * file per container per burst; compaction bin-packs each container
    * partition back to ~`targetBytes` files with rows re-sorted on ts_nano
    * (restoring tight row-group stats), using the same atomic
    * rewrite-and-swap as retention. Returns partitions compacted.
    */
  def compact(spark: SparkSession, tableDir: String, targetBytes: Long = 128L << 20): Int = {
    val root = Paths.get(tableDir)
    if (!Files.isDirectory(root)) return 0
    val parts = Files.list(root).iterator()
    var compacted = 0
    while (parts.hasNext) {
      val p: Path = parts.next()
      val name = p.getFileName.toString
      if (name.startsWith("container_id=")) {
        val files = Files.list(p).iterator()
        var nFiles = 0
        var bytes = 0L
        while (files.hasNext) {
          val f = files.next()
          if (f.getFileName.toString.endsWith(".parquet")) {
            nFiles += 1; bytes += Files.size(f)
          }
        }
        val want = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        if (nFiles > want) {
          val live = LogIngest.table(spark, tableDir)
            .where(col("container_id") === name.stripPrefix("container_id="))
          val shadow = root.resolveSibling(root.getFileName.toString + s".compact-$name")
          live.drop("container_id")
            .repartitionByRange(want, col("ts_nano"))
            .sortWithinPartitions(col("ts_nano"))
            .write.mode("overwrite").parquet(shadow.toString)
          swapPartition(spark, tableDir, p, shadow)
          compacted += 1
        }
      }
    }
    compacted
  }

  /** Periodic sweep loop (reference default 600 s, `src/config.rs:180`) —
    * driver-side scheduling like the reference's cleaner task.
    */
  def run(
      spark: SparkSession,
      tableDir: String,
      ageCutoff: Option[java.time.Instant],
      maxLines: Option[Long],
      intervalMillis: Long,
      rounds: Int): Unit =
    (0 until rounds).foreach { _ =>
      sweep(spark, tableDir, ageCutoff, maxLines)
      Thread.sleep(intervalMillis)
    }

  /** Atomically replace a live partition directory with its rewritten
    * shadow: readers of the table root see old or new files, never a torn
    * partition. Also drops the _SUCCESS marker and invalidates Spark's
    * shared file-listing cache (it still holds the pre-swap leaf files).
    */
  private def swapPartition(
      spark: SparkSession, tableDir: String, live: Path, shadow: Path): Unit = {
    val tmp = live.resolveSibling(live.getFileName.toString + ".old")
    Files.move(live, tmp, StandardCopyOption.ATOMIC_MOVE)
    Files.move(shadow, live, StandardCopyOption.ATOMIC_MOVE)
    FsUtil.deleteRecursively(tmp)
    val marker = live.resolve("_SUCCESS")
    if (Files.exists(marker)) Files.delete(marker)
    org.apache.spark.sql.graft.ColumnBridge.invalidateFileListing(spark)
    spark.catalog.refreshByPath(tableDir)
  }
}
