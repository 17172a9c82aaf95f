package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Scale notes (100 TB design stance):
  *  - Reads go through `spark.read.parquet` so the vectorized columnar
  *    reader, predicate pushdown, and column pruning apply. Every operator
  *    in this library is written so its filters/projections reach the scan
  *    (verify with `.explain("formatted")` → `PushedFilters` / `ReadSchema`).
  *  - At cluster scale the log table would be laid out as
  *    `.../logs/container_id=<id>/date=<yyyy-mm-dd>/part-*.parquet`, sorted
  *    within files on `ts_nano` so row-group min/max stats replace the
  *    reference's SQLite `idx_ts` index (logsqlite `src/logger.rs:147`).
  *    The flat per-table files here are the driver fixture layout.
  */
object Tables {
  // Memoized per (session, path): re-resolving the same parquet relation
  // re-lists files and re-reads footers on every query — a real per-query
  // tax in a 40-query run and the session-catalog behavior users expect.
  // (Only the resolved relation is cached, never data.)
  private val cache = new SessionCache[DataFrame]

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which Spark 4 refuses by
    // default; read it as raw Long nanos (set per-session, idempotent).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cache.getOrElseUpdate(spark, s"$sfDir/$name.parquet")((s, p) => s.read.parquet(p))
  }

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** The log-table analog. `ts` in the file is int64 NANOSECONDS (read as
    * Long via nanosAsLong); expose both the authoritative `ts_nano` and a
    * µs-truncated TimestampType `ts` (SURVEY.md §1.3 dual-column design —
    * order/filter on the exact value, SQL ergonomics on the timestamp).
    * Integer `div` (not `/`): ns epoch values exceed double's 2^53.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    apply(s, d, "events")
      .withColumn("ts_nano", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
