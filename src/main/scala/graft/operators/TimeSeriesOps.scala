package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream / time-series pack over `events` (SURVEY.md §2.3).
  *
  * The reference only orders by event time; these operators add the
  * windowed-aggregation surface a log-analytics engine needs. All are
  * single-shuffle partial-agg plans; the sessionization window partitions
  * on user_id (high cardinality → distributed sort).
  *
  * Timestamps: `events.ts` is nanosecond-precision in the files; Spark
  * reads it truncated to µs. Outputs expose epoch-milliseconds BIGINT so
  * results are precision-stable across engines.
  */
object TimeSeriesOps {

  private def tsMs(c: Column): Column = unix_millis(c)

  /** Tumbling 1-hour windows per event type: count + sum(value).
    * date_trunc keeps the expression inside whole-stage codegen; one
    * shuffle on (hour, type) after map-side partial aggregation.
    */
  def hourlyByType(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(
        date_trunc("hour", col("ts")).as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(tsMs(col("bucket")).as("bucket_ms"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("bucket_ms"), col("event_type"))

  /** Sliding windows: 2-hour windows advancing every hour. Each event maps
    * to exactly 2 buckets (window duration / slide) — Spark's `window()`
    * generates them without row explosion beyond that factor.
    */
  def slidingActivity(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(tsMs(col("w.start")).as("window_start_ms"), col("n"), col("sum_value"))
      .orderBy(col("window_start_ms"))

  /** Sessionization by inactivity gap (30 min) per user: classic
    * gaps-and-islands — lag to detect session starts, running sum to assign
    * session ids, then one aggregate per session. Two window passes over
    * the same (user_id → ts,event_id) sort order, so Spark reuses a single
    * shuffle+sort for both.
    */
  def sessions(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gapMs = 30L * 60 * 1000
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             (tsMs(col("ts")) - tsMs(col("prev_ts"))) > gapMs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(tsMs(col("ts"))).as("session_start_ms"),
        max(tsMs(col("ts"))).as("session_end_ms"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** JSON extraction from the `props` payload column (get_json_object is a
    * codegen'd built-in; no UDF). Aggregates the extracted field so the
    * query also exercises group-by over a derived column.
    */
  def propsKeyStats(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        round(avg(col("k")), 4).as("avg_k"))
      .orderBy(col("event_type"))

  /** Bucketized range join: for each error, how many events the same user
    * produced within ±5 minutes. A naive `|a.ts − b.ts| <= Δ` join is a
    * cross product per user; bucketizing both sides to Δ-sized time cells
    * and joining each error to its {cell−1, cell, cell+1} neighborhood
    * bounds candidate fanout to the rows actually within ~2Δ, then the
    * exact predicate filters — the standard distributed range-join shape
    * (Spark's own range-join hints implement the same idea).
    */
  def eventsNearErrors(s: SparkSession, d: String, deltaMin: Int = 5): DataFrame = {
    val deltaMs = deltaMin * 60L * 1000
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsMs(col("ts")).as("ms"))
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"),
        col("ms").as("err_ms"), (col("ms") / deltaMs).cast("long").as("cell"))
    val neighbors = errors.select(col("err_id"), col("user_id"), col("err_ms"),
      explode(array(col("cell") - 1, col("cell"), col("cell") + 1)).as("cell"))
    val others = ev
      .select(col("event_id"), col("user_id"), col("ms"),
        (col("ms") / deltaMs).cast("long").as("cell"))
    neighbors.join(others, Seq("user_id", "cell"))
      .where(abs(col("ms") - col("err_ms")) <= deltaMs && col("event_id") =!= col("err_id"))
      .groupBy(col("err_id"))
      .agg(count(lit(1)).as("n_nearby"), min(col("ms")).as("first_ms"), max(col("ms")).as("last_ms"))
      .orderBy(col("err_id"))
  }

  /** Pivot: per-user event counts reshaped into one column per event
    * type. Explicit value list → single-pass partial aggregation (without
    * it Spark first runs a distinct scan to discover columns).
    */
  def eventTypePivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .where(col("user_id") < 50)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** Raw JSON field extraction for a slice of events (row-level check). */
  def purchaseProps(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .where(col("event_type") === "purchase" && col("user_id") < 10)
      .select(
        col("event_id"),
        col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value"))
      .orderBy(col("event_id"))
}
