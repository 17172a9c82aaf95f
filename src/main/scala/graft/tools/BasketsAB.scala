package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage timing for q_ts_baskets: how much of the 1.3 s is the session
  * assignment pass, and does the long-key sid help?
  */
object BasketsAB {
  def time(tag: String)(f: => Long): Unit = {
    var best = Long.MaxValue
    (0 until 3).foreach { _ =>
      val t0 = System.nanoTime()
      f
      best = math.min(best, System.nanoTime() - t0)
    }
    println(f"$tag%-34s ${best / 1e9}%.3f s")
  }

  def sessionsOf(events: DataFrame, longSid: Boolean): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val gapMs = 30 * 60000L
    val base = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
      .withColumn("new_session",
        when(col("ms") - lag(col("ms"), 1).over(w) > gapMs, 1L)
          .otherwise(when(lag(col("ms"), 1).over(w).isNull, 1L).otherwise(0L)))
      .withColumn("session_no", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sid =
      if (longSid) (col("user_id") * 1000000L + col("session_no")).as("sid")
      else concat_ws("#", col("user_id"), col("session_no")).as("sid")
    base.select(sid, col("event_type")).distinct()
  }

  def full(sessions: DataFrame): DataFrame = {
    val total = broadcast(sessions.select(col("sid")).distinct()
      .agg(count(lit(1)).as("n_sessions")))
    val typeCounts = broadcast(sessions
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_type")))
    val a = sessions.select(col("sid"), col("event_type").as("ta"))
    val b = sessions.select(col("sid"), col("event_type").as("tb"))
    a.join(b, Seq("sid"))
      .where(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("n_both"))
      .join(typeCounts.select(col("event_type").as("ta"), col("n_type").as("n_a")), Seq("ta"))
      .join(typeCounts.select(col("event_type").as("tb"), col("n_type").as("n_b")), Seq("tb"))
      .crossJoin(total)
      .select(col("ta"), col("tb"), col("n_both"), col("n_sessions"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ev = Tables.events(spark, d)
    time("sessions pass (string sid)") { sessionsOf(ev, longSid = false).count() }
    time("sessions pass (long sid)") { sessionsOf(ev, longSid = true).count() }
    time("full (string sid)") { full(sessionsOf(ev, longSid = false)).count() }
    time("full (long sid)") { full(sessionsOf(ev, longSid = true)).count() }
    spark.stop()
  }
}
