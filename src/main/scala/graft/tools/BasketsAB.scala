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

  private val SEP = ""

  /** Single-pass variant: baskets as sorted type-sets, then ONE explode
    * emits a session marker (""), each single type, and each ordered pair
    * ("a␁b"); ONE groupBy counts them all. The sessionization window runs
    * once in one plan instead of feeding four consumers.
    */
  def emitCounts(sessions: DataFrame): DataFrame = {
    val ts = col("ts")
    sessions.groupBy(col("sid"))
      .agg(sort_array(collect_set(col("event_type"))).as("ts"))
      .select(explode(concat(
        array(lit("")),
        ts,
        flatten(transform(ts, (t, i) =>
          transform(slice(ts, i + 2, size(ts)), u => concat_ws(SEP, t, u))))))
        .as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
  }

  def emitJoins(sessions: DataFrame): DataFrame = {
    val em = emitCounts(sessions)
    val total = broadcast(em.where(col("key") === "")
      .select(col("n").as("n_sessions")))
    val types = em.where(col("key") =!= "" && !col("key").contains(SEP))
    val pairs = em.where(col("key").contains(SEP))
      .select(split(col("key"), SEP).getItem(0).as("ta"),
        split(col("key"), SEP).getItem(1).as("tb"), col("n").as("n_both"))
    pairs
      .join(broadcast(types.select(col("key").as("ta"), col("n").as("n_a"))), Seq("ta"))
      .join(broadcast(types.select(col("key").as("tb"), col("n").as("n_b"))), Seq("tb"))
      .crossJoin(total)
      .select(col("ta"), col("tb"), col("n_both"), col("n_sessions"))
  }

  def emitDriver(sessions: DataFrame): DataFrame = {
    val spark = sessions.sparkSession
    import spark.implicits._
    val rows = emitCounts(sessions).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val nSessions = rows.find(_._1 == "").map(_._2).getOrElse(0L)
    val nType = rows.filter(r => r._1.nonEmpty && !r._1.contains(SEP)).toMap
    rows.filter(_._1.contains(SEP)).toSeq.sortBy(_._1)
      .map { case (k, nBoth) =>
        val Array(ta, tb) = k.split(SEP)
        (ta, tb, nBoth, nSessions, nType(ta), nType(tb))
      }
      .toDF("ta", "tb", "n_both", "n_sessions", "n_a", "n_b")
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
    time("emit-once + tiny joins") { emitJoins(sessionsOf(ev, longSid = true)).count() }
    time("emit-once + driver assembly") { emitDriver(sessionsOf(ev, longSid = true)).count() }
    // native session_window: one aggregation, no explicit sort-window pass
    def swBaskets() = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(sort_array(collect_set(col("event_type"))).as("ts"))
    time("session_window baskets only") { swBaskets().count() }
    time("session_window + emit + driver") {
      val ts = col("ts")
      val em = swBaskets()
        .select(explode(concat(
          array(lit("")),
          ts,
          flatten(transform(ts, (t, i) =>
            transform(slice(ts, i + 2, size(ts)), u => concat_ws(SEP, t, u))))))
          .as("key"))
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
      em.collect().length.toLong
    }
    time("session_window + emit + joins") {
      val ts = col("ts")
      val em = swBaskets()
        .select(explode(concat(
          array(lit("")),
          ts,
          flatten(transform(ts, (t, i) =>
            transform(slice(ts, i + 2, size(ts)), u => concat_ws(SEP, t, u))))))
          .as("key"))
        .groupBy(col("key")).agg(count(lit(1)).as("n"))
      val total = broadcast(em.where(col("key") === "")
        .select(col("n").as("n_sessions")))
      val types = em.where(col("key") =!= "" && !col("key").contains(SEP))
      val pairs = em.where(col("key").contains(SEP))
        .select(split(col("key"), SEP).getItem(0).as("ta"),
          split(col("key"), SEP).getItem(1).as("tb"), col("n").as("n_both"))
      pairs
        .join(broadcast(types.select(col("key").as("ta"), col("n").as("n_a"))), Seq("ta"))
        .join(broadcast(types.select(col("key").as("tb"), col("n").as("n_b"))), Seq("tb"))
        .crossJoin(total).count()
    }
    spark.stop()
  }
}
