package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B probe: gaps-and-islands sessionization (two window passes) vs the
  * native session_window aggregation, interleaved min-of-N in one JVM.
  * Usage: sbt "runMain graft.tools.SessionsAB [sfDir] [reps]"
  */
object SessionsAB {
  def lagForm(s: SparkSession, d: String): DataFrame = {
    def tsMs(c: org.apache.spark.sql.Column) = unix_millis(c)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gapMs = 30L * 60 * 1000
    graft.Tables.events(s, d)
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

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count()
    val forms = Seq(
      "lag+runsum" -> (() => lagForm(spark, d).count()),
      "session_window" -> (() => graft.operators.TimeSeriesOps.sessions(spark, d).count()))
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 0 until reps; (n, f) <- forms) {
      val t0 = System.nanoTime(); f()
      times(n) = ((System.nanoTime() - t0) / 1e9) :: times(n)
    }
    forms.foreach { case (n, _) =>
      val ts = times(n).sorted
      println(f"$n%-16s min=${ts.head}%6.3f med=${ts(ts.size / 2)}%6.3f")
    }
    spark.stop()
  }
}
