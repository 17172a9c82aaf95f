package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities: co-located joins without a shuffle.
  *
  * Writing both sides of a recurring join bucketed (and sorted) on the
  * join key lets Spark plan a SortMergeJoin with NO Exchange on either
  * side — the per-bucket files are already hash-distributed and sorted.
  * This is the storage-level answer to "this join shuffles 100 TB every
  * run": pay the shuffle once at write time, never at read time.
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. With equal bucket
    * counts the physical plan contains no ShuffleExchange (verify with
    * hasShuffle below).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** True if the physical plan contains any shuffle exchange. Descends
    * into AQE's wrapper (its inner plan is not part of the outer tree).
    */
  def hasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def scan(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => scan(a.inputPlan)
      case _: ShuffleExchangeLike => true
      case other => other.children.exists(scan)
    }
    scan(df.queryExecution.executedPlan)
  }
}
