package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: heavy-hitters batch plan — Space-Saving sketch (two token passes,
  * typed-UDAF update per token) vs exact vocabulary rollup (one pass,
  * codegen'd partial count, threshold on the counted table). Same output
  * contract either way (the sketch path already recounts exactly).
  */
object HeavyAB {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = 200
    def exact(): Long = {
      val toks = graft.Tables.documents(spark, d)
        .select(explode(graft.operators.TextOps.tokens(col("text"))).as("term"))
      val counted = toks.groupBy(col("term")).agg(count(lit(1)).as("count"))
      val n = counted.agg(sum(col("count"))).first.getLong(0)
      counted.where(col("count") * m > n)
        .orderBy(col("count").desc, col("term")).limit(20).count()
    }
    def sketch(): Long =
      graft.operators.TextOps.heavyTerms(spark, d, m, 20).count()
    // warmup then 2 timed runs each, interleaved
    exact(); sketch()
    for (i <- 1 to 2) {
      var t0 = System.nanoTime(); exact()
      println(f"[heavy-ab] run$i exact  ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime(); sketch()
      println(f"[heavy-ab] run$i sketch ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
