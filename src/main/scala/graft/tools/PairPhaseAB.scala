package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.sketch.wordShingles

/** Phase timing of the shingle-pair stage at scale: where do the ~218 s of
  * cold ngramJaccardPairs go at sf1 — shingling, df-cap, the sh_h
  * self-join, or the packed-pair aggregate?
  */
object PairPhaseAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val exploded = graft.Tables.documents(spark, d)
      .select(col("doc_id"), wordShingles(split(col("text"), " "), 3).as("shs"))
      .where(size(col("shs")) > 0)
      .select(col("doc_id"), explode(col("shs")).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("sh_h"))
      .persist()
    timed("index build+persist")(println("  index rows: " + exploded.count()))

    val kept = exploded.groupBy(col("sh_h"))
      .agg(count(lit(1)).as("__df")).where(col("__df") <= 1000L)
      .select(col("sh_h"))
    val capped = exploded.join(kept, Seq("sh_h"), "left_semi").persist()
    timed("df-cap semi-join+persist")(println("  capped rows: " + capped.count()))

    val a = capped.select(col("doc_id").as("a"), col("sh_h"))
    val b = capped.select(col("doc_id").as("b"), col("sh_h"))
    val cand = a.join(b, Seq("sh_h")).where(col("a") < col("b"))
      .select(shiftleft(col("a"), 32).bitwiseOR(col("b")).as("pair"))
    timed("candidate join (count only)")(println("  candidates: " + cand.count()))

    val agg = cand.groupBy(col("pair")).agg(count(lit(1)).as("inter"))
    timed("pair aggregate")(println("  distinct pairs: " + agg.count()))

    spark.stop()
  }
}
