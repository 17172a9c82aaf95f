package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Scratch bisection of the dedup pipeline cost. */
object ProfDedup {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("warmup")(graft.Tables.documents(spark, d).count())
    time("shingles")(DedupOps.shingles(spark, d).count())
    val sh = DedupOps.shingles(spark, d)
      .select(col("doc_id"), size(col("shs")).as("n_sh"), explode(col("shs")).as("sh"))
    time("shingles_explode")(sh.count())
    val shC = sh.cache()
    time("shingles_cached")(shC.count())
    val a = shC.select(col("doc_id").as("a"), col("n_sh").as("na"), col("sh"))
    val b = shC.select(col("doc_id").as("b"), col("n_sh").as("nb"), col("sh"))
    time("join_on_cached") {
      a.join(b, Seq("sh")).where(col("a") < col("b"))
        .groupBy(col("a"), col("b"), col("na"), col("nb"))
        .agg(count(lit(1)).as("inter")).count()
    }
    shC.unpersist()
    time("full_ngram")(DedupOps.ngramJaccardPairs(spark, d, 0.2).count())
    time("minhash_sig")(DedupOps.minhashSignatures(spark, d, 32).count())
    time("simhash_sig") {
      graft.Tables.documents(spark, d)
        .select(graft.functions.sketch.simhash64(split(col("text"), " ")).as("sh")).count()
    }
    spark.stop()
  }
}
