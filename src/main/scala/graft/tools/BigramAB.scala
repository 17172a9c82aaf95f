package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B for the bigram-LM document scorer (`RetrievalOps.bigramLogProb`):
  *
  *  A: shipped plan — LM build and scoring pass EACH derive the bigram
  *     stream from the raw scan (recompute-over-materialize; zero
  *     corpus-order shuffle, LM broadcasts).
  *  B: single-explode plan — one groupBy(doc_id, w1, w2) count, LM
  *     derived from that table by a second rollup, scoring weights by
  *     count. Scans the corpus once but SHUFFLES the per-doc bigram
  *     table (cardinality ≈ corpus bigrams — pre-aggregation barely
  *     collapses it).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.BigramAB"
  */
object BigramAB {

  private def toks = split(col("text"), " ")

  def variantB(docs: DataFrame): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"), toks.as("t"))
      .select(col("doc_id"), explode(zip_with(col("t"),
        slice(concat(col("t"), array(lit(""))), lit(2), size(col("t"))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .where(col("w2") =!= "")
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
    val lm = perDoc
      .groupBy(col("w1"), col("w2"))
      .agg(sum(col("c")).as("n"))
      .withColumn("logp",
        log(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy(col("w1")))))
      .select(col("w1"), col("w2"), col("logp"))
    perDoc.join(broadcast(lm), Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        round(sum(col("c") * col("logp")) / sum(col("c")), 4).as("avg_logp"))
      .orderBy(col("doc_id"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    def time(tag: String)(df: => DataFrame): Unit = {
      df.count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-10s min=${ts.min}%.3f s  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("A-shipped")(graft.operators.RetrievalOps.bigramLogProbOf(docs))
    time("B-onepass")(variantB(docs))
    // equality check: same doc rows, same rounded means
    val a = graft.operators.RetrievalOps.bigramLogProbOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = variantB(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    println(s"equal=${a == b} (${a.size} rows)")
    spark.stop()
  }
}
