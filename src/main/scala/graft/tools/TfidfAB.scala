package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Stage timing for q_text_tfidf_pairs: where do the 2.2 s go —
  * the tf/df index build, or the postings pair join?
  */
object TfidfAB {
  def time(tag: String, runs: Int)(f: => Long): Unit = {
    var best = Long.MaxValue
    (0 until runs).foreach { _ =>
      val t0 = System.nanoTime()
      f
      best = math.min(best, System.nanoTime() - t0)
    }
    println(f"$tag%-28s ${best / 1e9}%.3f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d)

    def toks = split(col("text"), " ")
    val n = docs.agg(count(lit(1)).as("n_docs"))
    def tf = docs
      .select(col("doc_id"), size(toks).as("n_tok"), explode(toks).as("term"))
      .groupBy(col("doc_id"), col("n_tok"), xxhash64(col("term")).as("term_h"))
      .agg(count(lit(1)).as("cnt"))
    def df = tf.groupBy(col("term_h")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n)).where(col("df") * 10 <= col("n_docs"))
    def w = tf.join(df, Seq("term_h"))
      .select(col("doc_id"), col("term_h"),
        round((col("cnt").cast("double") / col("n_tok")) *
          log(col("n_docs").cast("double") / col("df")) * 1e6)
          .cast("long").as("wq"))

    time("explode only", 3) {
      docs.select(col("doc_id"), explode(toks).as("term")).count()
    }
    time("explode+hash", 3) {
      docs.select(col("doc_id"), explode(toks).as("term"))
        .select(xxhash64(col("term"))).count()
    }
    time("tf groupBy (no n_tok)", 3) {
      docs.select(col("doc_id"), explode(toks).as("term"))
        .groupBy(col("doc_id"), xxhash64(col("term")).as("term_h"))
        .agg(count(lit(1))).count()
    }
    time("tf only", 3) { tf.count() }
    def tf2 = {
      val cnts = docs
        .select(col("doc_id"), explode(toks).as("term"))
        .groupBy(col("doc_id"), xxhash64(col("term")).as("term_h"))
        .agg(count(lit(1)).as("cnt"))
      val ntok = docs.select(col("doc_id"), size(toks).as("n_tok"))
      cnts.join(ntok, Seq("doc_id"))
    }
    time("tf2 (join n_tok)", 3) { tf2.count() }
    time("tf+df+w (index)", 3) { w.count() }
    time("full query", 3) {
      graft.operators.RetrievalOps.tfidfSimilarPairs(spark, d).count()
    }
    // how big is the pair stage?
    val a = w.select(col("doc_id").as("a"), col("term_h"), col("wq").as("wa"))
    val b = w.select(col("doc_id").as("b"), col("term_h"), col("wq").as("wb"))
    println("w rows: " + w.count())
    println("pair rows: " + a.join(b, Seq("term_h")).where(col("a") < col("b")).count())
    spark.stop()
  }
}
