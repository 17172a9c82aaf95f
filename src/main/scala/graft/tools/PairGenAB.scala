package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DedupOps
import graft.functions.sketch._

/** Same-JVM A/B of the two ngram pair-generation plans (the host shows
  * multi-second noise windows, so cross-run comparisons are meaningless):
  * A = sh_h self-join (r1 formulation), B = cached posting lists +
  * sorted_id_pairs explode (current). Alternating warm runs, min+median.
  * Usage: sbt "runMain graft.tools.PairGenAB [sfDir] [n]"
  */
object PairGenAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // both sides share the cached capped index exactly as the operator does
    val capped = {
      // rebuilt here (not via operator internals) so A and B share one cache
      val exploded = DedupOps.shingles(spark, sfDir)
        .select(col("doc_id"), explode(col("shs")).as("sh"))
        .select(col("doc_id"), xxhash64(col("sh")).as("sh_h"))
      val kept = exploded.groupBy(col("sh_h")).agg(count(lit(1)).as("df"))
        .where(col("df") <= 1000).select(col("sh_h"))
      exploded.join(kept, Seq("sh_h"), "left_semi").persist()
    }
    val postings = capped.groupBy(col("sh_h"))
      .agg(collect_list(col("doc_id")).as("docs")).persist()
    val sizes = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))

    def finish(pairs: org.apache.spark.sql.DataFrame) = pairs
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6)
          .as("jaccard"))
      .where(col("jaccard") >= 0.2).orderBy(col("a"), col("b"))

    def qA = finish(
      capped.select(col("doc_id").as("a"), col("sh_h"))
        .join(capped.select(col("doc_id").as("b"), col("sh_h")), Seq("sh_h"))
        .where(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter")))
    def qB = finish(
      postings.select(explode(sortedIdPairs(col("docs"))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter")))

    qA.count(); qB.count() // warm both (materializes caches)
    val (ta, tb) = (Array.newBuilder[Double], Array.newBuilder[Double])
    (0 until n).foreach { _ =>
      val a0 = System.nanoTime(); qA.count(); ta += (System.nanoTime() - a0) / 1e9
      val b0 = System.nanoTime(); qB.count(); tb += (System.nanoTime() - b0) / 1e9
    }
    def stats(xs: Array[Double]) =
      f"min=${xs.min}%6.2f med=${xs.sorted.apply(xs.length / 2)}%6.2f"
    println(s"A self-join   ${stats(ta.result())}")
    println(s"B postings    ${stats(tb.result())}")
    spark.stop()
  }
}
