package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Follow-up probe: explicit repartition(32, sh_h) on the pair-join inputs
  * (pins the pair stage's parallelism; AQE honors user repartitions) vs
  * the plain join under default AQE.
  */
object NgramAB2 {
  def pairJoin(capped: DataFrame, repart: Option[Int]): DataFrame = {
    val base = repart.map(n => capped.repartition(n, col("sh_h"))).getOrElse(capped)
    val sizes = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = base.select(col("doc_id").as("a"), col("sh_h"))
    val b = base.select(col("doc_id").as("b"), col("sh_h"))
    a.join(b, Seq("sh_h"))
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("na")), Seq("a"))
      .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
      .where(col("jaccard") >= 0.2)
      .orderBy(col("a"), col("b"))
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count()
    // build + persist the capped index once via the public operator
    graft.operators.DedupOps.ngramJaccardPairs(spark, d, 0.2, 1000L).count()
    val capped = {
      // same construction as DedupOps (index cache is private): explode + hash + df-cap
      val exploded = graft.operators.DedupOps.shingles(spark, d)
        .select(col("doc_id"), explode(col("shs")).as("sh"))
        .select(col("doc_id"), xxhash64(col("sh")).as("sh_h"))
      val kept = exploded.groupBy(col("sh_h")).agg(count(lit(1)).as("__df"))
        .where(col("__df") <= 1000L).select(col("sh_h"))
      exploded.join(kept, Seq("sh_h"), "left_semi").persist()
    }
    capped.count()
    val forms = Seq(
      "plain" -> (() => pairJoin(capped, None).count()),
      "repart32" -> (() => pairJoin(capped, Some(32)).count()))
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 0 until reps; (tag, f) <- forms) {
      val t0 = System.nanoTime(); f()
      times(tag) = ((System.nanoTime() - t0) / 1e9) :: times(tag)
    }
    forms.foreach { case (tag, _) =>
      val ts = times(tag).sorted
      println(f"$tag%-10s min=${ts.head}%6.3f med=${ts(ts.size / 2)}%6.3f max=${ts.last}%6.3f")
    }
    spark.stop()
  }
}
