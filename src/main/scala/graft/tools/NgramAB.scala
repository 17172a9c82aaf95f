package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe: ngram Jaccard pair join under different AQE coalescing
  * configs — the pair stage's INPUT is ~4 MB but its OUTPUT is ~1.3M rows,
  * the shape AQE's input-byte heuristic under-parallelizes.
  * Usage: sbt "runMain graft.tools.NgramAB [sfDir] [reps]"
  */
object NgramAB {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count()
    val confs = Seq(
      "default-aqe" -> Seq("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m"),
      "advisory-1m" -> Seq("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1m"),
      "no-coalesce" -> Seq("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m"),
      "no-aqe" -> Seq("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m"))
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (r <- 0 until reps; (tag, kvs) <- confs) {
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      val t0 = System.nanoTime()
      graft.operators.DedupOps.ngramJaccardPairs(spark, d, 0.2, 1000L).count()
      times(tag) = ((System.nanoTime() - t0) / 1e9) :: times(tag)
    }
    confs.foreach { case (tag, _) =>
      val ts = times(tag).sorted
      println(f"$tag%-14s min=${ts.head}%6.3f med=${ts(ts.size / 2)}%6.3f")
    }
    spark.stop()
  }
}
