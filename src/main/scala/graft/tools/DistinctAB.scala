package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DistinctAB {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    def t(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-22s min=${times.min}%6.2f")
    }
    import graft.operators.DedupOps
    t("labels") { DedupOps.duplicateClusters(s, d, 0.2, 1000L) }
    t("pairs02") { DedupOps.ngramJaccardPairs(s, d, 0.2, 1000L) }
    t("transitivity") { DedupOps.clusterTransitivity(s, d, 0.2, 1000L) }
    spark.stop()
  }
}
