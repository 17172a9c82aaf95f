package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Decomposition harness for the PRF retrieval chain (kept with measured
  * numbers, the BigramAB convention). */
object PrfAB {
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
    import graft.Tables
    val docs = Tables.documents(s, d).select(col("doc_id"), split(col("text"), " ").as("t"))
    t("split_scan") { docs }
    t("split_scan_size") { docs.select(sum(size(col("t"))).as("n")) }
    t("bm25") { graft.operators.RetrievalOps.bm25TopK(s, d, k = 3) }
    t("prf_full") { graft.operators.RetrievalOps.prfTopK(s, d) }
    spark.stop()
  }
}
