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
    val cl = DedupOps.duplicateClusters(s, d, 0.2, 1000L)
    println("rows=" + cl.count())
    val raw = cl.queryExecution.analyzed // peel orderBy? easier: time both
    t("with_orderby") { cl }
    t("count_only") { cl.groupBy().count() }
    // the underlying cached frame without the presentation sort:
    t("sizes") { cl.groupBy(col("cluster_id")).agg(count(lit(1)).as("csize")) }
    println("numPartitions=" + cl.rdd.getNumPartitions)
    spark.stop()
  }
}
