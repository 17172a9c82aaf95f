package graft.tools

import org.apache.spark.sql.SparkSession

/** Print formatted physical plans for selected queries (plan audit:
  * PushedFilters / ReadSchema / broadcast / WholeStageCodegen spans).
  * Usage: sbt "runMain graft.tools.Explain q_log_range q_rel_revenue_by_nation"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q_log_range")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
