package graft.tools
import org.apache.spark.sql.SparkSession
/** Plan + single-query timing probe: runs one registered query under the
  * honest noop sink and prints its executed plan. */
object ProfileAB {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_rel_profile")
    val d = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, d)
    df.write.format("noop").mode("overwrite").save()
    println("=== FINAL ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
