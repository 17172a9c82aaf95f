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
      println(f"$name%-20s min=${times.min}%6.2f")
    }
    import graft.Tables
    val up = Tables.lineitem(s, d)
      .select(col("l_returnflag"), explode(array(
        struct(lit("p").as("kind"), col("l_partkey").as("key")),
        struct(lit("s").as("kind"), col("l_suppkey").as("key")))).as("e"))
      .select(col("l_returnflag"), col("e.kind"), col("e.key"))
    def full(lgk: Int) = up.distinct().groupBy(col("l_returnflag"))
      .agg(sum(when(col("kind") === "p", 1L).otherwise(0L)).as("n_parts"),
           sum(when(col("kind") === "s", 1L).otherwise(0L)).as("n_supps"),
           expr(s"hll_sketch_estimate(hll_sketch_agg(CASE WHEN kind='p' THEN key END, $lgk))").as("pa"),
           expr(s"hll_sketch_estimate(hll_sketch_agg(CASE WHEN kind='s' THEN key END, $lgk))").as("sa"))
    t("sketch12") { full(12) }
    t("sketch14") { full(14) }
    full(14).orderBy("l_returnflag").show()
    spark.stop()
  }
}
