package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round timing of the connected-components loop at scale — is the
  * sf1 blowup round count (deep components) or per-round cost?
  */
object ClustersAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val t0 = System.nanoTime()
    val pairs = graft.operators.DedupOps.ngramJaccardPairs(spark, d, 0.2, 1000L)
      .select(col("a"), col("b"))
    val edges = pairs
      .select(explode(array(
        struct(col("a").as("x"), col("b").as("y")),
        struct(col("b").as("x"), col("a").as("y")))).as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"))
      .persist()
    println(f"edges: ${edges.count()}%d  (${(System.nanoTime()-t0)/1e9}%.1f s)")
    var labels = edges.groupBy(col("x")).agg(min(col("y")).as("m"))
      .select(col("x"), least(col("x"), col("m")).as("lbl")).persist()
    labels.count()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < 25) {
      val tIt = System.nanoTime()
      val nbrMin = edges
        .join(labels.select(col("x").as("y"), col("lbl").as("ylbl")), Seq("y"))
        .groupBy(col("x")).agg(min(col("ylbl")).as("m"))
      val next = labels.join(nbrMin, Seq("x"))
        .select(col("x"), least(col("lbl"), col("m")).as("lbl"),
          (col("m") < col("lbl")).as("improved")).persist()
      changed = next.where(col("improved")).count()
      labels.unpersist()
      labels = next.select(col("x"), col("lbl")).persist()
      it += 1
      println(f"round $it%2d: changed=$changed%8d  ${(System.nanoTime()-tIt)/1e9}%.2f s")
    }
    spark.stop()
  }
}
