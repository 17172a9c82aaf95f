package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does qualityTiers' time go at scale: the scored-base pass (text →
  * quality metrics), the approxQuantile second pass, or the rank plumbing?
  */
object TiersAB {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[tiers-ab] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"),
        graft.operators.CurationOps.qualityCol.as("quality"),
        size(graft.operators.TextOps.tokens(col("text"))).as("n_tokens"))
    // warmup
    base.count(); graft.operators.TrainPrepOps.qualityTiers(spark, d).count()
    for (_ <- 1 to 2) {
      t("base-pass        ") { base.count() }
      t("approxQuantile   ") { base.stat.approxQuantile("quality",
        (1 until 32).map(_.toDouble / 32).toArray, 0.01) }
      t("full qualityTiers") { graft.operators.TrainPrepOps.qualityTiers(spark, d).count() }
    }
    spark.stop()
  }
}
