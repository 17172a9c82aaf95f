package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: does encoding the candidate pair (a, b) into ONE long
  * (a << 32 | b) before the pair-count shuffle beat the two-long groupBy
  * in `DedupOps.ngramJaccardPairs`? Hypothesis: the pair stage's 1.3 M
  * shuffle rows shrink from (8+8)-byte keys to 8-byte keys (~33% narrower
  * rows), and a single-long hash/compare is cheaper in the aggregate.
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.tools.PairEncodeAB
  */
object PairEncodeAB {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val idx = graft.operators.DedupOps.shingles(spark, d)
      .select(col("doc_id"), explode(col("shs")).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("sh_h"))
      .persist()
    idx.count()
    val sizes = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = idx.select(col("doc_id").as("a"), col("sh_h"))
    val b = idx.select(col("doc_id").as("b"), col("sh_h"))

    def variantTwoLong() =
      a.join(b, Seq("sh_h")).where(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("na")), Seq("a"))
        .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("nb")), Seq("b"))
        .where(col("inter") / (col("na") + col("nb") - col("inter")) >= 0.2)

    def variantOneLong() =
      a.join(b, Seq("sh_h")).where(col("a") < col("b"))
        .select((shiftleft(col("a"), 32).bitwiseOR(col("b"))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("inter"))
        .select(shiftright(col("pair"), 32).as("a"),
          col("pair").bitwiseAND(lit(0xFFFFFFFFL)).as("b"), col("inter"))
        .join(sizes.select(col("doc_id").as("a"), col("n_sh").as("na")), Seq("a"))
        .join(sizes.select(col("doc_id").as("b"), col("n_sh").as("nb")), Seq("b"))
        .where(col("inter") / (col("na") + col("nb") - col("inter")) >= 0.2)

    def time(f: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      var best = Double.MaxValue
      var n = 0L
      for (_ <- 0 until 3) {
        val t0 = System.nanoTime()
        n = f().count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, n)
    }
    // warm both once
    variantTwoLong().count(); variantOneLong().count()
    val (t2, n2) = time(variantTwoLong _)
    val (t1, n1) = time(variantOneLong _)
    println(f"""{"two_long_s":$t2%.3f,"one_long_s":$t1%.3f,"rows_two":$n2,"rows_one":$n1}""")
    spark.stop()
  }
}
