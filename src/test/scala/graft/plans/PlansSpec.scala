package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical-plan-level utilities: salting equivalence and shuffle-free
  * bucketed joins.
  */
class PlansSpec extends SparkSpec {

  test("saltedEquiJoin equals the plain join on a skewed key") {
    import spark.implicits._
    // 90% of big rows hit key 1 — the classic hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i % 5 else 1L, i.toLong))
      .toDF("k", "id")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("k", "v")
    val plain = big.join(small, Seq("k")).select("k", "id", "v")
      .collect().map(_.toSeq).toSet
    val salted = SkewOps.saltedEquiJoin(big, small, "k", "id", buckets = 8)
      .select("k", "id", "v").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.size === 2000)
  }

  test("bucketed join plans without a shuffle exchange") {
    import spark.implicits._  // warehouse dir: temp, set at session build
    val orders = (1 to 500).map(i => (i.toLong % 50, i.toLong, i * 1.5))
      .toDF("custkey", "orderkey", "price")
    val cust = (0 until 50).map(i => (i.toLong, s"cust$i")).toDF("custkey", "name")
    Bucketing.writeBucketed(orders, "b_orders", "custkey", 8)
    Bucketing.writeBucketed(cust, "b_cust", "custkey", 8)
    try {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_cust", "custkey")
      assert(!Bucketing.hasShuffle(joined),
        s"expected no shuffle:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() === 500)
      // sanity: the same join over unbucketed parquet DOES shuffle
      val plainDir = Files.createTempDirectory("graft-plain").toString
      // multiple input files → multi-partition scan → the merge join
      // must hash-repartition (single-partition inputs satisfy any
      // clustering trivially and would hide the exchange)
      orders.repartition(4).write.mode("overwrite").parquet(plainDir)
      val right = cust.repartition(4)
      val plainJoin = spark.read.parquet(plainDir)
        .join(right.hint("merge"), Seq("custkey"))
      assert(Bucketing.hasShuffle(plainJoin))
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }
}
