package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** A/B probe for the Q21 shape (sole-late suppliers): pre-rollup-then-
  * join-orders vs join-orders-then-rollup, plus the executed-plan node
  * census. Run: `sbt "runMain graft.tools.Q21AB <sfDir>"`.
  */
object Q21AB {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("q21ab").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[q21ab] $tag run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val df = graft.operators.RelationalOps.soleLateSuppliers(spark, d)
    time("current")(df.count())
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    for (k <- Seq("Scan parquet", "Exchange hashpartitioning", "ReusedExchange",
        "HashAggregate", "SortMergeJoin", "BroadcastHashJoin", "Sort "))
      println(s"[q21ab] plan $k = ${k.r.findAllIn(p).size}")

    // B variant: verdict via a window over the pair table instead of the
    // second rollup + join-back (one pass over pairs, no self-join)
    val pair = Tables.lineitem(spark, d)
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("max_ship"))
      .join(Tables.orders(spark, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("max_ship") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .cast("int").as("was_late"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
    val b = pair
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum(col("was_late")).over(w))
      .where(col("n_supp") >= 2 && col("n_late") === 1 && col("was_late") === 1)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n_waiting_orders"))
      .join(broadcast(Tables.supplier(spark, d)
          .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .orderBy(col("n_waiting_orders").desc, col("s_suppkey")).limit(10)
    time("window-verdict")(b.count())
    spark.stop()
  }
}
