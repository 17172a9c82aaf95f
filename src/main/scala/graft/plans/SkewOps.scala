package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join handling splits oversized SHUFFLE partitions, which
  * covers most cases; explicit salting remains necessary when a single
  * join KEY is hot (AQE cannot split one key's hash bucket across tasks
  * for a join that must co-locate the key). The classic remedy: replicate
  * the small side `buckets`× and scatter the big side's hot keys across
  * the replicas.
  */
object SkewOps {

  /** Equi-join `big ⋈ small` on `key`, salted into `buckets` sub-keys.
    *
    * The big side gets a deterministic salt from `saltSource` (any column;
    * a unique id gives uniform spread), the small side is exploded
    * `buckets`× — acceptable when |small| × buckets stays broadcast-sized.
    * Result equals the plain inner join exactly; only the physical key
    * distribution changes.
    */
  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltSource: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(buckets.toLong)).cast("int"))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Join-key skew audit: the diagnostic that tells you WHEN to reach for
    * [[saltedEquiJoin]] or AQE skew thresholds. For a key column, the top
    * `k` heaviest keys with their share of total rows and skew factor
    * (count ÷ mean count per key) — run it on a join's key before sizing
    * salt buckets.
    *
    * Plan: one partial-agg rollup on the key; the global (total, n_keys)
    * reduce off that rollup to a 1-row broadcast; top-k via
    * TakeOrderedAndProject. Nothing but the k result rows leaves the
    * cluster.
    */
  def keySkewAudit(df: DataFrame, keyName: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyName)).agg(count(lit(1)).as("cnt"))
    val stats = broadcast(counts.agg(
      sum(col("cnt")).as("total_rows"),
      count(lit(1)).as("n_keys")))
    counts.crossJoin(stats)
      .select(
        col(keyName), col("cnt"),
        round(col("cnt").cast("double") / col("total_rows"), 6).as("share"),
        round(col("cnt").cast("double") * col("n_keys") / col("total_rows"), 4)
          .as("skew_factor"),
        col("total_rows"), col("n_keys"))
      .orderBy(col("cnt").desc, col(keyName).asc)
      .limit(k)
  }
}
