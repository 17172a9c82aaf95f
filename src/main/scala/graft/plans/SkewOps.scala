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
}
