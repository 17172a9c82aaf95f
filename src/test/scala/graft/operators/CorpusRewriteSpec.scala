package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Invariant tests for the round-5b additions: block-level dedup rewrite,
  * incremental new-batch dedup, IVF+PQ composed probe, hard-negative
  * mining, and the embedding outlier audit. Exact values are covered by
  * the DuckDB oracles on the fixtures; these pin the semantics on
  * synthetic corpora and cross-check the vector ops against independent
  * driver-side math.
  */
class CorpusRewriteSpec extends SparkSpec {

  private def md5hex(t: String): String =
    MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def block(tag: String): String =
    (0 until 16).map(i => s"$tag$i").mkString(" ")

  test("blockDedupRewrite keeps exactly the canonical occurrence of each block") {
    import spark.implicits._
    // doc 0 = [A, B]; doc 1 = [B, C]; doc 2 = [A] → canonicals: A@0, B@0, C@1
    val docs = Seq(
      (0L, block("a") + " " + block("b")),
      (1L, block("b") + " " + block("c")),
      (2L, block("a"))).toDF("doc_id", "text")
    val got = DedupOps.blockDedupRewriteOf(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_blocks"), r.getAs[Long]("n_kept"),
         r.getAs[String]("kept_fp"))).toMap
    assert(got(0L)._1 === 2 && got(0L)._2 === 2L)
    assert(got(1L)._1 === 2 && got(1L)._2 === 1L)
    assert(got(2L)._1 === 1 && got(2L)._2 === 0L)
    // kept_fp is md5 of the kept blocks' fps concatenated in block order
    assert(got(0L)._3 === md5hex(md5hex(block("a")) + md5hex(block("b"))))
    assert(got(1L)._3 === md5hex(md5hex(block("c"))))
    assert(got(2L)._3 === md5hex("")) // all blocks dropped → empty stream
  }

  test("blockDedupRewrite: a duplicate-free corpus keeps everything") {
    import spark.implicits._
    val docs = (0L until 8L)
      .map(i => (i, block(s"u${i}_"))).toDF("doc_id", "text")
    val got = DedupOps.blockDedupRewriteOf(docs).collect()
    assert(got.length === 8)
    got.foreach { r =>
      assert(r.getAs[Long]("n_kept") === r.getAs[Int]("n_blocks").toLong)
      assert(r.getAs[Double]("kept_frac") === 1.0)
    }
  }

  test("incrementalDedup classifies batch docs against the corpus index") {
    import spark.implicits._
    val docs = Seq(
      // already-ingested corpus
      (0L, "old", "X"), (1L, "old", "Y"),
      // incoming batch
      (10L, "new", "X"), // dup_of_corpus
      (11L, "new", "Z"), // unique (first of Z)
      (12L, "new", "Z"), // dup_in_batch
      (13L, "new", "W")  // unique
    ).toDF("doc_id", "source", "text")
    val got = DedupOps.incrementalDedupOf(docs, "new").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got === Map(
      10L -> "dup_of_corpus", 11L -> "unique",
      12L -> "dup_in_batch", 13L -> "unique"))
  }

  test("incrementalDedup: corpus-dup wins over batch-dup when both apply") {
    import spark.implicits._
    val docs = Seq(
      (0L, "old", "X"),
      (10L, "new", "X"), (11L, "new", "X")).toDF("doc_id", "source", "text")
    val got = DedupOps.incrementalDedupOf(docs, "new").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(got === Map(10L -> "dup_of_corpus", 11L -> "dup_of_corpus"))
  }

  // ---- vector ops against independent driver-side math --------------------

  private lazy val vecs: Map[Long, (Array[Double], Int)] =
    Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2))).toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("hardNegatives: k different-label rows per anchor, top-1 is the true max") {
    val got = VectorOps.hardNegatives(spark, sf0001, nAnchors = 4, k = 5).collect()
    assert(got.length === 4 * 5)
    got.foreach { r =>
      assert(r.getAs[Int]("label") !== r.getAs[Int]("anchor_label"))
    }
    // rank-1 row per anchor equals the driver-side argmax over <> label
    (0L until 4L).foreach { a =>
      val (av, albl) = vecs(a)
      val expected = vecs.toSeq
        .filter { case (_, (_, l)) => l != albl }
        .map { case (id, (v, _)) =>
          (BigDecimal(cos(av, v)).setScale(6, BigDecimal.RoundingMode.HALF_UP), id)
        }
        .maxBy { case (sim, id) => (sim, -id) }
      val top = got.find(r => r.getAs[Long]("anchor_id") == a &&
        r.getAs[Int]("neg_rank") == 1).get
      assert(top.getAs[Long]("vec_id") === expected._2)
    }
  }

  test("labelOutliers: k rows per label, top outlier matches driver-side distance") {
    val got = VectorOps.labelOutliers(spark, sf0001, k = 3).collect()
    val labels = vecs.values.map(_._2).toSet
    assert(got.length === labels.size * 3)
    // recompute the rounded centroid + distances for one label
    val lbl = labels.min
    val members = vecs.filter(_._2._2 == lbl)
    val dim = members.head._2._1.length
    val cent = (0 until dim).map { i =>
      val m = members.values.map(_._1(i)).sum / members.size
      BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toArray
    val expectedTop = members.map { case (id, (v, _)) =>
      val d2 = (0 until dim).map(i => (v(i) - cent(i)) * (v(i) - cent(i))).sum
      (BigDecimal(math.sqrt(d2)).setScale(6, BigDecimal.RoundingMode.HALF_UP), id)
    }.maxBy { case (dist, id) => (dist, -id) }
    val top = got.find(r => r.getAs[Int]("label") == lbl &&
      r.getAs[Int]("outlier_rank") == 1).get
    assert(top.getAs[Long]("vec_id") === expectedTop._2)
  }

  test("ivfPqTopK: results share the query cell and rank by PQ distance") {
    val got = VectorOps.ivfPqTopK(spark, sf0001, queryId = 0L, k = 10).collect()
    assert(got.length === 10)
    val qCell = {
      val qv = vecs(0L)._1
      (0 until 4).foldLeft(0L)((c, i) => if (qv(i) > 0) c | (1L << i) else c)
    }
    got.foreach(r => assert(r.getAs[Long]("cell") === qCell))
    val dists = got.map(_.getAs[Int]("pq_dist")).toSeq
    assert(dists === dists.sorted)
    assert(!got.exists(_.getAs[Long]("vec_id") == 0L))
  }
}
