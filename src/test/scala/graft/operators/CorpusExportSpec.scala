package graft.operators

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Training-shard export: layout (one file per shard), manifest
  * reconciliation, roundtrip fidelity, and in-place re-export.
  */
class CorpusExportSpec extends SparkSpec {

  test("writeShards: one file per shard, manifest reconciles, re-export swaps") {
    val out = Files.createTempDirectory("graft-shards").toString + "/corpus"
    val manifest = TrainPrepOps.writeShards(spark, sf0001, out, targetTokens = 2000L)
      .collect()
    assert(manifest.nonEmpty)

    // layout: every manifest shard is a dir with exactly one parquet file
    manifest.foreach { r =>
      val dir = Paths.get(out, s"source=${r.getAs[String]("source")}",
        s"shard=${r.getAs[Int]("shard")}")
      assert(Files.isDirectory(dir), s"missing shard dir $dir")
      val files = Files.list(dir).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
      assert(files.size === 1, s"expected 1 file in $dir, got ${files.size}")
    }

    // roundtrip: the read-back table is the corpus (underscore manifest
    // dir must be invisible to the table reader)
    val back = spark.read.parquet(out)
    val docs = Tables.documents(spark, sf0001)
    assert(back.count() === docs.count())
    assert(back.select("doc_id").collect().map(_.getLong(0)).toSet ===
      docs.select("doc_id").collect().map(_.getLong(0)).toSet)

    // manifest reconciles with what's actually on disk, fingerprints included
    val fromDisk = back.groupBy(col("source"), col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        md5(concat_ws(",",
          transform(array_sort(collect_list(col("doc_id"))),
            x => x.cast("string")))).as("shard_fp"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("shard")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"), r.getAs[String]("shard_fp"))))
      .toMap
    manifest.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[Int]("shard"))
      assert(fromDisk(k) === ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[String]("shard_fp"))), s"manifest mismatch for $k")
    }

    // every shard except possibly a source's last must reach the target
    // (holds whenever docs are smaller than the target, as in the fixture;
    // an over-target doc legitimately leaves a following short shard)
    val lastPerSource = manifest.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Int]("shard")).max).toMap
    manifest.foreach { r =>
      if (r.getAs[Int]("shard") != lastPerSource(r.getAs[String]("source")))
        assert(r.getAs[Long]("n_tokens") >= 2000L,
          s"non-final shard under target: $r")
    }

    // re-export swaps in place: same layout, no staging residue
    TrainPrepOps.writeShards(spark, sf0001, out, targetTokens = 2000L)
    assert(spark.read.parquet(out).count() === docs.count())
    assert(!Files.exists(Paths.get(out + ".staging")))
    assert(!Files.exists(Paths.get(out + ".old")))
  }

  test("dedup index roundtrip: verdicts run off the artifact with no corpus") {
    val idx = Files.createTempDirectory("graft-dedupidx").toString
    DedupOps.writeDedupIndex(spark, sf0001, idx)
    assert(Files.isDirectory(Paths.get(idx, "pair_stats")))
    assert(Files.isDirectory(Paths.get(idx, "clusters")))

    // the originals, computed from text as usual
    val degDirect = DedupOps.neardupDegreeDist(spark, sf0001).collect().toSeq
    val triDirect = DedupOps.neardupTriangles(spark, sf0001).collect().toSeq
    val cluDirect = DedupOps.duplicateClusters(spark, sf0001).collect().toSeq

    // a "corpus" directory that does NOT exist: any operator that touches
    // document text would throw. Priming the memos from the artifact must
    // make every pair-stats/cluster consumer serve anyway.
    val ghost = "/nonexistent/graft-ghost-corpus"
    DedupOps.loadDedupIndex(spark, ghost, idx)
    // raw-pair consumers (the filter-then-expand path needs the primed
    // members map, not the corpus)
    assert(DedupOps.ngramJaccardPairs(spark, ghost).collect().toSeq
      === DedupOps.ngramJaccardPairs(spark, sf0001).collect().toSeq)
    assert(DedupOps.containmentPairs(spark, ghost).collect().toSeq
      === DedupOps.containmentPairs(spark, sf0001).collect().toSeq)
    assert(DedupOps.neardupDegreeDist(spark, ghost).collect().toSeq
      === degDirect)
    assert(DedupOps.neardupTriangles(spark, ghost).collect().toSeq
      === triDirect)
    assert(DedupOps.duplicateClusters(spark, ghost).collect().toSeq
      === cluDirect)

    // the UPDATE path runs off the artifact too: attaching a batch to
    // the ghost corpus (capped index + labels primed from disk) equals
    // attaching to the real one
    import spark.implicits._
    val batch = Tables.documents(spark, sf0001)
      .where(col("doc_id") % 50 === 0)
      .select((col("doc_id") + lit(5000000L)).as("doc_id"), col("text"))
    val attachDirect =
      DedupOps.incrementalClusters(spark, sf0001, batch).collect().toSeq
    assert(DedupOps.incrementalClusters(spark, ghost, batch).collect().toSeq
      === attachDirect)
  }

  test("loading a pre-r11 dedup index fails with a versioned rewrite message") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft-dedupidx-old").toString
    DedupOps.writeDedupIndex(spark, sf0001, idx)
    // regress the artifact to the pre-r11 shape: version-less meta, no
    // members/canon_index dirs
    Seq(true).toDF("contracted")
      .write.mode("overwrite").parquet(s"$idx/canon_meta")
    def rmrf(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (Files.isDirectory(p))
        Files.list(p).iterator().asScala.foreach(rmrf)
      Files.deleteIfExists(p)
    }
    rmrf(Paths.get(idx, "members"))
    val e = intercept[IllegalStateException] {
      DedupOps.loadDedupIndex(spark, "/nonexistent/graft-ghost-old", idx)
    }
    assert(e.getMessage.contains("rewrite it with writeDedupIndex") &&
      e.getMessage.contains("members"), e.getMessage)
  }
}
