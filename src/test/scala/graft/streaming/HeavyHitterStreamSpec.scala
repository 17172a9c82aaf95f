package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.HeavyHitterStream._

/** Streaming heavy-hitters: once-per-(shard, term) promotions, bounded
  * sketch state across batches, exact-count parity with the batch
  * aggregate when capacity covers the vocabulary, shard isolation.
  */
class HeavyHitterStreamSpec extends SparkSpec {

  private def withRocks[A](f: => A): A = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("a dominant term promotes exactly once; uniform shards promote nothing") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val in = MemoryStream[TermObs]
      val q = promotions(in.toDS(), m = 8, denom = 4)
        .writeStream.format("memory").queryName("hh_promo")
        .outputMode("append").trigger(Trigger.ProcessingTime("50 milliseconds"))
        .start()
      try {
        // shard "s": 'hot' is 50% of the stream (threshold 1/4); shard
        // "u": 8 terms uniform — nothing can prove > 1/4
        var seq = 0L
        def obs(shard: String, term: String): TermObs = {
          seq += 1; TermObs(shard, term, seq)
        }
        val batch1 =
          (0 until 10).map(_ => obs("s", "hot")) ++
          (0 until 10).map(i => obs("s", s"rare$i")) ++
          (0 until 16).map(i => obs("u", s"t${i % 8}"))
        in.addData(batch1)
        q.processAllAvailable()
        val got1 = spark.table("hh_promo").as[Promotion].collect()
        assert(got1.map(p => (p.shard, p.term)).toSet === Set(("s", "hot")))
        val p = got1.head
        assert(p.est_count - p.err > p.n_total / 4)
        assert(p.n_total === 20L)

        // more of the same: 'hot' must NOT re-promote; a second shard-s
        // term rising above threshold promotes across the batch boundary
        in.addData((0 until 30).map(_ => obs("s", "surge")) ++
          (0 until 5).map(_ => obs("s", "hot")))
        q.processAllAvailable()
        val got2 = spark.table("hh_promo").as[Promotion].collect()
        assert(got2.count(p => p.shard == "s" && p.term == "hot") === 1,
          "hot must promote exactly once")
        assert(got2.map(p => (p.shard, p.term)).toSet ===
          Set(("s", "hot"), ("s", "surge")))
      } finally q.stop()
    }
  }

  test("capacity >= vocabulary degenerates to exact counts (batch parity)") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val in = MemoryStream[TermObs]
      val q = promotions(in.toDS(), m = 64, denom = 3)
        .writeStream.format("memory").queryName("hh_exact")
        .outputMode("append").trigger(Trigger.ProcessingTime("50 milliseconds"))
        .start()
      try {
        // 12×a, 4×b, 4×c: a holds 60% > 1/3, others can't
        val terms = Seq.fill(12)("a") ++ Seq.fill(4)("b") ++ Seq.fill(4)("c")
        in.addData(terms.zipWithIndex.map { case (t, i) => TermObs("s", t, i.toLong) })
        q.processAllAvailable()
        val got = spark.table("hh_exact").as[Promotion].collect()
        assert(got.map(_.term).toSet === Set("a"))
        // with m >= vocab, Space-Saving never evicts: err 0, exact count
        assert(got.head.est_count === 12L && got.head.err === 0L)
        assert(got.head.n_total === 20L)
      } finally q.stop()
    }
  }
}
