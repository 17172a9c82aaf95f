package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Connected-components canonicalization ([[DedupOps.clusters]]):
  * correctness on adversarial synthetic graphs (deep chain — the
  * worst case for label propagation —, cycle, disjoint components) plus
  * the end-to-end fixture run agreeing with a transitive closure of the
  * pair set computed independently in-memory.
  */
class DedupClusterSpec extends SparkSpec {

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    DedupOps.clusters(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain component propagates the min id end to end") {
    // 1-2-3-4-5-6-7: diameter 6, min label must travel the full chain
    val chain = (1L to 6L).map(i => (i, i + 1))
    val lbl = labelsOf(chain)
    assert(lbl.keySet == (1L to 7L).toSet)
    assert(lbl.values.toSet == Set(1L))
  }

  test("cycles terminate and disjoint components stay separate") {
    val edges = Seq((20L, 21L), (21L, 22L), (22L, 20L), // cycle
      (10L, 11L), // pair
      (1L, 2L), (2L, 3L)) // path
    val lbl = labelsOf(edges)
    assert(lbl == Map(20L -> 20L, 21L -> 20L, 22L -> 20L,
      10L -> 10L, 11L -> 10L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty pair set yields empty labeling") {
    import spark.implicits._
    assert(DedupOps.clusters(Seq.empty[(Long, Long)].toDF("a", "b")).count() == 0)
  }

  test("fixture clusters agree with an independent transitive closure") {
    val pairs = DedupOps.ngramJaccardPairs(spark, sf0001, minSim = 0.2)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain planted near-dups")
    // reference labeling: union-find over the collected pairs
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(v: Long): Long = {
      val p = parent.getOrElseUpdate(v, v)
      if (p == v) v else { val r = find(p); parent(v) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(v => v -> find(v)).toMap
    val got = DedupOps.duplicateClusters(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
