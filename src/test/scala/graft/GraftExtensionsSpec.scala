package graft

import graft.SparkSpec

/** The extensions entry point makes the native expressions callable from
  * SQL in any session configured with spark.sql.extensions (the shared
  * suite session is built exactly that way — the deployment shape).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("sketch functions are callable from SQL") {
    val shingles = spark.sql(
      "SELECT word_shingles(split('a b c d', ' '), 3) AS s")
      .collect().head.getSeq[String](0)
    assert(shingles === Seq("a b c", "b c d"))

    val k = spark.sql("SELECT size(minhash_sig(array('x','y'), 16)) AS k")
      .collect().head.getInt(0)
    assert(k === 16)

    val same = spark.sql(
      "SELECT simhash64(array('a','b')) = simhash64(array('b','a')) AS eq")
      .collect().head.getBoolean(0)
    assert(same)

    val cos = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val frac = spark.sql(
      "SELECT sig_match_frac(array(1L, 2L, 3L, 4L), array(1L, 9L, 3L, 8L)) AS f")
      .collect().head.getDouble(0)
    assert(frac === 0.5)

    val pairs = spark.sql(
      "SELECT sorted_id_pairs(array(3L, 1L, 2L)) AS p")
      .selectExpr("inline(p)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("arity errors are reported at analysis time") {
    val e = intercept[Exception](spark.sql("SELECT simhash64()").collect())
    assert(e.getMessage.contains("simhash64"))
  }
}
