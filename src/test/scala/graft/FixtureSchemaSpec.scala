package graft

import org.apache.spark.sql.types._

/** Fixture-schema drift guard (VERDICT r7 gap #3).
  *
  * Round 7 lost 32/148 correctness rows and the whole bench artifact because
  * the driver regenerated /root/testdata mid-round with events.ts changed
  * from int64 nanos to TIMESTAMP_NTZ µs and nothing in the repo asserted the
  * engine-facing schema of the driver tables. This spec pins the schema each
  * loader EXPOSES (post-normalization), so any future physical-type swap the
  * loaders can't absorb fails as one loud, named test instead of 32 scattered
  * analysis crashes.
  *
  * Assertions are on (name, engine-facing type) pairs — nullability is a
  * writer detail the engine doesn't depend on.
  */
class FixtureSchemaSpec extends SparkSpec {

  private def shape(df: org.apache.spark.sql.DataFrame): Seq[(String, DataType)] =
    df.schema.fields.toSeq.map(f => f.name -> f.dataType)

  test("events loader normalizes ts to (ts_nano: Long, ts: Timestamp) on the live fixture") {
    val ev = Tables.events(spark, sf0001)
    val m = ev.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(m("ts_nano") == LongType, s"ts_nano must be epoch-nanos Long, got ${m("ts_nano")}")
    assert(m("ts") == TimestampType, s"ts must be TimestampType, got ${m("ts")}")
    assert(m("event_id") == LongType && m("user_id") == LongType &&
      m("event_type") == StringType && m("value") == DoubleType && m("props") == StringType)
    // value sanity: ts_nano is epoch NANOS in the fixture's 2024 window, and
    // ts is the same instant — a unit swap (µs-as-ns) breaks both asserts
    val row = ev.selectExpr("min(ts_nano)", "max(ts_nano)",
      "max(abs(ts_nano div 1000 - unix_micros(ts)))").head
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    val nano2023 = 1672531200L * 1000000000L // 2023-01-01 in ns
    val nano2030 = 1893456000L * 1000000000L
    assert(lo >= nano2023 && hi <= nano2030,
      s"ts_nano range [$lo,$hi] outside plausible epoch-nanos window — unit drift?")
    assert(row.getLong(2) == 0L, "ts and ts_nano disagree on the instant")
  }

  test("tpch + documents + embeddings tables expose the expected engine-facing schemas") {
    assert(shape(Tables.region(spark, sf0001)) == Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(shape(Tables.nation(spark, sf0001)) == Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    val cust = shape(Tables.customer(spark, sf0001)).toMap
    assert(cust("c_custkey") == LongType && cust("c_nationkey") == IntegerType &&
      cust("c_acctbal") == DoubleType && cust("c_mktsegment") == StringType)
    val ord = shape(Tables.orders(spark, sf0001)).toMap
    assert(ord("o_orderkey") == LongType && ord("o_custkey") == LongType &&
      ord("o_totalprice") == DoubleType && ord("o_orderstatus") == StringType)
    assert(ord("o_orderdate") == DateType || ord("o_orderdate").isInstanceOf[TimestampNTZType] ||
      ord("o_orderdate") == TimestampType,
      s"o_orderdate drifted to ${ord("o_orderdate")}")
    val li = shape(Tables.lineitem(spark, sf0001)).toMap
    assert(li("l_orderkey") == LongType && li("l_quantity") == DoubleType &&
      li("l_extendedprice") == DoubleType && li("l_discount") == DoubleType &&
      li("l_returnflag") == StringType && li("l_linestatus") == StringType)
    assert(li("l_shipdate") == DateType || li("l_shipdate").isInstanceOf[TimestampNTZType] ||
      li("l_shipdate") == TimestampType,
      s"l_shipdate drifted to ${li("l_shipdate")}")
    val sup = shape(Tables.supplier(spark, sf0001)).toMap
    assert(sup("s_suppkey") == LongType && sup("s_nationkey") == IntegerType)
    val prt = shape(Tables.part(spark, sf0001)).toMap
    assert(prt("p_partkey") == LongType && prt("p_retailprice") == DoubleType)
    assert(shape(Tables.documents(spark, sf0001)) == Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assert(shape(Tables.embeddings(spark, sf0001)) == Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }
}
