package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar string/date function surface (SURVEY.md §2.2 row "String/date/
  * math scalar fns" — the reference only parses timestamps and duration/
  * size suffixes; a user migrating real log queries needs the full scalar
  * toolkit). Everything codegen'd built-ins, no UDFs.
  */
object ScalarOps {

  /** String functions over part names/brands: case mapping, substring,
    * regexp extraction, padding, replacement, concat.
    */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 4).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"),
        lpad(col("p_size").cast("string"), 3, "0").as("size_padded"),
        translate(col("p_type"), "AEIOU", "aeiou").as("type_lowered_vowels"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        reverse(col("p_name")).as("name_rev"),
        split(col("p_name"), " ").getItem(0).as("first_word"))
      .orderBy(col("p_partkey"))

  /** Date/time functions over order dates: component extraction, date
    * arithmetic, truncation, intervals, formatting.
    */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .where(col("o_orderkey") < 2000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        quarter(col("o_orderdate")).as("qtr"),
        unix_millis(date_trunc("month", col("o_orderdate")).cast("timestamp")).as("month_start_ms"),
        datediff(lit(java.sql.Date.valueOf("2000-01-01")), col("o_orderdate"))
          .as("days_to_y2k"),
        unix_millis((col("o_orderdate") + expr("INTERVAL 90 DAYS")).cast("timestamp")).as("due_ms"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
      .orderBy(col("o_orderkey"))
}
