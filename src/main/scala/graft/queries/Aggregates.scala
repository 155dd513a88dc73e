package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Dsl, QueryDef, QueryGroup, Tables}
import Dsl._

/** Aggregations — SURVEY.md §2.1 #18-26, #57.
  *
  * Reference analog: per-station per-day passage counts and the
  * latest-state-per-key upsert semantics of the Dynamo/Mongo sinks
  * [P query.py, utils_dynamo.py — SURVEY.md §0].
  */
object Aggregates extends QueryGroup {

  def defs: Seq[QueryDef] = Seq(

    // TPC-H Q1-style pricing summary: the flagship (SparkEntry.entry).
    QueryDef(
      "agg_sum_group",
      (spark, sf) =>
        Tables.lineitem(spark, sf)
          .filter(col("l_shipdate") <= tsLit("1999-06-30"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            // Sum in exact DECIMAL, emit as DOUBLE: the driver's hash
            // compare renders Spark parquet Decimal ("6150.00") and
            // DuckDB-fetched DECIMAL (float 6150.0) differently, so any
            // final decimal column hash-mismatches despite equal values.
            // decimal→double of an exact decimal is deterministic on
            // both engines (round 1 verdict, CORRECTNESS_r01).
            sumDec2(col("l_quantity")).cast("double").as("sum_qty"),
            sumDec2(col("l_extendedprice")).cast("double").as("sum_base_price"),
            sum((dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
              .cast(D4)).cast(D4).cast("double").as("sum_disc_price"),
            avgDec4(col("l_quantity")).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("SELECT l_returnflag, l_linestatus, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty, CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_base_price, CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price, ROUND(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity), 4) AS avg_qty, count(*) AS count_order FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-06-30' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
      scaleNote = "2-phase HashAggregate: map-side partial aggregation collapses 100 TB to |groups|×partitions rows before the shuffle; only ~6 groups cross the wire per partition. Decimal sums are exact so partial/final split cannot change the answer; the double cast happens once on the final exact value."))
}
