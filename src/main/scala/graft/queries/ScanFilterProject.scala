package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Dsl, QueryDef, QueryGroup, Tables}
import Dsl._

/** Scans, projections and filters — SURVEY.md §2.1 #1-5.
  *
  * Reference analog: the GTFS bulk load (`build_stop_times_ext`-style
  * full-table reads) and the per-cycle station/date filters of the API
  * extractor [P extract_schedule.py, extract_api.py — SURVEY.md §0].
  */
object ScanFilterProject extends QueryGroup {

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "scan_parquet",
      (spark, sf) =>
        Tables.lineitem(spark, sf)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
          // (l_orderkey, l_linenumber) is NOT unique in this data —
          // total order requires every output column (leftover dups are
          // then bit-identical rows, which hash the same in any order).
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      Some("SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice"),
      scaleNote = "Projection reaches the parquet reader (ReadSchema is 4 cols); at 100 TB the scan is embarrassingly parallel over row-group splits. Final global sort exists only to satisfy the oracle hash; a production scan would not sort."),

    QueryDef(
      "scan_events_ns",
      (spark, sf) =>
        Tables.loadEvents(spark, sf)
          .select("event_id", "ts", "user_id", "event_type", "value")
          .orderBy("event_id"),
      Some("SELECT event_id, ts, user_id, event_type, value FROM events ORDER BY event_id"),
      scaleNote = "ns→µs normalization is one codegen'd integer div per row, applied in the scan projection — no shuffle, no UDF. DuckDB truncates identically on read."),

    QueryDef(
      "project_compute",
      (spark, sf) =>
        Tables.lineitem(spark, sf)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            upper(col("l_returnflag")).as("flag_uc"),
            // Keep the exact product scale (2+2=4): a cast down to
            // scale 2 would round, and Spark rounds HALF_UP while
            // DuckDB rounds half-to-even — measured divergence. The
            // final DOUBLE cast of the exact decimal is deterministic
            // on both engines (driver-hash rule, see agg_sum_group).
            (dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
              .cast(D4).cast("double").as("net_price"),
            (dec2(col("l_extendedprice")) * dec2(col("l_tax")))
              .cast(D4).cast("double").as("tax_amt"))
          .orderBy("l_orderkey", "l_linenumber", "flag_uc", "net_price", "tax_amt"),
      Some("SELECT l_orderkey, l_linenumber, upper(l_returnflag) AS flag_uc, CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS DOUBLE) AS net_price, CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS DOUBLE) AS tax_amt FROM lineitem ORDER BY l_orderkey, l_linenumber, flag_uc, net_price, tax_amt"),
      scaleNote = "Pure narrow map, stays inside WholeStageCodegen; exact-scale decimal math keeps the derived column engine-independent; double emit is a single deterministic conversion of the exact value."),

    QueryDef(
      "filter_basic",
      (spark, sf) =>
        Tables.lineitem(spark, sf)
          .filter(
            col("l_shipdate").between(tsLit("1996-01-01"), tsLit("1996-12-31"))
              && col("l_returnflag").isin("A", "R")
              && (col("l_quantity") > lit(25.0) || col("l_discount") < lit(0.03))
              && col("l_linestatus").like("F%"))
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
            "l_returnflag", "l_linestatus", "l_shipdate")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
            "l_returnflag", "l_linestatus", "l_shipdate"),
      Some("SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus, l_shipdate FROM lineitem WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31' AND l_returnflag IN ('A','R') AND (l_quantity > 25.0 OR l_discount < 0.03) AND l_linestatus LIKE 'F%' ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus, l_shipdate"),
      scaleNote = "All conjuncts are parquet-pushable (PushedFilters shows ship-date range + IN + comparisons); at 100 TB with shipdate partitioning this prunes partitions before any task launches."),

    QueryDef(
      "filter_null_case",
      (spark, sf) => {
        val flagN = when(col("l_returnflag") === "N", lit(null)).otherwise(col("l_returnflag"))
        Tables.lineitem(spark, sf)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            flagN.as("flag_n"),
            coalesce(flagN, lit("ONTIME")).as("flag_filled"))
          .filter(col("flag_n").isNull || col("flag_n") === "R")
          // NULL sort position differs across engines (Spark default
          // NULLS FIRST, DuckDB NULLS LAST) — pin it explicitly.
          .orderBy(col("l_orderkey"), col("l_linenumber"),
            col("flag_n").asc_nulls_last, col("flag_filled"))
      },
      Some("SELECT l_orderkey, l_linenumber, NULLIF(l_returnflag,'N') AS flag_n, COALESCE(NULLIF(l_returnflag,'N'),'ONTIME') AS flag_filled FROM lineitem WHERE NULLIF(l_returnflag,'N') IS NULL OR NULLIF(l_returnflag,'N') = 'R' ORDER BY l_orderkey, l_linenumber, flag_n ASC NULLS LAST, flag_filled"),
      scaleNote = "Three-valued logic handled by Catalyst NullPropagation; no UDF. Mirrors the reference's missing-`etat` (on-time trains carry no status) semantics."))
}
