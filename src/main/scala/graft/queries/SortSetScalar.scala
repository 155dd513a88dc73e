package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{Dsl, QueryDef, QueryGroup, Tables}
import Dsl._

/** Sort / limit / set ops / scalar function surface — SURVEY.md §2.1
  * #34-39 and #43-49.
  *
  * Reference analog: station-board ordering and next-departure top-k
  * [P query.py], era-merge unions across Mongo/Dynamo stores
  * [P utils_mongo.py, utils_dynamo.py], and the all-text GTFS → typed
  * casts + `dd/mm/yyyy` date surgery [P models_rdb.py, utils_misc.py].
  *
  * Determinism notes: floats are only passed through or combined with
  * IEEE-exact ops (+,-,*,/, sqrt, floor) which are identical across
  * engines; transcendentals (ln) are rounded to 4 decimals and the
  * input domain (50 distinct quantities) is fully exercised by the
  * differential gate. NULL sort positions are pinned explicitly.
  */
object SortSetScalar extends QueryGroup {

  def defs: Seq[QueryDef] = Seq(

    // #34 — multi-key sort, mixed directions, pinned NULL position.
    QueryDef(
      "sort_multi",
      (spark, sf) => {
        val seg = when(col("c_mktsegment") === "BUILDING", lit(null))
          .otherwise(col("c_mktsegment"))
        Tables.customer(spark, sf)
          .select(col("c_custkey"), seg.as("seg"), col("c_acctbal"), col("c_name"))
          .orderBy(col("seg").desc_nulls_last, col("c_acctbal").desc,
            col("c_custkey").asc)
      },
      Some("SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg, c_acctbal, c_name FROM customer ORDER BY seg DESC NULLS LAST, c_acctbal DESC, c_custkey ASC"),
      scaleNote = "SortExec is a spillable external sort per partition after a range-partitioning exchange (global order); mixed asc/desc and NULL position ride in the sort key prefix. Board ordering at scale = the same plan per station partition without the global exchange."),

    // #35 — top-k: next-N departures [P query.py]. Unique tie-break on
    // orderkey keeps LIMIT deterministic.
    QueryDef(
      "limit_topk",
      (spark, sf) =>
        Tables.orders(spark, sf)
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10),
      Some("SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"),
      scaleNote = "Plans as TakeOrderedAndProject: each partition keeps a size-10 heap, driver merges partition heaps — no global sort, no shuffle of the full table. The only safe global top-k at 100 TB."),

    // #36 — UNION ALL: merging data eras across stores
    // [P utils_mongo.py/utils_dynamo.py].
    QueryDef(
      "set_union_all",
      (spark, sf) => {
        val a = Tables.orders(spark, sf)
          .select(col("o_orderkey").as("k"), lit("orders").as("src"))
        val b = Tables.lineitem(spark, sf)
          .select(col("l_orderkey").as("k"), lit("lineitem").as("src"))
        // duplicate (k, src) rows are bit-identical, so their relative
        // order cannot affect the hash
        a.unionByName(b).orderBy("k", "src")
      },
      Some("SELECT k, src FROM (SELECT o_orderkey AS k, 'orders' AS src FROM orders UNION ALL SELECT l_orderkey, 'lineitem' FROM lineitem) ORDER BY k, src"),
      scaleNote = "UNION ALL is pure plan concatenation — zero shuffle, partitions of both children appended. The era-merge pattern: read old store + new store as one DataFrame."),

    // #37 — UNION DISTINCT.
    QueryDef(
      "set_union",
      (spark, sf) => {
        val a = Tables.orders(spark, sf).select(col("o_custkey").as("k"))
        val b = Tables.customer(spark, sf).select(col("c_custkey").as("k"))
        a.union(b).distinct().orderBy("k")
      },
      Some("SELECT o_custkey AS k FROM orders UNION SELECT c_custkey FROM customer ORDER BY k"),
      scaleNote = "Distinct after concat = one hash-aggregate shuffle on the key; map-side partial dedup shrinks the wire volume first."),

    // #38 — INTERSECT (distinct semantics in both engines).
    QueryDef(
      "set_intersect",
      (spark, sf) =>
        Tables.customer(spark, sf).select(col("c_custkey").as("k"))
          .intersect(Tables.orders(spark, sf).select(col("o_custkey").as("k")))
          .orderBy("k"),
      Some("SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey AS k FROM orders ORDER BY k"),
      scaleNote = "Catalyst rewrites INTERSECT to a left-semi join over distinct keys — shuffle both sides on k once; same cost class as join_semi."),

    // #39 — EXCEPT (distinct semantics in both engines). Right side
    // filtered to urgent orders so the difference is non-empty at every
    // scale factor (all customers have *some* order — vacuous-query
    // trap, SURVEY §2.0).
    QueryDef(
      "set_except",
      (spark, sf) =>
        Tables.customer(spark, sf).select(col("c_custkey").as("k"))
          .except(Tables.orders(spark, sf)
            .filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey").as("k")))
          .orderBy("k"),
      Some("SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT' ORDER BY k"),
      scaleNote = "EXCEPT rewrites to left-anti join over distinct keys — the 'customers with no orders' shape, one shuffle per side."),

    // #39b — EXCEPT ALL: MULTISET difference — each key survives
    // max(n_left − n_right, 0) times. Distinct from set_except in both
    // semantics and physical plan: Catalyst rewrites it to a count
    // aggregate per side + Generate(ReplicateRows) — no anti join.
    // The era-reconciliation shape: "which rows of the new load are
    // NOT yet accounted for, counting multiplicity".
    QueryDef(
      "set_except_all",
      (spark, sf) => {
        val li = Tables.lineitem(spark, sf)
        li.select(col("l_orderkey").as("k"))
          .exceptAll(li.filter(col("l_returnflag") === "R")
            .select(col("l_orderkey").as("k")))
          .orderBy("k")
        // surviving duplicates of k are bit-identical rows — their
        // relative order cannot affect the hash
      },
      Some("SELECT l_orderkey AS k FROM lineitem EXCEPT ALL SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R' ORDER BY k"),
      scaleNote = "EXCEPT ALL rewrites to one hash agg per side keyed on " +
        "the row (computing multiplicities), a join of the two count " +
        "tables, and Generate(ReplicateRows) to re-expand survivors — " +
        "so the wire carries one row per DISTINCT key, not per " +
        "duplicate. At 100 TB that pre-aggregation is exactly what " +
        "you'd hand-write; the re-expansion is map-side and codegen'd."),

    // #39c — INTERSECT ALL: multiset intersection, min(n_left,
    // n_right) copies per key. Left/right draw different returnflag
    // slices of lineitem so per-key multiplicities genuinely differ
    // from both sides' (vacuous-query trap, SURVEY §2.0).
    QueryDef(
      "set_intersect_all",
      (spark, sf) => {
        val li = Tables.lineitem(spark, sf)
        li.filter(col("l_returnflag") === "A").select(col("l_orderkey").as("k"))
          .intersectAll(li.filter(col("l_returnflag") === "R")
            .select(col("l_orderkey").as("k")))
          .orderBy("k")
      },
      Some("SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'A' INTERSECT ALL SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R' ORDER BY k"),
      scaleNote = "Same rewrite family as set_except_all: per-side " +
        "multiplicity aggs + min() + ReplicateRows — distinct-key wire " +
        "volume, duplicate expansion deferred to after the shuffle. " +
        "The 'orders returned in BOTH eras, with multiplicity' shape."),

    // #43 — string surgery: mission-code & UIC normalization analog
    // [P match_ids.py].
    QueryDef(
      "fn_string",
      (spark, sf) =>
        Tables.customer(spark, sf)
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("name_uc"),
            substring(col("c_name"), 1, 8).as("name8"),
            lpad(col("c_custkey").cast("string"), 10, "0").as("key_pad"),
            regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_num"),
            regexp_replace(col("c_name"), "#", "-").as("name_dash"),
            trim(concat(lit("  "), col("c_name"), lit(" "))).as("name_trim"),
            expr("split_part(c_name, '#', 2)").as("name_id"))
          .orderBy("c_custkey"),
      Some("SELECT c_custkey, upper(c_name) AS name_uc, substr(c_name, 1, 8) AS name8, lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad, regexp_extract(c_name, '([0-9]+)', 1) AS name_num, replace(c_name, '#', '-') AS name_dash, trim(concat('  ', c_name, ' ')) AS name_trim, split_part(c_name, '#', 2) AS name_id FROM customer ORDER BY c_custkey"),
      scaleNote = "All built-in string expressions — codegen'd, no UDF, stays inside WholeStageCodegen. The UIC-8 padding is literally lpad."),

    // #44 — date/time surface: service-day & dd/mm/yyyy parsing analog
    // [P utils_misc.py]. dayofweek aligned to DuckDB's 0=Sunday via -1
    // (SURVEY §2.0 rule 5); date_trunc cast to timestamp on the DuckDB
    // side (it returns DATE there, TIMESTAMP in Spark).
    QueryDef(
      "fn_date",
      (spark, sf) =>
        Tables.orders(spark, sf)
          .select(
            col("o_orderkey"), col("o_orderdate"),
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("d"),
            (dayofweek(col("o_orderdate")) - 1).as("dow"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            datediff(col("o_orderdate"), tsLit("1995-01-01")).as("days_since"),
            (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_date"))
          .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, o_orderdate, year(o_orderdate) AS y, month(o_orderdate) AS m, dayofmonth(o_orderdate) AS d, dayofweek(o_orderdate) AS dow, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start, date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since, o_orderdate + INTERVAL 30 DAY AS due_date FROM orders ORDER BY o_orderkey"),
      scaleNote = "Pure codegen'd datetime arithmetic in the scan projection; the service-day shift (past-midnight handling) composes from the same primitives in graft.functions.GtfsTime."),

    // #45 — math surface: delay-seconds arithmetic analog
    // [P match_ids.py]. sqrt/floor/abs are IEEE-exact; ln is rounded to
    // 4 decimals over a 50-value domain fully covered by the gate.
    QueryDef(
      "fn_math",
      (spark, sf) =>
        Tables.lineitem(spark, sf)
          .select(
            col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            abs(col("l_quantity") - lit(25.0)).as("qty_dev"),
            ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
            floor(col("l_extendedprice")).cast("long").as("price_floor"),
            round(log(col("l_quantity")), 4).as("qty_ln"),
            sqrt(col("l_quantity")).as("qty_sqrt"),
            pow(col("l_linenumber").cast("double"), 2.0).as("line_sq"),
            (col("l_orderkey") % 7).as("key_mod"),
            // negative-operand integer-division PARITY PIN (r13
            // ADVICE #2): Spark `div` truncates toward zero, and
            // measured DuckDB 1.0.0 integer `//` ALSO truncates
            // ((-7)//2 = -3, not -4) — truncation parity is the
            // house contract for plain integer division on negative
            // operands (attribution_shapley's phi_units div 24
            // relies on it). This column runs that exact case
            // through the hash gate every round: if either engine
            // ever changes to floor semantics, fn_math fails loudly.
            expr("CAST((3 - l_linenumber * 2) div 3 AS BIGINT)")
              .as("neg_div_trunc"))
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "price_ceil", "price_floor"),
      Some("SELECT l_orderkey, l_linenumber, l_quantity, abs(l_quantity - 25.0) AS qty_dev, CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil, CAST(floor(l_extendedprice) AS BIGINT) AS price_floor, round(ln(l_quantity), 4) AS qty_ln, sqrt(l_quantity) AS qty_sqrt, pow(CAST(l_linenumber AS DOUBLE), 2.0) AS line_sq, l_orderkey % 7 AS key_mod, CAST((3 - l_linenumber * 2) // 3 AS BIGINT) AS neg_div_trunc FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, price_ceil, price_floor"),
      scaleNote = "Scalar math in the scan projection, fully codegen'd. (l_orderkey,l_linenumber) is not unique; every output column is a function of the five sort keys, so any remaining ties are bit-identical rows. neg_div_trunc pins negative-operand integer-division truncation parity cross-engine (the contract attribution_shapley's signed div relies on)."),

    // Bitwise function surface — the hash/mask/flag toolkit every
    // bucketing scheme here leans on (band keys, bitmap presence,
    // SimHash votes), exposed as first-class scalar ops: and-mask,
    // xor mix, shifts, popcount. Integer-exact by construction; the
    // popcount cast pins INT on both engines (DuckDB's bit_count
    // otherwise returns a narrower type).
    QueryDef(
      "fn_bitwise",
      (spark, sf) =>
        Tables.lineitem(spark, sf)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            expr("l_orderkey & 255").as("low_band"),
            expr("l_orderkey ^ l_partkey").as("key_mix"),
            expr("shiftleft(l_suppkey, 3)").as("supp_shl3"),
            expr("shiftright(l_orderkey, 2)").as("key_shr2"),
            expr("CAST(bit_count(l_partkey) AS INT)").as("part_pop"))
          .orderBy("l_orderkey", "l_linenumber", "key_mix"),
      Some("SELECT l_orderkey, l_linenumber, l_orderkey & 255 AS low_band, " +
        "xor(l_orderkey, l_partkey) AS key_mix, l_suppkey << 3 AS supp_shl3, " +
        "l_orderkey >> 2 AS key_shr2, CAST(bit_count(l_partkey) AS INT) AS part_pop " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, key_mix"),
      scaleNote = "Pure scan-projection scalars, codegen'd — the " +
        "same class as fn_math. These are the primitives the " +
        "engine's own scale machinery composes: & for band masks, " +
        "^ for key mixing/salting, shifts for bucket-id packing, " +
        "popcount for SimHash Hamming votes and bitmap-presence " +
        "rollups — gating them as declared ops pins their " +
        "cross-engine integer semantics (arithmetic vs logical " +
        "shift, sign behavior) that the composed operators silently " +
        "rely on."),

    // #46 — conditional logic: the Retardé/Supprimé status classifier
    // analog [P extract_api.py].
    QueryDef(
      "fn_cond",
      (spark, sf) =>
        Tables.orders(spark, sf)
          .select(
            col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
            when(col("o_totalprice") >= 300000.0, lit("very-late"))
              .when(col("o_totalprice") >= 150000.0, lit("late"))
              .otherwise(lit("on-time")).as("delay_bucket"),
            coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
              .as("status_filled"),
            when(col("o_orderstatus") === "F", lit(1)).otherwise(lit(0))
              .as("is_final"))
          .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, o_totalprice, o_orderstatus, CASE WHEN o_totalprice >= 300000.0 THEN 'very-late' WHEN o_totalprice >= 150000.0 THEN 'late' ELSE 'on-time' END AS delay_bucket, COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_filled, CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_final FROM orders ORDER BY o_orderkey"),
      scaleNote = "CASE/COALESCE/NULLIF are codegen'd branches — no UDF for classification logic, Catalyst folds constant branches."),

    // #47 — array / higher-order functions over the embedding column.
    // Floats are digitized to ints (floor(x*10): widen + one multiply,
    // both IEEE-exact) before any order-sensitive aggregation.
    QueryDef(
      "fn_array",
      (spark, sf) => {
        val ints = transform(col("embedding"),
          x => floor(x.cast("double") * lit(10)).cast("int"))
        Tables.embeddings(spark, sf)
          .select(
            col("vec_id"),
            size(col("embedding")).as("n_dims"),
            // scalar-only final schema (driver-hash rule): the sliced
            // prefix is emitted comma-joined, not as an array cell
            array_join(transform(slice(ints, 1, 3),
              x => x.cast("string")), ",").as("ints3"),
            aggregate(ints, lit(0L), (acc, x) => acc + x).as("int_sum"),
            array_contains(ints, 1).as("has1"),
            size(filter(col("embedding"), x => x > 0)).as("n_pos"))
          .orderBy("vec_id")
      },
      Some("SELECT vec_id, len(embedding) AS n_dims, array_to_string(list_transform(embedding[1:3], x -> CAST(floor(CAST(x AS DOUBLE)*10) AS INTEGER)), ',') AS ints3, CAST(list_sum(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10) AS INTEGER))) AS BIGINT) AS int_sum, list_contains(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*10) AS INTEGER)), 1) AS has1, len(list_filter(embedding, x -> x > 0)) AS n_pos FROM embeddings ORDER BY vec_id"),
      scaleNote = "Higher-order functions evaluate per-row inside codegen — no explode/re-group round trip, no shuffle. This is the per-row vector toolkit the ANN operators build on."),

    // Map-typed column surface: build a MAP from columns, extract /
    // inspect it per row — the variant-attribute document shape
    // (passage XML attrs [P extract_api.py]) worked on as a typed
    // column. The map stays INTERNAL (scalar-only final schema rule);
    // the oracle mirrors the extracted VALUES, which is what the
    // check compares.
    QueryDef(
      "fn_map",
      (spark, sf) => {
        val m = map(
          lit("status"), col("o_orderstatus"),
          lit("priority"), col("o_orderpriority"))
        Tables.orders(spark, sf)
          .select(
            col("o_orderkey"),
            element_at(m, "status").as("status_val"),
            element_at(m, "priority").as("prio_val"),
            element_at(m, "missing").as("missing_val"), // absent key → NULL
            size(m).as("n_keys"),
            array_join(array_sort(map_keys(m)), ",").as("keys_sorted"))
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_orderstatus AS status_val, o_orderpriority AS prio_val, CAST(NULL AS VARCHAR) AS missing_val, 2 AS n_keys, 'priority,status' AS keys_sorted FROM orders ORDER BY o_orderkey"),
      scaleNote = "Map construction/extraction is per-row codegen in the scan projection — the typed replacement for schemaless document fields. At ingest scale, prefer exploding hot keys into real columns (pruning + stats); keep the map only for the long tail of rare attributes."),

    // #48 — JSON field extraction: Mongo document fields analog
    // [P utils_mongo.py].
    QueryDef(
      "fn_json",
      (spark, sf) =>
        Tables.loadEvents(spark, sf)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .orderBy("event_id"),
      Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events ORDER BY event_id"),
      scaleNote = "get_json_object parses per row in codegen. At scale, parse once: from_json to a struct column at ingest, then prune fields — avoids re-parsing per extraction."),

    // #49 — cast matrix: the all-text GTFS → typed ingest analog
    // [P models_rdb.py].
    QueryDef(
      "fn_cast",
      (spark, sf) =>
        Tables.orders(spark, sf)
          .select(
            col("o_orderkey"),
            col("o_orderkey").cast("string").as("key_str"),
            col("o_totalprice").cast(D2).cast("string").as("price_str"),
            col("o_orderdate").cast("date").cast("string").as("date_str"),
            col("o_orderdate").cast("string").as("ts_str"),
            // a DATE-typed final column renders differently through the
            // two compare clients (pyarrow date vs pandas Timestamp) —
            // round-trip through DATE but emit string/timestamp
            col("o_orderdate").cast("date").cast("timestamp_ntz").as("date_midnight"),
            substring(col("o_orderdate").cast("string"), 1, 4).cast("int").as("year_int"),
            col("o_orderkey").cast("double").as("key_dbl"),
            (col("o_orderkey") % 2 === 0).as("is_even"))
          .orderBy("o_orderkey"),
      Some("SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) AS key_str, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str, CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str, CAST(o_orderdate AS VARCHAR) AS ts_str, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS date_midnight, CAST(substr(CAST(o_orderdate AS VARCHAR), 1, 4) AS INTEGER) AS year_int, CAST(o_orderkey AS DOUBLE) AS key_dbl, o_orderkey % 2 = 0 AS is_even FROM orders ORDER BY o_orderkey"),
      scaleNote = "Casts are codegen'd per row; the GTFS ingest applies exactly this matrix once at load so every downstream operator works on typed columns. DATE round-trips internally but final emit is string/timestamp (client-path rendering rule)."))
}
