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

  /** Count-Min bucket for hash row `i` (0..3): 8 hex chars sliced from
    * ONE md5 digest of the key — one digest per row feeds all d hash
    * functions (the standard derive-d-hashes-from-one-digest trick;
    * 4× cheaper than hashing "i:key" per row, measured). md5 so Spark
    * and DuckDB compute the identical cell — production would swap in
    * xxhash64. */
  def cmsBucket(digest: org.apache.spark.sql.Column, i: Int,
      w: Int): org.apache.spark.sql.Column =
    conv(substring(digest, 1 + 8 * i, 8), 16, 10).cast("long") % w

  /** Count-Min point estimates for every distinct key in `keyCol`:
    * (key, exact_n, cms_est). The sketch is the d×w cell count table;
    * estimates take the min over the key's d cells. Factored out so
    * AnalyticsSpec can drive it over planted key distributions. */
  def cmsPointEstimates(df: org.apache.spark.sql.DataFrame, keyCol: String,
      d: Int, w: Int): org.apache.spark.sql.DataFrame = {
    require(d <= 4, "md5 yields 32 hex chars = 4 8-char slices")
    def buckets = explode(array((0 until d).map(i =>
      struct(lit(i).as("i"), cmsBucket(col("dg"), i, w).as("b"))): _*)).as("ib")
    val cells = df.select(col(keyCol), md5(col(keyCol)).as("dg"))
      .select(col(keyCol), buckets)
      .groupBy(col("ib.i").as("i"), col("ib.b").as("b"))
      .agg(count(lit(1)).as("c"))
    val keys = df.groupBy(keyCol).agg(count(lit(1)).as("exact_n"))
    keys.withColumn("dg", md5(col(keyCol)))
      .select(col(keyCol), col("exact_n"), buckets)
      .select(col(keyCol), col("exact_n"),
        col("ib.i").as("i"), col("ib.b").as("b"))
      .join(cells, Seq("i", "b"))
      .groupBy(keyCol, "exact_n")
      .agg(min(col("c")).as("cms_est"))
  }

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
      scaleNote = "2-phase HashAggregate: map-side partial aggregation collapses 100 TB to |groups|×partitions rows before the shuffle; only ~6 groups cross the wire per partition. Decimal sums are exact so partial/final split cannot change the answer; the double cast happens once on the final exact value."),

    // #19 — keyless aggregation: monitoring totals [P utils_misc.py].
    QueryDef(
      "agg_global",
      (spark, sf) =>
        Tables.orders(spark, sf)
          .agg(
            count(lit(1)).as("n_orders"),
            sumDec2(col("o_totalprice")).cast("double").as("sum_price"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"),
            min(col("o_orderdate")).as("min_date"),
            max(col("o_orderdate")).as("max_date")),
      Some("SELECT count(*) AS n_orders, CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price, min(o_totalprice) AS min_price, max(o_totalprice) AS max_price, min(o_orderdate) AS min_date, max(o_orderdate) AS max_date FROM orders"),
      scaleNote = "Keyless agg = partial per partition + single-row final merge; the shuffle carries one row per partition. min/max of stored doubles are order-independent (no summation), sum goes through exact decimal."),

    // #20 — distinct aggregation: distinct trains per day analog
    // [P extract_api.py day_train_num].
    QueryDef(
      "agg_distinct",
      (spark, sf) =>
        Tables.orders(spark, sf)
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n_orders"),
            countDistinct(col("o_custkey")).as("n_cust"))
          .orderBy("o_orderpriority"),
      Some("SELECT o_orderpriority, count(*) AS n_orders, count(DISTINCT o_custkey) AS n_cust FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
      scaleNote = "Spark plans distinct-agg as Expand + two-phase aggregate: first dedup (priority,custkey) partially map-side, then count — no single-node distinct set. At extreme cardinality switch to approx_count_distinct (see agg_approx_hll)."),

    // #21 — grouping sets (SQL surface; DSL has only rollup/cube).
    QueryDef(
      "agg_grouping_sets",
      (spark, sf) => {
        Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
        spark.sql(
          """SELECT l_returnflag, l_linestatus, count(*) AS n,
            |CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty
            |FROM lineitem
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
      },
      Some("SELECT l_returnflag, l_linestatus, count(*) AS n, CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ()) ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"),
      scaleNote = "Grouping sets expand each input row once per set (Expand node) before the same 2-phase hash agg — 3 sets = 3× map-side rows, still one shuffle. NULL sort position pinned explicitly (Spark defaults NULLS FIRST, DuckDB NULLS LAST)."),

    // #22 — rollup.
    QueryDef(
      "agg_rollup",
      (spark, sf) =>
        Tables.lineitem(spark, sf)
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"),
      scaleNote = "ROLLUP = prefix grouping sets; same Expand + 2-phase agg shape, output bounded by Σ|prefix-group| rows."),

    // #23 — cube.
    QueryDef(
      "agg_cube",
      (spark, sf) =>
        Tables.lineitem(spark, sf)
          .cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"),
      scaleNote = "CUBE expands 2^k grouping sets — k kept small by design; at scale prefer materializing the base aggregate once and rolling up from it."),

    // #24 — post-aggregation filter: stations-with-enough-data analog
    // [P query.py].
    QueryDef(
      "agg_having",
      (spark, sf) =>
        Tables.orders(spark, sf)
          .groupBy("o_custkey")
          .agg(
            count(lit(1)).as("n_orders"),
            sumDec2(col("o_totalprice")).cast("double").as("sum_price"))
          .filter(col("n_orders") >= 13)
          .orderBy("o_custkey"),
      Some("SELECT o_custkey, count(*) AS n_orders, CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price FROM orders GROUP BY o_custkey HAVING count(*) >= 13 ORDER BY o_custkey"),
      scaleNote = "HAVING is a filter over the aggregate output — applied post-shuffle on already-collapsed groups, so it costs nothing extra; it cannot be pushed below the agg."),

    // #25 — argmax: latest-state-per-key upsert semantic
    // [P utils_dynamo.py]. Tie-safe: max over a (price, orderkey) struct
    // is lexicographic in both engines, so equal prices resolve by the
    // unique orderkey instead of arrival order (bare max_by/arg_max is
    // nondeterministic under ties).
    QueryDef(
      "agg_argmax",
      (spark, sf) =>
        Tables.orders(spark, sf)
          .groupBy("o_custkey")
          .agg(
            max(struct(col("o_totalprice").as("p"), col("o_orderkey").as("k")))
              .getField("k").as("top_orderkey"),
            max(col("o_totalprice")).as("top_price"))
          .orderBy("o_custkey"),
      Some("SELECT o_custkey, (max(struct_pack(p := o_totalprice, k := o_orderkey))).k AS top_orderkey, max(o_totalprice) AS top_price FROM orders GROUP BY o_custkey ORDER BY o_custkey"),
      scaleNote = "Struct-max is a single 2-phase agg — the scalable form of 'latest row per key'. No window, no sort, no self-join; partials merge associatively across 1000 executors."),

    // #26 — collection aggregate: nested per-station train lists
    // [P serializers.py get_nested_dicts]. The list is EMITTED as a
    // comma-joined string: the driver harness sorts the fetched frame
    // before hashing and array cells are unhashable in pandas
    // (CORRECTNESS_r02 — all 4 ERRs were exactly the array-output
    // queries), so final schemas must be scalar-only. RegistrySpec
    // enforces this for every declared query.
    QueryDef(
      "agg_collect_list",
      (spark, sf) =>
        Tables.orders(spark, sf)
          .groupBy("o_custkey")
          .agg(array_join(
            transform(array_sort(collect_list(col("o_orderkey"))),
              k => k.cast("string")), ",").as("orderkeys"))
          .orderBy("o_custkey"),
      Some("SELECT o_custkey, array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS orderkeys FROM orders GROUP BY o_custkey ORDER BY o_custkey"),
      scaleNote = "collect_list falls back to ObjectHashAggregate (buffers rows); safe only because group size is bounded (orders per customer). array_sort pins element order — collect order itself is partition-dependent. For unbounded groups, cap with slice() or pre-aggregate."),

    // Boolean/conditional aggregate family: count_if / bool_and /
    // bool_or — the data-quality assertion aggregates (e.g. "every
    // passage has a station id", "any cancelled in this window").
    QueryDef(
      "agg_boolean",
      (spark, sf) =>
        Tables.orders(spark, sf)
          .groupBy("o_orderstatus")
          .agg(
            expr("count_if(o_totalprice > 200000)").as("n_big"),
            expr("bool_and(o_totalprice > 0)").as("all_pos"),
            expr("bool_or(o_orderpriority = '1-URGENT')").as("has_urgent"),
            count(lit(1)).as("n"))
          .orderBy("o_orderstatus"),
      Some("SELECT o_orderstatus, count(*) FILTER (WHERE o_totalprice > 200000) AS n_big, bool_and(o_totalprice > 0) AS all_pos, bool_or(o_orderpriority = '1-URGENT') AS has_urgent, count(*) AS n FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
      scaleNote = "Conditional counts and boolean folds are all associative single-pass aggregates with map-side partials — the corpus-validation pass (every/any invariants over 100 TB) costs one 2-phase agg, never a second scan per assertion."),

    // Nested result-set serialization — the reference's EP3 "nested
    // dicts per station" serializers [P serializers.py, SURVEY §1.3]:
    // per customer, a JSON array of their top-3 orders. Built with
    // collect_list(struct(...)) + MANUAL formatting (concat, not
    // to_json) so key order / whitespace / number rendering are pinned
    // on both engines: order keys render as integers, prices through
    // DECIMAL(18,2)→string ("1234.56" both sides). Element order is
    // pinned by sorting the collected (rank, json) structs.
    QueryDef(
      "nested_json",
      (spark, sf) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(spark, sf)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_custkey"), col("rk"),
            concat(lit("{\"k\":"), col("o_orderkey").cast("string"),
              lit(",\"p\":\""), dec2(col("o_totalprice")).cast("string"),
              lit("\"}")).as("j"))
          .groupBy("o_custkey")
          .agg(concat(lit("["),
            array_join(transform(
              array_sort(collect_list(struct(col("rk"), col("j")))),
              e => e.getField("j")), ","),
            lit("]")).as("top_orders"))
          .orderBy("o_custkey")
      },
      Some("SELECT o_custkey, '[' || string_agg(j, ',' ORDER BY rk) || ']' AS top_orders FROM (SELECT o_custkey, rk, '{\"k\":' || CAST(o_orderkey AS VARCHAR) || ',\"p\":\"' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '\"}' AS j FROM (SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk FROM orders) WHERE rk <= 3) GROUP BY o_custkey ORDER BY o_custkey"),
      scaleNote = "The API-response materialization pattern: WindowGroupLimit prunes to k rows per key during the sort, collect_list buffers only those k structs, and the JSON string is built per group — no driver-side serialization, output is |customers| rows each O(k) bytes. At 100 TB this is exactly how nested per-station boards are emitted to a serving store."),

    // Mode (most frequent value), made tie-deterministic: count per
    // (group, value) then struct-max — bare mode() returns an arbitrary
    // tied value.
    QueryDef(
      "agg_mode",
      (spark, sf) =>
        Tables.lineitem(spark, sf)
          .groupBy("l_returnflag", "l_quantity")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("l_returnflag")
          .agg(max(struct(col("cnt").as("c"), col("l_quantity").as("v")))
            .getField("v").as("mode_qty"))
          .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, (max(struct_pack(c := cnt, v := l_quantity))).v AS mode_qty FROM (SELECT l_returnflag, l_quantity, count(*) AS cnt FROM lineitem GROUP BY 1, 2) GROUP BY l_returnflag ORDER BY l_returnflag"),
      scaleNote = "Two chained hash aggregations, both map-side-combinable; the intermediate is |group×distinct-value| rows, never raw data. Ties resolve to the largest value — deterministic where mode() is not."),

    // Re-aggregatable distinct sketches (DataSketches HLL): build one
    // sketch per group, then UNION the serialized sketches for the
    // rollup row — the two-level pattern that makes distinct counts
    // reaggregatable across dimensions at 100 TB (plain
    // approx_count_distinct partials are not exposed). The estimate
    // itself is engine-specific, so the EMITTED columns are the exact
    // n_orders plus a Spark-computed tolerance verdict (|est − exact|
    // / exact ≤ 5%) the oracle states as TRUE — a sketch regression
    // flips the boolean and fails the driver hash (r2 verdict #8:
    // oracle the sketch path instead of tolerance-testing only).
    QueryDef(
      "agg_hll_sketch",
      (spark, sf) => {
        val o = Tables.orders(spark, sf)
        val perPriority = o
          .groupBy("o_orderpriority")
          .agg(expr("hll_sketch_agg(o_custkey)").as("sk"),
            countDistinct(col("o_custkey")).as("exact_cust"),
            count(lit(1)).as("n_orders"))
        val levels = perPriority
          .select(col("o_orderpriority"), col("n_orders"),
            (abs(expr("hll_sketch_estimate(sk)") - col("exact_cust"))
              .cast("double") / col("exact_cust") <= 0.05).as("est_in_tol"))
        val rollup = perPriority
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"),
            sum(col("n_orders")).as("n_orders"))
          .crossJoin(broadcast(
            o.agg(countDistinct(col("o_custkey")).as("exact_all"))))
          .select(lit("ALL").as("o_orderpriority"), col("n_orders"),
            (abs(col("est") - col("exact_all")).cast("double") /
              col("exact_all") <= 0.05).as("est_in_tol"))
        levels.unionByName(rollup).orderBy("o_orderpriority")
      },
      Some("SELECT o_orderpriority, count(*) AS n_orders, TRUE AS est_in_tol FROM orders GROUP BY o_orderpriority UNION ALL SELECT 'ALL' AS o_orderpriority, count(*) AS n_orders, TRUE AS est_in_tol FROM orders ORDER BY o_orderpriority"),
      scaleNote = "The sketch column IS the reusable artifact: persist per-(dim) sketches once, answer any rollup by unioning KB-sized sketches instead of rescanning 100 TB — the cube-of-distincts pattern. Sketches merge associatively; estimates are read out only at the edge. The exact countDistinct here exists ONLY to oracle the tolerance verdict at test scale; production reads the estimate alone."),

    // Moment statistics via exact sums: variance from (Σx², Σx, n) —
    // the only float ops are two correctly-rounded conversions and
    // three arithmetic steps on identical inputs, so stddev is
    // deterministic cross-engine (native stddev aggregates accumulate
    // in floats, summation-order-dependent). The per-row hot path is
    // PURE LONG arithmetic: x is scaled to exact cents (a long), the
    // square is a long multiply (max ~3.6e15, far under overflow), and
    // only the two SUM buffers are decimal. The r4 formulation
    // multiplied DECIMAL(18,2)×DECIMAL(18,2)→DECIMAL(37,4) per row —
    // precision 37 forces the BigDecimal slow path on every input row
    // and benched 4.4× slower (0.61 s vs 0.14 s at sf0.1); descaling
    // by 10⁴ ONCE PER GROUP after the exact integer sum produces the
    // bit-identical decimal value (T/10⁴ is exact at scale 4, no
    // rounding), so the final double cast matches the oracle's.
    QueryDef(
      "agg_stats",
      (spark, sf) => {
        val D38 = org.apache.spark.sql.types.DecimalType(38, 4)
        val cents = round(col("o_totalprice") * 100).cast("long")
        val sx = (sum(cents.cast("decimal(20,0)")) / 100).cast(D2).cast("double")
        val sxx = (sum((cents * cents).cast("decimal(38,0)")) / 10000)
          .cast(D38).cast("double")
        val n = count(lit(1)).cast("double")
        Tables.orders(spark, sf)
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            round((sxx - sx * sx / n) / n, 4).as("var_pop"),
            round(sqrt((sxx - sx * sx / n) / n), 4).as("stddev_pop"))
          .orderBy("o_orderpriority")
      },
      Some("SELECT o_orderpriority, count(*) AS n, round((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) - CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)) / count(*), 4) AS var_pop, round(sqrt((CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) - CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) * CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)) / count(*)), 4) AS stddev_pop FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
      scaleNote = "Decimal moment sums merge associatively like any sum — variance over 100 TB is one 2-phase agg; no second pass, no float accumulation drift across partitionings (the two-pass 'subtract the mean' formulation would need 2× the scans)."),

    // Pivot: the per-station × per-event-type matrix (wide report
    // shape). Spark pivot leaves empty cells NULL while the oracle's
    // FILTER counts give 0 — coalesce pins the semantics.
    QueryDef(
      "agg_pivot",
      (spark, sf) =>
        Tables.loadEvents(spark, sf)
          .groupBy("user_id")
          .pivot("event_type", Seq("click", "view", "purchase"))
          .count()
          .select(col("user_id"),
            coalesce(col("click"), lit(0L)).as("click"),
            coalesce(col("view"), lit(0L)).as("view"),
            coalesce(col("purchase"), lit(0L)).as("purchase"))
          .orderBy("user_id"),
      Some("SELECT user_id, count(*) FILTER (WHERE event_type = 'click') AS click, count(*) FILTER (WHERE event_type = 'view') AS view, count(*) FILTER (WHERE event_type = 'purchase') AS purchase FROM events GROUP BY user_id ORDER BY user_id"),
      scaleNote = "Pivot with EXPLICIT values compiles to one pass of conditional aggregates (no second job to discover the column set — never omit the value list at scale); output width is bounded by the declared values."),

    // Unpivot/melt: wide → long reshape (the inverse report shape).
    QueryDef(
      "reshape_unpivot",
      (spark, sf) =>
        Tables.orders(spark, sf)
          .select(col("o_orderkey"),
            col("o_totalprice").as("totalprice"),
            col("o_custkey").cast("double").as("custkey"))
          .unpivot(Array(col("o_orderkey")),
            Array(col("totalprice"), col("custkey")), "metric", "val")
          .orderBy("o_orderkey", "metric"),
      Some("SELECT o_orderkey, metric, val FROM (SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders UNION ALL SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders) ORDER BY o_orderkey, metric"),
      scaleNote = "Unpivot is a per-row Expand (k output rows per input row, no shuffle); value columns must share one type, so the cast happens before the reshape."),

    // Approximate quantiles (delay-percentile sketch analog, SURVEY
    // §2.4): approx_percentile's QuantileSummaries sketch merges
    // associatively across partitions — the scalable percentile. The
    // sketch's picked values are engine-specific, so the EMITTED
    // columns are exact n_orders plus Spark-computed tolerance
    // verdicts (approx within 2% of the exact percentile) the oracle
    // states as TRUE — a sketch regression flips a boolean and fails
    // the driver hash (same pattern as agg_hll_sketch). Raw values
    // are additionally bracket-tested in OperatorPropertiesSpec.
    QueryDef(
      "agg_approx_quantile",
      (spark, sf) => {
        def inTol(i: Int) =
          (abs(element_at(col("pcts"), i) - element_at(col("exact"), i)) /
            element_at(col("exact"), i) <= 0.02)
        Tables.orders(spark, sf)
          .groupBy("o_orderpriority")
          .agg(
            percentile_approx(col("o_totalprice"),
              array(lit(0.5), lit(0.95), lit(0.99)), lit(1000)).as("pcts"),
            expr("percentile(o_totalprice, array(0.5D, 0.95D, 0.99D))").as("exact"),
            count(lit(1)).as("n_orders"))
          .select(col("o_orderpriority"), col("n_orders"),
            inTol(1).as("p50_in_tol"), inTol(2).as("p95_in_tol"),
            inTol(3).as("p99_in_tol"))
          .orderBy("o_orderpriority")
      },
      Some("SELECT o_orderpriority, count(*) AS n_orders, TRUE AS p50_in_tol, TRUE AS p95_in_tol, TRUE AS p99_in_tol FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
      scaleNote = "QuantileSummaries partials are fixed-size regardless of row count and merge associatively — percentiles over 100 TB shuffle KB per partition. accuracy=1000 bounds rank error at 1/1000. The exact percentile (global-sort class) exists ONLY to oracle the verdict at test scale; production reads the sketch alone."),

    // #57 — approximate distinct (HLL++). The estimate is engine-
    // specific, so emit the exact distinct plus a Spark-computed
    // tolerance verdict the oracle states as TRUE (pattern shared with
    // agg_hll_sketch / agg_approx_quantile): the driver hash now
    // guards the HLL++ path instead of a rows-only check.
    QueryDef(
      "agg_approx_hll",
      (spark, sf) =>
        Tables.orders(spark, sf)
          .groupBy("o_orderpriority")
          .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_cust"),
            countDistinct(col("o_custkey")).as("n_cust"))
          .select(col("o_orderpriority"), col("n_cust"),
            (abs(col("approx_cust") - col("n_cust")).cast("double") /
              col("n_cust") <= 0.05).as("est_in_tol"))
          .orderBy("o_orderpriority"),
      Some("SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, TRUE AS est_in_tol FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"),
      scaleNote = "HLL++ sketches merge associatively: map-side partials are fixed-size (KB) regardless of input rows, so 100 TB of keys costs the same shuffle as 1 GB. rsd=0.02 trades 2% error for a ~4KB sketch. This is the distinct-train counter at scale. The exact countDistinct exists ONLY to oracle the tolerance verdict at test scale; production reads the estimate alone."),

    // Count-Min sketch: the mergeable point-frequency summary
    // (frequency analog of the HLL distinct sketch; completes the
    // sketch family with agg_hll_sketch and agg_heavy_hitters).
    // Unlike those two, every piece here is EXACT integer arithmetic
    // on md5-derived buckets both engines compute identically, so the
    // whole d×w matrix and the estimates are hard-oracled — no
    // tolerance verdict needed. The CMS guarantee (est ≥ true count)
    // is emitted as a column the oracle also derives.
    QueryDef(
      "agg_cms_sketch",
      (spark, sf) =>
        cmsPointEstimates(Tables.loadEvents(spark, sf), "event_type", 4, 32)
          .select(col("event_type"), col("exact_n"), col("cms_est"),
            (col("cms_est") >= col("exact_n")).as("no_undercount"))
          .orderBy("event_type"),
      Some("WITH params AS (SELECT unnest([0,1,2,3]) AS i), cells AS (SELECT i, ('0x'||substr(md5(event_type),1+8*i,8))::BIGINT % 32 AS b, count(*) AS c FROM events CROSS JOIN params GROUP BY 1,2), keys AS (SELECT event_type, count(*) AS exact_n FROM events GROUP BY 1) SELECT k.event_type, k.exact_n, min(c.c) AS cms_est, min(c.c) >= k.exact_n AS no_undercount FROM keys k CROSS JOIN params p JOIN cells c ON c.i = p.i AND c.b = ('0x'||substr(md5(k.event_type),1+8*p.i,8))::BIGINT % 32 GROUP BY 1,2 ORDER BY 1"),
      scaleNote = "The sketch is a fixed d×w integer matrix (128 cells here) built by one map-side-combined count — partials merge by cell-wise addition, so 100 TB of events shuffles d×w longs per partition no matter the key cardinality; the build never holds per-key state (contrast agg_heavy_hitters' O(k) candidate map). Point estimates are d broadcast-joined lookups. Width w bounds overcount at 2N/w with probability 1−2^−d; size the matrix, not the data. The md5 buckets exist for cross-engine oracling — production swaps in xxhash64 (cheaper, same layout)."),

    // Exact distributed median + nearest-rank p90, interpolation-free:
    // the two middle order statistics are selected by row_number and
    // averaged in exact DECIMAL (only ever /1 or /2 — at most 3
    // decimal digits, no float interpolation), p90 is the single
    // element at rank ceil(0.9·n). Complements agg_approx_quantile:
    // that one is the production sketch, this one the exact answer —
    // and the pair documents the exactness/scalability trade.
    QueryDef(
      "agg_median_exact",
      (spark, sf) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy("o_totalprice", "o_orderkey")
        val ww = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
        Tables.orders(spark, sf)
          .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(ww))
          .groupBy("o_orderpriority")
          .agg(
            max(col("n")).as("n_orders"),
            // odd n: (n+1)/2 == (n+2)/2 → the single middle row matches
            // both predicates once; even n: the two middle rows sum
            sum(when(col("rn") === expr("(n + 1) div 2") ||
                col("rn") === expr("(n + 2) div 2"),
              col("o_totalprice").cast(D4))).as("msum"),
            max(when(col("rn") === expr("(9 * n + 9) div 10"),
              col("o_totalprice"))).as("p90v"))
          .select(col("o_orderpriority"), col("n_orders"),
            (col("msum") / when(col("n_orders") % 2 === 1, 1).otherwise(2))
              .cast(D4).cast("double").as("median"),
            dec2(col("p90v")).cast("double").as("p90"))
          .orderBy("o_orderpriority")
      },
      Some("WITH t AS (SELECT o_orderpriority, o_totalprice, row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn, count(*) OVER (PARTITION BY o_orderpriority) AS n FROM orders) SELECT o_orderpriority, max(n) AS n_orders, CAST(CAST(sum(CASE WHEN rn = (n+1)//2 OR rn = (n+2)//2 THEN CAST(o_totalprice AS DECIMAL(18,4)) END) / (CASE WHEN max(n) % 2 = 1 THEN 1 ELSE 2 END) AS DECIMAL(18,4)) AS DOUBLE) AS median, CAST(CAST(max(CASE WHEN rn = (9*n+9)//10 THEN o_totalprice END) AS DECIMAL(18,2)) AS DOUBLE) AS p90 FROM t GROUP BY 1 ORDER BY 1"),
      scaleNote = "Exact rank selection needs a total order per group — here row_number shards by the 5-value priority key, so each group funnels through one sort chain: fine at test scale, the known bottleneck at 100 TB. The scale path is documented by the pair: agg_approx_quantile's mergeable sketch for production, or (when exactness is required) the two-pass histogram narrowing — a first pass builds a value-bucket CDF from map-side counts, identifies the ~1/w-wide bucket containing the target rank, and a second pass sorts only that bucket. The median arithmetic itself is float-free (DECIMAL midpoint, /1 or /2), so the answer is layout-independent wherever the rank is computed."),

    // CHAR-WEIGHTED exact median (r13) — the quantile a corpus
    // report actually needs beside the doc-count one: "the median
    // DOCUMENT is 800 chars" and "the median CHARACTER lives in a
    // 3000-char document" are different facts (long docs carry most
    // of the training mass), and token-budget decisions key on the
    // second. Both medians from ONE value-grouped cumulative pass:
    // group docs by (lang, n_chars), cumulative doc-count and
    // cumulative char-mass over the value-ordered grid, each median
    // = the first value where twice the cumulative crosses the
    // total (the weighted generalization of the rank rule —
    // agg_median_exact's device with weight = the value itself;
    // any weight column substitutes). Exact integers end to end,
    // zero floats anywhere.
    QueryDef(
      "agg_median_weighted",
      (spark, sf) => {
        val g = Tables.documents(spark, sf)
          .groupBy(col("lang"), col("n_chars"))
          .agg(count(lit(1)).as("c"))
        val wseq = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("n_chars")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        val ww = org.apache.spark.sql.expressions.Window
          .partitionBy("lang")
        g.withColumn("cumc", sum(col("c")).over(wseq))
          .withColumn("cumw", sum(col("c") * col("n_chars")).over(wseq))
          .withColumn("totc", sum(col("c")).over(ww))
          .withColumn("totw", sum(col("c") * col("n_chars")).over(ww))
          .groupBy("lang")
          .agg(max(col("totc")).as("n_docs"),
            max(col("totw")).as("total_chars"),
            min(when(lit(2L) * col("cumc") >= col("totc"),
              col("n_chars"))).as("median_chars"),
            min(when(lit(2L) * col("cumw") >= col("totw"),
              col("n_chars"))).as("char_weighted_median_chars"))
          .orderBy("lang")
      },
      Some("WITH g AS (SELECT lang, n_chars, count(*) AS c FROM documents GROUP BY 1, 2), " +
        "w AS (SELECT lang, n_chars, " +
        "CAST(sum(c) OVER win AS BIGINT) AS cumc, " +
        "CAST(sum(c * n_chars) OVER win AS BIGINT) AS cumw, " +
        "CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS totc, " +
        "CAST(sum(c * n_chars) OVER (PARTITION BY lang) AS BIGINT) AS totw " +
        "FROM g WINDOW win AS (PARTITION BY lang ORDER BY n_chars ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) " +
        "SELECT lang, max(totc) AS n_docs, max(totw) AS total_chars, " +
        "min(CASE WHEN 2 * cumc >= totc THEN n_chars END) AS median_chars, " +
        "min(CASE WHEN 2 * cumw >= totw THEN n_chars END) AS char_weighted_median_chars " +
        "FROM w GROUP BY 1 ORDER BY 1"),
      scaleNote = "The value-grouped grid is the scale device: the " +
        "window's input is |langs|·|distinct lengths| rows (bounded " +
        "by the value domain, NOT the corpus — documents collapse " +
        "map-side in the first aggregate), so the per-group sort " +
        "chain that makes raw-row exact medians expensive at 100 TB " +
        "never sees corpus-sized data. Ties need no tiebreak: equal " +
        "values are one grid row, and the crossing rule reads the " +
        "cumulative AT the value. The weighted median generalizes " +
        "to any weight column (quality score, sample weight — " +
        "dedup_soft_weights' member_w_ppm composes directly) and to " +
        "any quantile (2·cum ≥ tot → 10·cum ≥ 9·tot for p90). All " +
        "integer comparisons — the report is bit-identical on any " +
        "layout."),

    // Bloom filter membership as a declared, hard-oracled query:
    // m=8192 bits, k=3 md5-slice hashes (agg_cms_sketch's digest
    // trick), built over the high-value customer set and probed with
    // every customer. Both engines derive the identical bit set, so
    // set bits, positives, false positives and the observed FPR are
    // all exact — and the Bloom contract (zero false negatives) is
    // emitted as a verdict column. Completes the sketch family: HLL
    // (distinct) / MG (top-k) / CMS (frequency) / Bloom (membership).
    QueryDef(
      "agg_bloom_filter",
      (spark, sf) => {
        val m = 8192
        def positions(df: org.apache.spark.sql.DataFrame, key: String) = df
          .withColumn("dg", md5(col(key).cast("string")))
          .select(col(key), explode(array((0 until 3).map(i =>
            cmsBucket(col("dg"), i, m)): _*)).as("pos"))
          .distinct()
        val keys = Tables.orders(spark, sf)
          .filter(col("o_totalprice") > 495000)
          .select(col("o_custkey")).distinct()
        val bits = positions(keys, "o_custkey").select("pos").distinct()
        val probes = positions(
          Tables.customer(spark, sf).select("c_custkey"), "c_custkey")
        // a key's k positions may collide with each other, so "all set"
        // is count-of-DISTINCT-positions == hits, not hits == k
        val perKey = probes
          .join(broadcast(bits.withColumn("hit", lit(1))), Seq("pos"), "left")
          .groupBy("c_custkey")
          .agg(count(lit(1)).as("npos"), count(col("hit")).as("nhit"))
          .withColumn("bloom_pos", col("npos") === col("nhit"))
        perKey
          .join(broadcast(keys.withColumnRenamed("o_custkey", "c_custkey")
            .withColumn("member", lit(true))), Seq("c_custkey"), "left")
          .withColumn("member", coalesce(col("member"), lit(false)))
          .agg(
            count(lit(1)).as("n_probe"),
            sum(when(col("member"), 1L).otherwise(0L)).as("n_members"),
            sum(when(col("bloom_pos"), 1L).otherwise(0L)).as("n_bloom_pos"),
            sum(when(col("bloom_pos") && !col("member"), 1L).otherwise(0L))
              .as("n_false_pos"),
            (sum(when(col("member") && !col("bloom_pos"), 1L).otherwise(0L)) === 0)
              .as("no_false_neg"))
          .select(col("n_probe"), col("n_members"), col("n_bloom_pos"),
            col("n_false_pos"), col("no_false_neg"),
            round(col("n_false_pos").cast("double") /
              (col("n_probe") - col("n_members")), 4).as("fpr"))
      },
      Some("WITH ks AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 495000), sl AS (SELECT unnest([0,1,2]) AS i), bits AS (SELECT DISTINCT ('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1+8*i,8))::BIGINT % 8192 AS pos FROM ks CROSS JOIN sl), pr AS (SELECT DISTINCT c_custkey, ('0x'||substr(md5(CAST(c_custkey AS VARCHAR)),1+8*i,8))::BIGINT % 8192 AS pos FROM customer CROSS JOIN sl), pk AS (SELECT pr.c_custkey, count(*) AS npos, count(bits.pos) AS nhit FROM pr LEFT JOIN bits ON pr.pos = bits.pos GROUP BY 1), fl AS (SELECT pk.c_custkey, pk.npos = pk.nhit AS bloom_pos, ks.o_custkey IS NOT NULL AS member FROM pk LEFT JOIN ks ON pk.c_custkey = ks.o_custkey) SELECT count(*) AS n_probe, count(*) FILTER (WHERE member) AS n_members, count(*) FILTER (WHERE bloom_pos) AS n_bloom_pos, count(*) FILTER (WHERE bloom_pos AND NOT member) AS n_false_pos, count(*) FILTER (WHERE member AND NOT bloom_pos) = 0 AS no_false_neg, round(CAST(count(*) FILTER (WHERE bloom_pos AND NOT member) AS DOUBLE) / (count(*) - count(*) FILTER (WHERE member)), 4) AS fpr FROM fl"),
      scaleNote = "The filter is m bits REGARDLESS of corpus size — the set-bit table is capped at m rows (8 KB here) however many keys feed it, built by one map-side-combined distinct and broadcast to every probe task, so probing is map-only: no shuffle of the probe side ever. That is the point of a Bloom filter at 100 TB — ship the 8 KB, not the key set — and it is the same mechanism Spark's own runtime injection uses (bloom_filter_agg/might_contain, proven firing in ExtensionsSpec); this declared query exists to hash-prove the semantics cross-engine, FPR included. Size m ≈ 1.44·n·log2(1/p) and k ≈ 0.7·m/n for target FPR p; the md5 slices exist for oracling, production uses xxhash64."),

    // Shannon entropy of the per-source language distribution — the
    // corpus-mix diagnostic (a source whose entropy collapses is
    // mono-language; the corpus_mix rebalancer's input signal). The
    // algebraic form H = ln(n) − Σ c·ln(c) / n keeps every term a
    // product of an exact integer count and one ln() call — no
    // per-row probability division — and the ≤|langs| float terms
    // make the final round(4) engine-stable.
    QueryDef(
      "agg_entropy",
      (spark, sf) => {
        Tables.documents(spark, sf)
          .groupBy("source", "lang").agg(count(lit(1)).as("c"))
          .groupBy("source")
          .agg(sum(col("c")).as("n_docs"),
            count(lit(1)).as("n_langs"),
            round(log(sum(col("c")))
              - sum(col("c").cast("double") * log(col("c")))
                / sum(col("c")), 4).as("lang_entropy"))
          .orderBy("source")
      },
      Some("WITH c AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2) " +
        "SELECT source, CAST(sum(c) AS BIGINT) AS n_docs, count(*) AS n_langs, " +
        "round(ln(sum(c)) - sum(CAST(c AS DOUBLE) * ln(c)) / sum(c), 4) AS lang_entropy " +
        "FROM c GROUP BY source ORDER BY source"),
      scaleNote = "Two map-side-combinable aggs: the corpus collapses " +
        "to |source|×|lang| counts in the first exchange (KB-sized " +
        "however big the input), and the entropy reduction runs over " +
        "that tiny table — the 100 TB cost is exactly one combined " +
        "count shuffle. The log-sum form never materializes " +
        "probabilities, so no per-row float division order matters; " +
        "entropy over value distributions (not just lang) is the " +
        "same plan with the group key swapped, and the per-key count " +
        "table is reusable across diagnostics (skew_diagnose shares " +
        "its first exchange shape)."),

    // Equi-width histogram per group — the numeric-profile diagnostic
    // behind data-quality dashboards and join-size estimation. The
    // bucket id is floor(price / width): floor of one IEEE double
    // division is bit-identical on both engines, and everything after
    // it is integer counting plus one exact decimal sum.
    QueryDef(
      "agg_histogram",
      (spark, sf) =>
        Tables.orders(spark, sf)
          .groupBy(col("o_orderpriority"),
            floor(col("o_totalprice") / 20000).cast("long").as("bucket"))
          .agg(count(lit(1)).as("cnt"),
            sumDec2(col("o_totalprice")).cast("double").as("sum_price"))
          .orderBy("o_orderpriority", "bucket"),
      Some("SELECT o_orderpriority, CAST(floor(o_totalprice / 20000) AS BIGINT) AS bucket, " +
        "count(*) AS cnt, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
        "FROM orders GROUP BY 1, 2 ORDER BY 1, 2"),
      scaleNote = "A plain map-side-combined hash agg on a COMPUTED " +
        "key: the wire carries |groups|×|buckets| partials however " +
        "large the input, and the bucket function is codegen'd scalar " +
        "math inside the scan stage. Equi-width needs no pre-pass; " +
        "equi-depth buckets come from agg_approx_quantile's sketch " +
        "feeding the same plan as boundary literals. This is the " +
        "histogram a CBO ingests for selectivity, produced by the " +
        "engine it serves."),

    // Day-presence bitmap per user: 64-day activity window packed
    // into ONE BIGINT via bit_or — the roaring-bitmap idea at its
    // smallest useful size. bit_or is associative/commutative, so the
    // mask builds map-side like any sum; popcount recovers distinct
    // active days without a countDistinct, and mask intersection
    // (a & b) answers co-activity questions no distinct-count
    // rollup can.
    QueryDef(
      "agg_bitmap_presence",
      (spark, sf) =>
        Tables.loadEvents(spark, sf)
          .select(col("user_id"),
            datediff(col("ts").cast("date"),
              lit("2024-01-01").cast("date")).as("d"))
          // the anchored 64-day window is the op's contract (one
          // BIGINT); the filter is mirrored in the oracle
          .filter(col("d") >= 0 && col("d") < 64)
          .groupBy("user_id")
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(d AS INT)))")
            .as("day_bits"))
          .withColumn("n_days", expr("CAST(bit_count(day_bits) AS BIGINT)"))
          .orderBy("user_id"),
      Some("SELECT user_id, bit_or(1::BIGINT << date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::INT) AS day_bits, " +
        "CAST(bit_count(bit_or(1::BIGINT << date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::INT)) AS BIGINT) AS n_days " +
        "FROM events WHERE date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) BETWEEN 0 AND 63 " +
        "GROUP BY user_id ORDER BY user_id"),
      scaleNote = "The event log collapses to 8 bytes per (user, " +
        "64-day window) in the map-side partials — bit_or partials " +
        "merge associatively like sums, so the wire carries masks, " +
        "never day lists, and the agg is skew-immune (a hot user is " +
        "still one mask). Longer horizons shard into an array of " +
        "window masks (epoch div 64 as a second group key) — the " +
        "fixed-width building block of every bitmap index. Retention/" +
        "co-activity queries become popcounts of mask ANDs over the " +
        "compacted table: retention_cohort_approx's question at 1/50th " +
        "the state of its HLL sketches, exactly, when the horizon is " +
        "bounded."),

    // Winsorized (clipped-tail) robust aggregate per group: exact
    // rank-selected p05/p95 thresholds (agg_median_exact's rank
    // machinery — NO float interpolation, so no cross-engine quantile
    // semantics in play), tails counted and clamped to the threshold
    // value, midrange summed in exact decimal. The one float compose
    // is the final 3-term sum, written identically on both engines.
    QueryDef(
      "agg_winsorize",
      (spark, sf) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
          .orderBy("o_totalprice", "o_orderkey")
        val ww = org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderpriority")
        val th = Tables.orders(spark, sf)
          .select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(ww))
          .filter(col("rn") === expr("(n + 19) div 20") ||
            col("rn") === expr("(19 * n + 19) div 20"))
          .groupBy("o_orderpriority")
          .agg(
            min(when(col("rn") === expr("(n + 19) div 20"),
              col("o_totalprice"))).as("lo"),
            max(when(col("rn") === expr("(19 * n + 19) div 20"),
              col("o_totalprice"))).as("hi"))
        Tables.orders(spark, sf)
          .join(broadcast(th), "o_orderpriority")
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("o_totalprice") < col("lo"), 1).otherwise(0)).as("n_low"),
            sum(when(col("o_totalprice") > col("hi"), 1).otherwise(0)).as("n_high"),
            sumDec2(when(col("o_totalprice") >= col("lo") &&
                col("o_totalprice") <= col("hi"), col("o_totalprice"))
              .otherwise(lit(0))).as("mid"),
            min(col("lo")).as("lo"), min(col("hi")).as("hi"))
          .select(col("o_orderpriority"), col("n"), col("n_low"), col("n_high"),
            col("lo"), col("hi"),
            round(col("n_low") * col("lo") + col("n_high") * col("hi") +
              col("mid").cast("double"), 2).as("winsorized_sum"))
          .orderBy("o_orderpriority")
      },
      Some("WITH t AS (SELECT o_orderpriority, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn, " +
        "count(*) OVER (PARTITION BY o_orderpriority) AS n FROM orders), " +
        "th AS (SELECT o_orderpriority, min(CASE WHEN rn = (n+19)//20 THEN o_totalprice END) AS lo, " +
        "max(CASE WHEN rn = (19*n+19)//20 THEN o_totalprice END) AS hi FROM t " +
        "WHERE rn = (n+19)//20 OR rn = (19*n+19)//20 GROUP BY 1), " +
        "g AS (SELECT o.o_orderpriority AS o_orderpriority, count(*) AS n, " +
        "CAST(sum(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low, " +
        "CAST(sum(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high, " +
        "CAST(sum(CASE WHEN o_totalprice >= lo AND o_totalprice <= hi THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS mid, " +
        "min(lo) AS lo, min(hi) AS hi FROM orders o JOIN th USING (o_orderpriority) GROUP BY 1) " +
        "SELECT o_orderpriority, n, n_low, n_high, lo, hi, " +
        "round(n_low * lo + n_high * hi + CAST(mid AS DOUBLE), 2) AS winsorized_sum " +
        "FROM g ORDER BY 1"),
      scaleNote = "Pass 1 (thresholds) carries agg_median_exact's " +
        "known total-order cost and its documented scale path (sketch " +
        "thresholds, or two-pass histogram narrowing — winsorizing is " +
        "robust to approximate thresholds BY DESIGN, so the sketch " +
        "swap is principled here, unlike exact-median). Pass 2 is a " +
        "plain map-side-combined agg against the broadcast |groups|-" +
        "row threshold table: tails collapse to counts × the " +
        "threshold value, the midrange to one exact decimal sum — " +
        "layout-independent at any scale. This is the outlier guard " +
        "every per-source quality rollup wants before averaging " +
        "(one pathological doc shouldn't move a source's mean)."),

    // Exact INTERPOLATED percentiles (percentile_cont semantics) per
    // group — the continuous counterpart of agg_median_exact's
    // rank-select and agg_approx_quantile's sketch. Cross-engine float
    // interpolation is normally a hash hazard; it is exact here BY
    // CONSTRUCTION: inputs are integer cents (≤ 2^27, exactly
    // representable), quartile positions have dyadic fractions
    // {0, ¼, ½, ¾}, so lower + (upper−lower)·frac is computed without
    // a single rounding on either engine and the result (an integer
    // plus a quarter) is itself exactly representable. Output stays
    // in cents — dividing by 100 would reintroduce rounding.
    QueryDef(
      "agg_percentile_cont",
      (spark, sf) =>
        Tables.orders(spark, sf)
          .select(col("o_orderpriority"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .groupBy("o_orderpriority")
          .agg(
            count(lit(1)).as("n"),
            expr("percentile(cents, 0.25)").as("p25_cents"),
            expr("percentile(cents, 0.5)").as("p50_cents"),
            expr("percentile(cents, 0.75)").as("p75_cents"))
          .orderBy("o_orderpriority"),
      Some("SELECT o_orderpriority, count(*) AS n, quantile_cont(cents, 0.25) AS p25_cents, quantile_cont(cents, 0.5) AS p50_cents, quantile_cont(cents, 0.75) AS p75_cents FROM (SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders) GROUP BY 1 ORDER BY 1"),
      scaleNote = "Spark's exact percentile() aggregates a per-group " +
        "value→count map (map-side combinable; state is |distinct " +
        "values| per group, not |rows|) and rank-walks it once at " +
        "merge — fine while distinct cents per group fit an executor, " +
        "which money-grained data eventually breaks. The 100 TB path " +
        "is agg_approx_quantile's KLL/GK sketch for dashboards, or " +
        "agg_median_exact's two-pass histogram narrowing when the " +
        "exact value is contractual. The interpolation itself adds " +
        "nothing to the plan — it runs on the driver-side walk."),

    // Pearson correlation per group, hash-stable: built-in corr() is
    // a float-accumulation order lottery across engines, so the five
    // moments are summed EXACTLY instead — integer cents, products in
    // int64/int128 range, sums in DECIMAL(38,0)/HUGEINT — and the
    // classic (n·Σxy − ΣxΣy) / √(n·Σxx − Σx²) / √(n·Σyy − Σy²)
    // compose is the only float code, identical IEEE ops on identical
    // exact inputs on both engines.
    QueryDef(
      "agg_corr",
      (spark, sf) => {
        import org.apache.spark.sql.types.DecimalType
        val d = DecimalType(24, 0)
        val li = Tables.lineitem(spark, sf)
          .select(col("l_returnflag"),
            round(col("l_quantity") * 100).cast("long").as("xc"),
            round(col("l_extendedprice") * 100).cast("long").as("yc"))
        li.groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("n"),
            sum(col("xc").cast(d)).as("sx"),
            sum(col("yc").cast(d)).as("sy"),
            sum((col("xc") * col("yc")).cast(d)).as("sxy"),
            sum((col("xc") * col("xc")).cast(d)).as("sxx"),
            sum((col("yc") * col("yc")).cast(d)).as("syy"))
          .select(col("l_returnflag"), col("n"),
            round(
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
                (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
                  sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))),
              4).as("corr_qty_price"))
          .orderBy("l_returnflag")
      },
      Some("SELECT l_returnflag, n, round(CAST(n*sxy - sx*sy AS DOUBLE) / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 4) AS corr_qty_price FROM (SELECT l_returnflag, count(*) AS n, sum(xc) AS sx, sum(yc) AS sy, sum(xc*yc) AS sxy, sum(xc*xc) AS sxx, sum(yc*yc) AS syy FROM (SELECT l_returnflag, CAST(round(l_quantity * 100) AS BIGINT) AS xc, CAST(round(l_extendedprice * 100) AS BIGINT) AS yc FROM lineitem) GROUP BY 1) ORDER BY 1"),
      scaleNote = "One map-side-combined hash agg carrying six exact " +
        "integer partials — the same wire cost as a sum, skew-immune, " +
        "associative, and mergeable across days (store the six moments " +
        "per partition and corr over ANY row subset is a constant-time " +
        "compose — agg_incremental_merge's pattern). Decimal(24) " +
        "partials give ~10^24 headroom: at 100 TB the per-group sums " +
        "reach ~10^21, still exact; the final compose is driver-side " +
        "arithmetic on |groups| rows."),

    // One-way ANOVA (r11) — the k-group omnibus for a CONTINUOUS
    // metric, completing the square the A/B family left open
    // (ab_test_chi2 is the k-group omnibus for RATES; welch is the
    // 2-group mean test; this is the k-group mean test that gates
    // pairwise fishing the same way chi2 does): does purchase value
    // differ across event types at all? Sums of squares stay EXACT:
    // the textbook SSB/SSW need Σ_g s_g²/n_g — a float sum whose
    // order would float with partitioning — so each group's term is
    // the floor-divided integer (s_g² div n_g, cents²; ≤ 1 cents²
    // truncation per group, identically on both engines), and SSB/
    // SSW compose from integer sums. F and the fixed-α verdict are
    // one edge expression; the critical value is a stated literal
    // (a quantile lookup, not data): 2.45 ≈ F₀.₀₅(4, 120), chosen
    // CONSERVATIVE — finite-df₂ critical values exceed the ∞-row's
    // 2.37, so comparing against 2.45 under-rejects slightly rather
    // than over-rejecting at any df₂ ≥ 120 (every tested scale).
    QueryDef(
      "agg_anova",
      (spark, sf) => {
        val g = Tables.loadEvents(spark, sf)
          .select(col("event_type"),
            floor(col("value") * 100).cast("long").as("v"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
            sum(col("v") * col("v")).as("ss"))
          .withColumn("term", expr("(s * s) div n"))
        val one = g.agg(count(lit(1)).as("k"), sum(col("n")).as("nt"),
          sum(col("s")).as("st"), sum(col("ss")).as("sst"),
          sum(col("term")).as("tsum"))
        def d(c: org.apache.spark.sql.Column) = c.cast("double")
        val ssb = col("tsum") - expr("(st * st) div nt")
        val ssw = col("sst") - col("tsum")
        val f = (d(ssb) / d(col("k") - 1)) / (d(ssw) / d(col("nt") - col("k")))
        val ok = col("k") > 1 && col("nt") > col("k") && ssw > 0L
        one.select(col("k").as("n_groups"), col("nt").as("n_total"),
          ssb.as("ssb_c2"), ssw.as("ssw_c2"),
          (col("k") - 1).as("df1"), (col("nt") - col("k")).as("df2"),
          when(ok, round(f, 4)).as("f_stat"),
          coalesce(when(ok, f > lit(2.45)), lit(false)).as("significant"))
      },
      Some("WITH ev AS (SELECT event_type, CAST(floor(value*100) AS BIGINT) AS v FROM events), " +
        "g AS (SELECT event_type, count(*) AS n, CAST(sum(v) AS BIGINT) AS s, CAST(sum(v*v) AS BIGINT) AS ss FROM ev GROUP BY 1), " +
        "t AS (SELECT event_type, n, s, ss, (s * s) // n AS term FROM g), " +
        "one AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nt, CAST(sum(s) AS BIGINT) AS st, " +
        "CAST(sum(ss) AS BIGINT) AS sst, CAST(sum(term) AS BIGINT) AS tsum FROM t), " +
        "f AS (SELECT *, tsum - (st * st) // nt AS ssb, sst - tsum AS ssw FROM one), " +
        "h AS (SELECT *, (CAST(ssb AS DOUBLE)/CAST(k - 1 AS DOUBLE)) / (CAST(ssw AS DOUBLE)/CAST(nt - k AS DOUBLE)) AS fs, " +
        "k > 1 AND nt > k AND ssw > 0 AS ok FROM f) " +
        "SELECT k AS n_groups, nt AS n_total, ssb AS ssb_c2, ssw AS ssw_c2, " +
        "CAST(k - 1 AS BIGINT) AS df1, nt - k AS df2, " +
        "CASE WHEN ok THEN round(fs, 4) END AS f_stat, " +
        "coalesce(CASE WHEN ok THEN fs > 2.45 END, false) AS significant " +
        "FROM h"),
      scaleNote = "Two map-side-combined aggregates: the log " +
        "collapses to |groups| exact (n, Σv, Σv²) triples, those to " +
        "ONE row — ab_test_welch's economics at k groups. The " +
        "integer-term trick (s² div n per group, ≤ 1 cents² floor " +
        "loss, identical both engines) is what keeps the sums of " +
        "squares order-independent where the textbook float Σ s²/n " +
        "is a partition lottery; s² needs DECIMAL(38,0) past " +
        "~3·10⁹ group-sum cents (agg_corr's escalation — the house " +
        "fence). The omnibus gates pairwise welch tests exactly as " +
        "ab_test_chi2 gates pairwise z-tests: one significant F " +
        "licenses k·(k−1)/2 comparisons without α inflation."),

    // Skewness + excess kurtosis per group — agg_corr's exact-moment
    // discipline extended to the 3rd/4th powers: built-in skewness()/
    // kurtosis() float-accumulate in partition order (a hash lottery
    // across engines AND across partitionings), so the four raw
    // moments are summed exactly as integers (quantity cents ≤ 5000
    // ⇒ x⁴ ≤ 6.25e14 fits a LONG product; DECIMAL(38,0)/HUGEINT
    // sums) and the population-moment compose is the only float
    // code — written with IDENTICAL association order in both
    // engines, rounded to 4.
    QueryDef(
      "agg_skew_kurtosis",
      (spark, sf) => {
        import org.apache.spark.sql.types.DecimalType
        val d = DecimalType(28, 0)
        val x = col("x")
        val a = Tables.lineitem(spark, sf)
          .select(col("l_returnflag"),
            round(col("l_quantity") * 100).cast("long").as("x"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"),
            sum(x.cast(d)).as("s1"),
            sum((x * x).cast(d)).as("s2"),
            sum((x * x * x).cast(d)).as("s3"),
            sum((x * x * x * x).cast(d)).as("s4"))
        val m = col("s1").cast("double") / col("n")
        val q2 = col("s2").cast("double") / col("n")
        val q3 = col("s3").cast("double") / col("n")
        val q4 = col("s4").cast("double") / col("n")
        a.select(col("l_returnflag"), col("n"),
            m.as("m"), q2.as("q2"), q3.as("q3"), q4.as("q4"))
          .withColumn("v", col("q2") - col("m") * col("m"))
          .select(col("l_returnflag"), col("n"),
            round((col("q3") - lit(3) * col("m") * col("q2") +
              lit(2) * col("m") * col("m") * col("m")) /
              (col("v") * sqrt(col("v"))), 4).as("skewness"),
            round((col("q4") - lit(4) * col("m") * col("q3") +
              lit(6) * col("m") * col("m") * col("q2") -
              lit(3) * col("m") * col("m") * col("m") * col("m")) /
              (col("v") * col("v")) - lit(3), 4).as("kurtosis_excess"))
          .orderBy("l_returnflag")
      },
      Some("WITH b AS (SELECT l_returnflag, CAST(round(l_quantity * 100) AS BIGINT) AS x FROM lineitem), " +
        "a AS (SELECT l_returnflag, count(*) AS n, sum(x) AS s1, sum(x*x) AS s2, sum(x*x*x) AS s3, sum(x*x*x*x) AS s4 FROM b GROUP BY 1), " +
        "d AS (SELECT l_returnflag, n, CAST(s1 AS DOUBLE)/n AS m, CAST(s2 AS DOUBLE)/n AS q2, CAST(s3 AS DOUBLE)/n AS q3, CAST(s4 AS DOUBLE)/n AS q4 FROM a), " +
        "v AS (SELECT *, q2 - m*m AS v FROM d) " +
        "SELECT l_returnflag, n, round((q3 - 3*m*q2 + 2*m*m*m) / (v * sqrt(v)), 4) AS skewness, " +
        "round((q4 - 4*m*q3 + 6*m*m*q2 - 3*m*m*m*m) / (v*v) - 3, 4) AS kurtosis_excess " +
        "FROM v ORDER BY 1"),
      scaleNote = "Identical wire shape to agg_corr: one map-side-" +
        "combined agg carrying five exact integer partials per group " +
        "— associative, skew-immune, and MERGEABLE (store the raw " +
        "moments per day-partition; any date-range's skew/kurtosis " +
        "is a constant-time re-compose, no rescan — the moment-" +
        "sketch pattern). Headroom: DECIMAL(38) holds Σx⁴ up to " +
        "~10^23 rows of 4-digit cents; wider values first clamp " +
        "through agg_winsorize's thresholds, which a 4th moment " +
        "needs anyway (kurtosis is the statistic outliers destroy)."),

    // Weighted mean — the unit-price statistic avg() silently gets
    // wrong (the mean of per-line prices is not the mean price PAID;
    // big orders must weigh more): Σ(price·qty)/Σqty with the
    // numerator an exact DECIMAL product-sum (order-free) and ONE
    // correctly-rounded division per group at the edge. The same
    // shape serves revenue-weighted delay, token-weighted loss, and
    // every other "per-unit" KPI.
    QueryDef(
      "agg_weighted_avg",
      (spark, sf) =>
        Tables.lineitem(spark, sf)
          .groupBy("l_returnflag")
          .agg(
            sum(col("l_quantity").cast("long")).as("total_qty"),
            sum(Dsl.dec2(col("l_extendedprice")) *
              col("l_quantity").cast("long")).cast(Dsl.D2).as("wsum"),
            round(avg(Dsl.dec2(col("l_extendedprice"))), 4).as("naive_avg_price"))
          .select(col("l_returnflag"), col("total_qty"),
            col("wsum").cast("double").as("weighted_sum"),
            round(col("wsum").cast("double") / col("total_qty"), 4)
              .as("weighted_avg_price"),
            col("naive_avg_price").cast("double").as("naive_avg_price"))
          .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty, " +
        "CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS BIGINT)) AS DECIMAL(18,2)) AS DOUBLE) AS weighted_sum, " +
        "round(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS BIGINT)) AS DECIMAL(18,2)) AS DOUBLE) / sum(CAST(l_quantity AS BIGINT)), 4) AS weighted_avg_price, " +
        "CAST(round(avg(CAST(l_extendedprice AS DECIMAL(18,2))), 4) AS DOUBLE) AS naive_avg_price " +
        "FROM lineitem GROUP BY 1 ORDER BY 1"),
      scaleNote = "One map-side-combined hash agg: the weighted sum " +
        "is a DECIMAL product-sum (associative, exact — integer " +
        "weights times 2-dp money never rounds), so partials merge " +
        "across any partitioning and the only float is the final " +
        "division per group. Emitting the naive average beside the " +
        "weighted one is deliberate: the gap between them IS the " +
        "mix-shift signal dashboards mislabel as a price change " +
        "(Simpson's inversion); at 100 TB both ride the same " +
        "exchange for free. Weighted percentiles escalate to " +
        "agg_approx_quantile's sketch with weight-expanded updates."),

    // Gini coefficient per group — the CONCENTRATION statistic that
    // completes the distributional family (dispersion: stats/winsor;
    // shape: skew/kurtosis; position: percentiles; compare: KS;
    // inequality: this). G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over the
    // ascending-sorted values: revenue concentration per priority
    // class here; source concentration of a training corpus in
    // production (one scraper dominating a slice is a Gini spike).
    // Σ(i·xᵢ) is TIE-IMMUNE (equal values commute under any tie
    // order), so row_number with the orderkey tiebreak is exact, not
    // a convention; sums are integer cents, the two divisions are
    // the only floats and compose identically on both engines.
    QueryDef(
      "agg_gini",
      (spark, sf) => {
        val o = Tables.orders(spark, sf)
          .select(col("o_orderpriority").as("prio"),
            round(col("o_totalprice") * 100).cast("long").as("cents"),
            col("o_orderkey"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("prio").orderBy(col("cents").asc, col("o_orderkey").asc)
        o.withColumn("rn", row_number().over(w).cast("long"))
          .groupBy("prio")
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("t"),
            sum(col("rn") * col("cents")).as("s"))
          .select(col("prio"), col("n"),
            // n and t are cast to double BEFORE multiplying (r9,
            // ADVICE): the n·t Long product overflows silently in
            // Spark (wraps) while DuckDB errors — the silent-vs-loud
            // divergence class Gram.scala's addExact guards exist
            // for. The product feeds float division anyway, and both
            // factors are < 2^53 individually wherever the s-sum
            // bound below holds, so the double product is exact at
            // every group size the s bound already admits.
            round(lit(2.0) * col("s").cast("double") /
              (col("n").cast("double") * col("t").cast("double")) -
              (col("n") + 1).cast("double") / col("n").cast("double"),
              4).as("gini"))
          .orderBy("prio")
      },
      Some("WITH o AS (SELECT o_orderpriority AS prio, CAST(round(o_totalprice*100) AS BIGINT) AS cents, o_orderkey FROM orders), " +
        "r AS (SELECT prio, cents, row_number() OVER (PARTITION BY prio ORDER BY cents, o_orderkey) AS rn FROM o), " +
        "a AS (SELECT prio, count(*) AS n, CAST(sum(cents) AS BIGINT) AS t, CAST(sum(rn*cents) AS BIGINT) AS s FROM r GROUP BY 1) " +
        "SELECT prio, n, round(2.0 * s / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)) - CAST(n + 1 AS DOUBLE) / n, 4) AS gini FROM a ORDER BY prio"),
      scaleNote = "One hash exchange on the group key serves both the " +
        "rank window (per-group sort, bounded by group size) and the " +
        "rollup; the weighted-rank sum is a plain integer aggregate " +
        "with map-side partials over the ranked rows. Long bounds: " +
        "rn·cents ≤ n·max_cents ≈ 2^38 per row and the group sum " +
        "stays < 2^52 up to ~10M rows/group at these magnitudes — " +
        "past that, the same aggregate in DECIMAL(38,0) (agg_corr's " +
        "partial discipline). The n·t divisor multiplies as DOUBLE, " +
        "never as a Long product, so it cannot wrap at group sizes " +
        "the s bound already excludes. For groups too large to sort, the " +
        "binned approximation (Gini over agg_histogram's fixed " +
        "buckets) is the standard trade — same formula over bucket " +
        "midpoints, error bounded by bin width."),

    // Herfindahl–Hirschman index — agg_gini's CONCENTRATION sibling
    // for market structure (gini ranks inequality of a population;
    // HHI answers the antitrust question: how concentrated is a
    // market among its participants): per REGION, the supplier
    // revenue concentration HHI = Σ_s share_s². The float-sum trap
    // is designed out by algebra: HHI = Σr_s²/(Σr_s)², so both sums
    // run EXACT — revenue in 1e-4-dollar units as BIGINT (the sum's
    // native DECIMAL(·,4) scale, so no cross-engine rounding seam at
    // all), squares as DECIMAL(19,0)² partials (a big supplier's
    // units square past Long; Spark sums in DECIMAL(38,0), DuckDB
    // in HUGEINT — equal as doubles at the edge) — and the single
    // division composes once at the edge. Equivalent-firms 1/HHI is
    // the readable form (an HHI of 0.25 "is" 4 equal firms); the
    // DOJ's 0.25 concentration flag emitted as the gate.
    QueryDef(
      "agg_hhi",
      (spark, sf) => {
        val rev = Tables.lineitem(spark, sf)
          .join(Tables.supplier(spark, sf),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(spark, sf)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("n_regionkey"), col("s_suppkey"),
            (col("l_extendedprice").cast(Dsl.D2) *
              (lit(1).cast(Dsl.D2) - col("l_discount").cast(Dsl.D2)))
              .cast(Dsl.D4).as("r"))
          .groupBy("n_regionkey", "s_suppkey")
          .agg((sum(col("r")) * 10000).cast("long").as("c"))
        rev.groupBy("n_regionkey")
          .agg(count(lit(1)).as("n_suppliers"),
            sum(col("c")).as("tot"),
            sum(col("c").cast("decimal(19,0)") *
              col("c").cast("decimal(19,0)")).as("sq"))
          .select(col("n_regionkey"), col("n_suppliers"),
            round(col("tot").cast("double") / 10000, 2).as("total_rev"),
            round(col("sq").cast("double") /
              (col("tot").cast("double") * col("tot").cast("double")), 6)
              .as("hhi"),
            round(lit(1.0) / (col("sq").cast("double") /
              (col("tot").cast("double") * col("tot").cast("double"))), 2)
              .as("equivalent_firms"),
            (col("sq").cast("double") /
              (col("tot").cast("double") * col("tot").cast("double")) >
              lit(0.25)).as("concentrated"))
          .orderBy("n_regionkey")
      },
      Some("WITH rev AS (SELECT n_regionkey, s_suppkey, " +
        "CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS c " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey GROUP BY 1, 2), " +
        "agg AS (SELECT n_regionkey, count(*) AS n_suppliers, CAST(sum(c) AS BIGINT) AS tot, " +
        "sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS sq FROM rev GROUP BY 1) " +
        "SELECT n_regionkey, n_suppliers, round(CAST(tot AS DOUBLE) / 10000, 2) AS total_rev, " +
        "round(CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS hhi, " +
        "round(1.0 / (CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE))), 2) AS equivalent_firms, " +
        "CAST(sq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) > 0.25 AS concentrated " +
        "FROM agg ORDER BY n_regionkey"),
      scaleNote = "Two map-side-combined aggregates (per-supplier " +
        "cents, then per-region (Σr, Σr²)) — the wire carries " +
        "|suppliers| then |regions| rows, and both moments are " +
        "associative exact partials (cents as BIGINT, squares as " +
        "DECIMAL(38,0) — the square of a 10-figure-cents supplier " +
        "exceeds Long, which is why the escalation is in the " +
        "operator, not a footnote), so re-partitioning cannot move " +
        "the index: the Σr²/(Σr)² algebra replaces the textbook " +
        "Σshare² exactly BECAUSE shares are floats whose sum order " +
        "would differ per layout. Any market definition (brand, " +
        "region, route) is a group-key swap; the same two-moment " +
        "substrate yields the coefficient-of-variation and " +
        "Simpson/effective-diversity indices with different edge " +
        "expressions — one plan, a family of concentration stats."))
}
