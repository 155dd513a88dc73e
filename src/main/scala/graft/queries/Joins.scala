package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{Dsl, QueryDef, QueryGroup, Tables}
import Dsl._

/** Joins — SURVEY.md §2.1 #6-17.
  *
  * Reference analog: the passage↔scheduled-trip match
  * (`get_trip_ids_from_day_train_nums`, substring trip matching) and
  * the GTFS star-schema denormalization (`build_stop_times_ext`)
  * [P match_ids.py, extract_schedule.py — SURVEY.md §0].
  */
object Joins extends QueryGroup {

  import org.apache.spark.sql.DataFrame

  /** Tagged left/right union for the as-of rewrite: every event is a
    * left row; purchases (deduped to one per (user_id, ts)) are the
    * right side. `is_left` sorts right rows FIRST at equal ts, so a
    * purchase matches a left row at its own timestamp. */
  private def asofUnion(ev: DataFrame): DataFrame = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("event_id").as("match_id"))
    val left = ev.select(
      col("user_id"), col("ts"), col("event_id"),
      lit(null).cast("long").as("match_id"), lit(1).as("is_left"))
    val right = purchases.select(
      col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
      col("match_id"), lit(0).as("is_left"))
    left.unionByName(right)
  }

  /** Plain as-of: one window over the whole user partition. Factored
    * out so AnalyticsSpec can hash-compare it against [[asofSalted]]
    * on a skewed fixture. */
  def asof(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    asofUnion(ev)
      .withColumn("asof_match_id",
        last(col("match_id"), ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(col("event_id"), col("ts"), col("asof_match_id"))
  }

  /** Skew-salted as-of: the hot-user fallback join_asof's scaleNote
    * prescribes (AQE cannot split a window partition). The salt is a
    * TIME-RANGE chunk — contiguous in ts, so as-of semantics compose:
    *   1. as-of locally within each (user, chunk) window — the heavy
    *      sort now caps at one chunk of the hot user, and chunks of
    *      one user land on different tasks;
    *   2. per-(user, chunk) last right row, prefix-max'd over the
    *      CHUNK-granularity table (|users|·|active chunks| rows — the
    *      pack_sequences two-phase shape, never the event table);
    *   3. left rows with no in-chunk match take the carried one.
    * Equal-ts ties can't straddle a chunk (chunk is a function of ts),
    * so tie semantics are identical to [[asof]]; the driver hash vs
    * the SAME DuckDB ASOF oracle proves it. */
  def asofSalted(ev: DataFrame, chunkSeconds: Long = 86400L): DataFrame = {
    val u = asofUnion(ev)
      .withColumn("chk", floor(unix_timestamp(col("ts")) / chunkSeconds))
    val wLocal = Window.partitionBy("user_id", "chk")
      .orderBy(col("ts").asc, col("is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.withColumn("local_match",
      last(col("match_id"), ignoreNulls = true).over(wLocal))
    // later chunks always hold later timestamps, so the prefix max of
    // (ts, match_id) structs over preceding chunks IS the latest right
    // row before this chunk; null lastr (right-free chunk) is ignored
    // by max, and a null carry field-accesses to null
    val chunkTops = u.groupBy("user_id", "chk")
      .agg(max(when(col("is_left") === 0,
        struct(col("ts"), col("match_id")))).as("lastr"))
    val wChk = Window.partitionBy("user_id").orderBy("chk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carried = chunkTops
      .withColumn("carry", max(col("lastr")).over(wChk))
      .select(col("user_id"), col("chk"),
        col("carry.match_id").as("carried_match"))
    local.filter(col("is_left") === 1)
      .join(carried, Seq("user_id", "chk"))
      .select(col("event_id"), col("ts"),
        coalesce(col("local_match"), col("carried_match")).as("asof_match_id"))
  }

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      "join_inner",
      (spark, sf) => {
        val o = Tables.orders(spark, sf)
        val c = Tables.customer(spark, sf)
        o.join(c, o("o_custkey") === c("c_custkey"), "inner")
          .select("o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"),
      scaleNote = "Shuffle-hash/SMJ on custkey at scale; both sides partition on the join key so the shuffle is 1 pass each. With orders bucketed by o_custkey the shuffle disappears entirely. AQE converts to broadcast when customer fits."),

    QueryDef(
      "join_broadcast",
      (spark, sf) => {
        val n = Tables.nation(spark, sf)
        val r = Tables.region(spark, sf)
        n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "inner")
          .select("n_nationkey", "n_name", "r_name")
          .orderBy("n_nationkey")
      },
      Some("SELECT n_nationkey, n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey"),
      scaleNote = "Explicit broadcast(): dimension tables (5/25 rows; still tiny at 100 TB fact scale) ship to every executor once — zero shuffle of the big side. This is the station-metadata enrichment pattern."),

    QueryDef(
      "join_left",
      (spark, sf) => {
        val o = Tables.orders(spark, sf)
        val c = Tables.customer(spark, sf)
        // Join condition includes a non-key predicate so unmatched rows
        // really occur (null-extended) — the reference keeps raw passage
        // records whose train number matched no scheduled trip.
        o.join(c, o("o_custkey") === c("c_custkey") && c("c_acctbal") > 5000.0, "left")
          .select("o_orderkey", "o_custkey", "c_name", "c_acctbal")
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_custkey, c_name, c_acctbal FROM orders LEFT JOIN customer ON o_custkey = c_custkey AND c_acctbal > 5000.0 ORDER BY o_orderkey"),
      scaleNote = "Outer joins cannot drop the big side; broadcast of the small (right) side keeps it shuffle-free for the fact table."),

    QueryDef(
      "join_full",
      (spark, sf) => {
        val c = Tables.customer(spark, sf)
          .groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
        val s = Tables.supplier(spark, sf)
          .groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))
        c.join(s, c("c_nationkey") === s("s_nationkey"), "full")
          .select(
            coalesce(c("c_nationkey"), s("s_nationkey")).as("nationkey"),
            col("n_cust"), col("n_supp"))
          .orderBy("nationkey")
      },
      Some("SELECT COALESCE(c.k, s.k) AS nationkey, n_cust, n_supp FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c FULL JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s ON c.k = s.k ORDER BY nationkey"),
      scaleNote = "Pre-aggregation shrinks both sides to |nations| rows before the full outer join — aggregate-then-join is the scale pattern; the join itself is trivial afterwards."),

    QueryDef(
      "join_semi",
      (spark, sf) => {
        val c = Tables.customer(spark, sf)
        val o = Tables.orders(spark, sf)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"),
      scaleNote = "left_semi never materializes right columns and short-circuits on first match; Catalyst's RewritePredicateSubquery produces the same plan from EXISTS. Right side reduced to distinct keys before shuffle."),

    QueryDef(
      "join_anti",
      (spark, sf) => {
        val c = Tables.customer(spark, sf)
        val urgent = Tables.orders(spark, sf)
          .filter(col("o_orderpriority") === "1-URGENT")
        c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT') ORDER BY c_custkey"),
      scaleNote = "NOT EXISTS as left_anti — the 'scheduled trips never observed' (missed trains) pattern. Filter on the right side is applied before the join, shrinking the build side."),

    // NOT IN with a NULLABLE probe key — a DIFFERENT operator from
    // join_anti: three-valued logic means a NULL probe key can never
    // satisfy NOT IN, and a NULL on the build side would empty the
    // result. Catalyst recognizes the Or(EqualTo, IsNull(EqualTo))
    // anti-join condition as single-column null-aware and plans the
    // specialized NullAwareAntiJoin (hash build keeps a null flag)
    // instead of the nested-loop fallback naive NOT IN would force.
    // The probe key is nullified on a deterministic slice so the
    // NULL-excluded branch carries real rows at every SF.
    QueryDef(
      "join_anti_null_aware",
      (spark, sf) => {
        val o = Tables.orders(spark, sf)
        val probe = o.withColumn("k",
          when(col("o_custkey") % 97 === 13, lit(null).cast("long"))
            .otherwise(col("o_custkey") % 97))
        // build covers residues [0, 40) ONLY — probe keys 40..96
        // survive, so all three branches carry rows: matched
        // (excluded), unmatched (kept), NULL probe (excluded by
        // three-valued logic, NOT by a match)
        val build = Tables.customer(spark, sf)
          .filter(col("c_custkey") % 97 < 40)
          .select((col("c_custkey") % 97).as("bk"))
        probe.join(build,
            probe("k") === build("bk") || (probe("k") === build("bk")).isNull,
            "left_anti")
          .select("o_orderkey", "o_custkey", "k")
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_custkey, nullif(o_custkey % 97, 13) AS k FROM orders WHERE nullif(o_custkey % 97, 13) NOT IN (SELECT c_custkey % 97 FROM customer WHERE c_custkey % 97 < 40) ORDER BY o_orderkey"),
      scaleNote = "Plans as BroadcastHashJoin(LeftAnti, isNullAwareAntiJoin=true): " +
        "the build side ships once with an any-null flag, the probe " +
        "streams — the ONLY scalable physical shape for NOT IN over a " +
        "nullable key (the generic fallback is a nested-loop join that " +
        "dies at scale). At 100 TB keep the NOT IN subquery " +
        "broadcast-sized or rewrite to NOT EXISTS (join_anti's shape) " +
        "after explicitly null-filtering both sides — same answer once " +
        "nulls are impossible, shuffle-joinable."),

    // Spatial nearest-neighbor as a GRID-BUCKETED equi join — the
    // geo analog of LSH banding: bucket both point sets into 10-
    // millidegree cells, replicate each probe into its 3×3 cell
    // neighborhood (a bounded ×9 map-side expansion), equi-join on
    // the cell, keep the (d², id)-min match per probe. Distances are
    // SQUARED EUCLIDEAN IN INTEGER MILLIDEGREES — monotone in true
    // local distance, zero trig, zero floats, so the nearest choice
    // is exact and engine-independent (the determinism trick: compare
    // in a monotone integer metric, convert to meters only for
    // display downstream). Coordinates are synthesized
    // deterministically from keys (the driver tables carry no geo);
    // the nearest-station-to-customer shape is the reference's
    // station-locator [P stations CSV has lat/lon — SURVEY §1.2].
    QueryDef(
      "join_spatial_grid",
      (spark, sf) => {
        def pts(df: org.apache.spark.sql.DataFrame, key: String, div: Int) =
          df.select(col(key).as("id"),
            (col(key) % 1000).as("lat_md"),
            ((col(key) / div).cast("long") % 1000).as("lon_md"))
        val cust = pts(Tables.customer(spark, sf), "c_custkey", 7)
        val stat = pts(Tables.supplier(spark, sf), "s_suppkey", 3)
          .select(col("id").as("sid"), col("lat_md").as("slat"),
            col("lon_md").as("slon"),
            (col("lat_md") / 10).cast("long").as("cell_lat"),
            (col("lon_md") / 10).cast("long").as("cell_lon"))
        val off = Seq(-1L, 0L, 1L)
        val probes = cust
          .withColumn("dlat", explode(array(off.map(lit): _*)))
          .withColumn("dlon", explode(array(off.map(lit): _*)))
          .select(col("id"), col("lat_md"), col("lon_md"),
            ((col("lat_md") / 10).cast("long") + col("dlat")).as("cell_lat"),
            ((col("lon_md") / 10).cast("long") + col("dlon")).as("cell_lon"))
        probes.join(stat, Seq("cell_lat", "cell_lon"))
          .select(col("id"), col("sid"),
            ((col("lat_md") - col("slat")) * (col("lat_md") - col("slat")) +
              (col("lon_md") - col("slon")) * (col("lon_md") - col("slon")))
              .as("d2"))
          // (d², id) lexicographic min packed into ONE integer
          // (d² < 2^11 by the 3×3 neighborhood bound; 2^20 id space)
          // — an associative min both engines order identically
          .groupBy("id")
          .agg(min(col("d2") * 1048576L + col("sid")).as("m"))
          .select(col("id").as("c_custkey"),
            (col("m") % 1048576L).as("nearest_supp"),
            (col("m") / 1048576L).cast("long").as("d2"))
          .orderBy("c_custkey")
      },
      Some("WITH cust AS (SELECT c_custkey AS id, c_custkey % 1000 AS lat_md, (c_custkey // 7) % 1000 AS lon_md FROM customer), " +
        "stat AS (SELECT s_suppkey AS sid, s_suppkey % 1000 AS slat, (s_suppkey // 3) % 1000 AS slon, (s_suppkey % 1000) // 10 AS cell_lat, ((s_suppkey // 3) % 1000) // 10 AS cell_lon FROM supplier), " +
        "probes AS (SELECT id, lat_md, lon_md, lat_md // 10 + dlat.o AS cell_lat, lon_md // 10 + dlon.o AS cell_lon FROM cust, (SELECT unnest([-1, 0, 1]) AS o) dlat, (SELECT unnest([-1, 0, 1]) AS o) dlon), " +
        "cand AS (SELECT p.id, s.sid, (p.lat_md - s.slat)*(p.lat_md - s.slat) + (p.lon_md - s.slon)*(p.lon_md - s.slon) AS d2 FROM probes p JOIN stat s ON p.cell_lat = s.cell_lat AND p.cell_lon = s.cell_lon) " +
        "SELECT id AS c_custkey, min(d2 * 1048576 + sid) % 1048576 AS nearest_supp, min(d2 * 1048576 + sid) // 1048576 AS d2 FROM cand GROUP BY id ORDER BY c_custkey"),
      scaleNote = "The textbook scale shape for 'nearest station to " +
        "every point': no cross join, no kd-tree on the driver — a " +
        "×9 bounded map-side replication and ONE equi shuffle on the " +
        "cell key, then an associative struct-min (no window). Cell " +
        "size trades replication against candidate count; skewed " +
        "cells (city centers) are ordinary hash-join skew, handled " +
        "by AQE/salting like any hot key. Points beyond one cell of " +
        "any station drop out by design — widen the neighborhood or " +
        "fall back to a coarse-grid second pass for the orphans " +
        "(IVF's two-probe pattern). All-integer d² keeps the argmin " +
        "exact; meters come from ONE haversine on the single " +
        "surviving pair per probe, off the hot path."),

    QueryDef(
      "join_cross",
      (spark, sf) =>
        Tables.region(spark, sf).crossJoin(Tables.nation(spark, sf))
          .select("r_regionkey", "r_name", "n_nationkey", "n_name")
          .orderBy("r_regionkey", "n_nationkey"),
      Some("SELECT r_regionkey, r_name, n_nationkey, n_name FROM region CROSS JOIN nation ORDER BY r_regionkey, n_nationkey"),
      scaleNote = "Cross join only ever between bounded dimensions (125 rows); BroadcastNestedLoop. Never cross-join fact tables at scale."),

    QueryDef(
      "join_theta",
      (spark, sf) => {
        val s = Tables.supplier(spark, sf)
        val c = Tables.customer(spark, sf)
        s.join(c, s("s_nationkey") === c("c_nationkey") && s("s_acctbal") > c("c_acctbal"), "inner")
          .select("s_suppkey", "c_custkey")
          .orderBy("s_suppkey", "c_custkey")
      },
      Some("SELECT s_suppkey, c_custkey FROM supplier JOIN customer ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal ORDER BY s_suppkey, c_custkey"),
      scaleNote = "Non-equi predicate rides on the nationkey equi-join: Catalyst plans SMJ/SHJ on the equality and post-filters the inequality — never a pure nested loop. Skewed nations handled by AQE skew split."),

    QueryDef(
      "join_range",
      (spark, sf) => {
        val li = Tables.lineitem(spark, sf)
        val o = Tables.orders(spark, sf)
        li.join(o, li("l_orderkey") === o("o_orderkey")
            && li("l_shipdate") >= o("o_orderdate")
            && li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 120 DAYS"), "inner")
          .select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")
          .orderBy("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")
      },
      Some("SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate FROM lineitem JOIN orders ON l_orderkey = o_orderkey AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 120 DAY ORDER BY l_orderkey, l_linenumber, l_shipdate, o_orderdate"),
      scaleNote = "Range predicate anchored on an equi key: the passage-within-service-day-window pattern. Shuffles once on orderkey; the interval filter is evaluated inside the join, no blow-up."),

    // As-of join — Spark has no native ASOF (DuckDB does). Rewrite:
    // union left+right tagged rows, sort within user by (ts, side),
    // carry the latest right row forward with last(ignoreNulls) over a
    // running frame, keep left rows. Right side first deduped to one
    // row per (user_id, ts) so tie semantics are engine-independent.
    QueryDef(
      "join_asof",
      (spark, sf) => asof(Tables.loadEvents(spark, sf)).orderBy("event_id"),
      Some("SELECT e.event_id, e.ts, p.match_id AS asof_match_id FROM events e ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS match_id FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p ON e.user_id = p.user_id AND e.ts >= p.ts ORDER BY e.event_id"),
      scaleNote = "Union+window rewrite shuffles each side once on user_id and sorts within partitions — same cost class as a sort-merge join, no per-row lookups. The running last(ignoreNulls) is O(n) per partition. This is the observation↔latest-schedule match at the core of the reference. Residual skew risk: AQE cannot split a window partition, so a pathologically hot user_id serializes its partition — join_asof_salted is the implemented 100×-skew fallback."),

    // Skew-salted as-of, declared: time-range chunks split the hot
    // user's window across tasks; a chunk-granularity prefix max
    // carries the latest right row into right-free chunks. The ORACLE
    // is the SAME DuckDB ASOF join as join_asof — hash equality under
    // the driver proves the salting is semantics-preserving (the
    // join_skew_salted pattern).
    QueryDef(
      "join_asof_salted",
      (spark, sf) =>
        asofSalted(Tables.loadEvents(spark, sf)).orderBy("event_id"),
      Some("SELECT e.event_id, e.ts, p.match_id AS asof_match_id FROM events e ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS match_id FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p ON e.user_id = p.user_id AND e.ts >= p.ts ORDER BY e.event_id"),
      scaleNote = "The salt is ts-derived, so it needs NO skew statistics, composes with any chunk width, and keeps ties in-chunk by construction. Phase-1 windows are (user, chunk) partitions — a hot user's 10M-row timeline becomes |chunks| independent tasks; phase 2 runs on the |users|·|chunks| chunk table (the pack_sequences two-phase prefix shape), and the merge join is equi on (user, chunk) against the partitioning phase 1 just produced. Use when one key's window exceeds a task; otherwise the plain window is one shuffle cheaper."),

    QueryDef(
      "join_like",
      (spark, sf) => {
        val session = spark
        import session.implicits._
        val docs = Tables.documents(spark, sf)
        val tokens = Seq("merge", "window", "shuffle").toDF("w")
        docs.join(broadcast(tokens), col("text").contains(col("w")), "inner")
          .select("doc_id", "w")
          .orderBy("doc_id", "w")
      },
      Some("SELECT doc_id, w FROM documents JOIN (VALUES ('merge'), ('window'), ('shuffle')) t(w) ON contains(text, w) ORDER BY doc_id, w"),
      scaleNote = "The reference's substring trip-number match, done as a BroadcastNestedLoopJoin against a tiny broadcast token list — each doc partition scans locally. For large token sets, switch to tokenize+explode+equi-join (see text_tokens) or a prefix-filtered LSH pre-join."),

    QueryDef(
      "join_star",
      (spark, sf) => {
        val li = Tables.lineitem(spark, sf)
        val o = Tables.orders(spark, sf)
        val c = Tables.customer(spark, sf)
        val n = Tables.nation(spark, sf)
        val r = Tables.region(spark, sf)
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(
            // exact decimal sum, final DOUBLE emit (driver-hash rule,
            // see agg_sum_group)
            sum((dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount"))))
              .cast(D4)).cast(D4).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      },
      Some("SELECT r_name, n_name, CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue, count(*) AS n_items FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY r_name, n_name ORDER BY r_name, n_name"),
      scaleNote = "The stop_times_ext denormalization analog. Fact table shuffles once per non-broadcast join; nation/region broadcast explicitly, customer via AQE when under threshold. At 100 TB: bucket lineitem+orders on orderkey to eliminate the first (largest) shuffle."),

    // TPC-H-Q9-shaped profit rollup over the part dimension: the
    // second star family (lineitem ⋈ part ⋈ supplier ⋈ nation),
    // closing the one driver table (`part`) the r2 surface never
    // queried. Profit = revenue − retailprice·quantity cost proxy,
    // in exact decimal, final DOUBLE emit (driver-hash rule).
    QueryDef(
      "join_star_parts",
      (spark, sf) => {
        val li = Tables.lineitem(spark, sf)
        val p = Tables.part(spark, sf)
          .filter(col("p_name").contains("red"))
        val s = Tables.supplier(spark, sf)
        val n = Tables.nation(spark, sf)
        li.join(p, li("l_partkey") === p("p_partkey"))
          .join(s, li("l_suppkey") === s("s_suppkey"))
          .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"), year(col("l_shipdate")).as("o_year"))
          .agg(
            sum((dec2(col("l_extendedprice")) * (lit(1) - dec2(col("l_discount")))
              - dec2(col("p_retailprice")) * dec2(col("l_quantity")))
              .cast(D4)).cast(D4).cast("double").as("profit"),
            count(lit(1)).as("n_items"))
          .orderBy("n_name", "o_year")
      },
      Some("SELECT n_name, year(l_shipdate) AS o_year, CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS profit, count(*) AS n_items FROM lineitem JOIN part ON l_partkey = p_partkey JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey WHERE contains(p_name, 'red') GROUP BY n_name, o_year ORDER BY n_name, o_year"),
      scaleNote = "Q9 shape: the selective part filter is pushed to the part scan BEFORE the join (predicate pushdown), shrinking the probe side ~8×. At TPC-H scale part is too big to broadcast — lineitem shuffles on partkey then suppkey; bucketing lineitem by partkey at write time removes the first shuffle. Nation broadcasts always. Group count is |nation|×|year|, so the 2-phase agg output is tiny regardless of input scale."),

    // Correlated scalar subquery (TPC-H Q17-family): parts priced above
    // their brand's average. Catalyst DECORRELATES this into an
    // aggregate + equi join — never a per-row subquery execution — the
    // operator class that makes "compare each row to its group" viable
    // at scale. Average via exact decimal sum / count (float avg is
    // summation-order-dependent across engines).
    QueryDef(
      "subquery_scalar",
      (spark, sf) => {
        Tables.part(spark, sf).createOrReplaceTempView("part")
        spark.sql(
          "SELECT p_partkey, p_brand, p_retailprice FROM part p WHERE p_retailprice > (SELECT CAST(CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) / count(*) FROM part p2 WHERE p2.p_brand = p.p_brand) ORDER BY p_partkey")
      },
      Some("SELECT p_partkey, p_brand, p_retailprice FROM part p WHERE p_retailprice > (SELECT CAST(CAST(sum(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) / count(*) FROM part p2 WHERE p2.p_brand = p.p_brand) ORDER BY p_partkey"),
      scaleNote = "Decorrelation rewrites the correlated subquery to groupBy(p_brand).agg + an equi join back — one aggregate pass + one shuffle-or-broadcast join regardless of row count, instead of |rows| subquery executions. The per-brand aggregate is tiny (|brands| rows) and broadcasts. PlanPropertiesSpec pins the no-nested-loop shape."),

    // Lateral correlated subquery (top-N per outer row): the remaining
    // subquery class after subquery_scalar — a per-nation ORDER BY +
    // LIMIT subquery referencing the outer row. Catalyst decorrelates
    // the lateral to one equi join + a per-key rank filter (measured
    // plan: BroadcastHashJoin feeding a windowed filter), never a
    // per-outer-row execution. Stored doubles sort deterministically
    // (no arithmetic, identical bit patterns both engines) with the
    // name tiebreak.
    QueryDef(
      "join_lateral",
      (spark, sf) => {
        Tables.nation(spark, sf).createOrReplaceTempView("nation")
        Tables.customer(spark, sf).createOrReplaceTempView("customer")
        spark.sql(
          "SELECT n.n_name, t.c_name, t.c_acctbal FROM nation n, LATERAL (SELECT c_name, c_acctbal FROM customer c WHERE c.c_nationkey = n.n_nationkey ORDER BY c_acctbal DESC, c_name LIMIT 2) t ORDER BY n.n_name, t.c_acctbal DESC, t.c_name")
      },
      Some("SELECT n.n_name, t.c_name, t.c_acctbal FROM nation n, LATERAL (SELECT c_name, c_acctbal FROM customer c WHERE c.c_nationkey = n.n_nationkey ORDER BY c_acctbal DESC, c_name LIMIT 2) t ORDER BY n.n_name, t.c_acctbal DESC, t.c_name"),
      scaleNote = "Decorrelation turns the lateral LIMIT subquery into the win_topk_group shape: one equi join on the correlation key + a rank-filter window — cost is one shuffle each side regardless of outer row count, where naive lateral evaluation would run |outer| sorted scans. The 'top N related rows per entity' serving query (next departures per station) at any scale."),

    // Salted skew join, declared: the big side's hot keys are spread
    // across 8 salt buckets (content-derived salt), the small side is
    // replicated 8×, and the join runs on (key, salt). The ORACLE is
    // the PLAIN join — hash equality under the driver proves salting
    // is semantics-preserving, not just asserted in ExtensionsSpec.
    QueryDef(
      "join_skew_salted",
      (spark, sf) => {
        val big = Tables.orders(spark, sf)
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val small = Tables.customer(spark, sf)
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
        graft.engine.SkewJoin.salted(big, small, "o_custkey", 8)
          .select("o_orderkey", "o_custkey", "c_mktsegment", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_custkey, c_mktsegment, o_totalprice FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"),
      scaleNote = "The explicit fallback for key skew beyond what AQE's skew-split handles: n× replication of the small side buys n-way parallelism on a single hot key. Salt is derived from row content (reproducible across runs/partitionings); the join stays equi on (key, salt) — shuffle-hash, never a loop. Use when one key exceeds a task's memory; otherwise prefer plain AQE."),

    // Band (ε-distance) join executed as a BUCKETED EQUI join — the
    // scale form of |a.x − b.x| ≤ ε: quantize x to ε-wide buckets,
    // explode ONE side to its bucket ± 1, equi-join on the bucket id,
    // post-filter the exact band. Every true match lands in exactly
    // one bucket pairing (the probe's own bucket), so no dedup is
    // needed; the oracle is the naive theta join, and hash equality
    // PROVES the rewrite (join_skew_salted's proof pattern). Pairs
    // suppliers with customers of near-equal account balance (ε=10.0 — ~3 pairs even at the sf0.001 dev scale, ~27k at sf0.1).
    QueryDef(
      "join_band",
      (spark, sf) => {
        val eps = 10.0
        val s = Tables.supplier(spark, sf)
          .select(col("s_suppkey"), col("s_acctbal"))
          .withColumn("b0", floor(col("s_acctbal") / eps).cast("long"))
        val c = Tables.customer(spark, sf)
          .select(col("c_custkey"), col("c_acctbal"))
          .withColumn("b", floor(col("c_acctbal") / eps).cast("long"))
        s.withColumn("b", explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
          .join(c, "b")
          .filter(abs(col("s_acctbal") - col("c_acctbal")) <= eps)
          .select(col("s_suppkey"), col("c_custkey"),
            round(dec2(col("s_acctbal")) - dec2(col("c_acctbal")), 2)
              .cast("double").as("bal_diff"))
          .orderBy("s_suppkey", "c_custkey")
      },
      Some("SELECT s_suppkey, c_custkey, CAST(round(CAST(s_acctbal AS DECIMAL(18,2)) - CAST(c_acctbal AS DECIMAL(18,2)), 2) AS DOUBLE) AS bal_diff " +
        "FROM supplier JOIN customer ON abs(s_acctbal - c_acctbal) <= 10.0 " +
        "ORDER BY s_suppkey, c_custkey"),
      scaleNote = "The naive theta form is a cross product with a " +
        "residual filter — |A|·|B| comparisons, the plan Catalyst is " +
        "forced into for a pure inequality predicate. Bucketing turns " +
        "it into ONE hash shuffle per side on the ε-quantized key " +
        "with 3× replication of the exploded side: candidate pairs " +
        "are only same-or-adjacent-bucket rows, so work tracks the " +
        "band's true selectivity, not the cross product. The ε dial " +
        "trades replication (always exactly 3 buckets) against " +
        "per-bucket density — at 100 TB pick ε so buckets hold ~10^3 " +
        "rows, and a hot bucket (value heaps at one balance) is an " +
        "ordinary groupBy hot key: AQE skew split or salting " +
        "composes, which the theta form cannot do (one task owns the " +
        "whole cross product). Same rewrite carries as-of tolerance " +
        "joins and spatial grid joins (2-D buckets, 9 neighbors)."),

    // Pure interval-OVERLAP join — NO equi key anywhere (join_range
    // anchors its range on orderkey equality; join_band quantizes a
    // scalar; this overlaps [start,end] × [start,end]). The naive
    // plan is a nested loop over |A|·|B|. Rewrite: quantize time into
    // week bins, replicate each interval to every bin it covers,
    // equi-join on the bin, and count each true-overlap pair exactly
    // once — in the FIRST bin both intervals share, which is
    // max(binOf(a.start), binOf(b.start)) (the standard bin-join
    // dedup, no distinct needed). A = urgent orders opened in
    // 1997-03 (the probe set), B = all low-priority orders; an
    // interval is [orderdate, orderdate + orderkey%30 + 1 days].
    // Oracle = the naive overlap join, so hash equality proves the
    // bin rewrite emits each overlapping pair exactly once.
    QueryDef(
      "join_interval_overlap",
      (spark, sf) => {
        val epoch = lit("1992-01-01").cast("date")
        def binOf(d: Column): Column =
          floor(datediff(d, epoch) / 7).cast("long")
        val iv = Tables.orders(spark, sf).select(
          col("o_orderkey").as("k"),
          col("o_orderpriority").as("prio"),
          col("o_orderdate").cast("date").as("s"),
          date_add(col("o_orderdate").cast("date"),
            (col("o_orderkey") % 30 + 1).cast("int")).as("e"))
        val a = iv.filter(col("prio") === "1-URGENT"
            && col("s").between("1997-03-01", "1997-03-31"))
          .select(col("k").as("a_k"), col("s").as("a_s"), col("e").as("a_e"),
            binOf(col("s")).as("a_bin0"))
        val b = iv.filter(col("prio") === "5-LOW")
          .select(col("k").as("b_k"), col("s").as("b_s"), col("e").as("b_e"),
            binOf(col("s")).as("b_bin0"))
        a.withColumn("bin", explode(sequence(col("a_bin0"), binOf(col("a_e")))))
          .join(b.withColumn("bin",
            explode(sequence(col("b_bin0"), binOf(col("b_e"))))), "bin")
          .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
          .filter(col("bin") === greatest(col("a_bin0"), col("b_bin0")))
          .groupBy(col("a_k").as("a_orderkey"))
          .agg(count(lit(1)).as("n_overlap"),
            sum(datediff(least(col("a_e"), col("b_e")),
              greatest(col("a_s"), col("b_s"))) + 1).as("overlap_days"))
          .orderBy("a_orderkey")
      },
      Some("WITH iv AS (SELECT o_orderkey AS k, o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS s, " +
        "CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 + 1 AS INTEGER) AS e FROM orders), " +
        "a AS (SELECT * FROM iv WHERE prio = '1-URGENT' AND s BETWEEN DATE '1997-03-01' AND DATE '1997-03-31'), " +
        "b AS (SELECT * FROM iv WHERE prio = '5-LOW') " +
        "SELECT a.k AS a_orderkey, count(*) AS n_overlap, " +
        "CAST(sum(date_diff('day', greatest(a.s, b.s), least(a.e, b.e)) + 1) AS BIGINT) AS overlap_days " +
        "FROM a JOIN b ON a.s <= b.e AND b.s <= a.e GROUP BY a.k ORDER BY a.k"),
      scaleNote = "The bin rewrite turns a keyless nested loop into " +
        "ONE hash shuffle per side on the week bin: candidates are " +
        "only bin-cohabiting intervals, so work tracks temporal " +
        "density, not |A|·|B|. Replication is interval_span/7 bins " +
        "per row — bounded by the 31-day max span here (≤6 bins); " +
        "pick the bin width ≈ median interval length so replication " +
        "stays O(1) while bins stay selective. The first-shared-bin " +
        "rule dedups pairs with ZERO extra state (no distinct, no " +
        "post-shuffle) — each pair is emitted by exactly one bin " +
        "task. A hot week (seasonal burst) is an ordinary hot " +
        "groupBy key: AQE skew split composes. This is the DuckDB " +
        "IEJoin / Spark range-join-hint problem expressed as a plain " +
        "equi join — the form that survives 1000 executors."),

    // The DIAGNOSTIC that decides when the salted fallbacks above are
    // worth their replication cost: per-key frequency profile of a
    // join/aggregate key (events.user_id) — the top-5 hot keys with
    // their corpus share and skew ratio vs the mean key load. Run
    // this before picking plain AQE vs join_skew_salted /
    // join_asof_salted; a ratio within ~10× means AQE's split
    // handles it, beyond that the hot key serializes a task.
    QueryDef(
      "skew_diagnose",
      (spark, sf) => {
        val k = Tables.loadEvents(spark, sf)
          .groupBy(col("user_id").as("key")).agg(count(lit(1)).as("n"))
        val tot = k.agg(sum(col("n")).as("total"),
          count(lit(1)).as("n_keys"))
        k.crossJoin(broadcast(tot))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("n").desc, col("key"))))
          .filter(col("rk") <= 5)
          .select(col("rk"), col("key"), col("n"),
            round(col("n").cast("double") / col("total"), 4).as("share"),
            round(col("n").cast("double") * col("n_keys") / col("total"), 4)
              .as("skew_ratio"))
          .orderBy("rk")
      },
      Some("WITH k AS (SELECT user_id AS key, count(*) AS n FROM events GROUP BY 1), " +
        "t AS (SELECT sum(n) AS total, count(*) AS n_keys FROM k), " +
        "r AS (SELECT key, n, row_number() OVER (ORDER BY n DESC, key) AS rk FROM k) " +
        "SELECT rk, key, n, round(CAST(n AS DOUBLE) / total, 4) AS share, " +
        "round(CAST(n AS DOUBLE) * n_keys / total, 4) AS skew_ratio " +
        "FROM r CROSS JOIN t WHERE rk <= 5 ORDER BY rk"),
      scaleNote = "One map-side-combined agg collapses the event log " +
        "to |keys| rows; the top-5 rides WindowGroupLimit (each " +
        "partition retains 5 rows through the rank sort, no global " +
        "sort of the key table). The profile costs a fraction of the " +
        "join it protects and is itself skew-immune — the hot key is " +
        "just a large COUNT. At 100 TB sample the scan (hash-bucket " +
        "the keyspace, profile 1/256 of keys exactly) or swap in " +
        "agg_heavy_hitters' MG sketch when only the top handful " +
        "matter; the exact profile here doubles as the salting " +
        "factor's sizing input (ratio ≈ required salt fan-out)."),

    // Tolerance-bounded as-of: join_asof's carry, but a match older
    // than 6 hours is discarded (the stale-quote / stale-schedule
    // guard — an observation matched to a schedule row from last week
    // is worse than no match). Same union+window rewrite, carrying
    // (right ts, match id) as ONE struct through last(ignoreNulls) so
    // staleness is decided per left row against the actual matched
    // timestamp; interval arithmetic (never epoch floats) keeps the
    // boundary exact on both engines. Oracle: DuckDB's native ASOF
    // join with the same gap test applied to the matched row.
    QueryDef(
      "join_asof_tolerance",
      (spark, sf) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("is_left").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        asofUnion(Tables.loadEvents(spark, sf))
          .withColumn("carry",
            last(when(col("is_left") === 0,
              struct(col("ts").as("rts"), col("match_id").as("mid"))),
              ignoreNulls = true).over(w))
          .filter(col("is_left") === 1)
          .select(col("event_id"), col("ts"),
            when(col("carry.rts") + expr("INTERVAL 6 HOURS") >= col("ts"),
              col("carry.mid")).as("asof_match_id"))
          .orderBy("event_id")
      },
      Some("SELECT e.event_id, e.ts, CASE WHEN p.ts + INTERVAL 6 HOUR >= e.ts THEN p.match_id END AS asof_match_id " +
        "FROM events e ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS match_id FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) p " +
        "ON e.user_id = p.user_id AND e.ts >= p.ts ORDER BY e.event_id"),
      scaleNote = "Identical cost class to join_asof — one user_id " +
        "shuffle, one in-partition sort, O(n) carry — because the " +
        "tolerance is a per-row filter on the carried struct, not a " +
        "join predicate change. The struct carry generalizes to any " +
        "payload the match must surface (price, schedule version). " +
        "Under 100× key skew compose with asofSalted's time-chunk " +
        "salt: the tolerance test commutes with chunking since the " +
        "carried struct is the same latest-right row either way."),

    // Bidirectional NEAREST join: each event matches the closest
    // purchase in time (before OR after) per user, ties to the
    // earlier side — the sensor-alignment semantics as-of's
    // backward-only carry can't express. One window pass computes
    // BOTH carries: last(right, ignoreNulls) over the preceding
    // frame and first(right, ignoreNulls) over the following frame
    // share the same (user_id, sort) exchange. Oracle: two DuckDB
    // ASOF joins (the forward one on negated epoch — ASOF only
    // matches backward) + the same closest/tie pick.
    QueryDef(
      "join_nearest",
      (spark, sf) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").asc, col("is_left").asc)
        val rstruct = when(col("is_left") === 0,
          struct(col("ts").as("rts"), col("match_id").as("mid")))
        // exact microsecond gaps: DuckDB's epoch() is a fractional
        // DOUBLE and Spark's unix_timestamp truncates to seconds —
        // either alone would tie-break sub-second gaps differently;
        // epoch_us/unix_micros agree exactly (UTC session)
        def micros(c: org.apache.spark.sql.Column) =
          unix_micros(c.cast("timestamp"))
        val gapPrev = micros(col("ts")) - micros(col("prev.rts"))
        val gapNext = micros(col("next.rts")) - micros(col("ts"))
        asofUnion(Tables.loadEvents(spark, sf))
          .withColumn("prev", last(rstruct, ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("next", first(rstruct, ignoreNulls = true)
            .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
          .filter(col("is_left") === 1)
          .select(col("event_id"), col("ts"),
            when(col("prev").isNotNull &&
                (col("next").isNull || gapPrev <= gapNext),
              col("prev.mid")).otherwise(col("next.mid")).as("nearest_match_id"))
          .orderBy("event_id")
      },
      Some("WITH p AS (SELECT user_id, ts, max(event_id) AS match_id FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts), " +
        "prevm AS (SELECT e.event_id, e.ts, p.ts AS pts, p.match_id AS pmid FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts), " +
        "en AS (SELECT event_id, user_id, -epoch_us(ts) AS nts FROM events), " +
        "pn AS (SELECT user_id, ts, match_id, -epoch_us(ts) AS nts FROM p), " +
        "nextm AS (SELECT en.event_id, pn.ts AS nts2, pn.match_id AS nmid FROM en ASOF LEFT JOIN pn ON en.user_id = pn.user_id AND en.nts >= pn.nts) " +
        "SELECT prevm.event_id, prevm.ts, CASE WHEN pts IS NOT NULL AND (nts2 IS NULL OR epoch_us(prevm.ts) - epoch_us(pts) <= epoch_us(nts2) - epoch_us(prevm.ts)) " +
        "THEN pmid ELSE nmid END AS nearest_match_id " +
        "FROM prevm JOIN nextm ON prevm.event_id = nextm.event_id ORDER BY prevm.event_id"),
      scaleNote = "Still ONE user_id exchange: both directional " +
        "carries are frames over the same in-partition sort (Spark " +
        "plans one Window operator with two frame specs), so nearest " +
        "costs exactly what as-of costs — no second shuffle, no " +
        "self-join. An event at a purchase's own timestamp matches it " +
        "(tie inside prev via is_left ordering). The closest/tie pick " +
        "is integer epoch arithmetic per row. Skew composes with the " +
        "time-chunk salt as in join_asof_salted, carrying BOTH chunk " +
        "boundary structs (last-right and first-right per chunk)."),

    // Bloom-prefiltered join (r9) — the semi-join pushdown mechanism
    // Spark's own runtime filters inject, declared and hash-gated as
    // an operator: the build side's key set collapses to an m-bit
    // Bloom filter (agg_bloom_filter's md5-slice hashes so both
    // engines derive identical bits), the probe side is prefiltered
    // MAP-ONLY against the broadcast bits, and only candidates reach
    // the exact join. m is deliberately small (128) so false
    // positives EXIST at this SF and the accounting columns are
    // non-vacuous: candidates decompose exactly into members + false
    // positives, and the zero-false-negative contract (no member row
    // lost by the prefilter — the property that makes prefiltering
    // safe at all) is an emitted verdict column.
    QueryDef(
      "join_bloom_prefilter",
      (spark, sf) => {
        val m = 128
        val keys = Tables.supplier(spark, sf)
          .filter(col("s_acctbal") > 5000)
          .select(col("s_suppkey")).distinct()
        val bits = keys
          .withColumn("dg", md5(col("s_suppkey").cast("string")))
          .select(explode(array((0 until 3).map(i =>
            Aggregates.cmsBucket(col("dg"), i, m)): _*)).as("pos"))
          .distinct()
          .agg(array_sort(collect_list(col("pos"))).as("bits"))
        val probed = Tables.lineitem(spark, sf)
          .select(col("l_suppkey"), col("l_extendedprice"))
          .withColumn("dg", md5(col("l_suppkey").cast("string")))
          .crossJoin(broadcast(bits))
          .withColumn("hit", (0 until 3).map(i =>
            array_contains(col("bits"), Aggregates.cmsBucket(col("dg"), i, m)))
            .reduce(_ && _))
          .join(broadcast(keys.withColumnRenamed("s_suppkey", "l_suppkey")
            .withColumn("member", lit(true))), Seq("l_suppkey"), "left")
          .withColumn("member", coalesce(col("member"), lit(false)))
        probed.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_candidates"),
          sum(when(col("member"), 1L).otherwise(0L)).as("n_member_rows"),
          sum(when(col("hit") && !col("member"), 1L).otherwise(0L))
            .as("n_false_pos_rows"),
          (sum(when(col("member") && !col("hit"), 1L).otherwise(0L)) === 0)
            .as("no_false_neg"),
          sum(when(col("hit") && col("member"),
            graft.engine.Dsl.dec2(col("l_extendedprice"))))
            .cast(graft.engine.Dsl.D2).cast("double").as("member_revenue"))
      },
      Some("WITH ks AS (SELECT DISTINCT s_suppkey FROM supplier WHERE s_acctbal > 5000), " +
        "sl AS (SELECT unnest([0,1,2]) AS i), " +
        "bits AS (SELECT DISTINCT ('0x'||substr(md5(CAST(s_suppkey AS VARCHAR)),1+8*i,8))::BIGINT % 128 AS pos FROM ks CROSS JOIN sl), " +
        "pr AS (SELECT l_suppkey, l_extendedprice, " +
        "(('0x'||substr(md5(CAST(l_suppkey AS VARCHAR)),1,8))::BIGINT % 128) IN (SELECT pos FROM bits) " +
        "AND (('0x'||substr(md5(CAST(l_suppkey AS VARCHAR)),9,8))::BIGINT % 128) IN (SELECT pos FROM bits) " +
        "AND (('0x'||substr(md5(CAST(l_suppkey AS VARCHAR)),17,8))::BIGINT % 128) IN (SELECT pos FROM bits) AS hit, " +
        "l_suppkey IN (SELECT s_suppkey FROM ks) AS member FROM lineitem) " +
        "SELECT count(*) AS n_rows, count(*) FILTER (WHERE hit) AS n_candidates, " +
        "count(*) FILTER (WHERE member) AS n_member_rows, " +
        "count(*) FILTER (WHERE hit AND NOT member) AS n_false_pos_rows, " +
        "count(*) FILTER (WHERE member AND NOT hit) = 0 AS no_false_neg, " +
        "CAST(CAST(sum(CASE WHEN hit AND member THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS DOUBLE) AS member_revenue " +
        "FROM pr"),
      scaleNote = "The mechanism that turns a shuffle join into a " +
        "map-side massacre: the filter is m bits REGARDLESS of build " +
        "cardinality, ships by broadcast (here as one sorted " +
        "position array — 8 KB at production m), and the probe side " +
        "drops (1 − fpr) of its non-matching rows INSIDE the scan " +
        "stage, before any exchange — at 100 TB that is the " +
        "difference between shuffling 100 TB and shuffling the ~1% " +
        "that can possibly join. Spark's AQE injects exactly this " +
        "(bloom_filter_agg/might_contain, firing proven in " +
        "ExtensionsSpec); the declared operator pins the SEMANTICS " +
        "cross-engine — candidate decomposition, FPR accounting, and " +
        "the no-false-negative safety contract that makes the " +
        "rewrite sound. Production sizes m ≈ 1.44·n·log₂(1/p) and " +
        "swaps md5 slices for xxhash64."))
}
