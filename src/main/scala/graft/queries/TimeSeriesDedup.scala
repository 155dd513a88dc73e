package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{Dsl, QueryDef, QueryGroup, Tables}
import Dsl._

/** Deduplication / latest-state / batch time-series — SURVEY.md §2.1
  * #40-42 and #50-51.
  *
  * Reference analog: the Dynamo/Mongo keyed-upsert core (latest record
  * per day+station+train), the "current station board" state, polling-
  * cycle bucketing and trip sessionization [P utils_dynamo.py,
  * query.py, extract_api.py operate_multiple_cycles, match_ids.py —
  * SURVEY.md §0].
  */
object TimeSeriesDedup extends QueryGroup {

  val Seed = 42L

  /** Per-language sampling rate for the stratified mix (unmapped
    * classes are dropped: rate 0). */
  val StratRates: Seq[(String, Double)] = Seq(
    "en" -> 0.5, "fr" -> 0.5, "de" -> 0.2, "es" -> 0.2, "zh" -> 0.2)

  def stratRate(lang: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    StratRates.foldLeft(lit(0.0)) { case (acc, (l, f)) =>
      when(lang === l, f).otherwise(acc)
    }

  /** THE per-row Bernoulli coin flip — the single predicate both
    * [[sampleFraction]] and the sample_fraction determinism verdict
    * instantiate, so the verdict always covers the shipped code path
    * (a seed or threshold regression here fails the declared query,
    * not just the spec). */
  def samplePredicate(f: Double, seed: Long): org.apache.spark.sql.Column =
    rand(seed) < f

  /** Scan-side seeded Bernoulli sample: a per-row coin flip, no
    * shuffle, no count pass — deterministic for a fixed seed and
    * partition layout. The raw sampling primitive behind the
    * sample_fraction verdict query. */
  def sampleFraction(df: org.apache.spark.sql.DataFrame, f: Double,
      seed: Long): org.apache.spark.sql.DataFrame =
    df.filter(samplePredicate(f, seed))

  /** Stratified Bernoulli sample: the rate is a CASE over the stratum
    * column inside the same scan-side filter. */
  def sampleStratified(docs: org.apache.spark.sql.DataFrame,
      seed: Long): org.apache.spark.sql.DataFrame =
    docs.filter(rand(seed) < stratRate(col("lang")))

  /** THE sessionization definition (30-min gap, ties broken by
    * event_id): lag + cumulative-sum islands assigning (user_id, ts,
    * session_id) — one Scala + one SQL rendering shared by ts_session
    * and Analytics.peak_concurrency so the two can never drift. */
  def sessionIslands(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val running = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("gap_us",
        unix_micros(col("ts").cast("timestamp")) -
          unix_micros(lag(col("ts"), 1).over(byTime).cast("timestamp")))
      .withColumn("is_new",
        when(col("gap_us").isNull || col("gap_us") > 1800000000L, lit(1)).otherwise(lit(0)))
      .withColumn("session_id", sum(col("is_new")).over(running))
  }

  val SessionIslandsSql: String =
    "SELECT user_id, ts, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM (SELECT user_id, ts, event_id, CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) > 1800000000 OR lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL THEN 1 ELSE 0 END AS is_new FROM events)"

  /** Session intervals (user_id, session_id, st, en) from the shared
    * island assignment. */
  def sessionBounds(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sessionIslands(ev)
      .groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))

  def defs: Seq[QueryDef] = Seq(

    // #40 — SELECT DISTINCT on a projection.
    QueryDef(
      "distinct_rows",
      (spark, sf) =>
        Tables.loadEvents(spark, sf)
          .select("user_id", "event_type")
          .distinct()
          .orderBy("user_id", "event_type"),
      Some("SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type"),
      scaleNote = "Distinct = hash-aggregate on all columns with map-side partial dedup; wire volume is |distinct| per partition, not |rows|."),

    // #41 — keyed dedup keeping a deterministic winner. NEVER bare
    // dropDuplicates: its winner is whichever row a partition happens
    // to see first. row_number over an explicit total order per key is
    // the upsert-by-primary-key analog made reproducible.
    QueryDef(
      "dedup_keep_first",
      (spark, sf) => {
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(col("event_id").asc)
        Tables.loadEvents(spark, sf)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_type", "event_id", "ts", "value")
          .orderBy("user_id", "event_type")
      },
      Some("SELECT user_id, event_type, event_id, ts, value FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id ASC) AS rn FROM events) WHERE rn = 1 ORDER BY user_id, event_type"),
      scaleNote = "One shuffle on the dedup key, per-partition sort, keep rank 1. Catalyst's WindowGroupLimit prunes each group to 1 row during the sort. At 100 TB, pre-bucketing by the key removes the shuffle."),

    // #42 — latest state per key: the current-station-board semantic.
    // Aggregate form (struct-max), not a window: no sort, merges
    // associatively — the right shape for a 100 TB latest-state scan.
    // event_id in the struct breaks any ts tie deterministically.
    QueryDef(
      "last_state",
      (spark, sf) =>
        Tables.loadEvents(spark, sf)
          .groupBy("user_id")
          .agg(max(struct(
            col("ts").as("t"), col("event_id").as("e"),
            col("event_type").as("ty"), col("value").as("v"))).as("s"))
          .select(
            col("user_id"),
            col("s.t").as("last_ts"), col("s.e").as("last_event_id"),
            col("s.ty").as("last_type"), col("s.v").as("last_value"))
          .orderBy("user_id"),
      Some("SELECT user_id, s.t AS last_ts, s.e AS last_event_id, s.ty AS last_type, s.v AS last_value FROM (SELECT user_id, max(struct_pack(t := ts, e := event_id, ty := event_type, v := value)) AS s FROM events GROUP BY user_id) ORDER BY user_id"),
      scaleNote = "Struct-max is a 2-phase agg: map-side partials keep one candidate per key per partition, the shuffle carries |keys| rows. A window version would sort every partition; this doesn't."),

    // Seeded Bernoulli sampling — the corpus-subsampling pass of a
    // training-data pipeline. The sampled ROWS depend on Spark's PRNG
    // (not reproducible in DuckDB), so the declared query emits the
    // sketch-style verdict rows (SURVEY §2.0): the exact population
    // count the oracle recomputes, a binomial rate-tolerance boolean
    // (|k − f·n| ≤ 2 + 4σ — layout-robust: any partition layout keeps
    // a correct sampler inside 4σ), and a same-seed determinism
    // boolean. The raw sample is `sampleFraction`, tested in
    // OperatorPropertiesSpec.
    QueryDef(
      "sample_fraction",
      (spark, sf) => {
        // ONE scan, ONE aggregation carries all three verdicts. The
        // determinism check instantiates sampleFraction's OWN predicate
        // builder (samplePredicate — the exact expression the shipped
        // sampler filters on) TWICE in the same projection — rand is
        // non-deterministic, so Catalyst does NOT common-subexpression
        // them: each rand(Seed) gets its own RNG initialized from
        // (seed, partitionId) and advanced per row, exactly like two
        // separate sampleFraction runs over the same layout — and
        // asserts the per-row flips agree (min over equality = AND).
        // Row-aligned agreement is strictly stronger than the r4
        // set-equality check, which evaluated the sampler twice PLUS
        // two exceptAll scans: four lineitem passes where one
        // suffices (0.54 s → one-scan).
        Tables.lineitem(spark, sf)
          .select(samplePredicate(0.1, Seed).as("s1"),
            samplePredicate(0.1, Seed).as("s2"))
          .agg(count(lit(1)).as("n"), sum(col("s1").cast("long")).as("k"),
            min((col("s1") === col("s2")).cast("int")).as("same"))
          // both verdict rows unfold from the ONE aggregate row — a
          // union of two selects over it would re-run the scan per arm
          .select(explode(array(
            struct(lit("deterministic").as("metric"),
              lit(null).cast("long").as("n"), (col("same") === 1).as("ok")),
            struct(lit("rate_in_tol").as("metric"), col("n"),
              (abs(col("k") - col("n") * 0.1) <=
                lit(2.0) + lit(4.0) * sqrt(lit(0.1 * 0.9) * col("n")))
                .as("ok")))).as("r"))
          .select(col("r.metric").as("metric"), col("r.n").as("n"),
            col("r.ok").as("ok"))
          .orderBy("metric")
      },
      Some("SELECT * FROM (SELECT 'deterministic' AS metric, CAST(NULL AS BIGINT) AS n, TRUE AS ok UNION ALL SELECT 'rate_in_tol' AS metric, count(*) AS n, TRUE AS ok FROM lineitem) ORDER BY metric"),
      scaleNote = "Bernoulli sampling is a per-row coin flip in the scan — no shuffle, no count pass; at 100 TB this is the only affordable subsample (exact-size sampling needs a global sort or reservoir). The verdict harness adds one map-side-combined count aggregate."),

    // Stratified sampling: per-class quotas (balance a training mix).
    // Verdict rows per stratum: exact class count + per-stratum
    // binomial rate tolerance (same 2 + 4σ bound as sample_fraction).
    QueryDef(
      "sample_stratified",
      (spark, sf) =>
        Tables.documents(spark, sf)
          .withColumn("f", stratRate(col("lang")))
          .withColumn("s", (rand(Seed) < col("f")).cast("long"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("s")).as("k"),
            max(col("f")).as("f"))
          .select(col("lang"), col("n_docs"),
            (abs(col("k") - col("f") * col("n_docs")) <=
              lit(2.0) + lit(4.0) *
                sqrt(col("f") * (lit(1.0) - col("f")) * col("n_docs")))
              .as("rate_in_tol"))
          .orderBy("lang"),
      Some("SELECT lang, count(*) AS n_docs, TRUE AS rate_in_tol FROM documents GROUP BY lang ORDER BY lang"),
      scaleNote = "The stratum rate is a CASE over the class column inside the same scan-side Bernoulli filter — still no shuffle, no per-class pass. The language-rebalancing pass of a pre-training mix at corpus scale."),

    // #50 — tumbling time buckets: the N-minute polling cycle rollup.
    // Batch twin of stream_tumbling (§2.3).
    QueryDef(
      "ts_tumbling",
      (spark, sf) =>
        Tables.loadEvents(spark, sf)
          .groupBy(date_trunc("hour", col("ts")).as("bucket"))
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            sumDec2(col("value")).cast("double").as("sum_value"))
          .orderBy("bucket"),
      Some("SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, count(*) AS n_events, count(DISTINCT user_id) AS n_users, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value FROM events GROUP BY 1 ORDER BY bucket"),
      scaleNote = "date_trunc is a codegen'd scalar, so this is a plain 2-phase hash agg keyed on the bucket — time bucketing costs nothing beyond the agg itself. Buckets are naturally ordered for range-partitioned output."),

    // #50b — SLIDING time windows (1h window, 15min slide): the batch
    // twin of stream_sliding, closing SURVEY §7 risk 5 (the recipe it
    // prescribes: slide offsets on the oracle side via an unnest join,
    // Spark side via the native multi-assign window()). Each event
    // lands in window_len/slide = 4 windows on both engines; window
    // grids agree because both align to an epoch on the 15-min grid.
    QueryDef(
      "ts_sliding",
      (spark, sf) =>
        Tables.loadEvents(spark, sf)
          .groupBy(window(col("ts"), "1 hour", "15 minutes"))
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            sumDec2(col("value")).cast("double").as("sum_value"))
          .select(col("window.start").as("bucket"),
            col("n_events"), col("n_users"), col("sum_value"))
          .orderBy("bucket"),
      Some("SELECT bucket, count(*) AS n_events, count(DISTINCT user_id) AS n_users, CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value FROM (SELECT time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS bucket, user_id, value FROM events, (SELECT unnest([0,1,2,3]) AS k)) GROUP BY bucket ORDER BY bucket"),
      scaleNote = "window(len, slide) expands each row to len/slide bucket keys before the same 2-phase hash agg as ts_tumbling — wire volume is 4x rows but the expansion is map-side and fuses into codegen; no extra shuffle vs tumbling. At 100 TB prefer the coarsest slide the product tolerates (cost is linear in len/slide), or aggregate tumbling at slide granularity and roll 4 adjacent buckets up in a second tiny agg."),

    // #51 — sessionization via lag + cumulative-sum islands: trip
    // segmentation from passage gaps. Batch twin of stream_session.
    QueryDef(
      "ts_session",
      (spark, sf) =>
        sessionIslands(Tables.loadEvents(spark, sf))
          .groupBy("user_id", "session_id")
          .agg(
            count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"))
          .orderBy("user_id", "session_id"),
      Some(s"SELECT user_id, session_id, count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end FROM ($SessionIslandsSql) GROUP BY user_id, session_id ORDER BY user_id, session_id"),
      scaleNote = "lag + cumsum islands: one shuffle on user_id serves both windows (same spec), then a hash agg on (user, session). The streaming twin (session_window / flatMapGroupsWithState) shares semantics — parity-tested in §5."),

    // #51b — gap-fill resample: one row per (user, day) over the full
    // corpus span, forward-filling the day's last observed value (ties
    // on ts broken by event_id, the last_state rule). The daily
    // station-board snapshot: state tracking between observations.
    QueryDef(
      "ts_resample",
      (spark, sf) => {
        val ev = Tables.loadEvents(spark, sf)
        val bounds = ev.agg(
          date_trunc("day", min(col("ts"))).as("d0"),
          date_trunc("day", max(col("ts"))).as("d1"))
        val grid = ev.select(col("user_id")).distinct()
          .crossJoin(broadcast(bounds))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"),
              expr("interval 1 day"))).as("day"))
        val daily = ev
          .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("s"))
          .select(col("user_id"), col("day"), col("s.value").as("day_val"))
        grid.join(daily, Seq("user_id", "day"), "left")
          .withColumn("value", last(col("day_val"), ignoreNulls = true).over(
            Window.partitionBy("user_id").orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("user_id"), col("day"), col("value"))
          .orderBy("user_id", "day")
      },
      Some("WITH b AS (SELECT date_trunc('day', min(ts)) AS d0, date_trunc('day', max(ts)) AS d1 FROM events), u AS (SELECT DISTINCT user_id FROM events), g AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM u CROSS JOIN b), dl AS (SELECT user_id, day, value FROM (SELECT user_id, date_trunc('day', ts) AS day, value, row_number() OVER (PARTITION BY user_id, date_trunc('day', ts) ORDER BY ts DESC, event_id DESC) AS rn FROM events) WHERE rn = 1), j AS (SELECT g.user_id, g.day, dl.value FROM g LEFT JOIN dl ON g.user_id = dl.user_id AND g.day = dl.day) SELECT user_id, CAST(day AS TIMESTAMP) AS day, last_value(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value FROM j ORDER BY user_id, day"),
      scaleNote = "Grid size is |users| x |days| — independent of event count, so the explode never outgrows the dimension product. Daily-last is a 2-phase struct-max agg that collapses events to |users| x |active days| rows, which the planner broadcasts against the grid (measured plan: BroadcastHashJoin + one window exchange). If the daily side outgrows broadcast at 100 TB, pre-partition both sides by user_id: hash(user_id) satisfies the (user_id, day) join clustering AND the fill window's partitioning, so one exchange serves both. Forward fill copies stored doubles — zero float arithmetic to skew."),

    // Linear-interpolation gap fill: ts_resample's grid, but gap days
    // take the straight line between the surrounding observations
    // evaluated at the day boundary (numeric sensors), not a copy of
    // the stale value. Anchors: previous day's LAST observation and
    // next day's FIRST (resample's struct-max/min tie rule); days
    // with data emit their actual daily-last; days before the first /
    // after the last observation stay 'none'. The time fraction is a
    // ratio of exact BIGINT microsecond differences, and the one
    // float expression is written identically in both engines, so
    // round(,4) hash-matches (ts_anomaly's precedent).
    QueryDef(
      "ts_interpolate",
      (spark, sf) => {
        val ev = Tables.loadEvents(spark, sf)
        val bounds = ev.agg(
          date_trunc("day", min(col("ts"))).as("d0"),
          date_trunc("day", max(col("ts"))).as("d1"))
        val grid = ev.select(col("user_id")).distinct()
          .crossJoin(broadcast(bounds))
          .select(col("user_id"),
            explode(sequence(col("d0"), col("d1"),
              expr("interval 1 day"))).as("day"))
        val daily = ev
          .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("l"),
            min(struct(col("ts"), col("event_id"), col("value"))).as("f"))
          .select(col("user_id"), col("day"),
            col("l.ts").as("l_ts"), col("l.value").as("l_v"),
            col("f.ts").as("f_ts"), col("f.value").as("f_v"))
        val wPrev = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, -1)
        val wNext = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(1, Window.unboundedFollowing)
        val frac =
          (expr("unix_micros(CAST(day AS TIMESTAMP))") -
            expr("unix_micros(CAST(p_ts AS TIMESTAMP))")).cast("double") /
            (expr("unix_micros(CAST(n_ts AS TIMESTAMP))") -
              expr("unix_micros(CAST(p_ts AS TIMESTAMP))")).cast("double")
        grid.join(daily, Seq("user_id", "day"), "left")
          .withColumn("p_ts", last(col("l_ts"), ignoreNulls = true).over(wPrev))
          .withColumn("p_v", last(col("l_v"), ignoreNulls = true).over(wPrev))
          .withColumn("n_ts", first(col("f_ts"), ignoreNulls = true).over(wNext))
          .withColumn("n_v", first(col("f_v"), ignoreNulls = true).over(wNext))
          .select(col("user_id"), col("day"),
            when(col("l_v").isNotNull, lit("actual"))
              .when(col("p_v").isNotNull && col("n_v").isNotNull, lit("interp"))
              .otherwise(lit("none")).as("status"),
            when(col("l_v").isNotNull, col("l_v"))
              .when(col("p_v").isNotNull && col("n_v").isNotNull,
                round(col("p_v") + (col("n_v") - col("p_v")) * frac, 4))
              .as("value"))
          .orderBy("user_id", "day")
      },
      Some("WITH b AS (SELECT date_trunc('day', min(ts)) AS d0, date_trunc('day', max(ts)) AS d1 FROM events), u AS (SELECT DISTINCT user_id FROM events), g AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM u CROSS JOIN b), d AS (SELECT user_id, date_trunc('day', ts) AS day, ts, value, row_number() OVER (PARTITION BY user_id, date_trunc('day', ts) ORDER BY ts DESC, event_id DESC) AS rl, row_number() OVER (PARTITION BY user_id, date_trunc('day', ts) ORDER BY ts ASC, event_id ASC) AS rf FROM events), dd AS (SELECT user_id, day, max(CASE WHEN rl=1 THEN ts END) AS l_ts, max(CASE WHEN rl=1 THEN value END) AS l_v, max(CASE WHEN rf=1 THEN ts END) AS f_ts, max(CASE WHEN rf=1 THEN value END) AS f_v FROM d GROUP BY 1,2), j AS (SELECT g.user_id, g.day, dd.l_ts, dd.l_v, dd.f_ts, dd.f_v FROM g LEFT JOIN dd ON g.user_id=dd.user_id AND g.day=dd.day), w AS (SELECT user_id, day, l_v, last_value(l_ts IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p_ts, last_value(l_v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS p_v, first_value(f_ts IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS n_ts, first_value(f_v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS n_v FROM j) SELECT user_id, CAST(day AS TIMESTAMP) AS day, CASE WHEN l_v IS NOT NULL THEN 'actual' WHEN p_v IS NOT NULL AND n_v IS NOT NULL THEN 'interp' ELSE 'none' END AS status, CASE WHEN l_v IS NOT NULL THEN l_v WHEN p_v IS NOT NULL AND n_v IS NOT NULL THEN round(p_v + (n_v - p_v) * (CAST(epoch_us(day) - epoch_us(p_ts) AS DOUBLE) / CAST(epoch_us(n_ts) - epoch_us(p_ts) AS DOUBLE)), 4) END AS value FROM w ORDER BY user_id, day"),
      scaleNote = "Same scale shape as ts_resample (grid = |users| x |days|, daily anchors from one 2-phase struct-max/min agg, broadcast join onto the grid) plus two bounded-frame-free windows over the grid — both partitioned by user_id, so the resample remedy applies verbatim: pre-partition by user_id once and one exchange serves the join and both windows. The interpolation arithmetic is a per-row map over grid rows: BIGINT microsecond differences, one double division written identically in both engines — nothing in the fill step scales with event count."))
}
