package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{QueryDef, QueryGroup, Tables}
import graft.functions.MisraGries

/** Round-4 depth operators: warehouse/state-assembly (SCD2 merge),
  * eval-set decontamination, PII scrubbing, and a mergeable
  * heavy-hitters sketch — the remaining steps a production
  * training-data pipeline runs between raw logs and a corpus release.
  *
  * Determinism notes (SURVEY §2.0): SCD2 orders by (ts, event_id) so
  * every window is a total order; contamination shares NearDup's ONE
  * shingle definition (oracle interpolates [[NearDup.ShingleCtes]]);
  * heavy-hitters emits only order-independent invariants (the sketch
  * contents are merge-order-dependent, same policy as HLL/quantile);
  * the redaction regex `[0-9]+` parses identically in Java regex and
  * RE2, and DuckDB needs the explicit 'g' flag to match Spark's
  * replace-all semantics.
  */
object PipelineOps extends QueryGroup {

  /** Eval docs = doc_id < 16: a FIXED-SIZE holdout at every scale
    * factor (the ANN round-3 lesson — fixed sets keep broadcast sides
    * O(1) in corpus size and total work linear). */
  val EvalSetSize = 16

  /** Misra–Gries capacity: 4 < |lang domain| = 5, so the pruning path
    * actually runs, and N/(k+1) = N/5 sits between the majority
    * language (~44%) and the rest (~15%) — the heavy set is non-empty
    * and non-trivial at every SF. */
  val MgK = 4

  def defs: Seq[QueryDef] = Seq(

    // SCD2 (slowly-changing-dimension type 2) state history: collapse
    // an event log into effective-dated versions per user — the
    // point-in-time dimension every feature store / training-label
    // join needs. change-detection lag → run-id by cumulative sum →
    // interval assembly (min ts per run, valid_to = next valid_from).
    QueryDef(
      "merge_scd2",
      (spark, sf) => {
        val byUser = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id"))
        val byVersion = Window.partitionBy("user_id").orderBy("version")
        Tables.loadEvents(spark, sf)
          .withColumn("chg",
            when(col("event_type") <=> lag(col("event_type"), 1).over(byUser),
              0L).otherwise(1L))
          .withColumn("version", sum(col("chg")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "version", "event_type")
          .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
          .withColumn("valid_to", lead(col("valid_from"), 1).over(byVersion))
          .withColumn("is_current", col("valid_to").isNull)
          .select(col("user_id"), col("version"), col("event_type"),
            col("valid_from"), col("valid_to"), col("n_events"),
            col("is_current"))
          .orderBy("user_id", "version")
      },
      Some("WITH o AS (SELECT user_id, event_type, ts, event_id, CASE WHEN event_type IS NOT DISTINCT FROM lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) THEN 0 ELSE 1 END AS chg FROM events), v AS (SELECT user_id, event_type, ts, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version FROM o), g AS (SELECT user_id, CAST(version AS BIGINT) AS version, event_type, min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events FROM v GROUP BY 1,2,3) SELECT user_id, version, event_type, valid_from, lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to, n_events, (lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL) AS is_current FROM g ORDER BY user_id, version"),
      scaleNote = "Both windows and the aggregate share ONE partitioning key (user_id), so the whole assembly costs a single hash exchange; within a partition the sort is reused across lag, cumulative sum, and lead. State per key is O(1) (lag/sum are streaming-friendly frames). At 100 TB the event log is date-partitioned: run SCD2 incrementally per day and merge against yesterday's open versions (same plan, bounded input), instead of re-scanning history. Hot users skew the user_id exchange — the salting fallback (join_skew_salted) applies to the groupBy half; windows need the per-key order so AQE skew-split handles the rest."),

    // Benchmark decontamination: for every corpus doc, its maximum
    // 3-gram-shingle containment against a FIXED eval holdout —
    // the "is this training doc leaking an eval item" gate run before
    // every corpus release. Emits the best-matching eval doc and the
    // contained fraction; threshold downstream as policy dictates.
    QueryDef(
      "contamination_check",
      (spark, sf) => {
        val sh = NearDup.shingleRows(Tables.documents(spark, sf)).distinct()
        val ev = sh.filter(col("doc_id") < EvalSetSize)
          .select(col("doc_id").as("eval_id"), col("sh"))
        val co = sh.filter(col("doc_id") >= EvalSetSize)
        val nSh = co.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        // tie-break max overlap by LOWEST eval id: max(struct(ni, -id))
        co.join(broadcast(ev), "sh")
          .groupBy("doc_id", "eval_id")
          .agg(count(lit(1)).as("ni"))
          .groupBy("doc_id")
          .agg(max(struct(col("ni"), (-col("eval_id")).as("nid"))).as("b"))
          .join(nSh, "doc_id")
          .select(col("doc_id"),
            (-col("b.nid")).cast("long").as("eval_id"),
            col("b.ni").as("ni"),
            round(col("b.ni").cast("double") / col("n_sh").cast("double"), 4)
              .as("contamination"))
          .orderBy("doc_id")
      },
      Some(s"WITH ${NearDup.ShingleCtes}, ev AS (SELECT doc_id AS eval_id, g FROM s WHERE doc_id < $EvalSetSize), co AS (SELECT doc_id, n, g FROM s WHERE doc_id >= $EvalSetSize), i AS (SELECT doc_id, eval_id, count(*) AS ni, any_value(n) AS n FROM co JOIN ev USING (g) GROUP BY 1,2), b AS (SELECT doc_id, max(struct_pack(ni := ni, nid := -eval_id)) AS mx, any_value(n) AS n FROM i GROUP BY 1) SELECT doc_id, CAST(-(mx.nid) AS BIGINT) AS eval_id, CAST(mx.ni AS BIGINT) AS ni, round(CAST(mx.ni AS DOUBLE) / n, 4) AS contamination FROM b ORDER BY doc_id"),
      scaleNote = "The eval holdout is FIXED-SIZE (a benchmark suite: thousands of docs), so its shingle set broadcasts O(1) in corpus size and the containment join is map-side — the 100 TB corpus is scanned once, no shuffle of corpus shingles against anything growing. Per-doc rollups shuffle |docs| partials keyed by doc_id. At full scale hash shingles to 8 bytes first (ngram_jaccard's trick) so the broadcast table and join keys are fixed-width; a bloom filter over eval shingles in the scan prunes the 99% of corpus shingles that hit nothing before the exact probe."),

    // PII scrubbing: redact digit runs from the free-form props
    // payload and count redactions — the compliance pass before text
    // enters a training corpus. Pure map-side codegen'd regex; the
    // conservative pattern parses identically in Java regex and RE2.
    QueryDef(
      "text_pii_redact",
      (spark, sf) =>
        Tables.loadEvents(spark, sf)
          .select(col("event_id"),
            regexp_replace(col("props"), "[0-9]+", "#").as("redacted"),
            regexp_count(col("props"), lit("[0-9]+")).cast("long")
              .as("n_hits"))
          .orderBy("event_id"),
      Some("SELECT event_id, regexp_replace(props, '[0-9]+', '#', 'g') AS redacted, CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT) AS n_hits FROM events ORDER BY event_id"),
      scaleNote = "Map-only: one codegen'd regex pass per row, zero shuffle, zero state — scrubbing 100 TB costs exactly one scan+rewrite and parallelizes to any executor count (the orderBy exists only for the deterministic oracle; production writes partition-local). Swap in the full PII pattern bank (emails, phones, SSNs) as additional regexp_replace stages in the same projection — still one pass."),

    // Mergeable heavy-hitters (Misra–Gries) over the language column,
    // verdict-oracled: the sketch SET is merge-order-dependent, so the
    // declared row carries the exact stream stats the oracle recomputes
    // plus the three MG invariants as booleans (est ≤ true,
    // true − est ≤ N/(k+1), every-heavy-term-present, ≤ k kept) that
    // hold for EVERY partition layout — same policy as the HLL and
    // quantile sketch verdicts.
    QueryDef(
      "agg_heavy_hitters",
      (spark, sf) => {
        val docs = Tables.documents(spark, sf)
        import spark.implicits._
        val kept = docs.select(col("lang")).as[String]
          .select(new MisraGries(MgK).toColumn.name("m"))
          .select(explode(col("m")).as(Seq("term", "est")))
        val exact = docs.groupBy(col("lang").as("term"))
          .agg(count(lit(1)).as("freq"))
        val total = docs.agg(count(lit(1)).as("n"))
        val heavy = col("freq") * (MgK + 1) > col("n") // freq > N/(k+1)
        exact.join(kept, Seq("term"), "left")
          .crossJoin(broadcast(total))
          .agg(
            max(col("n")).as("n"),
            sum(when(heavy, 1L).otherwise(0L)).as("n_heavy"),
            bool_and(when(heavy, col("est").isNotNull).otherwise(lit(true)))
              .as("heavy_all_present"),
            bool_and(when(col("est").isNotNull,
              col("est") <= col("freq") &&
                (col("freq") - col("est")) * (MgK + 1) <= col("n"))
              .otherwise(lit(true))).as("bounds_ok"),
            (sum(when(col("est").isNotNull, 1L).otherwise(0L)) <= MgK)
              .as("capacity_ok"))
      },
      Some(s"WITH f AS (SELECT lang, count(*) AS freq FROM documents GROUP BY 1), x AS (SELECT count(*) AS n FROM documents) SELECT max(n) AS n, CAST(sum(CASE WHEN freq * ${MgK + 1} > n THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy, TRUE AS heavy_all_present, TRUE AS bounds_ok, TRUE AS capacity_ok FROM f CROSS JOIN x"),
      scaleNote = "MG partials are ≤ k entries per partition REGARDLESS of rows or vocabulary — the top-terms question over 100 TB ships O(k) bytes per partition through one tiny shuffle, where an exact top-terms must shuffle the whole (term, count) vocabulary. merge subtracts the (k+1)-th largest count, preserving the N/(k+1) error bound (mergeable-summaries result). The exact per-language counts here exist ONLY to oracle the invariants at test scale; production reads the sketch alone. For real corpora run it over tokens (k=10^4): same plan, still KB-size partials."))
}
