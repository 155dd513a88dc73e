package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{QueryDef, QueryGroup, Tables}

/** Behavioral sequence mining over sessionized event streams — the
  * "what do users actually do" layer on top of ts_session's islands:
  * top navigation paths and first-order Markov transitions. The
  * reference analog is trip-trajectory analysis (ordered stop calls of
  * one train = ordered events of one session [P query.py trip_stops —
  * SURVEY §1.1]); the corpus-scale need is curriculum/ordering
  * analysis over interaction logs.
  *
  * Both operators reuse [[TimeSeriesDedup.sessionIslands]] — the ONE
  * sessionization definition in the repo (30-min gap, (ts, event_id)
  * total order), so path semantics can never drift from ts_session /
  * stream_session.
  *
  * Cross-engine determinism: paths are built from a (ts, event_id)
  * ORDERED aggregation — event_id is unique, so the order is total on
  * both engines; transition probabilities are one integer÷integer
  * double division, identical IEEE on both, rounded to 6.
  */
object PathOps extends QueryGroup {

  /** Island SQL carrying event_id + event_type through (the shared
    * [[TimeSeriesDedup.SessionIslandsSql]] projects them away). Same
    * gap rule, same total order. */
  private val IslandsSql: String =
    "SELECT user_id, ts, event_id, event_type, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM (SELECT user_id, ts, event_id, event_type, CASE WHEN epoch_us(ts) - epoch_us(lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)) > 1800000000 OR lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) IS NULL THEN 1 ELSE 0 END AS is_new FROM events)"

  def defs: Seq[QueryDef] = Seq(

    // Top session paths: per session, the ordered event_type sequence
    // truncated to the first 8 steps (bounding the key width — an
    // unbounded path string is a skew/memory hazard, and step 9+ adds
    // no pattern signal), then a count-per-path top-20.
    QueryDef(
      "path_patterns",
      (spark, sf) => {
        val s = TimeSeriesDedup.sessionIslands(Tables.loadEvents(spark, sf))
        s.groupBy("user_id", "session_id")
          .agg(array_join(
            transform(
              slice(array_sort(collect_list(
                struct(col("ts"), col("event_id"), col("event_type")))), 1, 8),
              x => x.getField("event_type")),
            ">").as("path"))
          .groupBy("path")
          .agg(count(lit(1)).as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path").asc)
          .limit(20)
      },
      Some("SELECT path, count(*) AS n_sessions FROM (SELECT user_id, session_id, array_to_string(list_slice(list(event_type ORDER BY ts, event_id), 1, 8), '>') AS path FROM (" +
        IslandsSql + ") GROUP BY user_id, session_id) GROUP BY path ORDER BY n_sessions DESC, path ASC LIMIT 20"),
      scaleNote = "Two hash aggs after the one user_id window shuffle " +
        "sessionIslands already pays: the per-session agg is keyed on " +
        "(user, session) — same partitioning as the window, no extra " +
        "shuffle with AQE — and the path agg's key space is bounded " +
        "(|event_types|^8 theoretical, tiny observed), so the second " +
        "agg's map-side combine collapses almost everything before the " +
        "wire. The 8-step slice caps both string width and collect_list " +
        "state; top-20 compiles to TakeOrderedAndProject. At 100 TB " +
        "the only heavy stage is the sessionization shuffle itself, " +
        "shared with ts_session."),

    // First-order Markov transition matrix within sessions: for each
    // (src → dst) adjacent pair, the count and the conditional
    // probability P(dst | src). The session boundary matters: a
    // transition across a 30-min gap is not a transition.
    QueryDef(
      "markov_transitions",
      (spark, sf) => {
        val s = TimeSeriesDedup.sessionIslands(Tables.loadEvents(spark, sf))
        val w = Window.partitionBy("user_id", "session_id")
          .orderBy(col("ts").asc, col("event_id").asc)
        val pairs = s
          .withColumn("dst", lead(col("event_type"), 1).over(w))
          .filter(col("dst").isNotNull)
          .select(col("event_type").as("src"), col("dst"))
        pairs.groupBy("src", "dst")
          .agg(count(lit(1)).as("n"))
          .withColumn("p", round(
            col("n").cast("double") /
              sum(col("n")).over(Window.partitionBy("src")).cast("double"), 6))
          .orderBy("src", "dst")
      },
      Some("SELECT src, dst, n, round(CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE), 6) AS p FROM (SELECT src, dst, count(*) AS n FROM (SELECT event_type AS src, lead(event_type, 1) OVER (PARTITION BY user_id, session_id ORDER BY ts ASC, event_id ASC) AS dst FROM (" +
        IslandsSql + ")) WHERE dst IS NOT NULL GROUP BY src, dst) ORDER BY src, dst"),
      scaleNote = "The lead() rides the SAME (user_id) shuffle and sort " +
        "sessionIslands already paid — partitionBy (user, session) is a " +
        "refinement of the island window, so Spark reuses the exchange. " +
        "Output is |event_types|² rows; the normalizing window runs on " +
        "that aggregate, not the corpus. At 100 TB this is one " +
        "sessionization shuffle + a map-side-combined pair agg — the " +
        "transition matrix of a trillion events is still KB-sized.")
  )
}
