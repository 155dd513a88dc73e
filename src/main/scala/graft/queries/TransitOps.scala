package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{QueryDef, QueryGroup}
import graft.functions.Gtfs

/** The reference domain's one genuinely non-standard scalar family,
  * under the driver hash gate: GTFS past-midnight times (`"25:10:00"`
  * is a legal departure — hour ≥ 24 means "past midnight of the
  * service day"), the Paris service-day attribution rule (a 01:10
  * passage belongs to YESTERDAY's service), and UIC-7 → UIC-8 station
  * id completion via the Luhn check digit [P utils_misc.py
  * DateConverter · match_ids.py station normalization — SURVEY §1.2,
  * §2.4].
  *
  * The driver's synthetic tables carry no GTFS strings, so the input
  * is a CONSTANT inline schedule (source_passages_board's fixture
  * pattern, SourceOps.scala) chosen to pin every boundary: plain
  * daytime, 23:59:59, 24:00:30, 25:10:00, 26:59:59, exactly-cutover
  * 03:00, exactly-27:00 (the first second attributed to the NEXT
  * service day), and month/year rollovers. The Spark side runs the
  * SHIPPED functions (Gtfs.gtfsSeconds/gtfsTime/serviceDay/uic8); the
  * oracle restates them independently (split_part arithmetic, epoch-µs
  * timestamp build, fixed-width-7 Luhn expansion), so hash equality
  * gates the shipped scalar semantics, not a copy of them.
  */
object TransitOps extends QueryGroup {

  /** (trip_id, service date, GTFS departure string, UIC-7 station). */
  private val Sched: Seq[(Long, String, String, String)] = Seq(
    (1L, "2026-08-09", "05:30:00", "8738400"),
    (2L, "2026-08-09", "23:59:59", "8739300"),
    (3L, "2026-08-09", "24:00:30", "8775801"),
    (4L, "2026-08-09", "25:10:00", "8738400"),
    (5L, "2026-08-09", "26:59:59", "8711300"),
    (6L, "2026-08-10", "03:00:00", "8727100"),
    (7L, "2026-08-10", "27:00:00", "8738287"),
    (8L, "2026-08-31", "25:45:10", "8700001"),
    (9L, "2026-12-31", "24:30:00", "8712345"),
    (10L, "2026-02-28", "12:00:00", "8765432"))

  private def schedValues: String =
    Sched.map { case (t, d, dep, u) => s"($t, '$d', '$dep', '$u')" }
      .mkString(", ")

  def defs: Seq[QueryDef] = Seq(

    // Per scheduled stop: seconds-since-service-day-start, the
    // round-tripped GTFS string (gtfsTime ∘ gtfsSeconds must be
    // identity on canonical input), the actual wall-clock timestamp,
    // the service day re-derived from that timestamp by the 03:00
    // cutover rule, and the Luhn-completed UIC-8 id.
    QueryDef(
      "fn_gtfs_day",
      (spark, _) => {
        import spark.implicits._
        val sched = Sched.toDF("trip_id", "svc_date", "dep", "uic7")
        val depSecs = Gtfs.gtfsSeconds(col("dep"))
        val act = timestamp_seconds(
          to_timestamp(col("svc_date")).cast("long") + col("dep_secs"))
        sched
          .withColumn("dep_secs", depSecs)
          .withColumn("act", act)
          .select(
            col("trip_id"),
            col("dep_secs"),
            Gtfs.gtfsTime(col("dep_secs")).as("dep_rt"),
            date_format(col("act"), "yyyy-MM-dd HH:mm:ss").as("actual_ts"),
            Gtfs.serviceDay(col("act")).cast("string").as("service_day"),
            Gtfs.uic8(col("uic7")).as("uic8"))
          .orderBy("trip_id")
      },
      Some("WITH sched(trip_id, svc_date, dep, uic7) AS (VALUES " +
        schedValues + "), " +
        "x AS (SELECT CAST(trip_id AS BIGINT) AS trip_id, svc_date, uic7, " +
        "CAST(split_part(dep,':',1) AS BIGINT)*3600 + " +
        "CAST(split_part(dep,':',2) AS BIGINT)*60 + " +
        "CAST(split_part(dep,':',3) AS BIGINT) AS dep_secs FROM sched), " +
        "y AS (SELECT *, make_timestamp(epoch_us(CAST(svc_date AS TIMESTAMP)) + dep_secs*1000000) AS act, " +
        "CAST(substr(uic7,1,1) AS INT) AS d1, CAST(substr(uic7,2,1) AS INT) AS d2, " +
        "CAST(substr(uic7,3,1) AS INT) AS d3, CAST(substr(uic7,4,1) AS INT) AS d4, " +
        "CAST(substr(uic7,5,1) AS INT) AS d5, CAST(substr(uic7,6,1) AS INT) AS d6, " +
        "CAST(substr(uic7,7,1) AS INT) AS d7 FROM x) " +
        "SELECT trip_id, dep_secs, " +
        "lpad(CAST(dep_secs//3600 AS VARCHAR),2,'0') || ':' || " +
        "lpad(CAST((dep_secs%3600)//60 AS VARCHAR),2,'0') || ':' || " +
        "lpad(CAST(dep_secs%60 AS VARCHAR),2,'0') AS dep_rt, " +
        "strftime(act, '%Y-%m-%d %H:%M:%S') AS actual_ts, " +
        "CAST(CAST(act - INTERVAL 3 HOUR AS DATE) AS VARCHAR) AS service_day, " +
        "uic7 || CAST((10 - (" +
        "(CASE WHEN d7*2>9 THEN d7*2-9 ELSE d7*2 END) + d6 + " +
        "(CASE WHEN d5*2>9 THEN d5*2-9 ELSE d5*2 END) + d4 + " +
        "(CASE WHEN d3*2>9 THEN d3*2-9 ELSE d3*2 END) + d2 + " +
        "(CASE WHEN d1*2>9 THEN d1*2-9 ELSE d1*2 END)) % 10) % 10 AS VARCHAR) AS uic8 " +
        "FROM y ORDER BY trip_id"),
      scaleNote = "Pure per-row scalar composition — no shuffle, no " +
        "state; the whole expression tree is codegen'd Column math " +
        "(split/cast/interval/lpad), so at 100 TB it rides the scan " +
        "at wire speed inside WholeStageCodegen. The constant VALUES " +
        "input is only the verification fixture: in production these " +
        "scalars decorate the stop_times scan (the reference's " +
        "build_stop_times_ext analog) and the service-day column " +
        "becomes the natural DATE partition key for the output table " +
        "— the cutover rule is what keeps a past-midnight train's rows " +
        "in the same partition as its service day, which is exactly " +
        "what makes downstream per-day compaction and retention " +
        "single-partition operations."))
}
