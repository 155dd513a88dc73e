package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{QueryDef, QueryGroup}
import graft.functions.Gtfs
import graft.domain.Transit

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

  // ------------------------------------------------------------------
  // delay_board fixture — the EP1 end-to-end corpus. One constant day
  // of feed + schedule chosen so every branch of the pipeline carries
  // at least one row: a late train across four polling cycles (incl. a
  // re-poll with UNCHANGED expected time), a cancellation, a
  // past-midnight trip on an exception-added service, an ambiguous
  // train number (two candidate trips → unmatched), a loop trip (one
  // trip, two calls at the station → still unique), an early train
  // (negative delay), a train on a not-active-that-day service, one on
  // a service REMOVED by exception that day, and a number matching no
  // trip at all. 2017-05-20 is a Saturday.
  // ------------------------------------------------------------------

  private val BoardDay = "20170520"

  /** (trip_id, service_id) — route/headsign omitted: the board never
    * reads them, and the oracle restates only what flows through. */
  private val BoardTrips: Seq[(String, String)] = Seq(
    ("DUASN165109F01", "S_WEEK"), // late train, four polling cycles
    ("DUASN134683F01", "S_WEEK"), // cancelled (Supprimé, flagged not dropped)
    ("DUASN200100F01", "S_EXC"),  // past-midnight dep, exception-added service
    ("DUASN555001F01", "S_WEEK"), // both contain "5550" → ambiguous
    ("DUASN555002F01", "S_WEEK"),
    ("DUASN777100F01", "S_WEEK"), // loop: one trip, two calls at one stop
    ("DUASN888200F01", "S_SUN"),  // service not active on a Saturday
    ("DUASN300400F01", "S_WEEK"), // runs ahead of schedule (negative delay)
    ("DUASN400500F01", "S_XRM"))  // service removed by exception that day

  /** (trip_id, departure_time, stop_id, stop_sequence). */
  private val BoardStopTimes: Seq[(String, String, String, Int)] = Seq(
    ("DUASN165109F01", "12:09:00", "StopPoint:DUA8738400", 1),
    ("DUASN134683F01", "12:14:00", "StopPoint:DUA8738400", 1),
    ("DUASN200100F01", "25:10:00", "StopPoint:DUA8738400", 5),
    ("DUASN555001F01", "10:00:00", "StopPoint:DUA8739300", 1),
    ("DUASN555002F01", "10:05:00", "StopPoint:DUA8739300", 1),
    ("DUASN777100F01", "11:00:00", "StopPoint:DUA8739300", 1),
    ("DUASN777100F01", "11:40:00", "StopPoint:DUA8739300", 4),
    ("DUASN888200F01", "09:00:00", "StopPoint:DUA8739300", 1),
    ("DUASN300400F01", "10:30:00", "StopPoint:DUA8738400", 2),
    ("DUASN400500F01", "14:00:00", "StopPoint:DUA8738400", 1))

  /** (stop_id, stop_name). */
  private val BoardStops: Seq[(String, String)] = Seq(
    ("StopPoint:DUA8738400", "Pont Cardinet"),
    ("StopPoint:DUA8739300", "Saint-Lazare"))

  /** (service_id, mon..sun, start_date, end_date). */
  private val BoardCalendar: Seq[(String, Int, Int, Int, Int, Int, Int, Int, String, String)] = Seq(
    ("S_WEEK", 1, 1, 1, 1, 1, 1, 1, "20170101", "20171231"),
    ("S_EXC", 0, 0, 0, 0, 0, 0, 0, "20170101", "20171231"),
    ("S_SUN", 0, 0, 0, 0, 0, 0, 1, "20170101", "20171231"),
    ("S_XRM", 1, 1, 1, 1, 1, 1, 1, "20170101", "20171231"))

  /** (service_id, date, exception_type 1=added 2=removed). */
  private val BoardCalendarDates: Seq[(String, String, Int)] = Seq(
    ("S_EXC", "20170520", 1),
    ("S_XRM", "20170520", 2),
    ("S_WEEK", "20170521", 2)) // different day — must not affect BoardDay

  /** (station_id, num, miss, term, expected wall-clock, mode R/T,
    * etat, request_day, request_time, day_train_num). request_time is
    * unique per (day_train_num, station) among mode-R rows, so the
    * latest-cycle rule needs no tiebreak. All planted delays are
    * multiples of 60 s so Spark's `div` and DuckDB's `//` agree on
    * delay_min for negative values too. */
  private val BoardPassages: Seq[(String, String, String, String, String, String, Option[String], String, String, String)] = Seq(
    // four polling cycles of the late train: T forecast, then R at
    // 12:12, then R at 12:14 Retardé, then an unchanged-expected re-poll
    ("87384008", "165109", "POPI", "87384008", "2017-05-20 12:09:00", "T", None, "2017-05-20", "11:50", "20170520_165109"),
    ("87384008", "165109", "POPI", "87384008", "2017-05-20 12:12:00", "R", None, "2017-05-20", "11:55", "20170520_165109"),
    ("87384008", "165109", "POPI", "87384008", "2017-05-20 12:14:00", "R", Some("Retardé"), "2017-05-20", "12:00", "20170520_165109"),
    ("87384008", "165109", "POPI", "87384008", "2017-05-20 12:14:00", "R", Some("Retardé"), "2017-05-20", "12:05", "20170520_165109"),
    // cancellation: flagged on the board, not dropped
    ("87384008", "134683", "PEBU", "87384008", "2017-05-20 12:14:00", "R", Some("Supprimé"), "2017-05-20", "12:00", "20170520_134683"),
    // past-midnight: scheduled 25:10 on the 20th = 01:10 on the 21st
    ("87384008", "200100", "NUIT", "87384008", "2017-05-21 01:15:00", "R", None, "2017-05-20", "23:55", "20170520_200100"),
    // early runner: observed 2 min before schedule
    ("87384008", "300400", "PEBU", "87384008", "2017-05-20 10:28:00", "R", None, "2017-05-20", "10:20", "20170520_300400"),
    // no trip contains this number → unmatched → off the board
    ("87384008", "999999", "XXXX", "87384008", "2017-05-20 13:00:00", "R", None, "2017-05-20", "12:30", "20170520_999999"),
    // service removed by calendar_dates exception that day → unmatched
    ("87384008", "400500", "REMV", "87384008", "2017-05-20 14:05:00", "R", None, "2017-05-20", "13:45", "20170520_400500"),
    // ambiguous number (two candidate trips) → unmatched
    ("87393009", "5550", "AMBI", "87393009", "2017-05-20 10:00:00", "R", None, "2017-05-20", "09:30", "20170520_5550"),
    // loop trip: unique TRIP, two stop calls → matches first call
    ("87393009", "777100", "LOOP", "87393009", "2017-05-20 11:05:00", "R", None, "2017-05-20", "10:30", "20170520_777100"),
    // Sunday-only service on a Saturday → unmatched
    ("87393009", "888200", "SUND", "87393009", "2017-05-20 09:10:00", "R", None, "2017-05-20", "08:45", "20170520_888200"))

  // ------------------------------------------------------------------
  // delay_propagation fixture — per-cycle delay observations ALONG each
  // train's route (the rows the reference's per-cycle Dynamo store
  // holds after match+delay; boardDelaysDf produces exactly this shape
  // in production). Kept as its own constant corpus so the board-family
  // fixture stays frozen: propagation needs multiple OBSERVED stations
  // per trip, which the one-station board day deliberately doesn't
  // have. Branches pinned: a delay that builds then partially recovers
  // (165109), a single-station train (null delta), an early runner
  // staying early, and a train that departs clean then slips (200100).
  // ------------------------------------------------------------------

  /** (train num, UIC-7 station, stop_sequence, request_time,
    * delay_sec at that polling cycle). request_time unique per
    * (num, station) so latest-cycle needs no tiebreak. */
  private val PropObs: Seq[(String, String, Int, String, Long)] = Seq(
    ("165109", "8738400", 1, "11:50", 0L),
    ("165109", "8738400", 1, "12:00", 300L), // latest at seq 1 → 300
    ("165109", "8739300", 3, "12:10", 420L), // builds +120
    ("165109", "8775801", 5, "12:25", 360L), // recovers −60
    ("300400", "8738400", 2, "10:20", -120L), // early, single station
    ("200100", "8738400", 1, "23:40", 0L),
    ("200100", "8739300", 2, "23:55", 60L)) // clean dep, then slips

  private def propObsValues: String = PropObs
    .map { case (n, s7, seq, rt, d) => s"('$n','$s7',$seq,'$rt',$d)" }
    .mkString(", ")

  /** Fixture passages as a DataFrame — shared by the declared query,
    * the spec, and the streaming twin's parity test. */
  private[graft] def boardPassagesDf(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    BoardPassages
      .toDF("station_id", "num", "miss", "term", "expected", "mode",
        "etat", "request_day", "request_time", "day_train_num")
      .withColumn("expected_ts", to_timestamp(col("expected")))
      .drop("expected")
  }

  /** Fixture GTFS tables: (trips, stopTimes, stops, calendar,
    * calendarDates) in the exact shapes Transit.* consumes. */
  private[graft] def boardGtfsDfs(spark: org.apache.spark.sql.SparkSession): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    val trips = BoardTrips.toDF("trip_id", "service_id")
      .withColumn("route_id", lit("R1"))
      .withColumn("trip_headsign", lit("HD"))
    val stopTimes = BoardStopTimes
      .toDF("trip_id", "departure_time", "stop_id", "stop_sequence")
      .withColumn("arrival_time", col("departure_time"))
    val stops = BoardStops.toDF("stop_id", "stop_name")
    val cal = BoardCalendar.toDF("service_id", "monday", "tuesday",
      "wednesday", "thursday", "friday", "saturday", "sunday",
      "start_date", "end_date")
    val cd = BoardCalendarDates.toDF("service_id", "date", "exception_type")
    (trips, stopTimes, stops, cal, cd)
  }

  /** Fixture schedule, denormalized and calendar-filtered to BoardDay
    * (trip_id, embedded UIC-7, stop_sequence, departure_secs) — the
    * static dimension the streaming board joins each micro-batch. */
  private[graft] def boardScheduleDf(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    val (trips, stopTimes, stops, cal, cd) = boardGtfsDfs(spark)
    val ext = Transit.stopTimesExt(trips, stopTimes, stops)
    val active = Transit.activeServices(cal, cd, BoardDay)
    ext.join(active, "service_id")
      .select(col("trip_id"),
        regexp_extract(col("stop_id"), "([0-9]{7})", 1).as("station7"),
        col("stop_sequence"), col("departure_secs"))
  }

  /** The oracle CTE chain shared by every board-family key: VALUES
    * restatements of the fixture, active-services set, denormalized
    * schedule, fuzzy candidates, unique-trip resolution, delay rows,
    * latest polling cycle. Ends after `latest` — each key appends its
    * own final SELECT. */
  private def tripsValues: String = BoardTrips
    .map { case (t, s) => s"('$t','$s')" }.mkString(", ")

  private def stValues: String = BoardStopTimes
    .map { case (t, dep, sid, seq) => s"('$t','$dep','$sid',$seq)" }
    .mkString(", ")

  private def stopsValues: String = BoardStops
    .map { case (sid, n) => s"('$sid','$n')" }.mkString(", ")

  // the oracle restates the calendar for the CONSTANT day: BoardDay
  // is a Saturday, so only the saturday regime column participates
  private def calValues: String = BoardCalendar
    .map { case (s, _, _, _, _, _, sat, _, d0, d1) => s"('$s',$sat,'$d0','$d1')" }
    .mkString(", ")

  private def cdValues: String = BoardCalendarDates
    .map { case (s, d, e) => s"('$s','$d',$e)" }.mkString(", ")

  /** The calendar-filter CTE shared by every board-family oracle:
    * weekday regime ∪ added exceptions ∖ removed exceptions, all
    * restated for the CONSTANT Saturday. */
  private def activeCte: String =
    "active AS (" +
      "SELECT service_id FROM cal WHERE saturday = 1 AND start_date <= '20170520' AND end_date >= '20170520' " +
      "UNION SELECT service_id FROM cd WHERE dt = '20170520' AND exception_type = 1 " +
      "EXCEPT SELECT service_id FROM cd WHERE dt = '20170520' AND exception_type = 2)"

  private def boardOracleCtes: String = {
    val trips = tripsValues
    val st = stValues
    val cal = calValues
    val cd = cdValues
    val pas = BoardPassages
      .map { case (sid, num, mi, te, ts, mode, etat, rd, rt, dtn) =>
        val e = etat.map(v => s"'$v'").getOrElse("NULL")
        s"('$sid','$num','$mi','$te',TIMESTAMP '$ts','$mode',$e,'$rd','$rt','$dtn')"
      }.mkString(", ")
    "WITH trips(trip_id, service_id) AS (VALUES " + trips + "), " +
      "st(trip_id, departure_time, stop_id, stop_sequence) AS (VALUES " + st + "), " +
      "cal(service_id, saturday, start_date, end_date) AS (VALUES " + cal + "), " +
      "cd(service_id, dt, exception_type) AS (VALUES " + cd + "), " +
      "pas(station_id, num, miss, term, expected_ts, mode, etat, request_day, request_time, day_train_num) AS (VALUES " + pas + "), " +
      activeCte + ", " +
      "sched AS (SELECT t.trip_id, s.stop_id, s.stop_sequence, " +
      "CAST(split_part(s.departure_time,':',1) AS BIGINT)*3600 + " +
      "CAST(split_part(s.departure_time,':',2) AS BIGINT)*60 + " +
      "CAST(split_part(s.departure_time,':',3) AS BIGINT) AS dep_secs " +
      "FROM trips t JOIN st s ON t.trip_id = s.trip_id " +
      "JOIN active a ON t.service_id = a.service_id), " +
      // fuzzy match: train number substring of trip_id, station UIC-7
      // embedded in stop_id; unique-TRIP policy per passage ROW
      // (min=max over the identity window ⇔ exactly one distinct trip),
      // deterministic call = min (stop_sequence, dep_secs)
      "cand AS (SELECT p.*, s.trip_id, s.stop_sequence, s.dep_secs " +
      "FROM pas p JOIN sched s ON s.trip_id LIKE '%' || p.num || '%' " +
      "AND substr(p.station_id, 1, 7) = regexp_extract(s.stop_id, '([0-9]{7})', 1)), " +
      "uniq AS (SELECT * FROM (SELECT *, " +
      "min(trip_id) OVER w = max(trip_id) OVER w AS one_trip, " +
      "row_number() OVER (w ORDER BY stop_sequence, dep_secs) AS rn FROM cand " +
      "WINDOW w AS (PARTITION BY station_id, num, miss, term, expected_ts, mode, etat, request_day, request_time, day_train_num)" +
      ") WHERE one_trip AND rn = 1), " +
      "delays AS (SELECT station_id, num, miss, term, trip_id, expected_ts, " +
      "make_timestamp(epoch_us(TIMESTAMP '2017-05-20 00:00:00') + dep_secs*1000000) AS scheduled_ts, " +
      "CAST((epoch_us(expected_ts) - epoch_us(TIMESTAMP '2017-05-20 00:00:00'))//1000000 - dep_secs AS BIGINT) AS delay_sec, " +
      "coalesce(etat = 'Supprimé', FALSE) AS cancelled, request_time, day_train_num " +
      "FROM uniq WHERE mode = 'R'), " +
      "latest AS (SELECT * FROM (SELECT *, " +
      "row_number() OVER (PARTITION BY day_train_num, station_id ORDER BY request_time DESC) AS cyc FROM delays) WHERE cyc = 1)"
  }

  private def boardOracle: String =
    boardOracleCtes +
      " SELECT station_id, num, miss, term, trip_id, expected_ts, scheduled_ts, delay_sec, " +
      "CAST(delay_sec // 60 AS BIGINT) AS delay_min, cancelled " +
      "FROM latest ORDER BY station_id, expected_ts, num"

  /** Spark side of the shared board state: fixture → match → delays →
    * latest polling cycle per (day_train_num, station) via the
    * associative struct-max upsert (last_state's shape) — first
    * struct field request_time, unique per key by fixture contract, so
    * no tiebreak field ever decides. Unordered; each key orders. */
  /** Fixture → match → per-cycle delay rows (every mode-R polling
    * cycle, BEFORE the latest-state fold) — shared by the flagship's
    * fold and the trajectory analytics. */
  private def boardDelaysDf(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    val (trips, stopTimes, stops, cal, cd) = boardGtfsDfs(spark)
    val passages = boardPassagesDf(spark)
    val ext = Transit.stopTimesExt(trips, stopTimes, stops)
    val active = Transit.activeServices(cal, cd, BoardDay)
    val matched = Transit.matchPassages(passages, ext, active, BoardDay)
    Transit.computeDelays(matched, BoardDay)
  }

  private def boardLatestDf(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame = {
    boardDelaysDf(spark)
      .groupBy("day_train_num", "station_id")
      .agg(max(struct(
        col("request_time").as("rt"),
        col("expected_ts").as("ts"), col("scheduled_ts").as("sc"),
        col("delay_sec").as("d"), col("cancelled").as("c"),
        col("num").as("n"), col("miss").as("mi"), col("term").as("te"),
        col("trip_id").as("tr"))).as("s"))
      .select(col("station_id"),
        col("s.n").as("num"), col("s.mi").as("miss"),
        col("s.te").as("term"), col("s.tr").as("trip_id"),
        col("s.ts").as("expected_ts"), col("s.sc").as("scheduled_ts"),
        col("s.d").as("delay_sec"),
        expr("s.d div 60").as("delay_min"),
        col("s.c").as("cancelled"))
  }

  def defs: Seq[QueryDef] = Seq(

    // The reference's core analytic composed END-TO-END under the hash
    // gate — the EP1 flagship: one day's passage feed → fuzzy GTFS trip
    // match (train-number-substring-of-trip_id + embedded-UIC-7 station
    // + services active that day, unique-TRIP policy per passage row)
    // → delay = observed − scheduled (GTFS past-midnight times resolved
    // on the service day) → latest polling cycle per (day, station,
    // train) → board-ordered output [P match_ids.py
    // get_trip_ids_from_day_train_nums / compute_delay · query.py —
    // SURVEY §1.1, §3.1-EP1]. Runs the SHIPPED domain transforms
    // (Transit.stopTimesExt/activeServices/matchPassages/computeDelays
    // — the exact code TransitSpec exercises); the oracle restates
    // match, calendar, delay and latest-state independently in SQL, so
    // hash equality gates the composition, not a transcription.
    QueryDef(
      "delay_board",
      (spark, _) =>
        boardLatestDf(spark).orderBy("station_id", "expected_ts", "num"),
      Some(boardOracle),
      scaleNote = "The per-day passage batch is the SMALL side " +
        "(|stations|×|trains|×|polling cycles| — a few million rows " +
        "for a national network) and is broadcast into the contains-" +
        "join against the big denormalized schedule, which never " +
        "moves; candidate fan-out is bounded by trips-per-(number, " +
        "station), a physical constant. The unique-match window " +
        "partitions by passage identity (pre-shuffled by the " +
        "candidate join's key already), the latest-state fold is an " +
        "associative struct-max groupBy that combines map-side across " +
        "polling files, and the board output is |day×station×train|-" +
        "bounded. At a year of history, service_day becomes the " +
        "partition key end-to-end (fn_gtfs_day's cutover rule keeps " +
        "past-midnight rows in their service day's partition) and the " +
        "whole DAG runs per-day-partition-parallel with zero cross-" +
        "day shuffle — the reference runs this incrementally per " +
        "polling cycle; the streaming twin is stream_delay_board " +
        "(Streams.delayBoard).",
    ),

    // EP3 under the gate: the serving query behind the dashboard —
    // next-N departures for one station at/after a time, from the
    // latest polling state [P query.py station_trips_stops — SURVEY
    // §3.1-EP3]. Runs the SHIPPED Transit.lastPassageState (the
    // associative Dynamo-upsert analog) and Transit.stationBoard (the
    // filter/order/limit serving shape) over the flagship's passage
    // fixture; the oracle restates last-cycle-wins and the board rule
    // independently. Cancelled trains are EXCLUDED here (a rider-
    // facing board) where delay_board keeps them flagged (an
    // analytics manifest) — both policies of the reference.
    QueryDef(
      "station_board_next",
      (spark, _) =>
        Transit.stationBoard(
          Transit.lastPassageState(boardPassagesDf(spark)),
          "87384008",
          java.sql.Timestamp.from(java.time.Instant.parse("2017-05-20T12:00:00Z")),
          5),
      Some(boardOracleCtes +
        ", last AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY day_train_num, station_id " +
        "ORDER BY request_day DESC, request_time DESC) AS rn FROM pas) WHERE rn = 1) " +
        "SELECT day_train_num, station_id, expected_ts, mode, etat, num, miss, term FROM last " +
        "WHERE station_id = '87384008' AND expected_ts >= TIMESTAMP '2017-05-20 12:00:00' " +
        "AND (etat IS NULL OR etat <> 'Supprimé') " +
        "ORDER BY expected_ts, num LIMIT 5"),
      scaleNote = "The serving path: latest-state is one associative " +
        "struct-max groupBy (map-side-combined, skew-immune — a hot " +
        "station is still one row per train), and the board query " +
        "compiles to TakeOrderedAndProject over a station-pruned " +
        "scan. In production the state table is written partitioned " +
        "by station_id (or served from the keyed store the streaming " +
        "twin maintains), so a board read touches one partition and " +
        "returns N rows — O(1) whatever the network size. The " +
        "time-and-cancellation predicate is codegen'd scalar logic " +
        "pushed to the scan."),

    // The per-line delay dashboard [P query.py + notebooks]: mission-
    // level reliability stats over the latest board state — train
    // count, cancellations, mean/max delay over running trains, and
    // the ≤60 s on-time rate. The one float op per stat is a single
    // division/avg on exact integer sums, rounded to 4 decimals on
    // both engines (the avgDec4 discipline).
    QueryDef(
      "delay_line_stats",
      (spark, _) => {
        val b = boardLatestDf(spark)
        val run = when(!col("cancelled"), col("delay_sec"))
        b.groupBy("miss").agg(
          count(lit(1)).as("n_trains"),
          sum(col("cancelled").cast("long")).as("n_cancelled"),
          round(avg(run), 4).as("avg_delay_sec"),
          max(run).as("max_delay_sec"),
          round(
            sum(when(!col("cancelled") && col("delay_sec") <= 60, 1L)
              .otherwise(0L)).cast("double") /
              sum(when(!col("cancelled"), 1L).otherwise(0L)).cast("double"),
            4).as("on_time_rate"))
          .orderBy("miss")
      },
      Some(boardOracleCtes +
        " SELECT miss, count(*) AS n_trains, " +
        "CAST(sum(CASE WHEN cancelled THEN 1 ELSE 0 END) AS BIGINT) AS n_cancelled, " +
        "round(avg(CASE WHEN NOT cancelled THEN delay_sec END), 4) AS avg_delay_sec, " +
        "max(CASE WHEN NOT cancelled THEN delay_sec END) AS max_delay_sec, " +
        "round(CAST(sum(CASE WHEN NOT cancelled AND delay_sec <= 60 THEN 1 ELSE 0 END) AS DOUBLE) / " +
        "sum(CASE WHEN NOT cancelled THEN 1 ELSE 0 END), 4) AS on_time_rate " +
        "FROM latest GROUP BY miss ORDER BY miss"),
      scaleNote = "One map-side-combined hash agg over the board state " +
        "(itself |day×station×train|-bounded, ≪ the raw polling " +
        "volume): the wire carries |missions| partial rows. Every " +
        "stat is integer arithmetic until one final division/avg per " +
        "group, so re-partitioning cannot move a value. A year-long " +
        "dashboard is the same agg over the service_day-partitioned " +
        "state table with day pruning — the reference's per-day " +
        "Dynamo scans, replaced by one columnar rollup."),

    // EP3's second serving query [P query.py trip_stops — SURVEY
    // §3.1-EP3]: the per-train detail view behind a board row — the
    // ordered stop calls of one trip on the service day, with the GTFS
    // departure string resolved to a wall-clock timestamp. The loop
    // trip (two calls at the same station) pins that ordering is by
    // stop_sequence, not by stop identity. Runs the SHIPPED
    // Transit.tripStops over stopTimesExt ⋈ activeServices; the oracle
    // restates the join, the calendar filter, and the GTFS-seconds
    // timestamp arithmetic independently.
    QueryDef(
      "trip_stops",
      (spark, _) => {
        val (trips, stopTimes, stops, cal, cd) = boardGtfsDfs(spark)
        Transit.tripStops(
          Transit.stopTimesExt(trips, stopTimes, stops),
          Transit.activeServices(cal, cd, BoardDay),
          "DUASN777100F01", BoardDay)
      },
      Some("WITH trips(trip_id, service_id) AS (VALUES " + tripsValues + "), " +
        "st(trip_id, departure_time, stop_id, stop_sequence) AS (VALUES " + stValues + "), " +
        "stops(stop_id, stop_name) AS (VALUES " + stopsValues + "), " +
        "cal(service_id, saturday, start_date, end_date) AS (VALUES " + calValues + "), " +
        "cd(service_id, dt, exception_type) AS (VALUES " + cdValues + "), " +
        activeCte + " " +
        "SELECT s.stop_sequence, s.stop_id, p.stop_name, s.departure_time, " +
        "make_timestamp(epoch_us(TIMESTAMP '2017-05-20 00:00:00') + (" +
        "CAST(split_part(s.departure_time,':',1) AS BIGINT)*3600 + " +
        "CAST(split_part(s.departure_time,':',2) AS BIGINT)*60 + " +
        "CAST(split_part(s.departure_time,':',3) AS BIGINT))*1000000) AS scheduled_ts " +
        "FROM trips t JOIN st s ON t.trip_id = s.trip_id " +
        "JOIN stops p ON s.stop_id = p.stop_id " +
        "JOIN active a ON t.service_id = a.service_id " +
        "WHERE t.trip_id = 'DUASN777100F01' ORDER BY s.stop_sequence"),
      scaleNote = "The serving path's point lookup: with the " +
        "denormalized schedule written bucketed (or partitioned) by " +
        "trip_id, one trip's stops live in one file cluster and the " +
        "query is a pruned scan + a |stops-per-trip|-row sort — no " +
        "shuffle, O(1) in network size, the reference's Postgres " +
        "index lookup replaced by layout. The active-services semi " +
        "join is a broadcast of the |services|-row calendar dimension, " +
        "and the timestamp arithmetic is codegen'd scalar math on the " +
        "scan."),

    // Forecast-evolution analytics over the polling cycles the latest-
    // state fold collapses: per (train, station), how the delay
    // estimate moved cycle-to-cycle (lag window on request_time) — the
    // reference's raw material for "how early do delays become
    // visible" notebook analysis over its per-cycle Dynamo rows. The
    // late-train fixture pins a 3-cycle worsening-then-stable
    // trajectory; single-cycle trains pin the null first delta.
    QueryDef(
      "delay_trajectory",
      (spark, _) => {
        val w = Window.partitionBy("day_train_num", "station_id")
          .orderBy("request_time")
        boardDelaysDf(spark)
          .select(col("day_train_num"), col("station_id"),
            col("request_time"), col("num"), col("delay_sec"))
          .withColumn("delay_delta",
            col("delay_sec") - lag(col("delay_sec"), 1).over(w))
          .orderBy("day_train_num", "station_id", "request_time")
      },
      Some(boardOracleCtes +
        " SELECT day_train_num, station_id, request_time, num, delay_sec, " +
        "delay_sec - lag(delay_sec) OVER (PARTITION BY day_train_num, station_id ORDER BY request_time) AS delay_delta " +
        "FROM delays ORDER BY day_train_num, station_id, request_time"),
      scaleNote = "The lag window partitions by (train, station) — " +
        "thousands of tiny partitions per day, never a global sort — " +
        "and its shuffle key is the SAME key the upstream match/delay " +
        "stages already hash on, so at scale the exchange is reused, " +
        "not added. Polling cycles per key are bounded by the feed " +
        "cadence (a physical constant ≤ ~300/day), so no partition " +
        "can skew. Over a year of history the day prefix of " +
        "day_train_num keeps the whole analysis per-day-partition-" +
        "parallel, and per-cycle rows stream through in one pass — " +
        "the reference stores exactly these rows in Dynamo and pays " +
        "a table scan per notebook question."),

    // Scheduled-headway profile per station [P sibling-dashboard
    // analytics over stop_times_ext]: consecutive-departure gaps from
    // the denormalized active-day schedule — the service-planning
    // metric (a 300 s minimum headway at a 2-track station is the
    // capacity bound). Exercises the lag window over the schedule
    // rather than the feed; the removed-service and Sunday-only trips
    // pin that inactive services leave the gap structure.
    QueryDef(
      "station_headway",
      (spark, _) => {
        val w = Window.partitionBy("station7")
          .orderBy(col("departure_secs").asc, col("trip_id").asc,
            col("stop_sequence").asc)
        boardScheduleDf(spark)
          .withColumn("gap",
            col("departure_secs") - lag(col("departure_secs"), 1).over(w))
          .groupBy("station7")
          .agg(count(lit(1)).as("n_departures"),
            min(col("gap")).as("min_headway_sec"),
            max(col("gap")).as("max_headway_sec"),
            round(avg(col("gap")), 4).as("avg_headway_sec"))
          .orderBy("station7")
      },
      Some(boardOracleCtes +
        ", h AS (SELECT regexp_extract(stop_id, '([0-9]{7})', 1) AS station7, " +
        "dep_secs - lag(dep_secs) OVER (PARTITION BY regexp_extract(stop_id, '([0-9]{7})', 1) " +
        "ORDER BY dep_secs, trip_id, stop_sequence) AS gap FROM sched) " +
        "SELECT station7, count(*) AS n_departures, min(gap) AS min_headway_sec, " +
        "max(gap) AS max_headway_sec, round(avg(gap), 4) AS avg_headway_sec " +
        "FROM h GROUP BY station7 ORDER BY station7"),
      scaleNote = "Both stages hash on station: the lag window's " +
        "partitions are stations (departures per station per day are " +
        "physically bounded — no skew possible), and the rollup " +
        "reuses the same partitioning, so one exchange serves both. " +
        "The avg divides an exact integer sum (gaps < 2^17, counts " +
        "< 2^10 — double-exact) once per station. A national " +
        "network × a year is |station×day| independent partitions; " +
        "with the schedule stored partitioned by service_day the " +
        "whole profile is embarrassingly parallel."),

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
        "single-partition operations."),

    // Schedule coverage — the feed-health KPI the reference's ops
    // view needs first: of the trips SCHEDULED to call at each
    // station on the service day (calendar-filtered, exceptions
    // applied), how many did the real-time feed actually report (a
    // uniquely-matched passage in ANY mode — a T forecast still
    // proves the feed knows the train)? The fixture pins every
    // branch: the removed-service trip is neither scheduled nor
    // counted missing, the Sunday-only trip is not scheduled on the
    // Saturday, the ambiguous 5550 pair is scheduled-but-unobserved
    // (match policy refuses a guess), and the loop trip counts ONCE.
    // Keyed by UIC-7 so the oracle needs no Luhn restatement.
    QueryDef(
      "schedule_coverage",
      (spark, _) => {
        val (trips, stopTimes, stops, cal, cd) = boardGtfsDfs(spark)
        val ext = Transit.stopTimesExt(trips, stopTimes, stops)
        val active = Transit.activeServices(cal, cd, BoardDay)
        val matched = Transit.matchPassages(
          boardPassagesDf(spark), ext, active, BoardDay)
        val sch = ext.join(active, "service_id")
          .select(regexp_extract(col("stop_id"), "([0-9]{7})", 1)
            .as("station7"), col("trip_id")).distinct()
        val obs = matched.filter(col("trip_id").isNotNull)
          .select(Transit.uic7(col("station_id")).as("station7"),
            col("trip_id")).distinct()
          .withColumn("seen", lit(1L))
        sch.join(obs, Seq("station7", "trip_id"), "left")
          .groupBy("station7")
          .agg(count(lit(1)).as("n_scheduled"),
            sum(coalesce(col("seen"), lit(0L))).as("n_observed"))
          .select(col("station7"), col("n_scheduled"), col("n_observed"),
            (col("n_scheduled") - col("n_observed")).as("n_missed"),
            round(col("n_observed").cast("double") * 100 /
              col("n_scheduled"), 2).as("coverage_pct"))
          .orderBy("station7")
      },
      Some(boardOracleCtes +
        ", sch AS (SELECT DISTINCT regexp_extract(stop_id, '([0-9]{7})', 1) AS station7, trip_id FROM sched), " +
        "obs AS (SELECT DISTINCT substr(station_id, 1, 7) AS station7, trip_id FROM uniq) " +
        "SELECT s.station7, count(*) AS n_scheduled, " +
        "CAST(sum(CASE WHEN o.trip_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_observed, " +
        "CAST(sum(CASE WHEN o.trip_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missed, " +
        "round(CAST(sum(CASE WHEN o.trip_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) * 100 / count(*), 2) AS coverage_pct " +
        "FROM sch s LEFT JOIN obs o ON s.station7 = o.station7 AND s.trip_id = o.trip_id " +
        "GROUP BY 1 ORDER BY 1"),
      scaleNote = "Both sides pre-shrink to DISTINCT (station, trip) " +
        "pairs — |stations|×|trips-per-station| rows, bounded by the " +
        "physical network, never by polling volume — so the coverage " +
        "join is dimension-sized whatever the feed rate; the matched " +
        "side reuses delay_board's broadcast contains-join (the " +
        "expensive part is shared, not repeated, when both run in one " +
        "DAG). At a year of history the group key becomes (service_" +
        "day, station7) and the rollup stays one map-side-combined " +
        "agg; alert on coverage_pct dropping below a floor per " +
        "station — the reference's silent-station failure mode " +
        "(ts_calendar_gaps catches dead polling; this catches a " +
        "polling loop that runs but matches nothing)."),

    // Transfer-feasibility pairs — the connection-scan primitive every
    // journey planner builds on [P sibling of query.py's station
    // views]: at each station on the service day, ordered pairs of
    // DIFFERENT trips whose departure gap falls in the rider-feasible
    // [180 s, 3600 s] window (the fixture's stop_times carry
    // arrival = departure, so departure_secs stands in for the arrival
    // leg). The loop trip pins the self-transfer exclusion: its two
    // calls at Saint-Lazare are 2400 s apart — inside the window, but
    // the same trip_id, so no row. Removed/Sunday-only services are
    // absent from both legs via the shared active-services filter.
    QueryDef(
      "gtfs_transfers",
      (spark, _) => {
        val s = boardScheduleDf(spark)
        val a = s.select(col("station7"), col("trip_id").as("from_trip"),
          col("departure_secs").as("arr_secs"))
        val d = s.select(col("station7").as("st2"),
          col("trip_id").as("to_trip"), col("departure_secs").as("dep_secs"))
        a.join(d, col("station7") === col("st2") &&
            col("from_trip") =!= col("to_trip") &&
            col("dep_secs") >= col("arr_secs") + 180 &&
            col("dep_secs") <= col("arr_secs") + 3600)
          .select(col("station7"), col("from_trip"), col("to_trip"),
            col("arr_secs"), col("dep_secs"),
            (col("dep_secs") - col("arr_secs")).as("gap_sec"))
          .orderBy("station7", "arr_secs", "dep_secs", "from_trip", "to_trip")
      },
      Some(boardOracleCtes +
        ", sch2 AS (SELECT trip_id, regexp_extract(stop_id, '([0-9]{7})', 1) AS station7, dep_secs FROM sched) " +
        "SELECT a.station7, a.trip_id AS from_trip, b.trip_id AS to_trip, " +
        "a.dep_secs AS arr_secs, b.dep_secs AS dep_secs, b.dep_secs - a.dep_secs AS gap_sec " +
        "FROM sch2 a JOIN sch2 b ON a.station7 = b.station7 AND a.trip_id <> b.trip_id " +
        "AND b.dep_secs >= a.dep_secs + 180 AND b.dep_secs <= a.dep_secs + 3600 " +
        "ORDER BY 1, 4, 5, 2, 3"),
      scaleNote = "A band self-join BLOCKED BY STATION — the station " +
        "key is the equi component, so the shuffle partitions by " +
        "station and the quadratic term is bounded by departures-per-" +
        "station-per-hour, a physical constant (a saturated trunk " +
        "station runs ~30/h — ~900 comparisons per station-hour, " +
        "never |network|²). At 100 TB (a continent, a year) the join " +
        "key becomes (service_day, station) and the pairs stay " +
        "per-partition; the time-window predicate is codegen'd scalar " +
        "math evaluated inside the per-station sort-merge, the " +
        "join_band pattern with a domain contract on top. Feeding " +
        "OBSERVED times instead of scheduled ones (boardDelaysDf's " +
        "output) turns the same plan into a missed-connection monitor."),

    // Delay propagation along the route — does a delay grow, hold, or
    // recover between successive OBSERVED stations of one train? The
    // lag dimension is stop_sequence (space), where delay_trajectory's
    // is request_time (time): together they are the reference's two
    // notebook questions over the per-cycle Dynamo rows. Input is the
    // per-cycle delay-observation corpus (PropObs — the exact shape
    // boardDelaysDf emits in production); each (train, station) folds
    // to its latest polling cycle first (associative struct-max, the
    // last_state shape), then the per-train route lag computes the
    // station-to-station delta.
    QueryDef(
      "delay_propagation",
      (spark, _) => {
        val session = spark
        import session.implicits._
        val obs = PropObs.toDF(
          "num", "station7", "stop_sequence", "request_time", "delay_sec")
        val latest = obs
          .groupBy("num", "station7", "stop_sequence")
          .agg(max(struct(col("request_time").as("rt"),
            col("delay_sec").as("d"))).as("s"))
          .select(col("num"), col("station7"), col("stop_sequence"),
            col("s.d").as("delay_sec"))
        val w = Window.partitionBy("num").orderBy("stop_sequence")
        latest
          .withColumn("delta_prev_stop",
            col("delay_sec") - lag(col("delay_sec"), 1).over(w))
          .orderBy("num", "stop_sequence")
      },
      Some("WITH obs(num, station7, stop_sequence, request_time, delay_sec) AS (VALUES " +
        propObsValues + "), " +
        "latest AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY num, station7, stop_sequence ORDER BY request_time DESC) AS rn FROM obs) WHERE rn = 1) " +
        "SELECT num, station7, stop_sequence, delay_sec, " +
        "delay_sec - lag(delay_sec) OVER (PARTITION BY num ORDER BY stop_sequence) AS delta_prev_stop " +
        "FROM latest ORDER BY num, stop_sequence"),
      scaleNote = "Both stages key on the train: the latest-cycle fold " +
        "is a map-side-combined struct-max groupBy and the route lag " +
        "partitions by train number — stations-per-trip is bounded " +
        "(≤ ~40), so no partition can skew and the window never sees " +
        "an unbounded order-by. The fold's (num, station) hash is a " +
        "refinement of the lag's num hash, so AQE/exchange reuse " +
        "keeps it to one effective shuffle. Over a year the " +
        "day_train_num prefix partitions the whole analysis per " +
        "service day — embarrassingly parallel, and the deltas feed " +
        "straight into a per-line congestion attribution (which " +
        "STATION injects the delay vs merely inheriting it upstream)."),

    // Per-line delay QUARTILES — the SLA view delay_line_stats' mean
    // hides (one 30-min incident drags a line's average while its
    // median stays honest; agencies report p50/p75, not means): exact
    // interpolated quartiles of the latest-state delay per mission,
    // running trains only. Quartile fractions are DYADIC (k/4), so
    // the interpolation (lo + frac·(hi−lo) on integer seconds) is
    // exact in binary floating point on both engines — the
    // agg_percentile_cont discipline pointed at the board.
    QueryDef(
      "delay_line_percentiles",
      (spark, _) =>
        boardLatestDf(spark).filter(!col("cancelled"))
          .groupBy("miss")
          .agg(count(lit(1)).as("n"),
            expr("percentile(delay_sec, 0.25)").as("p25_delay"),
            expr("percentile(delay_sec, 0.5)").as("p50_delay"),
            expr("percentile(delay_sec, 0.75)").as("p75_delay"),
            max(col("delay_sec")).as("max_delay"))
          .orderBy("miss"),
      Some(boardOracleCtes +
        " SELECT miss, count(*) AS n, " +
        "quantile_cont(delay_sec, 0.25) AS p25_delay, " +
        "quantile_cont(delay_sec, 0.5) AS p50_delay, " +
        "quantile_cont(delay_sec, 0.75) AS p75_delay, " +
        "CAST(max(delay_sec) AS BIGINT) AS max_delay " +
        "FROM latest WHERE NOT cancelled GROUP BY 1 ORDER BY 1"),
      scaleNote = "Exact per-group percentiles buffer the group's " +
        "values — bounded here by trains-per-mission-per-day (a " +
        "physical constant), which is what makes the exact form " +
        "viable at any history length once service_day partitions " +
        "the input; the rollup reuses the board DAG's (train, " +
        "station) exchange. For unbounded groups (delay per STATION " +
        "over a year) the approx sketch (agg_approx_quantile's " +
        "QuantileSummaries — mergeable, fixed-size) replaces the " +
        "buffer with the same query shape; the exact dyadic form " +
        "stays as its oracle at test scale."),

    // Headway ADHERENCE — the regularity KPI transit agencies grade
    // service on (and the bunching detector): station_headway
    // measures the SCHEDULED gap profile; this compares each
    // consecutive-departure gap as REALIZED (latest observed
    // expected_ts) against the same pair's scheduled gap. dev =
    // actual − scheduled gap (= delay_next − delay_prev along the
    // station's departure sequence): negative dev is bunching — the
    // following train closing in — which a delay average hides
    // completely (two trains 5 min late have avg delay 300 s and
    // ZERO headway deviation). Pairs align on the SCHEDULED order
    // (the timetable defines which departure follows which);
    // cancelled trains leave the gap structure entirely.
    QueryDef(
      "station_headway_adherence",
      (spark, _) => {
        val b = boardLatestDf(spark)
          .filter(!col("cancelled") && col("scheduled_ts").isNotNull)
        val w = Window.partitionBy("station_id")
          .orderBy(col("scheduled_ts").asc, col("num").asc)
        b.withColumn("sched_gap",
            unix_timestamp(col("scheduled_ts")) -
              unix_timestamp(lag(col("scheduled_ts"), 1).over(w)))
          .withColumn("actual_gap",
            unix_timestamp(col("expected_ts")) -
              unix_timestamp(lag(col("expected_ts"), 1).over(w)))
          .filter(col("sched_gap").isNotNull)
          .withColumn("dev", col("actual_gap") - col("sched_gap"))
          .groupBy("station_id")
          .agg(count(lit(1)).as("n_gaps"),
            min(col("sched_gap")).as("min_sched_gap"),
            min(col("actual_gap")).as("min_actual_gap"),
            min(col("dev")).as("min_dev"),
            max(col("dev")).as("max_dev"),
            sum(when(col("dev") < 0, 1L).otherwise(0L)).as("n_bunching"))
          .orderBy("station_id")
      },
      Some(boardOracleCtes +
        ", r AS (SELECT station_id, scheduled_ts, expected_ts, num FROM latest " +
        "WHERE NOT cancelled AND scheduled_ts IS NOT NULL), " +
        "g AS (SELECT station_id, " +
        "(epoch_us(scheduled_ts) - epoch_us(lag(scheduled_ts) OVER w))//1000000 AS sched_gap, " +
        "(epoch_us(expected_ts) - epoch_us(lag(expected_ts) OVER w))//1000000 AS actual_gap " +
        "FROM r WINDOW w AS (PARTITION BY station_id ORDER BY scheduled_ts, num)) " +
        "SELECT station_id, count(*) AS n_gaps, " +
        "CAST(min(sched_gap) AS BIGINT) AS min_sched_gap, " +
        "CAST(min(actual_gap) AS BIGINT) AS min_actual_gap, " +
        "CAST(min(actual_gap - sched_gap) AS BIGINT) AS min_dev, " +
        "CAST(max(actual_gap - sched_gap) AS BIGINT) AS max_dev, " +
        "CAST(sum(CASE WHEN actual_gap - sched_gap < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bunching " +
        "FROM g WHERE sched_gap IS NOT NULL GROUP BY 1 ORDER BY 1"),
      scaleNote = "Rides the exact exchange the board DAG already " +
        "pays: the latest-state fold hashes on (train, station) and " +
        "the gap window re-partitions by station — departures per " +
        "station per day are physically bounded, so no partition " +
        "skews and the lag frame is O(1) state. The rollup reuses " +
        "the window's partitioning (one effective shuffle). At a " +
        "year of history the service-day prefix makes it per-day-" +
        "parallel; the dev series per (station, hour) feeds the " +
        "regularity dashboards (EWMA over dev = ts_ewma's machinery " +
        "pointed at bunching instead of volume)."),

    // EP3's COMPOSED response document [P serializers.py
    // get_nested_dicts — SURVEY §1.3 row 5, §3.1-EP3]: ONE nested
    // JSON document per station — the station's active-day trips,
    // each carrying its full ORDERED stop list — i.e. the exact
    // station→trips→stops shape the reference's dashboard fetches on
    // every page load. nested_json's manual-formatting discipline
    // (deterministic concat, array_sort'd collect_list — no engine
    // JSON serializer whose key order could differ) composed over
    // trip_stops' denormalized join. Trips order within a station by
    // (first departure at that station, trip_id); stops by
    // stop_sequence (the loop trip pins both: it appears ONCE in its
    // station's trip list but twice in its own stop list).
    QueryDef(
      "station_trips_stops",
      (spark, _) => {
        val (trips, stopTimes, stops, cal, cd) = boardGtfsDfs(spark)
        val ext = Transit.stopTimesExt(trips, stopTimes, stops)
          .join(Transit.activeServices(cal, cd, BoardDay), "service_id")
        val tj = ext
          .select(col("trip_id"), col("stop_sequence"),
            concat(lit("{\"seq\":"), col("stop_sequence").cast("string"),
              lit(",\"stop\":\""), col("stop_id"),
              lit("\",\"name\":\""), col("stop_name"),
              lit("\",\"dep\":\""), col("departure_time"),
              lit("\"}")).as("sj"))
          .groupBy("trip_id")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("stop_sequence"), col("sj")))),
            e => e.getField("sj")), ",").as("stops_j"))
          .select(col("trip_id"),
            concat(lit("{\"trip\":\""), col("trip_id"),
              lit("\",\"stops\":["), col("stops_j"), lit("]}")).as("tdoc"))
        val mem = ext
          .groupBy(regexp_extract(col("stop_id"), "([0-9]{7})", 1)
            .as("station7"), col("trip_id"))
          .agg(min(col("departure_secs")).as("first_dep"))
        mem.join(tj, "trip_id")
          .groupBy("station7")
          .agg(count(lit(1)).as("n_trips"),
            array_join(transform(
              array_sort(collect_list(
                struct(col("first_dep"), col("trip_id"), col("tdoc")))),
              e => e.getField("tdoc")), ",").as("trips_j"))
          .select(col("station7"), col("n_trips"),
            concat(lit("{\"station\":\""), col("station7"),
              lit("\",\"trips\":["), col("trips_j"), lit("]}")).as("doc"))
          .orderBy("station7")
      },
      Some("WITH trips(trip_id, service_id) AS (VALUES " + tripsValues + "), " +
        "st(trip_id, departure_time, stop_id, stop_sequence) AS (VALUES " + stValues + "), " +
        "stops(stop_id, stop_name) AS (VALUES " + stopsValues + "), " +
        "cal(service_id, saturday, start_date, end_date) AS (VALUES " + calValues + "), " +
        "cd(service_id, dt, exception_type) AS (VALUES " + cdValues + "), " +
        activeCte + ", " +
        "ext AS (SELECT t.trip_id, s.stop_id, p.stop_name, s.stop_sequence, s.departure_time, " +
        "CAST(split_part(s.departure_time,':',1) AS BIGINT)*3600 + " +
        "CAST(split_part(s.departure_time,':',2) AS BIGINT)*60 + " +
        "CAST(split_part(s.departure_time,':',3) AS BIGINT) AS dep_secs " +
        "FROM trips t JOIN st s ON t.trip_id = s.trip_id " +
        "JOIN stops p ON s.stop_id = p.stop_id " +
        "JOIN active a ON t.service_id = a.service_id), " +
        "tj AS (SELECT trip_id, '{\"trip\":\"' || trip_id || '\",\"stops\":[' || " +
        "string_agg('{\"seq\":' || stop_sequence || ',\"stop\":\"' || stop_id || " +
        "'\",\"name\":\"' || stop_name || '\",\"dep\":\"' || departure_time || '\"}', " +
        "',' ORDER BY stop_sequence) || ']}' AS tdoc FROM ext GROUP BY trip_id), " +
        "mem AS (SELECT regexp_extract(stop_id, '([0-9]{7})', 1) AS station7, trip_id, " +
        "min(dep_secs) AS first_dep FROM ext GROUP BY 1, 2) " +
        "SELECT m.station7, count(*) AS n_trips, " +
        "'{\"station\":\"' || m.station7 || '\",\"trips\":[' || " +
        "string_agg(tj.tdoc, ',' ORDER BY m.first_dep, m.trip_id) || ']}' AS doc " +
        "FROM mem m JOIN tj ON m.trip_id = tj.trip_id " +
        "GROUP BY m.station7 ORDER BY m.station7"),
      scaleNote = "The serving-store materialization: every stage " +
        "keys on trip or station. Per-trip docs are a map-side-" +
        "combined collect over ≤ ~40 stop calls (physically bounded " +
        "— WindowGroupLimit-class memory per key); the membership " +
        "table is |trip×station| rows; the station rollup buffers " +
        "trips-per-station docs — bounded by timetable density, and " +
        "a mega-hub still emits ONE row. The trip-doc join is an " +
        "equi-join between two trip_id-keyed aggregates of the SAME " +
        "upstream, so AQE reuses the exchange. At 100 TB this runs " +
        "per service_day partition and writes the doc table " +
        "partitioned by station prefix — the reference's per-request " +
        "SQLAlchemy nesting becomes a precomputed columnar lookup, " +
        "refreshed incrementally by the streaming board's upserts."))
}
