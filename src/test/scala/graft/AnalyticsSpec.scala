package graft

import org.apache.spark.sql.functions._
import graft.engine.{Registry, Tables}
import graft.queries.{Aggregates, Analytics, NearDup, TimeSeriesDedup}

/** Behavioral/layout analytics (funnel, retention, concurrency,
  * Z-order) + the CMS sketch and edit-distance NN — each checked
  * against an INDEPENDENT reimplementation (driver-side brute force
  * over collected sf0.001 rows) or a planted fixture, not just the
  * DuckDB oracle. */
class AnalyticsSpec extends SparkSpec {

  private def run(name: String) = Registry.byName(name).build(spark, sf)

  /** Epoch millis from a timestamp_ntz cell (collects as LocalDateTime
    * in the UTC-pinned session). */
  private def ms(r: org.apache.spark.sql.Row, i: Int): Long = r.get(i) match {
    case t: java.sql.Timestamp => t.getTime
    case d: java.time.LocalDateTime => d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  }

  test("funnel_steps matches a driver-side brute force and is monotone") {
    val rows = run("funnel_steps").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("view", "click", "purchase"))
    val Seq(n1, n2, n3) = rows.map(_.getLong(2)).toSeq
    assert(n1 >= n2 && n2 >= n3, s"funnel not monotone: $n1 $n2 $n3")

    // independent brute force over the raw events
    val ev = Tables.loadEvents(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), ms(r, 2)))
    val byUser = ev.groupBy(_._1)
    val bound = 24L * 3600 * 1000
    def first(u: Long, typ: String, after: Long, within: Boolean): Option[Long] =
      byUser(u).filter(e => e._2 == typ && e._3 >= after &&
        (!within || e._3 <= after + bound)).map(_._3).sorted.headOption
    val t1 = byUser.keys.flatMap(u => first(u, "view", Long.MinValue, within = false)
      .map(u -> _)).toMap
    val t2 = t1.flatMap { case (u, ts) => first(u, "click", ts, within = true).map(u -> _) }
    val t3 = t2.flatMap { case (u, ts) => first(u, "purchase", ts, within = true).map(u -> _) }
    assert((n1, n2, n3) == (t1.size.toLong, t2.size.toLong, t3.size.toLong))
  }

  test("retention_cohort: day-0 cells cover every user exactly once") {
    val rows = run("retention_cohort").collect()
    assert(rows.forall(_.getLong(1) >= 0), "negative day offset")
    val day0 = rows.filter(_.getLong(1) == 0).map(_.getLong(2)).sum
    val users = Tables.loadEvents(spark, sf)
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(day0 == users, s"day-0 total $day0 != $users distinct users")
  }

  test("peak_concurrency matches a driver-side sweep line (with carry-in)") {
    val got = run("peak_concurrency").collect()
      .map(r => (ms(r, 0), r.getLong(1))).toMap

    val minuteMs = 60000L
    val sessions = TimeSeriesDedup.sessionBounds(Tables.loadEvents(spark, sf))
      .collect().map(r => (ms(r, 2), ms(r, 3)))
    val deltas = sessions.flatMap { case (st, en) =>
      Seq((st / minuteMs * minuteMs, 1L),
        (en / minuteMs * minuteMs + minuteMs, -1L))
    }.groupBy(_._1).map { case (m, ds) => (m, ds.map(_._2).sum) }
    val ordered = deltas.toSeq.sortBy(_._1)
    var conc = 0L
    var carried = 0L // concurrency entering the current hour
    val hourPeaks = scala.collection.mutable.Map[Long, Long]()
    var lastHour = Long.MinValue
    for ((m, nd) <- ordered) {
      val hour = m / (60 * minuteMs) * (60 * minuteMs)
      if (hour != lastHour) { carried = conc; lastHour = hour }
      conc += nd
      val peak = math.max(conc, carried)
      hourPeaks(hour) = math.max(hourPeaks.getOrElse(hour, Long.MinValue), peak)
    }
    assert(got.size == hourPeaks.size, s"${got.size} hours vs ${hourPeaks.size}")
    for ((h, p) <- hourPeaks)
      assert(got(h) == p, s"hour $h: query ${got(h)} vs brute $p")
  }

  test("layout_zorder matches a bit-twiddling reference; range layout bounds both dims") {
    def ref(x: Long, y: Long): Long =
      (0 until 8).map(b => (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).sum
    val rows = run("layout_zorder").collect()
    rows.foreach { r =>
      assert(r.getLong(4) == ref(r.getLong(2), r.getLong(3)),
        s"zkey mismatch at (${r.getLong(2)}, ${r.getLong(3)})")
    }

    // the layout claim: 8 zkey-range files bound BOTH dimensions,
    // while an x-sorted layout leaves y spanning its full width
    def spans(df: org.apache.spark.sql.DataFrame, sortCol: String): (Double, Double) = {
      val parts = df.repartitionByRange(8, col(sortCol))
        .groupBy(spark_partition_id().as("p"))
        .agg((max(col("x")) - min(col("x"))).as("sx"),
          (max(col("y")) - min(col("y"))).as("sy"))
        .collect()
      (parts.map(_.getLong(1)).sum.toDouble / parts.length,
        parts.map(_.getLong(2)).sum.toDouble / parts.length)
    }
    val base = run("layout_zorder")
    val (_, zy) = spans(base, "zkey")
    val (_, xy) = spans(base, "x")
    assert(zy < 160, s"z-order mean y-span $zy should be bounded")
    assert(xy > 200, s"x-sort baseline y-span $xy should be ~full width")
    assert(zy < xy * 0.75, s"z-order y-span $zy not better than x-sort $xy")
  }

  test("layout_hilbert: space-filling bijection on the full grid; adjacent steps; tighter than z-order") {
    // (a) BIJECTION: every (x, y) in 256x256 maps to a distinct key
    // in [0, 65535] — the defining property of a space-filling curve
    val grid = spark.range(65536)
      .select((col("id") % 256).as("x"), expr("id div 256").as("y"))
      .withColumn("hk", graft.plans.HilbertIndex.key(col("x"), col("y")))
    val st = grid.agg(countDistinct("hk"), min("hk"), max("hk")).head
    assert(st.getLong(0) == 65536L && st.getLong(1) == 0L &&
      st.getLong(2) == 65535L, s"not a bijection: $st")
    // (b) ADJACENCY: consecutive curve positions are grid neighbors
    // (|dx| + |dy| = 1) — the no-jump property z-order lacks
    val w = org.apache.spark.sql.expressions.Window.orderBy("hk")
    val steps = grid
      .withColumn("dx", abs(col("x") - lag("x", 1).over(w)))
      .withColumn("dy", abs(col("y") - lag("y", 1).over(w)))
      .filter(col("dx").isNotNull)
    assert(steps.filter(col("dx") + col("dy") =!= 1).count() == 0,
      "a hilbert step is not grid-adjacent")
    // (c) the layout claim on real data: hilbert-range files bound
    // both dims at least as tightly as the z-order layout
    def meanYSpan(df: org.apache.spark.sql.DataFrame, k: String): Double = {
      val parts = df.repartitionByRange(8, col(k))
        .groupBy(spark_partition_id().as("p"))
        .agg((max(col("y")) - min(col("y"))).as("sy")).collect()
      parts.map(_.getLong(1)).sum.toDouble / parts.length
    }
    val hy = meanYSpan(run("layout_hilbert"), "hkey")
    val zy = meanYSpan(run("layout_zorder"), "zkey")
    assert(hy <= zy * 1.1, s"hilbert y-span $hy should not exceed z-order $zy")
    assert(hy < 160, s"hilbert mean y-span $hy should be bounded")
  }

  test("CMS: pigeonhole overcount appears, never an undercount (40 keys, w=32)") {
    import spark.implicits._
    // planted skew: key k appears k+1 times, 40 keys into 32 buckets
    val df = (0 until 40).flatMap(k => Seq.fill(k + 1)(s"key$k")).toDF("k")
    val est = Aggregates.cmsPointEstimates(df, "k", d = 2, w = 32).collect()
    assert(est.length == 40)
    est.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"CMS undercount for ${r.getString(0)}"))
    // d=2 over 40 keys in 32 buckets: some pair must share both cells
    assert(est.exists(r => r.getLong(2) > r.getLong(1)),
      "expected at least one overcount from forced collisions")
    // and the declared d=4 config on the real table must hold the bound
    val real = run("agg_cms_sketch").collect()
    assert(real.forall(_.getBoolean(3)), "no_undercount violated on events")
  }

  test("ts_anomaly: full 24h frames only; anomaly flag consistent with z") {
    val rows = run("ts_anomaly").collect()
    val hours = Tables.loadEvents(spark, sf)
      .select(countDistinct(date_trunc("hour", col("ts")))).collect()(0).getLong(0)
    assert(rows.length == hours - 24, s"${rows.length} rows vs $hours hours")
    rows.foreach { r =>
      val z = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      val anom = r.getBoolean(3)
      z match {
        case Some(v) => assert(anom == (math.abs(v) > 3.0) ||
          math.abs(math.abs(v) - 3.0) < 1e-3, // round(4) boundary slack
          s"flag $anom inconsistent with z=$v")
        case None => assert(!anom, "anomaly flagged on zero-variance window")
      }
    }
    assert(rows.exists(_.getBoolean(3)), "no anomaly fired: test corpus vacuous")
  }

  test("dedup_edit_nn: planted twin is found at distance 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "s0", "alpha beta gamma delta epsilon"),
      (2L, "en", "s0", "alpha beta gamma delta epsilon"), // exact twin of 1
      (3L, "en", "s0", "alpha beta gamma delta zeta"), // near miss
      (4L, "fr", "s0", "un deux trois quatre"), // different block
      (5L, "fr", "s0", "un deux trois cinq")
    ).toDF("doc_id", "lang", "source", "text")
    val nn = NearDup.editNearestNeighbor(docs, 64).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(nn(1L) == ((2L, 0)), s"doc 1 NN: ${nn(1L)}")
    assert(nn(2L) == ((1L, 0)), s"doc 2 NN: ${nn(2L)}")
    assert(nn(3L)._2 > 0 && Set(1L, 2L)(nn(3L)._1))
    // 4 and 5 are alone in the fr block: they must pair with each
    // other (never with the en docs) at a nonzero distance
    assert(nn(4L)._1 == 5L && nn(4L)._2 > 0, s"cross-block leak: ${nn(4L)}")
    assert(nn(5L)._1 == 4L)
    assert(nn.size == 5)
  }

  test("multi-pass SNM finds the front-edited pair the length sort misses") {
    import spark.implicits._
    // A (id 1) and B (id 20) differ ONLY in the first token — edit
    // distance 2 — and 18 same-length fillers sit between them in
    // doc_id order, so the (len, doc_id) pass keeps them > W=8 ranks
    // apart: a structural single-pass miss. The reversed-prefix pass
    // sorts by the shared tail, making them adjacent.
    val a = "qq alpha beta gamma delta epsilon"
    val b = "zz alpha beta gamma delta epsilon"
    val fillers = (2 until 20).map { i =>
      val base = f"fill$i%02d "
      (i.toLong, "en", "s0", base + "w" * (a.length - base.length))
    }
    val docs = (Seq((1L, "en", "s0", a), (20L, "en", "s0", b)) ++ fillers)
      .toDF("doc_id", "lang", "source", "text")
    assert(docs.select(length(col("text"))).distinct().count() == 1,
      "fixture broken: lengths differ, the length sort would not scatter")
    val one = NearDup.editNearestNeighbor(docs, 64, passes = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val two = NearDup.editNearestNeighbor(docs, 64).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(one(1L)._1 != 20L && one(1L)._2 > 2,
      s"fixture vacuous: single pass already found the pair: ${one(1L)}")
    assert(two(1L) == ((20L, 2)), s"multi-pass missed the pair: ${two(1L)}")
    assert(two(20L) == ((1L, 2)), s"multi-pass not symmetric: ${two(20L)}")
  }

  test("peak_concurrency_dense: gapless grid, agrees with the sparse variant") {
    val dense = graft.engine.Registry.byName("peak_concurrency_dense")
      .build(spark, sf).cache()
    val sparse = graft.engine.Registry.byName("peak_concurrency")
      .build(spark, sf)
    try {
      // gapless: exactly (h1-h0)/1h + 1 rows, no duplicate hours
      val b = dense.agg(min("hour").as("h0"), max("hour").as("h1"),
        count(lit(1)).as("k")).head
      val hours = (b.getTimestamp(1).getTime - b.getTimestamp(0).getTime) /
        3600000L + 1
      assert(b.getLong(2) == hours, s"grid has holes: ${b.getLong(2)} vs $hours")
      assert(dense.select("hour").distinct().count() == hours)
      // on edge hours, dense == sparse exactly
      val joined = dense.as("d").join(sparse.as("s"), Seq("hour"))
      assert(joined.count() == sparse.count())
      assert(joined.filter(col("d.peak") =!= col("s.peak")).count() == 0,
        "dense disagrees with sparse on an edge hour")
      // edge-free hours (if any at this sf) carry a non-negative level
      assert(dense.filter(col("peak") < 0).count() == 0)
    } finally dense.unpersist()
  }

  test("ts_holt_linear: the HOF fold equals a driver-side replay of the recursion") {
    // the distributed fold's every (level, trend) pair re-derived by a
    // plain Scala replay of Holt's recursion over the same daily
    // series — exact integer equality, including floor division
    // through negative trends
    def d5(v: Long): Long = { val r = ((v % 5) + 5) % 5; (v - r) / 5 }
    val out = graft.engine.Registry.byName("ts_holt_linear")
      .build(spark, sf).collect()
    assert(out.nonEmpty)
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (t, rows) =>
      val sorted = rows.sortBy(_.getString(1))
      var l = 0L; var b = 0L
      sorted.zipWithIndex.foreach { case (r, i) =>
        val x = r.getLong(2) * 1000000L
        if (i == 0) { l = x; b = 0L }
        else {
          val lp = d5(x + 4 * (l + b))
          b = d5(lp - l + 4 * b)
          l = lp
        }
        assert(r.getLong(3) == l && r.getLong(4) == b,
          s"$t day ${r.getString(1)}: got (${r.getLong(3)}, ${r.getLong(4)}), want ($l, $b)")
        assert(r.getLong(5) == l + b)
      }
    }
    // the floor-division-through-negatives path is actually exercised
    assert(out.exists(_.getLong(4) < 0), "fixture never produces a negative trend")
  }
}
