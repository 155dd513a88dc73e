package graft

import org.apache.spark.sql.functions._
import graft.engine.{Registry, Tables}
import graft.functions.MisraGries
import graft.queries.PipelineOps

/** Semantic invariants for the round-4 pipeline operators, beyond the
  * DuckDB hash gate: SCD2 interval algebra, decontamination ground
  * truth, redaction completeness, and the Misra–Gries guarantees
  * under adversarial merge orders (which the declared verdict query
  * can only sample one layout of). */
class PipelineOpsSpec extends SparkSpec {

  private def run(name: String) = Registry.byName(name).build(spark, sf)

  test("merge_scd2: versions partition each user's timeline exactly") {
    val out = run("merge_scd2").cache()
    try {
      // exactly one open (is_current) version per user
      val users = out.select("user_id").distinct().count()
      assert(out.filter(col("is_current")).count() == users)
      // intervals chain: valid_to of version v == valid_from of v+1;
      // non-open intervals are strictly positive-length
      val chained = out.as("a").join(out.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.version") + 1 === col("b.version"))
      val broken = chained.filter(
        col("a.valid_to") =!= col("b.valid_from") ||
          col("a.valid_from") >= col("a.valid_to")).count()
      assert(broken == 0, s"$broken broken interval chains")
      // adjacent versions always change type (runs are maximal)
      val sameType = chained.filter(
        col("a.event_type") === col("b.event_type")).count()
      assert(sameType == 0, s"$sameType non-maximal runs")
      // version row count = 1 + number of type changes in event order
      val ev = Tables.loadEvents(spark, sf)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val changes = ev
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .count()
      assert(out.count() == changes)
      // n_events adds back up to the event log
      assert(out.agg(sum("n_events")).head.getLong(0) == ev.count())
    } finally { out.unpersist(); () }
  }

  test("contamination_check: containment fractions match a direct recompute") {
    val out = run("contamination_check").cache()
    try {
      assert(out.count() > 0, "vacuous: no corpus doc overlaps the holdout")
      // every winner comes from the holdout, fractions in (0, 1]
      assert(out.filter(col("eval_id") >= PipelineOps.EvalSetSize ||
        col("eval_id") < 0).count() == 0)
      assert(out.filter(col("contamination") <= 0 ||
        col("contamination") > 1).count() == 0)
      // independent recompute of the max containment for 5 sample docs
      // via the O(n²) definition the operator must never use at scale
      val docs = Tables.documents(spark, sf)
      val sh = queries.NearDup.shingleRows(docs).distinct().cache()
      val sample = out.orderBy("doc_id").limit(5).collect()
      val evalSets = sh.filter(col("doc_id") < PipelineOps.EvalSetSize)
        .collect().groupBy(_.getLong(0))
        .map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
      for (r <- sample) {
        val d = r.getLong(0)
        val mySh = sh.filter(col("doc_id") === d)
          .collect().map(_.getString(1)).toSet
        val best = evalSets.map { case (e, s) =>
          (mySh.intersect(s).size, -e)
        }.max
        assert(r.getLong(2) == best._1.toLong,
          s"doc $d: ni ${r.getLong(2)} != ${best._1}")
        assert(r.getLong(1) == -best._2, s"doc $d: wrong argmax eval doc")
        val frac = BigDecimal(best._1.toDouble / mySh.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(r.getDouble(3) - frac) < 1e-9)
      }
      sh.unpersist()
    } finally { out.unpersist(); () }
  }

  test("text_pii_redact scrubs every digit and counts the runs") {
    val out = run("text_pii_redact").cache()
    try {
      assert(out.filter(col("redacted").rlike("[0-9]")).count() == 0)
      // n_hits is consistent: replacing each run with one '#' means
      // len(original) - len(redacted) = totalDigitChars - n_runs ≥ 0,
      // checked exactly via a reference recompute on a sample
      val ev = Tables.loadEvents(spark, sf)
        .select("event_id", "props").limit(50).collect()
      val got = out.limit(50).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      for (r <- ev) {
        val (red, n) = got(r.getLong(0))
        val runs = "[0-9]+".r.findAllIn(r.getString(1)).toSeq
        assert(n == runs.size)
        assert(red == "[0-9]+".r.replaceAllIn(r.getString(1), "#"))
      }
    } finally { out.unpersist(); () }
  }

  test("MisraGries invariants hold under adversarial merge orders") {
    val k = 4
    // skewed stream: term i appears 2^(7-i) times, i = 0..9
    val stream = (0 until 10).flatMap(i => Seq.fill(1 << math.max(0, 7 - i))(s"t$i"))
    val n = stream.size
    def estimates(chunks: Seq[Seq[String]]): Map[String, Long] = {
      val mg = new MisraGries(k)
      chunks.map(_.foldLeft(mg.zero)(mg.reduce)).foldLeft(mg.zero)(mg.merge)
    }
    val truth = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    // layouts: single pass, sorted, reverse-sorted, round-robin 7 ways,
    // and a pathological all-heavy-first split
    val layouts = Seq(
      Seq(stream), Seq(stream.sorted), Seq(stream.sorted.reverse),
      (0 until 7).map(i => stream.zipWithIndex.collect { case (s, j) if j % 7 == i => s }),
      Seq(stream.filter(_ == "t0"), stream.filter(_ != "t0")))
    for ((chunks, li) <- layouts.zipWithIndex) {
      val est = estimates(chunks)
      assert(est.size <= k, s"layout $li: capacity exceeded")
      for ((t, e) <- est) {
        assert(e <= truth(t), s"layout $li: overcount of $t")
        assert(truth(t) - e <= n / (k + 1), s"layout $li: error bound broken for $t")
      }
      for ((t, c) <- truth if c > n / (k + 1))
        assert(est.contains(t), s"layout $li: heavy term $t evicted")
    }
  }

  test("scd2Merge == full recompute at every split boundary") {
    val ev = Tables.loadEvents(spark, sf).cache()
    try {
      val full = PipelineOps.scd2(ev)
      // boundaries spanning: near-empty prev, mid-split, near-empty
      // increment — each mixes absorb / close / new-user / quiet-user
      // includes the degenerate ends: a boundary before every event
      // (empty prev — merge must equal the increment's own SCD2) and
      // after every event (empty increment — prev must pass through)
      for (b <- Seq("2023-12-01", "2024-01-02", "2024-01-10",
          "2024-01-16", "2024-01-30", "2025-01-01")) {
        val t = lit(b).cast("timestamp_ntz")
        val merged = PipelineOps.scd2Merge(
          PipelineOps.scd2(ev.filter(col("ts") < t)),
          ev.filter(col("ts") >= t))
        val diff = merged.exceptAll(full).unionAll(full.exceptAll(merged))
        assert(diff.isEmpty, s"boundary $b: incremental != full recompute")
      }
    } finally { ev.unpersist(); () }
  }

  test("join_point_in_time: every probe event matches exactly one version") {
    val out = run("join_point_in_time").cache()
    try {
      val ev = Tables.loadEvents(spark, sf)
      val probeCount = ev
        .filter(col("ts") >= lit("2024-01-25").cast("timestamp_ntz")).count()
      // intervals tile the timeline: no probe row lost, none duplicated
      assert(out.count() == probeCount)
      assert(out.select("event_id").distinct().count() == probeCount)
      // the joined state is the probe event's own run: re-derive each
      // event's version from the SCD2 table directly for 5 samples
      val scd = queries.PipelineOps.scd2(ev).cache()
      for (r <- out.orderBy("event_id").limit(5).collect()) {
        val ts = r.getAs[java.time.LocalDateTime](2) // timestamp_ntz
        val hit = scd.filter(col("user_id") === r.getLong(1) &&
          col("valid_from") <= lit(ts) &&
          (col("valid_to").isNull || col("valid_to") > lit(ts)))
          .collect()
        assert(hit.length == 1)
        assert(hit.head.getAs[Long]("version") == r.getLong(3))
      }
      scd.unpersist()
    } finally { out.unpersist(); () }
  }

  test("corpus_pipeline dispositions are exhaustive and stage-consistent") {
    val out = run("corpus_pipeline").cache()
    try {
      val docs = Tables.documents(spark, sf)
      // one disposition per doc, none missing
      assert(out.count() == docs.count())
      val byStatus = out.groupBy("status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // every stage fires on this corpus (no vacuous stage);
      // eval_leak is data-dependent at this sf, so allowed-not-required
      for (s <- Seq("dup", "short", "sampled_out", "train", "val"))
        assert(byStatus.getOrElse(s, 0L) > 0, s"stage '$s' is vacuous")
      assert(Set("dup", "short", "sampled_out", "train", "val")
        .subsetOf(byStatus.keySet) && byStatus.keySet.subsetOf(
        Set("dup", "short", "eval_leak", "sampled_out", "train", "val")))
      // dup ⊎ eval_leak covers the non-canonical cluster members:
      // decontamination outranks dedup, so a leaking non-canonical
      // lands in eval_leak, every other one in dup — and nothing
      // outside the cluster non-canon set is ever 'dup'
      val nonCanon = queries.NearDup.clusters(docs, 0.5)
        .filter(!col("is_canonical")).select("doc_id")
      val dups = out.filter(col("status") === "dup").select("doc_id")
      val leaks = out.filter(col("status") === "eval_leak").select("doc_id")
      assert(dups.exceptAll(nonCanon).isEmpty, "a dup outside the cluster set")
      assert(nonCanon.exceptAll(dups.unionAll(leaks)).isEmpty,
        "a non-canonical member escaped both dup and eval_leak")
      // the canonical member of every cluster survives dedup (its
      // disposition is anything but 'dup') — no cluster is wiped out
      val canonKept = queries.NearDup.clusters(docs, 0.5)
        .filter(col("is_canonical")).select("doc_id")
        .join(out, "doc_id").filter(col("status") === "dup")
      assert(canonKept.isEmpty)
      // train share of the split pool is ~90%
      val tr = byStatus("train").toDouble
      val ratio = tr / (tr + byStatus("val"))
      assert(ratio > 0.8 && ratio < 0.97, s"split ratio off: $ratio")
    } finally { out.unpersist(); () }
  }

  test("MisraGries guarantees hold on random streams with random chunking") {
    // ScalaCheck-driven: Zipf-ish random streams over a 20-symbol
    // alphabet, split into random chunk layouts — the MG bounds must
    // hold for every (stream, layout) pair, not just curated ones
    import org.scalacheck.{Gen, rng}
    val k = 5
    val mg = new MisraGries(k)
    val streamGen = Gen.listOfN(400,
      Gen.frequency((8, Gen.const(0)), (4, Gen.const(1)), (2, Gen.const(2)),
        (1, Gen.choose(3, 19))).map(i => s"s$i"))
    for (seed <- 1 to 40) {
      val stream = streamGen(Gen.Parameters.default,
        rng.Seed(seed.toLong)).getOrElse(Nil)
      val n = stream.size
      // random chunk layout derived from the same seed
      val nChunks = 1 + seed % 7
      val chunks = stream.zipWithIndex
        .groupBy { case (_, i) => (i * 2654435761L + seed) % nChunks }
        .values.map(_.map(_._1)).toSeq
      val est = chunks.map(_.foldLeft(mg.zero)(mg.reduce))
        .foldLeft(mg.zero)(mg.merge)
      val truth = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      assert(est.size <= k, s"seed $seed: capacity broken")
      for ((t, e) <- est) {
        assert(e <= truth(t), s"seed $seed: overcount of $t")
        assert(truth(t) - e <= n / (k + 1), s"seed $seed: bound broken for $t")
      }
      for ((t, c) <- truth if c > n / (k + 1))
        assert(est.contains(t), s"seed $seed: heavy term $t evicted")
    }
  }

  test("agg_heavy_hitters verdict is non-vacuous (the heavy set is non-empty)") {
    val row = run("agg_heavy_hitters").head
    assert(row.getAs[Long]("n_heavy") >= 1, "no heavy language: verdict vacuous")
    assert(row.getAs[Boolean]("heavy_all_present"))
    assert(row.getAs[Boolean]("bounds_ok"))
    assert(row.getAs[Boolean]("capacity_ok"))
  }

  test("join_incremental: delta terms partition the join, non-vacuously") {
    val out = run("join_incremental").collect()
    // Spark-side monolithic recompute equals the 4-term merge
    val o = graft.engine.Tables.orders(spark, sf)
    val l = graft.engine.Tables.lineitem(spark, sf)
    val full = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        graft.engine.Dsl.sumDec2(col("l_quantity")).cast("double").as("sum_qty"))
      .orderBy("o_orderpriority").collect()
    assert(out.toSeq == full.toSeq)
    // non-vacuous: the cutoff actually splits BOTH sides
    val cut = lit("1997-01-01").cast("date")
    assert(o.filter(col("o_orderdate") < cut).count() > 0)
    assert(o.filter(col("o_orderdate") >= cut).count() > 0)
    assert(l.filter(col("l_shipdate") < cut).count() > 0)
    assert(l.filter(col("l_shipdate") >= cut).count() > 0)
  }

  test("dq_profile: driver-side replay + the null/distinct semantics on a null-bearing frame") {
    val out = run("dq_profile").collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("event_id", "event_type", "props", "ts", "user_id", "value"))
    val ev = engine.Tables.loadEvents(spark, sf)
      .select("event_id", "user_id", "event_type", "value").collect()
    val n = ev.length.toLong
    val byName = out.map(r => r.getString(0) -> r).toMap
    out.foreach(r => assert(r.getLong(1) == n, s"${r.getString(0)}: n_rows"))
    // exact replay of the numeric/string columns
    val eid = byName("event_id")
    assert(eid.getLong(2) == 0L &&
      eid.getLong(3) == ev.map(_.getLong(0)).distinct.length.toLong &&
      eid.getDouble(4) == ev.map(_.getLong(0)).min.toDouble &&
      eid.getDouble(5) == ev.map(_.getLong(0)).max.toDouble &&
      eid.isNullAt(6) && eid.isNullAt(7))
    val et = byName("event_type")
    assert(et.getLong(3) == ev.map(_.getString(2)).distinct.length.toLong &&
      et.isNullAt(4) && et.isNullAt(5) &&
      et.getString(6) == ev.map(_.getString(2)).min &&
      et.getString(7) == ev.map(_.getString(2)).max)
    val vl = byName("value")
    assert(vl.getDouble(4) == ev.map(_.getDouble(3)).min &&
      vl.getDouble(5) == ev.map(_.getDouble(3)).max)
    // this feed carries no nulls, so prove the null-counting and
    // null-excluding-distinct semantics on a constructed frame with
    // the operator's own expressions
    val session = spark
    import session.implicits._
    val probe = Seq((Option(1L), "a"), (Option.empty[Long], "b"),
      (Option.empty[Long], "b")).toDF("k", "s")
    val p = probe.agg(
      sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null"),
      countDistinct(col("k")).as("nd_k"),
      countDistinct(col("s")).as("nd_s"),
      min(col("k")).cast("double").as("mn")).collect()(0)
    assert(p.getLong(0) == 2L, "null count over a null-bearing column")
    assert(p.getLong(1) == 1L, "count(DISTINCT) must exclude NULLs")
    assert(p.getLong(2) == 2L)
    assert(p.getDouble(3) == 1.0)
  }

  test("feat_target_encode: leak-free replay from train rows only; shrinkage bounded by prior and raw mean") {
    val out = run("feat_target_encode").collect()
    assert(out.length == 20) // 5 event types × 4 user buckets
    val md = java.security.MessageDigest.getInstance("MD5")
    def u16(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 4), 16)
    val raw = engine.Tables.loadEvents(spark, sf)
      .select(col("event_id"), col("event_type"), col("user_id"),
        floor(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (s"${r.getString(1)}_${r.getLong(2) % 4}",
        r.getLong(3), u16(s"graftte:${r.getLong(0)}") % 10 < 8))
    val train = raw.filter(_._3)
    // split rate inside the binomial 3σ band around 0.8
    val rate = train.length.toDouble / raw.length
    assert(math.abs(rate - 0.8) < 3 * math.sqrt(0.8 * 0.2 / raw.length),
      s"train rate $rate")
    val prior = train.map(_._2).sum.toDouble / train.length
    def r4(x: Double) = BigDecimal(x).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    out.foreach { r =>
      val cat = r.getString(0)
      val tr = train.filter(_._1 == cat).map(_._2)
      assert(r.getLong(1) == tr.length.toLong, s"$cat n_train")
      // the encoding uses TRAIN rows only — recompute it without ever
      // touching a validation row
      val want = (tr.sum + 20.0 * prior) / (tr.length + 20.0)
      assert(r.getDouble(3) == r4(want), s"$cat enc ${r.getDouble(3)} vs ${r4(want)}")
      // shrinkage: enc lies between the raw train mean and the prior
      val rawMean = tr.sum.toDouble / tr.length
      val (lo, hi) = (math.min(rawMean, prior), math.max(rawMean, prior))
      assert(want >= lo - 1e-9 && want <= hi + 1e-9,
        s"$cat enc $want outside [$lo, $hi]")
    }
  }

  test("dq_freshness: watermark-anchored lags replay exactly; the watermark feed reads lag zero") {
    val out = graft.engine.Registry.byName("dq_freshness")
      .build(spark, sf).collect()
    val raw = graft.engine.Tables.loadEvents(spark, sf)
      .select(col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val wm = raw.map(_._2).max
    assert(out.length == raw.map(_._1).distinct.length)
    out.foreach { r =>
      val t = r.getString(0)
      val us = raw.filter(_._1 == t).map(_._2)
      assert(r.getLong(1) == us.length.toLong)
      assert(r.getLong(3) == (wm - us.max) / 1000000L, s"$t lag")
      assert(r.getLong(4) == us.count(_ > wm - 86400000000L).toLong, s"$t 24h")
      assert(r.getBoolean(5) == (r.getLong(3) <= 3600L), s"$t verdict")
      assert(r.getLong(4) <= r.getLong(1))
    }
    // the watermark is anchored IN the data: at least one feed must
    // read lag 0 (wall-clock anchoring could never guarantee this —
    // the property that makes the audit replayable)
    assert(out.exists(_.getLong(3) == 0L), "no feed carries the watermark")
  }

  test("dq_profile and dq_profile_approx both plan NO Expand; exact columns match; every sketch in tolerance") {
    import org.apache.spark.sql.execution.ExpandExec
    def expands(name: String): Int = {
      val p0 = run(name).queryExecution.executedPlan
      val p = p0 match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case x => x
      }
      p.collect { case e: ExpandExec => e }.size
    }
    // r16: the exact profiler's k-way multi-distinct was rewritten as
    // six independent single-column distinct branches — the 7-way
    // Expand (row multiplication) is gone from BOTH profilers
    assert(expands("dq_profile") == 0,
      "dq_profile's rewrite must plan NO Expand (six independent distinct branches)")
    assert(expands("dq_profile_approx") == 0,
      "dq_profile_approx must plan NO Expand — the 100 TB profile pass")
    // identical report apart from the verdict column: n_rows, n_null,
    // exact n_distinct, extrema all agree row for row
    val exact = run("dq_profile").collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = run("dq_profile_approx").collect()
    assert(approx.map(_.getString(0)).toSeq ==
      Seq("event_id", "event_type", "props", "ts", "user_id", "value"))
    approx.foreach { r =>
      val e = exact(r.getString(0))
      assert(r.getLong(1) == e.getLong(1) && r.getLong(2) == e.getLong(2)
        && r.getLong(3) == e.getLong(3), s"${r.getString(0)}: exact cols")
      assert(r.getBoolean(4), s"${r.getString(0)}: sketch out of tolerance")
      // extrema shifted one column right of dq_profile's layout
      Seq(5, 6, 7, 8).foreach { i =>
        val (a, b) = (r.get(i), e.get(i - 1))
        assert(a == b, s"${r.getString(0)} col $i: $a != $b")
      }
    }
  }

  test("dq_freshness_sla: both decision paths, uniform special case, and the uncovered-feed fence") {
    import graft.queries.PipelineOps.{freshnessAgainst, FeedSlaS}
    // daily-batch path (sf0.001): click is fresh at its own 24 h SLA
    // but the uniform 3600 s gate calls it stale
    val by = freshnessAgainst(spark, sf, FeedSlaS).collect()
      .map(r => r.getString(0) -> r).toMap
    val click = by("click")
    assert(click.getBoolean(6) && !click.getBoolean(7),
      "click must pass its own SLA and fail the uniform gate at sf0.001")
    assert(by.values.forall(r => r.getLong(8) == 0L && r.getBoolean(9)))
    // tight-poller path (sf0.01, the correctness gate's own fixture):
    // error is stale at its 1800 s SLA but the uniform gate calls it
    // fresh — the path the gated output itself carries
    val err = freshnessAgainst(spark, "/root/testdata/sf0.01", FeedSlaS)
      .collect().map(r => r.getString(0) -> r).toMap.apply("error")
    assert(!err.getBoolean(6) && err.getBoolean(7),
      "error must fail its own SLA and pass the uniform gate at sf0.01")
    // the uniform gate is the constant-manifest special case
    val const = freshnessAgainst(spark, sf,
      FeedSlaS.map { case (f, _) => f -> 3600L }).collect()
    const.foreach(r => assert(r.getBoolean(6) == r.getBoolean(7)))
    val uni = Registry.byName("dq_freshness").build(spark, sf).collect()
      .map(r => r.getString(0) -> r.getBoolean(5)).toMap
    const.foreach(r => assert(r.getBoolean(6) == uni(r.getString(0))))
    // the fence: a manifest missing a feed fails the WHOLE gate and
    // carries the uncovered feed with NULL verdicts, never drops it
    val cut = freshnessAgainst(spark, sf,
      FeedSlaS.filterNot(_._1 == "view")).collect()
    assert(cut.length == by.size, "uncovered feed must not be dropped")
    assert(cut.forall(r => r.getLong(8) == 1L && !r.getBoolean(9)))
    val v = cut.map(r => r.getString(0) -> r).toMap.apply("view")
    assert(v.isNullAt(5) && v.isNullAt(6))
  }
}
