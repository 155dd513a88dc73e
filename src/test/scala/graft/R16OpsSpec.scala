package graft

import org.apache.spark.sql.functions._

/** Property proofs for the r16 operator wave (rank_map,
  * graph_clustering_coeff, ts_mann_kendall, ann_ivfadc) — the hash
  * gates prove cross-engine equality; these pin the semantic
  * invariants a wrong-but-self-consistent implementation could fake
  * past a differential. */
class R16OpsSpec extends SparkSpec {

  test("rank_map: AP bounds, triad consistency with rank_mrr, and a driver-side replay") {
    val map = engine.Registry.byName("rank_map").build(spark, sf).collect()
    val mrr = engine.Registry.byName("rank_mrr").build(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(map.nonEmpty)
    map.foreach { r =>
      val (q, hits, apSum) = (r.getLong(0), r.getLong(3), r.getLong(4))
      val ap = if (r.isNullAt(5)) None else Some(r.getLong(5))
      // AP ∈ [0, 1e6]: each precision contribution ≤ 1e6 and the
      // normalizer ≥ the number of countable hits
      ap.foreach(v => assert(v >= 0L && v <= 1000000L, s"q$q ap=$v"))
      // triad consistency: AP > 0 ⟺ MRR found a first relevant rank
      val firstRel = !mrr(q).isNullAt(2)
      assert((apSum > 0L) == firstRel && (hits > 0L) == firstRel,
        s"q$q: AP/MRR hit disagreement")
      // a perfect prefix (first hit at rank 1 and every hit
      // contiguous) would give contributions of exactly 1e6 each —
      // so apSum ≤ 1e6 · hits always, with equality only then
      assert(apSum <= 1000000L * hits, s"q$q: apSum exceeds hit bound")
    }
    // independent replay of one query's AP from the raw embedding
    // table (brute-force in Scala — the full definition, no shared
    // code with the operator)
    val emb = engine.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1048576).toLong).toArray))
    val (q0, qlab, qv) = emb.find(_._1 == 0L).get
    def dot(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val qn = math.sqrt(dot(qv, qv).toDouble)
    val ranked = emb.filter(_._1 != q0)
      .map { case (id, lab, v) =>
        val cos = BigDecimal(dot(qv, v).toDouble /
          (qn * math.sqrt(dot(v, v).toDouble)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP)
        (id, lab, cos)
      }
      .sortBy { case (id, _, cos) => (-cos, id) }
      .take(10)
    var cum = 0L; var apSum = 0L
    ranked.zipWithIndex.foreach { case ((_, lab, _), i) =>
      if (lab == qlab) { cum += 1; apSum += (cum * 1000000L) / (i + 1) }
    }
    val got = map.find(_.getLong(0) == 0L).get
    assert(got.getLong(4) == apSum,
      s"query 0 AP sum replay: got ${got.getLong(4)}, want $apSum")
  }

  test("graph_clustering_coeff: corner mass ties to graph_triangles; lcc bounds and NULL fence") {
    val lcc = engine.Registry.byName("graph_clustering_coeff")
      .build(spark, sf).collect()
    val tri = engine.Registry.byName("graph_triangles")
      .build(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lcc.nonEmpty)
    // every triangle-carrying node appears with the SAME count, and
    // nodes absent from the triangle table read 0
    lcc.foreach { r =>
      val (node, deg, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(n == tri.getOrElse(node, 0L), s"node $node triangle count")
      if (deg < 2) assert(r.isNullAt(3), s"node $node: deg<2 must be NULL")
      else {
        val v = r.getLong(3)
        assert(v >= 0L && v <= 1000000L, s"node $node lcc=$v")
        assert(v == (n * 2L * 1000000L) / (deg * (deg - 1L)),
          s"node $node lcc formula")
      }
    }
    // total corner mass is conserved: Σ n_tri = Σ graph_triangles
    assert(lcc.map(_.getLong(2)).sum == tri.values.sum)
  }

  test("ts_mann_kendall: exact S replay from the daily grid; theil-sen grid consistency") {
    val mk = engine.Registry.byName("ts_mann_kendall")
      .build(spark, sf).collect()
    val sen = engine.Registry.byName("ts_theil_sen")
      .build(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(mk.nonEmpty)
    // the pair census must match ts_theil_sen's on the shared grid
    mk.foreach { r =>
      val (et, nDays, nPairs) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(sen(et) == ((nDays, nPairs)), s"$et grid diverges from theil_sen")
      assert(math.abs(r.getLong(3)) + r.getLong(4) <= nPairs,
        s"$et |S| + ties exceeds pair count")
    }
    // independent S replay for one series from the raw event log
    val daily = engine.Tables.loadEvents(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().groupBy(_.getString(0))
    val et0 = mk.head.getString(0)
    val ys = daily(et0).sortBy(_.getDate(1).toString).map(_.getLong(2))
    var s0 = 0L; var ties = 0L
    for (i <- ys.indices; j <- (i + 1) until ys.length) {
      val d = java.lang.Long.compare(ys(j), ys(i))
      s0 += d
      if (d == 0) ties += 1
    }
    val got = mk.find(_.getString(0) == et0).get
    assert(got.getLong(3) == s0 && got.getLong(4) == ties,
      s"$et0: S/tie replay got (${got.getLong(3)}, ${got.getLong(4)}), want ($s0, $ties)")
  }

  test("ann_ivfadc: verdict booleans true; measured recall and candidate fraction reported") {
    val row = engine.Registry.byName("ann_ivfadc").build(spark, sf)
      .collect().head
    assert((1 to 3).forall(row.getBoolean), s"ivfadc verdict: $row")
    // measure the actual recall + candidate fraction off the shared
    // serve chain (the floor's documented margin)
    val vecs = queries.AnnKmeans.quantized(spark, sf).localCheckpoint(false)
    val qs = vecs.filter(col("vec_id") < 100)
    val (_, cand, top) = queries.AnnPq.ivfadcTopk(spark, sf, vecs)
    val exact = queries.AnnPq.topkExactL2(vecs, qs, queries.AnnPq.TopK)
    val hits = exact.join(top, Seq("query_id", "vec_id"), "left_semi").count()
    val truth = exact.count()
    val nCand = cand.count()
    val nQ = qs.count(); val nV = vecs.count()
    info(s"recall $hits/$truth, candidates $nCand of ${nQ * nV} (${nCand * 100 / (nQ * nV)}%)")
    assert(hits >= 150L, s"recall $hits below the declared floor")
    assert(nCand * 10 <= nQ * nV * 6, "candidate fraction above the 60% fence")
  }
}
