package graft

import org.apache.spark.sql.functions._
import graft.queries.NearDup

/** MinHash-LSH near-dup: planted-pair recall, precision, and recall vs
  * the exact ground truth on the real corpus (SURVEY.md §5). */
class NearDupSpec extends SparkSpec {

  private def mkDocs(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // deterministic pseudo-random doc: 60 tokens from a 40-word vocab
  private def synthDoc(seed: Long): String = {
    val vocab = (0 until 40).map(i => s"tok$i")
    var x = seed
    (0 until 60).map { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L)
      vocab(((x >>> 33) % 40).toInt)
    }.mkString(" ")
  }

  test("planted near-duplicates are found; unrelated docs are not paired") {
    val base = synthDoc(1)
    val nearDup = base.split(" ").updated(5, "MUTATED").mkString(" ") // j ≈ 0.9
    val docs = mkDocs(Seq(
      (1L, base), (2L, nearDup),
      (3L, synthDoc(100)), (4L, synthDoc(200)), (5L, synthDoc(300))))
    val pairs = NearDup.nearDupPairs(docs, 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "planted pair missed")
    assert(pairs.size == 1, s"false positives: $pairs")
  }

  test("exact duplicates get jaccard 1.0") {
    val d = synthDoc(7)
    val docs = mkDocs(Seq((1L, d), (2L, d), (3L, synthDoc(8))))
    val rows = NearDup.nearDupPairs(docs, 0.5).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Double]("jac") == 1.0)
  }

  test("containment finds a doc embedded in a 4x-longer one that Jaccard misses") {
    // doc 2 = doc 1 quoted whole inside 3 unrelated parts: C(1,2) ≈ 1
    // while J = |A|/|B| ≈ 0.25 — below any useful Jaccard threshold
    val short = synthDoc(42)
    val long = Seq(synthDoc(500), short, synthDoc(600), synthDoc(700))
      .mkString(" ")
    val docs = mkDocs(Seq(
      (1L, short), (2L, long), (3L, synthDoc(800)), (4L, synthDoc(900))))
    val cont = NearDup.containmentPairs(docs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getAs[Double]("containment"))).toMap
    assert(cont.contains((1L, 2L)), s"embedded doc missed: $cont")
    assert(cont((1L, 2L)) >= 0.9, s"containment too low: ${cont((1L, 2L))}")
    // the same pair is invisible to symmetric Jaccard at tau=0.5
    val jac = NearDup.nearDupPairs(docs, 0.5)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!jac.contains((1L, 2L)),
      "fixture defect: pair visible to Jaccard, containment adds nothing")
    // no false positives among the unrelated docs
    assert(cont.keySet.forall(_ == ((1L, 2L))), s"false positives: $cont")
  }

  test("100% recall vs exact blocked Jaccard ground truth at sf0.001") {
    val docs = graft.engine.Tables.documents(spark, sf)
    // exact ground truth: all-pairs 3-gram-shingle jaccard ≥ 0.5
    val sh = NearDup.shingleRows(docs)
      .groupBy("doc_id").agg(collect_set("sh").as("t"))
    val a = sh.select(col("doc_id").as("id1"), col("t").as("t1"))
    val b = sh.select(col("doc_id").as("id2"), col("t").as("t2"))
    val truth = a.join(b, col("id1") < col("id2"))
      .withColumn("jac",
        size(array_intersect(col("t1"), col("t2"))).cast("double") /
          size(array_union(col("t1"), col("t2"))).cast("double"))
      .filter(col("jac") >= 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = NearDup.nearDupPairs(docs, 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "ground truth unexpectedly empty")
    assert(found == truth,
      s"missed=${(truth -- found).size} extra=${(found -- truth).size}")
  }

  test("clusters converges on a planted diameter-10 chain") {
    // Chain of 11 sliding-window docs: doc i = tokens [4i, 4i+19] over
    // one unique token stream → 18 shingles each, consecutive docs
    // share 14 (jac 14/22 ≈ 0.64 ≥ 0.5), distance-2 docs share 10
    // (10/26 ≈ 0.38 < 0.5). So the pair graph is exactly the path
    // 1-2-…-11 (diameter 10) — the old fixed-6-round propagation
    // could NOT reach min-label across it; the convergence loop must.
    val docs = mkDocs((0 until 11).map { i =>
      ((i + 1).toLong, (i * 4 until i * 4 + 20).map(t => s"w$t").mkString(" "))
    })
    for ((label, impl) <- Seq[(String,
        (org.apache.spark.sql.DataFrame, Double) => org.apache.spark.sql.DataFrame)](
        "min-label" -> ((d, t) => NearDup.clusters(d, t)),
        "star" -> ((d, t) => NearDup.clustersStar(d, t)))) {
      val rows = impl(docs, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(rows.length == 11,
        s"$label: expected all 11 chain docs, got ${rows.length}")
      assert(rows.forall(_._2 == 1L),
        s"$label: all labels must reach the chain min 1: ${rows.toSeq.sortBy(_._1)}")
      assert(rows.count(_._3) == 1 && rows.find(_._3).get._1 == 1L, label)
    }
  }

  test("star contraction equals min-label propagation on the real corpus") {
    val docs = graft.engine.Tables.documents(spark, sf)
    val a = NearDup.clusters(docs, 0.5)
    val b = NearDup.clustersStar(docs, 0.5)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      "clustersStar diverged from clusters")
    assert(a.count() > 0, "vacuous: no clusters at this sf")
  }

  test("short docs (<3 tokens) are excluded, not crashed on") {
    val docs = mkDocs(Seq((1L, "one two"), (2L, "solo"), (3L, synthDoc(9))))
    assert(NearDup.nearDupPairs(docs, 0.5).count() == 0)
  }

  test("incremental cluster maintenance equals the full recompute on the real corpus") {
    val docs = graft.engine.Tables.documents(spark, sf)
    val full = NearDup.clustersAuto(docs, 0.5)
    val inc = NearDup.clustersIncremental(docs, 0.5)
    assert(full.exceptAll(inc).count() == 0 && inc.exceptAll(full).count() == 0,
      "incremental resolution diverged from the full fixpoint")
    assert(full.count() > 0, "vacuous: no clusters at this sf")
  }

  test("incremental maintenance survives a planted old/new component merge") {
    // doc 16 ≡ 0 mod 8 ("arrived today") bridges two OLD components
    // {1,9} and {17,25}: the delta pair stream must trigger a
    // cross-component merge and the merged label must be the global
    // min (1) — the exact case a naive label-append would get wrong.
    val a = synthDoc(7)
    val b = synthDoc(8)
    val docs = mkDocs(Seq(
      (1L, a), (9L, a + " x"), (17L, b), (25L, b + " y"),
      (16L, a + " " + b))) // contains both → pairs with all four
    val out = NearDup.clustersIncremental(docs, 0.2).collect()
    val full = NearDup.clustersAuto(docs, 0.2).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet ==
      full.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet)
    val labels = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (labels.size == 5) // all five in one merged component
      assert(labels.values.toSet == Set(1L), "merged label must be the global min")
  }

  test("minhash estimator tracks true jaccard within the K=64 noise envelope") {
    val rows = graft.engine.Registry.byName("dedup_minhash_accuracy")
      .build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty, "vacuous: no overlapping pairs at this sf")
    // both regimes populated: incidental-overlap bands AND a high band
    assert(rows.exists(_._1 <= 5) && rows.exists(_._1 >= 80),
      s"bimodal corpus not covered: bands ${rows.map(_._1).toSeq}")
    rows.foreach { case (band, n, sumAbs, maxAbs, sumErr) =>
      assert(n > 0)
      assert(math.abs(sumErr) <= sumAbs, s"band $band: |bias| > total error")
      // K=64 ⇒ std error ≤ 10000·√(0.25/64) = 625 bp; mean |err| per
      // band must sit well inside a few sigma (granularity alone is
      // 156 bp). 2000 bp = ~3.2σ + granularity, safe at any SF.
      assert(sumAbs / n <= 2000,
        s"band $band: mean |err| ${sumAbs / n} bp — estimator broken")
      assert(maxAbs <= 10000)
    }
  }

  test("simhash response curve: random pairs center near 32, near-dups near 0, monotone") {
    val rows = graft.engine.Registry.byName("dedup_simhash_accuracy")
      .build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length >= 2, "vacuous: need both similarity regimes")
    // mean Hamming strictly decreases as exact similarity rises —
    // the property that makes Hamming banding a dedup signal
    val means = rows.sortBy(_._1).map(r => r._3.toDouble / r._2)
    assert(means.sliding(2).forall(p => p(0) > p(1)),
      s"response curve not monotone: ${means.toSeq}")
    // dissimilar pairs look random: 64 fair bits → mean 32, and the
    // band-0 population is large, so ±3 of 32 is generous
    val low = rows.minBy(_._1)
    assert(math.abs(low._3.toDouble / low._2 - 32.0) < 3.0,
      s"band-0 mean ${low._3.toDouble / low._2} not ~32")
    // near-dups land within a small Hamming ball (min reaches ≤ 3 —
    // simhash_near's maxHamming is a usable threshold)
    val high = rows.maxBy(_._1)
    assert(high._1 >= 8 && high._4 <= 3,
      s"top band ${high._1} min_ham ${high._4}")
    rows.foreach { case (_, n, sum, mn, mx) =>
      assert(n > 0 && mn >= 0 && mx <= 64 && sum >= mn * n && sum <= mx * n)
    }
  }

  test("dedup_soft_weights: all three policy masses conserve; assignments agree with dedup_clusters") {
    val out = graft.engine.Registry.byName("dedup_soft_weights")
      .build(spark, sf).collect()
    val total = graft.engine.Tables.documents(spark, sf).count()
    assert(out.length.toLong == total, "every doc (singletons included) gets a weight row")
    // count-dedup: keeper multiplicities conserve the corpus mass EXACTLY
    assert(out.map(_.getLong(4)).sum == total)
    val byCl = out.groupBy(_.getLong(1))
    byCl.foreach { case (_, rows) =>
      // exactly one keeper per cluster, and it is the min id
      assert(rows.count(_.getBoolean(3)) == 1)
      val keeper = rows.filter(_.getBoolean(3)).head
      assert(keeper.getLong(0) == rows.map(_.getLong(0)).min)
      assert(rows.forall(_.getLong(2) == rows.length.toLong))
      assert(keeper.getLong(4) == rows.length.toLong)
      // soft down-weight: cluster mass = 1e6 within the floor slack
      val mass = rows.map(_.getLong(5)).sum
      assert(mass <= 1000000L && mass > 1000000L - rows.length,
        s"soft mass $mass outside floor slack for size ${rows.length}")
    }
    // clustered docs carry dedup_clusters' exact assignment; the rest
    // are singletons defaulting to their own id
    val cl = graft.engine.Registry.byName("dedup_clusters")
      .build(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      cl.get(r.getLong(0)) match {
        case Some(cid) => assert(cid == r.getLong(1))
        case None => assert(r.getLong(1) == r.getLong(0))
      }
    }
    assert(byCl.exists(_._2.length > 1), "fixture must contain a real cluster")
  }

  test("sample_soft_weighted: singletons always kept; per-cluster threshold mass conserves; reproducible") {
    val weights = graft.engine.Registry.byName("dedup_soft_weights")
      .build(spark, sf).collect()
    val kept = graft.engine.Registry.byName("sample_soft_weighted")
      .build(spark, sf).collect()
    val keptIds = kept.map(_.getLong(0)).toSet
    // soft dedup never deletes unique content: every singleton
    // (member_w_ppm = 1e6 -> thr = 65536 > any u16) survives
    val singletons = weights.filter(_.getLong(2) == 1L)
    assert(singletons.nonEmpty)
    singletons.foreach(r => assert(keptIds(r.getLong(0)),
      s"singleton ${r.getLong(0)} was dropped"))
    // and the fixture has real clusters whose members were sampled
    assert(weights.exists(_.getLong(2) > 1L))
    // thr composes exactly from the emitted weight
    kept.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) * 65536L / 1000000L)
    }
    // mass conservation: each cluster's summed keep-probability mass
    // n·thr sits in (65536 - 2n, 65536] — one expected survivor,
    // short only by the two floor slacks
    weights.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      val n = rs.length.toLong
      val thr = (1000000L / n) * 65536L / 1000000L
      assert(thr * n <= 65536L && thr * n > 65536L - 2 * n,
        s"cluster of $n: mass ${thr * n}")
    }
    // reproducibility: the draw is a pure function of doc_id
    val again = graft.engine.Registry.byName("sample_soft_weighted")
      .build(spark, sf).collect()
    assert(kept.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // the kept set is exactly the predicate's fixpoint, replayed
    // driver-side over the weight table
    val md = java.security.MessageDigest.getInstance("MD5")
    def u16(id: Long): Long = {
      val h = md.digest(s"graftsw:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(2).map("%02x".format(_)).mkString, 16)
    }
    val want = weights.filter { r =>
      u16(r.getLong(0)) < r.getLong(5) * 65536L / 1000000L
    }.map(_.getLong(0)).toSet
    assert(keptIds == want, "kept set diverges from the driver replay")
  }

  test("dedup_lsh_scurve: full driver replay of the repeated-squaring S-curve over the measured pairs") {
    import org.apache.spark.sql.functions.{col, count, lit, xxhash64}
    val docs = graft.engine.Tables.documents(spark, sf)
    val hs = NearDup.shingleRows(docs).distinct()
      .select(col("doc_id"), xxhash64(col("sh")).as("h"))
    val dfc = hs.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= NearDup.ContainmentDfCap).select("h")
    val rare = hs.join(dfc, "h")
      .select("doc_id", "h").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nr = rare.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val byH = rare.groupBy(_._2).values.toSeq
    val ni = scala.collection.mutable.Map[(Long, Long), Long]()
    for (g <- byH; a <- g; b <- g if a._1 < b._1)
      ni((a._1, b._1)) = ni.getOrElse((a._1, b._1), 0L) + 1L
    val sMicros = ni.toSeq.map { case ((i, j), n) =>
      n * 1000000L / (nr(i) + nr(j) - n) }
    assert(sMicros.nonEmpty)
    // the exact repeated-squaring composition, replayed in Scala
    def pMicro(sM: Long, r: Int, b: Int): Long = {
      val sv = sM.toDouble / 1000000.0
      val s2 = sv * sv; val s4 = s2 * s2; val s8 = s4 * s4
      val s16 = s8 * s8
      val q = 1.0 - (r match {
        case 2 => s2; case 4 => s4; case 8 => s8; case _ => s16 })
      val q2 = q * q; val q4 = q2 * q2; val q8 = q4 * q4
      val q16 = q8 * q8; val q32 = q16 * q16; val q64 = q32 * q32
      val pb = b match {
        case 8 => q8; case 16 => q16; case 32 => q32; case _ => q64 }
      math.floor((1.0 - pb) * 1000000.0).toLong
    }
    val cfgs = Seq((2, 64), (4, 32), (8, 16), (16, 8))
    val want = (for ((r, b) <- cfgs; sM <- sMicros)
      yield ((b, r, sM / 100000L), pMicro(sM, r, b)))
      .groupBy(_._1).view.mapValues(xs =>
        (xs.length.toLong, xs.map(_._2).sum)).toMap
    val got = graft.engine.Registry.byName("dedup_lsh_scurve")
      .build(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { row =>
      val key = (row.getInt(0), row.getInt(1), row.getLong(2))
      val (n, mass) = want(key)
      assert(row.getLong(3) == n, s"$key n_pairs")
      assert(row.getLong(4) == mass, s"$key catch_mass_micro")
      // the S-curve's defining monotonicities, on the emitted table:
      // P in [0, 1] scaled
      assert(mass >= 0L && mass <= n * 1000000L)
    }
    // at matched hash budget, smaller r has the softer curve: for the
    // LOWEST observed decile, expected recall is non-increasing in r
    val lowDec = got.map(_.getLong(2)).min
    val lows = got.filter(_.getLong(2) == lowDec)
      .sortBy(_.getInt(1))
      .map(r => r.getLong(4).toDouble / r.getLong(3))
    assert(lows.zip(lows.tail).forall { case (a, b) => a >= b },
      s"low-s recall must fall as r rises: ${lows.mkString(", ")}")
  }
}
