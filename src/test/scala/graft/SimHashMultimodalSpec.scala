package graft

import org.apache.spark.sql.functions._
import graft.queries.{Multimodal, NearDup, SimHash}

class SimHashSpec extends SparkSpec {

  private def mkDocs(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def synthDoc(seed: Long): String = {
    val vocab = (0 until 40).map(i => s"tok$i")
    var x = seed
    (0 until 60).map { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L)
      vocab(((x >>> 33) % 40).toInt)
    }.mkString(" ")
  }

  test("identical docs have hamming 0; near-dups small; unrelated docs distant") {
    val base = synthDoc(1)
    val near = base.split(" ").updated(5, "MUTATED").mkString(" ")
    val docs = mkDocs(Seq((1L, base), (2L, base), (3L, near), (4L, synthDoc(77))))
    val sig = SimHash.simhash(NearDup.shingleRows(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L), sig(3L)) < ham(sig(1L), sig(4L)),
      s"near=${ham(sig(1L), sig(3L))} far=${ham(sig(1L), sig(4L))}")
  }

  test("nearPairs finds exact duplicates and respects the hamming bound") {
    val base = synthDoc(5)
    val docs = mkDocs(Seq((1L, base), (2L, base), (3L, synthDoc(6)), (4L, synthDoc(9))))
    val pairs = SimHash.nearPairs(docs, 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 0)
    assert(pairs.values.forall(_ <= 3))
  }

  test("simhash_near on the real corpus agrees with MinHash on exact dup sets") {
    // every jaccard-1.0 pair (identical shingle sets) must be hamming 0
    val docs = graft.engine.Tables.documents(spark, sf)
    val mh = NearDup.nearDupPairs(docs, 0.5)
      .filter(col("jac") === 1.0)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = SimHash.nearPairs(docs, 0)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.subsetOf(sh), s"missing: ${mh -- sh}")
  }
}

class MultimodalSpec extends SparkSpec {

  test("feature extraction is deterministic and schema-stable") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
    val a = feats.orderBy("media_id").collect()
    val b = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .orderBy("media_id").collect()
    assert(a.length == 500)
    assert(a.map(_.media_id).sameElements(b.map(_.media_id)))
    assert(a.map(_.mean_byte).sameElements(b.map(_.mean_byte)))
  }

  test("histogram buckets sum to payload size; mean is consistent") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf)).collect()
    feats.foreach { f =>
      assert(f.hist4.sum == f.n_bytes, s"media ${f.media_id}")
      assert(f.mean_byte >= 0 && f.mean_byte <= 255)
    }
  }

  test("payload bytes match the source text length (decode plumbing intact)") {
    val n = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf)).toDF()
      .join(graft.engine.Tables.documents(spark, sf),
        col("media_id") === col("doc_id"))
      .filter(col("n_bytes") =!= length(col("text")))
      .count()
    assert(n == 0)
  }

  test("frame sampling produces every strideth block") {
    val media = Multimodal.mediaTable(spark, sf).limit(5)
    val frames = Multimodal.frameSample(media, blockSize = 16, stride = 2)
    val byId = frames.groupBy("media_id").agg(count(lit(1)).as("n"),
      max("frame_idx").as("maxIdx")).collect()
    byId.foreach { r =>
      // frames kept are idx 0, 2, 4, ... — max index even, count = max/2+1
      assert(r.getInt(2) % 2 == 0)
      assert(r.getLong(1) == r.getInt(2) / 2 + 1)
    }
  }

  test("resize stub honors the requested output shape contract") {
    val out = Multimodal.Codec.resize(Array.fill[Byte](1000)(7), 32, 32)
    assert(out.length == 32 * 32 / 64)
  }

  test("multimodal_quality: clean corpus profiles clean; both failure counters fire on a poisoned frame") {
    val out = graft.engine.Registry.byName("multimodal_quality")
      .build(spark, sf).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("jpeg", "png", "webp"))
    val nDocs = graft.engine.Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == nDocs, "every asset profiled once")
    out.foreach { r =>
      assert(r.getLong(2) == 0 && r.getLong(3) == 0,
        s"${r.getString(0)}: clean corpus must profile clean")
      assert(r.getLong(4) > 0 && r.getLong(5) >= r.getLong(4))
      assert(r.getLong(6) >= r.getLong(5)) // total >= max
    }
    // the corpus carries no corruption, so prove the two failure
    // counters with the operator's own expressions on a poisoned
    // frame (dq_profile's constructed-probe discipline)
    val s = spark
    import s.implicits._
    val bad = Seq(
      (1L, "ok", 2L),   // payload "ok", declared 2 — clean
      (2L, "", 5L),     // empty payload AND declared mismatch
      (3L, "abc", 9L))  // non-empty but declared size wrong
      .toDF("id", "txt", "declared")
      .select(col("id"), encode(col("txt"), "UTF-8").as("payload"),
        col("declared"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .agg(sum(when(col("n_bytes") === 0, 1L).otherwise(0L)).as("n_empty"),
        sum(when(col("n_bytes") =!= col("declared"), 1L).otherwise(0L))
          .as("n_mismatch"))
      .collect()(0)
    assert(bad.getLong(0) == 1L, "empty-payload counter")
    assert(bad.getLong(1) == 2L, "meta-mismatch counter")
  }

  test("multimodal_near_dup: full driver replay — fingerprint, banding, bucket cap, Hamming verify") {
    import graft.queries.Multimodal
    val texts = graft.engine.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def fpOf(t: String): Long =
      (0 until Multimodal.SimBits).map { b =>
        val v = (0 to t.length - 4).map { i =>
          val k = t(i).toLong * 16777216L + t(i + 1).toLong * 65536L +
            t(i + 2).toLong * 256L + t(i + 3).toLong
          if (((Multimodal.SimA(b) * k + Multimodal.SimB(b)) %
            Multimodal.SimP) % 2 == 1) 1L else -1L
        }.sum
        if (v > 0) 1L << b else 0L
      }.sum
    val fps = texts.filter(_._2.length >= 4)
      .map { case (id, t) => id -> fpOf(t) }
    val buckets = scala.collection.mutable
      .Map[(Int, Long), Vector[(Long, Long)]]()
    fps.foreach { case (id, f) =>
      (0 until 4).foreach { j =>
        val bv = (f >> (8 * j)) & 255L
        buckets((j, bv)) = buckets.getOrElse((j, bv), Vector.empty) :+
          ((id, f))
      }
    }
    val want = buckets.values
      .filter(_.size <= graft.queries.NearDup.MaxBucketDocs)
      .flatMap(v => for { a <- v; b <- v if a._1 < b._1 }
        yield (a._1, b._1, java.lang.Long.bitCount(a._2 ^ b._2)))
      .toSet.filter(_._3 <= Multimodal.MaxAssetHamming)
    val got = graft.engine.Registry.byName("multimodal_near_dup")
      .build(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want,
      s"pair table diverges from replay: got ${got.size}, want ${want.size}; " +
        s"diff ${(got diff want).take(3)} / ${(want diff got).take(3)}")
    // byte-identical payloads (hamming 0 by construction) can never
    // be missed: distance ≤ 3 pigeonholes into a shared 8-bit band
    val exactDupPairs = texts.groupBy(_._2).values.filter(_.size > 1)
      .flatMap(g => for { a <- g.toSeq; b <- g.toSeq if a._1 < b._1 }
        yield (a._1, b._1))
    exactDupPairs.foreach { case (a, b) =>
      assert(got.contains((a, b, 0)) ||
        // unless every shared bucket was df-capped — then the drop
        // is the documented, oracle-mirrored policy
        (0 until 4).forall { j =>
          val f = fps.toMap.apply(a)
          buckets((j, (f >> (8 * j)) & 255L)).size >
            graft.queries.NearDup.MaxBucketDocs
        },
        s"exact dup ($a, $b) missed without a cap excuse")
    }
  }

  test("affine sign family: multibyte grams reduce mod P before the multiply (r12 ADVICE overflow fence)") {
    // the largest code-point 4-gram ascii()/substr can produce
    // (U+10FFFF in every slot) — ~1.87e13, far past P
    val cp = 1114111L
    val k = cp * 16777216L + cp * 65536L + cp * 256L + cp
    // unreduced, the b=31 product would overflow a BIGINT: Spark
    // would wrap silently while DuckDB raises — the divergence the
    // reduction fences off
    assert(BigInt(Multimodal.SimA.last) * BigInt(k) >
      BigInt(Long.MaxValue))
    val s = spark
    import s.implicits._
    val df = Seq(k).toDF("k")
    for (b <- Seq(0, 15, 31)) {
      val got = df.select(
        (((lit(Multimodal.SimA(b)) * (col("k") % Multimodal.SimP) +
          lit(Multimodal.SimB(b))) % Multimodal.SimP) % 2).as("bit"))
        .collect()(0).getLong(0)
      // modular identity: the reduced form equals the whole-k affine
      // value computed without overflow in BigInt
      val want = (((BigInt(Multimodal.SimA(b)) * BigInt(k) +
        Multimodal.SimB(b)) mod BigInt(Multimodal.SimP)) mod 2).toLong
      assert(got == want, s"bit $b: got $got, want $want")
    }
    // and on ASCII-range grams the reduction is the identity (k < P),
    // so the shipped fingerprints are unchanged by the fence
    val kAscii = 127L * 16777216L + 127L * 65536L + 127L * 256L + 127L
    assert(kAscii < Multimodal.SimP)
  }
}
