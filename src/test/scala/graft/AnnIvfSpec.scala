package graft

import org.apache.spark.sql.functions._
import graft.queries.AnnIvf

class AnnIvfSpec extends SparkSpec {

  test("the hardcoded Signs table equals the runtime hash parities") {
    // the DuckDB oracle embeds AnnIvf.Signs as literals; `bucketed`
    // derives the same ±1s from xxhash64 parity at runtime — if either
    // side changes, this is the tripwire
    val idx = spark.range(64).select(col("id").cast("int").as("i"))
    val signs = (0 until AnnIvf.Planes).map { j =>
      when(pmod(xxhash64(lit(j) * 4099 + col("i")), lit(2)) === 0, 1)
        .otherwise(-1).as(s"s$j")
    }
    val runtime = idx.select(col("i") +: signs: _*).orderBy("i").collect()
    runtime.foreach { r =>
      val i = r.getInt(0)
      (0 until AnnIvf.Planes).foreach { j =>
        assert(r.getInt(j + 1) == AnnIvf.Signs(j)(i),
          s"sign mismatch at plane $j component $i")
      }
    }
  }

  test("bucket assignment is deterministic and within range") {
    val b1 = AnnIvf.bucketed(spark, sf).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b2 = AnnIvf.bucketed(spark, sf).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b1 == b2)
    assert(b1.values.forall(b => b >= 0 && b < 256))
    assert(b1.values.toSet.size > 10, "bucketing degenerate")
  }

  test("every reported neighbour shares the query's bucket") {
    val b = AnnIvf.bucketed(spark, sf)
    val res = AnnIvf.topkInBucket(b, 3)
    val joined = res.join(
      b.select(col("vec_id"), col("bucket").as("cand_bucket")), "vec_id")
    assert(joined.filter(col("bucket") =!= col("cand_bucket")).count() == 0)
  }

  test("ann_ivf results are a subset of the exact ann_topk candidate scores") {
    // for each (query, neighbour) pair IVF returns, the exact cosine it
    // reports must match the quantized-cosine definition ann_topk uses
    val ivf = graft.engine.Registry.byName("ann_ivf").build(spark, sf)
      .select(col("query_id"), col("vec_id"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = graft.engine.Registry.byName("ann_topk").build(spark, sf)
      .select(col("query_id"), col("vec_id"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // overlapping pairs agree on the score exactly
    val overlap = ivf.keySet.intersect(exact.keySet)
    overlap.foreach(k => assert(ivf(k) == exact(k), s"score mismatch at $k"))
  }

  test("emb_near_dup reports only pairs above tau and finds planted duplicates") {
    val s = spark
    import s.implicits._
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val dup = emb.filter(col("vec_id") === 7)
      .select(lit(900007L).as("vec_id"), col("embedding"), col("label"))
    val patched = emb.select("vec_id", "embedding", "label").unionByName(dup)
    val dir = java.nio.file.Files.createTempDirectory("embnd").toString
    patched.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val pairs = AnnIvf.cosineNearDup(AnnIvf.bucketed(spark, dir, planes = 4), 0.25)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(pairs.forall(_._2 >= 0.25))
    assert(pairs.exists(p => p._1 == (7L, 900007L) && p._2 == 1.0),
      "planted exact duplicate not found (identical vectors share every bucket)")
  }

  test("multi-probe recall dominates single-probe against the exact baseline") {
    val b = AnnIvf.bucketed(spark, sf)
    val exact = graft.engine.Registry.byName("ann_topk").build(spark, sf)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(res: Array[org.apache.spark.sql.Row]): Double = {
      val found = res.map(r => (r.getLong(0), r.getLong(3))).toSet
      found.intersect(exact).size.toDouble / exact.size
    }
    val single = recall(AnnIvf.topkInBucket(b, 3).collect())
    val probed = recall(AnnIvf.topkInBucket(b, 3, multiProbe = true).collect())
    assert(probed >= single, s"multi-probe recall $probed < single $single")
  }

  test("an exact duplicate of a query vector is always retrieved (recall-1 case)") {
    val s = spark
    import s.implicits._
    // duplicate query vector 0 under a fresh id, rebuild the bucketed set
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val dup = emb.filter(col("vec_id") === 0)
      .select(lit(900000L).as("vec_id"), col("embedding"), col("label"))
    val patched = emb.select("vec_id", "embedding", "label").unionByName(dup)
    val dir = java.nio.file.Files.createTempDirectory("annivf").toString
    patched.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val res = AnnIvf.topkInBucket(AnnIvf.bucketed(spark, dir), 3)
      .filter(col("query_id") === 0).collect()
    assert(res.exists(r => r.getLong(3) == 900000L && r.getDouble(4) == 1.0),
      s"duplicate not retrieved: ${res.mkString(";")}")
  }

  test("ann_recall_curve: probe-monotone, bounded, over the full fixed query set") {
    val rows = graft.engine.Registry.byName("ann_recall_curve")
      .build(spark, sf).collect()
    assert(rows.length == 2)
    val byProbe = rows.map(r => r.getInt(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (pos1, hits1, r1) = byProbe(1)
    val (pos2, hits2, r2) = byProbe(2)
    assert(pos1 == pos2 && pos1 > 0, "both arms grade the same exact set")
    assert(hits1 <= hits2, "2-probe candidates contain 1-probe's")
    assert(r1 <= r2 && r2 <= 1.0 && r1 >= 0.0)
    assert(hits2 <= pos2)
  }

  test("emb_knn_graph: per-node ranked adjacency with a correct mutuality flag") {
    val rows = graft.engine.Registry.byName("emb_knn_graph")
      .build(spark, sf).collect()
    assert(rows.nonEmpty)
    val edges = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val bySrc = rows.groupBy(_.getLong(0))
    bySrc.foreach { case (src, es) =>
      val ranked = es.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq == (1 to ranked.length),
        s"$src: ranks not dense from 1")
      assert(ranked.length <= 3, s"$src: more than k edges")
      // cos non-increasing with rank, dst-tiebroken
      ranked.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDouble(3) > b.getDouble(3) ||
            (a.getDouble(3) == b.getDouble(3) && a.getLong(2) < b.getLong(2)),
            s"$src: rank order violates (cos desc, dst asc)")
        case _ =>
      }
      assert(es.forall(r => r.getLong(2) != src), s"$src: self edge")
      assert(es.forall(r => r.getDouble(3) >= -1.0001 && r.getDouble(3) <= 1.0001))
    }
    // the mutuality flag IS the reverse-edge membership test
    rows.foreach { r =>
      assert(r.getBoolean(4) == edges.contains((r.getLong(2), r.getLong(0))),
        s"mutual flag wrong for (${r.getLong(0)}, ${r.getLong(2)})")
    }
    // non-vacuous in both directions: some edges mutual, some not
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)),
      "fixture exercises only one mutuality value")
  }
}
