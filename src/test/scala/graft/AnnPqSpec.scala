package graft

import org.apache.spark.sql.functions._
import graft.engine.Registry
import graft.queries.{AnnKmeans, AnnPq}

/** Structural invariants for the PQ pipeline beyond the declared
  * verdict row: code-table shape, shortlist/rerank containment, and
  * exact-duplicate retrieval (a planted pair PQ must never miss). */
class AnnPqSpec extends SparkSpec {

  private lazy val vecs = AnnKmeans.quantized(spark, sf).localCheckpoint(false)
  private lazy val sub = AnnPq.subvecs(vecs).localCheckpoint(false)
  private lazy val books = AnnPq.train(sub).localCheckpoint(false)
  private lazy val codes = AnnPq.encode(sub, books).localCheckpoint(false)

  test("codes: exactly M per vector, ids within [0, Kc)") {
    val n = vecs.count()
    assert(codes.count() == n * AnnPq.M)
    assert(codes.filter(col("cid") < 0 || col("cid") >= AnnPq.Kc).count() == 0)
    val badArity = codes.groupBy("vec_id").agg(count(lit(1)).as("k"))
      .filter(col("k") =!= AnnPq.M).count()
    assert(badArity == 0)
  }

  test("codebooks: M subspaces x <= Kc words, each SubDim wide") {
    val rows = books.collect()
    assert(rows.map(_.getInt(1)).forall(c => c >= 0 && c < AnnPq.Kc))
    assert(rows.map(r => r.getSeq[Long](2).length).forall(_ == AnnPq.SubDim))
    assert(books.select("m").distinct().count() == AnnPq.M)
  }

  test("rerank output is contained in the ADC shortlist and exactly ranked") {
    val qsub = sub.filter(col("vec_id") < 20)
    val queries = vecs.filter(col("vec_id") < 20)
    val short = AnnPq.topkAdc(codes, books, qsub, AnnPq.Shortlist)
      .localCheckpoint(false)
    val pq = AnnPq.rerank(short, vecs, queries, AnnPq.TopK)
      .localCheckpoint(false)
    // containment
    assert(pq.join(short.select("query_id", "vec_id"),
      Seq("query_id", "vec_id"), "left_anti").count() == 0)
    // the rerank's top-1 is the TRUE nearest among the shortlist:
    // recompute exact distances for all shortlist rows and compare
    val q = queries.select(col("vec_id").as("query_id"),
      col("qv").as("qq"), col("norm2").as("qn"))
    val exact = short.join(vecs, "vec_id").join(broadcast(q), "query_id")
      .withColumn("dist", col("qn") -
        lit(2L) * graft.plans.LongArrayDot.dot(col("qq"), col("qv")) +
        col("norm2"))
      .groupBy("query_id")
      .agg(min(struct(col("dist"), col("vec_id"))).as("b"))
      .select(col("query_id"), col("b.vec_id").as("best"))
    val top1 = pq.filter(col("rk") === 1)
      .select(col("query_id"), col("vec_id").as("got"))
    assert(top1.join(exact, "query_id")
      .filter(col("got") =!= col("best")).count() == 0)
  }

  test("a planted exact duplicate is always retrieved at rank 1") {
    // clone vec 0 as a new corpus row; its codes equal vec 0's, its
    // ADC distance to query 0 is the minimum possible, and the exact
    // rerank must put one of the two clones at rank 1
    val clone = vecs.filter(col("vec_id") === 0)
      .select(lit(900000L).as("vec_id"), col("qv"), col("norm2"))
    val vecs2 = vecs.unionByName(clone).localCheckpoint(false)
    val sub2 = AnnPq.subvecs(vecs2).localCheckpoint(false)
    val books2 = AnnPq.train(sub2)
    val codes2 = AnnPq.encode(sub2, books2)
    // identical vectors → identical codes
    val c0 = codes2.filter(col("vec_id") === 0).select("m", "cid")
    val c9 = codes2.filter(col("vec_id") === 900000L).select("m", "cid")
    assert(c0.exceptAll(c9).count() == 0 && c9.exceptAll(c0).count() == 0)
    val qsub2 = sub2.filter(col("vec_id") === 0)
    val q2 = vecs2.filter(col("vec_id") === 0)
    val short2 = AnnPq.topkAdc(codes2, books2, qsub2, AnnPq.Shortlist)
    val pq2 = AnnPq.rerank(short2, vecs2, q2, 1)
    val got = pq2.filter(col("query_id") === 0 && col("rk") === 1)
      .select("vec_id").head.getLong(0)
    assert(got == 900000L, s"clone not at rank 1 (got $got)")
  }

  test("declared ann_pq verdict row is all-true at test scale") {
    val row = Registry.byName("ann_pq").build(spark, sf).head
    assert(row.getBoolean(1) && row.getBoolean(2) && row.getBoolean(3))
  }

  test("driver-local sample training is bit-equal to the distributed Lloyd on a covered corpus") {
    // sf0.001's corpus fits inside TrainSample, so the sample IS the
    // corpus and trainLocalBooks must replicate train() exactly:
    // same cells, same integer centroids, same norms
    assert(vecs.filter(col("vec_id") >= AnnPq.TrainSample).count() == 0,
      "fixture outgrew TrainSample; this equality test needs full coverage")
    val local = AnnPq.trainLocalBooks(spark, sub)
      .select("m", "cid", "cv", "cnorm2")
    val dist = books.select("m", "cid", "cv", "cnorm2")
    assert(local.exceptAll(dist).count() == 0 &&
      dist.exceptAll(local).count() == 0,
      "local sample-trained codebooks diverge from the distributed Lloyd")
  }
}
