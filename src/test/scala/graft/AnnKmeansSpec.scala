package graft

import org.apache.spark.sql.functions._
import graft.queries.AnnKmeans

/** k-means IVF semantics beyond the declared verdict row: Lloyd
  * monotonicity per step, the probe dial's recall ordering, and
  * bit-identical retraining (the exact-integer-arithmetic property
  * the whole design rests on). */
class AnnKmeansSpec extends SparkSpec {

  private def wcss(asg: org.apache.spark.sql.DataFrame): Long =
    asg.agg(sum("dist")).head.getLong(0)

  test("Lloyd iterations are monotone non-increasing in WCSS") {
    val vecs = AnnKmeans.quantized(spark, sf).cache()
    try {
      val c0 = AnnKmeans.seed(vecs)
      val a0 = AnnKmeans.assign(vecs, c0)
      val c1 = AnnKmeans.update(vecs, a0)
      val a1 = AnnKmeans.assign(vecs, c1)
      val c2 = AnnKmeans.update(vecs, a1)
      val a2 = AnnKmeans.assign(vecs, c2)
      val (w0, w1, w2) = (wcss(a0), wcss(a1), wcss(a2))
      assert(w1 <= w0, s"iteration 1 raised WCSS: $w0 -> $w1")
      assert(w2 <= w1, s"iteration 2 raised WCSS: $w1 -> $w2")
      assert(w2 < w0, "two Lloyd rounds improved nothing (degenerate)")
    } finally { vecs.unpersist(); () }
  }

  test("the probe dial: nprobe=3 recall strictly beats nprobe=1") {
    val vecs = AnnKmeans.quantized(spark, sf).cache()
    try {
      val cents = AnnKmeans.train(vecs)
      val queries = vecs.filter(col("vec_id") < 100)
      val exact = AnnKmeans.topkExact(vecs, queries, AnnKmeans.TopK).cache()
      def hits(np: Int): Long = exact.join(
        AnnKmeans.topkInCell(vecs, cents, queries, AnnKmeans.TopK, np),
        Seq("query_id", "vec_id"), "left_semi").count()
      val (h1, h3) = (hits(1), hits(3))
      assert(h3 > h1, s"probing more cells did not raise recall: $h1 vs $h3")
      assert(h3 >= 150, s"nprobe=3 recall below the verdict floor: $h3/300")
      exact.unpersist()
    } finally { vecs.unpersist(); () }
  }

  test("retraining reproduces bit-identical centroids (exact integer path)") {
    val vecs = AnnKmeans.quantized(spark, sf)
    val t1 = AnnKmeans.train(vecs).select(col("cid"), col("cv"))
    val t2 = AnnKmeans.train(vecs.repartition(7)).select(col("cid"), col("cv"))
    assert(t1.exceptAll(t2).unionAll(t2.exceptAll(t1)).isEmpty,
      "centroids differ across partitionings — determinism broken")
  }
}
