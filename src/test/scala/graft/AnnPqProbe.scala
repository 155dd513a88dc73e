package graft

import org.apache.spark.sql.functions._
import graft.queries.{AnnKmeans, AnnPq}

/** Dev probe (not a test): measures ADC recall and codebook usage at
  * the dev scale factors so the declared verdict floors are MEASURED
  * numbers, not guesses. Run:
  *   sbt "testOnly graft.AnnPqProbe" -- -z measure
  */
class AnnPqProbe extends SparkSpec {
  test("measure: ADC recall + codebook usage at sf0.001/sf0.01") {
    for (s <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val vecs = AnnKmeans.quantized(spark, s).localCheckpoint(false)
      val sub = AnnPq.subvecs(vecs).localCheckpoint(false)
      // the SHIPPED path: driver-local Lloyd over the bounded sample
      // (bit-equal to the distributed train() wherever the corpus
      // fits inside TrainSample — AnnPqSpec pins that)
      val books = AnnPq.trainLocalBooks(spark, sub)
      val codes = AnnPq.encode(sub, books).localCheckpoint(false)
      val used = codes.select("m", "cid").distinct().count()
      val qsub = sub.filter(col("vec_id") < 100)
      val queries = vecs.filter(col("vec_id") < 100)
      val exact = AnnPq.topkExactL2(vecs, queries, AnnPq.TopK)
      val truth = exact.count()
      // the declared query's R at this corpus plus the next two
      // doublings — keeps the floor-headroom evidence fresh
      for (r <- Seq(math.max(AnnPq.Shortlist, (vecs.count() / 20L).toInt),
          100, 200).distinct) {
        val short = AnnPq.topkAdc(codes, books, qsub, r)
        val hits = exact.join(short, Seq("query_id", "vec_id"), "left_semi").count()
        println(s"[annpq] sf=$s used=$used/${AnnPq.M * AnnPq.Kc} " +
          s"shortlist=$r recall=$hits/$truth")
      }
    }
  }
}
