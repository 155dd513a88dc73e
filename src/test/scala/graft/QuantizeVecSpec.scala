package graft

import org.apache.spark.sql.functions._
import graft.engine.Vec
import graft.plans.QuantizeVec

/** The codegen'd quantizer must be BIT-IDENTICAL to the interpreted
  * HOF formulation it replaced — every vector oracle depends on the
  * floor(x·2^20) semantics staying exact. */
class QuantizeVecSpec extends SparkSpec {

  private def hofQuantize(c: org.apache.spark.sql.Column) =
    transform(c, x => floor(x.cast("double") * lit(Vec.QuantScale)).cast("long"))

  test("quantize_vec equals the transform-HOF form on the embeddings corpus") {
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val diff = emb.select(col("vec_id"),
      QuantizeVec.quantize(col("embedding")).as("a"),
      hofQuantize(col("embedding")).as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(diff.isEmpty, s"mismatch: ${diff.take(3).mkString(";")}")
  }

  test("quantize_vec handles doubles, negatives, empty arrays, and null input") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(0.5, -0.5, 0.0, 1.0e-7, -3.25)),
      (2L, Seq.empty[Double])).toDF("id", "v")
      .union(Seq((3L, null.asInstanceOf[Seq[Double]])).toDF("id", "v"))
    val rows = df.select(col("id"), QuantizeVec.quantize(col("v")).as("q"),
      hofQuantize(col("v")).as("h")).orderBy("id").collect()
    assert(rows(0).getSeq[Long](1) == rows(0).getSeq[Long](2))
    assert(rows(0).getSeq[Long](1) == Seq(524288L, -524288L, 0L, 0L, -3407872L))
    assert(rows(1).getSeq[Long](1).isEmpty)
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("quantize_vec propagates null ELEMENTS like the HOF (SQL-surface safety)") {
    // a null slot must stay null, not silently become 0 — callers of
    // the registered SQL function have no loader precondition
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq[java.lang.Double](0.5, null, -0.5))).toDF("id", "v")
    val r = df.select(QuantizeVec.quantize(col("v")).as("q"),
      hofQuantize(col("v")).as("h")).head()
    assert(r.getSeq[Any](0) == r.getSeq[Any](1))
    assert(r.getSeq[Any](0) == Seq(524288L, null, -524288L))
  }

  test("quantize_vec stays inside WholeStageCodegen (no interpreted HOF)") {
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val plan = emb.select(QuantizeVec.quantize(col("embedding")).as("q"))
      .queryExecution.executedPlan.toString
    // '*(n)' prefixes nodes inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("quantize_vec") && l.trim.startsWith("*(")), plan.take(600))
    // the codegen path must not fall back to the interpreted HOF
    assert(!plan.contains("transform("), plan.take(600))
  }
}
