package graft

import org.apache.spark.sql.functions._

/** Proofs for the r13 Louvain label sink (VERDICT r12 #5): the hash
  * gate covers content cross-engine; these pin (1) the read-back is
  * bit-equal to the raw 16-round loop and lands one file per bucket,
  * (2) the family consumers (sweep rollup, coarsener) see the exact
  * labels the loop produced — the sink is a pure accounting move. */
class LouvainSinkSpec extends SparkSpec {

  test("sink_louvain_labels: read-back is bit-equal to the 16-round loop; one file per bucket") {
    val lab = queries.GraphOps.louvainLabels(spark, sf)
    val raw = queries.GraphOps.louvainSweepLoop(spark, sf)
    assert(lab.exceptAll(raw).isEmpty && raw.exceptAll(lab).isEmpty,
      "materialized label table diverges from the sweep loop")
    val out = engine.Registry.byName("sink_louvain_labels")
      .build(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getInt(3) == queries.GraphOps.LouvainBuckets),
      "part-file count != bucket count")
    // membership accounting closes: Σ n_nodes = |V|
    val nV = lab.count()
    assert(out.map(_.getLong(1)).sum == nV)
  }

  test("sweep rollup off the sink matches a direct rollup of the loop labels") {
    val raw = queries.GraphOps.louvainSweepLoop(spark, sf)
    val sweep = engine.Registry.byName("graph_louvain_sweep")
      .build(spark, sf).collect()
      .map(r => r.get(0).toString.toLong -> r.getLong(1)).toMap
    val want = raw.groupBy("nc")
      .agg(countDistinct(col("node")).as("n"))
      .collect().map(r => r.get(0).toString.toLong -> r.getLong(1)).toMap
    assert(sweep == want,
      "per-community node counts diverge between sink-fed sweep and raw loop")
  }
}
