package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Dev probe: stage-by-stage timing of the CURRENT graph_triangles
  * pipeline (order-array pair explode → fused-dedup adjacency →
  * orientation → adjacency-intersect) at sf0.1. */
class TriangleProbe extends SparkSpec {
  test("measure: triangle stage costs at sf0.1") {
    val s = "/root/testdata/sf0.1"
    def tick[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tri] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val a = array_sort(col("ps"))
    val e0 = Tables.lineitem(spark, s)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy("ok").agg(collect_set(col("pk")).as("ps"))
      .select(explode(flatten(transform(a, (x, i) =>
        transform(slice(a, i + 2, size(a)), y =>
          struct(x.as("u"), y.as("v")))))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val e = e0.localCheckpoint(true)
    tick("pair-build+checkpoint")(e.count())
    val sym = e.select(col("u").as("x"), col("v").as("y"))
      .unionAll(e.select(col("v").as("x"), col("u").as("y")))
    val adjFull = sym.groupBy("x")
      .agg(collect_set(col("y")).as("nbrs"))
      .withColumn("d", size(col("nbrs")))
      .localCheckpoint(true)
    tick("adjFull+checkpoint")(adjFull.count())
    val dmap = adjFull.select(col("x").as("v"), col("d").as("dv"))
    val keep = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = adjFull
      .select(col("x").as("u"), col("d").as("du"), explode(col("nbrs")).as("v"))
      .join(broadcast(dmap), "v").filter(keep)
      .select(col("u").as("s"), col("v").as("t"))
    val adjO = o.groupBy("s").agg(array_sort(collect_list(col("t"))).as("nbrs"))
      .localCheckpoint(true)
    tick("orient+adjO+checkpoint")(adjO.count())
    def triStage(intersect: (org.apache.spark.sql.Column,
        org.apache.spark.sql.Column) => org.apache.spark.sql.Column) = o
      .join(broadcast(adjO.select(col("s"), col("nbrs").as("nu"))), "s")
      .join(broadcast(adjO.select(col("s").as("t"), col("nbrs").as("nv"))), "t")
      .select(col("s").as("a"), col("t").as("b"),
        explode(intersect(col("nu"), col("nv"))).as("c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    val out = tick("hash array_intersect stage")(
      triStage(array_intersect).count())
    println(s"[tri] nodes=$out")
    tick("hash array_intersect stage WARM")(triStage(array_intersect).count())
    // the shipped form: codegen'd sorted-merge walk, no per-row hash set
    tick("sorted-merge intersect stage")(
      triStage(graft.plans.SortedIntersectElems.elems).count())
    tick("sorted-merge intersect stage WARM")(
      triStage(graft.plans.SortedIntersectElems.elems).count())
    val edges = e.count()
    val wedges = o.groupBy("s").agg(count(lit(1)).as("d"))
      .agg(sum(col("d") * col("d"))).head.getLong(0)
    println(s"[tri] edges=$edges oriented-wedge-bound=$wedges")
  }
}
