package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Dev probe: stage-by-stage timing of graph_triangles at sf0.1. */
class TriangleProbe extends SparkSpec {
  test("measure: triangle stage costs at sf0.1") {
    val s = "/root/testdata/sf0.1"
    def tick[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[tri] $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = Tables.lineitem(spark, s)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct().localCheckpoint(true)
    tick("pairs+distinct")(e.count())
    val deg = e.select(col("u").as("x")).unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d")).localCheckpoint(true)
    tick("deg")(deg.count())
    val lower = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val o = e
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .select(when(lower, col("u")).otherwise(col("v")).as("s"),
        when(lower, col("v")).otherwise(col("u")).as("t"))
      .localCheckpoint(true)
    tick("orient")(o.count())
    val adj = o.groupBy("s").agg(collect_list(col("t")).as("nbrs"))
      .localCheckpoint(true)
    tick("adj")(adj.count())
    val tri = o
      .join(broadcast(adj.select(col("s"), col("nbrs").as("nu"))), "s")
      .join(broadcast(adj.select(col("s").as("t"), col("nbrs").as("nv"))), "t")
      .select(col("s").as("a"), col("t").as("b"),
        explode(array_intersect(col("nu"), col("nv"))).as("c"))
    val out = tick("intersect+explode+agg")(
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n_tri")).count())
    println(s"[tri] nodes=$out")
  }
}
