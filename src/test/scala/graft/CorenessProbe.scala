package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement for graph_coreness (r11): the h-index
  * iteration (Lü et al. 2016 — c₀ = degree, c_{k+1}(v) = H-index of
  * neighbors' c_k; converges to coreness from above, monotonically)
  * needs a ROUND COUNT for the oracle unroll. Measure rounds to the
  * exact peeling fixpoint at both fixtures, driver-side. Run with
  *   sbt "Test/runMain graft.CorenessProbe [sfDir]"
  */
object CorenessProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = engine.Tables.lineitem(spark, sf)
      .join(engine.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = pairs.flatMap { case (c, s) => Seq((c, s), (s, c)) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }

    // ground truth: textbook peeling
    val peel = scala.collection.mutable.Map(
      adj.map { case (k, v) => k -> v.length }.toSeq: _*)
    val core = scala.collection.mutable.Map[Long, Int]()
    var remaining = adj.keySet.to(scala.collection.mutable.Set)
    var k = 0
    while (remaining.nonEmpty) {
      val victims = remaining.filter(v =>
        adj(v).count(remaining.contains) <= k)
      if (victims.isEmpty) k += 1
      else victims.foreach { v => core(v) = k; remaining -= v }
    }
    println(s"peeling coreness: max=${core.values.max} " +
      s"hist=${core.values.groupBy(identity).view.mapValues(_.size).toMap.toSeq.sorted}")

    // h-index iteration
    def hIndex(vs: Seq[Int]): Int = {
      val sorted = vs.sortBy(-_)
      sorted.zipWithIndex.map { case (v, i) => math.min(v, i + 1) }
        .foldLeft(0)(math.max)
    }
    var c = adj.map { case (k2, v) => k2 -> v.length }
    var r = 0
    var done = false
    while (!done) {
      r += 1
      val nc = adj.map { case (u, ns) => u -> hIndex(ns.map(c).toSeq) }
      done = nc == c
      c = nc
      val diff = c.count { case (u, v) => v != core(u) }
      println(s"round $r: nodes off truth = $diff")
    }
    println(s"converged in $r rounds (last round is the no-change proof); " +
      s"exact = ${c.forall { case (u, v) => v == core(u) }}")
    spark.stop()
  }
}
