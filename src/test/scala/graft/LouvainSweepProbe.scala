package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement: does iterating the scheduled Louvain move
  * round (8 hash slices × 2 bipartite sides = one full sweep) keep
  * improving modularity, and where does it converge? Run with
  *   sbt "Test/runMain graft.LouvainSweepProbe [sfDir] [rounds]"
  * Driver-side replay of the exact integer gain argmax (the same
  * algebra GraphOpsSpec replays for one round), so the probe is
  * cheap and exact.
  */
object LouvainSweepProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val rounds = if (args.length > 1) args(1).toInt else 32
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
    val cu0: Map[Long, Int] =
      (engine.Tables.customer(spark, sf)
        .select((col("c_custkey") * 2).as("n"), col("c_nationkey")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)) ++
       engine.Tables.supplier(spark, sf)
        .select((col("s_suppkey") * 2 + 1).as("n"), col("s_nationkey")).collect()
        .map(r => r.getLong(0) -> r.getInt(1))).toMap
    val t = adj.length.toLong
    val deg = adj.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val nbrs = adj.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }

    def q(lab: Map[Long, Int]): Double = {
      val internal = adj.count { case (u, v) => lab(u) == lab(v) }
      val dc = lab.toSeq.groupBy(_._2)
        .map { case (_, ns) => ns.map(n => deg.getOrElse(n._1, 0L)).sum }
      internal.toDouble / t - dc.map(d => (d.toDouble / t) * (d.toDouble / t)).sum
    }

    var lab = cu0
    println(f"round -1 (init): Q=${q(lab)}%.6f")
    var moved = 0L
    for (r <- 0 until rounds) {
      val side = r % 2 // 0 = customers (even), 1 = suppliers (odd)
      val slice = (r / 2) % 8
      val dc = lab.toSeq.groupBy(_._2)
        .map { case (c, ns) => c -> ns.map(n => deg.getOrElse(n._1, 0L)).sum }
      val nl = lab.map { case (u, c0) =>
        val onSide = (u % 2 == side)
        val onSlice = ((u / 2) % 8 == slice)
        u -> (if (!onSide || !onSlice) c0 else deg.get(u) match {
          case None => c0
          case Some(d) =>
            val eyc = nbrs(u).groupBy(lab).map { case (c, l) => c -> l.length.toLong }
            (eyc.keySet + c0).toSeq.map { c =>
              (t * eyc.getOrElse(c, 0L) -
                d * (dc(c) - (if (c == c0) d else 0L)), c)
            }.minBy { case (s, c) => (-s, c) }._2
        })
      }
      val m = nl.count { case (u, c) => c != lab(u) }
      moved += m
      lab = nl
      println(f"round $r%2d side=$side slice=$slice moved=$m%5d Q=${q(lab)}%.6f")
    }
    println(s"total moves: $moved; communities: ${lab.values.toSet.size}")
    spark.stop()
  }
}
