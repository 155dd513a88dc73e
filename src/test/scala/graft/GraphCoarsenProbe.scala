package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement for multi-level Louvain (r11): after the
  * 16-round level-1 sweep, contract communities to supernodes
  * (inter-community directed edge counts become weights, intra-
  * community counts become self-loops) and measure the level-2 Q
  * trajectory on the contracted WEIGHTED graph under candidate move
  * schedules — the r10 lesson is to measure the schedule BEFORE
  * building the operator. Run with
  *   sbt "Test/runMain graft.GraphCoarsenProbe [sfDir]"
  */
object GraphCoarsenProbe {
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

    // ---- level 1: replay the shipped 16-round sweep exactly ----
    var lab = cu0
    for (r <- 0 until 16) {
      val side = r % 2
      val slice = (r / 2) % 8
      val dc = lab.toSeq.groupBy(_._2)
        .map { case (c, ns) => c -> ns.map(n => deg.getOrElse(n._1, 0L)).sum }
      lab = lab.map { case (u, c0) =>
        val move = (u % 2 == side) && ((u / 2) % 8 == slice)
        u -> (if (!move) c0 else deg.get(u) match {
          case None => c0
          case Some(d) =>
            val eyc = nbrs(u).groupBy(lab).map { case (c, l) => c -> l.length.toLong }
            (eyc.keySet + c0).toSeq.map { c =>
              (t * eyc.getOrElse(c, 0L) -
                d * (dc(c) - (if (c == c0) d else 0L)), c)
            }.minBy { case (s, c) => (-s, c) }._2
        })
      }
    }
    def q(l: Map[Long, Int]): Double = {
      val internal = adj.count { case (u, v) => l(u) == l(v) }
      val dcm = l.toSeq.groupBy(_._2)
        .map { case (_, ns) => ns.map(n => deg.getOrElse(n._1, 0L)).sum }
      internal.toDouble / t - dcm.map(d => (d.toDouble / t) * (d.toDouble / t)).sum
    }
    println(f"level-1 final: Q=${q(lab)}%.6f communities=${lab.values.toSet.size}")

    // ---- contract: supernode = level-1 community ----
    // directed weighted edges between distinct supernodes + weighted
    // degree D_U (includes self-loop weight — total degree preserved)
    val w = adj.map { case (u, v) => (lab(u), lab(v)) }
      .groupBy(identity).map { case (k, l) => k -> l.length.toLong }
    val dW = w.groupBy(_._1._1).map { case (u, es) => u -> es.values.sum }
    val nodes = dW.keys.toSeq.sorted
    println(s"contracted: ${nodes.size} supernodes, " +
      s"${w.count { case ((a, b), _) => a != b }} directed cross edges, " +
      s"self-loop weight ${w.collect { case ((a, b), x) if a == b => x }.sum}")

    def q2(l2: Map[Int, Int]): Double = {
      val internal = w.collect { case ((a, b), x) if l2(a) == l2(b) => x }.sum
      val dcm = nodes.groupBy(l2).map { case (_, ns) => ns.map(dW).sum }
      internal.toDouble / t - dcm.map(d => (d.toDouble / t) * (d.toDouble / t)).sum
    }

    // candidate schedules: (name, #rounds, node->moves-this-round?)
    val schedules = Seq(
      ("8r side2xslice4", 8, (u: Int, r: Int) =>
        (u % 2 == r % 2) && ((u / 2) % 4 == (r / 2) % 4)),
      ("16r side2xslice8", 16, (u: Int, r: Int) =>
        (u % 2 == r % 2) && ((u / 2) % 8 == (r / 2) % 8)),
      ("4r side2xslice2", 4, (u: Int, r: Int) =>
        (u % 2 == r % 2) && ((u / 2) % 2 == (r / 2) % 2)))

    for ((name, rounds, sched) <- schedules) {
      var l2: Map[Int, Int] = nodes.map(n => n -> n).toMap
      println(f"== schedule $name: init Q=${q2(l2)}%.6f")
      for (r <- 0 until rounds * 2) { // 2 sweeps to see oscillation
        val dc = nodes.groupBy(l2).map { case (c, ns) => c -> ns.map(dW).sum }
        val nl = l2.map { case (u, c0) =>
          u -> (if (!sched(u, r % rounds)) c0 else {
            val eyc = w.collect {
              case ((a, b), x) if a == u && b != u => (l2(b), x) }
              .groupBy(_._1).map { case (c, l) => c -> l.map(_._2).sum }
            (eyc.keySet + c0).toSeq.map { c =>
              (BigInt(t) * BigInt(eyc.getOrElse(c, 0L)) -
                BigInt(dW(u)) * BigInt(dc(c) - (if (c == c0) dW(u) else 0L)), c)
            }.minBy { case (s, c) => (-s, c) }._2
          })
        }
        val m = nl.count { case (u, c) => c != l2(u) }
        l2 = nl
        val sweep = if (r < rounds) 1 else 2
        println(f"  sweep$sweep round ${r % rounds}%2d moved=$m%3d Q2=${q2(l2)}%.6f")
      }
      println(f"  final: Q2=${q2(l2)}%.6f comms=${l2.values.toSet.size}")
    }
    spark.stop()
  }
}
