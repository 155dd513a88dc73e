package graft

import org.apache.spark.sql.SparkSession

/** Dev-only sizing for graph_betweenness (r12, VERDICT r11 #3):
  * before building the operator, measure — per the house
  * probe-first rule — (1) the forward σ-wave's round count (the
  * oracle unroll), (2) max σ and max backward-pass product
  * σ_u·(1e6 + δ_w) (the BIGINT-overflow fence), (3) how far the
  * floor-quantized integer dependency recursion sits from textbook
  * float Brandes (semantic sanity). Run with
  *   sbt "Test/runMain graft.BetweennessProbe [sfDir]"
  */
object BetweennessProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val (eDf, lvDf, rounds) = queries.GraphOps.brandesForward(spark, sf)
    val edges = eDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val lv = lvDf.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap // (s, node) -> (h, sig)
    println(s"rounds=$rounds levels_rows=${lv.size} " +
      s"max_sig=${lv.values.map(_._2).max}")

    // integer backward pass, BigInt products to MEASURE the true
    // magnitude before committing to BIGINT in the operator
    val bySH = lv.groupBy { case ((s, _), (h, _)) => (s, h) }
    var maxProd = BigInt(0)
    var maxDelta = 0L
    var maxFloatDiff = 0.0
    val seeds = lv.keys.map(_._1).toSet
    val deltaI = scala.collection.mutable.Map[(Long, Long), Long]()
    val deltaF = scala.collection.mutable.Map[(Long, Long), Double]()
    for (s <- seeds; h <- rounds.toLong to 1L by -1L) {
      for (((_, w), (_, sigW)) <- bySH.getOrElse((s, h), Map.empty)) {
        val dW = deltaI.getOrElse((s, w), 0L)
        val dWF = deltaF.getOrElse((s, w), 0.0)
        for (u <- adj(w) if lv.get((s, u)).exists(_._1 == h - 1)) {
          val sigU = lv((s, u))._2
          val prod = BigInt(sigU) * BigInt(1000000L + dW)
          if (prod > maxProd) maxProd = prod
          val c = (prod / BigInt(sigW)).toLong
          deltaI((s, u)) = deltaI.getOrElse((s, u), 0L) + c
          deltaF((s, u)) = deltaF.getOrElse((s, u), 0.0) +
            sigU.toDouble / sigW * (1.0 + dWF)
        }
      }
      for (((_, u), _) <- bySH.getOrElse((s, h - 1), Map.empty)) {
        val d = deltaI.getOrElse((s, u), 0L)
        if (d > maxDelta) maxDelta = d
        val diff = math.abs(d / 1e6 - deltaF.getOrElse((s, u), 0.0))
        if (diff > maxFloatDiff) maxFloatDiff = diff
      }
    }
    println(f"max_delta=$maxDelta max_prod=$maxProd " +
      f"prod_vs_2^62=${BigDecimal(maxProd) / BigDecimal(BigInt(1) << 62)}%.6f " +
      f"max_abs_float_diff=$maxFloatDiff%.6f")
    // bc per node for a feel of the output scale
    val bc = deltaI.groupBy(_._1._2).view
      .mapValues(_.values.sum).toMap
    val top = bc.toSeq.sortBy(-_._2).take(5)
    println(s"top5_bc_micro=$top n_nodes_with_bc=${bc.count(_._2 > 0)}")
    spark.stop()
  }
}
