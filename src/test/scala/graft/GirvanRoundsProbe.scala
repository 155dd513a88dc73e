package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sizing probe for graph_girvan_rounds (r14): measures the σ-wave
  * exhaustion depth of the 8-seed Brandes pass ON the bounded top-500
  * split subgraph, per divisive round (round 1 = uncut subgraph,
  * round 2 = after the first cut), at every testdata SF — the
  * literals the oracle unroll pins. Run:
  *   sbt -batch "Test/runMain graft.GirvanRoundsProbe"
  */
object GirvanRoundsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.GraphOps

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val strong = graft.engine.Tables.lineitem(spark, dir)
        .join(graft.engine.Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy((col("o_custkey") * 2).as("c"),
          (col("l_suppkey") * 2 + 1).as("s"))
        .agg(count(lit(1)).as("m"))
        .orderBy(col("m").desc, col("c").asc, col("s").asc)
        .limit(500)
        .select(least(col("c"), col("s")).as("u"),
          greatest(col("c"), col("s")).as("v"))
        .localCheckpoint(false)
      def bidir(und: DataFrame) =
        und.select(col("u").as("src"), col("v").as("dst"))
          .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
          .localCheckpoint(false)
      def seedsOf(und: DataFrame) =
        und.select(col("u").as("node"))
          .unionAll(und.select(col("v").as("node"))).distinct()
          .filter(col("node") % 2 === 0)
          .orderBy("node").limit(8).localCheckpoint(false)
      var rest = strong
      for (r <- 1 to 2) {
        val e = bidir(rest)
        val seeds = seedsOf(rest)
        val (lv, rounds) = GraphOps.bfsSigmaPerSource(e, seeds)
        val (_, eacc) = GraphOps.brandesBackward(e, lv, rounds)
        val maxC = eacc.agg(max(abs(col("c")))).collect()(0).getLong(0)
        println(s"PROBE $sf round $r: edges=${rest.count()} " +
          s"seeds=${seeds.count()} bfs_rounds=$rounds maxC=$maxC " +
          s"lvRows=${lv.count()}")
        val ebc = eacc
          .groupBy(least(col("node"), col("wnode")).as("u"),
            greatest(col("node"), col("wnode")).as("v"))
          .agg(sum(col("c")).as("ebc"))
        val cut = rest.join(ebc, Seq("u", "v"), "left")
          .select(col("u"), col("v"),
            coalesce(col("ebc"), lit(0L)).as("ebc"))
          .orderBy(col("ebc").desc, col("u").asc, col("v").asc)
          .limit(8).select("u", "v").localCheckpoint(false)
        rest = rest.join(cut, Seq("u", "v"), "left_anti")
          .localCheckpoint(false)
      }
    }
    spark.stop()
  }
}
