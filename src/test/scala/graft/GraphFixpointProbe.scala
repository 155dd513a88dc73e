package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: measure the convergence depth of the graph fixpoints at
  * a given SF — the constant the unrolled-CTE oracles pin (the rounds
  * column gates it: if data ever needs more rounds than the oracle
  * unrolls, the hash fails loudly). Run with
  *   sbt "Test/runMain graft.GraphFixpointProbe [sfDir]"
  */
object GraphFixpointProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val pairs = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val e = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))

    val (core, kr) = graft.queries.GraphOps.kCoreEdges(e, 10)
    println(s"PROBE k_core rounds=$kr edges=${core.count()}")

    val we = e.withColumn("w", lit(1L) + (col("src") + col("dst")) % 5)
    val seeds = e.select(col("src").as("node")).distinct()
      .filter(col("node") % 2 === 0 && col("node") < 20)
    val (dist, br) = graft.queries.GraphOps.bellmanFord(we, seeds)
    println(s"PROBE bellman rounds=$br nodes=${dist.count()}")

    val lseeds = e.select(col("src").as("node")).distinct()
      .filter(col("node") % 2 === 0 && expr("(node div 2) % 10") === 0)
      .withColumn("lbl", expr("(node div 2) % 3"))
    val (lab, lr) = graft.queries.GraphOps.labelSpread(e, lseeds)
    println(s"PROBE label_spread rounds=$lr nodes=${lab.count()}")

    val (lv, rr) = graft.queries.GraphOps.bfsLevels(e, seeds.select("node"))
    println(s"PROBE reachability rounds=$rr nodes=${lv.count()}")

    val (_, pd) = graft.queries.GraphOps.pagerankDelta(
      e, graft.queries.GraphOps.Iters)
    println(s"PROBE pagerank_delta l1=$pd")
    spark.stop()
  }
}
