package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time the graph_louvain_sweep rounds to localize the
  * planning-time stats blowup. Run:
  *   sbt "Test/runMain graft.LouvainPlanProbe [sfDir]" */
object LouvainPlanProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val df = engine.Registry.byName("graph_louvain_sweep").build(spark, sf)
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val t1 = System.nanoTime()
    val n = df.count()
    println(f"count=$n in ${(System.nanoTime() - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
