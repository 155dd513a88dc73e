package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: warm same-session sf0.1 vs 10×-replica timings for the
  * SCALING.md ratio rows (in-ledger sf0.1 numbers carry box drift —
  * the r9 lesson: always rerun the baseline in the same session).
  * Run: sbt "Test/runMain graft.ReplicaBenchProbe <replicaDir> <q>..." */
object ReplicaBenchProbe {
  def main(args: Array[String]): Unit = {
    val replica = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      val fn = SparkEntry.queries(q)
      def warm(dir: String): Double = {
        fn(spark, dir).count()
        val t0 = System.nanoTime(); fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val base = warm("/root/testdata/sf0.1")
      val big = warm(replica)
      println(f"REPLICA $q%-20s sf0.1=$base%7.2f sf1=$big%7.2f ratio=${big / base}%5.1f")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
