package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer (test scope): times named declared
  * queries at a scale dir with the Bench session shape, min-of-3.
  *   sbt "Test/runMain graft.TimeProbe /root/testdata/sf0.1 agg_stats sample_fraction"
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val keys = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (k <- keys) {
      val q = SparkEntry.queries(k)
      run(q(spark, sfDir)) // warm-up: plan + IO caches
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run(q(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"TIME $k%-28s ${t}%.3f s")
    }
    spark.stop()
  }
}
