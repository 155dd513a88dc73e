package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: exact vs sketch-only retention matrix cost at a scale dir
  * (the production shapes — no verdict harness on either side).
  * Run with sbt "Test/runMain graft.RetentionProbe /tmp/graft_sf1"
  */
object RetentionProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def matrix(agg: org.apache.spark.sql.Column): DataFrame = {
      val ev = graft.engine.Tables.loadEvents(spark, sf)
      val c = ev.groupBy("user_id")
        .agg(date_trunc("day", min(col("ts"))).as("cohort"))
      ev.select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .join(c, "user_id")
        .groupBy(col("cohort"),
          datediff(col("day"), col("cohort")).cast("long").as("day_offset"))
        .agg(agg.as("n_users"))
    }
    def time(label: String, df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"RETENTION $label%-10s ${t}%.3f s")
    }
    time("exact", matrix(countDistinct(col("user_id"))))
    time("sketch", matrix(approx_count_distinct(col("user_id"), 0.02)))
    spark.stop()
  }
}
