package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.{NearDup, PipelineOps}
import graft.engine.Tables

/** Dev-only probe for corpus_pipeline's stage costs (r7 perf item):
  * counts exchanges in the shared shingle-table build variants and
  * times each sequential action of the flagship separately.
  * Run: sbt "Test/runMain graft.PipeProbe /root/testdata/sf0.1"
  */
object PipeProbe {
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
    val docs = Tables.documents(spark, sf)

    def nx(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))

    val a = NearDup.shingleRows(docs).distinct().repartition(col("doc_id"))
    val b = NearDup.shingleRows(docs).repartition(col("doc_id"))
      .dropDuplicates("doc_id", "sh")
    val c = NearDup.shingleRows(docs).distinct()
    println(s"EXCHANGES distinct+repartition=${nx(a)} repartition+dropDup=${nx(b)} bareDistinct=${nx(c)}")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm the input scan once
    docs.count()
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val sh = time("sh-checkpoint") {
        val x = NearDup.shingleRows(docs).distinct()
          .repartition(col("doc_id")).localCheckpoint(false)
        x.count(); x
      }
      val canon = time("clustersAuto") {
        val x = NearDup.clustersAuto(docs, 0.5, Some(sh))
          .select(col("doc_id"), col("is_canonical"))
        x.count(); x
      }
      time("full-query") {
        graft.engine.Registry.byName("corpus_pipeline").build(spark, sf).count()
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
