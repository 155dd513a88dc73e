package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables

/** r17 scratch probe: decompose the wall time of the remaining slow
  * queries into their stages (guide §1 — measure first). Dev tool,
  * not part of the driver contract. */
object ProbeR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // ---- attribution_markov decomposition ----
    {
      val fn = SparkEntry.queries("attribution_markov")
      fn(spark, sfDir).count() // warm: codegen + sinks
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sq = Tables.loadEvents(spark, sfDir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
      val stepRow = struct(
        when(col("prev").isNull || col("prev") === "purchase",
          lit("start")).otherwise(col("prev")).as("s"),
        when(col("event_type") === "purchase", lit("conv"))
          .otherwise(col("event_type")).as("t"))
      val endRow = when(col("nxt").isNull &&
          col("event_type") =!= "purchase",
        struct(col("event_type").as("s"), lit("null").as("t")))
      val tc = sq
        .select(explode(array_compact(array(stepRow, endRow))).as("r"))
        .select(col("r.s").as("s"), col("r.t").as("t"))
        .groupBy("s", "t").agg(count(lit(1)).as("n"))
      time("markov.window_only")(noop(sq))
      time("markov.tc_grid")(noop(tc))
      time("markov.full")(fn(spark, sfDir).count())
      time("markov.full2")(fn(spark, sfDir).count())
    }

    // ---- ann_ivfadc decomposition ----
    {
      val fn = SparkEntry.queries("ann_ivfadc")
      fn(spark, sfDir).count() // warm
      val vecs = graft.queries.AnnKmeans.quantized(spark, sfDir)
        .localCheckpoint(false)
      val queries = vecs.filter(col("vec_id") < 100).limit(100)
      val (qprobe, cand, ivfadc) =
        graft.queries.AnnPq.ivfadcTopk(spark, sfDir, vecs)
      val exact = graft.queries.AnnPq.topkExactL2(vecs, queries,
        graft.queries.AnnPq.TopK)
      time("ivfadc.qprobe")(noop(qprobe))
      time("ivfadc.cand")(noop(cand))
      time("ivfadc.serve")(noop(ivfadc))
      time("ivfadc.exact_truth")(noop(exact))
      time("ivfadc.full")(fn(spark, sfDir).count())
      time("ivfadc.full2")(fn(spark, sfDir).count())
    }

    // ---- dedup_edit_nn decomposition ----
    {
      val fn = SparkEntry.queries("dedup_edit_nn")
      fn(spark, sfDir).count() // warm
      val docs = Tables.documents(spark, sfDir)
      val d0 = docs.select(col("doc_id"), col("lang"), col("source"),
        length(col("text")).as("len"),
        substring(col("text"), 1, 64).as("p"))
      time("editnn.d0_scan")(noop(d0))
      time("editnn.full")(fn(spark, sfDir).count())
      time("editnn.full2")(fn(spark, sfDir).count())
    }
    spark.stop()
  }
}
