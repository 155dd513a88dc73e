package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.GraphOps
import graft.engine.Tables

/** Dev-only: where does graph_pagerank's time go at the 10× replica?
  * Times the edge build/checkpoint and each iteration count.
  * Run with sbt "Test/runMain graft.PagerankProbe /tmp/graft_sf1"
  */
object PagerankProbe {
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

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"PROBE $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      a
    }

    val pairs = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val e0 = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))

    // mirror the SHIPPED GraphOps.pagerank plan exactly: edges
    // partitioned by DST (the aggregate key), rank side broadcast —
    // an earlier probe revision kept the rejected src-partitioned
    // orientation and its per-round timings stopped explaining the
    // declared plan
    val e = t("edges eager ckpt") {
      e0.repartition(col("dst")).localCheckpoint(true)
    }
    val deg = t("deg eager ckpt") {
      e.groupBy("src").agg(count(lit(1)).as("d")).localCheckpoint(true)
    }
    var r = t("r0 eager ckpt") {
      deg.select(col("src").as("node"), lit(GraphOps.R0).as("r"))
        .localCheckpoint(true)
    }
    for (i <- 1 to 3) {
      r = t(s"round $i") {
        val contribs = r.withColumnRenamed("node", "src").join(deg, "src")
          .select(col("src"), expr("r div d").as("cpe"))
        e.join(broadcast(contribs), "src")
          .groupBy(col("dst").as("node"))
          .agg(sum(col("cpe")).as("cin"))
          .select(col("node"),
            (lit(150000L) + expr("(85 * cin) div 100")).as("r"))
          .localCheckpoint(true)
      }
    }
    t("final orderBy collect")(r.orderBy("node").count())
    t("declared q full")(engine.Registry.byName("graph_pagerank").build(spark, sf).count())
    t("declared q again")(engine.Registry.byName("graph_pagerank").build(spark, sf).count())
    spark.stop()
  }
}
