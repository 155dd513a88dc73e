package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only: which plan shape defeats localCheckpoint truncation?
  * Run: sbt "Test/runMain graft.CheckpointProbe" */
object CheckpointProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = (1L to 1000L).map(i => (i % 100, i % 37)).toDF("src", "dst")
      .localCheckpoint(true)
    val tot = e.agg(count(lit(1)).as("t"))

    def loop(name: String)(step: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      var lab = e.select(col("src").as("node")).distinct()
        .withColumn("nc", col("node") % 7).localCheckpoint(true)
      for (r <- 0 until 16) {
        val t0 = System.nanoTime()
        lab = step(lab).localCheckpoint(true)
        val dt = (System.nanoTime() - t0) / 1e9
        if (r % 4 == 3 || dt > 1.0) println(f"$name round $r: $dt%.2f s (plan chars ${lab.queryExecution.logical.toString.length})")
      }
    }

    loop("plain-join") { lab =>
      lab.join(e, lab("node") === e("src")).groupBy("node")
        .agg(min(col("nc")).as("nc"))
    }
    loop("crossjoin-tot") { lab =>
      lab.join(e, lab("node") === e("src"))
        .crossJoin(broadcast(tot))
        .groupBy("node").agg(min(col("nc")).as("nc"))
    }
    loop("window") { lab =>
      val w = Window.partitionBy("node").orderBy(col("nc"))
      lab.join(e, lab("node") === e("src"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("node"), col("nc"))
    }
    loop("multi-ref") { lab =>
      val a = lab.select(col("node").as("dst"), col("nc").as("c2"))
      val j = e.join(broadcast(a), Seq("dst")).groupBy("src").agg(min(col("c2")).as("mc"))
      lab.join(j, lab("node") === j("src"), "left")
        .select(col("node"), coalesce(col("mc"), col("nc")).as("nc"))
    }
    // the exact graph_louvain_sweep round shape — with the stats-carry
    // broken: LogicalRDD copies the optimized plan's stats snapshot
    // through localCheckpoint, so loop-carried sizeInBytes compounds
    // multiplicatively; re-wrapping the checkpointed RDD in a fresh
    // DataFrame resets stats to the default
    def fresh(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val ck = df.localCheckpoint(true)
      spark.createDataFrame(ck.rdd, ck.schema)
    }
    def loop2(name: String)(step: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      var lab = fresh(e.select(col("src").as("node")).distinct()
        .withColumn("nc", col("node") % 7))
      for (r <- 0 until 16) {
        val t0 = System.nanoTime()
        lab = fresh(step(lab))
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$name round $r: $dt%.2f s")
      }
    }
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("d")).localCheckpoint(true)
    loop2("full-round-fresh") { lab =>
      val dct = lab.join(deg, Seq("node"), "left")
        .groupBy(col("nc").as("c"))
        .agg(sum(coalesce(col("d"), lit(0L))).as("dc"))
      val euc = e
        .join(broadcast(lab.select(col("node").as("dst"),
          col("nc").as("c"))), Seq("dst"))
        .groupBy(col("src").as("node"), col("c"))
        .agg(count(lit(1)).as("e_uc"))
      val cand = euc.unionByName(
          deg.join(broadcast(lab), Seq("node"))
            .select(col("node"), col("nc").as("c"), lit(0L).as("e_uc")))
        .groupBy("node", "c").agg(sum(col("e_uc")).as("e_uc"))
      val w = Window.partitionBy("node")
        .orderBy(col("score").desc, col("c").asc)
      val winner = cand
        .join(broadcast(lab), Seq("node"))
        .join(broadcast(dct), Seq("c"))
        .join(deg, Seq("node"))
        .crossJoin(broadcast(tot))
        .withColumn("score", col("t") * col("e_uc") -
          col("d") * (col("dc") -
            when(col("c") === col("nc"), col("d")).otherwise(0L)))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("node") % 2 === 0 &&
          pmod(expr("node div 2"), lit(8)) === 0)
        .select(col("node"), col("c").as("nc0"))
      lab.join(winner, Seq("node"), "left")
        .select(col("node"), coalesce(col("nc0"), col("nc")).as("nc"))
    }
    println("done")
    spark.stop()
  }
}
