package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.{GraftExtensions, SkewJoin}

class ExtensionsSpec extends SparkSpec {

  test("long_array_dot is callable from SQL after install") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(r == 32L)
    val ic = spark.sql(
      "SELECT sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS c")
      .head().getInt(0)
    assert(ic == 2)
    val qv = spark.sql(
      "SELECT quantize_vec(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT))) AS q")
      .head().getSeq[Long](0)
    assert(qv == Seq(524288L, -524288L))
    // hilbert_index: (0,0) is curve start; (255,0) is curve end on
    // the 256x256 grid (the standard U orientation)
    val h0 = spark.sql("SELECT hilbert_index(0L, 0L) AS h").head().getLong(0)
    val h1 = spark.sql("SELECT hilbert_index(255L, 0L) AS h").head().getLong(0)
    assert(h0 == 0L && h1 == 65535L, s"hilbert endpoints wrong: $h0, $h1")
    GraftExtensions.install(spark) // idempotent
  }

  test("salted join returns exactly the plain-join result under heavy skew") {
    val s = spark
    import s.implicits._
    // 10k rows all on ONE hot key + a tail
    val big = ((1 to 10000).map(i => (1L, i)) ++ (1 to 100).map(i => (2L, i)))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "cold"), (3L, "unused")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = SkewJoin.salted(big, small, "k", 8)
    assert(salted.count() == plain.count())
    val a = salted.groupBy("k", "name").count().orderBy("k")
      .collect().map(_.toSeq).toSeq
    val b = plain.groupBy("k", "name").count().orderBy("k")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    // the hot key's rows actually spread across multiple salt buckets
    val spread = big.withColumn("_salt",
      pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8L)).cast("int"))
      .filter(col("k") === 1).select("_salt").distinct().count()
    assert(spread > 4, s"salt did not spread the hot key (got $spread buckets)")
  }

  test("AQE splits the skewed partition of a shuffle join at runtime") {
    // the OTHER half of the skew story: SkewJoin.salted is the
    // deterministic plan-time fix; AQE's OptimizeSkewedJoin is the
    // runtime fix the scale notes lean on — prove it actually fires
    val sp = spark.newSession()
    org.apache.spark.sql.SparkSession.setActiveSession(sp)
    try {
      sp.conf.set("spark.sql.adaptive.enabled", "true")
      sp.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-scale thresholds: the hot partition (~50k rows) is "skewed"
      // relative to an 8KB advisory target
      sp.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      sp.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      sp.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import sp.implicits._
      val left = sp.range(0, 50000).select(lit(0L).as("k"), col("id").as("v"))
        .union(sp.range(1, 200).select(col("id").as("k"), col("id").as("v")))
      val right = sp.range(0, 200).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right, "k")
      // collect() (not count()) so THIS dataset's queryExecution runs —
      // count() builds a separate aggregate execution and would leave
      // j's adaptive plan unexecuted (isFinalPlan=false)
      assert(j.collect().length == 50000 + 199)
      // after execution the adaptive plan is final; the skewed SMJ
      // partition must have been split (skew=true marker)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n${plan.take(1200)}")
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }

  test("runtime bloom filter prunes the fact scan behind a selective dim filter") {
    // the runtime-pruning story SCALE.md's join notes lean on: with a
    // selective filter on the small side of a shuffle join, Catalyst
    // injects a bloom filter built from the filtered keys as a
    // might_contain predicate on the FACT side — at 100 TB that skips
    // most fact rows before the shuffle. Prove the injection fires.
    val sp = spark.newSession()
    org.apache.spark.sql.SparkSession.setActiveSession(sp)
    try {
      sp.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // test-scale thresholds: sf0.001 scans are KB-sized
      sp.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = sp.read.parquet(s"$sf/lineitem.parquet")
      val part = sp.read.parquet(s"$sf/part.parquet")
        .filter(col("p_size") === 1) // selective: ~2% of parts
      val j = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy("p_size").count()
      assert(j.collect().nonEmpty)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter not injected:\n${plan.take(1500)}")
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }

  test("dynamic partition pruning skips fact partitions behind a dim filter") {
    // the partition-layout lever SURVEY §4 lists for the 100 TB path:
    // with the fact table PARTITIONED on the join key's function and a
    // selective filter on the dim side, Catalyst injects the dim's key
    // set as a runtime partition filter on the fact scan — whole
    // directories are never read. Prove the injection fires and that
    // it actually prunes.
    val dir = Files.createTempDirectory("dpp").toString
    val sp = spark.newSession()
    org.apache.spark.sql.SparkSession.setActiveSession(sp)
    try {
      sp.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
      // force the non-broadcast path so DPP (not broadcast reuse) is
      // what prunes; lower the fallback filter ratio guard for KB data
      sp.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      sp.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10.0")
      val orders = sp.read.parquet(s"$sf/orders.parquet")
        .withColumn("o_year", year(col("o_orderdate")))
      orders.write.partitionBy("o_year").parquet(s"$dir/orders_part")
      val fact = sp.read.parquet(s"$dir/orders_part")
      // dim filtered on a NON-key column: the fact side cannot infer
      // `o_year = 1995` statically (a filter on the join key itself
      // would constant-propagate through the join and prune the scan
      // without DPP — the first version of this test proved that), so
      // only the runtime subquery can skip partitions
      import sp.implicits._
      Seq((1995, "pick"), (1996, "skip"), (1997, "skip"),
        (1998, "skip"), (1999, "skip"), (2000, "skip"), (2001, "skip"))
        .toDF("d_year", "d_flag").write.parquet(s"$dir/dim_year")
      // a real scan + Filter (a local Seq would constant-fold into a
      // pre-filtered LocalRelation and DPP sees no selective predicate)
      val dim = sp.read.parquet(s"$dir/dim_year")
        .filter(col("d_flag") === "pick")
      val j = fact.join(dim, col("o_year") === col("d_year"))
        .groupBy("d_year").agg(count(lit(1)).as("n"))
      val rows = j.collect()
      assert(rows.length == 1 && rows(0).getLong(1) > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"no dynamic pruning subquery on the fact scan:\n${plan.take(1500)}")
      // and the pruned count matches a static single-partition read
      val direct = sp.read.parquet(s"$dir/orders_part")
        .filter(col("o_year") === 1995).count()
      assert(rows(0).getLong(1) == direct)
    } finally org.apache.spark.sql.SparkSession.setActiveSession(spark)
  }

  test("streaming file-source replay: parquet slices through readStream match batch") {
    val dir = Files.createTempDirectory("replay").toString
    val ev = graft.engine.Tables.loadEvents(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    // two "polling cycle" slices appended to a watched directory
    ev.filter(col("event_id") < 500).write.parquet(s"$dir/slice=0")
    ev.filter(col("event_id") >= 500).write.parquet(s"$dir/slice=1")
    val stream = spark.readStream
      .schema(ev.schema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(s"$dir/slice=*")
    val q = graft.streaming.Streams.tumbling(stream)
      .writeStream.format("memory").queryName("replay_tumb")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // update-mode memory sink appends one row per UPDATED window per
      // micro-batch — take the latest (max) count per bucket, never sum
      // (summing double-counts windows updated across batches)
      val streamed = spark.table("replay_tumb")
        .groupBy("bucket").agg(max("n_events").as("n"))
        .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      val batch = ev.groupBy(date_trunc("hour", col("ts")).as("b"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      assert(streamed == batch, s"parity broken: stream=$streamed batch=$batch")
    } finally q.stop()
  }
}
