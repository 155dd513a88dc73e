package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement harness (test scope, not part of the library):
  * prints the facts the verdict-oracle designs depend on. Run with
  *   sbt "Test/runMain graft.DevProbe"
  */
object DevProbe {
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

    // 1. SRP hyperplane sign constants: parity of xxhash64(j*4099 + i)
    //    for the 8-plane and 6-plane quantizers (i = component 0..63).
    val idx = spark.range(64).select(col("id").cast("int").as("i"))
    for (planes <- Seq(8, 6, 4)) {
      val signs = (0 until planes).map { j =>
        (pmod(xxhash64(lit(j) * 4099 + col("i")), lit(2)) === 0)
          .cast("int").as(s"s$j")
      }
      val rows = idx.select(col("i") +: signs: _*).orderBy("i").collect()
      val mat = (0 until planes).map { j =>
        rows.map(r => if (r.getInt(j + 1) == 1) "1" else "-1").mkString(",")
      }
      println(s"== SIGNS planes=$planes (row j = plane, 64 comps, +1/-1) ==")
      mat.zipWithIndex.foreach { case (s, j) => println(s"plane$j:[$s]") }
    }

    // 2. dedup_near pairs
    val dn = graft.queries.NearDup
      .nearDupPairs(graft.engine.Tables.documents(spark, sf), 0.5)
      .orderBy("id1", "id2").collect()
    println(s"== DEDUP_NEAR n=${dn.length} ==")
    dn.foreach(r => println(s"${r.get(0)},${r.get(1)},${r.get(2)}"))

    // 3. simhash pairs
    val shp = graft.queries.SimHash
      .nearPairs(graft.engine.Tables.documents(spark, sf), 3)
      .orderBy("id1", "id2").collect()
    println(s"== SIMHASH n=${shp.length} ==")
    shp.foreach(r => println(s"${r.get(0)},${r.get(1)},${r.get(2)}"))

    // 4. ann_ivf declared output (new fixed query set)
    val ivf = graft.queries.AnnIvf
      .topkInBucket(graft.queries.AnnIvf.bucketed(spark, sf, planes = 6), 3,
        multiProbe = true)
      .orderBy("query_id", "rank").collect()
    println(s"== ANN_IVF n=${ivf.length} distinctQ=${ivf.map(_.get(0)).distinct.length} ==")
    ivf.take(20).foreach(r =>
      println(s"${r.get(0)},${r.get(1)},${r.get(2)},${r.get(3)},${r.get(4)}"))

    // 5. emb_near_dup declared output
    val emb = graft.queries.AnnIvf
      .cosineNearDup(graft.queries.AnnIvf.bucketed(spark, sf, planes = 4), 0.25)
      .orderBy("id1", "id2").collect()
    println(s"== EMB_NEAR_DUP n=${emb.length} ==")
    emb.take(10).foreach(r => println(s"${r.get(0)},${r.get(1)},${r.get(2)}"))

    // 6. sampling facts
    val li = graft.engine.Tables.lineitem(spark, sf)
    val nTotal = li.count()
    val s1 = li.sample(withReplacement = false, fraction = 0.1, seed = 42L)
      .select("l_orderkey", "l_linenumber")
    val s2 = li.sample(withReplacement = false, fraction = 0.1, seed = 42L)
      .select("l_orderkey", "l_linenumber")
    val nS = s1.count()
    val symDiff = s1.exceptAll(s2).count() + s2.exceptAll(s1).count()
    println(s"== SAMPLE_FRACTION total=$nTotal sampled=$nS rate=${nS.toDouble / nTotal} symDiff=$symDiff ==")

    val docs = graft.engine.Tables.documents(spark, sf)
    val st = docs.stat.sampleBy("lang",
      Map("en" -> 0.5, "fr" -> 0.5, "de" -> 0.2, "es" -> 0.2, "zh" -> 0.2), 42L)
    val obs = st.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println("== SAMPLE_STRATIFIED lang,total,sampled,rate ==")
    tot.toSeq.sortBy(_._1).foreach { case (l, n) =>
      val s = obs.getOrElse(l, 0L)
      println(s"$l,$n,$s,${s.toDouble / n}")
    }
    // k-means probe-1 recall + cell sizes (ann_kmeans verdict design)
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      import graft.queries.AnnKmeans
      val vecs = AnnKmeans.quantized(spark, d)
      val cents = AnnKmeans.train(vecs)
      val asg = AnnKmeans.assign(vecs, cents)
      val sizes = asg.groupBy("cid").count().orderBy("cid").collect()
        .map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" ")
      val queries = vecs.filter(col("vec_id") < 100)
      val ivf = AnnKmeans.topkInCell(vecs, cents, queries, AnnKmeans.TopK, nprobe = 3)
      val exact = AnnKmeans.topkExact(vecs, queries, AnnKmeans.TopK)
      val hits = exact.join(ivf, Seq("query_id", "vec_id"), "left_semi").count()
      println(s"== KMEANS $d cells=[$sizes] hits=$hits/300 ==")
    }
    spark.stop()
  }
}
