package graft

import org.apache.spark.sql.functions._
import graft.engine.Registry
import graft.queries.SpanOps

/** Semantic invariants for the span-granular corpus-hygiene operators,
  * on planted fixtures the driver tables cannot guarantee: exact
  * keep-first semantics under a known duplication pattern, boilerplate
  * removal of a planted template, and span-construction exactness. */
class SpanOpsSpec extends SparkSpec {

  import spark.implicits._

  test("spansArr: disjoint W-token windows reassemble the document") {
    val docs = Seq(
      (1L, (1 to 30).map(i => s"w$i").mkString(" ")), // 30 toks → 3 spans of 12,12,6
      (2L, "a"),                                      // 1 tok → 1 span
      (3L, (1 to 24).map(_ => "x").mkString(" "))     // exact multiple
    ).toDF("doc_id", "text")
    val sp = docs.select(col("doc_id"),
      SpanOps.spansArr(col("text"), 12).as("spans"),
      col("text"))
    val rows = sp.collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val spans = r.getSeq[String](1)
      // rejoining the spans yields the original text (no token lost,
      // no overlap — the property dedup reassembly depends on)
      assert(spans.mkString(" ") == r.getString(2))
      // every span but the last is exactly W tokens
      spans.dropRight(1).foreach(s => assert(s.split(" ").length == 12))
    }
  }

  test("dedup_spans keeps exactly the corpus-first occurrence") {
    val block = (1 to 12).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (10L, block + " " + (1 to 12).map(i => s"a$i").mkString(" ")),
      (20L, block + " " + (1 to 12).map(i => s"b$i").mkString(" ")),
      // same block TWICE within one doc: second in-doc copy also dups
      (30L, block + " " + block)
    ).toDF("doc_id", "text")
    val w = 12
    val sp = SpanOps.spanRows(docs, w)
      .withColumn("pos", col("doc_id") * 1048576L + col("span_no"))
    val owner = org.apache.spark.sql.expressions.Window.partitionBy("span")
    val out = sp
      .withColumn("kept", col("pos") === min(col("pos")).over(owner))
      .groupBy("doc_id")
      .agg(sum(when(col("kept"), 0L).otherwise(1L)).as("n_dup"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) == 0L) // doc 10 owns the block
    assert(out(20L) == 1L) // its block copy is a dup
    assert(out(30L) == 2L) // both in-doc copies dup doc 10's
  }

  test("declared dedup_spans + text_boilerplate: conservation on driver data") {
    val dd = Registry.byName("dedup_spans").build(spark, sf).cache()
    val bp = Registry.byName("text_boilerplate").build(spark, sf).cache()
    try {
      // every doc appears exactly once in both outputs
      val n = graft.engine.Tables.documents(spark, sf).count()
      assert(dd.count() == n && bp.count() == n)
      // ratios in [0,1]; dup/bp counts never exceed span counts
      assert(dd.filter(col("n_dup") > col("n_spans") ||
        col("dup_ratio") < 0 || col("dup_ratio") > 1).count() == 0)
      assert(bp.filter(col("n_bp") > col("n_spans") ||
        col("bp_ratio") < 0 || col("bp_ratio") > 1).count() == 0)
      // dedup keeps at least one occurrence of every span corpus-wide:
      // total kept = distinct spans
      val sp = SpanOps.spanRows(
        graft.engine.Tables.documents(spark, sf), 12)
      val distinctSpans = sp.select("span").distinct().count()
      val kept = dd.agg(sum(col("n_spans") - col("n_dup"))).head.getLong(0)
      assert(kept == distinctSpans,
        s"kept $kept != distinct $distinctSpans")
      // boilerplate drops ALL occurrences of df>=3 spans — total
      // dropped equals the directly recomputed truth
      val spW6 = SpanOps.spanRows(
        graft.engine.Tables.documents(spark, sf), 6)
      val bpTruth = spW6.groupBy("span")
        .agg(countDistinct("doc_id").as("d"))
      val occDropped = spW6.join(bpTruth.filter(col("d") >= 3), "span").count()
      val dropped = bp.agg(sum("n_bp")).head.getLong(0)
      assert(dropped == occDropped, s"dropped $dropped != truth $occDropped")
    } finally { dd.unpersist(); bp.unpersist() }
  }

  test("text_boilerplate removes a planted cross-doc template") {
    val tmpl = (1 to 6).map(i => s"nav$i").mkString(" ")
    val docs = (1L to 5L).map(i =>
      (i, tmpl + " " + (1 to 6).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val sp = SpanOps.spanRows(docs, 6)
    val byDf = sp.groupBy("span").agg(countDistinct("doc_id").as("d"))
    val bpSpans = byDf.filter(col("d") >= 3).collect().map(_.getString(0))
    assert(bpSpans.toSeq == Seq(tmpl)) // exactly the template flagged
  }

  test("corpus_epochs: upsampling is capped and uniform-targeted") {
    val out = Registry.byName("corpus_epochs").build(spark, sf).cache()
    try {
      assert(out.filter(col("epochs") < 1 || col("epochs") > 4).count() == 0)
      // per (doc), rows = epochs, numbered 1..epochs
      val bad = out.groupBy("doc_id", "epochs")
        .agg(count(lit(1)).as("k"), min("epoch").as("lo"), max("epoch").as("hi"))
        .filter(col("k") =!= col("epochs") ||
          col("lo") =!= 1 || col("hi") =!= col("epochs"))
      assert(bad.count() == 0)
      // the max-count language is never repeated
      val ln = graft.engine.Tables.documents(spark, sf)
        .groupBy("lang").agg(count(lit(1)).as("n"))
      val maxLang = ln.orderBy(col("n").desc).head.getString(0)
      assert(out.filter(col("lang") === maxLang && col("epochs") =!= 1)
        .count() == 0)
    } finally out.unpersist()
  }

  test("shuffle_shards: a permutation, reproducible, shard-dense") {
    val a = Registry.byName("shuffle_shards").build(spark, sf)
    val b = Registry.byName("shuffle_shards").build(spark, sf)
    // byte-identical across runs (the reproducibility contract)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val docs = graft.engine.Tables.documents(spark, sf).count()
    assert(a.count() == docs)
    // within each shard, positions are exactly 1..|shard|
    val bad = a.groupBy("shard")
      .agg(count(lit(1)).as("k"), min("pos").as("lo"), max("pos").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("k"))
    assert(bad.count() == 0)
  }
}
