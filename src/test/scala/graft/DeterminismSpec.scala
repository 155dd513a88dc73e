package graft

import graft.engine.Registry

/** Layout-independence proof for the declared surface: the engine's
  * cross-engine determinism rules (decimal sums, integer-quantized
  * floats, total ORDER BY) claim the OUTPUT is a pure function of the
  * data — not of partitioning, parallelism, or adaptive replanning.
  * This spec executes representative queries under different shuffle
  * layouts and with AQE disabled and asserts bit-identical rows — the
  * property that makes results reproducible when the same job moves
  * from local[4] to a 1000-executor cluster. */
class DeterminismSpec extends SparkSpec {

  // float-emitting, verdict-emitting, window-heavy, and
  // prefix-sum-sharded operators — the ones where partition layout
  // could plausibly leak into values
  private val names = Seq(
    "agg_stats", "vec_cosine_pairs", "tfidf_keywords", "ts_anomaly",
    "agg_cms_sketch", "pack_sequences", "merge_scd2", "corpus_mix",
    "dedup_near", "peak_concurrency", "join_lateral", "emb_quantize",
    // r7: exact-moment float composes (summation order must not leak),
    // collect_list-ordered paths, PMI logs over count broadcasts
    "agg_corr", "agg_skew_kurtosis", "agg_percentile_cont",
    "path_patterns", "text_collocations", "interval_coverage",
    // r9: the HOF recursion (fold order must come from array_sort,
    // never partition order), the ECDF-staged curriculum (value-
    // grouped boundaries are the whole reproducibility claim), RRF's
    // rank composition, the six-moment float compose, and the write-
    // path round trip (range-partitioner sampling must not leak into
    // the gated aggregate)
    "ts_holt_linear", "corpus_curriculum", "rank_fusion_rrf",
    "graph_assortativity", "sink_layout_hilbert")

  private def rows(s: org.apache.spark.sql.SparkSession, name: String) =
    Registry.byName(name).build(s, sf).collect().map(_.toSeq).toSeq

  test("declared results are bit-identical across shuffle-partition layouts") {
    val other = spark.newSession()
    other.conf.set("spark.sql.shuffle.partitions", "7")
    for (n <- names) {
      val a = rows(spark, n)
      val b = rows(other, n)
      assert(a == b, s"$n differs between shuffle layouts 4 and 7")
    }
  }

  test("declared results are bit-identical with AQE disabled") {
    val noAqe = spark.newSession()
    noAqe.conf.set("spark.sql.adaptive.enabled", "false")
    for (n <- names) {
      val a = rows(spark, n)
      val b = rows(noAqe, n)
      assert(a == b, s"$n differs with AQE off")
    }
  }
}
