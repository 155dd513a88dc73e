package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{QueryDef, QueryGroup, Tables}

/** Near-duplicate detection via banded MinHash-LSH — SURVEY.md §2.1
  * #58, the LLM-corpus dedup north star.
  *
  * Pipeline (all distributed, no all-pairs step):
  *   1. word 3-gram shingle set per doc (unigram sets degenerate on a
  *      small vocabulary — every doc covers most of it — while 3-gram
  *      shingles isolate true sequence-level near-duplicates);
  *   2. K=64 MinHash values per doc via a derandomized universal hash
  *      family h_i(t) = (a_i·x + b_i) mod P over x = xxhash64(t) mod P
  *      — computed with array HOFs per row, no shuffle;
  *   3. banding: B=32 bands of R=2 rows; band key = hash(band index,
  *      minhash pair). P(candidate | jaccard s) = 1 − (1 − s²)³²:
  *      ≈ 0.9999 at s=0.5, ≈ 0.27 at s=0.1 — tuned for τ=0.5;
  *   4. equi-self-join on band key → candidate pairs (distinct);
  *   5. exact Jaccard verify within candidates, keep ≥ τ.
  *
  * No DuckDB oracle: xxhash64 is not reproducible there; correctness is
  * covered by NearDupSpec (planted near-dups, recall vs the exact
  * `ngram_jaccard` ground truth) per SURVEY §2.0 oracle=✗ policy.
  */
object NearDup extends QueryGroup {

  val P: Long = 1000000007L
  val NumHashes = 64
  val Rows = 2 // minhashes per band
  val Bands: Int = NumHashes / Rows

  /** Derandomized affine family: a_i odd, b_i pseudo-random, fixed. */
  def coefA(i: Int): Long = 2L * i + 1
  def coefB(i: Int): Long = (104729L * i + 12345L) % P

  /** MinHash signature as an array column (length NumHashes). */
  def signature(toks: Column): Column = {
    val base = transform(toks, t => pmod(xxhash64(t), lit(P)))
    array((0 until NumHashes).map { i =>
      array_min(transform(base,
        x => pmod(lit(coefA(i)) * x + lit(coefB(i)), lit(P))))
    }: _*)
  }

  /** Distinct word 3-gram shingles of a token array column. */
  def shingles(tk: Column): Column = {
    val grams = transform(sequence(lit(1), size(tk) - 2),
      i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1),
        element_at(tk, i + 2)))
    when(size(tk) >= 3, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** Candidate near-duplicate pairs with verified Jaccard ≥ tau. */
  def nearDupPairs(docs: DataFrame, tau: Double): DataFrame = {
    val toks = docs
      .select(col("doc_id"), shingles(split(col("text"), " ")).as("toks"))
      .filter(size(col("toks")) > 0)
    val sig = toks.withColumn("sig", signature(col("toks")))
    // band keys: hash(band index, the R minhashes of the band)
    val banded = sig.select(
      col("doc_id"),
      explode(array((0 until Bands).map { j =>
        xxhash64(lit(j), col("sig")(j * Rows), col("sig")(j * Rows + 1))
      }: _*)).as("band_key"))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band_key") === col("y.band_key")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
    cand
      .join(toks.select(col("doc_id").as("id1"), col("toks").as("t1")), "id1")
      .join(toks.select(col("doc_id").as("id2"), col("toks").as("t2")), "id2")
      .withColumn("jac", round(
        size(array_intersect(col("t1"), col("t2"))).cast("double") /
          size(array_union(col("t1"), col("t2"))).cast("double"), 4))
      .filter(col("jac") >= tau)
      .select("id1", "id2", "jac")
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "dedup_near",
      (spark, sf) =>
        nearDupPairs(Tables.documents(spark, sf), 0.5).orderBy("id1", "id2"),
      None,
      scaleNote = "Banded LSH replaces the O(n²) pair space with per-band equi-joins on computed keys — the only join is shuffle-on-band_key, and the quadratic blowup is confined to same-bucket collisions (expected ≈ s²·pairs per band). At 100 TB: raise R to sharpen the threshold, salt oversized buckets (cap bucket size, re-split), and run exact verify only on the surviving ~0.01% of pairs. Never dropDuplicates on raw text; never cross join."))
}
