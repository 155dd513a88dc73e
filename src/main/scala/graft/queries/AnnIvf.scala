package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{QueryDef, QueryGroup, Tables}
import graft.plans.LongArrayDot

/** Bucketed approximate nearest neighbour — the IVF/LSH scale path
  * whose exact-recall baseline is `ann_topk` (north star: similarity
  * search at 100 TB).
  *
  * Coarse quantizer: 8 sign-random-projection bits. Hyperplane j has
  * ±1 components s_ji derived from the parity of xxhash64(j·4099 + i)
  * — fully derandomized, so the bucket id of a vector is a pure
  * function of its values and reproducible across runs/engines.
  * bucket(v) = Σ_j [⟨s_j, v⟩ > 0] · 2^j   (256 buckets).
  *
  * Query pipeline: bucket every vector (one explode + 8 conditional
  * sums, all codegen), equi-join queries to candidates on bucket id,
  * exact quantized cosine (LongArrayDot) + top-k within the bucket.
  * Identical vectors always share a bucket → exact duplicates have
  * recall 1 by construction (tested); recall for merely-near vectors
  * is the standard probe-count dial (search 2^p neighbouring buckets
  * by flipping low-margin bits at 100 TB).
  *
  * No DuckDB oracle (xxhash64-derived hyperplanes); AnnIvfSpec covers
  * bucket determinism, in-bucket containment, and planted-dup recall.
  */
object AnnIvf extends QueryGroup {

  val Planes = 8

  /** (vec_id, qv, norm2, bucket) for every embedding. `planes` is the
    * recall/selectivity dial: 8 → 256 buckets (tight, for top-k), 4 →
    * 16 buckets (coarse, for near-dup pair mining). */
  def bucketed(spark: SparkSession, sfDir: String,
      planes: Int = Planes): DataFrame = {
    val q = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), graft.engine.Vec.quantize(col("embedding")).as("qv"))
      .withColumn("norm2", graft.engine.Vec.norm2(col("qv")))
    val comps = q.select(col("vec_id"), posexplode(col("qv")).as(Seq("i", "v")))
    val sums = (0 until planes).map { j =>
      // s_ji = ±1 from hash parity — deterministic pseudo-hyperplane
      sum(when(pmod(xxhash64(lit(j) * 4099 + col("i")), lit(2)) === 0,
        col("v")).otherwise(-col("v"))).as(s"p$j")
    }
    val buckets = comps.groupBy("vec_id").agg(sums.head, sums.tail: _*)
      .select(col("vec_id"),
        (0 until planes).map(j => (col(s"p$j") > 0).cast("int") * lit(1 << j))
          .reduce(_ + _).as("bucket"),
        // the least-confident hyperplane: smallest |projection| — the
        // bit most likely to differ for a true near neighbour
        (1 until planes).foldLeft(struct(abs(col("p0")).as("m"), lit(0).as("j"))) {
          (acc, j) => {
            val cand = struct(abs(col(s"p$j")).as("m"), lit(j).as("j"))
            when(cand.getField("m") < acc.getField("m"), cand).otherwise(acc)
          }
        }.getField("j").as("weak_plane"))
    q.join(buckets, "vec_id")
  }

  /** Multi-probe query-side bucket set: the home bucket plus the bucket
    * across the weakest hyperplane (bucket XOR 2^weak_plane). Doubles
    * candidate work for a measured recall gain — the standard IVF
    * probe dial, here with the margin-guided probe choice. */
  def probeBuckets(queries: DataFrame): DataFrame =
    queries.withColumn("probe", explode(array(
      col("bucket"),
      col("bucket").bitwiseXOR(expr("shiftleft(1, weak_plane)")))))

  /** Embedding-cosine near-duplicate pairs: same coarse bucket, exact
    * quantized cosine ≥ tau — completes the dedup family (exact,
    * MinHash, SimHash, n-gram Jaccard, embedding-cosine). */
  def cosineNearDup(b: DataFrame, tau: Double): DataFrame = {
    val a = b.select(col("vec_id").as("id1"), col("qv").as("q1"),
      col("norm2").as("na"), col("bucket"))
    val c = b.select(col("vec_id").as("id2"), col("qv").as("q2"),
      col("norm2").as("nb"), col("bucket").as("bucket2"))
    a.join(c, col("bucket") === col("bucket2") && col("id1") < col("id2"))
      .withColumn("cos", graft.engine.Vec.cosine(
        LongArrayDot.dot(col("q1"), col("q2")), col("na"), col("nb")))
      .filter(col("cos") >= tau)
      .select("id1", "id2", "cos")
  }

  /** Top-k within the query's bucket(s) by exact quantized cosine.
    * With multiProbe, each query also searches the bucket across its
    * weakest hyperplane. */
  def topkInBucket(b: DataFrame, k: Int, multiProbe: Boolean = false): DataFrame = {
    // % 10 ≈ 50 query vectors at sf0.01 (500 vecs) — dense enough
    // that the driver's row check is discriminating (r2 had 1 row)
    val baseQueries = b.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("qv").as("qq"),
        col("norm2").as("qn"), col("bucket"), col("weak_plane"))
    val queries =
      if (multiProbe) probeBuckets(baseQueries)
        .select(col("query_id"), col("qq"), col("qn"), col("probe").as("qbucket"))
      else baseQueries
        .select(col("query_id"), col("qq"), col("qn"), col("bucket").as("qbucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(queries)
      .join(b, col("qbucket") === col("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("dot", LongArrayDot.dot(col("qq"), col("qv")))
      .withColumn("cos", graft.engine.Vec.cosine(col("dot"), col("qn"), col("norm2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "bucket", "rank", "vec_id", "cos")
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ann_ivf",
      (spark, sf) =>
        // 6 planes (64 buckets) + multi-probe for the DECLARED query:
        // at the 500–2000-vector test scale, 256 buckets hold ~2
        // vectors each and nearly every top-k comes back empty (r2:
        // 1 row) — 64 buckets keep ~8 candidates per query so the
        // driver's row check is discriminating, and the probe path is
        // exercised under the driver, not only in AnnIvfSpec. At
        // corpus scale, dial planes up so |bucket| ≈ corpus/2^planes
        // stays near the per-query budget.
        topkInBucket(bucketed(spark, sf, planes = 6), 3, multiProbe = true)
          .orderBy("query_id", "rank"),
      None,
      scaleNote = "The candidate join is equi on bucket id, so each query scores |corpus|/2^planes vectors instead of |corpus| — at 100 TB, partition the corpus BY bucket at write time and a query touches one partition (planes is the bucket-size dial: pick 2^planes ≈ corpus/target-candidates). Recall is tuned by multi-probe — implemented: probeBuckets adds the bucket across the query's weakest (smallest-margin) hyperplane, doubling candidates for measured recall gain (AnnIvfSpec) — rather than widening buckets; ann_topk is the exact baseline this trades against."),

    QueryDef(
      "emb_near_dup",
      (spark, sf) =>
        cosineNearDup(bucketed(spark, sf, planes = 4), 0.25)
          .orderBy("id1", "id2"),
      None,
      scaleNote = "Near-dup mining uses the coarse 4-plane bucketing (16 buckets): candidate pairs are same-bucket only, so the pair space is Σ|bucket|²/2 ≈ |corpus|²/32 instead of |corpus|²/2, and truly-similar vectors co-bucket with high probability ((1−θ/π)⁴). At 100 TB add band-style multi-probe or a second independent plane set for recall; exact duplicates always share every bucket."))
}
