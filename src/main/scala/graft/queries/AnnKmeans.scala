package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{QueryDef, QueryGroup, Tables, Vec}
import graft.plans.LongArrayDot

/** IVF with LEARNED centroids — Lloyd's k-means over the quantized
  * embedding corpus, run entirely in EXACT integer arithmetic so that
  * every assignment, centroid, and WCSS value is a pure function of
  * the data (no float-summation order, no RNG):
  *
  *   - vectors are the shared 2^20 quantization ([[Vec.quantize]]);
  *   - distances compare as BIGINTs: ‖x−c‖² = ‖x‖² − 2⟨x,c⟩ + ‖c‖²
  *     with the dot product on the codegen'd [[LongArrayDot]];
  *   - centroid updates are integer division of exact per-component
  *     sums (`sum div count` — truncation toward zero) — associative
  *     partials, deterministic on any partition layout;
  *   - seeding is the first K vectors (vec_id 0..K−1), argmin ties
  *     break to the lowest centroid id.
  *
  * This complements [[AnnIvf]]'s derandomized SRP quantizer: SRP
  * buckets are data-independent (no training pass, stable under
  * corpus growth), k-means cells adapt to the data distribution
  * (tighter candidate lists for clustered corpora — the testdata
  * embeddings cluster by `label`). Both feed the same exact
  * quantized-cosine top-k; ann_topk stays the exact-recall baseline.
  *
  * Declared as the usual sketch-style verdict row (SURVEY §2.0): the
  * k-means internals are not DuckDB-expressible, so the query emits
  * the exact corpus count the oracle recomputes plus invariant
  * booleans — WCSS non-increasing over the Lloyd iterations,
  * assignment determinism (exact arithmetic makes a re-evaluation
  * bit-identical), every cluster non-empty, and multi-probe recall
  * vs the brute-force exact top-k above a floor — all TRUE for a
  * correct implementation on ANY partition layout.
  */
object AnnKmeans extends QueryGroup {

  val K = 8
  val Iters = 2
  val TopK = 3

  /** (vec_id, qv, norm2) for the whole corpus. */
  def quantized(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Vec.quantize(col("embedding")).as("qv"))
      .withColumn("norm2", Vec.norm2(col("qv")))

  /** Seed centroids: the first K vectors, ids 0..K−1. */
  def seed(vecs: DataFrame): DataFrame =
    vecs.filter(col("vec_id") < K)
      .select(col("vec_id").cast("int").as("cid"), col("qv").as("cv"),
        col("norm2").as("cnorm2"))

  /** Assign every vector to its nearest centroid (exact integer
    * distance, ties to the lowest cid). The centroid side is K rows —
    * a bounded broadcast nested loop BY DESIGN (like ann_topk's query
    * set), never a growing side. Emits (vec_id, cid, dist). */
  def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .withColumn("dist",
        col("norm2") - lit(2L) * LongArrayDot.dot(col("qv"), col("cv")) +
          col("cnorm2"))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cid"))).as("b"))
      .select(col("vec_id"), col("b.cid").as("cid"), col("b.dist").as("dist"))

  /** Lloyd update: per-(cluster, component) exact integer mean
    * (`sum div count`, truncating toward zero), rebuilt into centroid
    * arrays. The aggregate output is K×dims rows — constant-size
    * regardless of corpus. NOTE: integer-rounded centroids mean the
    * textbook Lloyd monotonicity is not a theorem here (the rounded
    * centroid can sit farther from the true mean than its
    * predecessor); the wcss_improved verdict and the spec's per-step
    * assertions are MEASURED properties of this corpus, with a wide
    * margin (seed WCSS is far from converged). */
  def update(vecs: DataFrame, asg: DataFrame): DataFrame =
    vecs.join(asg.select("vec_id", "cid"), "vec_id")
      .select(col("cid"), posexplode(col("qv")).as(Seq("i", "v")))
      .groupBy("cid", "i")
      .agg(expr("sum(v) div count(*)").as("cv_i"))
      .groupBy("cid")
      .agg(array_sort(collect_list(struct(col("i"), col("cv_i")))).as("l"))
      .select(col("cid"),
        transform(col("l"), x => x.getField("cv_i")).as("cv"))
      .withColumn("cnorm2", Vec.norm2(col("cv")))

  /** Run `iters` Lloyd rounds from the deterministic seed; returns the
    * final centroids. */
  def train(vecs: DataFrame, iters: Int = Iters): DataFrame =
    (1 to iters).foldLeft(seed(vecs)) { (cents, _) =>
      update(vecs, assign(vecs, cents))
    }

  /** Multi-probe IVF top-k: each query searches its `nprobe` nearest
    * cells (the standard IVF recall dial — probe-1 on a near-uniform
    * corpus loses neighbours across cell boundaries; probing the
    * next-nearest centroid recovers most of them for 2× candidate
    * work, still |corpus|·nprobe/K per query). */
  def topkInCell(vecs: DataFrame, cents: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int = 2, asgOpt: Option[DataFrame] = None): DataFrame = {
    val asg = asgOpt.getOrElse(assign(vecs, cents))
    val cand = vecs.join(asg.select("vec_id", "cid"), "vec_id")
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("dist").asc, col("cid").asc)
    val q = queries
      .select(col("vec_id").as("query_id"), col("qv").as("qq"),
        col("norm2").as("qn"))
      .crossJoin(broadcast(cents))
      .withColumn("dist",
        col("qn") - lit(2L) * LongArrayDot.dot(col("qq"), col("cv")) +
          col("cnorm2"))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= nprobe)
      .select(col("query_id"), col("qq"), col("qn"), col("cid").as("qcid"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(q).join(cand, col("qcid") === col("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("cos", Vec.cosine(LongArrayDot.dot(col("qq"), col("qv")),
        col("qn"), col("norm2")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "vec_id", "rk")
  }

  /** Brute-force exact top-k for the same fixed query set — the
    * recall ground truth (ann_topk's shape). */
  def topkExact(vecs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("qv").as("qq"),
      col("norm2").as("qn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(q).join(vecs, col("query_id") =!= col("vec_id"))
      .withColumn("cos", Vec.cosine(LongArrayDot.dot(col("qq"), col("qv")),
        col("qn"), col("norm2")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("query_id", "vec_id")
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "ann_kmeans",
      (spark, sf) => {
        // lazy checkpoint: the pipeline evaluates the corpus ~6 times
        // (3 Lloyd assignments + the determinism re-run + both recall
        // arms); materializing the quantized vectors once replaces six
        // re-scan+re-quantize passes (with the centroid/assignment
        // checkpoints below: 3.3 → ~2.8 s warm, 12.1 → ~9.3 s cold at
        // sf0.1). Lazy, so plan-only consumers still run zero jobs.
        val vecs = quantized(spark, sf).localCheckpoint(false)
        val c0 = seed(vecs)
        val a0 = assign(vecs, c0).localCheckpoint(false)
        // centroid tables are K rows — checkpointing them stops each
        // downstream consumer from replaying the whole Lloyd chain
        val c1 = update(vecs, a0).localCheckpoint(false)
        val a1 = assign(vecs, c1)
        val c2 = update(vecs, a1).localCheckpoint(false)
        val a2 = assign(vecs, c2).localCheckpoint(false)
        val wcss0 = a0.agg(sum(col("dist")).as("w")).select(col("w").as("w0"))
        val wcss2 = a2.agg(sum(col("dist")).as("w")).select(col("w").as("w2"))
        // determinism: a second evaluation of the same exact-integer
        // pipeline must produce the identical assignment set
        val a2b = assign(vecs, c2)
        val det = a2.select("vec_id", "cid")
          .exceptAll(a2b.select("vec_id", "cid"))
          .agg(count(lit(1)).as("n_diff")).select(col("n_diff"))
        val nonEmpty = a2.select("cid").distinct()
          .agg(count(lit(1)).as("n_cells")).select(col("n_cells"))
        // multi-probe (nprobe=3 of 8 cells) recall vs exact top-3
        // over the fixed 100-query set; measured 213/300 at sf0.001,
        // 192/300 at sf0.01 — the 150 floor has ~30% headroom.
        // nprobe=1 measures only ~110/300 on this near-uniform
        // corpus: do NOT lower the probe count without re-measuring
        val queries = vecs.filter(col("vec_id") < 100)
        val ivf = topkInCell(vecs, c2, queries, TopK, nprobe = 3,
          asgOpt = Some(a2))
        val exact = topkExact(vecs, queries, TopK)
        val recall = exact.join(ivf, Seq("query_id", "vec_id"), "left_semi")
          .agg(count(lit(1)).as("hits")).select(col("hits"))
        val n = vecs.agg(count(lit(1)).as("n_vectors"))
        n.crossJoin(broadcast(wcss0)).crossJoin(broadcast(wcss2))
          .crossJoin(broadcast(det)).crossJoin(broadcast(nonEmpty))
          .crossJoin(broadcast(recall))
          .select(col("n_vectors"),
            (col("w2") <= col("w0")).as("wcss_improved"),
            (col("n_diff") === 0).as("assign_deterministic"),
            (col("n_cells") === K).as("all_cells_used"),
            // 100 queries × top-3 = 300 truth pairs; the nprobe=3
            // measurements above give the 150 floor ~30% headroom
            (col("hits") >= 150L).as("recall_ge_half"))
      },
      Some("SELECT count(*) AS n_vectors, TRUE AS wcss_improved, TRUE AS assign_deterministic, TRUE AS all_cells_used, TRUE AS recall_ge_half FROM embeddings"),
      scaleNote = "Training cost per Lloyd round is one broadcast-K nested loop over the corpus (K rows — bounded, like ann_topk's fixed query set) plus a K×dims-row aggregate: linear in vectors, constant-size model state, no iteration-to-iteration growth (each round's centroids are a fresh K-row broadcast). At 100 TB train on a uniform SAMPLE (the assignment plan is unchanged), then one final full-corpus assignment pass partitions the data BY cell — after which every query touches one cell (|corpus|/K candidates), and the probe dial is nearest-m-centroids instead of one. The exact-integer arithmetic means re-training on a re-partitioned corpus reproduces identical cells — a reproducibility property float k-means cannot offer. The brute-force recall baseline exists ONLY to oracle the verdict at test scale."))
}
