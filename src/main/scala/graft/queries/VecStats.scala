package graft.queries

import org.apache.spark.sql.functions._
import graft.engine.{QueryDef, QueryGroup, Tables, Vec}
import graft.functions.GramAggregator

/** Linear-algebra statistics over the embedding corpus — the
  * second-moment machinery (XᵀX) that PCA, whitening, ZCA, ridge
  * regression and linear probes all start from. The reference has no
  * embedding analytics; this is north-star training-pipeline surface
  * in the vec_centroid / emb_quantize family (SURVEY §2.2b).
  */
object VecStats extends QueryGroup {

  /** Driver-testdata embedding dimensionality (TESTDATA.md). */
  val Dim = 64

  /** (flat upper-triangle index k) → (i, j), 1-based to match DuckDB's
    * generate_subscripts. 2080 constant rows, broadcast. */
  private val TriIndex: Seq[(Int, Int, Int)] = {
    val b = Seq.newBuilder[(Int, Int, Int)]
    var k = 0
    for (i <- 0 until Dim; j <- i until Dim) { b += ((k, i + 1, j + 1)); k += 1 }
    b.result()
  }

  def defs: Seq[QueryDef] = Seq(

    // Exact Gram matrix (upper triangle) of the quantized embedding
    // corpus: G[i,j] = Σ_rows q_i·q_j over floor(x·2^20) integer
    // elements — bit-exact on both engines because every product and
    // sum is integer arithmetic. The aggregation is a typed mergeable
    // Aggregator holding ONE fixed 2080-long buffer per partition
    // (functions/Gram.scala), not a posexplode² fan-out: the shuffle
    // carries |partitions| arrays, never |rows|·d²/2 cells. The flat
    // buffer index is joined back to (i, j) through a 2080-row
    // broadcast dimension.
    QueryDef(
      "emb_gram",
      (spark, sf) => {
        val session = spark
        import session.implicits._
        val gram = udaf(new GramAggregator(Dim))
        val idx = TriIndex.toDF("k", "i", "j")
        Tables.embeddings(spark, sf)
          .select(Vec.quantize(col("embedding")).as("qv"))
          .agg(gram(col("qv")).as("g"))
          .select(posexplode(col("g")).as(Seq("k", "dot")))
          .join(broadcast(idx), "k")
          .select(col("i"), col("j"), col("dot"))
          .orderBy("i", "j")
      },
      Some("WITH q AS (SELECT list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1048576) AS BIGINT)) AS qv, vec_id FROM embeddings), " +
        "e AS (SELECT vec_id, unnest(qv) AS v, generate_subscripts(qv, 1) AS idx FROM q) " +
        "SELECT CAST(a.idx AS INT) AS i, CAST(b.idx AS INT) AS j, CAST(sum(a.v*b.v) AS BIGINT) AS dot " +
        "FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.idx <= b.idx " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
      scaleNote = "The tall-skinny Gram shape: state is d(d+1)/2 longs " +
        "(16 KB at d=64) whatever the row count, reduce is 2080 " +
        "multiply-adds per row inside the partition, and the shuffle " +
        "ships one buffer per partition — at 100 TB / 1000 executors " +
        "that is ~32k arrays (~0.5 GB total wire) for a corpus scan " +
        "that never materializes a cell-level row. Merge is " +
        "elementwise integer add (exactly associative), so partial " +
        "aggregation, AQE coalescing and speculative re-execution " +
        "cannot move a bit. Long cells are exact to ~8M rows at the " +
        "2^20 quantization; beyond that, shard the corpus by hash, " +
        "run per-shard partials through the same aggregator and add " +
        "shards in DECIMAL(38,0) — the row-side loop is unchanged. " +
        "G feeds driver-side eigen work (d×d is microscopic) for " +
        "PCA/whitening, the AnnPq codebook geometry, and linear " +
        "probes."))
}
