package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact distributed Gram matrix (upper triangle) over quantized
  * integer vectors — the one-pass, mergeable XᵀX accumulation every
  * PCA / whitening / linear-probe step over an embedding corpus
  * starts from (the classic tall-skinny Gram: d ≪ n, so the d(d+1)/2
  * partial is tiny while the row count is the 100 TB part).
  *
  * State is a FIXED d(d+1)/2-long array regardless of row count, and
  * `merge` is elementwise integer addition — exactly associative and
  * commutative — so Spark runs it as a regular two-phase aggregate:
  * each partition folds its rows locally (2080 multiply-adds per row
  * for d=64), the shuffle carries ONE ~16 KB array per partition, and
  * the final merge is |partitions| vector adds. No explode, no
  * per-element shuffle rows: the posexplode formulation of the same
  * sum ships d(d+1)/2 rows per input vector through the hash
  * aggregate; this ships d(d+1)/2 longs per PARTITION.
  *
  * Exactness: inputs are floor(x·2²⁰) quantizations (|q| ≤ 2²⁰ for
  * |x| ≤ 1), so each product is ≤ 2⁴⁰ and a Long accumulator is exact
  * up to ~8M rows per cell — far beyond every driver SF. The 100 TB
  * path splits the corpus into hash shards, takes per-shard Gram
  * partials through this same aggregator, and adds the shard results
  * in DECIMAL(38,0) (or a two-long 128-bit cell), keeping the whole
  * pipeline overflow-free without touching the row-side loop.
  */
class GramAggregator(val dim: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  val tri: Int = dim * (dim + 1) / 2

  def zero: Array[Long] = new Array[Long](tri)

  // addExact/multiplyExact (r8, ADVICE): past the documented ~8M-row
  // bound a plain += wraps silently while the DuckDB oracle (HUGEINT
  // sum) errors — a divergence only a hash mismatch would catch.
  // Exact ops are JIT intrinsics (add + overflow-flag branch), so the
  // hot loop stays codegen-cheap and overflow now fails LOUDLY with
  // an ArithmeticException naming the fix (shard + DECIMAL re-merge,
  // per the scaladoc's 100 TB path).
  def reduce(b: Array[Long], q: Array[Long]): Array[Long] = {
    if (q == null) return b
    require(q.length == dim, s"expected dim $dim, got ${q.length}")
    var k = 0
    var i = 0
    while (i < dim) {
      val qi = q(i)
      var j = i
      while (j < dim) {
        b(k) = Math.addExact(b(k), Math.multiplyExact(qi, q(j)))
        k += 1; j += 1
      }
      i += 1
    }
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var k = 0
    while (k < tri) { a(k) = Math.addExact(a(k), b(k)); k += 1 }
    a
  }

  def finish(b: Array[Long]): Array[Long] = b

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
