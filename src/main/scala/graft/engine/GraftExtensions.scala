package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions._
import graft.plans.LongArrayDot

/** Session-extension entry point: registers the engine's custom
  * Catalyst surface for SQL users. Activate with
  * `spark.sql.extensions=graft.engine.GraftExtensions` at session build,
  * or call [[GraftExtensions.install]] on a live session (idempotent).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.longArrayDotDescriptor)
    ext.injectFunction(GraftExtensions.sortedIntersectCountDescriptor)
    ext.injectFunction(GraftExtensions.quantizeVecDescriptor)
    ext.injectFunction(GraftExtensions.hilbertIndexDescriptor)
  }
}

object GraftExtensions {

  private[engine] val longArrayDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("long_array_dot"),
    new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "long_array_dot(a, b) takes two arguments")
      LongArrayDot(children.head, children(1))
    })

  private[engine] val sortedIntersectCountDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_intersect_count"),
    new ExpressionInfo(classOf[graft.plans.SortedIntersectCount].getName,
      "sorted_intersect_count"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        "sorted_intersect_count(a, b) takes two arguments")
      graft.plans.SortedIntersectCount(children.head, children(1))
    })

  private[engine] val quantizeVecDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("quantize_vec"),
    new ExpressionInfo(classOf[graft.plans.QuantizeVec].getName,
      "quantize_vec"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "quantize_vec(v) takes one argument")
      graft.plans.QuantizeVec(children.head)
    })

  private[engine] val hilbertIndexDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hilbert_index"),
    new ExpressionInfo(classOf[graft.plans.HilbertIndex].getName,
      "hilbert_index"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "hilbert_index(x, y) takes two arguments")
      graft.plans.HilbertIndex(children.head, children(1))
    })

  /** Register on an already-built session (the driver owns session
    * construction, so injection at build time isn't always available). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(longArrayDotDescriptor, sortedIntersectCountDescriptor,
      quantizeVecDescriptor, hilbertIndexDescriptor).foreach { d =>
      spark.sessionState.functionRegistry.registerFunction(d._1, d._2, d._3)
    }
}

/** Skew-handling utility the scale notes reference: salted join for a
  * hot-keyed big side against a small-but-not-broadcastable side.
  * The big side gets a random-ish (deterministic: key-hash + row id
  * derived) salt in [0, n); the small side is replicated n× so every
  * salted key finds its match. AQE's skew-join split handles moderate
  * skew automatically; salting is the explicit fallback when one key
  * exceeds what a single task can hold. */
object SkewJoin {

  def salted(big: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    // salt derived from FULL row content, so assignment is reproducible
    // across runs and repartitionings (monotonically_increasing_id
    // depends on partition layout — r2 advice). Duplicate rows share a
    // salt, which only costs spread on pathological all-duplicate keys.
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(n.toLong)).cast("int"))
    val saltedSmall = small
      .withColumn("_salt", explode(array((0 until n).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
