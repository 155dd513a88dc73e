package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared operator: a DataFrame builder plus (optionally) the
  * DuckDB-equivalent SQL the driver hash-compares against (SURVEY.md
  * §2.0). `oracle == None` → driver records a weaker rows-only check.
  *
  * @param scaleNote how this operator behaves at 100 TB / 1000
  *                  executors — partitioning, shuffle, broadcast,
  *                  skew strategy. Collected into SCALE.md.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    scaleNote: String = "")

trait QueryGroup {
  def defs: Seq[QueryDef]
}

/** Shared determinism helpers (SURVEY.md §2.0 rules).
  *
  * Cross-engine hash-matching bans raw float aggregation (summation
  * order differs per engine/partitioning) — money math goes through
  * DECIMAL(18,2)/(18,4), which is exact and order-independent, and the
  * final column is cast back to a fixed precision so Spark's widened
  * sum type (DECIMAL(28,2)) and DuckDB's (DECIMAL(38,2)) agree.
  */
object Dsl {
  val D2: DecimalType = DecimalType(18, 2)
  val D4: DecimalType = DecimalType(18, 4)

  def dec2(c: Column): Column = c.cast(D2)

  /** Exact, order-independent SUM over money: cast to DECIMAL(18,2)
    * before summing, pin the result back to DECIMAL(18,2). */
  def sumDec2(c: Column): Column = sum(dec2(c)).cast(D2)

  def sumDec4(c: Column): Column = sum(c.cast(D4)).cast(D4)

  /** Deterministic average: exact decimal sum → double → divide →
    * round(4). The only float op is one division on an exact decimal,
    * identical on both engines. */
  def avgDec4(c: Column): Column =
    round(sum(dec2(c)).cast("double") / count(c), 4)

  /** timestamp_ntz literal from `yyyy-MM-dd` (matches DuckDB
    * TIMESTAMP 'yyyy-MM-dd'). */
  def tsLit(s: String): Column = lit(s).cast("timestamp_ntz")
}

/** Shared vector determinism helpers: ONE definition of the float
  * quantization every similarity operator (and its oracle SQL) relies
  * on — the cross-operator score-equality tests depend on these
  * staying identical everywhere. */
object Vec {
  /** 2^20 — exponent-shift multiply, exact on every element. */
  val QuantScale: Double = 1048576.0

  /** floor(x·2^20) per element: widen exact, shift exact, floor exact —
    * zero rounding anywhere, identical across engines. Backed by the
    * codegen'd [[graft.plans.QuantizeVec]] Expression (bit-identical
    * to the `transform`-HOF formulation, which is interpreted per
    * element — QuantizeVecSpec pins the equality). */
  def quantize(c: Column): Column = graft.plans.QuantizeVec.quantize(c)

  /** Integer squared norm of a quantized vector — the self dot
    * product, so it rides the codegen'd [[graft.plans.LongArrayDot]]
    * instead of an interpreted `aggregate` HOF. */
  def norm2(qv: Column): Column = graft.plans.LongArrayDot.dot(qv, qv)

  /** Deterministic cosine from integer dot + norms: one CR division. */
  def cosine(dot: Column, n1: Column, n2: Column): Column =
    org.apache.spark.sql.functions.round(dot.cast("double") /
      (org.apache.spark.sql.functions.sqrt(n1.cast("double")) *
        org.apache.spark.sql.functions.sqrt(n2.cast("double"))), 4)
}
