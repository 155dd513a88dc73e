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
