package graft.queries

import graft.engine.{Catalog, QueryDef, QueryGroup}

/** The engine's SQL text interface, under the driver hash gate: a user
  * of the reference drives it through SQL strings [P query.py
  * DBQuerier — SURVEY §3.1-EP3], so the Spark-native surface must
  * prove the same entry point end-to-end — Catalog.register (temp
  * views + custom function install) feeding `spark.sql(...)`, not the
  * DataFrame DSL. Every other declared key gates a plan built in
  * Scala; this one gates the parser→analyzer→same-Catalyst path.
  */
object SqlSurface extends QueryGroup {

  /** TPC-H Q3 (shipping priority), adapted to the driver schema (no
    * o_shippriority column) and the house determinism rules: exact
    * DECIMAL revenue summed order-free, cast DOUBLE at the edge, and
    * a total ORDER BY tiebreak under the LIMIT. */
  private val Q3 =
    """SELECT o_orderkey, o_orderdate,
      |  CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)))
      |    AS DECIMAL(18,4)) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "sql_tpch_q3",
      (spark, sf) => {
        Catalog.register(spark, sf)
        spark.sql(Q3)
      },
      // the oracle is the SAME text (both engines speak ANSI here) —
      // what the hash gates is Spark's parse→analyze→optimize→execute
      // of it over the registered views, against DuckDB's independent
      // execution of the identical semantics
      Some(Q3.replace('\n', ' ').replaceAll(" +", " ")),
      scaleNote = "The SQL path lands in the identical Catalyst plan " +
        "a DataFrame build produces — same pushdown (both date " +
        "predicates reach their scans), same join strategy (customer " +
        "filtered to one segment broadcasts; orders⋈lineitem " +
        "shuffles on the order key, co-partition-able by bucketing " +
        "both on it), same TakeOrderedAndProject for the top-10 (no " +
        "global sort). That plan equivalence IS the point of gating " +
        "the surface: at 100 TB an analyst's ad-hoc SQL inherits " +
        "every layout/bucketing/stats decision the pipeline made " +
        "(Catalog.analyzed feeds CBO), with zero engine-specific " +
        "rewriting. Revenue is exact-DECIMAL summed (associative), " +
        "so partial aggregation over any partitioning is bit-stable."))
}
