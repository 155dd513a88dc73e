package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Plan-level proof for `sink_bucketed` (r10): the hash gates the
  * read-back content; this spec pins the property the layout exists
  * for — joining the two co-bucketed tables plans a SortMergeJoin
  * whose subtrees contain NO shuffle exchange (the scans feed the
  * join bucket-wise), against a control join of the raw parquet
  * tables that must exchange both sides.
  */
class BucketedSinkSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  test("co-bucketed join runs exchange-free below the join; raw join must shuffle") {
    val (liT, oT) = queries.SourceOps.bucketedTables(spark, sf)
    // merge hint mirrors the operator: without it the tiny test-SF
    // orders side broadcasts and the bucketed scans never engage
    val bucketedJoin = spark.table(liT).hint("merge")
      .join(spark.table(oT).hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    // string-form assertions: AQE's ResultQueryStage does not expose
    // its subtree to TreeNode.collect, but the rendered plan shows it
    val ps = executed(bucketedJoin).toString
    assert(ps.contains("SortMergeJoin"),
      s"expected SortMergeJoin over bucketed scans:\n$ps")
    assert(!ps.contains("Exchange"),
      s"bucketed join must not exchange:\n$ps")
    assert("Bucketed: true".r.findAllIn(ps).size == 2,
      s"both join inputs must be bucketed scans:\n$ps")

    // control: the same merge join over the raw parquet tables must
    // exchange both sides
    val rawJoin = engine.Tables.lineitem(spark, sf).hint("merge")
      .join(engine.Tables.orders(spark, sf).hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
    val rawPs = executed(rawJoin).toString
    assert(rawPs.contains("Exchange") || rawPs.contains("ShuffleQueryStage"),
      "control join over unbucketed tables should shuffle")

    // and the layouts agree on the answer
    assert(bucketedJoin.count() == rawJoin.count())
  }
}
