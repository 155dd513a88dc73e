package graft

import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Bucketing — the shuffle-elimination path the scaleNotes point at
  * ("bucketing lineitem by orderkey at write time removes the
  * shuffle"). Written as a measured demonstration, not a claim: both
  * join sides are written `bucketBy(join key)`, and the plans are
  * asserted shuffle-free where co-location applies.
  *
  * At 100 TB this is the difference between re-shuffling the fact
  * table on every query and paying the partition-by-key cost ONCE at
  * ingest; every subsequent equi-join or aggregation on the bucket
  * key reads co-located buckets.
  */
class BucketingSpec extends SparkSpec {

  test("bucket-by-join-key removes the join and aggregation shuffles") {
    val sp = spark.newSession()
    org.apache.spark.sql.SparkSession.setActiveSession(sp)
    try {
      // force the SMJ path: broadcast would hide the co-location story
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.sources.Sinks.writeBucketed(
        Tables.lineitem(sp, sf), "b_lineitem", "l_orderkey", 8)
      graft.sources.Sinks.writeBucketed(
        Tables.orders(sp, sf), "b_orders", "o_orderkey", 8)

      // 1) plain parquet: the same join must shuffle BOTH sides —
      //    the baseline the bucketed plan is measured against
      val plain = Tables.lineitem(sp, sf)
        .join(Tables.orders(sp, sf),
          col("l_orderkey") === col("o_orderkey"))
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"),
        s"expected shuffles in the unbucketed join:\n${plainPlan.take(600)}")

      // 2) bucketed ⋈ bucketed on the bucket key: zero exchanges —
      //    each task merge-joins its co-located bucket pair
      val bucketed = sp.table("b_lineitem")
        .join(sp.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val bPlan = bucketed.queryExecution.executedPlan.toString
      assert(bPlan.contains("SortMergeJoin"), bPlan.take(600))
      assert(!bPlan.contains("Exchange"),
        s"bucketed join still shuffles:\n${bPlan.take(600)}")

      // 3) aggregation keyed on the bucket column: zero exchanges —
      //    partial and final agg collapse onto the bucket layout
      val agg = sp.table("b_orders").groupBy("o_orderkey")
        .agg(count(lit(1)).as("n"))
      val aPlan = agg.queryExecution.executedPlan.toString
      assert(!aPlan.contains("Exchange"),
        s"bucket-keyed agg still shuffles:\n${aPlan.take(600)}")

      // same answer as the shuffled baseline
      assert(bucketed.count() == plain.count())
    } finally {
      // the bucketed tables are PERMANENT catalog tables in the shared
      // metastore/warehouse — drop them so later suites see none
      sp.sql("DROP TABLE IF EXISTS b_lineitem")
      sp.sql("DROP TABLE IF EXISTS b_orders")
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }
}
