package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.catalyst.optimizer.BuildLeft

/** Dev-only: prints every BroadcastNestedLoopJoin build side for the
  * named queries, so the structural bound in PlanPropertiesSpec can be
  * designed against the real subtrees. Run with
  *   sbt "Test/runMain graft.BnljProbe <names...>"
  */
object BnljProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    args.foreach { name =>
      val p0 = engine.Registry.byName(name).build(spark, sf)
        .queryExecution.executedPlan
      val exec = p0 match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case x => x
      }
      exec.collect { case j: BroadcastNestedLoopJoinExec => j }
        .zipWithIndex.foreach { case (j, i) =>
          val side = if (j.buildSide == BuildLeft) j.left else j.right
          println(s"===== $name BNLJ #$i buildSide=${j.buildSide} =====")
          println(side.toString.linesIterator.take(25).mkString("\n"))
        }
    }
    spark.stop()
  }
}
