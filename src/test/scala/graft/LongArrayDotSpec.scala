package graft

import org.apache.spark.sql.functions._
import graft.plans.LongArrayDot

class LongArrayDotSpec extends SparkSpec {

  test("codegen result equals the interpreted HOF dot product") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-7L, 0L, 2L), Seq(3L, 9L, -1L)),
      (Seq.empty[Long], Seq.empty[Long])
    ).toDF("a", "b")
    val rows = df.select(
      LongArrayDot.dot(col("a"), col("b")).as("cg"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
    assert(rows(0).getLong(0) == 32L)
    // length mismatch: zip_with null-pads (HOF → NULL); the expression
    // takes the common prefix — documented divergence
    val mismatch = Seq((Seq(1L, 2L), Seq(10L, 20L, 30L))).toDF("a", "b")
      .select(LongArrayDot.dot(col("a"), col("b"))).head()
    assert(mismatch.getLong(0) == 50L)
  }

  test("sorted_intersect_count matches array_intersect on sorted distinct arrays") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (0 until 200).map { _ =>
      val a = (0 until rnd.nextInt(50)).map(_ => s"w${rnd.nextInt(60)}").distinct.sorted
      val b = (0 until rnd.nextInt(50)).map(_ => s"w${rnd.nextInt(60)}").distinct.sorted
      (a, b)
    }
    val bad = rows.toDF("a", "b").select(
      graft.plans.SortedIntersectCount.count(col("a"), col("b")).as("cg"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("cg") =!= col("ref")).collect()
    assert(bad.isEmpty, bad.mkString(","))
    // bigint variant: same semantics over sorted distinct longs
    val longRows = rows.map { case (a, b) =>
      (a.map(_.hashCode.toLong).distinct.sorted, b.map(_.hashCode.toLong).distinct.sorted)
    }
    val badL = longRows.toDF("a", "b").select(
      graft.plans.SortedIntersectCount.count(col("a"), col("b")).as("cg"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("cg") =!= col("ref")).collect()
    assert(badL.isEmpty, badL.mkString(","))
  }

  test("sorted_intersect_elems matches array_sort(array_intersect) on sorted distinct longs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { _ =>
      ((0 until rnd.nextInt(60)).map(_ => rnd.nextInt(80).toLong).distinct.sorted,
        (0 until rnd.nextInt(60)).map(_ => rnd.nextInt(80).toLong).distinct.sorted)
    }
    // includes empty-array and disjoint cases by construction
    val bad = rows.toDF("a", "b").select(
      graft.plans.SortedIntersectElems.elems(col("a"), col("b")).as("cg"),
      array_sort(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("cg") =!= col("ref")).collect()
    assert(bad.isEmpty, bad.take(3).mkString(","))
    // null propagation
    val r = Seq((Some(Seq(1L, 2L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(graft.plans.SortedIntersectElems.elems(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("null input propagates null; type mismatch is rejected at analysis") {
    val s = spark
    import s.implicits._
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    val r = df.select(LongArrayDot.dot(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
    val bad = Seq(("x", Seq(1L))).toDF("a", "b")
    intercept[Exception] {
      bad.select(LongArrayDot.dot(col("a"), col("b"))).head()
    }
  }
}
