package graft

import org.apache.spark.sql.functions._

/** Pins graft.plans.ByteGrams4 bit-equal to the SQL formulation it
  * replaces in multimodal_near_dup's gram stage (the QuantizeVecSpec
  * pattern for the fourth custom expression). */
class ByteGrams4Spec extends SparkSpec {

  private def sqlGrams(c: String) = expr(
    s"transform(sequence(1, length($c) - 3), i -> " +
      s"CAST(conv(hex(substring($c, i, 4)), 16, 10) AS BIGINT))")

  test("ByteGrams4 equals the conv(hex(substring)) formulation on the media corpus") {
    val m = queries.Multimodal.mediaTable(spark, sf).toDF()
      .filter(length(col("payload")) >= 4)
    val diff = m.select(col("media_id"),
        graft.plans.ByteGrams4.grams4(col("payload")).as("a"),
        sqlGrams("payload").as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.isEmpty, "ByteGrams4 diverges from the SQL gram formulation")
  }

  test("ByteGrams4 edge cases: exact-4, 5-byte, high-bit bytes") {
    val session = spark
    import session.implicits._
    val rows = Seq(
      Array[Byte](0, 1, 2, 3),
      Array[Byte](-1, -2, 0, 127, 5),
      Array[Byte](65, 66, 67, 68, 69, 70)).toDF("payload")
      .select(col("payload").cast("binary").as("payload"))
    val out = rows.select(
        graft.plans.ByteGrams4.grams4(col("payload")).as("a"),
        sqlGrams("payload").as("b"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"mismatch: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}")
    }
    // unsigned composition: 0xFF 0xFE 0x00 0x7F = 4294573183
    assert(out(1).getSeq[Long](0).head ==
      (0xFFL << 24 | 0xFEL << 16 | 0x7FL))
  }
}
