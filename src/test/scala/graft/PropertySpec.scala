package graft

import org.scalacheck.Gen
import org.apache.spark.sql.functions._
import graft.functions.Gtfs

/** ScalaCheck-generated properties (SURVEY.md §5 item 3) — Gen drives
  * the case generation directly (the scalatestplus bridge is not in
  * the offline dependency set). Spark-evaluated checks batch generated
  * cases into ONE job per property — per-case Spark jobs would be
  * quadratically slow. */
class PropertySpec extends SparkSpec {

  test("gtfs_time ∘ gtfs_seconds is the identity for any (h<48, m<60, s<60)") {
    val sp = spark
    import sp.implicits._
    val cases = for {
      h <- 0 until 48; m <- Seq(0, 1, 9, 30, 59); sec <- Seq(0, 5, 59)
    } yield f"$h%02d:$m%02d:$sec%02d"
    val bad = cases.toDF("t")
      .select(col("t"), Gtfs.gtfsTime(Gtfs.gtfsSeconds(col("t"))).as("rt"))
      .filter(col("t") =!= col("rt")).collect()
    assert(bad.isEmpty, bad.mkString(","))
  }

  test("luhn check digit is always 0..9 and changes under single-digit corruption (mostly)") {
    val sp = spark
    import sp.implicits._
    val gen = Gen.listOfN(7, Gen.choose(0, 9)).map(_.mkString)
    val inputs = (1 to 200).flatMap(i => gen.apply(Gen.Parameters.default,
      org.scalacheck.rng.Seed(i.toLong))).distinct
    val rows = inputs.toDF("d")
      .select(col("d"), Gtfs.luhnCheckDigit(col("d")).as("c")).collect()
    rows.foreach(r => assert(r.getInt(1) >= 0 && r.getInt(1) <= 9))
    // Luhn detects ALL single-digit substitutions: corrupt the first
    // digit of each input and require a different check digit
    val corrupted = inputs.map(d => (((d.head - '0') + 1) % 10).toString + d.tail)
    val cs = corrupted.toDF("d")
      .select(col("d"), Gtfs.luhnCheckDigit(col("d")).as("c")).collect()
      .map(_.getInt(1))
    rows.map(_.getInt(1)).zip(cs).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a != b, s"single-digit corruption undetected for ${inputs(i)}")
    }
  }

  test("minhash jaccard estimate tracks true jaccard on generated sets") {
    val sp = spark
    import sp.implicits._
    // build doc pairs with controlled overlap: doc A = tokens 0..99,
    // doc B_k = tokens k..99+k  → true jaccard = (100-k)/(100+k)
    val docs = (0L to 0L).map(i => (i, (0 until 100).map(t => s"w$t w${t}x w${t}y").mkString(" "))) ++
      Seq(20, 50, 80).map { k =>
        (k.toLong, (k until 100 + k).map(t => s"w$t w${t}x w${t}y").mkString(" "))
      }
    val df = docs.toDF("doc_id", "text")
    val sig = graft.queries.NearDup.minhashSignature(
      graft.queries.NearDup.shingleRows(df)).collect()
      .map(r => r.getLong(0) -> (1 until 65).map(i => r.getLong(i)).toVector).toMap
    def est(a: Vector[Long], b: Vector[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.size
    // estimates must be monotone in true similarity
    val e20 = est(sig(0L), sig(20L))
    val e50 = est(sig(0L), sig(50L))
    val e80 = est(sig(0L), sig(80L))
    assert(e20 > e50 && e50 > e80, s"not monotone: $e20 $e50 $e80")
    assert(e80 < 0.45 && e20 > 0.35, s"estimates off: $e20 $e80")
  }

  test("quantized cosine is symmetric and bounded on random vectors") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.select(col("vec_id"),
      transform(col("embedding"), x => floor(x.cast("double") * lit(1048576.0)).cast("long")).as("qv"))
      .withColumn("n2", aggregate(col("qv"), lit(0L), (a, x) => a + x * x))
    val a = q.select(col("vec_id").as("i"), col("qv").as("qa"), col("n2").as("na"))
    val b = q.select(col("vec_id").as("j"), col("qv").as("qb"), col("n2").as("nb"))
    val pairs = a.join(b, col("i") < col("j"))
      .select(col("i"), col("j"),
        (graft.plans.LongArrayDot.dot(col("qa"), col("qb")).cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))).as("cos"),
        (graft.plans.LongArrayDot.dot(col("qb"), col("qa")).cast("double") /
          (sqrt(col("nb").cast("double")) * sqrt(col("na").cast("double")))).as("cos_rev"))
      .collect()
    pairs.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3), "not symmetric")
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9, "out of bounds")
    }
  }

  test("sessionization: no intra-session gap exceeds the threshold; island count is right") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(42)
    // generated event times with known gap structure per user
    val rows = (0 until 20).flatMap { u =>
      var t = 0L
      (0 until 30).map { i =>
        t += (if (rnd.nextDouble() < 0.2) 2000 else rnd.nextInt(1500)) + 1
        (u.toLong * 100 + i, new java.sql.Timestamp(1700000000000L + u * 10000000L + t * 1000), u.toLong)
      }
    }
    val ev = rows.toDF("event_id", "ts", "user_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = ev
      .withColumn("gap", unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w)))
      .withColumn("is_new", when(col("gap").isNull || col("gap") > 1800, 1).otherwise(0))
      .withColumn("sid", sum("is_new").over(
        w.rowsBetween(Long.MinValue, 0)))
    // per (user, session): max intra-session gap ≤ 1800
    val bad = sessions.filter(col("is_new") === 0 && col("gap") > 1800)
    assert(bad.count() == 0)
    // island count per user equals number of >1800 gaps + 1
    val islands = sessions.groupBy("user_id").agg(
      max("sid").as("n_sessions"), sum("is_new").as("n_breaks"))
    assert(islands.filter(col("n_sessions") =!= col("n_breaks")).count() == 0)
  }
}
